"""referential_integrity: planted-orphan semantics, NULL foreign
keys, shared-table role merging, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _child(fks):
    return pa.table({
        "row_id": pa.array(range(len(fks)), pa.int64()),
        "fk": pa.array(fks, pa.int64()),
    })


def _parent(pks):
    return pa.table({"pk": pa.array(pks, pa.int64())})


def test_planted_orphans_and_nulls(ray_session):
    import ray.data
    from readability_ray.functions import referential_integrity

    child = ray.data.from_arrow(_child(
        [1, 1, 2, 7, 7, 7, None, 3]))     # 7 is an orphan (3 rows)
    parent = ray.data.from_arrow(_parent([1, 2, 3, 4]))
    out = referential_integrity(
        [(child, "fk", parent, "pk", "c.fk->p.pk")],
        n_partitions=3).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["edge"] == "c.fk->p.pk"
    assert r["n_null_fk"] == 1
    assert r["n_child_rows"] == 7          # nulls excluded
    assert r["n_child_keys"] == 4          # 1,2,7,3
    assert r["n_orphan_keys"] == 1         # 7
    assert r["n_orphan_rows"] == 3


def test_clean_edge_all_zero_orphans(ray_session):
    import ray.data
    from readability_ray.functions import referential_integrity

    child = ray.data.from_arrow(_child([1, 2, 3, 1]))
    parent = ray.data.from_arrow(_parent([1, 2, 3]))
    out = referential_integrity(
        [(child, "fk", parent, "pk", "e")]).to_pandas()
    assert out.iloc[0]["n_orphan_keys"] == 0
    assert out.iloc[0]["n_orphan_rows"] == 0
    assert out.iloc[0]["n_null_fk"] == 0


def test_shared_table_multiple_roles(ray_session):
    import ray.data
    from readability_ray.functions import referential_integrity

    # mid is parent of edge A and child of edge B — one read, both
    # roles; top is missing key 9 so edge B has an orphan
    mid = ray.data.from_arrow(pa.table({
        "mk": pa.array([10, 11, 12], pa.int64()),
        "up": pa.array([1, 2, 9], pa.int64()),
    }))
    low = ray.data.from_arrow(pa.table({
        "fk": pa.array([10, 10, 13], pa.int64())}))
    top = ray.data.from_arrow(pa.table({
        "pk": pa.array([1, 2, 3], pa.int64())}))
    out = referential_integrity([
        (low, "fk", mid, "mk", "a:low->mid"),
        (mid, "up", top, "pk", "b:mid->top"),
    ]).to_pandas().set_index("edge")
    assert out.loc["a:low->mid", "n_orphan_keys"] == 1      # 13
    assert out.loc["a:low->mid", "n_orphan_rows"] == 1
    assert out.loc["b:mid->top", "n_orphan_keys"] == 1      # 9
    assert out.loc["b:mid->top", "n_child_rows"] == 3


def test_integrity_partition_invariant(ray_session):
    import ray.data
    from readability_ray.functions import referential_integrity

    fks = [int(x) for x in np.arange(200) % 23]
    child = ray.data.from_arrow(_child(fks)).repartition(7)
    parent = ray.data.from_arrow(_parent(list(range(0, 23, 2))))
    outs = [referential_integrity(
        [(child, "fk", parent, "pk", "e")],
        n_partitions=kp).to_pandas() for kp in (2, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
