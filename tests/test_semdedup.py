"""SemDeDup: planted blobs with exact duplicates — keepers are the
min-id member of every within-cluster duplicate group; cross-cluster
near-dups survive (the method's stated trade); determinism.
"""

import numpy as np
import pyarrow as pa

from readability_ray.functions.similarity import semdedup_keepers


def _blob_ds():
    import ray.data
    rng = np.random.RandomState(3)
    rows_id, rows_emb = [], []
    # two far-apart blobs; in each, ids (0,1,2) are near-identical and
    # id 3 is distinct
    for b, center in enumerate(([10.0] * 8, [-10.0] * 8)):
        base = np.asarray(center)
        for j in range(4):
            vec = base + (rng.randn(8) * (0.001 if j < 3 else 2.0))
            rows_id.append(b * 10 + j)
            rows_emb.append(vec.astype(np.float32).tolist())
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(rows_id, pa.int64()),
        "embedding": pa.array(rows_emb, pa.list_(pa.float32()))}))


def _run(**kw):
    out = semdedup_keepers(_blob_ds(), k=2, threshold=0.999999,
                           n_iter=4, **kw).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    return out


def test_within_cluster_dups_pruned(ray_session):
    out = _run()
    by_id = out.set_index("vec_id")
    for b in (0, 10):
        # the three near-identical members share the min-id keeper
        assert by_id.loc[b, "keeper_id"] == b
        assert by_id.loc[b + 1, "keeper_id"] == b
        assert by_id.loc[b + 2, "keeper_id"] == b
        # the distinct member keeps itself
        assert by_id.loc[b + 3, "keeper_id"] == b + 3
    kept = set(out.loc[out["is_keeper"], "vec_id"])
    assert kept == {0, 3, 10, 13}


def test_clusters_separate_blobs(ray_session):
    out = _run()
    blob_a = set(out.loc[out["vec_id"] < 10, "cluster"])
    blob_b = set(out.loc[out["vec_id"] >= 10, "cluster"])
    assert len(blob_a) == 1 and len(blob_b) == 1
    assert blob_a != blob_b


def test_deterministic(ray_session):
    a = _run().to_csv(index=False)
    b = _run().to_csv(index=False)
    assert a == b
