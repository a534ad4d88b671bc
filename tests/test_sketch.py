"""Count-Min Sketch: mergeability, never-undercount, determinism."""

import numpy as np
import pyarrow as pa


def _docs(ray, texts):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_cms_never_undercounts_and_exact_top(ray_session):
    import ray
    from readability_ray.functions import cms_top_token_counts
    texts = ["a a a b", "a b c", "c d", "a"]
    out = cms_top_token_counts(_docs(ray, texts), k=4, d=4,
                               w=64).to_pandas().set_index("token")
    assert out.loc["a", "exact_n"] == 5
    assert (out["cms_estimate"] >= out["exact_n"]).all()
    assert (out["overcount"] >= 0).all()
    # w large vs 4 tokens → no collisions → exact estimates
    assert (out["overcount"] == 0).all()


def test_cms_sketch_merge_equals_single_pass(ray_session):
    import ray
    from readability_ray.functions import cms_sketch
    from readability_ray.functions.sketch import _positions
    texts = [f"tok{i % 7} x" for i in range(40)]
    m = cms_sketch(_docs(ray, texts), d=3, w=32)
    # reference single-process build
    ref = np.zeros((3, 32), dtype=np.int64)
    for t in texts:
        for tok in t.split():
            for i, p in enumerate(_positions(tok, 3, 32)):
                ref[i, p] += 1
    assert (m == ref).all()


def test_hll_estimate_reasonable_and_deterministic(ray_session):
    import ray
    from readability_ray.functions import hll_distinct_tokens
    texts = [f"w{i} w{i+1} common" for i in range(0, 400, 2)]
    r1 = hll_distinct_tokens(_docs(ray, texts)).to_pandas()
    exact = int(r1["exact_distinct"].iloc[0])
    est = float(r1["hll_estimate"].iloc[0])
    assert exact == 401  # w0..w399 (odd+even overlap) + 'common'
    # m=64 → ~13% std error; allow 3 sigma
    assert abs(est - exact) / exact < 0.4
    r2 = hll_distinct_tokens(_docs(ray, texts)).to_pandas()
    assert float(r2["hll_estimate"].iloc[0]) == est


def test_hll_small_range_linear_counting(ray_session):
    import ray
    from readability_ray.functions import hll_distinct_tokens
    out = hll_distinct_tokens(_docs(ray, ["a b c", "b c d"])).to_pandas()
    assert int(out["exact_distinct"].iloc[0]) == 4
    est = float(out["hll_estimate"].iloc[0])
    assert 1 <= est <= 20  # linear-counting branch, tiny cardinality


def test_hll_by_group_matches_ungrouped(ray_session):
    """Per-group registers equal the single-group sketch run on that
    group alone; exact counts are true distincts; partition
    invariance."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import (hll_distinct_by_group,
                                           hll_distinct_tokens)

    docs = pa.table({
        "lang": pa.array(["en", "en", "de", "de", "de"], pa.string()),
        "text": pa.array(["a b c", "b c d", "x y", "y z", "z x w"],
                         pa.string()),
    })
    ds = ray.data.from_arrow(docs)
    out = hll_distinct_by_group(ds).to_pandas() \
        .sort_values("group").reset_index(drop=True)
    assert out["group"].tolist() == ["de", "en"]
    assert out["exact_distinct"].tolist() == [4, 4]  # xyzw / abcd
    # each group's estimate equals the ungrouped sketch on its slice
    for g in ("en", "de"):
        solo = hll_distinct_tokens(
            ds.filter(expr=f"lang == '{g}'")).to_pandas()
        row = out[out["group"] == g].iloc[0]
        assert row["hll_estimate"] == solo.loc[0, "hll_estimate"]
        assert row["exact_distinct"] == solo.loc[0, "exact_distinct"]
    out2 = hll_distinct_by_group(ds.repartition(4)).to_pandas() \
        .sort_values("group").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_hll_by_group_colocate_equals_single_block(ray_session):
    """The unbounded-group scale path returns exactly the bounded
    path's rows at any partitioning."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import hll_distinct_by_group

    docs = pa.table({
        "source": pa.array(["s1", "s2", "s1", "s3", "s2"],
                           pa.string()),
        "text": pa.array(["a b", "c", "b d", "e f g", "c h"],
                         pa.string()),
    })
    ds = ray.data.from_arrow(docs)
    a = hll_distinct_by_group(ds, group_col="source").to_pandas() \
        .sort_values("group").reset_index(drop=True)
    b = hll_distinct_by_group(ds.repartition(3), group_col="source",
                              strategy="colocate",
                              n_partitions=2).to_pandas() \
        .sort_values("group").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["exact_distinct"].tolist() == [3, 2, 3]
