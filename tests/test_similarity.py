

def test_ann_recall_stats_bounds(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import ann_recall_stats
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((40, 64))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(40)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    }))
    out = ann_recall_stats(ds, query_ids=[0, 1, 2], k=5).to_pandas()
    assert list(out["query_id"]) == [0, 1, 2]
    assert (out["n_exact"] == 5).all()
    assert (out["n_common"] <= out["n_lsh"]).all()
    assert ((out["recall"] >= 0) & (out["recall"] <= 1)).all()
    # deterministic
    out2 = ann_recall_stats(ds, query_ids=[0, 1, 2], k=5).to_pandas()
    assert (out["recall"].to_numpy() == out2["recall"].to_numpy()).all()
