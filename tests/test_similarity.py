

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


def test_ivf_recall_stats_fixedpoint(ray_session):
    """Fixed-point IVF metrology: planted blobs — recall 1.0 when
    n_probe covers the query's blob; schema + determinism across
    partitionings (the property the integer quantizer exists for)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import ivf_recall_stats

    rng = np.random.RandomState(7)
    blobs = []
    for c in range(3):
        center = np.zeros(8)
        center[c] = 5.0
        blobs.append(center + rng.randn(20, 8) * 0.05)
    mat = np.vstack(blobs).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float32())),
    }))
    out = ivf_recall_stats(ds, [0, 20, 40], k=3, n_clusters=3,
                           n_probe=1, n_iter=2).to_pandas()
    assert list(out.columns) == ["query_id", "n_exact", "n_ivf",
                                 "n_common", "recall"]
    assert len(out) == 3
    # tight, well-separated blobs: probing the home cluster finds the
    # exact neighbors
    assert (out["recall"] == 1.0).all()
    # determinism across block structure (int partial sums are exact)
    out2 = ivf_recall_stats(ds.repartition(7), [0, 20, 40], k=3,
                            n_clusters=3, n_probe=1,
                            n_iter=2).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(out, out2)
