

def test_minhash_recall_stats_shape(ray_session):
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import minhash_recall_stats
    base = "alpha beta gamma delta epsilon zeta eta theta"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, base + " iota", "wholly different "
                          "words here entirely"], pa.string()),
    }))
    out = minhash_recall_stats(ds, n_partitions=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_exact"] >= 1           # docs 1-2 are near-dups
    assert r["n_common"] == r["n_minhash"]  # verify=exact ⊆ exact
    assert 0.0 <= r["recall"] <= 1.0
    assert r["precision"] == 1.0
