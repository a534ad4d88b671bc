"""global_rank: exact distributed ORDER BY row numbers."""


def _expected(df, descending=True):
    import pandas as pd
    s = df.sort_values(["n_chars", "doc_id"],
                       ascending=[not descending, True],
                       kind="stable").reset_index(drop=True)
    s["rank"] = range(1, len(s) + 1)
    return s


def test_global_rank_exact(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import global_rank

    rng_keys = np.array([5, 5, 3, 9, 9, 9, 1, 7, 5, 2] * 20,
                        dtype=np.int64)
    ids = np.arange(len(rng_keys), dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "n_chars": rng_keys})
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "n_chars": pa.array(rng_keys)}))
    out = global_rank(ds, n_partitions=3).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    exp = _expected(df)
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["rank"].tolist() == exp["rank"].tolist()
    # partition invariance, ascending flavour, tiny sample knob
    out2 = global_rank(ds.repartition(7), n_partitions=2,
                       points_per_batch=4).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
    asc = global_rank(ds, descending=False,
                      n_partitions=3).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    exp_asc = _expected(df, descending=False)
    assert asc["doc_id"].tolist() == exp_asc["doc_id"].tolist()


def test_global_rank_few_rows_no_splitters(ray_session):
    """Sample smaller than 2k -> single range, still exact."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import global_rank

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "n_chars": pa.array([10, 30, 20], pa.int64())}))
    out = global_rank(ds, n_partitions=4).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert out["doc_id"].tolist() == [2, 3, 1]
    assert out["rank"].tolist() == [1, 2, 3]


def test_doc_ntile(ray_session):
    """ntile bucket rule: first N%n buckets get one extra row."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import doc_ntile

    # N=7, n=3 -> bucket sizes 3,2,2
    ids = np.arange(7, dtype=np.int64)
    keys = np.array([70, 60, 50, 40, 30, 20, 10], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "n_chars": pa.array(keys)}))
    out = doc_ntile(ds, n=3, n_partitions=2).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert out["bucket"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    # degenerate N < n: one row per bucket
    small = doc_ntile(ds.limit(2), n=5, n_partitions=2).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert small["bucket"].tolist() == [1, 2]
    out2 = doc_ntile(ds.repartition(4), n=3,
                     n_partitions=3).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
