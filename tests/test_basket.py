"""Market-basket co-purchase pairs (functions/basket.py):
brute-force differential over lineitem, duplicate-row idempotence,
partition-count invariance, empty input."""

import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _lineitem():
    import ray.data
    return ray.data.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])


def _brute(df: pd.DataFrame, k: int) -> pd.DataFrame:
    d = df.drop_duplicates(["l_orderkey", "l_partkey"])
    m = d.merge(d, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    g = m.groupby(["l_partkey_x", "l_partkey_y"]).size() \
        .reset_index(name="n_orders") \
        .rename(columns={"l_partkey_x": "part_a",
                         "l_partkey_y": "part_b"})
    return g.sort_values(["n_orders", "part_a", "part_b"],
                         ascending=[False, True, True],
                         kind="stable").head(k).reset_index(drop=True)


def test_copurchase_brute_force(ray_session):
    from readability_ray.functions import copurchase_pairs
    k = 25
    got = copurchase_pairs(_lineitem(), k=k).to_pandas()
    want = _brute(_lineitem().to_pandas(), k)
    assert got[["part_a", "part_b", "n_orders"]].values.tolist() == \
        want.values.tolist()


def test_copurchase_duplicate_lines_count_once(ray_session):
    """An order listing the same part on two lines still counts the
    pair once (DISTINCT orderkey/partkey semantics)."""
    import ray.data
    from readability_ray.functions import copurchase_pairs
    df = pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 2, 3, 3],
        "l_partkey":  [10, 10, 20, 10, 20, 20, 10]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = copurchase_pairs(ds, k=5, n_partitions=2).to_pandas()
    assert got.values.tolist() == [[10, 20, 3]]


def test_copurchase_partition_invariance(ray_session):
    from readability_ray.functions import copurchase_pairs
    a = copurchase_pairs(_lineitem(), k=20, n_partitions=2).to_pandas()
    b = copurchase_pairs(_lineitem(), k=20, n_partitions=7).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_copurchase_empty_input(ray_session):
    import ray.data
    from readability_ray.functions import copurchase_pairs
    empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                      "l_partkey": pa.array([], pa.int64())})
    got = copurchase_pairs(ray.data.from_arrow(empty),
                           k=5, n_partitions=2).to_pandas()
    assert len(got) == 0
