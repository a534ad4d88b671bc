"""Distributed Pareto skyline (Borzsony et al. 2001, "The Skyline
Operator") — the multi-objective filter behind "earliest big orders" /
"cheapest fast suppliers" queries that no single ORDER BY can express.

Scale shape: the skyline operator distributes for free because
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — a globally
non-dominated point cannot be locally dominated.  Each batch reduces
to its local skyline (expected O(log n) rows on independent dims), the
tiny survivors merge in ONE single-block pass running the identical
algorithm, and the payload columns ride along — no shuffle, no join,
no driver loop.  At 100 TB this is a pure map + a constant-size
reduce, the same silhouette as the moments/corr family.

The per-batch pass is fully vectorized: reduce to (x → min y) with a
pandas groupby, sort x descending, and keep the strict running-min
frontier (``cummin().shift(1)``); original rows rejoin on the
surviving (x, y) pairs, so duplicate points (equal in BOTH dims,
mutually non-dominating) are all retained — matching the SQL
``NOT EXISTS`` dominance semantics exactly.

No reference counterpart (corpus-level operator); oracle = the
distinct-x frontier re-derived with a DuckDB window (min(y) OVER
strictly-greater x), which equals the NOT-EXISTS definition.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from .util import arrow_out, strip_schema_metadata


def _skyline_pass(df: pd.DataFrame, max_col: str, min_col: str
                  ) -> pd.DataFrame:
    """Rows of ``df`` not dominated within ``df``:
    p dominates q iff p[max_col] >= q[max_col], p[min_col] <=
    q[min_col], strict in at least one."""
    if len(df) == 0:
        return df
    d = df.groupby(max_col, as_index=False)[min_col].min() \
        .rename(columns={min_col: "_my"}) \
        .sort_values(max_col, ascending=False, kind="stable")
    prev = d["_my"].cummin().shift(1)
    d = d[prev.isna().to_numpy() | (d["_my"] < prev).to_numpy()]
    out = df.merge(d, on=max_col, how="inner")
    out = out[out[min_col] == out["_my"]]
    return out.drop(columns="_my")


def pareto_skyline(ds: ray.data.Dataset, *,
                   max_col: str, min_col: str,
                   keep_cols: list[str]) -> ray.data.Dataset:
    """2-D skyline: rows maximizing ``max_col`` while minimizing
    ``min_col``.  Output columns = ``keep_cols`` (must include both
    objective columns), sorted (max desc, min asc, first keep asc).
    """
    cols = list(keep_cols)

    # No hash shuffle anywhere in this plan (read -> select -> map ->
    # repartition(1)), so schema-less empty blocks cannot occur; a
    # 0-row pandas batch passes through _skyline_pass typed.
    def local(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(_skyline_pass(batch[cols], max_col, min_col))

    def merge(batch: pd.DataFrame) -> pa.Table:
        out = _skyline_pass(batch, max_col, min_col)
        out = out.sort_values(
            [max_col, min_col, cols[0]],
            ascending=[False, True, True], kind="stable")
        return arrow_out(out.reset_index(drop=True))

    return strip_schema_metadata(ds.select_columns(cols)) \
        .map_batches(local, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def order_skyline(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Skyline of orders on (o_totalprice maximize, o_orderdate
    minimize) — "no later order was worth more": the Pareto frontier
    of order value over time."""
    return pareto_skyline(
        orders,
        max_col="o_totalprice", min_col="o_orderdate",
        keep_cols=["o_orderkey", "o_totalprice", "o_orderdate"])
