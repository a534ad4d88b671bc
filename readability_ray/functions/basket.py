"""Market-basket analysis: co-purchase pair counts.

``copurchase_pairs`` counts, for every unordered pair of distinct parts
(part_a < part_b), how many orders contain BOTH — the support table a
recommender's "frequently bought together" candidates come from.

Scale shape (100 TB): two keyed exchanges, both on integer keys.

1. ``(l_orderkey, l_partkey)`` projected at the read — ids only, no
   payload columns ever move.
2. Exchange 1 keyed on ``l_orderkey`` co-locates each basket; pair
   explosion is the vectorized repeat + intra-run arange idiom (same as
   ``graph.triangle_count``'s wedge explode) — per-order cost is
   m·(m−1)/2 with m bounded by basket size (≤ 7 for TPC-H lineitem),
   so the explode is linear in output, never quadratic in the table.
3. A partition-local partial count collapses duplicate pairs before
   exchange 2 (keyed on the pair), after which every pair's total
   count lives in exactly one partition: partition-local top-k by the
   total order (n_orders DESC, part_a, part_b) is globally valid, and
   the single-block merge sees ≤ k × partitions rows.

No Dataset-level HashAggregate (lingering-aggregator starvation,
BASELINE.md round-3 finding), no Acero join, nothing materializes the
pair space on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

_EMPTY = {
    "part_a": pd.Series([], dtype="int64"),
    "part_b": pd.Series([], dtype="int64"),
    "n_orders": pd.Series([], dtype="int64"),
}


def copurchase_pairs(lineitem: ray.data.Dataset, *,
                     k: int = 50,
                     n_partitions: int | None = None) -> ray.data.Dataset:
    """Top-``k`` part pairs by the number of orders containing both.

    Ties are broken by (part_a, part_b) ascending, making the top-k
    deterministic even in the long count-1 tail.
    """
    from ..state import default_partitions, ensure_hash_shuffle

    nparts = n_partitions or default_partitions()
    proj = strip_schema_metadata(
        lineitem.select_columns(["l_orderkey", "l_partkey"]))
    ensure_hash_shuffle(proj)

    def pair_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "l_orderkey" not in batch.columns:
            return arrow_out(pd.DataFrame(_EMPTY))
        b = batch.drop_duplicates(["l_orderkey", "l_partkey"]) \
            .sort_values(["l_orderkey", "l_partkey"], kind="stable")
        okey = b["l_orderkey"].to_numpy(dtype=np.int64)
        part = b["l_partkey"].to_numpy(dtype=np.int64)
        n = len(okey)
        new = np.concatenate(([True], okey[1:] != okey[:-1]))
        gid = np.cumsum(new) - 1
        start = np.flatnonzero(new)
        sizes = np.diff(np.append(start, n))
        loc = np.arange(n) - start[gid]
        left_counts = sizes[gid] - 1 - loc
        total = int(left_counts.sum())
        if total == 0:
            return arrow_out(pd.DataFrame(_EMPTY))
        lefts = np.repeat(np.arange(n), left_counts)
        run_starts = np.concatenate(([0], np.cumsum(left_counts)[:-1]))
        intra = np.arange(total) - np.repeat(run_starts, left_counts)
        rights = lefts + 1 + intra
        frame = pd.DataFrame({
            "part_a": part[lefts],            # sorted within order ⇒ a < b
            "part_b": part[rights],
            "n_orders": np.ones(total, dtype=np.int64),
        })
        return arrow_out(frame.groupby(["part_a", "part_b"],
                                       as_index=False, sort=False).sum())

    def local_topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "part_a" not in batch.columns:
            return arrow_out(pd.DataFrame(_EMPTY))
        g = batch.groupby(["part_a", "part_b"], as_index=False,
                          sort=False).sum()
        g = g.sort_values(["n_orders", "part_a", "part_b"],
                          ascending=[False, True, True],
                          kind="stable").head(k)
        return arrow_out(g.astype({"part_a": "int64", "part_b": "int64",
                                   "n_orders": "int64"}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "part_a" not in batch.columns:
            return arrow_out(pd.DataFrame(_EMPTY))
        g = batch.sort_values(["n_orders", "part_a", "part_b"],
                              ascending=[False, True, True],
                              kind="stable").head(k)
        return arrow_out(g.reset_index(drop=True))

    pairs = proj \
        .repartition(num_blocks=nparts, keys=["l_orderkey"]) \
        .map_batches(pair_partials, batch_format="pandas",
                     batch_size=None) \
        .repartition(num_blocks=nparts, keys=["part_a", "part_b"]) \
        .map_batches(local_topk, batch_format="pandas", batch_size=None)
    return pairs.repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)
