"""Distributed global ORDER BY with exact row numbers — the TeraSort
shape (O'Malley 2008): sample-derived range splitters, one range
exchange, per-range vectorized sort, and global offsets from exact
per-range counts.  This is the operator behind "export the corpus in
ranked order" — full-output ORDER BY semantics that a top-k cannot
serve.

Scale shape: three passes, all over the (id, key) projection only —
the payload never moves.  Pass 0 pulls a BOUNDED sample — each batch
ships at most 64 evenly-spaced order statistics of its keys, so the
driver pull scales with batch count, never rows — and cuts range
splitters on the driver.  Pass 1 bincounts rows per range
(constant-size partials, single-block merge, driver pull of B ints)
→ exclusive prefix sums = each range's global offset.  Pass 2 assigns
each row its range (vectorized searchsorted against the broadcast
splitters), co-locates ranges with ONE keyed exchange, sorts each
range in-partition, and emits rank = offset[range] + local position.
Every row's rank is exact and partitioning-invariant because ranges
partition the KEY SPACE (equal keys share a range) and ties break on
the id column inside the in-partition sort.

No reference counterpart (corpus-level operator); oracle =
``row_number() OVER (ORDER BY key DESC, id ASC)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata


def global_rank(ds: ray.data.Dataset, *,
                key_col: str = "n_chars",
                id_col: str = "doc_id",
                descending: bool = True,
                n_partitions: int | None = None,
                points_per_batch: int = 64) -> ray.data.Dataset:
    """Exact global rank of every row by (key desc|asc, id asc).

    Output: (id, key, rank) with rank in 1..N, bit-equal to the SQL
    ``row_number()`` window at any partitioning.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()
    sign = -1 if descending else 1

    slim = strip_schema_metadata(ds.select_columns([id_col, key_col]))

    # -- pass 0: bounded order-statistic sample -> range splitters ---
    # Each batch ships at most `points_per_batch` evenly-spaced order
    # statistics (NOT a row fraction): the driver pull is bounded by
    # batch count, never by corpus size.  Splitter quality only
    # affects range balance, not output correctness.
    def sample(batch: pd.DataFrame) -> pa.Table:
        keys = np.sort(batch[key_col].to_numpy(dtype=np.int64))
        if len(keys) > points_per_batch:
            keys = keys[np.linspace(0, len(keys) - 1,
                                    points_per_batch,
                                    dtype=np.int64)]
        return arrow_out(pd.DataFrame({"key": keys}))

    sampled = np.sort(np.array(
        [r["key"] for r in
         slim.map_batches(sample, batch_format="pandas").take_all()],
        dtype=np.int64) * sign)
    if len(sampled) >= 2 * k:
        cuts = sampled[np.linspace(0, len(sampled) - 1, k,
                                   dtype=np.int64)[1:]]
        splitters = np.unique(cuts)
    else:
        splitters = np.array([], dtype=np.int64)
    n_bins = len(splitters) + 1

    def bin_of(keys: np.ndarray) -> np.ndarray:
        # ranges partition the key space: equal keys share a bin
        return np.searchsorted(splitters, keys.astype(np.int64) * sign,
                               side="right").astype(np.int64)

    # -- pass 1: exact rows per range -> exclusive prefix offsets ----
    def bin_counts(batch: pd.DataFrame) -> pa.Table:
        c = np.bincount(bin_of(batch[key_col].to_numpy()),
                        minlength=n_bins)
        return arrow_out(pd.DataFrame({
            "bin": np.arange(n_bins, dtype=np.int64),
            "n": c.astype(np.int64)}))

    def count_merge(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby("bin", as_index=False, sort=True)["n"].sum()
        return arrow_out(g)

    counts = slim.map_batches(bin_counts, batch_format="pandas") \
        .repartition(1) \
        .map_batches(count_merge, batch_format="pandas",
                     batch_size=None).take_all()
    per_bin = np.zeros(n_bins, dtype=np.int64)
    for r in counts:
        per_bin[int(r["bin"])] = int(r["n"])
    offsets = np.concatenate(([0], np.cumsum(per_bin)[:-1]))

    # -- pass 2: range exchange + in-partition sort + offset ---------
    def tag(batch: pd.DataFrame) -> pa.Table:
        b = batch[[id_col, key_col]].copy()
        b["bin"] = bin_of(batch[key_col].to_numpy())
        return arrow_out(b)

    def rank(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            key_col: pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "bin" not in batch.columns:
            return arrow_out(empty)
        b = batch.sort_values(["bin", key_col, id_col],
                              ascending=[True, not descending, True],
                              kind="stable")
        bins = b["bin"].to_numpy()
        starts = np.flatnonzero(np.r_[True, bins[1:] != bins[:-1]])
        local = np.arange(len(b), dtype=np.int64) \
            - np.repeat(starts, np.diff(np.append(starts, len(b))))
        r = offsets[bins] + local + 1
        return arrow_out(pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype=np.int64),
            key_col: b[key_col].to_numpy(dtype=np.int64),
            "rank": r}))

    return slim.map_batches(tag, batch_format="pandas") \
        .repartition(num_blocks=max(2, min(k, n_bins)), keys=["bin"]) \
        .map_batches(rank, batch_format="pandas", batch_size=None)


def doc_ntile(ds: ray.data.Dataset, *, n: int = 10,
              key_col: str = "n_chars", id_col: str = "doc_id",
              descending: bool = True,
              n_partitions: int | None = None) -> ray.data.Dataset:
    """NTILE over the whole corpus: each row's bucket 1..n under the
    global (key desc|asc, id asc) order — the window-function shape
    behind decile reports and percentile-bucketed joins.

    Rides global_rank (rank is exact and partitioning-invariant), then
    the bucket is CLOSED-FORM from (rank, N): SQL ntile gives the
    first N%n buckets one extra row, so with big = N%n and small =
    N//n, bucket = (rank-1)//(small+1) + 1 inside the big span and
    big + (rank-1-big*(small+1))//small + 1 past it — one vectorized
    expression, no second pass over the data.  N rides along as a
    count aggregate; no extra exchange beyond global_rank's one.

    Output: (id, key, rank, bucket).
    """
    ranked = global_rank(ds, key_col=key_col, id_col=id_col,
                         descending=descending,
                         n_partitions=n_partitions)
    total = int(ds.count())
    small, big = total // n, total % n

    def bucket(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "rank" not in batch.columns:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64())})
        r = batch["rank"].to_numpy(dtype=np.int64) - 1
        cut = big * (small + 1)
        if small == 0:
            # degenerate N < n: ntile gives each row its own bucket
            b = r + 1
        else:
            b = np.where(r < cut, r // (small + 1),
                         big + (r - cut) // small) + 1
        out = batch.copy()
        out["bucket"] = b.astype(np.int64)
        return arrow_out(out)

    return ranked.map_batches(bucket, batch_format="pandas")
