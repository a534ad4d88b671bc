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


def gini_coefficient(ds: ray.data.Dataset, *,
                     key_col: str = "n_chars",
                     id_col: str = "doc_id",
                     n_partitions: int | None = None
                     ) -> ray.data.Dataset:
    """EXACT Gini concentration coefficient of ``key_col`` — the
    corpus-inequality metric ("how much of the corpus mass sits in the
    biggest documents / hottest sources") computed as
    ``G = 2*sum(rank*x) / (n*sum(x)) - (n+1)/n`` over the ascending
    (key, id) order.

    Reuses :func:`global_rank`'s exact TeraSort ranks (one range
    exchange), then a constant-size tree reduce of (n, sum x,
    sum rank*x) — rank*x carried as Python big-int STRING partials
    (the correlation idiom), so the result is partitioning-invariant.
    Rank ties within equal keys don't affect sum(rank*x): permuting
    ranks among equal x leaves x*sum(ranks) unchanged, and the id
    tiebreak pins the order anyway.  The only float steps (two
    divisions, one subtract) are mirrored op-for-op in the HUGEINT
    SQL, floor-6.

    Output: ONE row (n, sum_key, gini).
    """
    def _big_sum(arr: np.ndarray) -> int:
        if len(arr) == 0:
            return 0
        cuts = np.arange(0, len(arr), 1024)
        return sum(int(x) for x in np.add.reduceat(arr, cuts))

    ranked = global_rank(ds, key_col=key_col, id_col=id_col,
                         descending=False, n_partitions=n_partitions)

    def partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or key_col not in batch.columns:
            # schema-less empty block off the range exchange — emit a
            # zero partial so the merge block always materializes
            return arrow_out(pd.DataFrame({
                "n": pd.Series([0], dtype="int64"),
                "sx": pd.Series(["0"], dtype="object"),
                "srx": pd.Series(["0"], dtype="object")}))
        x = batch[key_col].to_numpy(dtype=np.int64)
        r = batch["rank"].to_numpy(dtype=np.int64)
        return arrow_out(pd.DataFrame({
            "n": pd.Series([len(x)], dtype="int64"),
            "sx": pd.Series([str(_big_sum(x))], dtype="object"),
            "srx": pd.Series([str(_big_sum(r * x))], dtype="object"),
        }))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "n" not in batch.columns or \
                int(batch["n"].sum()) == 0:
            return pa.table({
                "n": pa.array([0], pa.int64()),
                "sum_key": pa.array([0], pa.int64()),
                "gini": pa.array([None], pa.float64())})
        n = int(batch["n"].sum())
        sx = sum(int(v) for v in batch["sx"])
        srx = sum(int(v) for v in batch["srx"])
        if sx == 0:
            g = None
        else:
            g = float(2 * srx) / float(n * sx) \
                - float(n + 1) / float(n)
            g = float(np.floor(g * 1e6) / 1e6)
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "sum_key": pa.array([sx], pa.int64()),
            "gini": pa.array([g], pa.float64())})

    return ranked.map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def trimmed_mean(ds: ray.data.Dataset, *,
                 val_col: str = "value",
                 id_col: str = "event_id",
                 trim_pct: float = 0.05,
                 n_partitions: int | None = None) -> ray.data.Dataset:
    """EXACT trimmed (truncated) mean — the robust-statistics export
    "mean of ``val_col`` after dropping the lowest and highest
    ``trim_pct`` of rows" (ties broken by id, so the dropped set is
    deterministic and partitioning-invariant).

    Values are fixed-point integer CENTS (the relational.py idiom) so
    the kept-mass sum re-associates freely; the global order comes
    from :func:`global_rank`'s TeraSort ranks (one range exchange over
    (id, cents) only), the trim bound is closed-form from the exact
    row count, and the kept sum is a constant-size big-int tree
    reduce.  The only float steps (one division) mirror op-for-op in
    the HUGEINT SQL at floor-6.

    Output: ONE row (n, n_trim_each, kept_n, trimmed_mean).
    """
    def _big_sum(arr: np.ndarray) -> int:
        if len(arr) == 0:
            return 0
        cuts = np.arange(0, len(arr), 1024)
        return sum(int(x) for x in np.add.reduceat(arr, cuts))

    def to_cents(batch: pd.DataFrame) -> pa.Table:
        return arrow_out(pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype=np.int64),
            "value_c2": np.rint(batch[val_col].to_numpy()
                                * 100).astype(np.int64)}))

    cents = strip_schema_metadata(
        ds.select_columns([id_col, val_col])) \
        .map_batches(to_cents, batch_format="pandas")
    total = int(ds.count())
    lo = int(np.floor(total * trim_pct))
    hi = total - lo  # keep ranks in (lo, hi]

    ranked = global_rank(cents, key_col="value_c2", id_col=id_col,
                         descending=False,
                         n_partitions=n_partitions)

    def partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "rank" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "m": pd.Series([0], dtype="int64"),
                "s": pd.Series(["0"], dtype="object")}))
        r = batch["rank"].to_numpy(dtype=np.int64)
        keep = (r > lo) & (r <= hi)
        c = batch["value_c2"].to_numpy(dtype=np.int64)[keep]
        return arrow_out(pd.DataFrame({
            "m": pd.Series([len(c)], dtype="int64"),
            "s": pd.Series([str(_big_sum(c))], dtype="object")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "m" not in batch.columns:
            m, s = 0, 0
        else:
            m = int(batch["m"].sum())
            s = sum(int(v) for v in batch["s"])
        mean = None if m == 0 else float(
            np.floor(float(s) / (100.0 * m) * 1e6) / 1e6)
        return pa.table({
            "n": pa.array([total], pa.int64()),
            "n_trim_each": pa.array([lo], pa.int64()),
            "kept_n": pa.array([m], pa.int64()),
            "trimmed_mean": pa.array([mean], pa.float64())})

    return ranked.map_batches(partials, batch_format="pandas") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)
