"""Data Selection with Importance Resampling (Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS 2023)
— the DSIR shape with the hashed-ngram feature LM instantiated as the
engine's add-one-smoothed bigram model (functions/lmscore.py).

Per raw document x: ``log_ratio(x) = log P_target(x) − log P_raw(x)``
under two corpus-trained bigram models — one trained on the TARGET
distribution (the high-quality / in-domain corpus you want more of),
one on the RAW pool being filtered.  Documents are then selected by
the ratio (top-n, or Gumbel-top-k resampling on ``log_ratio`` for the
paper's soft sampling; both are driver-free order-by operations
downstream).

Scale shape: both models train with the lmscore machinery (one
vocab-keyed + one pair-keyed exchange of partials each — the VOCABULARY
IS SHARED, trained on the raw pool, so target and raw probabilities are
comparable over the same event space, as DSIR requires); the two models
ship to workers via one ``ray.put``; scoring is ONE stateless map over
the raw pool, no exchange.

Value-level DuckDB oracle: both LM CTEs re-derived in SQL (the target
model's counts filtered to the target subset), floor-6 floats.

No reference counterpart (corpus-level operator).
"""

from __future__ import annotations

import math

import pyarrow as pa
import ray.data

from .lmscore import _TOKEN_RE, _UNK, train_bigram_lm
from .util import strip_schema_metadata


def dsir_weights(raw_ds: ray.data.Dataset,
                 target_ds: ray.data.Dataset, *,
                 vocab_size: int = 50_000, min_bigram_count: int = 1,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_partitions: int | None = None,
                 max_model_entries: int = 5_000_000) -> ray.data.Dataset:
    """Importance log-ratios for every raw document.

    Output: (id_col, n_bigrams, logprob_target, logprob_raw,
    log_ratio) — log probabilities are SUMS over the document's
    bigrams (DSIR weighs whole documents), floor-6 truncated; higher
    ``log_ratio`` = more target-like.  Docs with < 2 tokens score 0.

    Driver-memory bound: both trainings stream their count pulls and
    raise past ``max_model_entries`` (see train_bigram_lm).  For a
    model whose size is CONSTANT in corpus size — the DSIR paper's
    actual construction — use ``dsir_weights_hashed``.
    """
    import ray

    docs = strip_schema_metadata(
        raw_ds.select_columns([id_col, text_col]))

    # shared event space: the vocabulary comes from the RAW pool; the
    # target model reuses it so the two sums are over identical
    # UNK-mapped bigram streams
    uni_raw, big_raw, v = train_bigram_lm(
        docs, vocab_size=vocab_size,
        min_bigram_count=min_bigram_count, text_col=text_col,
        n_partitions=n_partitions, max_model_entries=max_model_entries)
    uni_t, big_t, _ = _train_with_vocab(
        target_ds, frozenset(uni_raw), min_bigram_count=min_bigram_count,
        text_col=text_col, n_partitions=n_partitions,
        max_model_entries=max_model_entries)
    model_ref = ray.put((uni_raw, big_raw, uni_t, big_t, v))
    _memo: dict = {}

    def score(batch: pa.Table, *, ref) -> pa.Table:
        model = _memo.get("m")
        if model is None:
            model = _memo["m"] = ray.get(ref)
        u_r, b_r, u_t, b_t, vsz = model
        denom = vsz + 1
        texts = batch.column(text_col).to_pylist()
        out_nb, out_t, out_r, out_lr = [], [], [], []
        for t in texts:
            toks = _TOKEN_RE.findall(t or "")
            m = [tok if tok in u_r else _UNK for tok in toks]
            lp_t = lp_r = 0.0
            for a, b in zip(m, m[1:]):
                lp_t += math.log((b_t.get((a, b), 0) + 1)
                                 / (u_t.get(a, 0) + denom))
                lp_r += math.log((b_r.get((a, b), 0) + 1)
                                 / (u_r.get(a, 0) + denom))
            out_nb.append(max(len(toks) - 1, 0))
            out_t.append(math.floor(lp_t * 1e6) / 1e6)
            out_r.append(math.floor(lp_r * 1e6) / 1e6)
            out_lr.append(math.floor((lp_t - lp_r) * 1e6) / 1e6)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(out_nb, pa.int64()),
            "logprob_target": pa.array(out_t, pa.float64()),
            "logprob_raw": pa.array(out_r, pa.float64()),
            "log_ratio": pa.array(out_lr, pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            fn_kwargs={"ref": model_ref})


def _train_with_vocab(train_ds: ray.data.Dataset, vocab: frozenset, *,
                      min_bigram_count: int, text_col: str,
                      n_partitions: int | None,
                      max_model_entries: int = 5_000_000
                      ) -> tuple[dict, dict, int]:
    """Bigram-LM counts over ``train_ds`` against a FIXED vocabulary
    (unigram counts recounted on this corpus, same UNK mapping) — the
    shared-event-space variant DSIR's target model needs.  One
    token-keyed exchange for the unigram recount and one
    (tok_a, tok_b)-keyed exchange for the pair counts, both of
    per-batch partials."""
    import collections

    import pandas as pd
    import ray

    from ..state import default_partitions, ensure_hash_shuffle
    from .lmscore import _bigram_partials
    from .util import arrow_out
    ensure_hash_shuffle(train_ds)
    n_parts = n_partitions or default_partitions()
    docs = strip_schema_metadata(train_ds.select_columns([text_col]))
    vocab_ref = ray.put(vocab)

    def uni_partials(batch: pa.Table) -> pa.Table:
        from .lmscore import _get_broadcast
        v = _get_broadcast(vocab_ref)
        counter: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            counter.update(t for t in _TOKEN_RE.findall(text or "")
                           if t in v)
        if not counter:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        tokens, counts = zip(*counter.items())
        return pa.table({"token": pa.array(tokens, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    def sum_uni(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "token" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "token": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")}))
        return arrow_out(batch.groupby("token", as_index=False,
                                       sort=False)["n"].sum())

    uni_rows = docs.map_batches(uni_partials, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["token"]) \
        .map_batches(sum_uni, batch_format="pandas", batch_size=None) \
        .take_all()
    unigram = {r["token"]: int(r["n"]) for r in uni_rows}

    def sum_prune(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "tok_a" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "tok_a": pd.Series([], dtype="object"),
                "tok_b": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")}))
        g = batch.groupby(["tok_a", "tok_b"], as_index=False,
                          sort=False)["n"].sum()
        return arrow_out(g[g["n"] >= min_bigram_count]
                         .reset_index(drop=True))

    from .lmscore import pull_bigram_rows
    merged = docs.map_batches(
        _bigram_partials, batch_format="pyarrow",
        fn_kwargs={"vocab_ref": vocab_ref, "text_col": text_col}) \
        .repartition(num_blocks=n_parts, keys=["tok_a", "tok_b"]) \
        .map_batches(sum_prune, batch_format="pandas",
                     batch_size=None)
    bigram = pull_bigram_rows(merged, max_model_entries)
    return unigram, bigram, len(vocab)


# ---------------------------------------------------------------------------
# hashed-feature DSIR (the paper's actual fixed-bucket construction)
# ---------------------------------------------------------------------------


def _hashed_bucket_counts(ds: ray.data.Dataset, *, n_buckets: int,
                          text_col: str) -> tuple["np.ndarray", int]:
    """Distributed hashed-bigram counts: per-batch partials collapse
    each block to ≤ n_buckets rows, merged in ONE single-block pandas
    pass (the pricing_summary shape — bounded-cardinality key, no hash
    shuffle).  Returns (counts[n_buckets], total)."""
    import numpy as np
    import pandas as pd

    from .dedup import _md5_64
    from .util import arrow_out

    def partials(batch: pa.Table) -> pa.Table:
        counts = np.zeros(n_buckets, dtype=np.int64)
        for t in batch.column(text_col).to_pylist():
            toks = _TOKEN_RE.findall(t or "")
            for a, b in zip(toks, toks[1:]):
                counts[_md5_64(f"{a} {b}".encode("utf-8"))
                       % n_buckets] += 1
        nz = np.flatnonzero(counts)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "bucket" not in batch.columns:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return arrow_out(batch.groupby("bucket", as_index=False,
                                       sort=False)["n"].sum())

    rows = strip_schema_metadata(ds.select_columns([text_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None) \
        .take_all()  # ≤ n_buckets rows — constant in corpus size
    counts = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        counts[int(r["bucket"])] = int(r["n"])
    return counts, int(counts.sum())


def dsir_weights_hashed(raw_ds: ray.data.Dataset,
                        target_ds: ray.data.Dataset, *,
                        n_buckets: int = 10_000,
                        id_col: str = "doc_id", text_col: str = "text"
                        ) -> ray.data.Dataset:
    """DSIR with the paper's hashed n-gram features (Xie et al. 2023
    §3: bigrams hashed into a FIXED 10k-bucket space) — the variant
    whose model size is constant in corpus size, so the driver dict
    bound that limits ``dsir_weights`` at 100 TB disappears.

    Bucket: md5 of ``"tok_a tok_b"`` (tokens never contain spaces),
    first 8 bytes little-endian uint64, mod ``n_buckets`` — the same
    md5-LE construction every other oracle-checked hash here uses, so
    DuckDB re-derives the bucket ids exactly.  Per-corpus bucket
    distributions are add-one smoothed over the bucket space:
    ``p(b) = (c[b] + 1) / (total + n_buckets)``.

    Output: (id_col, n_bigrams, logprob_target, logprob_raw,
    log_ratio), ln-sums floor-6 truncated; docs with < 2 tokens
    score 0.  Both trainings are one stateless partial pass + one
    single-block merge — no hash shuffle, no unbounded driver state.
    """
    import ray

    import numpy as np

    from .dedup import _md5_64

    c_raw, n_raw = _hashed_bucket_counts(
        raw_ds, n_buckets=n_buckets, text_col=text_col)
    c_tgt, n_tgt = _hashed_bucket_counts(
        target_ds, n_buckets=n_buckets, text_col=text_col)
    # ship the two ln-probability tables, not the raw counts: the
    # per-bucket ln is precomputed once (vectorized) instead of per
    # document occurrence
    ln_raw = np.log((c_raw + 1.0) / (n_raw + n_buckets))
    ln_tgt = np.log((c_tgt + 1.0) / (n_tgt + n_buckets))
    model_ref = ray.put((ln_tgt, ln_raw))

    docs = strip_schema_metadata(
        raw_ds.select_columns([id_col, text_col]))

    def score(batch: pa.Table, *, ref) -> pa.Table:
        from .lmscore import _get_broadcast
        lt, lr = _get_broadcast(ref)
        texts = batch.column(text_col).to_pylist()
        out_nb, out_t, out_r, out_lr = [], [], [], []
        for t in texts:
            toks = _TOKEN_RE.findall(t or "")
            if len(toks) < 2:
                out_nb.append(0)
                out_t.append(0.0)
                out_r.append(0.0)
                out_lr.append(0.0)
                continue
            bks = np.fromiter(
                (_md5_64(f"{a} {b}".encode("utf-8")) % n_buckets
                 for a, b in zip(toks, toks[1:])),
                dtype=np.int64, count=len(toks) - 1)
            lp_t = float(lt[bks].sum())
            lp_r = float(lr[bks].sum())
            out_nb.append(len(toks) - 1)
            out_t.append(math.floor(lp_t * 1e6) / 1e6)
            out_r.append(math.floor(lp_r * 1e6) / 1e6)
            out_lr.append(math.floor((lp_t - lp_r) * 1e6) / 1e6)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(out_nb, pa.int64()),
            "logprob_target": pa.array(out_t, pa.float64()),
            "logprob_raw": pa.array(out_r, pa.float64()),
            "log_ratio": pa.array(out_lr, pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            fn_kwargs={"ref": model_ref})
