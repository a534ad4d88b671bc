"""Corpus-curation operators over the ``documents`` table.

The remaining classic stages of a pre-training data pipeline, each
expressed Ray-Data-first and SQL-oracle-checked where expressible:

- ``normalize_text``   canonical text form (lower + whitespace collapse)
- ``hash_split``       deterministic train/val/test assignment
- ``repetition_scores``  Gopher-style repetition quality signals
- ``source_cap``       per-source document budget (domain capping)
- ``decontaminate``    benchmark n-gram contamination scan
- ``pii_scan``         PII pattern counts (emails / IPs / phone-like)

Scale shapes: everything except ``source_cap`` is a stateless
vectorized / batch-local map (no shuffle at any corpus size);
``source_cap`` is ONE keyed hash shuffle + a per-partition pandas
pass (the round-3 shape — no per-group pandas calls, no Dataset-level
HashAggregate); ``decontaminate`` broadcasts the benchmark gram set
once via ``ray.put`` (benchmark suites are small by nature — the only
driver materialization is that small side).
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


def _floor6(x: np.ndarray) -> np.ndarray:
    # keep Ray and DuckDB float results hash-identical
    return np.floor(x * 1e6) / 1e6


# --------------------------------------------------------------------------
# normalize_text
# --------------------------------------------------------------------------

def _normalize_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    # utf8proc lower (same library DuckDB uses), RE2 whitespace class
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " "),
        characters=" ")
    md5 = [hashlib.md5(t.encode()).hexdigest()
           for t in norm.to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "norm_md5": pa.array(md5, pa.string()),
        "norm_chars": pc.utf8_length(norm).cast(pa.int64()),
    })


def normalize_text(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical text normalization: lowercase, collapse whitespace
    runs to single spaces, trim.  Emits the md5 of the normalized form
    (the join key for normalized-form dedup) — stateless vectorized
    map, no shuffle."""
    return ds.map_batches(_normalize_batch, batch_format="pyarrow")


# --------------------------------------------------------------------------
# hash_split
# --------------------------------------------------------------------------

def _hash_split_batch(batch: pa.Table, train_pct: int,
                      val_pct: int) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    buckets = np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
         for i in ids), dtype=np.int64, count=len(ids))
    split = np.where(buckets < train_pct, "train",
                     np.where(buckets < train_pct + val_pct,
                              "val", "test"))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "bucket": pa.array(buckets, pa.int64()),
        "split": pa.array(split.astype(object), pa.string()),
    })


def hash_split(ds: ray.data.Dataset, train_pct: int = 80,
               val_pct: int = 10) -> ray.data.Dataset:
    """Deterministic train/val/test assignment by content-independent
    id hash (md5 of the decimal doc_id, first 8 hex digits mod 100).
    Pure map — any worker computes the same split for the same row, so
    the assignment is stable across runs, cluster sizes and
    partitionings (the property that matters for resumable corpus
    builds)."""
    return ds.map_batches(_hash_split_batch, batch_format="pyarrow",
                          fn_kwargs={"train_pct": train_pct,
                                     "val_pct": val_pct})


# --------------------------------------------------------------------------
# repetition_scores (Gopher-style repetition signals)
# --------------------------------------------------------------------------

def _repetition_batch(batch: pa.Table) -> pa.Table:
    from collections import Counter
    n = len(batch)
    n_tokens = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    top_tok = np.zeros(n, dtype=np.int64)
    top_bi = np.zeros(n, dtype=np.int64)
    n_bigrams = np.zeros(n, dtype=np.int64)
    for row, text in enumerate(batch.column("text").to_pylist()):
        toks = _TOKEN_RE.findall(text)
        if not toks:
            continue
        counts = Counter(toks)
        n_tokens[row] = len(toks)
        n_distinct[row] = len(counts)
        top_tok[row] = max(counts.values())
        if len(toks) >= 2:
            bi = Counter(zip(toks, toks[1:]))
            n_bigrams[row] = len(toks) - 1
            top_bi[row] = max(bi.values())
    tok_denom = np.maximum(n_tokens, 1).astype(np.float64)
    bi_denom = np.maximum(n_bigrams, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "distinct_ratio": pa.array(_floor6(n_distinct / tok_denom),
                                   pa.float64()),
        "top_token_frac": pa.array(_floor6(top_tok / tok_denom),
                                   pa.float64()),
        "top_bigram_frac": pa.array(_floor6(top_bi / bi_denom),
                                    pa.float64()),
    })


def repetition_scores(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Repetition quality signals in the Gopher / MassiveText style:
    distinct-token ratio, most-frequent-token fraction, most-frequent-
    bigram fraction.  Heavily repetitive machine-generated text scores
    low distinct_ratio / high top fractions and gets gated before
    training.  Batch-local counting (one Counter pass per row inside
    a stateless map) — no shuffle at any corpus size."""
    return ds.map_batches(_repetition_batch, batch_format="pyarrow")


# --------------------------------------------------------------------------
# source_cap (domain / source budget)
# --------------------------------------------------------------------------

def source_cap(ds: ray.data.Dataset, k: int = 10,
               n_partitions: int | None = None) -> ray.data.Dataset:
    """Per-source document budget: keep the first ``k`` docs per source
    (by doc_id asc — deterministic).  The standard anti-domination
    step (no single domain/source floods the corpus).

    Shape: ONE hash shuffle co-locates each source
    (``repartition(keys=["source"])``), then a single vectorized
    per-partition pandas pass (sort + groupby.head) — no per-group
    pandas calls, no Dataset-level HashAggregate (BASELINE.md round-3
    lingering-actor finding).  Partitioning assumption: one source's
    doc-id rows (ids only, text never moves) fit in one partition.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()

    def cap(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "source" not in batch.columns:
            # hash-shuffle empty partitions arrive as schema-less blocks
            return arrow_out(pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "source": pd.Series([], dtype="object")}))
        kept = batch.sort_values(["source", "doc_id"]) \
            .groupby("source", sort=False).head(k)
        return arrow_out(kept[["doc_id", "source"]]
                         .reset_index(drop=True))

    return strip_schema_metadata(ds.select_columns(["doc_id", "source"])) \
        .repartition(num_blocks=n_parts, keys=["source"]) \
        .map_batches(cap, batch_format="pandas", batch_size=None)


def stratified_sample(ds: ray.data.Dataset, *, group_col: str = "lang",
                      k: int = 50, id_col: str = "doc_id",
                      n_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Balanced deterministic sampling: exactly min(k, |group|) docs
    per stratum, chosen by md5-of-id order — a content-independent
    pseudo-random draw that is REPRODUCIBLE across runs, cluster sizes
    and partitionings (the corpus-rebalancing step: equal-size
    language / source slices for training mixes).

    Shape: ids+group only cross the exchange; ONE hash shuffle
    co-locates each stratum, then a per-partition vectorized pass
    sorts by (group, md5(id), id) and keeps each group's head-k."""
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()

    def sample(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or group_col not in batch.columns:
            return arrow_out(pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 group_col: pd.Series([], dtype="object")}))
        rank = [hashlib.md5(str(i).encode()).hexdigest()
                for i in batch[id_col]]
        kept = batch.assign(_rank=rank) \
            .sort_values([group_col, "_rank", id_col]) \
            .groupby(group_col, sort=False).head(k)
        return arrow_out(kept[[id_col, group_col]]
                         .reset_index(drop=True))

    return strip_schema_metadata(ds.select_columns([id_col, group_col])) \
        .repartition(num_blocks=n_parts, keys=[group_col]) \
        .map_batches(sample, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# decontaminate (benchmark n-gram overlap)
# --------------------------------------------------------------------------

def _word_grams(text: str, n: int) -> list:
    toks = _TOKEN_RE.findall(text)
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def benchmark_gram_set(bench: ray.data.Dataset, *, ngram_n: int = 5,
                       text_col: str = "text") -> frozenset:
    """Distinct word n-grams of a (small) benchmark dataset.

    Per-batch distinct first, so the driver unions batch-deduped gram
    lists, never raw gram streams.  Benchmark suites are the small
    side by nature (a test set, not a corpus) — this is the one
    intended driver materialization, feeding a single ``ray.put``
    broadcast."""

    def distinct_grams(batch: pa.Table) -> pa.Table:
        grams: set = set()
        for text in batch.column(text_col).to_pylist():
            grams.update(_word_grams(text, ngram_n))
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    parts = bench.map_batches(distinct_grams,
                              batch_format="pyarrow").take_all()
    return frozenset(row["gram"] for row in parts)


def decontaminate(ds: ray.data.Dataset, bench: ray.data.Dataset, *,
                  ngram_n: int = 5,
                  text_col: str = "text") -> ray.data.Dataset:
    """Benchmark contamination scan: for each corpus document, the
    fraction of its word n-grams that appear anywhere in the benchmark
    set (the standard pre-training decontamination test — docs above a
    threshold get dropped or flagged before training).

    Shape: the benchmark gram set is built once and broadcast with
    ``ray.put`` (read by every map task, never re-shipped per batch);
    the corpus side is a stateless batch-local membership count — no
    shuffle, corpus text never moves."""
    gram_ref = ray.put(benchmark_gram_set(bench, ngram_n=ngram_n,
                                          text_col=text_col))
    _memo: dict = {}  # per-worker-process ray.get memo (one fetch each)

    def scan(batch: pa.Table, *, grams_ref) -> pa.Table:
        grams = _memo.get("g")
        if grams is None:
            grams = _memo["g"] = ray.get(grams_ref)
        m = len(batch)
        n_grams = np.zeros(m, dtype=np.int64)
        n_contam = np.zeros(m, dtype=np.int64)
        for row, text in enumerate(batch.column(text_col).to_pylist()):
            doc_grams = _word_grams(text, ngram_n)
            n_grams[row] = len(doc_grams)
            n_contam[row] = sum(1 for g in doc_grams if g in grams)
        frac = _floor6(n_contam /
                       np.maximum(n_grams, 1).astype(np.float64))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_contam": pa.array(n_contam, pa.int64()),
            "contam_frac": pa.array(frac, pa.float64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow",
                          fn_kwargs={"grams_ref": gram_ref})


# --------------------------------------------------------------------------
# pii_scan
# --------------------------------------------------------------------------

# RE2 patterns, byte-identical on both sides (pyarrow.compute and
# DuckDB both run RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def _pii_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    n_emails = pc.count_substring_regex(text, EMAIL_RE).cast(pa.int64())
    n_ipv4 = pc.count_substring_regex(text, IPV4_RE).cast(pa.int64())
    n_phones = pc.count_substring_regex(text, PHONE_RE).cast(pa.int64())
    total = pc.add(pc.add(n_emails, n_ipv4), n_phones)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_emails": n_emails,
        "n_ipv4": n_ipv4,
        "n_phones": n_phones,
        "has_pii": pc.greater(total, 0).cast(pa.int64()),
    })


def pii_scan(ds: ray.data.Dataset) -> ray.data.Dataset:
    """PII pattern counts per document (emails, IPv4 literals,
    NNN-NNN-NNNN phone-like runs) — the flag/redact gate of a corpus
    pipeline.  Stateless vectorized RE2 map, no shuffle."""
    return ds.map_batches(_pii_batch, batch_format="pyarrow")


def pii_redact(ds: ray.data.Dataset,
               replacement: str = "[PII]") -> ray.data.Dataset:
    """Redacting variant: replaces every PII match with ``replacement``
    and emits the redacted text plus the replacement count.  Same RE2
    kernels, still a stateless vectorized map."""

    def redact(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        before = pc.utf8_length(text).cast(pa.int64())
        out = text
        n_hits = None
        for pat in (EMAIL_RE, IPV4_RE, PHONE_RE):
            hits = pc.count_substring_regex(out, pat).cast(pa.int64())
            n_hits = hits if n_hits is None else pc.add(n_hits, hits)
            out = pc.replace_substring_regex(out, pat, replacement)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": out,
            "n_redactions": n_hits,
            "n_chars_before": before,
        })

    return ds.map_batches(redact, batch_format="pyarrow")


# --------------------------------------------------------------------------
# gopher_rules (the classic Gopher/MassiveText document filters)
# --------------------------------------------------------------------------

_GOPHER_STOPS = ("and", "be", "have", "of", "that", "the", "to", "with")
_ELLIPSIS_RE = re.compile(r"\.\.\.")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_ASCII_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")
_LINE_STRIP = " \t\r\f\v"


def _gopher_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    n_words, mean_len, sym, bullet, ellip, alpha, stops, passed = \
        [], [], [], [], [], [], [], []
    for t in texts:
        t = t or ""
        words = _ASCII_TOKEN_RE.findall(t)
        nw = len(words)
        nonws = sum(len(w) for w in words)
        mw = math.floor((nonws / nw if nw else 0.0) * 1e6) / 1e6
        sy = math.floor(((t.count("#") + len(_ELLIPSIS_RE.findall(t)))
                         / nw if nw else 0.0) * 1e6) / 1e6
        lines = [ln.strip(_LINE_STRIP) for ln in t.split("\n")] \
            if t else []
        nl = len(lines)
        bf = math.floor((sum(ln.startswith(("-", "*", "•"))
                             for ln in lines) / nl if nl else 0.0)
                        * 1e6) / 1e6
        ef = math.floor((sum(ln.endswith(("...", "…"))
                             for ln in lines) / nl if nl else 0.0)
                        * 1e6) / 1e6
        af = math.floor((sum(1 for w in words if _ALPHA_RE.search(w))
                         / nw if nw else 0.0) * 1e6) / 1e6
        low = t.lower()
        ns = sum(1 for s in _GOPHER_STOPS
                 if re.search(rf"\b{s}\b", low))
        ok = (50 <= nw <= 100_000 and 3.0 <= mw <= 10.0
              and sy < 0.1 and bf <= 0.9 and ef <= 0.3
              and af >= 0.8 and ns >= 2)
        n_words.append(nw)
        mean_len.append(mw)
        sym.append(sy)
        bullet.append(bf)
        ellip.append(ef)
        alpha.append(af)
        stops.append(ns)
        passed.append(ok)
    return pa.table({
        "doc_id": ids,
        "n_words": pa.array(n_words, pa.int64()),
        "mean_word_len": pa.array(mean_len, pa.float64()),
        "symbol_ratio": pa.array(sym, pa.float64()),
        "bullet_frac": pa.array(bullet, pa.float64()),
        "ellipsis_frac": pa.array(ellip, pa.float64()),
        "alpha_frac": pa.array(alpha, pa.float64()),
        "n_stop_distinct": pa.array(stops, pa.int64()),
        "pass_gopher": pa.array(passed, pa.bool_()),
    })


def gopher_rules(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The classic Gopher / MassiveText document filters (Rae et al.
    2021, Appendix A) beyond the repetition signals already in
    :func:`repetition_scores`: word-count band [50, 100k], mean word
    length band [3, 10], symbol-to-word ratio (# and ...) < 0.1,
    bullet-started lines ≤ 90%, ellipsis-ended lines ≤ 30%, ≥ 80% of
    words containing an alphabetic character, and ≥ 2 distinct
    stop-words from the canonical 8-word list.  Emits every rule's
    measured value (floor-6 floats) plus the composite
    ``pass_gopher`` verdict — the decision thresholds are applied to
    the FLOORED values so the verdict is bit-reproducible in SQL.

    One stateless batch-local map — no shuffle at any corpus size.
    """
    return strip_schema_metadata(ds.select_columns(["doc_id", "text"])) \
        .map_batches(_gopher_batch, batch_format="pyarrow")


# --------------------------------------------------------------------------
# weighted_sample_k (Efraimidis–Spirakis A-ES, deterministic)
# --------------------------------------------------------------------------

def _aes_key(doc_id, weight: float) -> float:
    """A-ES key ln(u)/w with u a deterministic md5-uniform in (0, 1):
    top-k by key desc IS a weighted sample without replacement
    (Efraimidis & Spirakis 2006).  md5-derived u makes the draw
    reproducible across runs, partitionings and cluster sizes, and
    bit-reconstructable in SQL."""
    x = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:16], 16)
    # float(x)/2^64 is an exact power-of-two scaling of the rounded
    # mantissa — bit-identical to SQL's UBIGINT::DOUBLE / 2^64; the
    # x == 0 guard (p = 2^-64) keeps ln defined
    u = float(x) / float(1 << 64) if x else 2.0 ** -64
    return math.log(u) / weight


def _aes_keys_floor6(ids, weights) -> np.ndarray:
    """Vectorized ``_aes_key`` + floor-6: the md5 draw stays one
    (bounded, post-aggregation) hash call per id; the scale / ln /
    floor arithmetic runs as single numpy passes.  uint64→float64
    conversion rounds identically to ``float(x)``, and np.log agrees
    with math.log at floor-6 on this stack (probed over 50k draws —
    ulp-level differences never straddle a 1e-6 boundary)."""
    xs = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:16],
                       16) for i in ids], dtype=np.uint64)
    u = xs.astype(np.float64) / float(1 << 64)
    u[xs == np.uint64(0)] = 2.0 ** -64
    w = np.asarray(weights, dtype=np.float64)
    return np.floor(np.log(u) / w * 1e6) / 1e6


def weighted_sample_k(ds: ray.data.Dataset, *, k: int = 50,
                      weight_col: str, id_col: str = "doc_id",
                      n_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Weighted sample WITHOUT replacement of exactly min(k, N)
    rows — inclusion probability proportional to ``weight_col``
    (e.g. token count: long documents proportionally more likely, the
    standard corpus-subsampling draw).  Rows with weight ≤ 0 are
    excluded.

    Shape: the A-ES key is computed batch-locally (ids + weights only);
    a per-block vectorized top-k then ONE single-block merge picks the
    global head — the token_frequency_topk two-level shape; nothing
    corpus-sized moves.  Keys are floor-6 truncated BEFORE selection
    and ties break id asc, so the chosen set is bit-reproducible in
    SQL (ln is cross-engine-stable at floor-6 on this stack — the
    tfidf/lmscore precedent).

    Output: (id_col, weight_col, sample_key) ordered by
    (sample_key desc, id asc).
    """
    # plan-time schema peek so string-keyed datasets work and the
    # empty-block guard emits the right dtypes (round-3 advice: the id
    # column was hardcoded int64 despite the generic id_col API)
    sch = ds.schema()
    id_type = sch.types[sch.names.index(id_col)]
    weight_type = sch.types[sch.names.index(weight_col)]

    def keyed(batch: pa.Table) -> pa.Table:
        wcol = batch.column(weight_col)
        b = batch.filter(pc.and_kleene(pc.is_valid(wcol),
                                       pc.greater(wcol, 0)))
        keys = _aes_keys_floor6(
            b.column(id_col).to_pylist(),
            b.column(weight_col).to_numpy(zero_copy_only=False))
        return pa.table({
            id_col: b.column(id_col).cast(id_type),
            weight_col: b.column(weight_col).cast(weight_type),
            "sample_key": pa.array(keys, pa.float64()),
        })

    def topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "sample_key" not in batch.columns:
            return pa.table({
                id_col: pa.array([], id_type),
                weight_col: pa.array([], weight_type),
                "sample_key": pa.array([], pa.float64())})
        return arrow_out(batch.sort_values(
            ["sample_key", id_col], ascending=[False, True]).head(k)
            .reset_index(drop=True))

    local = strip_schema_metadata(
        ds.select_columns([id_col, weight_col])) \
        .map_batches(keyed, batch_format="pyarrow") \
        .map_batches(topk, batch_format="pandas")
    return local.repartition(1).map_batches(topk, batch_format="pandas",
                                            batch_size=None)


def source_mixture_weights(ds: ray.data.Dataset, *,
                           alpha: float = 0.3,
                           source_col: str = "source",
                           text_col: str = "text",
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """Temperature-based sampling weights per source — the
    multilingual/domain mixing rule (mT5/XLM-R: p_i ∝ n_i^alpha;
    alpha < 1 upsamples the tail, alpha = 1 is proportional).

    Output per source: (source, n_docs, n_tokens, weight,
    upsampling) — ``weight`` = n_tokens^alpha / Σ n^alpha (floor-6),
    ``upsampling`` = weight / (n_tokens / Σ n_tokens) (floor-6), the
    factor by which the source is over/under-sampled vs proportional.

    Scale shape: per-batch partials collapse each block to ≤|sources|
    rows; the merge is ONE single block (source cardinality is
    bounded — the pricing_summary shape, no hash shuffle); the
    normalization is a driver-free second pass over that block.
    """
    import math as _math

    import pandas as _pd

    from .lmscore import _TOKEN_RE

    def partials(batch: pa.Table) -> pa.Table:
        srcs = batch.column(source_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        agg: dict = {}
        for s, t in zip(srcs, texts):
            n = len(_TOKEN_RE.findall(t or ""))
            d, tok = agg.get(s, (0, 0))
            agg[s] = (d + 1, tok + n)
        keys = sorted(agg)
        return pa.table({
            "source": pa.array(keys, pa.string()),
            "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
            "n_tokens": pa.array([agg[k][1] for k in keys],
                                 pa.int64()),
        })

    def merge(batch: _pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "source" not in batch.columns:
            return pa.table({
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "weight": pa.array([], pa.float64()),
                "upsampling": pa.array([], pa.float64())})
        g = batch.groupby("source", as_index=False, sort=True).sum()
        pows = [_math.pow(t, alpha) if t > 0 else 0.0
                for t in g["n_tokens"]]
        z = sum(pows)
        total = int(g["n_tokens"].sum())
        weights, ups = [], []
        for t, p in zip(g["n_tokens"], pows):
            w = p / z if z > 0 else 0.0
            prop = t / total if total > 0 else 0.0
            weights.append(_math.floor(w * 1e6) / 1e6)
            ups.append(_math.floor((w / prop if prop > 0 else 0.0)
                                   * 1e6) / 1e6)
        g["weight"] = weights
        g["upsampling"] = ups
        g["n_docs"] = g["n_docs"].astype("int64")
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return arrow_out(g[["source", "n_docs", "n_tokens", "weight",
                            "upsampling"]])

    return strip_schema_metadata(
        ds.select_columns([source_col, text_col])) \
        .map_batches(partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def ccnet_buckets(ds: ray.data.Dataset, *,
                  lang_col: str = "lang",
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  quantiles: tuple = (1 / 3, 2 / 3)
                  ) -> ray.data.Dataset:
    """CCNet-style head/middle/tail bucketing (Wenzek 2020 §4.3):
    per-language score terciles split the corpus into quality tiers a
    sampler can weight (CCNet keeps "head" preferentially).

    The score here is the whitespace token count (an exact integer —
    the same explicit ASCII class as lmscore, RE2-parity-proven); the
    production knob is any integer score column via the same shape.
    Thresholds use nearest-rank (``quantile_disc``) semantics: the
    q-threshold is the smallest score whose per-lang cumulative count
    reaches ceil(q × n_lang); bucket = head if score <= t(1/3),
    middle if <= t(2/3), else tail — ties land LOW, exactly
    reproducible in SQL.

    Scale shape: pass 1 builds a per-(lang, score) value-count
    HISTOGRAM (partials per batch, one tiny merge block — O(distinct
    scores × langs), never O(rows)); the |langs|×2 threshold table
    broadcasts via ray.put; pass 2 is one stateless assign map.  Zero
    corpus-side exchanges.
    """
    from .lmscore import _TOKEN_RE, _get_broadcast

    def score_of(texts: list) -> list:
        return [len(_TOKEN_RE.findall(t or "")) for t in texts]

    def hist_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": [(x or "") for x in
                     batch.column(lang_col).to_pylist()],
            "score": score_of(batch.column(text_col).to_pylist()),
        })
        g = df.groupby(["lang", "score"], as_index=False, sort=False) \
            .size().rename(columns={"size": "cnt"})
        return arrow_out(g)

    def thresholds(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return arrow_out(pd.DataFrame({
                "lang": pd.Series([], dtype="object"),
                "t1": pd.Series([], dtype="int64"),
                "t2": pd.Series([], dtype="int64")}))
        rows = []
        for lang, g in batch.groupby("lang", sort=True):
            h = g.groupby("score", sort=True)["cnt"].sum()
            values = h.index.to_numpy()
            cum = h.to_numpy().cumsum()
            n = int(cum[-1])
            ts = [int(values[np.searchsorted(
                cum, max(1, int(np.ceil(q * n))))])
                for q in quantiles]
            rows.append({"lang": lang, "t1": ts[0], "t2": ts[1]})
        return arrow_out(pd.DataFrame(rows))

    th = strip_schema_metadata(ds.select_columns([lang_col, text_col])) \
        .map_batches(hist_partials, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(thresholds, batch_format="pandas",
                     batch_size=None)
    tmap = {r["lang"]: (int(r["t1"]), int(r["t2"]))
            for r in th.take_all()}
    tref = ray.put(tmap)

    def assign(batch: pa.Table, *, ref) -> pa.Table:
        tm = _get_broadcast(ref)
        langs = [(x or "") for x in batch.column(lang_col).to_pylist()]
        scores = score_of(batch.column(text_col).to_pylist())
        buckets = []
        for lang, s in zip(langs, scores):
            t1, t2 = tm.get(lang, (0, 0))
            buckets.append("head" if s <= t1
                           else ("middle" if s <= t2 else "tail"))
        return pa.table({
            id_col: batch.column(id_col),
            "lang": pa.array(langs, pa.string()),
            "n_tokens": pa.array(scores, pa.int64()),
            "bucket": pa.array(buckets, pa.string()),
        })

    return strip_schema_metadata(
        ds.select_columns([id_col, lang_col, text_col])) \
        .map_batches(assign, batch_format="pyarrow",
                     fn_kwargs={"ref": tref})


def compression_ratios(ds: ray.data.Dataset, *,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       level: int = 6) -> ray.data.Dataset:
    """zlib compression ratio per document — the classic cheap
    redundancy signal crawl-quality filters use beside Gopher rules
    (boilerplate/template/spam text compresses far below prose; a
    ratio near 1 flags binary-ish noise).

    ``ratio`` = compressed_len / max(1, utf8_len), floor-6.  zlib at a
    fixed level is deterministic for a given input across runs and
    machines (same library), so the column is reproducible, but no
    SQL engine exposes zlib — the driver check is rows-only and the
    value surface is pinned by unit tests.  ONE stateless map."""
    import zlib

    from .util import strip_schema_metadata

    def run(batch: pa.Table) -> pa.Table:
        ratios, comp_lens, raw_lens = [], [], []
        for t in batch.column(text_col).to_pylist():
            raw = (t or "").encode("utf-8")
            comp = zlib.compress(raw, level)
            ratios.append(
                math.floor(len(comp) / max(1, len(raw)) * 1e6) / 1e6)
            comp_lens.append(len(comp))
            raw_lens.append(len(raw))
        return pa.table({
            id_col: batch.column(id_col),
            "raw_bytes": pa.array(raw_lens, pa.int64()),
            "compressed_bytes": pa.array(comp_lens, pa.int64()),
            "compression_ratio": pa.array(ratios, pa.float64()),
        })

    return strip_schema_metadata(
        ds.select_columns([id_col, text_col])) \
        .map_batches(run, batch_format="pyarrow")


def host_split(ds: ray.data.Dataset, *, train_pct: int = 80,
               val_pct: int = 10, url_col: str = "url",
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Leakage-safe train/val/test assignment by HOST hash — the
    web-corpus split rule (same-site pages are near-duplicates and
    template-share; splitting by doc id leaks them across sets, so
    evaluation-grade splits key on the registrable host).

    Same deterministic md5-bucket arithmetic as ``hash_split`` applied
    to the lowercased hostname: every page of a host lands in ONE
    split, stable across runs, partitionings and cluster sizes.  Pure
    map, zero shuffle.  Output: (id_col, host, bucket, split)."""
    from urllib.parse import urlsplit

    def run(batch: pa.Table) -> pa.Table:
        hosts = []
        for u in batch.column(url_col).to_pylist():
            try:
                hosts.append((urlsplit(u or "").hostname or "").lower())
            except ValueError:
                hosts.append("")
        buckets = np.fromiter(
            (int(hashlib.md5(h.encode()).hexdigest()[:8], 16) % 100
             for h in hosts), dtype=np.int64, count=len(hosts))
        split = np.where(buckets < train_pct, "train",
                         np.where(buckets < train_pct + val_pct,
                                  "val", "test"))
        return pa.table({
            id_col: batch.column(id_col),
            "host": pa.array(hosts, pa.string()),
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(split.astype(object), pa.string()),
        })

    return strip_schema_metadata(
        ds.select_columns([id_col, url_col])) \
        .map_batches(run, batch_format="pyarrow")


# --------------------------------------------------------------------------
# corpus_divergence (distribution-drift check between two corpus slices)
# --------------------------------------------------------------------------

def corpus_divergence(ds: ray.data.Dataset, *,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      split_bucket: int = 50,
                      k: int = 20,
                      n_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Unigram KL-divergence drift between two deterministic halves of
    the corpus — the distribution-shift check a training pipeline runs
    between corpus drops (did the token distribution move?).  Side A =
    md5 id-hash bucket < ``split_bucket`` (the hash_split family, so
    the assignment is stable across runs and partitionings), side B =
    the rest; add-one smoothing over the UNION vocabulary; output the
    ``k`` tokens most over-represented in A by per-token contribution
    ``p_a * ln(p_a / q_b)`` with ``p_a = (cnt_a+1)/(N_a+V)`` (floor-6,
    op-for-op the SQL oracle's form; ties -> token asc).  No float
    total is emitted — each row's contribution is independent, so the
    result is partitioning-invariant.

    Scale shape: per-batch side-tagged token combiners (vocab-sized
    partials, never the token stream), ONE token-keyed exchange, the
    compact (token, cnt_a, cnt_b) vocab table materialized once and
    reused for the three scalar aggregates (tree reduce) and the
    contribution map; per-partition local top-k then a single-block
    merge — the driver never sees more than partitions x k rows.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out, strip_schema_metadata

    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    proj = strip_schema_metadata(ds.select_columns([id_col, text_col]))

    def partials(batch: pa.Table) -> pa.Table:
        from collections import Counter
        ca: Counter = Counter()
        cb: Counter = Counter()
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for i, text in zip(ids, texts):
            bucket = int(hashlib.md5(
                str(i).encode()).hexdigest()[:8], 16) % 100
            (ca if bucket < split_bucket else cb).update(
                _TOKEN_RE.findall(text))
        vocab = sorted(set(ca) | set(cb))
        return pa.table({
            "token": pa.array(vocab, pa.string()),
            "cnt_a": pa.array([ca.get(t, 0) for t in vocab],
                              pa.int64()),
            "cnt_b": pa.array([cb.get(t, 0) for t in vocab],
                              pa.int64())})

    vocab_empty = pd.DataFrame({
        "token": pd.Series([], dtype="object"),
        "cnt_a": pd.Series([], dtype="int64"),
        "cnt_b": pd.Series([], dtype="int64")})

    def sum_partials(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "token" not in batch.columns:
            return arrow_out(vocab_empty.copy())
        g = batch.groupby("token", as_index=False, sort=False)[
            ["cnt_a", "cnt_b"]].sum()
        g["cnt_a"] = g["cnt_a"].astype("int64")
        g["cnt_b"] = g["cnt_b"].astype("int64")
        return arrow_out(g)

    vocab = proj.map_batches(partials, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["token"]) \
        .map_batches(sum_partials, batch_format="pandas",
                     batch_size=None) \
        .materialize()

    na = int(vocab.sum("cnt_a") or 0)
    nb = int(vocab.sum("cnt_b") or 0)
    v = int(vocab.count())

    out_empty = pd.DataFrame({
        "token": pd.Series([], dtype="object"),
        "cnt_a": pd.Series([], dtype="int64"),
        "cnt_b": pd.Series([], dtype="int64"),
        "contrib": pd.Series([], dtype="float64")})

    def topk(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "token" not in batch.columns:
            return arrow_out(out_empty.copy())
        p = (batch["cnt_a"].to_numpy(np.int64) + 1).astype(
            np.float64) / float(na + v)
        q = (batch["cnt_b"].to_numpy(np.int64) + 1).astype(
            np.float64) / float(nb + v)
        batch = batch.copy()
        # floor-6 BEFORE top-k selection so the k-set and tie order
        # match the SQL's ORDER BY contrib DESC, token LIMIT k
        batch["contrib"] = np.floor(p * np.log(p / q) * 1e6) / 1e6
        batch["_neg"] = -batch["contrib"]
        batch = batch.sort_values(["_neg", "token"]).head(k)
        return arrow_out(batch[["token", "cnt_a", "cnt_b", "contrib"]]
                         .reset_index(drop=True))

    return vocab.map_batches(topk, batch_format="pandas",
                             batch_size=None) \
        .repartition(1) \
        .map_batches(topk, batch_format="pandas")
