"""Exact substring deduplication (Lee, Ippolito et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022 — the ExactSubstr
family), at token-gram granularity.

Any run of ``k`` whitespace tokens that occurs at least ``min_count``
times across the corpus (counting repeats WITHIN a document too) is
treated as duplicated text, and every token covered by any occurrence
of a duplicated gram is removed from every document ("drop-all":
deterministic and order-independent, so the result does not depend on
block arrival order — the property a distributed engine needs; the
paper's keep-one-copy variant requires a global occurrence order and is
deliberately not the default semantics here).  Spans longer than ``k``
duplicated tokens are handled for free: each of their length-``k``
sub-grams is duplicated, and the union of the covering windows is the
whole span.

Output text is whitespace-normalized (kept tokens rejoined with single
spaces) — the same convention as ``chunk_documents``; ExactSubstr also
operates on tokenized text.

Gram keys are ``md5(" ".join(tokens[i:i+k]))`` hex strings so the whole
operator carries a VALUE-LEVEL DuckDB oracle (md5 + list-slice SQL); a
rolling-hash key would shave CPU but lose the bit-identical oracle, and
the exchange volume — the term that matters at corpus scale — is
identical.

Two value-identical strategies (the ``line_dedup`` pattern):

- ``"colocate"`` (default — the 100 TB shape): gram rows
  (gram_key, id, pos) cross ONE gram-key exchange where the count and
  the hit emission are partition-local; the (id, pos) hits — ids only —
  and the document rows then cross ONE doc-key exchange (union + keyed
  repartition, no Acero join) where the span cut is a vectorized
  difference-array pass.  The duplicated-gram set never exists in any
  single process, so a dup-heavy corpus (where that set is itself
  corpus-sized) cannot blow a driver or worker heap.
- ``"broadcast"``: document text never moves — one gram-key-only
  exchange computes occurrence counts, the duplicated keys are
  collected once and ``ray.put``, and each document is cleaned
  batch-locally by recomputing its gram keys.  Only safe when the
  duplicated-gram set is known to be small (bounded by
  total_grams / min_count, which at min_count=2 is NOT small in
  general — hence not the default).  Scans ``ds`` twice: feed it a
  stored table, not an expensive live plan.

No reference counterpart (corpus-level operator); the per-document
extraction it feeds on reimplements /root/reference/src/extract.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


def _gram_keys(tokens: list, k: int) -> list:
    """md5 hex of each k-token window (empty when len(tokens) < k)."""
    return [hashlib.md5(" ".join(tokens[i:i + k]).encode()).hexdigest()
            for i in range(len(tokens) - k + 1)]


def _covered_mask(n: int, starts: np.ndarray, k: int) -> np.ndarray:
    """Boolean mask of tokens covered by any window [p, p+k), via a
    difference array — O(n + hits), no per-hit slice assignment."""
    d = np.zeros(n + 1, dtype=np.int64)
    np.add.at(d, starts, 1)
    np.add.at(d, np.minimum(starts + np.int64(k), np.int64(n)), -1)
    return np.cumsum(d[:n]) > 0


def _clean_doc(tokens: list, starts: np.ndarray, k: int
               ) -> tuple[str, int]:
    """(clean_text, n_removed) after cutting every covered token."""
    n = len(tokens)
    if n == 0 or len(starts) == 0:
        return " ".join(tokens), 0
    covered = _covered_mask(n, starts, k)
    kept = [t for t, c in zip(tokens, covered) if not c]
    return " ".join(kept), int(covered.sum())


def substring_dedup(ds: ray.data.Dataset, *, k: int = 16,
                    min_count: int = 2, strategy: str = "colocate",
                    id_col: str = "doc_id", text_col: str = "text",
                    n_partitions: int | None = None) -> ray.data.Dataset:
    """Remove every duplicated ≥k-token run from every document.

    See the module docstring for semantics and the two scale shapes.
    Output: (id_col, clean_text, n_tokens, n_removed) — one row per
    input document (empty / shorter-than-k documents pass through with
    n_removed = 0 and whitespace-normalized text).
    """
    if k <= 0 or min_count < 2:
        raise ValueError("k must be positive and min_count >= 2")
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    docs = strip_schema_metadata(ds.select_columns([id_col, text_col]))

    if strategy == "broadcast":
        return _substring_dedup_broadcast(docs, k, min_count, id_col,
                                          text_col, n_parts)
    if strategy != "colocate":
        raise ValueError(f"unknown strategy {strategy!r}")

    # plan-time id dtype so string-keyed corpora survive the
    # empty-shuffle-block guards (round-3 advice: hardcoded int64)
    sch = ds.schema()
    id_type = sch.types[sch.names.index(id_col)]

    def explode_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_pos, out_g = [], [], []
        for i, t in zip(ids, texts):
            gs = _gram_keys(_TOKEN_RE.findall(t or ""), k)
            out_id.extend([i] * len(gs))
            out_pos.extend(range(len(gs)))
            out_g.extend(gs)
        return pa.table({
            "gram_key": pa.array(out_g, pa.string()),
            id_col: pa.array(out_id, batch.schema.field(id_col).type),
            "pos": pa.array(out_pos, pa.int64()),
        })

    def dup_hits(batch: pd.DataFrame) -> pa.Table:
        # gram-key partition: every occurrence of a gram is local here
        if len(batch) == 0 or "gram_key" not in batch.columns:
            return pa.table({
                id_col: pa.array([], id_type),
                "pos": pa.array([], pa.int64())})
        c = batch.groupby("gram_key", sort=False)["gram_key"] \
            .transform("size")
        return arrow_out(batch.loc[c >= min_count, [id_col, "pos"]]
                         .reset_index(drop=True))

    hits = docs.map_batches(explode_grams, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["gram_key"]) \
        .map_batches(dup_hits, batch_format="pandas", batch_size=None)

    # union trick: tag document rows pos = -1 / hit rows text = NULL,
    # co-locate both by the doc key in one exchange, cut per partition
    # (no Acero join — hash-shuffle empty blocks would crash it, and a
    # row join would duplicate the text once per hit).
    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            text_col: batch.column(text_col).cast(pa.string()),
            "pos": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
        })

    def tag_hits(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_type),
                text_col: pa.array([], pa.string()),
                "pos": pa.array([], pa.int64())})
        return pa.table({
            id_col: batch.column(id_col),
            text_col: pa.array([None] * batch.num_rows, pa.string()),
            "pos": batch.column("pos"),
        })

    tagged = docs.map_batches(tag_docs, batch_format="pyarrow") \
        .union(hits.map_batches(tag_hits, batch_format="pyarrow"))

    def cut(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "pos" not in batch.columns:
            return arrow_out(pd.DataFrame({
                id_col: pd.Series([], dtype="object"),
                "clean_text": pd.Series([], dtype="object"),
                "n_tokens": pd.Series([], dtype="int64"),
                "n_removed": pd.Series([], dtype="int64")}))
        is_doc = batch["pos"] < 0
        starts_by_id = {i: g.to_numpy()
                        for i, g in batch.loc[~is_doc]
                        .groupby(id_col, sort=False)["pos"]}
        out_id, out_text, out_n, out_rm = [], [], [], []
        empty = np.empty(0, dtype=np.int64)
        for i, t in zip(batch.loc[is_doc, id_col],
                        batch.loc[is_doc, text_col]):
            toks = _TOKEN_RE.findall(t or "")
            clean, removed = _clean_doc(
                toks, starts_by_id.get(i, empty), k)
            out_id.append(i)
            out_text.append(clean)
            out_n.append(len(toks))
            out_rm.append(removed)
        return arrow_out(pd.DataFrame({
            id_col: out_id, "clean_text": out_text,
            "n_tokens": pd.Series(out_n, dtype="int64"),
            "n_removed": pd.Series(out_rm, dtype="int64")}))

    return tagged.repartition(num_blocks=n_parts, keys=[id_col]) \
        .map_batches(cut, batch_format="pandas", batch_size=None)


def _substring_dedup_broadcast(docs: ray.data.Dataset, k: int,
                               min_count: int, id_col: str,
                               text_col: str,
                               n_parts: int) -> ray.data.Dataset:
    import ray

    def explode_keys(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = []
        for t in texts:
            out.extend(_gram_keys(_TOKEN_RE.findall(t or ""), k))
        return pa.table({"gram_key": pa.array(out, pa.string())})

    def dup_keys(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "gram_key" not in batch.columns:
            return pa.table({"gram_key": pa.array([], pa.string())})
        c = batch.groupby("gram_key", sort=False).size()
        return pa.table({"gram_key": pa.array(
            c[c >= min_count].index.to_numpy(), pa.string())})

    dup = docs.map_batches(explode_keys, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["gram_key"]) \
        .map_batches(dup_keys, batch_format="pandas", batch_size=None) \
        .take_all()  # the duplicated-gram set — the one driver hop
    dup_ref = ray.put(frozenset(r["gram_key"] for r in dup))
    _memo: dict = {}  # per-worker ray.get memo (one fetch each)

    def clean(batch: pa.Table, *, ref) -> pa.Table:
        dup_set = _memo.get("d")
        if dup_set is None:
            dup_set = _memo["d"] = ray.get(ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_text, out_n, out_rm = [], [], []
        for t in texts:
            toks = _TOKEN_RE.findall(t or "")
            starts = np.array(
                [p for p, g in enumerate(_gram_keys(toks, k))
                 if g in dup_set], dtype=np.int64)
            clean_t, removed = _clean_doc(toks, starts, k)
            out_text.append(clean_t)
            out_n.append(len(toks))
            out_rm.append(removed)
        return pa.table({
            id_col: batch.column(id_col),
            "clean_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "n_removed": pa.array(out_rm, pa.int64()),
        })

    return docs.map_batches(clean, batch_format="pyarrow",
                            fn_kwargs={"ref": dup_ref})
