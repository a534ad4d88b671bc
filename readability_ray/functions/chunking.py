"""Segment-level corpus operators: passage chunking (RAG / context-
window prep) and cross-document line dedup (CCNet-style boilerplate
removal over extracted page text).

- ``chunk_documents``  overlapping fixed-size token windows per
  document — the standard retrieval/packing chunker (window W, stride
  S; the last chunk is the first one whose window reaches the end, so
  no fully-redundant tail chunks).  Embarrassingly parallel: ONE
  stateless vectorized map, no exchange; exactly reproducible, so it
  carries a value-level DuckDB oracle (list-slice window arithmetic).

- ``line_dedup``  removes lines whose document frequency across the
  corpus exceeds a threshold (navigation, footers, cookie banners —
  the boilerplate that survives per-page extraction because every
  page of a site shares it; CCNet's paragraph dedup, Wenzek et al.
  2020, at line granularity).  Two value-identical scale shapes (see
  the function docstring): the default ``broadcast`` strategy moves
  only (id, line_key) pairs through one exchange and broadcasts the
  tiny hot set back — the document text never crosses any exchange;
  ``colocate`` ships the lines through a line-key exchange (df count
  and drop partition-local, no driver set) and reassembles via a
  doc-key exchange — the fallback when the hot set itself could be
  corpus-sized.

Reference: the per-document extraction these feed on is the engine's
reimplementation of /root/reference/src/extract (see extract.py); the
corpus-level segmentation itself has no reference counterpart.
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
# the exact strip set mirrored by the SQL differential (ASCII
# whitespace minus \n, which cannot occur inside a split line)
_STRIP_CHARS = " \t\r\f\v"


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def chunk_documents(ds: ray.data.Dataset, window: int = 32,
                    stride: int = 24, include_text: bool = False,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """Overlapping token-window chunks per document.

    Whitespace tokens; chunk ``i`` covers tokens
    ``[i*stride, i*stride + window)``; chunks are emitted for
    ``i = 0 .. ceil(max(n - window, 0) / stride)`` (the first window
    that reaches the document end is the last — a shorter stride-tail
    that would add no new tokens is never emitted).  Zero-token
    documents produce no chunks.

    Output: (id_col, chunk_index, begin_token, n_tokens, chunk_md5
    [, chunk_text]) — md5 of the space-rejoined window, so the whole
    operator is value-checkable in SQL.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_ci, out_begin, out_n, out_md5 = [], [], [], [], []
        out_text: list[str] = []
        for i, t in zip(ids, texts):
            toks = _TOKEN_RE.findall(t or "")
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 + max(0, -(-(n - window) // stride))
            for ci in range(n_chunks):
                s = ci * stride
                piece = toks[s:s + window]
                joined = " ".join(piece)
                out_id.append(i)
                out_ci.append(ci)
                out_begin.append(s)
                out_n.append(len(piece))
                out_md5.append(hashlib.md5(joined.encode()).hexdigest())
                if include_text:
                    out_text.append(joined)
        id_type = batch.schema.field(id_col).type
        cols = {
            id_col: pa.array(out_id, id_type),
            "chunk_index": pa.array(out_ci, pa.int64()),
            "begin_token": pa.array(out_begin, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_md5": pa.array(out_md5, pa.string()),
        }
        if include_text:
            cols["chunk_text"] = pa.array(out_text, pa.string())
        return pa.table(cols)

    return strip_schema_metadata(ds.select_columns([id_col, text_col])) \
        .map_batches(chunk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def _explode_lines(batch: pa.Table, id_col: str,
                   text_col: str) -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_id, out_idx, out_line, out_key = [], [], [], []
    for i, t in zip(ids, texts):
        # empty-after-strip lines are formatting, not boilerplate:
        # never counted or dropped, their key is transit-only — salt
        # it per document ("b:"+id, distinguishable from 32-hex real
        # keys) so the corpus's blank lines spread across the line-key
        # exchange instead of all hashing to ONE partition (round-3
        # advice: markdown makes blank lines ubiquitous)
        blank_key = f"b:{i}"
        for j, ln in enumerate((t or "").split("\n")):
            s = ln.strip(_STRIP_CHARS)
            out_id.append(i)
            out_idx.append(j)
            out_line.append(ln)
            out_key.append(hashlib.md5(s.encode()).hexdigest()
                           if s else blank_key)
    return pa.table({
        id_col: pa.array(out_id, batch.schema.field(id_col).type),
        "line_idx": pa.array(out_idx, pa.int64()),
        "line": pa.array(out_line, pa.string()),
        "line_key": pa.array(out_key, pa.string()),
    })


def _explode_keys(batch: pa.Table, id_col: str,
                  text_col: str) -> pa.Table:
    """Lean exploder for the broadcast strategy: (id, line_key) pairs
    only — 40 bytes/line on the wire instead of the line text."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_id, out_key = [], []
    for i, t in zip(ids, texts):
        for ln in (t or "").split("\n"):
            s = ln.strip(_STRIP_CHARS)
            if s:
                out_id.append(i)
                out_key.append(hashlib.md5(s.encode()).hexdigest())
    return pa.table({
        id_col: pa.array(out_id, batch.schema.field(id_col).type),
        "line_key": pa.array(out_key, pa.string()),
    })


def line_dedup(ds: ray.data.Dataset, max_doc_freq: int = 5,
               id_col: str = "url", text_col: str = "markdown",
               strategy: str = "broadcast",
               n_partitions: int | None = None) -> ray.data.Dataset:
    """Cross-document boilerplate line removal: a (stripped, non-empty)
    line occurring in MORE THAN ``max_doc_freq`` distinct documents is
    dropped from every document; kept lines are rejoined with
    ``\\n`` in their original order.

    Two value-identical strategies:

    - ``"broadcast"`` (default): the document text NEVER moves.  One
      ids-only exchange ((id, line_key) pairs, ~40 B/line) computes
      per-partition doc frequencies; the hot keys (df > max_doc_freq)
      — bounded by total_lines / max_doc_freq, and in practice the
      handful of genuinely shared boilerplate lines — are collected
      once, ``ray.put``, and every document is cleaned batch-locally.
    - ``"colocate"``: no driver-side set at all — the exploded lines
      (with text) cross a line-key exchange where the df count AND the
      drop are partition-local, then a doc-key exchange reassembles.
      The fallback when max_doc_freq is tiny enough that the hot set
      itself could be corpus-sized.

    Broadcast caveat: ``ds`` is scanned TWICE (the ids-only frequency
    pass, then the clean pass), so feed it a stored table — e.g. the
    written extraction output, as a real pipeline would — not an
    expensive live plan, or Ray will recompute that plan both times
    (``colocate`` scans once).

    Output: (id_col, clean_text, n_lines, n_removed).  Documents whose
    every line was removed (or that were empty) come back with
    ``clean_text = ""``.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()

    if strategy == "broadcast":
        return _line_dedup_broadcast(ds, max_doc_freq, id_col, text_col,
                                     n_parts)
    if strategy != "colocate":
        raise ValueError(f"unknown strategy {strategy!r}")

    lines = strip_schema_metadata(ds.select_columns([id_col, text_col])) \
        .map_batches(_explode_lines, batch_format="pyarrow",
                     fn_kwargs={"id_col": id_col, "text_col": text_col})

    def drop_frequent(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "line_key" not in batch.columns:
            return arrow_out(pd.DataFrame({
                id_col: pd.Series([], dtype="object"),
                "line_idx": pd.Series([], dtype="int64"),
                "line": pd.Series([], dtype="object"),
                "removed": pd.Series([], dtype="bool")}))
        counted = batch[~batch["line_key"].str.startswith("b:")]
        df = counted.groupby("line_key", sort=False)[id_col].nunique()
        hot = set(df[df > max_doc_freq].index)
        removed = batch["line_key"].isin(hot) if hot else \
            pd.Series(False, index=batch.index)
        return arrow_out(batch.assign(removed=removed)
                         [[id_col, "line_idx", "line", "removed"]])

    marked = lines.repartition(num_blocks=n_parts, keys=["line_key"]) \
        .map_batches(drop_frequent, batch_format="pandas",
                     batch_size=None)

    def reassemble(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "line" not in batch.columns:
            return arrow_out(pd.DataFrame({
                id_col: pd.Series([], dtype="object"),
                "clean_text": pd.Series([], dtype="object"),
                "n_lines": pd.Series([], dtype="int64"),
                "n_removed": pd.Series([], dtype="int64")}))
        b = batch.sort_values([id_col, "line_idx"])
        kept = b[~b["removed"]]
        text = kept.groupby(id_col, sort=False)["line"] \
            .agg("\n".join)
        stats = b.groupby(id_col, sort=False).agg(
            n_lines=("line_idx", "size"), n_removed=("removed", "sum"))
        out = stats.join(text.rename("clean_text")).reset_index()
        out["clean_text"] = out["clean_text"].fillna("")
        out["n_removed"] = out["n_removed"].astype("int64")
        return arrow_out(out[[id_col, "clean_text", "n_lines",
                              "n_removed"]])

    return marked.repartition(num_blocks=n_parts, keys=[id_col]) \
        .map_batches(reassemble, batch_format="pandas", batch_size=None)


def _line_dedup_broadcast(ds: ray.data.Dataset, max_doc_freq: int,
                          id_col: str, text_col: str,
                          n_parts: int) -> ray.data.Dataset:
    import ray

    keys = strip_schema_metadata(ds.select_columns([id_col, text_col])) \
        .map_batches(_explode_keys, batch_format="pyarrow",
                     fn_kwargs={"id_col": id_col, "text_col": text_col})

    def hot_keys(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "line_key" not in batch.columns:
            return pa.table({"line_key": pa.array([], pa.string())})
        df = batch.groupby("line_key", sort=False)[id_col].nunique()
        return pa.table({"line_key": pa.array(
            df[df > max_doc_freq].index.to_numpy(), pa.string())})

    hot = keys.repartition(num_blocks=n_parts, keys=["line_key"]) \
        .map_batches(hot_keys, batch_format="pandas", batch_size=None) \
        .take_all()  # the boilerplate set itself — the one driver hop
    hot_ref = ray.put(frozenset(r["line_key"] for r in hot))
    _memo: dict = {}  # per-worker ray.get memo (one fetch each)

    def clean(batch: pa.Table, *, ref) -> pa.Table:
        hot_set = _memo.get("h")
        if hot_set is None:
            hot_set = _memo["h"] = ray.get(ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_text, out_n, out_rm = [], [], []
        for t in texts:
            lines = (t or "").split("\n")
            kept, removed = [], 0
            for ln in lines:
                s = ln.strip(_STRIP_CHARS)
                if s and hashlib.md5(s.encode()).hexdigest() in hot_set:
                    removed += 1
                else:
                    kept.append(ln)
            out_text.append("\n".join(kept))
            out_n.append(len(lines))
            out_rm.append(removed)
        return pa.table({
            id_col: batch.column(id_col),
            "clean_text": pa.array(out_text, pa.string()),
            "n_lines": pa.array(out_n, pa.int64()),
            "n_removed": pa.array(out_rm, pa.int64()),
        })

    return strip_schema_metadata(ds.select_columns([id_col, text_col])) \
        .map_batches(clean, batch_format="pyarrow",
                     fn_kwargs={"ref": hot_ref})
