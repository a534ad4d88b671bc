"""BM25 ranked retrieval over the documents table — the scoring pass
a training-data pipeline uses for targeted retrieval (decontamination
probes, quality spot-checks, query-focused corpus slices).

Classic Okapi BM25 (Robertson & Walker 1994) with the Lucene-style
always-positive idf ``ln((N − df + 0.5)/(df + 0.5) + 1)``:

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Scale shape: the token stream never crosses an exchange.  One
stateless map pass sheds each document to a COMPACT row
(doc_id, dl, tf per query term — ids and small ints only); corpus
statistics (N, Σdl, per-term df) are constant-size mergeable partials
reduced in a single block and pulled to the driver as ONE tiny row
(the pagerank dangling-mass discipline); scoring is a second
stateless map over the compact table with the stats as closure
constants; top-k is two-level (partition-local head, single-block
merge).  No shuffle anywhere — the only exchanges are repartition(1)
merges of bounded partials.

Float contract: scores are floor-6 doubles derived from exact integer
(tf, dl, df, N, Σdl); numpy log and DuckDB ln agree at floor-6 on
this platform (BASELINE.md precedent: tfidf, lmscore).  Tokenization
is the engine's explicit ASCII class ``[^ \\t\\n\\r\\f\\v]+`` on both
the Python and RE2/DuckDB sides.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN = re.compile(r"[^ \t\n\r\f\v]+")

DEFAULT_QUERY = ("hash", "join", "window", "data")


def bm25_topk(ds: ray.data.Dataset, *,
              query_terms: tuple[str, ...] = DEFAULT_QUERY,
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"
              ) -> ray.data.Dataset:
    """Top-``k`` documents by BM25 score for ``query_terms``
    (exact-token match), ties broken by doc_id asc.

    Output: (doc_id, score) — score floor-6, rows with score > 0 only.
    """
    terms = tuple(sorted(set(query_terms)))
    tf_cols = [f"tf_{j}" for j in range(len(terms))]

    def compact(batch: pa.Table) -> pa.Table:
        import collections
        ids = batch.column(id_col).to_pylist()
        dl = np.zeros(len(ids), dtype=np.int64)
        tf = np.zeros((len(terms), len(ids)), dtype=np.int64)
        for i, text in enumerate(batch.column(text_col).to_pylist()):
            toks = _TOKEN.findall(text)
            dl[i] = len(toks)
            c = collections.Counter(toks)
            for j, t in enumerate(terms):
                tf[j, i] = c.get(t, 0)
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dl)}
        for j, name in enumerate(tf_cols):
            cols[name] = pa.array(tf[j])
        return pa.table(cols)

    compact_ds = strip_schema_metadata(
        ds.select_columns([id_col, text_col])) \
        .map_batches(compact, batch_format="pyarrow").materialize()

    # corpus stats: constant-size partials, single-block reduce,
    # ONE tiny driver row
    def stat_partials(batch: pd.DataFrame) -> pa.Table:
        cols = {"n_docs": pa.array([len(batch)], pa.int64()),
                "sum_dl": pa.array([int(batch["dl"].sum())],
                                   pa.int64())}
        for name in tf_cols:
            cols["df_" + name] = pa.array(
                [int((batch[name] > 0).sum())], pa.int64())
        return pa.table(cols)

    def stat_merge(batch: pd.DataFrame) -> pa.Table:
        return pa.table({c: pa.array([int(batch[c].sum())],
                                     pa.int64())
                         for c in batch.columns})

    stats = compact_ds.map_batches(stat_partials,
                                   batch_format="pandas") \
        .repartition(1) \
        .map_batches(stat_merge, batch_format="pandas",
                     batch_size=None).take_all()[0]
    n = stats["n_docs"]
    avgdl = stats["sum_dl"] / n if n else 1.0
    idf = [math.log((n - stats["df_" + name] + 0.5)
                    / (stats["df_" + name] + 0.5) + 1.0)
           for name in tf_cols]

    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float64")})

    def score_head(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "doc_id" not in batch.columns:
            return arrow_out(empty.copy())
        dl = batch["dl"].to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(batch), dtype=np.float64)
        for j, name in enumerate(tf_cols):
            tf = batch[name].to_numpy(dtype=np.float64)
            score += idf[j] * (tf * (k1 + 1.0)) / (tf + norm)
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
            "score": np.floor(score * 1e6) / 1e6})
        out = out[out["score"] > 0].sort_values(
            ["score", "doc_id"], ascending=[False, True],
            kind="stable").head(k)
        return arrow_out(out.reset_index(drop=True))

    def topk_merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "doc_id" not in batch.columns:
            return arrow_out(empty.copy())
        g = batch.sort_values(["score", "doc_id"],
                              ascending=[False, True],
                              kind="stable").head(k)
        return arrow_out(g.reset_index(drop=True))

    return compact_ds.map_batches(score_head, batch_format="pandas") \
        .repartition(1) \
        .map_batches(topk_merge, batch_format="pandas",
                     batch_size=None)
