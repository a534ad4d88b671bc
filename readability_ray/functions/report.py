"""Corpus summary report — the one-row metrics table a pipeline run
logs next to its output (the north rule's "per-partition lineage +
metrics" at whole-corpus granularity; every curation stack emits one:
Dolma's corpus stats, CCNet's shard summaries).

One stateless partial-aggregation map (fixed-width rows per batch) +
a single tiny reduce for everything except the exact distinct-content
count, which needs ONE hash-keyed exchange (the exact_dedup shape:
per-batch md5 partials, per-partition distinct, partial counts
reduced).  Nothing corpus-sized ever reaches the driver.

Output (one row): n_docs, n_empty, total_tokens, total_chars,
n_langs, top_lang (ties lang asc), top_lang_docs, distinct_texts,
dup_docs (= n_docs - distinct_texts).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .util import arrow_out, strip_schema_metadata

_TOKEN_RE = r"[^ \t\n\r\f\v]+"


def corpus_report(ds: ray.data.Dataset, *, text_col: str = "text",
                  lang_col: str = "lang",
                  n_partitions: int | None = None) -> ray.data.Dataset:
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    n_parts = n_partitions or default_partitions()
    docs = strip_schema_metadata(ds.select_columns([text_col, lang_col]))

    def partials(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n_chars = pc.sum(pc.utf8_length(text)).as_py() or 0
        n_tokens = pc.sum(
            pc.count_substring_regex(text, _TOKEN_RE)).as_py() or 0
        n_empty = pc.sum(pc.equal(pc.utf8_length(text), 0)).as_py() or 0
        langs = pa.table({"lang": batch.column(lang_col)}) \
            .group_by("lang").aggregate([("lang", "count")])
        return pa.table({
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_empty": pa.array([int(n_empty)], pa.int64()),
            "total_tokens": pa.array([int(n_tokens)], pa.int64()),
            "total_chars": pa.array([int(n_chars)], pa.int64()),
            "langs": pa.array([langs.column("lang").to_pylist()],
                              pa.list_(pa.string())),
            "lang_counts": pa.array(
                [langs.column("lang_count").to_pylist()],
                pa.list_(pa.int64())),
        })

    # exact distinct-text count: one keyed exchange of md5 partials
    def hash_partials(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = sorted({hashlib.md5((t or "").encode()).hexdigest()
                     for t in texts})
        return pa.table({"h": pa.array(hs, pa.string())})

    def count_distinct(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "h" not in batch.columns:
            return pa.table({"n": pa.array([], pa.int64())})
        return pa.table({"n": pa.array(
            [int(batch["h"].nunique())], pa.int64())})

    distinct = docs.map_batches(hash_partials, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["h"]) \
        .map_batches(count_distinct, batch_format="pandas",
                     batch_size=None) \
        .sum("n") or 0

    import collections
    n_docs = n_empty = total_tokens = total_chars = 0
    lang_counter: collections.Counter = collections.Counter()
    for row in docs.map_batches(partials,
                                batch_format="pyarrow").take_all():
        n_docs += row["n_docs"]
        n_empty += row["n_empty"]
        total_tokens += row["total_tokens"]
        total_chars += row["total_chars"]
        for lang, c in zip(row["langs"], row["lang_counts"]):
            lang_counter[lang] += c

    if lang_counter:
        top_lang = min(lang_counter.items(),
                       key=lambda kv: (-kv[1], kv[0]))
    else:
        top_lang = ("", 0)
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_empty": pa.array([n_empty], pa.int64()),
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "total_chars": pa.array([total_chars], pa.int64()),
        "n_langs": pa.array([len(lang_counter)], pa.int64()),
        "top_lang": pa.array([top_lang[0]], pa.string()),
        "top_lang_docs": pa.array([int(top_lang[1])], pa.int64()),
        "distinct_texts": pa.array([int(distinct)], pa.int64()),
        "dup_docs": pa.array([n_docs - int(distinct)], pa.int64()),
    }))
