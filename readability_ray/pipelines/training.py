"""The composed training-data pipeline: crawl pages → training chunks.

One call chains the engine's stages the way a real 100 TB pre-training
corpus build does:

    pages (url, warc_ts, html)
      1. URL dedup            keep earliest crawl per url (ONE keyed
                              exchange of the full rows — extract_pipeline
                              .dedup_pages_by_url)
      2. extraction           stateless-task map → (url, markdown)
      -- checkpoint --        materialized once: exactly where the real
                              pipeline writes parquet + lineage
                              (pipelines/resume.py); keeps the lazy plan
                              under the >4-shuffle accretion limit and
                              lets the broadcast line-dedup's two passes
                              read object-store blocks, not re-extract
      3. boilerplate removal  line_dedup broadcast (ids-only exchange +
                              ray.put hot set; text never moves)
      4. quality gate         vectorized min-length filter
      5. exact content dedup  md5(clean_text) keyed exchange, keep min url
      6. passage chunking     stateless windowed chunker

    → (url, chunk_index, begin_token, n_tokens, chunk_md5)

Every stage is individually value-checked (node oracle for extraction,
DuckDB oracles/differentials for dedup, line dedup and chunking); this
module pins the COMPOSITION with deterministic end-to-end tests.
Exchange budget: two keyed exchanges of document-sized rows (url dedup,
content dedup) + one ids-only exchange — the minimum this semantics
admits.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.chunking import chunk_documents, line_dedup
from ..functions.util import arrow_out, strip_schema_metadata
from .extract_pipeline import dedup_pages_by_url, extract_pipeline


def training_data_pipeline(pages: ray.data.Dataset, *,
                           min_chars: int = 200,
                           boilerplate_df: int = 5,
                           window: int = 64, stride: int = 48,
                           batch_size: int = 64,
                           canonical_url_dedup: bool = False,
                           n_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """pages (url, warc_ts, html) → deduped, cleaned, chunked training
    passages.  See the module docstring for the stage/exchange plan.

    ``canonical_url_dedup=True`` keys stage 1 on the RFC 3986
    canonical url (functions/urltools.py — case/port/fragment/
    dot-segment/tracking-param normalization, one extra stateless
    map, same single exchange) so trivially-different duplicates
    (``?utm_source=``, ``HTTP://Host:80/``) collapse before they cost
    an extraction; the kept row's ORIGINAL url is preserved."""
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(pages)
    n_parts = n_partitions or default_partitions()

    if canonical_url_dedup:
        from ..functions.urltools import canonicalize_urls
        deduped = dedup_pages_by_url(
            canonicalize_urls(pages), n_partitions=n_parts,
            key_col="canonical_url") \
            .drop_columns(["canonical_url", "host"])
    else:
        deduped = dedup_pages_by_url(pages, n_partitions=n_parts)
    extracted = extract_pipeline(
        deduped.select_columns(["url", "html"]), use_actors=False,
        batch_size=batch_size) \
        .select_columns(["url", "markdown"]) \
        .materialize()  # the checkpoint (see module docstring)

    cleaned = line_dedup(extracted, max_doc_freq=boilerplate_df,
                         id_col="url", text_col="markdown",
                         strategy="broadcast", n_partitions=n_parts)

    def quality_gate(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.utf8_length(batch.column("clean_text")), min_chars)
        return batch.filter(keep)

    def with_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column("clean_text").to_pylist()
        h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return pa.table({
            "url": batch.column("url"),
            "clean_text": batch.column("clean_text"),
            "text_hash": pa.array(h, pa.string()),
        })

    def keep_min_url(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "text_hash" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "url": pd.Series([], dtype="object"),
                "clean_text": pd.Series([], dtype="object")}))
        b = batch.sort_values(["text_hash", "url"], kind="stable")
        return arrow_out(b.drop_duplicates("text_hash", keep="first")
                         [["url", "clean_text"]].reset_index(drop=True))

    unique = strip_schema_metadata(cleaned) \
        .map_batches(quality_gate, batch_format="pyarrow") \
        .map_batches(with_hash, batch_format="pyarrow") \
        .repartition(num_blocks=n_parts, keys=["text_hash"]) \
        .map_batches(keep_min_url, batch_format="pandas",
                     batch_size=None)

    return chunk_documents(unique, window=window, stride=stride,
                           id_col="url", text_col="clean_text")
