"""End-to-end extraction pipeline over Common-Crawl-style Parquet.

read_parquet (pruned to url+html) → ExtractStage actor pool →
write_parquet (partitioned, resumable).  Streaming throughout: no stage
materializes the dataset; the Ray Data executor pipelines blocks with
backpressure and spills through the object store at 100 TB scale.

Skew note: per-row extraction cost scales superlinearly with HTML size
(multi-MB pages dominate).  With ``size_bucket=True`` a cheap projection
adds ``html_bytes`` and routes giant pages into their own smaller-batch
pool so one 5 MB page doesn't straggle a whole block of 10 KB pages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.extract_stage import ExtractStage

GIANT_PAGE_BYTES = 512 * 1024


def _with_html_bytes(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "html_len", pc.binary_length(batch.column("html")))


def extract_pipeline(ds: ray.data.Dataset, *, char_threshold: int = 500,
                     nb_top_candidates: int = 5, emit_html: bool = False,
                     emit_markdown: bool = True, emit_aria: bool = False,
                     concurrency=None, batch_size: int = 64,
                     size_bucket: bool = False,
                     use_actors: bool = True) -> ray.data.Dataset:
    """Build the lazy extraction Dataset (does not execute).

    Default output columns are text+markdown (the reference CLI's
    default format is markdown); pass emit_html/emit_aria for the html
    and ARIA-YAML columns — the schema is stable either way (empty
    strings when disabled)."""
    stage_kwargs = dict(char_threshold=char_threshold,
                        nb_top_candidates=nb_top_candidates,
                        emit_html=emit_html, emit_markdown=emit_markdown,
                        emit_aria=emit_aria)
    # zero_copy_batch: the UDF never mutates its input batch, so Ray can
    # hand it object-store memory without a defensive copy
    common = dict(batch_format="pyarrow", fn_constructor_kwargs=stage_kwargs,
                  num_cpus=1, zero_copy_batch=True)
    if concurrency is not None:
        common["concurrency"] = concurrency

    if not use_actors:
        # stateless-task mode: worker-process reuse amortizes the stage
        # state without per-dataset actor-pool spin-up; `concurrency`
        # is ignored (tasks are elastic)
        from ..stages.extract_stage import extract_batch_task
        import functools
        fn = functools.partial(extract_batch_task, **stage_kwargs)
        return ds.map_batches(fn, batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)

    if not size_bucket:
        return ds.map_batches(ExtractStage, batch_size=batch_size, **common)

    # Route giant pages to a dedicated small-batch pool.  Both pools are
    # autoscaling with min=1 so the two pools + read/filter tasks can't
    # reserve every CPU and deadlock the streaming executor (a fixed
    # pool × 2 would starve upstream tasks on small clusters).
    if isinstance(common.get("concurrency"), int):
        common["concurrency"] = (1, common["concurrency"])
    sized = ds.map_batches(_with_html_bytes, batch_format="pyarrow")
    small = sized.filter(expr=f"html_len < {GIANT_PAGE_BYTES}")
    giant = sized.filter(expr=f"html_len >= {GIANT_PAGE_BYTES}")
    small_out = small.map_batches(ExtractStage, batch_size=batch_size, **common)
    giant_out = giant.map_batches(ExtractStage, batch_size=4, **common)
    return small_out.union(giant_out)


def _is_warc_input(path: str) -> bool:
    import os
    if path.endswith((".warc", ".warc.gz")):
        return True
    if os.path.isdir(path):
        return any(f.endswith((".warc", ".warc.gz"))
                   for f in os.listdir(path))
    return False


def run_extraction(input_path: str, output_dir: str | None = None,
                   wet_dir: str | None = None,
                   wet_text_col: str = "markdown",
                   sniff_charset: bool = False,
                   **kwargs) -> ray.data.Dataset:
    """Read → extract → optionally write partitioned Parquet and/or
    Common-Crawl WET shards.

    Accepts Parquet pages tables OR raw WARC shards (a ``.warc[.gz]``
    file or a directory of them — the Common-Crawl-native layout);
    WARC records stream through ``sources/warc.py`` and failed records
    surface as error rows, never job failures.  ``wet_dir`` publishes
    the ``wet_text_col`` column as ``conversion`` records
    (``sources/warc.py:write_wet_shards``) — the WARC-in → WET-out
    shape of Common Crawl's own extraction.

    Column pruning at the read: only (url, html) leave storage — the
    crawler's text/lang/warc_ts columns are never shipped.
    """
    if _is_warc_input(input_path):
        from ..sources.warc import read_warc
        cols = ["url", "html"] + (["content_type"] if sniff_charset
                                  else [])
        ds = read_warc(input_path).select_columns(cols)
    else:
        ds = ray.data.read_parquet(input_path, columns=["url", "html"])
    if sniff_charset:
        # WHATWG sniff ladder → clean UTF-8 for the parser; pages from
        # a non-UTF-8 crawl decode correctly instead of as mojibake
        from ..sources.charset import charset_decode
        ds = charset_decode(
            ds, content_type_col="content_type"
            if "content_type" in ds.schema().names else None) \
            .select_columns(["url", "html"])
    out = extract_pipeline(ds, **kwargs)
    if output_dir is not None:
        out.write_parquet(output_dir)
        out = ray.data.read_parquet(output_dir)
    elif wet_dir is not None:
        out = out.materialize()  # one extraction run feeds both sinks
    if wet_dir is not None:
        from ..sources.warc import write_wet_shards
        write_wet_shards(
            out.select_columns(["url", wet_text_col]),
            wet_dir, text_col=wet_text_col).materialize()
    return out


def dedup_pages_by_url(ds: ray.data.Dataset,
                       n_partitions: int | None = None,
                       key_col: str = "url") -> ray.data.Dataset:
    """Exact URL dedup — the only shuffle the core extraction pipeline
    ever needs, and it is optional (SURVEY.md §2.9): hash-partition on
    url, keep the earliest crawl per url (min warc_ts).

    Pure-shuffle plan (VERDICT.md #4 — no driver materialization, no
    per-row Python membership loop): one hash shuffle co-locates every
    row of a url in one of O(cores×4) partitions
    (``repartition(keys=["url"])``), then a vectorized per-partition
    stable sort + ``drop_duplicates(url)`` keeps the earliest crawl.
    Exactly one exchange of the full rows — the minimum any
    keep-one-row-per-key dedup can move — and each partition stays
    bounded as the cluster grows.

    Ties on (url, warc_ts) are broken by a content hash (md5 of the
    html column, falling back to text) computed ONLY for the tied rows
    — ties are rare, so the hot path stays one vectorized sort — which
    makes the winner stable across runs and input orders; rows tied on
    (url, warc_ts, content) are interchangeable by definition.
    """
    from ..state import default_partitions, ensure_hash_shuffle
    ensure_hash_shuffle(ds)
    k = n_partitions or default_partitions()

    import pandas as pd

    def first_per_url(batch: pd.DataFrame):
        if len(batch) == 0:  # schema-less empty shuffle partition
            return batch
        from ..functions.util import arrow_out
        b = batch.sort_values([key_col, "warc_ts"], kind="stable")
        tied = b.duplicated([key_col, "warc_ts"], keep=False)
        if tied.any():
            import hashlib
            content = next((c for c in ("html", "text")
                            if c in b.columns), None)
            if content is not None:
                tb = pd.Series("", index=b.index, dtype=object)
                tb[tied] = [
                    hashlib.md5(v if isinstance(v, bytes)
                                else str(v).encode("utf-8")).hexdigest()
                    for v in b.loc[tied, content]]
                b = b.assign(_tiebreak=tb) \
                    .sort_values([key_col, "warc_ts", "_tiebreak"],
                                 kind="stable") \
                    .drop(columns="_tiebreak")
        return arrow_out(b.drop_duplicates(key_col, keep="first")
                         .reset_index(drop=True))

    from ..functions.util import strip_schema_metadata
    return strip_schema_metadata(ds) \
        .repartition(num_blocks=k, keys=[key_col]) \
        .map_batches(first_per_url, batch_format="pandas", batch_size=None)


def full_analysis_pipeline(ds: ray.data.Dataset, *,
                           char_threshold: int = 500,
                           concurrency=None,
                           batch_size: int = 64,
                           use_actors: bool = True) -> ray.data.Dataset:
    """Extraction + structure detection in one pass (two-phase per row:
    preprocessed DOM for content, raw re-parse for structure).

    ``use_actors=False`` runs the stateless-task twin (per-worker memo,
    elastic, no pool spin-up or actor-restart bookkeeping) — the same
    trade as the extraction headline."""
    if not use_actors:
        import functools

        from ..stages.structure_stage import full_analysis_batch_task
        fn = functools.partial(full_analysis_batch_task,
                               char_threshold=char_threshold)
        return ds.map_batches(fn, batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)
    from ..stages.structure_stage import FullAnalysisStage
    kwargs = dict(batch_format="pyarrow", num_cpus=1, zero_copy_batch=True,
                  fn_constructor_kwargs=dict(char_threshold=char_threshold))
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(FullAnalysisStage, batch_size=batch_size, **kwargs)
