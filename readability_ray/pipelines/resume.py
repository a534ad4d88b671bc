"""Resumable partitioned extraction with per-partition lineage manifests.

"Resumable from checkpoint" for a batch pipeline (north_rule): output is
laid out one directory per input shard, each written atomically (temp
dir + rename) with a ``_manifest.json`` recording lineage (input file,
row count, page-type counts, error count, wall time, engine version).
A rerun lists the manifests, skips finished shards, and processes only
the remainder — at 10^12-document scale a restart costs only the
in-flight shards.

Layout:
    out_dir/
      shard=<stem>/part-*.parquet
      shard=<stem>/_manifest.json
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray
import ray.data

MANIFEST_NAME = "_manifest.json"


def _shard_key(input_file: str) -> str:
    name = os.path.basename(input_file)
    for ext in (".warc.gz", ".warc", ".parquet"):
        if name.endswith(ext):
            return name[:-len(ext)]
    return os.path.splitext(name)[0]


def completed_shards(out_dir: str) -> dict[str, dict]:
    """Read every shard manifest under out_dir (missing dir → {})."""
    done = {}
    if not os.path.isdir(out_dir):
        return done
    for entry in sorted(os.listdir(out_dir)):
        manifest_path = os.path.join(out_dir, entry, MANIFEST_NAME)
        if os.path.isfile(manifest_path):
            with open(manifest_path, encoding="utf-8") as f:
                manifest = json.load(f)
            done[manifest["shard"]] = manifest
    return done


def _shard_stats(tmp_dir: str) -> tuple[int, dict[str, int], int]:
    """Lineage counts for the manifest from a tiny pruned re-read of
    the just-written shard: only (page_type, error) leave disk, each
    block pre-aggregates to a few partial rows, and the driver reduces
    partials — never rows (VERDICT.md #5: the sink no longer streams
    the whole shard through the driver)."""
    stats = ray.data.read_parquet(tmp_dir, columns=["page_type", "error"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        grouped = pa.table({
            "page_type": batch.column("page_type"),
        }).group_by("page_type").aggregate([("page_type", "count")])
        n_err = pc.sum(pc.not_equal(batch.column("error"), "")).as_py() or 0
        return pa.table({
            "page_type": grouped.column("page_type"),
            "n": grouped.column("page_type_count").cast(pa.int64()),
            "errors": pa.array(
                [n_err] + [0] * (grouped.num_rows - 1) if grouped.num_rows
                else [], pa.int64()),
        })

    rows = 0
    page_types: dict[str, int] = {}
    errors = 0
    for row in stats.map_batches(partial, batch_format="pyarrow").take_all():
        page_types[row["page_type"]] = \
            page_types.get(row["page_type"], 0) + row["n"]
        rows += row["n"]
        errors += row["errors"]
    return rows, page_types, errors


def _process_shard(input_file: str, out_dir: str, extract_kwargs: dict,
                   concurrency, batch_size: int, wet: bool = False,
                   sniff_charset: bool = False) -> tuple[str, int]:
    from .extract_pipeline import extract_pipeline

    shard = _shard_key(input_file)
    t0 = time.time()
    shard_dir = os.path.join(out_dir, f"shard={shard}")
    tmp_dir = shard_dir + ".tmp"
    import shutil
    if os.path.isdir(tmp_dir):  # stale partial output from a crash
        shutil.rmtree(tmp_dir)
    if os.path.isdir(shard_dir):  # dir without manifest = incomplete
        shutil.rmtree(shard_dir)

    if input_file.endswith((".warc", ".warc.gz")):
        # CC-native shard: stream records straight off the crawl file
        from ..sources.warc import read_warc
        cols = ["url", "html"] + (["content_type"] if sniff_charset
                                  else [])
        ds = read_warc(input_file).select_columns(cols)
    else:
        ds = ray.data.read_parquet(input_file, columns=["url", "html"])
    if sniff_charset:
        from ..sources.charset import charset_decode
        ds = charset_decode(
            ds, content_type_col="content_type"
            if "content_type" in ds.schema().names else None) \
            .select_columns(["url", "html"])
    out = extract_pipeline(ds, concurrency=concurrency,
                           batch_size=batch_size, **extract_kwargs)
    # Distributed sink: write tasks stream blocks straight to parquet —
    # the driver never sees a row.
    out.write_parquet(tmp_dir)
    # A zero-row shard may leave no parquet parts — or no directory at
    # all — behind; guard the stats re-read (read_parquet on a
    # part-less dir fails) and commit an honest rows=0 manifest over
    # the empty shard dir instead.
    os.makedirs(tmp_dir, exist_ok=True)
    has_parts = any(name.endswith(".parquet")
                    for name in os.listdir(tmp_dir))
    if has_parts:
        rows, page_types, errors = _shard_stats(tmp_dir)
    else:
        rows, page_types, errors = 0, {}, 0

    wet_dir = None
    if wet and has_parts:
        # WET twin of the parquet output, in a parallel _wet tree so
        # read_parquet over the shard dir never sees gzip files; the
        # shard manifest (written after) is the commit point for BOTH
        # sinks, so a crash between them re-runs the whole shard
        from ..sources.warc import write_wet_shards
        wet_dir = os.path.join(out_dir, "_wet", f"shard={shard}")
        wet_tmp = wet_dir + ".tmp"
        import shutil as _sh
        for d in (wet_tmp, wet_dir):
            if os.path.isdir(d):
                _sh.rmtree(d)
        text_col = "markdown" if "markdown" in set(
            ray.data.read_parquet(tmp_dir).schema().names) \
            else "extracted_text"
        write_wet_shards(
            ray.data.read_parquet(tmp_dir,
                                  columns=["url", text_col]),
            wet_tmp, text_col=text_col).materialize()
        os.replace(wet_tmp, wet_dir)

    manifest = {
        "shard": shard,
        "input_file": os.path.abspath(input_file),
        "wet_dir": wet_dir,
        "rows": rows,
        "page_types": page_types,
        "errors": errors,
        "wall_time_sec": round(time.time() - t0, 3),
        "engine_version": _engine_version(),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(tmp_dir, MANIFEST_NAME), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp_dir, shard_dir)  # atomic completion marker
    return shard, rows


def run_resumable_extraction(input_files: list[str], out_dir: str,
                             extract_kwargs: dict | None = None,
                             concurrency=(1, 8),
                             batch_size: int = 64,
                             shard_parallelism: int = 1,
                             wet: bool = False,
                             sniff_charset: bool = False) -> dict:
    """Process input shards (parquet pages tables or raw ``.warc[.gz]``
    crawl files), skipping ones already completed.

    Returns a summary {processed: [...], skipped: [...], total_rows: n}.
    Each shard is one Ray Data pipeline (read → extract → distributed
    parquet write), so a failure loses at most one shard's work;
    completed shards are immutable.  ``shard_parallelism > 1`` submits
    that many shard pipelines concurrently (driver threads — ordering
    is irrelevant, rows are independent); Ray's streaming executor
    time-shares the cluster between them.
    """
    extract_kwargs = extract_kwargs or {}
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)
    processed, skipped = [], []
    todo = []
    for input_file in input_files:
        shard = _shard_key(input_file)
        if shard in done:
            skipped.append(shard)
        else:
            todo.append(input_file)

    results: dict[str, int] = {}
    if shard_parallelism > 1 and len(todo) > 1:
        _shim_fsspec_http()
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=shard_parallelism) as pool:
            for shard, rows in pool.map(
                    lambda f: _process_shard(f, out_dir, extract_kwargs,
                                             concurrency, batch_size,
                                             wet=wet,
                                             sniff_charset=sniff_charset),
                    todo):
                results[shard] = rows
    else:
        for input_file in todo:
            shard, rows = _process_shard(input_file, out_dir,
                                         extract_kwargs, concurrency,
                                         batch_size, wet=wet,
                                         sniff_charset=sniff_charset)
            results[shard] = rows

    # report in input order
    for input_file in todo:
        processed.append(_shard_key(input_file))
    total_rows = sum(results.values())
    return {"processed": processed, "skipped": skipped,
            "total_rows": total_rows, "out_dir": out_dir}


def _shim_fsspec_http() -> None:
    """Make Ray's per-read fsspec-HTTP probe thread-safe in this
    environment.  aiohttp is absent, so ``fsspec.implementations.http``
    fails to import; Ray catches that (ModuleNotFoundError) — but when
    several reader THREADS hit the probe at once, the losing thread
    sees a partially-initialized module and gets a bare ImportError
    instead, which Ray does not catch.  Installing an inert module with
    a placeholder HTTPFileSystem (used only in isinstance checks that a
    local filesystem never reaches) removes the race."""
    import sys
    import types
    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        __import__(name)
        return  # real module importable — nothing to shim
    except ImportError:
        pass

    mod = types.ModuleType(name)

    class HTTPFileSystem:  # placeholder: isinstance()-checked only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod
    try:
        import fsspec.implementations as _impl
        _impl.http = mod
    except ImportError:
        pass


def _engine_version() -> str:
    from readability_ray import __version__
    return __version__
