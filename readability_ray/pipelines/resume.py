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
import pyarrow.parquet as pq
import ray
import ray.data

MANIFEST_NAME = "_manifest.json"


def _shard_key(input_file: str) -> str:
    return os.path.splitext(os.path.basename(input_file))[0]


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


def run_resumable_extraction(input_files: list[str], out_dir: str,
                             extract_kwargs: dict | None = None,
                             concurrency=(1, 8),
                             batch_size: int = 64) -> dict:
    """Process input parquet shards, skipping ones already completed.

    Returns a summary {processed: [...], skipped: [...], total_rows: n}.
    Each shard is one Ray Data pipeline (read → extract → write), so a
    failure loses at most one shard's work; completed shards are
    immutable.  On a multi-node cluster the per-shard pipelines can be
    submitted concurrently; ordering is irrelevant (row-independent).
    """
    from .extract_pipeline import extract_pipeline

    extract_kwargs = extract_kwargs or {}
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)
    processed, skipped = [], []
    total_rows = 0

    for input_file in input_files:
        shard = _shard_key(input_file)
        if shard in done:
            skipped.append(shard)
            continue
        t0 = time.time()
        shard_dir = os.path.join(out_dir, f"shard={shard}")
        tmp_dir = shard_dir + ".tmp"
        import shutil
        if os.path.isdir(tmp_dir):  # stale partial output from a crash
            shutil.rmtree(tmp_dir)
        if os.path.isdir(shard_dir):  # dir without manifest = incomplete
            shutil.rmtree(shard_dir)
        os.makedirs(tmp_dir, exist_ok=True)

        ds = ray.data.read_parquet(input_file, columns=["url", "html"])
        out = extract_pipeline(ds, concurrency=concurrency,
                               batch_size=batch_size, **extract_kwargs)

        rows = 0
        page_types: dict[str, int] = {}
        errors = 0
        part = 0
        writer_schema = None
        buffer: list[pa.Table] = []
        buffered = 0
        for batch in out.iter_batches(batch_format="pyarrow",
                                      batch_size=4096):
            rows += batch.num_rows
            for value in batch.column("page_type").to_pylist():
                page_types[value] = page_types.get(value, 0) + 1
            errors += sum(1 for e in batch.column("error").to_pylist() if e)
            buffer.append(batch)
            buffered += batch.num_rows
            writer_schema = batch.schema
            if buffered >= 50_000:
                pq.write_table(pa.concat_tables(buffer),
                               os.path.join(tmp_dir, f"part-{part:05d}.parquet"))
                part += 1
                buffer, buffered = [], 0
        if buffer:
            pq.write_table(pa.concat_tables(buffer),
                           os.path.join(tmp_dir, f"part-{part:05d}.parquet"))
        elif part == 0 and writer_schema is not None:
            pq.write_table(writer_schema.empty_table(),
                           os.path.join(tmp_dir, "part-00000.parquet"))

        manifest = {
            "shard": shard,
            "input_file": os.path.abspath(input_file),
            "rows": rows,
            "page_types": page_types,
            "errors": errors,
            "wall_time_sec": round(time.time() - t0, 3),
            "engine_version": _engine_version(),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
        }
        with open(os.path.join(tmp_dir, MANIFEST_NAME), "w",
                  encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp_dir, shard_dir)  # atomic completion marker
        processed.append(shard)
        total_rows += rows

    return {"processed": processed, "skipped": skipped,
            "total_rows": total_rows, "out_dir": out_dir}


def _engine_version() -> str:
    from readability_ray import __version__
    return __version__
