#!/usr/bin/env python3
"""Cluster job entrypoint for the extraction pipeline — the script a
fixed-size multi-node deployment submits via ``ray job submit``
(north_rule: "run via ray job submit on a fixed-size multi-node Ray
cluster"):

    ray job submit --address http://<head>:8265 --working-dir . -- \
        python tools/extract_job.py \
            --input  /data/pages/          # dir (or single file) of
                                           # parquet or .warc[.gz] shards
            --output /data/extracted/      # one sub-dir + lineage manifest per shard

In this sandbox the same entrypoint runs single-node
(``--address local --num-cpus 32``); the two-cluster-size scaling
criterion maps to running it at two ``--num-cpus`` levels in fresh
processes (see bench.py --scaling and BASELINE.md "Scaling").

The job is RESUMABLE: output is one directory per input shard, written
atomically with a ``_manifest.json`` recording lineage (input file, row
count, page-type histogram, error count, wall time, engine version) —
resubmitting the same job after a failure skips every completed shard
(pipelines/resume.py).  Exit status is non-zero if any shard failed.

Prints ONE JSON metrics line on the last stdout line:
    {"pages": N, "wall_sec": S, "pages_per_sec": R,
     "processed": [...], "skipped": [...], "errors": N}
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

# `python tools/extract_job.py` (and `ray job submit -- python
# tools/extract_job.py` with --working-dir .) puts tools/ on sys.path,
# not the repo root where readability_ray lives
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _shard_list(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        files = sorted(
            f for pat in ("*.parquet", "*.warc", "*.warc.gz")
            for f in glob.glob(os.path.join(input_path, pat)))
    else:
        files = sorted(glob.glob(input_path)) or [input_path]
    if not files:
        raise SystemExit(f"no parquet/WARC shards under {input_path!r}")
    return files


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("--input", required=True,
                    help="parquet shard dir, glob, or single file")
    ap.add_argument("--output", required=True,
                    help="output root (one shard=<stem>/ dir per input)")
    ap.add_argument("--address", default=None,
                    help="ray address; default: cluster address under "
                         "`ray job submit`, else RAY_ADDRESS, else local")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only honoured for a NEW local session")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--shard-parallelism", type=int, default=2,
                    help="concurrent shard pipelines (driver threads)")
    ap.add_argument("--markdown", action="store_true", default=True)
    ap.add_argument("--wet", action="store_true",
                    help="also publish each shard's extracted text as "
                         "Common-Crawl WET shards (out/_wet/shard=*)")
    ap.add_argument("--sniff-charset", action="store_true",
                    help="WHATWG charset sniff before parsing "
                         "(non-UTF-8 crawls)")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        # Under `ray job submit` the job runtime injects the cluster
        # address; standalone we honour --address/RAY_ADDRESS (`local`
        # in this sandbox).  Library code never calls ray.init — the
        # entrypoint owns the session (CLAUDE.md invariant).
        kwargs = {"include_dashboard": False}
        addr = args.address or os.environ.get("RAY_ADDRESS") or "auto"
        if addr in ("local", "auto") and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        try:
            ray.init(address=addr, **kwargs)
        except ConnectionError:
            ray.init(address="local", **kwargs)

    from readability_ray.pipelines.resume import run_resumable_extraction

    shards = _shard_list(args.input)
    t0 = time.time()
    summary = run_resumable_extraction(
        shards, args.output, batch_size=args.batch_size,
        shard_parallelism=args.shard_parallelism, wet=args.wet,
        sniff_charset=args.sniff_charset)
    wall = time.time() - t0

    from readability_ray.pipelines.resume import completed_shards
    manifests = completed_shards(args.output)
    pages = sum(m["rows"] for m in manifests.values())
    errors = sum(m.get("errors", 0) for m in manifests.values())
    missing = [os.path.splitext(os.path.basename(f))[0] for f in shards
               if os.path.splitext(os.path.basename(f))[0] not in manifests]
    print(json.dumps({
        "pages": pages,
        "wall_sec": round(wall, 3),
        "pages_per_sec": round(pages / wall, 1) if wall > 0 else None,
        "processed": summary["processed"],
        "skipped": summary["skipped"],
        "errors": errors,
        "out_dir": summary["out_dir"],
    }))
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
