#!/usr/bin/env python3
"""Cluster job entrypoint for the crawl-frontier pipeline — the
``ray job submit`` twin of tools/extract_job.py for the frontier tier
(pipelines/frontier.py):

    ray job submit --address http://<head>:8265 --working-dir . -- \
        python tools/frontier_job.py \
            --sitemaps /data/sitemaps.parquet   # (doc_id, sitemap_xml)
            --robots   /data/robots.parquet     # (host, robots_txt)
            --output   /data/frontier/          # partitioned parquet

The pipeline streams sitemap XML → URL explode → canonical dedup
keys → robots politeness gate → per-host Crawl-delay fetch slots, and
writes the scheduled frontier as partitioned parquet (Ray Data's
write_parquet — one file per output block, resumable by re-running
with a fresh output dir).  In this sandbox it runs single-node
(``--address local --num-cpus 32``).

Prints ONE JSON metrics line on the last stdout line:
    {"slots": N, "hosts": H, "wall_sec": S, "out_dir": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("--sitemaps", required=True,
                    help="parquet of (doc_id, sitemap_xml) rows")
    ap.add_argument("--robots", required=True,
                    help="parquet of (host, robots_txt) rows")
    ap.add_argument("--output", required=True)
    ap.add_argument("--address", default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--agent", default="*")
    ap.add_argument("--default-delay-s", type=float, default=1.0)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        addr = args.address or os.environ.get("RAY_ADDRESS") or "auto"
        if addr in ("local", "auto") and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        try:
            ray.init(address=addr, **kwargs)
        except ConnectionError:
            ray.init(address="local", **kwargs)

    import ray.data

    from readability_ray.pipelines import frontier_pipeline

    t0 = time.time()
    docs = ray.data.read_parquet(args.sitemaps)
    robots = ray.data.read_parquet(args.robots)
    out = frontier_pipeline(docs, robots, agent=args.agent,
                            default_delay_s=args.default_delay_s)
    os.makedirs(args.output, exist_ok=True)
    out.write_parquet(args.output)
    # summary from the written output (cheap: frontier rows are small)
    import pyarrow.dataset as pads
    d = pads.dataset(args.output, format="parquet")
    slots = d.count_rows()
    hosts = len(set(
        d.to_table(columns=["host"]).column("host").to_pylist()))
    wall = time.time() - t0
    print(json.dumps({
        "slots": slots,
        "hosts": hosts,
        "wall_sec": round(wall, 3),
        "out_dir": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
