"""Benchmark harness.

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...}

--scaling: runs the headline extraction twice in fresh processes
(num_cpus=8 vs 32) on the same input and reports both throughputs plus
scaling efficiency (N vs 4N stand-in per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_benchmarks() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from readability_ray.pipelines import extract_pipeline
    from readability_ray.sources import pages_path_for_sf

    pages_path = pages_path_for_sf(sf_dir)
    # warm OS page cache so we measure compute, not first disk read
    with open(pages_path, "rb") as f:
        while f.read(16 * 1024 * 1024):
            pass

    queries: dict[str, float] = {}

    # headline: end-to-end extraction (read → actor pool → consume)
    t0 = time.time()
    ds = ray.data.read_parquet(pages_path, columns=["url", "html"])
    out = extract_pipeline(ds, concurrency=(1, num_cpus), batch_size=32)
    n_pages = 0
    for batch in out.iter_batches(batch_format="pyarrow", batch_size=4096):
        n_pages += batch.num_rows
    extract_sec = time.time() - t0
    queries["extract"] = round(extract_sec, 3)

    import __ray_entry__ as entrymod
    bench_queries = ["token_stats", "exact_dedup", "minhash_dedup_pairs",
                     "knn_cosine_top5", "embedding_dup_pairs",
                     "doc_lang_stats", "events_hourly"]
    qs = entrymod.queries()
    for name in bench_queries:
        t0 = time.time()
        result = qs[name](sf_dir)
        # consume fully
        for _ in result.iter_batches(batch_format="pyarrow",
                                     batch_size=8192):
            pass
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "end-to-end pipeline wall time (headline: extraction "
                  "pages/sec)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / extract_sec, 1),
    }))
    ray.shutdown()


def _run_scaling() -> None:
    """Same job at num_cpus=8 and 32 in fresh processes (N vs 4N)."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    pps_lo = results[8]["pages_per_sec"]
    pps_hi = results[32]["pages_per_sec"]
    eff = (pps_hi / pps_lo) / (32 / 8)
    print(json.dumps({
        "metric": "scaling efficiency N->4N (num_cpus 8 vs 32)",
        "pages_per_sec_8": pps_lo,
        "pages_per_sec_32": pps_hi,
        "sec_8": results[8]["queries"]["extract"],
        "sec_32": results[32]["queries"]["extract"],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _run_scaling()
    else:
        _run_benchmarks()
