"""Control B under the round-3 protocol: the ACTUAL extraction
workload (ExtractStage kernel over Arrow batches), raw multiprocessing,
NO Ray — measured at 8 and 32 processes back-to-back with the same
full-width CPU probes and drift-rejection rule as bench.py --scaling.

This is the host's own same-workload N→4N ceiling: whatever the Ray
pipeline loses beyond this number is Ray's; whatever this number loses
below 1.0 is the single shared memory bus that a real N- vs 4N-NODE
cluster does not have.

Usage: python tools/mp_control.py [n_pairs]   (defaults 3)
Prints one JSON line; numbers land in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _worker(files: list[str]) -> int:
    """One process: read its parquet shards, run the extraction stage
    kernel batch by batch (same code path as the Ray pipeline's
    stateless task), return pages processed."""
    import pyarrow.parquet as pq

    from readability_ray.stages.extract_stage import extract_batch_task
    n = 0
    for path in files:
        table = pq.read_table(path, columns=["url", "html"])
        for batch in table.to_batches(max_chunksize=128):
            import pyarrow as pa
            out = extract_batch_task(pa.Table.from_batches([batch]))
            n += out.num_rows
    return n


def _run_level(procs: int, files: list[str]) -> float:
    from concurrent.futures import ProcessPoolExecutor
    shards: list[list[str]] = [[] for _ in range(procs)]
    for i, f in enumerate(files):
        shards[i % procs].append(f)
    t0 = time.time()
    with ProcessPoolExecutor(procs) as ex:
        total = sum(ex.map(_worker, shards))
    return total / (time.time() - t0)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ.setdefault("GRAFT_PAGES_MULT", "16")
    from bench import _cpu_probe

    from readability_ray.sources import pages_path_for_sf
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pages = pages_path_for_sf(sf_dir)
    files = sorted(os.path.join(pages, f) for f in os.listdir(pages)
                   if f.endswith(".parquet"))
    # warm page cache + worker-import cost once (unmeasured)
    _run_level(8, files[:8])

    accepted, rejected = [], []
    for _ in range(n_pairs):
        ctrl = [_cpu_probe()]
        pps_lo = _run_level(8, files)
        ctrl.append(_cpu_probe())
        pps_hi = _run_level(32, files)
        ctrl.append(_cpu_probe())
        drift = max(abs(b - a) / ((a + b) / 2)
                    for a, b in zip(ctrl, ctrl[1:]))
        rec = {"pages_per_sec_8": round(pps_lo, 1),
               "pages_per_sec_32": round(pps_hi, 1),
               "pair_efficiency": round((pps_hi / pps_lo) / 4, 3),
               "control_drift": round(drift, 3)}
        (accepted if drift <= 0.10 else rejected).append(rec)

    import statistics
    pool = accepted or rejected
    eff = (statistics.median(r["pages_per_sec_32"] for r in pool)
           / statistics.median(r["pages_per_sec_8"] for r in pool)) / 4
    print(json.dumps({
        "metric": "no-Ray multiprocessing ceiling, same extraction "
                  "workload (control B, round-3 protocol)",
        "ceiling_efficiency": round(eff, 3),
        "pairs_accepted": accepted,
        "pairs_rejected": rejected,
    }))


if __name__ == "__main__":
    main()
