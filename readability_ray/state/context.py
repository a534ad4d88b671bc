"""Execution-context knobs shared by the wide (shuffling) operators.

Ray Data ships two shuffle implementations; key-based co-location
(``Dataset.repartition(keys=...)``) and ``Dataset.join`` require the
hash-shuffle strategy.  Hash shuffle is also the right 100 TB default:
it streams blocks through partition aggregators with backpressure
instead of materializing sort runs, and its aggregator pool divides the
CPU budget by partition count (so a large ``num_partitions`` does not
reserve the cluster).

The switch is process-global DataContext state, so it is flipped once,
idempotently, by the operators that need it — never at import time (the
driver owns the Ray session; see CLAUDE.md).
"""

from __future__ import annotations

import os


def ensure_hash_shuffle(ds=None) -> None:
    """Idempotently select the hash-shuffle strategy for ``ds``'s
    pipeline.  A Dataset SNAPSHOTS the DataContext at creation, so
    mutating the snapshot scopes the strategy to that pipeline (and
    everything derived from it) without contaminating unrelated
    queries in the same session — plain aggregates elsewhere keep
    Ray's default sort shuffle and its lighter small-data startup.
    Without ``ds`` (no pipeline in hand) the global context is flipped.

    Set ``RAY_GRAFT_SORT_SHUFFLE=1`` to keep Ray's default sort-based
    strategy (the key-based dedup/join operators will then raise a clear
    Ray error naming the required strategy).
    """
    if os.environ.get("RAY_GRAFT_SORT_SHUFFLE"):
        return
    import ray.data
    from ray.data.context import ShuffleStrategy

    partitions = default_partitions()
    cores = _cluster_cpus()
    ctxs = [getattr(ds, "context", None)]
    if ctxs[0] is None:
        ctxs = [ray.data.DataContext.get_current()]
    for ctx in ctxs:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # Ray's stock knobs assume a big cluster (200 partitions / up to
        # 64 aggregator actors); on a small CPU budget that actor storm
        # starves upstream operators and deadlocks the streaming
        # executor (same failure mode as a fixed-size actor pool —
        # CLAUDE.md gotcha #1).  Scale everything to the actual budget:
        ctx.default_hash_shuffle_parallelism = partitions
        ctx.max_hash_shuffle_aggregators = max(2, min(8, cores // 2))
        # Aggregators are concat/spill-bound, not compute-bound; keep
        # their CPU reservation nominal so several concurrent shuffle
        # ops (repartition + groupby + joins in one plan) always fit.
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.025
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.025
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.025


def _cluster_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def default_partitions(per_core: int = 1, floor: int = 8,
                       ceiling: int = 512) -> int:
    """Partition count for key-based co-location shuffles.

    Default scales with the cluster's CPU budget (≈ one partition per
    core).  Empirically the hash-shuffle aggregator machinery on this
    Ray version stalls when partitions exceed ~4× the CPU budget in a
    multi-shuffle plan, and each partition adds actor spin-up latency,
    so MORE partitions than cores buys nothing locally.  At true 100 TB
    scale the per-partition FINALIZE memory is the binding constraint —
    callers there should pass ``n_partitions ≈ shuffled_bytes /
    256 MB`` explicitly (every keyed operator takes the override)."""
    return max(floor, min(ceiling, _cluster_cpus() * per_core))
