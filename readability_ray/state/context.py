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
    """Idempotently select the hash-shuffle strategy for this session
    AND for ``ds``'s captured context (a Dataset snapshots the
    DataContext at creation, so flipping only the global one is too
    late for inputs built before the operator was called).

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
    for ctx in (ray.data.DataContext.get_current(),
                getattr(ds, "context", None)):
        if ctx is None:
            continue
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # Ray's stock knobs assume a big cluster (200 partitions / up to
        # 64 aggregator actors); on a small CPU budget that actor storm
        # starves upstream operators and deadlocks the streaming
        # executor (same failure mode as a fixed-size actor pool —
        # CLAUDE.md gotcha #1).  Scale everything to the actual budget:
        ctx.default_hash_shuffle_parallelism = partitions
        ctx.max_hash_shuffle_aggregators = max(2, cores // 2)
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


def default_partitions(per_core: int = 4, floor: int = 16,
                       ceiling: int = 512) -> int:
    """Partition count for key-based co-location shuffles: scales with
    the cluster's CPU budget (O(cores × per_core)) so per-partition
    blocks stay bounded as the cluster grows, clamped so tiny test
    sessions don't fan out absurdly and giant ones don't create
    confetti blocks."""
    return max(floor, min(ceiling, _cluster_cpus() * per_core))
