"""Actor-pool sizing.

Fixed-size pools beat autoscaling ``(1, N)`` pools by ~40% under steady load
(they under-provision), but a fixed pool larger than the cluster deadlocks the
streaming executor: pending actors reserve nothing, ready actors + other
stages' tasks contend for the rest. ``resolve_pool`` clamps every pool to
cluster CPUs − 1 so reads/shuffles/writes always have head-room.
"""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def resolve_pool(requested: int | None, reserve: int = 4) -> int:
    """Pool size: ``requested`` clamped to ≤ min(CPUs−2, 75% of CPUs); default
    CPUs − ``reserve``. A fixed pool's idle actors still RESERVE their CPUs, so
    an under-capped pool starves concurrent shuffles on small clusters
    (observed: a 3-actor pool on 4 CPUs deadlocking a join)."""
    cpus = cluster_cpus()
    cap = max(1, min(cpus - 2, int(cpus * 0.75)))
    if requested is None:
        requested = max(2, cpus - reserve)
    return max(1, min(requested, cap))
