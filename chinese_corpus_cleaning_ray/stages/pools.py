"""Actor-pool sizing.

Fixed-size pools beat autoscaling ``(1, N)`` pools by ~40% under steady load
(they under-provision), but a fixed pool's idle actors still RESERVE their
CPUs, so pools must never monopolize the cluster: one pool starving a
concurrent shuffle deadlocked a 4-CPU join, and two CHAINED pools in one plan
(embed→knn) each sized near "all CPUs" reserved everything and hung the
executor. ``resolve_pool`` therefore sizes a pool as a FRACTION of available
CPUs; stages that may be chained with another pool pass fraction ≤ 0.4 so two
pools together still leave task head-room.
"""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def resolve_pool(requested: int | None = None, fraction: float = 0.75,
                 reserve: int = 2) -> int:
    """Pool size = ``fraction`` × (cluster CPUs − ``reserve``), clamped ≥ 1.
    ``requested`` (if given) is clamped down to that cap, never raised."""
    cpus = cluster_cpus()
    avail = max(1, cpus - reserve)
    cap = max(1, round(avail * fraction))
    if requested is None:
        return cap
    return max(1, min(requested, cap))
