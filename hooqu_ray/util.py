"""Small shared utilities."""

from __future__ import annotations

from typing import Optional


def actor_pool_size(cap: Optional[int] = None, headroom: int = 2) -> int:
    """Fixed actor-pool size for a map_batches stage: cluster CPUs minus
    ``headroom`` (the upstream read / sibling task stages need slots — a
    pool that pins EVERY logical CPU deadlocks the streaming executor),
    optionally capped.  Falls back to 2 off-cluster."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:  # pragma: no cover
        cpus = 4
    size = max(2, cpus - headroom)
    if cap is not None:
        size = min(size, cap)
    return size
