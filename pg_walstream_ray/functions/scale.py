"""Cluster-size-derived parallelism knobs.

The coarse-bucket pattern (shuffle by ``key % NPART``, vectorize within
the bucket) needs NPART large enough that reduce-side parallelism isn't
capped below the cluster's core count, and small enough that per-group
Python overhead (~25 ms per ``map_groups`` call) stays negligible.  A
fixed 64 is right for one 32-core box but caps a 256-node cluster at 64
reduce tasks — so derive it from the live cluster size at pipeline-build
time instead.

Results of every coarse-bucket operator are bucket-count-independent by
construction (each fine-grained key lives wholly inside one bucket), so
this only changes task granularity, never output.
"""

from __future__ import annotations


def coarse_npart(per_cpu: int = 4, floor: int = 64, cap: int = 8192) -> int:
    """Power-of-two coarse-partition count: ~``per_cpu`` reduce tasks per
    cluster CPU (straggler smoothing), at least ``floor`` (single-box
    default), at most ``cap`` (bounds per-group constant overhead).
    Power of two so callers can use bit masks (``key & (NPART-1)``)."""
    ncpu = 8
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:                         # pragma: no cover - ray absent
        pass
    target = max(floor, min(cap, per_cpu * ncpu))
    p = 1
    while p < target:
        p <<= 1
    return p
