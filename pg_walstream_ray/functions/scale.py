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


def sized_read_parquet(path, columns=None, target_block_bytes: int = 4 << 20,
                       min_blocks: int = 16):
    """``read_parquet`` with a block count derived from the FILE SIZE.

    Ray's default splits any input into ~2x-cpus blocks regardless of
    size; at small scale that makes every downstream all-to-all pay an
    n_blocks x n_partitions chunk matrix of pure scheduling latency
    (measured on a 2 MB/100k-row input: identity bucket-groupby 1.2-3.5 s
    at 64 blocks -> 0.4 s at 16).  Target ~``target_block_bytes`` per
    block with a ``min_blocks`` floor for map parallelism; once the
    computed count reaches Ray's own default the override is dropped
    entirely — a 100 TB input is block-rich either way, so this only
    removes the small-file pathology and never caps real scale.
    """
    import os as _os

    import ray
    import ray.data as rd

    def _bytes_of(p):
        return _os.path.getsize(p) if _os.path.isfile(p) else sum(
            _os.path.getsize(_os.path.join(r, f))
            for r, _d, fs in _os.walk(p) for f in fs)

    try:
        size = sum(_bytes_of(p) for p in path) \
            if isinstance(path, (list, tuple)) else _bytes_of(path)
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        nb = max(min_blocks, -(-size // target_block_bytes))
        if nb >= 2 * ncpu:
            return rd.read_parquet(path, columns=columns)
        return rd.read_parquet(path, columns=columns,
                               override_num_blocks=int(nb))
    except OSError:
        return rd.read_parquet(path, columns=columns)
