"""Sketch operators — HyperLogLog approximate distinct counting.

The scale path for distinct-cardinality questions where the exact
two-level dedup (``temporal.user_active_days``) would shuffle the full
distinct set: each batch folds its rows into a fixed 2^P-register HLL
sketch (a few KiB), sketches merge by elementwise max, and only the
merged registers travel — constant bytes per batch regardless of input
size, no shuffle at all.

Deterministic: the row hash is md5 (seedless), so the estimate is stable
across runs/partitionings — merge order never matters for max().  No SQL
oracle (approximate by design); accuracy is pinned by unit tests against
the exact count (stderr ~= 1.04/sqrt(2^P) ~ 1.6% at P=12).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

HLL_P = 12                      # 4096 registers
HLL_M = 1 << HLL_P


def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_fold(hashes: np.ndarray, registers: np.ndarray) -> np.ndarray:
    """Fold 64-bit hashes into the register array (in place, returned)."""
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = (hashes << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rho = leading zeros of w (within 64 bits) + 1; the OR above seeds the
    # low bits so rho is capped at 64-P+1 without a branch
    nbits = np.zeros(len(w), dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(64 - shift))
        nbits = np.where(mask, nbits, nbits + shift)
        v = np.where(mask, v, v << np.uint64(shift))
    rho = (nbits + 1).astype(np.int8)
    np.maximum.at(registers, idx, rho)
    return registers


def hll_estimate(registers: np.ndarray) -> int:
    m = float(HLL_M)
    est = _alpha(HLL_M) * m * m / np.sum(2.0 ** (-registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if est <= 2.5 * m and zeros:              # small-range linear counting
        est = m * np.log(m / zeros)
    return int(round(est))


def md5_hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of string values (md5 prefix)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
         for s in values),
        dtype=np.uint64, count=len(values))


def approx_user_days(sf_dir: str, hash_mode: str = "fast"):
    """Approximate count of distinct (user_id, day) pairs over events.

    Output: one row (n_approx:int64).

    Per-batch: local exact dedup (combiner) then fold into a 4 KiB sketch;
    the driver merges the tiny per-batch sketches by elementwise max —
    no shuffle, O(batches * 4KiB) network.  Compare
    ``temporal.user_active_days`` for the exact (shuffling) variant.

    ``hash_mode='fast'`` (default) feeds the HLL with the vectorized
    xxhash64; ``'md5'`` keeps the md5-prefix hash (both seedless and
    order-independent, so either estimate is run-stable; accuracy tests
    pin both).
    """
    import ray.data as rd

    from ..functions.hashing import fast_hash64

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])

    def batch_sketch(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t["ts"], unit="day"), "%Y-%m-%d")
        keys = pa.table({"user_id": t["user_id"], "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])
        joined = pc.binary_join_element_wise(
            pc.cast(keys["user_id"], pa.string()), keys["day"], "|")
        if hash_mode == "md5":
            hashes = md5_hash64(joined.to_pylist())
        else:
            hashes = fast_hash64(joined)
        regs = hll_fold(hashes, np.zeros(HLL_M, dtype=np.int8))
        return pa.table({"registers": pa.array([regs.tobytes()],
                                               pa.binary())})

    merged = np.zeros(HLL_M, dtype=np.int8)
    for b in ds.map_batches(batch_sketch, batch_format="pyarrow",
                            batch_size=262144).iter_batches(
            batch_format="pyarrow"):
        for blob in b["registers"].to_pylist():
            merged = np.maximum(merged,
                                np.frombuffer(blob, dtype=np.int8))
    return pd.DataFrame({"n_approx": [np.int64(hll_estimate(merged))]})
