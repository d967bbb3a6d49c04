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


# ---------------------------------------------------------------------------
# t-digest: mergeable approximate quantiles (the unbounded-domain companion
# to the exact histogram quantiles in analytics.group_quantiles)
# ---------------------------------------------------------------------------

TDIGEST_DELTA = 200             # compression: <= ~2*delta centroids


def tdigest_build(values: np.ndarray, weights: np.ndarray,
                  delta: int = TDIGEST_DELTA):
    """Merging t-digest over (value, weight) pairs — fully vectorized.

    Sorts by value, bins midpoint ranks with the k1 scale function
    ``k(q) = (delta/2pi) * (asin(2q-1) + pi/2)`` (tight centroids at the
    tails, coarse near the median), and reduces each bin to its weighted
    mean.  Returns (means, weights) float64 arrays, <= ~2*delta long.
    """
    order = np.argsort(values, kind="mergesort")
    v, w = values[order].astype(np.float64), weights[order].astype(np.float64)
    total = w.sum()
    if total == 0:
        return np.zeros(0), np.zeros(0)
    mid = np.cumsum(w) - w / 2.0
    q = mid / total
    k = np.floor((delta / (2 * np.pi))
                 * (np.arcsin(2.0 * q - 1.0) + np.pi / 2)).astype(np.int64)
    _, ids = np.unique(k, return_inverse=True)
    sw = np.bincount(ids, weights=w)
    sm = np.bincount(ids, weights=v * w) / sw
    return sm, sw


def tdigest_merge(parts):
    """Merge [(means, weights), ...] into one digest (concat + rebuild)."""
    means = np.concatenate([m for m, _ in parts if len(m)])
    weights = np.concatenate([w for _, w in parts if len(w)])
    if len(means) == 0:
        return np.zeros(0), np.zeros(0)
    return tdigest_build(means, weights)


def tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                     q: float) -> float:
    """Quantile estimate: linear interpolation between centroid midpoints."""
    total = weights.sum()
    target = q * total
    mid = np.cumsum(weights) - weights / 2.0
    i = int(np.searchsorted(mid, target))
    if i <= 0:
        return float(means[0])
    if i >= len(means):
        return float(means[-1])
    t = (target - mid[i - 1]) / (mid[i] - mid[i - 1])
    return float(means[i - 1] + t * (means[i] - means[i - 1]))


def approx_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99)):
    """Approximate grouped quantiles of ``l_extendedprice`` per
    ``l_returnflag`` via mergeable t-digests.

    Output: (l_returnflag, p50, p90, p99) — one row per flag.

    Scale shape (same as HLL): each batch ships one <=2*delta-centroid
    digest per group — constant bytes per (batch, group), ZERO shuffle;
    the driver merges the tiny digests.  Exactness trade: rank error
    O(q(1-q)/delta), pinned by accuracy tests against the exact
    quantiles; no SQL oracle by design.
    """
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice"])

    def batch_digest(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"g": t["l_returnflag"].to_numpy(zero_copy_only=False),
                           "v": t["l_extendedprice"].to_numpy(zero_copy_only=False)})
        rows = {"l_returnflag": [], "means": [], "weights": []}
        for g, sub in df.groupby("g", sort=False):
            v = sub["v"].to_numpy(np.float64)
            m, w = tdigest_build(v, np.ones_like(v))
            rows["l_returnflag"].append(g)
            rows["means"].append(m.tobytes())
            rows["weights"].append(w.tobytes())
        return pa.table({
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "means": pa.array(rows["means"], pa.binary()),
            "weights": pa.array(rows["weights"], pa.binary()),
        })

    parts: dict = {}
    for b in ds.map_batches(batch_digest, batch_format="pyarrow",
                            batch_size=262144).iter_batches(
            batch_format="pyarrow"):
        for g, m, w in zip(b["l_returnflag"].to_pylist(),
                           b["means"].to_pylist(),
                           b["weights"].to_pylist()):
            parts.setdefault(g, []).append(
                (np.frombuffer(m, np.float64), np.frombuffer(w, np.float64)))
    out = {"l_returnflag": [], "p50": [], "p90": [], "p99": []}
    for g in sorted(parts):
        m, w = tdigest_merge(parts[g])
        out["l_returnflag"].append(g)
        for q, name in zip(qs, ("p50", "p90", "p99")):
            out[name].append(tdigest_quantile(m, w, q))
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# count-min sketch + candidate tracking: approximate heavy hitters (the
# zero-token-shuffle companion to textops.token_heavy_hitters)
# ---------------------------------------------------------------------------

CMS_D = 4                       # hash rows
CMS_W = 1 << 14                 # counters per row (16384)
_CMS_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def cms_positions(h64: np.ndarray) -> np.ndarray:
    """Derive the CMS_D row positions from one 64-bit hash per key
    (multiply-shift; shape (CMS_D, n))."""
    pos = np.empty((CMS_D, len(h64)), np.int64)
    for d in range(CMS_D):
        pos[d] = ((h64 * _CMS_SALTS[d]) >> np.uint64(64 - 14)).astype(np.int64)
    return pos


def cms_fold(h64: np.ndarray, counts: np.ndarray,
             table: np.ndarray) -> np.ndarray:
    """Add (key-hash, count) pairs into the (CMS_D, CMS_W) table."""
    pos = cms_positions(h64)
    for d in range(CMS_D):
        np.add.at(table[d], pos[d], counts)
    return table


def cms_estimate(h64: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Point-query estimates (min over rows) for each key hash."""
    pos = cms_positions(h64)
    return np.min(
        np.stack([table[d][pos[d]] for d in range(CMS_D)]), axis=0)


def approx_heavy_hitters(sf_dir: str, k: int = 20, cand_per_batch: int = 80):
    """Approximate top-k tokens: per-batch count-min sketches + local
    candidate lists, merged on the driver.

    Output: (token, n_approx) ordered (n_approx DESC, token ASC), k rows.

    Scale shape: each batch ships one fixed 512 KiB CMS + its local top-C
    candidate tokens — constant bytes per batch, no token-keyed shuffle at
    all (compare textops.token_heavy_hitters, which shuffles the distinct
    token set).  CMS only OVERestimates, so any true top-k member appears
    in some batch's local top-C; accuracy is pinned by tests (top-k
    overlap + bounded overestimate), no SQL oracle by design.
    """
    import ray.data as rd

    from ..functions.hashing import fast_hash64

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])

    def batch_sketch(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        vals, cnts = vc.field("values"), \
            vc.field("counts").to_numpy(zero_copy_only=False)
        h = fast_hash64(vals)
        table = cms_fold(h, cnts.astype(np.int64),
                         np.zeros((CMS_D, CMS_W), np.int64))
        top = np.argsort(cnts, kind="mergesort")[::-1][:cand_per_batch]
        return pa.table({
            "cms": pa.array([table.tobytes()], pa.binary()),
            "cands": pa.array([vals.take(pa.array(top)).to_pylist()],
                              pa.list_(pa.string())),
        })

    table = np.zeros((CMS_D, CMS_W), np.int64)
    cands: set = set()
    for b in ds.map_batches(batch_sketch, batch_format="pyarrow",
                            batch_size=262144).iter_batches(
            batch_format="pyarrow"):
        for blob, cl in zip(b["cms"].to_pylist(), b["cands"].to_pylist()):
            table += np.frombuffer(blob, np.int64).reshape(CMS_D, CMS_W)
            cands.update(cl)
    from ..functions.hashing import fast_hash64 as _fh

    cand_list = sorted(cands)
    est = cms_estimate(_fh(cand_list), table)
    order = np.lexsort((np.array(cand_list, dtype=object), -est))[:k]
    return pd.DataFrame({
        "token": [cand_list[i] for i in order],
        "n_approx": est[order].astype(np.int64),
    })


def approx_group_distinct(sf_dir: str, hash_mode: str = "fast"):
    """Per-group approximate COUNT(DISTINCT): distinct users per
    event_type via GROUPED HyperLogLog sketches — the grouped companion
    to ``approx_user_days``'s single global sketch.

    Output: (event_type, n_approx) — one row per event type.

    Scale shape: each batch folds its (type, user) pairs into one 4 KiB
    sketch PER TYPE PRESENT (local exact dedup first, so fold cost is
    distinct pairs, not rows); the only exchange is a groupby of
    |types| x batches sketch rows merged by elementwise register max —
    users never shuffle, and the answer for a 100 TB events table moves
    O(types x batches x 4 KiB).  Approximate by design (rows-only driver
    check); accuracy vs the exact distinct is pinned in tests (<5%).
    """
    import ray.data as rd

    from ..functions.hashing import fast_hash64

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])

    def batch_sketch(t: pa.Table) -> pa.Table:
        pairs = pa.table({"event_type": t["event_type"],
                          "user_id": t["user_id"]}) \
            .group_by(["event_type", "user_id"]).aggregate([])
        et = pairs["event_type"].to_numpy(zero_copy_only=False)
        uid = pc.cast(pairs["user_id"], pa.string())
        hashes = md5_hash64(uid.to_pylist()) if hash_mode == "md5" \
            else fast_hash64(uid)
        types, blobs = [], []
        for ty in np.unique(et):
            regs = hll_fold(hashes[et == ty],
                            np.zeros(HLL_M, dtype=np.int8))
            types.append(ty)
            blobs.append(regs.tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "registers": pa.array(blobs, pa.binary())})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(HLL_M, dtype=np.int8)
        for blob in g["registers"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int8))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_approx": [np.int64(hll_estimate(merged))]})

    return (ds.map_batches(batch_sketch, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("event_type").map_groups(merge_group,
                                              batch_format="pandas"))
