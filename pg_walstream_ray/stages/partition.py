"""Hash partitioning of change events by conversation key, with hot-key salt.

Routing contract (SURVEY.md §7 "Shuffles and their keys"):
  - normal key: ``partition_id = crc32(conv_id) % P`` — conversation
    affinity keeps per-key ordering partition-local.
  - hot key (skew mitigation): salt by ``turn_idx % salt`` so a hot
    conversation fans out over ``salt`` partitions while every
    ``(conv_id, turn_idx)`` primary key still lands wholly in ONE partition
    (LWW merge therefore stays partition-local and per-key lsn order is
    preserved — SURVEY.md §7 hard part 4).
  - truncate rows are broadcast to every partition (they affect all keys).

The hash is crc32 — stable across processes/runs, which resume correctness
requires (a Python ``hash()`` would be salted per process).  It is computed
once per *unique* key via dictionary encoding, not per row.
"""

from __future__ import annotations

import zlib
from typing import FrozenSet, Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def stable_hash_strings(arr: pa.ChunkedArray) -> np.ndarray:
    """crc32 per value, computed on dictionary uniques only."""
    enc = pc.dictionary_encode(arr).combine_chunks()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dictionary = enc.dictionary.to_pylist()
    uniq = np.fromiter(
        (zlib.crc32(s.encode()) if s is not None else 0 for s in dictionary),
        dtype=np.uint32, count=len(dictionary))
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return uniq[idx]


class Partitioner:
    """map_batches stage: add ``partition_id``; broadcast truncates.

    Stateless and deterministic: safe as plain tasks, safe to re-run.
    ``hot_keys`` must be the same set across a run and its resumes (the
    pipeline persists it in the lake config).
    """

    def __init__(self, num_partitions: int,
                 hot_keys: Optional[Iterable[str]] = None, salt: int = 8,
                 drop_cols: Iterable[str] = ()):
        self.num_partitions = num_partitions
        self.hot_keys: FrozenSet[str] = frozenset(hot_keys or ())
        self.salt = max(1, salt)
        # optional column shed before the all-to-all exchange; the generic
        # stage is schema-preserving by default (taps/custom pipelines may
        # rely on envelope control columns) — the CDC pipeline opts in
        self.drop_cols = tuple(drop_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        P = self.num_partitions
        drop = [c for c in self.drop_cols if c in batch.column_names]
        if drop:
            batch = batch.drop(drop)
        n = batch.num_rows
        if n == 0:
            return batch.append_column("partition_id", pa.array([], pa.int32()))
        op = batch["op"]
        is_trunc_arr = pc.equal(op, "truncate")
        has_trunc = pc.any(is_trunc_arr).as_py()
        dml = batch.filter(pc.invert(is_trunc_arr)) if has_trunc else batch

        h = stable_hash_strings(dml["conv_id"])
        pid = (h % P).astype(np.int32)
        if self.hot_keys:
            conv = dml["conv_id"]
            hot_mask = pc.is_in(conv, value_set=pa.array(list(self.hot_keys)))
            hot_np = np.asarray(hot_mask)
            if hot_np.any():
                turn = pc.fill_null(dml["turn_idx"], 0).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                salted = ((h.astype(np.int64) + 1 + (turn % self.salt)) % P)
                pid = np.where(hot_np, salted.astype(np.int32), pid)
        out = dml.append_column("partition_id", pa.array(pid, pa.int32()))

        if has_trunc:
            trunc = batch.filter(is_trunc_arr)
            pieces = [out]
            for p in range(P):
                pieces.append(trunc.append_column(
                    "partition_id",
                    pa.array(np.full(trunc.num_rows, p, dtype=np.int32))))
            out = pa.concat_tables(pieces)
        return out


def detect_hot_keys(sample: pa.Table, threshold_frac: float = 0.2,
                    key_col: str = "conv_id") -> FrozenSet[str]:
    """One-shot skew probe over a sample: keys holding more than
    ``threshold_frac`` of sampled rows.  The result must be persisted (lake
    config) before use so reruns partition identically."""
    if sample.num_rows == 0:
        return frozenset()
    counts = sample.group_by(key_col).aggregate([(key_col, "count")])
    total = sample.num_rows
    names = counts[key_col].to_pylist()
    cnt = counts[f"{key_col}_count"].to_numpy(zero_copy_only=False)
    return frozenset(nm for nm, c in zip(names, cnt)
                     if nm is not None and c / total >= threshold_frac)
