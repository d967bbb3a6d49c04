"""Per-partition commit manifests: the exactly-once ledger.

The reference's checkpoint is the replication slot + monotone LSN feedback
(``SharedLsnFeedback`` CAS-max, /root/reference/src/lsn.rs:105-173; resume
from ``last_received_lsn``, stream.rs:862-898).  Our equivalent
(SURVEY.md §4 "Checkpoint / resume"): each lake partition owns a manifest
``{partition_id, applied_lsn, row_count, fragment, lineage}`` written
atomically (temp + rename) after each applied window.  Replayed events with
``commit_lsn <= applied_lsn`` are filtered — idempotent, monotone, so
duplicates after restart are no-ops exactly like the reference's re-acks.

The global watermark = min(applied_lsn) across partitions — the analogue of
``send_standby_status_update``'s applied LSN (the WAL-truncation point,
connection/libpq.rs:337-413).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional


@dataclass
class PartitionManifest:
    partition_id: int
    # VECTOR watermark: one monotone applied-LSN per source (WAL shard /
    # slot).  Each source owns an independent LSN space, so a scalar
    # watermark would let a high-LSN source mask an unapplied low-LSN one.
    # JSON object keys are strings: {"0": lsn, "1": lsn, ...}.
    applied_lsns: Dict[str, int] = field(default_factory=dict)
    # exact after a base write/compaction; between compactions delta rows
    # make it an upper-bound estimate (documented in apply.py)
    row_count: int = 0
    # ordered fragment chain: [base?, delta, delta, ...] — merge-on-read by
    # (_lsn LWW + tombstones); compaction collapses the chain to one base
    fragments: List[str] = field(default_factory=list)
    epoch: int = 0                       # increments per applied window
    lineage: List[dict] = field(default_factory=list)  # per-window records

    @property
    def fragment(self) -> Optional[str]:
        """Back-compat single-fragment view (last element of the chain)."""
        return self.fragments[-1] if self.fragments else None

    def applied_for(self, source: int) -> int:
        return self.applied_lsns.get(str(source), -1)

    def to_json(self) -> str:
        return json.dumps(asdict(self))


def partition_dir(lake_dir: str, partition_id: int) -> str:
    return os.path.join(lake_dir, f"part={partition_id:05d}")


def manifest_path(lake_dir: str, partition_id: int) -> str:
    return os.path.join(partition_dir(lake_dir, partition_id), "manifest.json")


def read_manifest(lake_dir: str, partition_id: int) -> PartitionManifest:
    p = manifest_path(lake_dir, partition_id)
    if not os.path.exists(p):
        return PartitionManifest(partition_id=partition_id)
    with open(p) as f:
        d = json.load(f)
    if "fragment" in d:          # legacy single-fragment manifests
        frag = d.pop("fragment")
        d.setdefault("fragments", [frag] if frag else [])
    return PartitionManifest(**d)


def write_manifest_atomic(lake_dir: str, m: PartitionManifest) -> None:
    """Atomic publish: temp file + os.replace (POSIX rename atomicity).

    A crash before the rename leaves the previous manifest intact; a crash
    after is a completed apply.  This is the idempotence point the whole
    exactly-once story hangs on (SURVEY.md §7 hard part 1).
    """
    d = partition_dir(lake_dir, m.partition_id)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        f.write(m.to_json())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(lake_dir, m.partition_id))


def list_partitions(lake_dir: str) -> List[int]:
    if not os.path.isdir(lake_dir):
        return []
    out = []
    for name in os.listdir(lake_dir):
        if name.startswith("part="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def all_manifests(lake_dir: str) -> Dict[int, PartitionManifest]:
    return {pid: read_manifest(lake_dir, pid) for pid in list_partitions(lake_dir)}


def global_watermark(lake_dir: str,
                     num_partitions: Optional[int] = None) -> Dict[str, int]:
    """Per-source min applied_lsn across partitions — the safe WAL-GC /
    feedback point for each slot (the analogue of the applied LSN the
    reference acks via send_standby_status_update).

    With ``num_partitions`` given, partitions that have never applied a
    source count as -1 for it (nothing safe to GC yet), mirroring 'applied
    advances only to the last contiguous applied commit'
    (examples/safe-transaction-consumer/src/main.rs:190-206).
    """
    ms = all_manifests(lake_dir)
    sources = sorted({s for m in ms.values() for s in m.applied_lsns})
    pids = range(num_partitions) if num_partitions is not None else sorted(ms)
    out: Dict[str, int] = {}
    for s in sources:
        vals = [(ms[p].applied_lsns.get(s, -1) if p in ms else -1)
                for p in pids]
        out[s] = min(vals) if vals else -1
    return out


def min_watermark(lake_dir: str, num_partitions: Optional[int] = None) -> int:
    wm = global_watermark(lake_dir, num_partitions)
    return min(wm.values()) if wm else -1


def record_window(m: PartitionManifest, per_source_max_commit: Dict[int, int],
                  window_min_lsn: int, rows_applied: int,
                  fragments: List[str], row_count: int,
                  compacted: bool = False) -> PartitionManifest:
    m.epoch += 1
    for s, lsn in per_source_max_commit.items():
        k = str(s)
        m.applied_lsns[k] = max(m.applied_lsns.get(k, -1), lsn)
    m.row_count = row_count
    m.fragments = list(fragments)
    m.lineage.append({
        "epoch": m.epoch,
        "window_min_lsn": window_min_lsn,
        "applied": {str(s): v for s, v in per_source_max_commit.items()},
        "rows_applied": rows_applied,
        "compacted": compacted,
        "ts": time.time(),
    })
    return m
