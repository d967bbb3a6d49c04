"""Write-Audit-Publish (WAP) staged ingestion over the transcript lake.

The lakehouse safety pattern: a replay lands in an isolated STAGING lake,
a distributed audit verifies the exactly-once ledger against the physical
fragments, and only a fully-green audit atomically PUBLISHES the staging
lake as the live one — a crashed or corrupted ingest can never become
visible to readers (the reference's consumer tier gets the same guarantee
from transaction boundaries + the replication slot; WAP extends it to
whole-run granularity, the way Iceberg's ``wap.id`` branch workflow does
for Spark ingests).

Audit checks (one Ray task per partition — embarrassingly parallel,
nothing driver-side but the boolean fold):
  1. manifest/fragment agreement — every fragment in the manifest chain
     exists; no orphan parquet files sit outside the chain (a torn write
     leaves orphans, a lost manifest update leaves ghosts);
  2. lineage integrity — epochs contiguous from 1, per-source applied
     LSNs non-decreasing across lineage windows (the monotone-watermark
     invariant the exactly-once filter depends on);
  3. key ownership — every live conv_id hashes (crc32 % P) to its
     partition (hot-salted keys excepted), the co-location invariant all
     per-partition merge/lookup paths assume;
  4. primary-key uniqueness of the merged live state ((conv_id,
     turn_idx) unique after LWW merge-on-read);
  5. optional watermark gate — per-source applied LSNs equal the
     expected final commit LSNs (proves the replay consumed the whole
     WAL, not a prefix).

Publish is ``os.rename`` of the staging directory onto the target path —
atomic on POSIX when the target does not exist.  For an in-place refresh
of an EXISTING lake the pattern is the same dance version pointers do:
rename live -> retired, staging -> live (two renames; readers pin the
manifest set they opened, so a concurrent reader sees old or new, never a
mix).
"""

from __future__ import annotations

import os
import zlib
from typing import Dict, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ..lake import _partition_state, read_lake_config
from ..state.manifest import list_partitions, partition_dir, read_manifest

AUDIT_COLS = ("pid", "n_live_rows", "n_fragments", "orphans",
              "lineage_ok", "ownership_ok", "pk_unique", "watermark_ok",
              "ok")


def _audit_partition(lake_dir: str, pid: int, num_partitions: int,
                     hot_keys: frozenset,
                     expected_watermark: Optional[Dict[str, int]]) -> dict:
    """Audit one partition (runs as a Ray task; reads only this
    partition's manifest + fragments)."""
    m = read_manifest(lake_dir, pid)
    d = partition_dir(lake_dir, pid)

    # 1. physical/ledger agreement
    missing = [f for f in m.fragments
               if not os.path.exists(os.path.join(d, f))]
    on_disk = {f for f in os.listdir(d) if f.endswith(".parquet")} \
        if os.path.isdir(d) else set()
    orphans = sorted(on_disk - set(m.fragments))

    # 2. lineage integrity: epochs contiguous from 1, and the manifest's
    # final vector watermark dominates every lineage window's per-source
    # applied max (true regardless of window arrival order — apply is
    # order-insensitive under segment-parallel decode)
    epochs = [w.get("epoch") for w in m.lineage]
    lineage_ok = epochs == list(range(1, len(epochs) + 1))
    for w in m.lineage:
        for s, lsn in (w.get("applied") or {}).items():
            if m.applied_lsns.get(s, -1) < lsn:
                lineage_ok = False

    # 3/4. merged live state: ownership + PK uniqueness
    n_live = 0
    ownership_ok = True
    pk_unique = True
    if m.fragments and not missing:
        paths = [os.path.join(d, f) for f in m.fragments]
        t = _partition_state(paths, columns=["conv_id", "turn_idx"])
        n_live = t.num_rows
        if n_live:
            convs = t["conv_id"].to_pylist()
            turns = t["turn_idx"].to_numpy(zero_copy_only=False)
            seen = set()
            for c, ti in zip(convs, turns):
                if (c, int(ti)) in seen:
                    pk_unique = False
                    break
                seen.add((c, int(ti)))
            for c in set(convs):
                if c in hot_keys:
                    continue            # salted: fans out by design
                if zlib.crc32(c.encode()) % num_partitions != pid:
                    ownership_ok = False
                    break

    # 5. watermark gate
    watermark_ok = True
    if expected_watermark is not None:
        watermark_ok = all(m.applied_lsns.get(str(s), -1) == lsn
                           for s, lsn in expected_watermark.items())

    ok = (not missing and not orphans and lineage_ok and ownership_ok
          and pk_unique and watermark_ok)
    return {"pid": pid, "n_live_rows": n_live,
            "n_fragments": len(m.fragments),
            "orphans": len(orphans) + len(missing),
            "lineage_ok": lineage_ok, "ownership_ok": ownership_ok,
            "pk_unique": pk_unique, "watermark_ok": watermark_ok,
            "ok": ok}


def audit_lake(lake_dir: str,
               expected_watermark: Optional[Dict[str, int]] = None
               ) -> pa.Table:
    """Distributed WAP audit: one task per partition, returns the
    per-partition report table (columns AUDIT_COLS)."""
    import ray

    cfg = read_lake_config(lake_dir) or {}
    num_partitions = int(cfg.get("num_partitions", 0)) or \
        (max(list_partitions(lake_dir)) + 1 if list_partitions(lake_dir)
         else 0)
    hot = frozenset(cfg.get("hot_keys", ()))

    task = ray.remote(num_cpus=1)(_audit_partition)
    reports = ray.get([task.remote(lake_dir, pid, num_partitions, hot,
                                   expected_watermark)
                       for pid in list_partitions(lake_dir)])
    reports.sort(key=lambda r: r["pid"])
    cols = {c: [r[c] for r in reports] for c in AUDIT_COLS}
    return pa.table({
        "pid": pa.array(cols["pid"], pa.int64()),
        "n_live_rows": pa.array(cols["n_live_rows"], pa.int64()),
        "n_fragments": pa.array(cols["n_fragments"], pa.int64()),
        "orphans": pa.array(cols["orphans"], pa.int64()),
        "lineage_ok": pa.array(cols["lineage_ok"], pa.bool_()),
        "ownership_ok": pa.array(cols["ownership_ok"], pa.bool_()),
        "pk_unique": pa.array(cols["pk_unique"], pa.bool_()),
        "watermark_ok": pa.array(cols["watermark_ok"], pa.bool_()),
        "ok": pa.array(cols["ok"], pa.bool_()),
    })


class AuditError(RuntimeError):
    """Raised when a WAP audit fails; carries the report table."""

    def __init__(self, report: pa.Table):
        self.report = report
        bad = report.filter(pc.invert(report["ok"]))
        super().__init__(
            f"WAP audit failed for partitions "
            f"{bad['pid'].to_pylist()} — staging NOT published")


def wap_replay(wal_dir: str, lake_dir: str, num_partitions: int = 8,
               expected_watermark: Optional[Dict[str, int]] = None,
               **run_kw) -> Tuple[pa.Table, str]:
    """Write-audit-publish replay: run the CDC replay into
    ``<lake_dir>.staging``, audit it, and atomically publish to
    ``lake_dir`` only if every partition audits green.

    Returns (audit_report, published_path).  Raises AuditError (staging
    left in place for forensics) if any check fails.  ``lake_dir`` must
    not already exist (fresh-publish form; an in-place refresh would
    swap via double rename as described in the module docstring).
    """
    import shutil

    from .cdc import run_cdc

    if os.path.exists(lake_dir):
        raise ValueError(f"target {lake_dir} exists; WAP publishes fresh")
    staging = lake_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)

    run_cdc(wal_dir, staging, num_partitions=num_partitions, **run_kw)
    report = audit_lake(staging, expected_watermark)
    # zero partitions == an empty replay: vacuously green (publish the
    # empty-but-configured lake; readers see a typed empty snapshot)
    if not all(report["ok"].to_pylist()):
        raise AuditError(report)
    os.rename(staging, lake_dir)        # atomic: target absent
    return report, lake_dir
