"""Transcript lake: partitioned Parquet fragments + manifests.

Layout (resumable output, one directory per partition):

    lake_dir/
      config.json                     # num_partitions, hot_keys, salt
      part=00000/
        manifest.json                 # applied_lsn, row_count, fragment, lineage
        fragment-000001-<lsn>.parquet # current state, sorted (conv_id, turn_idx)
      part=00001/ ...

Snapshot reads list each partition's manifest and read exactly the fragment
it points to — a half-written fragment (no manifest pointing at it) is
invisible, which is what makes kill-at-any-point safe.  Schema differences
across fragments (written before/after a schema evolution) are conformed on
read: missing columns null-filled, narrower ints widened (SURVEY.md §1.4).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .state.manifest import all_manifests, partition_dir


def write_lake_config(lake_dir: str, num_partitions: int,
                      hot_keys: Tuple[str, ...] = (), salt: int = 8,
                      sink: str = "lww") -> None:
    os.makedirs(lake_dir, exist_ok=True)
    p = os.path.join(lake_dir, "config.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_partitions": num_partitions,
                   "hot_keys": sorted(hot_keys), "salt": salt,
                   "sink": sink}, f)
    os.replace(tmp, p)


def read_lake_config(lake_dir: str) -> Optional[dict]:
    p = os.path.join(lake_dir, "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def live_fragments(lake_dir: str) -> List[Tuple[int, List[str]]]:
    """Per partition: (pid, ordered fragment-chain paths)."""
    out = []
    for pid, m in sorted(all_manifests(lake_dir).items()):
        if m.fragments:
            d = partition_dir(lake_dir, pid)
            out.append((pid, [os.path.join(d, f) for f in m.fragments]))
    return out


def _unify(tables: List[pa.Table]) -> pa.Table:
    if not tables:
        return pa.table({})
    schema = pa.unify_schemas([t.schema for t in tables],
                              promote_options="permissive")
    conformed = []
    for t in tables:
        cols = {}
        for f in schema:
            if f.name in t.column_names:
                col = t[f.name]
                cols[f.name] = pc.cast(col, f.type) if col.type != f.type else col
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        conformed.append(pa.table(cols))
    return pa.concat_tables(conformed)


def _partition_state(paths: List[str],
                     key_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
                     columns: Optional[List[str]] = None,
                     key_equals=None) -> pa.Table:
    """Merge one partition's fragment chain (LWW by _lsn, tombstones
    resolved) -> current state (payload + _lsn).  ``columns`` pushes
    column pruning and ``key_equals=(col, value)`` row-group pruning
    into the fragment reads (merge internals are always read; see
    stages/apply.merged_partition_state)."""
    import os as _os

    from .stages.apply import merged_partition_state

    d = _os.path.dirname(paths[0])
    names = [_os.path.basename(p) for p in paths]
    payload = None if columns is None else \
        list(dict.fromkeys([*key_cols, *columns]))
    return merged_partition_state(d, names, payload, key_cols=key_cols,
                                  key_equals=key_equals)


def snapshot_table(lake_dir: str, sort: bool = True,
                   drop_internal: bool = True,
                   key_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
                   columns: Optional[List[str]] = None) -> pa.Table:
    """Materialized snapshot (driver-side; use for tests / small results).

    Stable turn ordering: global sort by the table's key columns.
    ``columns`` prunes the fragment reads to the requested payload (the
    key columns and merge internals are always read).
    """
    tables = [_partition_state(paths, key_cols, columns=columns)
              for _, paths in live_fragments(lake_dir)]
    tables = [t for t in tables if t.num_rows]
    t = _unify(tables)
    if t.num_rows and drop_internal and "_lsn" in t.column_names:
        t = t.drop(["_lsn"])
    if t.num_rows and sort:
        t = t.take(pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in key_cols]))
    return t


def snapshot_dataset(lake_dir: str, drop_internal: bool = True,
                     key_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
                     columns: Optional[List[str]] = None):
    """Streaming snapshot as a ray.data.Dataset (the scale path): one task
    per partition merges that partition's fragment chain — partitions are
    key-disjoint, so no cross-partition merge exists.

    Per-partition fragments are already sorted by (conv_id, turn_idx); a
    global sort is NOT applied — ordering is per-conversation and
    conversations are partition-local (SURVEY.md §2.7).
    """
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def merge_part(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], key_cols, columns=columns)
            if drop_internal and "_lsn" in t.column_names:
                t = t.drop(["_lsn"])
            if t.num_rows:
                t = t.take(pc.sort_indices(
                    t, sort_keys=[(c, "ascending") for c in key_cols]))
                yield t

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(merge_part, batch_size=1, batch_format="pyarrow")


def history_table(lake_dir: str,
                  key_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
                  sort: bool = True) -> pa.Table:
    """Materialized SCD2 history view of a sink='history' lake (driver-side;
    tests / small results): every version row with (valid_from, valid_to,
    is_current) intervals.  See stages/history.version_intervals."""
    from .stages.history import version_intervals

    tables = []
    for _, paths in live_fragments(lake_dir):
        raw = _unify([pq.read_table(p) for p in paths])
        if raw.num_rows:
            t = version_intervals(raw, key_cols=key_cols)
            if t.num_rows:
                tables.append(t)
    t = _unify(tables)
    if t.num_rows and sort:
        t = t.take(pc.sort_indices(t, sort_keys=[
            *[(c, "ascending") for c in key_cols],
            ("valid_from", "ascending")]))
    return t


def history_as_of(lake_dir: str, lsn: int,
                  key_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
                  sort: bool = True) -> pa.Table:
    """Time-travel read over a sink='history' lake: the table state AS OF
    ``lsn`` — every key's version whose validity interval contains the
    point (``valid_from <= lsn < valid_to``, open intervals unbounded).
    Deletes/truncates at-or-before the point exclude the key, exactly the
    LWW state a bounded replay to ``lsn`` would have produced.

    Driver-side form; the streaming path is
    ``history_dataset(...).filter(...)`` with the same predicate.
    """
    t = history_table(lake_dir, key_cols=key_cols, sort=sort)
    if t.num_rows == 0:
        return t
    vf = pc.less_equal(t["valid_from"], lsn)
    vt = pc.or_kleene(pc.is_null(t["valid_to"]),
                      pc.greater(t["valid_to"], lsn))
    return t.filter(pc.and_(vf, pc.fill_null(vt, True))) \
        .drop(["valid_from", "valid_to", "is_current"])


def history_dataset(lake_dir: str,
                    key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")):
    """Streaming SCD2 history view (the scale path): one task per partition
    reconstructs that partition's intervals — keys are partition-local, so
    no cross-partition state exists and nothing reaches the driver."""
    import ray.data as rd

    from .stages.history import version_intervals

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def intervals_part(batch: pa.Table):
        for row in batch.to_pylist():
            raw = _unify([pq.read_table(p) for p in row["paths"]])
            t = version_intervals(raw, key_cols=key_cols)
            if t.num_rows:
                yield t

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(intervals_part, batch_size=1,
                          batch_format="pyarrow")


def history_diff(lake_dir: str, lsn_a: int, lsn_b: int,
                 key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")):
    """Snapshot diff between two WAL positions over a sink='history' lake:
    which keys were added / removed / updated between state AS OF ``lsn_a``
    and state AS OF ``lsn_b`` (the incremental-feed primitive a downstream
    consumer uses to sync from one checkpoint to another without replaying
    the WAL itself).

    Distributed per partition, like history_as_of's streaming form: keys
    are partition-local, so each task reconstructs its partition's version
    intervals ONCE and classifies keys with two interval-containment masks
    — no cross-partition state, nothing on the driver, and the diff of a
    1000-partition lake is one task wave.  Output rows:
    ``(*key_cols, change, role, text, tool, ts)`` where ``change`` is
    'added' | 'removed' | 'updated'; payload columns carry the version at
    ``lsn_b`` ('added'/'updated') and are NULL for 'removed'.  A key whose
    live version is the same row at both points (valid_from unchanged) is
    not emitted.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from .stages.history import version_intervals

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])
    payload = ["role", "text", "tool", "ts"]

    def live_at(df: pd.DataFrame, lsn: int) -> pd.DataFrame:
        m = (df["valid_from"] <= lsn) & \
            (df["valid_to"].isna() | (df["valid_to"] > lsn))
        return df[m]

    def diff_part(batch: pa.Table):
        for row in batch.to_pylist():
            raw = _unify([pq.read_table(p) for p in row["paths"]])
            t = version_intervals(raw, key_cols=key_cols)
            if not t.num_rows:
                continue
            df = t.to_pandas()
            a = live_at(df, lsn_a).set_index(list(key_cols))
            b = live_at(df, lsn_b).set_index(list(key_cols))
            j = a[["valid_from"]].join(b[["valid_from", *payload]],
                                       how="outer", lsuffix="_a",
                                       rsuffix="_b")
            va = j["valid_from_a"].to_numpy(np.float64, na_value=np.nan)
            vb = j["valid_from_b"].to_numpy(np.float64, na_value=np.nan)
            change = np.where(
                np.isnan(va), "added",
                np.where(np.isnan(vb), "removed", "updated"))
            keep = np.isnan(va) | np.isnan(vb) | (va != vb)
            if not keep.any():
                continue
            j = j[keep]
            out = j.reset_index()[list(key_cols)]
            out["change"] = change[keep]
            for c in payload:
                out[c] = j[c].to_numpy()
            yield pa.table({
                key_cols[0]: pa.array(out[key_cols[0]], pa.string()),
                key_cols[1]: pa.array(out[key_cols[1]], pa.int32()),
                "change": pa.array(out["change"], pa.string()),
                "role": pa.array(out["role"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
                "tool": pa.array(out["tool"], pa.string()),
                "ts": pa.array(out["ts"]).cast(pa.timestamp("us")),
            })

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(diff_part, batch_size=1, batch_format="pyarrow")


def bootstrap_from_snapshot(snapshot_ds, lake_dir: str,
                            lsn0_by_source: dict, num_partitions: int,
                            hot_keys: Tuple[str, ...] = (),
                            salt: int = 8) -> dict:
    """Initial consistent load — the EXPORT_SNAPSHOT analogue
    (/root/reference/src/stream.rs:497-527): seed the lake from a base
    table AS OF per-source LSNs, so a subsequent CDC replay applies only
    commits past the snapshot point (the exactly-once filter does the
    skipping; overlapping transactions replay idempotently under LWW).

    ``snapshot_ds``: ray Dataset (or pyarrow Table) of transcript payload
    rows.  ``lsn0_by_source``: {source_id: lsn} snapshot position per WAL
    shard.  Partitioning params are pinned to the lake config, identical
    to the streaming path, so seeded keys land where the stream routes.
    """
    import numpy as np
    import ray.data as rd

    from .stages.partition import Partitioner
    from .state.manifest import (PartitionManifest, partition_dir,
                                 write_manifest_atomic)

    write_lake_config(lake_dir, num_partitions, hot_keys, salt)
    if isinstance(snapshot_ds, pa.Table):
        snapshot_ds = rd.from_arrow(snapshot_ds)
    lsn0 = {int(k): int(v) for k, v in lsn0_by_source.items()}
    seed_lsn = max(lsn0.values(), default=0)
    part = Partitioner(num_partitions, hot_keys, salt)

    def route(t: pa.Table) -> pa.Table:
        # the Partitioner keys on op/conv_id; seed rows are inserts
        t2 = t.append_column("op", pa.array(
            np.full(t.num_rows, "insert", dtype=object), pa.string()))
        return part(t2).drop(["op"])

    def write_seed(g) -> "pa.Table":
        import pandas as pd

        pid = int(g["partition_id"].iloc[0])
        tbl = pa.Table.from_pandas(
            g.drop(columns=["partition_id"]), preserve_index=False)
        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending")]))
        if "_lsn" in tbl.column_names:
            # rows sourced from an existing lake keep their TRUE last-writer
            # lsn (repartition_lake): inflating it to seed_lsn would make
            # seed rows win against legitimately newer replayed events in
            # sources whose watermark trails the max
            tbl = tbl.set_column(
                tbl.column_names.index("_lsn"), "_lsn",
                pc.cast(tbl["_lsn"], pa.int64()))
        else:
            tbl = tbl.append_column("_lsn", pa.array(
                np.full(tbl.num_rows, seed_lsn, dtype=np.int64)))
        d = partition_dir(lake_dir, pid)
        os.makedirs(d, exist_ok=True)
        frag = f"fragment-000001-{seed_lsn}.parquet"
        tmp = os.path.join(d, f".{frag}.tmp")
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, os.path.join(d, frag))
        m = PartitionManifest(
            partition_id=pid,
            applied_lsns={str(s): l for s, l in lsn0.items()},
            row_count=tbl.num_rows, fragments=[frag], epoch=1,
            lineage=[{"epoch": 1, "bootstrap": True,
                      "applied": {str(s): l for s, l in lsn0.items()},
                      "rows_applied": tbl.num_rows}])
        write_manifest_atomic(lake_dir, m)
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "rows": pa.array([tbl.num_rows], pa.int64())})

    routed = snapshot_ds.map_batches(route, batch_format="pyarrow")
    summary = routed.groupby("partition_id").map_groups(
        write_seed, batch_format="pandas").to_pandas()

    # partitions with no snapshot rows still need the watermark manifest,
    # else replay would re-apply pre-snapshot events routed to them
    seeded = set(summary["partition_id"]) if len(summary) else set()
    for pid in range(num_partitions):
        if pid not in seeded:
            write_manifest_atomic(lake_dir, PartitionManifest(
                partition_id=pid,
                applied_lsns={str(s): l for s, l in lsn0.items()},
                epoch=1,
                lineage=[{"epoch": 1, "bootstrap": True, "rows_applied": 0}]))
    return {"partitions": num_partitions,
            "rows": int(summary["rows"].sum()) if len(summary) else 0}


def repartition_lake(lake_dir: str, out_dir: str, num_partitions: int,
                     hot_keys: Tuple[str, ...] = (), salt: int = 8) -> dict:
    """Re-key a lake to a new partition count (the scale-out/scale-in
    operation a growing deployment needs — partition counts are pinned at
    lake creation and cannot change in place).

    Streams the source lake's merged state (per-partition tasks, nothing
    on the driver) through the bootstrap seeder into ``out_dir`` with
    - each row's TRUE ``_lsn`` preserved (LWW order survives), and
    - the source lake's per-source applied watermarks copied into every
      new manifest,
    so a subsequent ``run_cdc`` against the same (or extended) WAL resumes
    exactly where the source lake stopped: already-applied commits are
    filtered, in-flight ones re-apply idempotently under LWW.

    The source lake is read-only throughout; ``out_dir`` must not exist or
    be empty (atomicity: a crashed repartition leaves a partial out_dir
    with no valid config until the final bootstrap completes — re-run it).
    """
    cfg = read_lake_config(lake_dir)
    if cfg is None:
        raise FileNotFoundError(f"no lake config at {lake_dir}")
    if cfg.get("sink", "lww") != "lww":
        raise NotImplementedError(
            "repartition_lake supports sink='lww' lakes; history lakes "
            "re-route raw version fragments instead")
    from .state.manifest import global_watermark

    wm = {int(k): int(v)
          for k, v in global_watermark(lake_dir,
                                       cfg["num_partitions"]).items()
          if v >= 0}
    if not live_fragments(lake_dir):
        # empty source lake: manifests-only seed (watermarks still carry)
        from .state.manifest import PartitionManifest, write_manifest_atomic

        write_lake_config(out_dir, num_partitions, tuple(hot_keys), salt)
        for pid in range(num_partitions):
            write_manifest_atomic(out_dir, PartitionManifest(
                partition_id=pid,
                applied_lsns={str(s): l for s, l in wm.items()},
                epoch=1,
                lineage=[{"epoch": 1, "bootstrap": True, "rows_applied": 0}]))
        return {"partitions": num_partitions, "rows": 0}
    snap = snapshot_dataset(lake_dir, drop_internal=False)
    return bootstrap_from_snapshot(snap, out_dir, wm, num_partitions,
                                   hot_keys=tuple(hot_keys), salt=salt)


def _assemble_conversations(paths: List[str], sep: str) -> pa.Table:
    """One partition's conversation docs (conv_id, n_turns, doc) —
    Arrow-vectorized assembly over the merged, key-sorted state."""
    import numpy as np
    import pyarrow.compute as _pc

    t = _partition_state(paths, ("conv_id", "turn_idx"),
                         columns=["role", "text"])
    if "_lsn" in t.column_names:
        t = t.drop(["_lsn"])
    if not t.num_rows:
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "n_turns": pa.array([], pa.int64()),
                         "doc": pa.array([], pa.string())})
    t = t.take(_pc.sort_indices(t, sort_keys=[
        ("conv_id", "ascending"), ("turn_idx", "ascending")]))
    lines = _pc.binary_join_element_wise(
        _pc.cast(t["role"], pa.string()), ": ",
        _pc.cast(t["text"], pa.string()), "",
        null_handling="replace", null_replacement="")
    conv = t["conv_id"].combine_chunks()
    cv = conv.to_numpy(zero_copy_only=False)
    change = np.flatnonzero(cv[1:] != cv[:-1]) + 1
    offsets = np.concatenate([[0], change, [len(cv)]])
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        lines.combine_chunks() if isinstance(lines, pa.ChunkedArray)
        else lines)
    docs = _pc.binary_join(lists, sep)
    return pa.table({
        "conv_id": pa.array(cv[offsets[:-1]], pa.string()),
        "n_turns": pa.array(np.diff(offsets).astype(np.int64)),
        "doc": docs})


def _export_one_partition(lake_dir: str, pid: int, paths: List[str],
                          out_dir: str, sep: str) -> dict:
    """Write one partition's corpus docs under ``out_dir/part=NNNNN/``
    with an atomic _DONE marker.  Idempotent and resumable: a finished
    partition (marker present) is skipped; a torn write (crash before
    the marker) leaves only a tmp file the rewrite replaces."""
    import json as _json
    import uuid as _uuid

    d = os.path.join(out_dir, f"part={pid:05d}")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            return {"pid": pid, "skipped": True, **_json.load(f)}
    os.makedirs(d, exist_ok=True)
    t = _assemble_conversations(paths, sep)
    tmp = os.path.join(d, f".docs.parquet.{_uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(t, tmp, compression="zstd")
    os.replace(tmp, os.path.join(d, "docs.parquet"))
    mt = os.path.join(d, ".done.tmp")
    with open(mt, "w") as f:
        _json.dump({"rows": t.num_rows}, f)
    os.replace(mt, marker)                  # marker LAST: crash-safe
    return {"pid": pid, "skipped": False, "rows": t.num_rows}


def export_corpus(lake_dir: str, out_dir: str, sep: str = "\n") -> dict:
    """RESUMABLE partitioned corpus export (the brief's resumable-output
    contract): one output directory per lake partition, each written
    tmp+rename with an atomic ``_DONE`` marker LAST — a re-run after any
    crash skips finished partitions and rewrites only the torn one.
    One Ray task per partition (the compact_lake scheduling shape); the
    driver only folds the per-partition {skipped, rows} reports."""
    import ray

    os.makedirs(out_dir, exist_ok=True)   # empty lake -> empty export dir
    parts = live_fragments(lake_dir)
    task = ray.remote(num_cpus=1)(_export_one_partition)
    reports = ray.get([task.remote(lake_dir, pid, paths, out_dir, sep)
                       for pid, paths in parts])
    return {"partitions": len(reports),
            "written": sum(1 for r in reports if not r["skipped"]),
            "skipped": sum(1 for r in reports if r["skipped"]),
            "rows": sum(r["rows"] for r in reports)}


def export_conversations(lake_dir: str, sep: str = "\n"):
    """Training-corpus export: assemble each conversation's turns into one
    document string ``role: text`` joined by ``sep`` — the step that turns
    the CDC transcript lake into model-ready training rows.

    Output: (conv_id, n_turns, doc) as a streaming Dataset.

    Scale shape: conversations are partition-local (the lake's routing
    invariant), so assembly is a per-partition map with ZERO shuffle; the
    join itself is Arrow-vectorized (ListArray over the partition's
    sorted turn lines + one binary_join kernel), no per-row Python.
    """
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def assemble(batch: pa.Table):
        for row in batch.to_pylist():
            t = _assemble_conversations(row["paths"], sep)
            if t.num_rows:
                yield t

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(assemble, batch_size=1, batch_format="pyarrow")


def audit_conversations(lake_dir: str):
    """Transcript integrity audit over the live lake state: per
    conversation, the turn-index coverage a training-export step needs to
    trust — live turn count, min/max turn_idx, missing-turn count inside
    the observed range, and a contiguity verdict (starts at 0, no holes).
    The data-quality gate between CDC apply and corpus export.

    Output: (conv_id, n_turns, min_turn, max_turn, n_missing,
    is_contiguous) as a streaming Dataset, one row per live conversation.

    Scale shape: conversations are partition-local (the lake's routing
    invariant), so the audit is a per-partition map with ZERO shuffle;
    per partition it is one Arrow sort + numpy reduceat over boundary
    offsets — no per-row Python.
    """
    import numpy as np
    import pyarrow.compute as _pc
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def audit(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=[])
            if not t.num_rows:
                continue
            t = t.take(_pc.sort_indices(t, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
            cv = t["conv_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            ti = t["turn_idx"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            change = np.flatnonzero(cv[1:] != cv[:-1]) + 1
            offsets = np.concatenate([[0], change])
            ends = np.concatenate([change, [len(cv)]])
            n = (ends - offsets).astype(np.int64)
            mn = ti[offsets]                      # sorted: first = min
            mx = ti[ends - 1]
            missing = mx - mn + 1 - n
            yield pa.table({
                "conv_id": pa.array(cv[offsets], pa.string()),
                "n_turns": pa.array(n),
                "min_turn": pa.array(mn),
                "max_turn": pa.array(mx),
                "n_missing": pa.array(missing),
                "is_contiguous": pa.array((mn == 0) & (missing == 0)),
            })

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(audit, batch_size=1, batch_format="pyarrow")


def role_transitions(lake_dir: str):
    """Role-transition matrix over the live lake: counts of
    (from_role -> to_role) pairs between CONSECUTIVE turns of the same
    conversation, in turn order — the transcript-structure signal that
    separates well-formed user/assistant alternation from degenerate
    runs (assistant->assistant) and tool-loop patterns.

    Output: (from_role, to_role, n) — |roles|^2 rows at most.

    Scale shape: per-partition ZERO-SHUFFLE (convs are partition-local;
    one sorted pass + a numpy shift masks conversation boundaries), a
    bounded per-partition combiner, then one tiny groupby over
    |roles|^2 x |partitions| rows.
    """
    import numpy as np
    import pyarrow.compute as _pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    parts = live_fragments(lake_dir)
    empty = pa.table({"from_role": pa.array([], pa.string()),
                      "to_role": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if not parts:
        return rd.from_arrow(empty)

    def pairs(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["role"])
            if t.num_rows < 2:
                continue
            t = t.take(_pc.sort_indices(t, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
            cv = t["conv_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            same = cv[1:] == cv[:-1]          # mask conv boundaries
            if not same.any():
                continue
            roles = pa.table({"r": t["role"]})["r"].combine_chunks()
            g = pa.table({
                "from_role": roles.slice(0, len(roles) - 1)
                .filter(pa.array(same)),
                "to_role": roles.slice(1).filter(pa.array(same)),
            }).group_by(["from_role", "to_role"]) \
                .aggregate([("to_role", "count")])
            yield pa.table({"from_role": g["from_role"],
                            "to_role": g["to_role"],
                            "n": _pc.cast(g["to_role_count"],
                                          pa.int64())})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    agg = ds.map_batches(pairs, batch_size=1, batch_format="pyarrow") \
        .groupby(["from_role", "to_role"]).aggregate(
            Sum("n", alias_name="n_sum"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({"from_role": t["from_role"],
                         "to_role": t["to_role"],
                         "n": _pc.cast(t["n_sum"], pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def tool_chain_stats(lake_dir: str):
    """Tool-chain length distribution over the live lake: maximal runs
    of CONSECUTIVE role='tool' turns within each conversation (adjacent
    rows in turn order — the gaps-and-islands shape), rolled up to
    (chain_len, n_chains) corpus-wide.  Long chains are the
    tool-loop/degenerate-agent signal a transcript curator caps.

    Scale shape: per-partition ZERO-SHUFFLE (convs partition-local; one
    sorted pass, run boundaries via numpy diff over the tool mask and
    the conversation-change mask), bounded per-partition (len, n)
    combiner, one tiny groupby.
    """
    import numpy as np
    import pyarrow.compute as _pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    parts = live_fragments(lake_dir)
    empty = pa.table({"chain_len": pa.array([], pa.int64()),
                      "n_chains": pa.array([], pa.int64())})
    if not parts:
        return rd.from_arrow(empty)

    def chains(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["role"])
            if not t.num_rows:
                continue
            t = t.take(_pc.sort_indices(t, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
            cv = t["conv_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            tool = _pc.equal(t["role"], "tool").combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(bool)
            n = len(tool)
            # run starts: tool row whose predecessor is not a tool row
            # of the SAME conversation
            prev_tool = np.concatenate([[False], tool[:-1]])
            same_conv = np.concatenate([[False], cv[1:] == cv[:-1]])
            start = tool & ~(prev_tool & same_conv)
            # run ends: tool row whose successor is not a same-conv tool
            next_tool = np.concatenate([tool[1:], [False]])
            next_same = np.concatenate([cv[1:] == cv[:-1], [False]])
            end = tool & ~(next_tool & next_same)
            s_idx = np.flatnonzero(start)
            e_idx = np.flatnonzero(end)
            if not len(s_idx):
                continue
            lens = e_idx - s_idx + 1
            uq, cnt = np.unique(lens, return_counts=True)
            yield pa.table({"chain_len": pa.array(uq.astype(np.int64)),
                            "n": pa.array(cnt.astype(np.int64))})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    agg = ds.map_batches(chains, batch_size=1, batch_format="pyarrow") \
        .groupby("chain_len").aggregate(Sum("n", alias_name="n_sum"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "chain_len": pc.cast(t["chain_len"], pa.int64()),
            "n_chains": pc.cast(t["n_sum"], pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def conv_shapes(lake_dir: str, k: int = 4):
    """Conversation-TEMPLATE detection over the live lake: group
    conversations by their OPENING role sequence (first ``k`` turns in
    turn order) — identical openings flag boilerplate/scripted
    transcripts the corpus curator down-weights, the structural dual of
    content dedup (openings are the scripted part; full sequences are
    near-unique).

    Output: (shape, n_convs, min_conv) — one row per distinct role
    sequence, with the lexicographically smallest conv_id as the
    canonical example.

    Scale shape: per-partition ZERO-SHUFFLE assembly (the same
    sorted-boundary ListArray trick as export_conversations, roles only
    — text never read); then ONE shuffle of slim (shape, conv) rows
    grouped by shape for count + min.
    """
    import numpy as np
    import pyarrow.compute as _pc
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def shapes(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["role"])
            if not t.num_rows:
                continue
            t = t.take(_pc.sort_indices(t, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
            cv = t["conv_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            roles = t["role"].combine_chunks()
            change = np.flatnonzero(cv[1:] != cv[:-1]) + 1
            offsets = np.concatenate([[0], change, [len(cv)]])
            lists = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                _pc.cast(roles, pa.string()))
            shape = _pc.binary_join(
                _pc.list_slice(lists, 0, k), ",")
            yield pa.table({
                "shape": shape,
                "conv_id": pa.array(cv[offsets[:-1]], pa.string())})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))

    def per_shape(g):
        import pandas as _pd

        return _pd.DataFrame({
            "shape": [g["shape"].iloc[0]],
            "n_convs": np.array([len(g)], np.int64),
            "min_conv": [g["conv_id"].min()]})

    return ds.map_batches(shapes, batch_size=1, batch_format="pyarrow") \
        .groupby("shape").map_groups(per_shape, batch_format="pandas",
                                     num_cpus=1)


def turn_latency(lake_dir: str, role: str = "assistant"):
    """Response-latency profile over the live lake state: for every turn
    with the given ``role`` that has a preceding turn in its conversation
    (turn order), the gap to that preceding turn's timestamp — the
    "how fast does the assistant answer" signal a transcript curator
    filters on.  Gaps are EXACT int64 microseconds (negative gaps are
    kept: turn order is authoritative, timestamps are evidence).

    Output: (conv_id, n_responses, total_gap_us, max_gap_us), one row per
    conversation with at least one such response turn.

    Scale shape: conversations are partition-local (the lake's routing
    invariant), so the whole profile is a per-partition map with ZERO
    shuffle; per partition it is one Arrow sort + numpy shift/reduceat —
    no per-row Python.
    """
    import numpy as np
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def profile(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["role", "ts"])
            if not t.num_rows:
                continue
            t = t.take(pc.sort_indices(t, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
            cv = t["conv_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            rl = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
            ts = pc.cast(t["ts"].combine_chunks(), pa.int64()).to_numpy(
                zero_copy_only=False)
            n = len(cv)
            if n < 2:
                continue
            # row i responds to row i-1 iff same conversation
            has_prev = np.concatenate([[False], cv[1:] == cv[:-1]])
            gap = np.empty(n, np.int64)
            gap[1:] = ts[1:] - ts[:-1]
            sel = has_prev & (rl == role)
            if not sel.any():
                continue
            # conversation ordinal per row (sorted -> boundary cumsum)
            conv_ord = np.concatenate(
                [[0], np.cumsum(cv[1:] != cv[:-1])])
            starts = np.concatenate(
                [[0], np.flatnonzero(cv[1:] != cv[:-1]) + 1])
            k = conv_ord[sel]                 # sorted (subset of sorted)
            g = gap[sel]
            uk, first = np.unique(k, return_index=True)
            yield pa.table({
                "conv_id": pa.array(cv[starts[uk]], pa.string()),
                "n_responses": pa.array(
                    np.diff(np.concatenate([first, [len(k)]]))
                    .astype(np.int64)),
                "total_gap_us": pa.array(np.add.reduceat(g, first)),
                "max_gap_us": pa.array(np.maximum.reduceat(g, first)),
            })

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(profile, batch_size=1, batch_format="pyarrow")


def merge_lakes(src_dirs: List[str], out_dir: str, num_partitions: int,
                hot_keys: Tuple[str, ...] = (), salt: int = 8) -> dict:
    """Consolidate N LWW lakes into ONE freshly-partitioned lake — the
    regional-consolidation operation (e.g. per-region CDC deployments,
    each applying its own WAL shards, merged into a global table).

    Per-key last-writer-wins across lakes by ``(_lsn, source-lake
    index)`` — the true change LSN survives the merge, so a subsequent
    ``run_cdc`` against the union of the source WALs resumes exactly:
    per-WAL-source applied watermarks are carried as the MIN across the
    lakes that report that source (conservative — any gap re-applies
    idempotently under LWW).

    Scale shape: each source lake streams per-partition merge tasks
    (snapshot_dataset), the union takes ONE partition-key exchange for
    the cross-lake LWW resolve, and the seeder writes one fragment per
    target partition — nothing materializes on the driver.

    Caveat (documented, inherent to LWW snapshots): deletes applied in
    only one source lake cannot mask live versions of the same key held
    by another, because snapshots carry no tombstones.  Intended for
    disjoint key ownership (each conversation's WAL shard applied by
    exactly one lake — the deployment shape above); overlapping-key
    merges with deletes need the history sink.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from .stages.partition import Partitioner
    from .state.manifest import global_watermark

    if not src_dirs:
        raise ValueError("merge_lakes needs at least one source lake")
    wm_acc: dict = {}
    snaps = []
    for i, d in enumerate(src_dirs):
        cfg = read_lake_config(d)
        if cfg is None:
            raise FileNotFoundError(f"no lake config at {d}")
        if cfg.get("sink", "lww") != "lww":
            raise NotImplementedError("merge_lakes supports sink='lww'")
        for s, l in global_watermark(d, cfg["num_partitions"]).items():
            if int(l) >= 0:
                wm_acc.setdefault(int(s), []).append(int(l))

        def tag(t: pa.Table, i=i) -> pa.Table:
            return t.append_column("_src", pa.array(
                np.full(t.num_rows, i, np.int64)))

        snaps.append(snapshot_dataset(d, drop_internal=False)
                     .map_batches(tag, batch_format="pyarrow"))
    merged_wm = {s: min(ls) for s, ls in wm_acc.items()}

    if not any(live_fragments(d) for d in src_dirs):
        # all-empty sources: manifests-only seed (watermarks still carry)
        from .state.manifest import PartitionManifest, write_manifest_atomic

        write_lake_config(out_dir, num_partitions, tuple(hot_keys), salt)
        for pid in range(num_partitions):
            write_manifest_atomic(out_dir, PartitionManifest(
                partition_id=pid,
                applied_lsns={str(s): l for s, l in merged_wm.items()},
                epoch=1,
                lineage=[{"epoch": 1, "bootstrap": True,
                          "rows_applied": 0}]))
        return {"partitions": num_partitions, "rows": 0}

    ds = snaps[0] if len(snaps) == 1 else snaps[0].union(*snaps[1:])
    part = Partitioner(num_partitions, tuple(hot_keys), salt)

    def route(t: pa.Table) -> pa.Table:
        t2 = t.append_column("op", pa.array(
            np.full(t.num_rows, "insert", dtype=object), pa.string()))
        return part(t2).drop(["op"])

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_lsn", "_src"], kind="mergesort")
        g = g.drop_duplicates(["conv_id", "turn_idx"], keep="last")
        return g.drop(columns=["partition_id", "_src"])

    resolved = ds.map_batches(route, batch_format="pyarrow") \
        .groupby("partition_id").map_groups(resolve, batch_format="pandas")
    return bootstrap_from_snapshot(resolved, out_dir, merged_wm,
                                   num_partitions,
                                   hot_keys=tuple(hot_keys), salt=salt)


def _compact_one_partition(lake_dir: str, pid: int,
                           key_cols: Tuple[str, ...]) -> int:
    """Merge one partition's fragment chain to a single base fragment
    (plus tmp/orphan GC).  Returns 1 if a multi-fragment merge happened.
    Safe to run concurrently across partitions: each partition owns its
    manifest and fragment files, and the write is tmp+rename atomic."""
    import uuid as _uuid

    from .stages.apply import merged_partition_state
    from .state.manifest import read_manifest, write_manifest_atomic

    m = read_manifest(lake_dir, pid)
    if len(m.fragments) <= 1:
        compact_partition(lake_dir, pid)
        return 0
    d = partition_dir(lake_dir, pid)
    state = merged_partition_state(d, m.fragments, key_cols=key_cols)
    state = state.take(pc.sort_indices(
        state, sort_keys=[(c, "ascending") for c in key_cols]))
    frag = f"fragment-{m.epoch + 1:06d}-compact.parquet"
    tmp = os.path.join(d, f".{frag}.{_uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(state, tmp, compression="zstd")
    os.replace(tmp, os.path.join(d, frag))
    old = list(m.fragments)
    m.fragments = [frag]
    m.row_count = state.num_rows
    m.epoch += 1
    m.lineage.append({"epoch": m.epoch, "compacted": True,
                      "rows_applied": 0})
    write_manifest_atomic(lake_dir, m)
    for dead in old:
        try:
            os.remove(os.path.join(d, dead))
        except OSError:
            pass
    compact_partition(lake_dir, pid)
    return 1


def compact_lake(lake_dir: str,
                 key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")) -> dict:
    """Force a full merge of every partition's fragment chain to a single
    base fragment (plus tmp/orphan GC).  Normally compaction happens
    inline at COMPACT_AT; this is the explicit maintenance entry.

    Scale shape: partitions are independent (private manifest + fragment
    files), so the merges fan out as one Ray task per partition when a
    session is live — the driver schedules, never touches row data; a
    1000-partition lake compacts in one task wave.  Sequential fallback
    keeps the entry usable from plain scripts."""
    import ray

    pids = [pid for pid, _ in live_fragments(lake_dir)]
    if ray.is_initialized() and len(pids) > 1:
        fn = ray.remote(num_cpus=1)(_compact_one_partition)
        merged_parts = sum(ray.get(
            [fn.remote(lake_dir, pid, key_cols) for pid in pids]))
    else:
        merged_parts = sum(_compact_one_partition(lake_dir, pid, key_cols)
                           for pid in pids)
    return {"partitions_compacted": int(merged_parts)}


def _rewrite_one_partition(lake_dir: str, pid: int, transform,
                           tag: str,
                           key_cols: Tuple[str, ...]) -> int:
    """Compact-style rewrite of one partition's merged state through a
    table->table ``transform`` (backfill / retention).  Same atomicity as
    _compact_one_partition: tmp+rename fragment, manifest epoch bump,
    dead-fragment GC.  Returns the rewritten row count."""
    import uuid as _uuid

    from .stages.apply import merged_partition_state
    from .state.manifest import read_manifest, write_manifest_atomic

    m = read_manifest(lake_dir, pid)
    if not m.fragments:
        return 0
    d = partition_dir(lake_dir, pid)
    state = merged_partition_state(d, m.fragments, key_cols=key_cols)
    state = transform(state)
    state = state.take(pc.sort_indices(
        state, sort_keys=[(c, "ascending") for c in key_cols]))
    frag = f"fragment-{m.epoch + 1:06d}-{tag}.parquet"
    tmp = os.path.join(d, f".{frag}.{_uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(state, tmp, compression="zstd")
    os.replace(tmp, os.path.join(d, frag))
    old = list(m.fragments)
    m.fragments = [frag]
    m.row_count = state.num_rows
    m.epoch += 1
    m.lineage.append({"epoch": m.epoch, tag: True, "rows_applied": 0})
    write_manifest_atomic(lake_dir, m)
    for dead in old:
        try:
            os.remove(os.path.join(d, dead))
        except OSError:
            pass
    compact_partition(lake_dir, pid)
    return state.num_rows


def _fanout_rewrite(lake_dir: str, transform, tag: str,
                    key_cols: Tuple[str, ...]) -> dict:
    import ray

    pids = [pid for pid, _ in live_fragments(lake_dir)]
    if ray.is_initialized() and len(pids) > 1:
        fn = ray.remote(num_cpus=1)(_rewrite_one_partition)
        rows = sum(ray.get([fn.remote(lake_dir, pid, transform, tag,
                                      key_cols) for pid in pids]))
    else:
        rows = sum(_rewrite_one_partition(lake_dir, pid, transform, tag,
                                          key_cols) for pid in pids)
    return {"partitions": len(pids), "rows": int(rows)}


def backfill_column(lake_dir: str, name: str, fn,
                    key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")
                    ) -> dict:
    """Backfill a DERIVED column onto every live row — the lake-wide
    enrichment a schema evolution usually demands (e.g. a length or
    quality column added after ingestion started).  ``fn(table) ->
    pa.Array`` computes the column from the partition's merged state.

    Scale shape: one Ray task per partition (compact-style rewrite:
    tmp+rename atomic, manifest epoch bump) — the driver schedules only;
    a 1000-partition lake backfills in one task wave.  Rows applied by
    LATER CDC replays arrive without the column and conform to NULL on
    read — re-run the backfill (idempotent overwrite) to fill them.
    """
    def transform(t: pa.Table) -> pa.Table:
        col = fn(t)
        if name in t.column_names:
            return t.set_column(t.column_names.index(name), name, col)
        return t.append_column(name, col)

    return _fanout_rewrite(lake_dir, transform, "backfill", key_cols)


def enforce_retention(lake_dir: str, min_ts,
                      ts_col: str = "ts",
                      key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")
                      ) -> dict:
    """TTL/retention enforcement: drop every live row whose ``ts_col`` is
    older than ``min_ts`` — the GDPR/cost-control maintenance pass.  Same
    per-partition task-wave shape (and atomicity) as compaction.

    Watermarks are untouched: an already-applied old event stays filtered
    by the exactly-once replay guard, so re-runs never resurrect expired
    rows; a genuinely NEW change to an expired key re-inserts it (standard
    TTL semantics).
    """
    def transform(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t[ts_col], min_ts))

    return _fanout_rewrite(lake_dir, transform, "retention", key_cols)


def compact_partition(lake_dir: str, pid: int) -> None:
    """GC stray tmp/dead fragment files not referenced by the manifest."""
    from .state.manifest import read_manifest

    m = read_manifest(lake_dir, pid)
    d = partition_dir(lake_dir, pid)
    if not os.path.isdir(d):
        return
    live = set(m.fragments) | {"manifest.json"}
    for name in os.listdir(d):
        if name in live:
            continue
        if name.startswith((".", "fragment-")):
            try:
                os.remove(os.path.join(d, name))
            except OSError:
                pass


def lookup_key(lake_dir: str, key_value: str,
               key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")
               ) -> pa.Table:
    """Point lookup with PARTITION PRUNING: the current state of one
    conversation, reading only the partition chain that owns the key
    (or the ``salt`` salted chains for a registered hot key) instead of
    snapshotting the whole lake — the serving-side read a CDC lake
    exists for.  Routing mirrors stages/partition.Partitioner exactly
    (crc32 partition id; hot-key turn-salt fan-out), using the
    persisted lake config so lookups agree with how the run routed.
    """
    import zlib

    import pyarrow.compute as pc

    cfg = read_lake_config(lake_dir)
    if cfg is None:                       # no config: full-scan fallback
        t = snapshot_table(lake_dir, sort=True, key_cols=key_cols)
        return t.filter(pc.equal(t[key_cols[0]], key_value)) \
            if t.num_rows else t
    P = int(cfg["num_partitions"])
    h = zlib.crc32(key_value.encode())
    if key_value in set(cfg.get("hot_keys", [])):
        salt = max(1, int(cfg.get("salt", 8)))
        pids = sorted({(h + 1 + j) % P for j in range(salt)})
    else:
        pids = [h % P]
    frags = dict(live_fragments(lake_dir))
    tables = [_partition_state(frags[pid], key_cols,
                               key_equals=(key_cols[0], key_value))
              for pid in pids if pid in frags]
    t = _unify([x for x in tables if x.num_rows])
    if t.num_rows:
        t = t.filter(pc.equal(t[key_cols[0]], key_value))
        if "_lsn" in t.column_names:
            t = t.drop(["_lsn"])
        t = t.take(pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in key_cols]))
    return t


def refresh_mv(lake_dir: str, mv_dir: str,
               key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")) -> dict:
    """Incrementally refresh a derived table (materialized view) of
    per-conversation stats — (conv_id, n_turns, last_lsn) — from the lake.

    Refresh granularity is the PARTITION: a partition whose manifest
    epoch is unchanged since the previous refresh is skipped entirely and
    its MV part file reused, so a refresh after a small change window
    costs O(changed partitions), not O(lake).  This is the lake-side
    analogue of the reference's downstream consumers maintaining
    aggregates from the change feed (safe-transaction-consumer pattern),
    with exactly-once inherited from the manifest epochs.  Part files are
    written atomically (tmp + rename) and the MV manifest last, so a
    crashed refresh is re-runnable.
    """
    import ray

    os.makedirs(mv_dir, exist_ok=True)
    state_p = os.path.join(mv_dir, "mv_manifest.json")
    prev: dict = {}
    if os.path.exists(state_p):
        with open(state_p) as f:
            prev = json.load(f)
    total = 0
    work: List[Tuple[int, int, List[str]]] = []   # (pid, epoch, fragments)
    for pid, m in sorted(all_manifests(lake_dir).items()):
        if not m.fragments:
            continue
        total += 1
        part_file = os.path.join(mv_dir, f"mv-part-{pid:05d}.parquet")
        if prev.get(str(pid)) == m.epoch and os.path.exists(part_file):
            continue
        work.append((pid, m.epoch, list(m.fragments)))
    # stale partitions refresh as one Ray task each (independent part
    # files, tmp+rename atomic); the MV manifest is written LAST on the
    # driver so a crashed refresh re-runs the same stale set
    if ray.is_initialized() and len(work) > 1:
        fn = ray.remote(num_cpus=1)(_mv_refresh_one_partition)
        ray.get([fn.remote(lake_dir, mv_dir, pid, frs, key_cols)
                 for pid, _, frs in work])
    else:
        for pid, _, frs in work:
            _mv_refresh_one_partition(lake_dir, mv_dir, pid, frs, key_cols)
    for pid, epoch, _ in work:
        prev[str(pid)] = epoch
    tmp = state_p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prev, f)
    os.replace(tmp, state_p)
    return {"partitions": total, "refreshed": len(work)}


def _mv_refresh_one_partition(lake_dir: str, mv_dir: str, pid: int,
                              fragments: List[str],
                              key_cols: Tuple[str, ...]) -> None:
    """Recompute one partition's MV part file (atomic tmp+rename)."""
    d = partition_dir(lake_dir, pid)
    t = _partition_state([os.path.join(d, f) for f in fragments], key_cols)
    if t.num_rows:
        agg = t.group_by(key_cols[0]).aggregate(
            [(key_cols[1], "count"), ("_lsn", "max")])
        out = pa.table({
            key_cols[0]: agg[key_cols[0]],
            "n_turns": pc.cast(agg[f"{key_cols[1]}_count"], pa.int64()),
            "last_lsn": pc.cast(agg["_lsn_max"], pa.int64()),
        })
    else:
        out = pa.table({key_cols[0]: pa.array([], pa.string()),
                        "n_turns": pa.array([], pa.int64()),
                        "last_lsn": pa.array([], pa.int64())})
    part_file = os.path.join(mv_dir, f"mv-part-{pid:05d}.parquet")
    tmp = part_file + ".tmp"
    pq.write_table(out, tmp, compression="zstd")
    os.replace(tmp, part_file)


def read_mv(mv_dir: str) -> pa.Table:
    """Concatenate the MV part files (partitions are key-disjoint)."""
    parts = sorted(f for f in os.listdir(mv_dir)
                   if f.startswith("mv-part-") and f.endswith(".parquet"))
    tables = [pq.read_table(os.path.join(mv_dir, f)) for f in parts]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "n_turns": pa.array([], pa.int64()),
                         "last_lsn": pa.array([], pa.int64())})
    t = pa.concat_tables(tables)
    return t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending")]))


def tool_stats(lake_dir: str):
    """Tool-usage profile over the live lake state: per tool name, the
    number of tool turns, the number of DISTINCT conversations that used
    the tool, and the exact integer sum of turn indexes (position mass —
    mean call position is sum_turn_idx/n_calls, computed by the consumer
    so no float leaves the distributed part).

    Output: (tool, n_calls, n_convs, sum_turn_idx), one row per tool.

    Scale shape: conversations are partition-local (the lake routing
    invariant), so per-partition DISTINCT-conversation counts sum to the
    exact global count; each partition emits one partial row per tool
    (|tools| x |partitions| rows in total) and ONE tiny groupby adds the
    partials — text never read, keys never shuffled.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def partials(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["tool"])
            t = t.filter(pc.is_valid(t["tool"]))
            if not t.num_rows:
                continue
            df = pd.DataFrame({
                "tool": t["tool"].combine_chunks().to_numpy(
                    zero_copy_only=False),
                "conv": t["conv_id"].combine_chunks().to_numpy(
                    zero_copy_only=False),
                "ti": pc.cast(t["turn_idx"], pa.int64()).combine_chunks()
                .to_numpy(zero_copy_only=False)})
            g = df.groupby("tool", sort=False).agg(
                n_calls=("conv", "size"), n_convs=("conv", "nunique"),
                sum_turn_idx=("ti", "sum")).reset_index()
            yield pa.table({
                "tool": pa.array(g["tool"], pa.string()),
                "n_calls": pa.array(g["n_calls"].to_numpy(np.int64)),
                "n_convs": pa.array(g["n_convs"].to_numpy(np.int64)),
                "sum_turn_idx": pa.array(
                    g["sum_turn_idx"].to_numpy(np.int64))})

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "tool": [g["tool"].iloc[0]],
            "n_calls": np.array([g["n_calls"].sum()], np.int64),
            "n_convs": np.array([g["n_convs"].sum()], np.int64),
            "sum_turn_idx": np.array([g["sum_turn_idx"].sum()], np.int64)})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(partials, batch_size=1, batch_format="pyarrow") \
        .groupby("tool").map_groups(merge, batch_format="pandas",
                                    num_cpus=1)


def context_windows(lake_dir: str, k: int = 4, role: str = "assistant"):
    """Training-example extraction geometry over the live lake: for every
    turn with the given ``role``, how much context its up-to-``k``
    immediately preceding turns (same conversation, turn order) supply —
    the row a context-length-aware example packer consumes before cutting
    (conv, turn) windows into training sequences.

    Output: (conv_id, turn_idx, ctx_turns, ctx_chars) — exact counts,
    ``ctx_chars`` in characters (codepoints) over the preceding window.

    Scale shape: conversations are partition-local, so the whole pass is
    per-partition with ZERO shuffle; per partition it is one Arrow sort +
    numpy prefix-sum window arithmetic (no per-row Python, no pandas).
    """
    import numpy as np
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def windows(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["role", "text"])
            if not t.num_rows:
                continue
            t = t.take(pc.sort_indices(t, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
            cv = t["conv_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            rl = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
            lens = pc.fill_null(pc.cast(pc.utf8_length(
                t["text"].combine_chunks()), pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
            n = len(cv)
            idx = np.arange(n, dtype=np.int64)
            # first row index of each row's conversation (sorted order)
            bound = np.concatenate(
                [[0], np.flatnonzero(cv[1:] != cv[:-1]) + 1])
            conv_start = bound[np.searchsorted(bound, idx, side="right")
                               - 1]
            start = np.maximum(conv_start, idx - k)
            prefix = np.concatenate([[0], np.cumsum(lens)])
            sel = rl == role
            if not sel.any():
                continue
            yield pa.table({
                "conv_id": pa.array(cv[sel], pa.string()),
                "turn_idx": pc.cast(
                    t["turn_idx"].combine_chunks(), pa.int32())
                .filter(pa.array(sel)),
                "ctx_turns": pa.array((idx - start)[sel]),
                "ctx_chars": pa.array(
                    (prefix[idx] - prefix[start])[sel])})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(windows, batch_size=1, batch_format="pyarrow")


def purge_keys(lake_dir: str, keys,
               key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")
               ) -> dict:
    """GDPR / right-to-be-forgotten erasure: remove every live row whose
    partition key is in ``keys`` from the lake — targeted key purge with
    manifests intact (epoch bump, atomic tmp+rename, dead-fragment GC),
    so later replays stay exactly-once and resumable and the purged keys
    do NOT resurrect from pre-purge WAL on restart (the replay guard
    filters already-applied LSNs).

    A genuinely NEW change to a purged key re-inserts it — the erasure is
    point-in-time, which is the regulation's semantics (new consent, new
    data).

    Scale shape: one Ray task per partition (driver schedules only); the
    key set ships once per task — an erasure request list is thousands of
    keys, not millions; for larger sets ship a bloom filter + exact
    in-bucket verify, as bloom_semi_join does.
    """
    key_arr = pa.array(sorted(set(keys)), pa.string())

    def transform(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(
            pc.is_in(t[key_cols[0]], value_set=key_arr)))

    return _fanout_rewrite(lake_dir, transform, "purge", key_cols)


def update_diffs(lake_dir: str, col: str = "text",
                 key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")):
    """Before/after UPDATE diff stream from the SCD2 history lake — the
    Debezium-style before-image feed, reconstructed from version intervals
    instead of retained at decode time: for every version that REPLACES a
    prior version of the same key (predecessor's ``valid_to`` equals its
    ``valid_from`` — a contiguous transition, i.e. an UPDATE; a gap means
    delete+reinsert and is excluded), emit the key, the change LSN and the
    (old, new) values of ``col``.

    Output: (*key_cols, lsn, old_<col>, new_<col>).

    Scale shape: keys are partition-local, so the whole feed is a
    per-partition map with ZERO shuffle — interval reconstruction is the
    existing vectorized pass, the adjacency diff is one numpy shift.
    """
    import numpy as np
    import ray.data as rd

    from .stages.history import version_intervals

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def diffs(batch: pa.Table):
        for row in batch.to_pylist():
            raw = _unify([pq.read_table(p) for p in row["paths"]])
            if not raw.num_rows:
                continue
            t = version_intervals(raw, key_cols=key_cols)
            n = t.num_rows
            if n < 2:
                continue
            # sorted by (key, valid_from) — adjacency is the predecessor
            same = np.ones(n, dtype=bool)
            same[0] = False
            for kc in key_cols:
                kv = t[kc].combine_chunks().to_numpy(zero_copy_only=False)
                same[1:] &= kv[1:] == kv[:-1]
            vf = t["valid_from"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            vt = pc.fill_null(t["valid_to"].combine_chunks(), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            contig = same.copy()
            contig[1:] &= vt[:-1] == vf[1:]
            if not contig.any():
                continue
            sel = pa.array(contig)
            vals = t[col].combine_chunks()
            prev = vals.take(pa.array(
                np.maximum(np.arange(n) - 1, 0)))
            yield pa.table({
                **{kc: t[kc].filter(sel) for kc in key_cols},
                "lsn": pa.array(vf[contig]),
                f"old_{col}": prev.filter(sel),
                f"new_{col}": vals.filter(sel)})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(diffs, batch_size=1, batch_format="pyarrow")


def lake_stats(lake_dir: str,
               key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")):
    """ANALYZE over the live lake state: per payload column, exact
    (n_rows, n_null, min, max) — the catalog statistics a query planner
    prunes with, and the freshness/completeness signal an operator
    dashboard tracks.  min/max are reported as strings (canonical text
    form) so one schema covers every column type.

    Output: (col_name, n_rows, n_null, min_str, max_str).

    Scale shape: one partial row per (column x partition), tiny groupby
    merge; per-partition min/max/null counts are Arrow kernels over the
    merged state — no row ever leaves its partition.
    """
    import numpy as np
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def partials(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], key_cols)
            if not t.num_rows:
                continue
            names, kinds, nn, nv, mins, maxs = [], [], [], [], [], []
            for c in t.column_names:
                if c.startswith("_"):
                    continue
                col = t[c]
                names.append(c)
                kinds.append(_stat_kind(col.type))
                nn.append(t.num_rows)
                nv.append(col.null_count)
                valid = col.drop_null()
                if len(valid) == 0:
                    mins.append(None)
                    maxs.append(None)
                else:
                    mm = pc.min_max(valid)
                    mins.append(_stat_str(mm["min"]))
                    maxs.append(_stat_str(mm["max"]))
            yield pa.table({
                "col_name": pa.array(names, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "n_rows": pa.array(np.asarray(nn, np.int64)),
                "n_null": pa.array(np.asarray(nv, np.int64)),
                "min_str": pa.array(mins, pa.string()),
                "max_str": pa.array(maxs, pa.string())})

    def merge(g):
        import pandas as pd

        # type-aware extreme merge: per-partition int extremes must merge
        # numerically ("10" < "2" lexicographically — wrong for ints)
        kind = g["kind"].iloc[0]
        key = (lambda s: int(s)) if kind == "int" else \
              (lambda s: float(s)) if kind == "float" else (lambda s: s)
        mn = [key(s) for s in g["min_str"].dropna()]
        mx = [key(s) for s in g["max_str"].dropna()]
        return pd.DataFrame({
            "col_name": [g["col_name"].iloc[0]],
            "n_rows": np.array([g["n_rows"].sum()], np.int64),
            "n_null": np.array([g["n_null"].sum()], np.int64),
            "min_str": [str(min(mn)) if mn else None],
            "max_str": [str(max(mx)) if mx else None]})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(partials, batch_size=1, batch_format="pyarrow") \
        .groupby("col_name").map_groups(merge, batch_format="pandas",
                                      num_cpus=1)


def _stat_str(scalar: pa.Scalar) -> str:
    """Canonical text form for min/max stats: integers bare, timestamps
    ISO with microseconds, strings as-is."""
    v = scalar.as_py()
    if v is None:
        return None
    import datetime

    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def _stat_kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    return "str"   # strings, timestamps (ISO text is order-faithful)


def turn_dedup(lake_dir: str, hash_mode: str = "md5",
               mask_digits: bool = True):
    """TURN-level template dedup across the whole lake: a turn is a
    duplicate iff its DIGIT-MASKED text (every digit run of length >= 2 -> '#'; the
    standard boilerplate-template fingerprint — ids/counters/timestamps
    vary, the script does not) also appears at a lower-ordered turn
    anywhere in the corpus (order = (conversation uid, turn_idx) — the
    keeper is the first occurrence).  This is the scripted-boilerplate
    detector for transcripts: greeting/ack/system turns repeat modulo
    identifiers across conversations and a curator down-weights or masks
    them.  ``mask_digits=False`` degrades to verbatim-text dedup.

    Output: (conv_id, turn_idx, is_dup), one row per live turn.

    Scale shape: per-partition extraction ships (hash, order_key) int
    pairs ONLY (text never leaves its partition); ONE coarse groupby by
    hash%NPART computes first-occurrence per text group.  Requires
    numeric conversation ids ('c<uid>') and turn_idx < 2^20 — the
    synthesized transcript shape; generalize the order key for other id
    schemes.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from .functions.hashing import content_hash60
    from .functions.scale import coarse_npart

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])
    npart = coarse_npart()

    def extract(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["text"])
            if not t.num_rows:
                continue
            txt = t["text"]
            if mask_digits:
                txt = pc.replace_substring_regex(txt, r"[0-9]{2,}", "#")
            h = content_hash60(txt, hash_mode)
            uid = pc.cast(pc.utf8_slice_codeunits(
                t["conv_id"].combine_chunks(), 1, 2**30), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            turn = pc.cast(t["turn_idx"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            yield pa.table({
                "part": pa.array(h % npart),
                "h": pa.array(h),
                "okey": pa.array(uid * (1 << 20) + turn)})

    def first_occurrence(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("h")["okey"].transform("min")
        okey = g["okey"].to_numpy(np.int64)
        return pd.DataFrame({
            "conv_id": np.char.add(
                "c", (okey >> 20).astype(str)).astype(object),
            "turn_idx": (okey & ((1 << 20) - 1)).astype(np.int32),
            "is_dup": okey > m.to_numpy(np.int64)})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(extract, batch_size=1, batch_format="pyarrow") \
        .groupby("part").map_groups(first_occurrence,
                                    batch_format="pandas", num_cpus=1)


def conv_episodes(lake_dir: str, gap_us: int = 3_600_000_000):
    """Episode segmentation of long-running transcripts: split each
    conversation into EPISODES at timestamp gaps larger than ``gap_us``
    (turn order authoritative, timestamps evidence) — the session
    boundary a context-window packer or a per-episode summarizer needs
    for agent transcripts that span days.

    Output: (conv_id, episode, n_turns, start_us, end_us) — episode is
    0-based per conversation in turn order; timestamps exact int64 us.

    Scale shape: conversations are partition-local, so the whole pass is
    per-partition with ZERO shuffle; per partition it is one Arrow sort +
    a numpy boundary cumsum + reduceat.
    """
    import numpy as np
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def episodes(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_state(row["paths"], ("conv_id", "turn_idx"),
                                 columns=["ts"])
            if not t.num_rows:
                continue
            t = t.take(pc.sort_indices(t, sort_keys=[
                ("conv_id", "ascending"), ("turn_idx", "ascending")]))
            cv = t["conv_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            ts = pc.cast(t["ts"].combine_chunks(), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            n = len(cv)
            new_conv = np.concatenate([[True], cv[1:] != cv[:-1]])
            brk = new_conv.copy()
            brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
            seg_id = np.cumsum(brk) - 1            # global segment index
            starts = np.flatnonzero(brk)
            # episode ordinal within its conversation: segment index
            # minus the conversation's first segment index
            conv_first_seg = np.cumsum(new_conv) - 1
            first_seg_of_conv = seg_id[np.flatnonzero(new_conv)]
            episode = seg_id - first_seg_of_conv[conv_first_seg]
            cnt = np.diff(np.append(starts, n))
            yield pa.table({
                "conv_id": pa.array(cv[starts], pa.string()),
                "episode": pa.array(episode[starts]),
                "n_turns": pa.array(cnt.astype(np.int64)),
                "start_us": pa.array(ts[starts]),
                "end_us": pa.array(
                    ts[np.append(starts[1:], n) - 1])})

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(episodes, batch_size=1, batch_format="pyarrow")


def key_churn(lake_dir: str,
              key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")):
    """Update-churn profile over the SCD2 history lake: per conversation,
    how many keys it has, how many VERSIONS its keys accumulated, and the
    hottest key's version count — the write-amplification signal that
    decides compaction cadence and flags edit-war keys (a turn rewritten
    50 times is a different beast than 50 turns written once).

    Output: (conv_id, n_keys, n_versions, max_key_versions).

    Scale shape: conversations are partition-local — ZERO shuffle; per
    partition one interval reconstruction (already vectorized) + one
    sort + two reduceat passes.
    """
    import numpy as np
    import ray.data as rd

    from .stages.history import version_intervals

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def churn(batch: pa.Table):
        for row in batch.to_pylist():
            raw = _unify([pq.read_table(p) for p in row["paths"]])
            if not raw.num_rows:
                continue
            t = version_intervals(raw, key_cols=key_cols)
            n = t.num_rows
            if not n:
                continue
            # sorted by (key, valid_from): key and conv boundaries
            cv = t[key_cols[0]].combine_chunks().to_numpy(
                zero_copy_only=False)
            ti = pc.cast(t[key_cols[1]], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            new_key = np.concatenate(
                [[True], (cv[1:] != cv[:-1]) | (ti[1:] != ti[:-1])])
            new_conv = np.concatenate([[True], cv[1:] != cv[:-1]])
            kstart = np.flatnonzero(new_key)
            kcount = np.diff(np.append(kstart, n))      # versions per key
            # conv boundaries in KEY space
            key_conv_new = new_conv[kstart]
            cstart = np.flatnonzero(key_conv_new)
            ck = np.diff(np.append(cstart, len(kstart)))  # keys per conv
            yield pa.table({
                "conv_id": pa.array(cv[kstart[cstart]], pa.string()),
                "n_keys": pa.array(ck.astype(np.int64)),
                "n_versions": pa.array(
                    np.add.reduceat(kcount, cstart).astype(np.int64)),
                "max_key_versions": pa.array(
                    np.maximum.reduceat(kcount, cstart).astype(np.int64)),
            })

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(churn, batch_size=1, batch_format="pyarrow")


def _partition_prompt_pairs(paths: List[str]) -> pa.Table:
    """One partition's adjacent user->assistant training pairs over the
    merged, key-sorted live state — vectorized shift compare, no per-row
    Python."""
    import numpy as np
    import pyarrow.compute as _pc

    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "prompt_turn": pa.array([], pa.int32()),
                      "prompt": pa.array([], pa.string()),
                      "response": pa.array([], pa.string())})
    t = _partition_state(paths, ("conv_id", "turn_idx"),
                         columns=["role", "text"])
    if not t.num_rows:
        return empty
    t = t.take(_pc.sort_indices(t, sort_keys=[
        ("conv_id", "ascending"), ("turn_idx", "ascending")]))
    cv = t["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
    turn = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
    if len(cv) < 2:
        return empty
    same_conv = cv[:-1] == cv[1:]
    adjacent = turn[1:] == turn[:-1] + 1          # no missing turn between
    is_pair = same_conv & adjacent & (role[:-1] == "user") \
        & (role[1:] == "assistant")
    p = np.flatnonzero(is_pair)
    if not len(p):
        return empty
    text = t["text"].combine_chunks()
    return pa.table({
        "conv_id": pa.array(cv[p], pa.string()),
        "prompt_turn": pa.array(turn[p].astype(np.int32)),
        "prompt": text.take(pa.array(p)),
        "response": text.take(pa.array(p + 1))})


def extract_prompt_pairs(lake_dir: str):
    """RLHF-style training-pair extraction: every adjacent
    (user turn i, assistant turn i+1) pair in the live transcript state —
    the prompt/response rows a preference or SFT pipeline starts from.

    Output: (conv_id, prompt_turn, prompt, response) as a streaming
    Dataset.

    Scale shape: conversations are partition-local (the lake routing
    invariant), so pair extraction is a per-partition map with ZERO
    shuffle; the adjacency test is one vectorized shift-compare over the
    key-sorted state.
    """
    import ray.data as rd

    parts = live_fragments(lake_dir)
    if not parts:
        return rd.from_items([])

    def pairs(batch: pa.Table):
        for row in batch.to_pylist():
            t = _partition_prompt_pairs(row["paths"])
            if t.num_rows:
                yield t

    ds = rd.from_items([{"paths": paths} for _, paths in parts],
                       override_num_blocks=len(parts))
    return ds.map_batches(pairs, batch_size=1, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Secondary index (inverted index on a non-key column, epoch-incremental)
# ---------------------------------------------------------------------------

def _index_refresh_one_partition(lake_dir: str, idx_dir: str, pid: int,
                                 fragments: List[str],
                                 column: str) -> None:
    """Recompute one partition's index part (atomic tmp+rename): the
    partition's live ``column`` values with their primary keys, SORTED by
    the indexed column so parquet row-group min/max stats make the value
    lookup a pushdown skip."""
    d = partition_dir(lake_dir, pid)
    t = _partition_state([os.path.join(d, f) for f in fragments],
                         ("conv_id", "turn_idx"),
                         columns=[column])
    if t.num_rows:
        t = t.filter(pc.is_valid(t[column]))
    if t.num_rows:
        out = pa.table({
            column: t[column],
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32())})
        out = out.take(pc.sort_indices(out, sort_keys=[
            (column, "ascending"), ("conv_id", "ascending"),
            ("turn_idx", "ascending")]))
    else:
        out = pa.table({column: pa.array([], pa.string()),
                        "conv_id": pa.array([], pa.string()),
                        "turn_idx": pa.array([], pa.int32())})
    part_file = os.path.join(idx_dir, f"idx-part-{pid:05d}.parquet")
    tmp = part_file + ".tmp"
    pq.write_table(out, tmp, compression="zstd",
                   row_group_size=4096)
    os.replace(tmp, part_file)


def refresh_index(lake_dir: str, idx_dir: str,
                  column: str = "tool") -> dict:
    """Incrementally maintain a SECONDARY INDEX on a non-key column —
    the lookup structure for "find every turn that used tool X" without
    scanning the lake.  Same epoch contract as refresh_mv: partitions
    whose manifest epoch is unchanged are skipped entirely, so an index
    refresh after a small change window costs O(changed partitions);
    part files are atomic (tmp+rename), the index manifest is written
    last, and a crashed refresh re-runs the same stale set."""
    import ray

    os.makedirs(idx_dir, exist_ok=True)
    state_p = os.path.join(idx_dir, "idx_manifest.json")
    prev: dict = {}
    if os.path.exists(state_p):
        with open(state_p) as f:
            prev = json.load(f)
    total = 0
    work: List[Tuple[int, int, List[str]]] = []
    for pid, m in sorted(all_manifests(lake_dir).items()):
        if not m.fragments:
            continue
        total += 1
        part_file = os.path.join(idx_dir, f"idx-part-{pid:05d}.parquet")
        if prev.get(str(pid)) == m.epoch and os.path.exists(part_file):
            continue
        work.append((pid, m.epoch, list(m.fragments)))
    if ray.is_initialized() and len(work) > 1:
        fn = ray.remote(num_cpus=1)(_index_refresh_one_partition)
        ray.get([fn.remote(lake_dir, idx_dir, pid, frs, column)
                 for pid, _, frs in work])
    else:
        for pid, _, frs in work:
            _index_refresh_one_partition(lake_dir, idx_dir, pid, frs,
                                         column)
    for pid, epoch, _ in work:
        prev[str(pid)] = epoch
    tmp = state_p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prev, f)
    os.replace(tmp, state_p)
    return {"partitions": total, "refreshed": len(work)}


def index_lookup(idx_dir: str, column: str, value) -> pa.Table:
    """Point lookup through the secondary index: parquet dictionary/
    row-group stats prune non-matching groups (the index is sorted by
    the indexed column), so the read touches only the value's groups.
    Output: (conv_id, turn_idx, <column>)."""
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(idx_dir, "idx-part-*.parquet")))
    hits = []
    for p in parts:
        t = pq.read_table(p, filters=[(column, "==", value)])
        if t.num_rows:
            hits.append(pa.table({
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                column: t[column]}))
    if not hits:
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "turn_idx": pa.array([], pa.int32()),
                         column: pa.array([], pa.string())})
    return pa.concat_tables(hits)


# ---------------------------------------------------------------------------
# History-lake version retention (keep newest K changes per key)
# ---------------------------------------------------------------------------

def _prune_versions_one_partition(lake_dir: str, pid: int, keep: int,
                                  key_cols: Tuple[str, ...]) -> int:
    """Rewrite one history partition keeping only each key's ``keep``
    newest change rows (atomic tmp+rename + manifest epoch bump, the
    compaction contract).  Returns rows dropped."""
    import uuid as _uuid

    import numpy as np

    from .state.manifest import read_manifest, write_manifest_atomic

    m = read_manifest(lake_dir, pid)
    if not m.fragments:
        return 0
    d = partition_dir(lake_dir, pid)
    raw = _unify([pq.read_table(os.path.join(d, f))
                  for f in m.fragments])
    if not raw.num_rows:
        return 0
    import pandas as pd

    keys = pd.MultiIndex.from_arrays(
        [raw[c].to_numpy(zero_copy_only=False) for c in key_cols])
    codes, _ = pd.factorize(keys, sort=False)
    lsn = raw["lsn"].to_numpy(zero_copy_only=False)
    order = np.lexsort((-lsn, codes))            # per key, newest first
    rank = np.empty(len(codes), np.int64)
    seq = np.arange(len(codes))
    starts = np.concatenate([[0], np.flatnonzero(
        np.diff(codes[order]) != 0) + 1])
    rank[order] = seq - np.repeat(starts, np.diff(
        np.concatenate([starts, [len(codes)]])))
    kept = raw.filter(pa.array(rank < keep))
    dropped = raw.num_rows - kept.num_rows
    if dropped == 0:
        return 0
    frag = f"fragment-{m.epoch + 1:06d}-vprune.parquet"
    tmp = os.path.join(d, f".{frag}.{_uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(kept, tmp, compression="zstd")
    os.replace(tmp, os.path.join(d, frag))
    old = list(m.fragments)
    m.fragments = [frag]
    m.row_count = kept.num_rows
    m.epoch += 1
    m.lineage.append({"epoch": m.epoch, "version_pruned": True,
                      "rows_applied": 0})
    write_manifest_atomic(lake_dir, m)
    for dead in old:
        try:
            os.remove(os.path.join(d, dead))
        except OSError:
            pass
    return dropped


def prune_history_versions(lake_dir: str, keep: int = 2,
                           key_cols: Tuple[str, ...] = ("conv_id",
                                                        "turn_idx")
                           ) -> dict:
    """VERSION RETENTION on an SCD2 history lake: keep each key's
    ``keep`` newest change rows and drop the older tail — the
    storage-cost / compliance knob of every versioned lakehouse
    (Delta/Iceberg VACUUM of old versions).  Interval semantics are
    recomputed from the survivors on read, so the pruned history equals
    the full history window-filtered to the newest ``keep`` changes per
    key.  One Ray task per partition (private manifest + fragments,
    atomic rewrite); re-runnable; replay-safe (a resumed run re-applies
    only at-or-after the watermark, which prunes never move)."""
    import ray

    pids = [pid for pid, _ in live_fragments(lake_dir)]
    if ray.is_initialized() and len(pids) > 1:
        fn = ray.remote(num_cpus=1)(_prune_versions_one_partition)
        dropped = sum(ray.get([fn.remote(lake_dir, pid, keep, key_cols)
                               for pid in pids]))
    else:
        dropped = sum(_prune_versions_one_partition(lake_dir, pid, keep,
                                                    key_cols)
                      for pid in pids)
    return {"partitions": len(pids), "rows_dropped": dropped}


def clone_lake(src_dir: str, dst_dir: str) -> dict:
    """ZERO-COPY shallow clone: copy config + manifests, HARDLINK the
    fragment files — the Delta/Iceberg SHALLOW CLONE that forks a lake
    for experiments without duplicating data.  Fragments are immutable
    by contract (compaction and pruning write NEW files and unlink the
    old names, which only drops this directory's link), so divergent
    writes in either lake never touch the other's bytes; manifests carry
    the per-source watermarks, so a ``run_cdc`` against the clone
    RESUMES exactly where the source stood (exactly-once inherited).

    Dev/test fallback: os.link EXDEV (cross-device) degrades to copy.
    Metadata-only (no row data moves); at very large partition counts
    the per-partition link loop fans out as one task per partition the
    same way compact_lake does — the loop below is the driver-side
    fallback shape."""
    import shutil as _sh

    cfg = read_lake_config(src_dir)
    if cfg is None:
        raise FileNotFoundError(f"no lake config at {src_dir}")
    if os.path.exists(dst_dir) and os.listdir(dst_dir):
        raise FileExistsError(f"{dst_dir} is not empty")
    os.makedirs(dst_dir, exist_ok=True)
    _sh.copy2(os.path.join(src_dir, "config.json"),
              os.path.join(dst_dir, "config.json"))
    n_linked = 0
    for pid, m in sorted(all_manifests(src_dir).items()):
        sd = partition_dir(src_dir, pid)
        dd = partition_dir(dst_dir, pid)
        os.makedirs(dd, exist_ok=True)
        for f in m.fragments:
            try:
                os.link(os.path.join(sd, f), os.path.join(dd, f))
            except OSError:
                _sh.copy2(os.path.join(sd, f), os.path.join(dd, f))
            n_linked += 1
        _sh.copy2(os.path.join(sd, "manifest.json"),
                  os.path.join(dd, "manifest.json"))
    return {"partitions": len(all_manifests(src_dir)),
            "fragments_linked": n_linked}


def export_snapshot_jsonl(lake_dir: str, out_dir: str) -> dict:
    """Wire-format SINK: export the live LWW state as per-partition
    JSONL shards (the complement of the JSONL source) — one Ray task
    per partition, atomic tmp+rename per file plus a final _DONE marker.
    Resume follows refresh_index's EPOCH contract: a per-partition
    export manifest records the lake manifest epoch and row count of
    each finished shard, so a re-run (a) skips a shard only while its
    source partition is unchanged, (b) RE-EXPORTS shards written from an
    older lake state instead of silently keeping them, and (c) reports
    the true total row count (skipped shards contribute their recorded
    counts, not 0).  ``ts`` serializes as epoch micros (lossless int);
    the reader restores the timestamp type."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, "_DONE")
    state_p = os.path.join(out_dir, "export_manifest.json")
    prev: dict = {}
    if os.path.exists(state_p):
        with open(state_p) as f:
            prev = json.load(f)

    n_parts, rows = 0, 0
    work: List[Tuple[int, int, List[str]]] = []
    for pid, m in sorted(all_manifests(lake_dir).items()):
        if not m.fragments:
            continue
        n_parts += 1
        d = partition_dir(lake_dir, pid)
        rec = prev.get(str(pid))
        if rec and rec["epoch"] == m.epoch and os.path.exists(
                os.path.join(out_dir, f"part-{pid:05d}.jsonl")):
            rows += int(rec["rows"])        # finished AND current shard
            continue
        work.append((pid, m.epoch,
                     [os.path.join(d, f) for f in m.fragments]))

    def one(pid: int, paths: List[str]) -> int:
        p = os.path.join(out_dir, f"part-{pid:05d}.jsonl")
        t = _partition_state(paths, ("conv_id", "turn_idx"))
        if "_lsn" in t.column_names:
            t = t.drop(["_lsn"])
        if "ts" in t.column_names:
            t = t.set_column(t.schema.get_field_index("ts"), "ts",
                             pc.cast(t["ts"], pa.int64()))
        df = t.to_pandas()
        tmp = p + ".tmp"
        df.to_json(tmp, orient="records", lines=True,
                   force_ascii=False)
        os.replace(tmp, p)
        return t.num_rows

    if ray.is_initialized() and len(work) > 1:
        fn = ray.remote(num_cpus=1)(one)
        counts = ray.get([fn.remote(pid, paths)
                          for pid, _, paths in work])
    else:
        counts = [one(pid, paths) for pid, _, paths in work]
    for (pid, epoch, _), n in zip(work, counts):
        prev[str(pid)] = {"epoch": epoch, "rows": int(n)}
        rows += int(n)
    tmp = state_p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prev, f)
    os.replace(tmp, state_p)
    with open(done, "w") as f:
        f.write("ok")
    return {"partitions": n_parts, "rows": rows,
            "exported": len(work)}
