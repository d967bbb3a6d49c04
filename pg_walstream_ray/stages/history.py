"""SCD type-2 history sink: append-only version fragments + interval read.

The LWW sink (stages/apply.py) keeps only each key's last writer — the
reference's safe-transaction-consumer contract.  The history sink is the
other classic CDC consumer shape (a type-2 slowly-changing-dimension
table): EVERY change to a ``(conv_id, turn_idx)`` key is retained as a
version row, and the read side reconstructs validity intervals

    valid_from = the change's lsn
    valid_to   = the next change's lsn for the same key (NULL if none)
    is_current = valid_to IS NULL

Deletes close the current version without opening a new one; a truncate at
LSN T closes every version still open at T (and versions fully before T are
untouched).  TOAST 'u' columns resolve to the most recent prior setter per
key, the same carry rule as lww_resolve.

Scale shape: the write side is a pure APPEND per partition window (no
merge-on-write at all — cheaper than the LWW sink), with the same
exactly-once per-source commit_lsn filter and atomic manifest publish.
The interval reconstruction is a per-partition vectorized scan at read
time (one sort + numpy shifts) — ``(conv_id, turn_idx)`` keys are
partition-local even under hot-key salting (stages/partition.py routes
salted keys by ``turn_idx % salt``), so no cross-partition state exists.
Fragment chains compact to a single sorted base at COMPACT_AT, a pure
physical concat+sort rewrite.
"""

from __future__ import annotations

import os
import uuid
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.manifest import (
    partition_dir,
    read_manifest,
    record_window,
    write_manifest_atomic,
)
from .apply import (
    COMPACT_AT,
    KEY_COLS,
    _group_boundaries,
    _sort_key_indices,
    payload_columns,
)

_INF = np.iinfo(np.int64).max


def history_apply_partition_window(group: pa.Table, lake_dir: str,
                                   key_cols: Sequence[str] = KEY_COLS) -> dict:
    """Append one partition's change window as a history fragment.

    Idempotent: the per-source commit_lsn filter drops already-applied
    windows before anything is written, and the manifest is published
    atomically AFTER the fragment (a crash in between leaves an orphan
    file no manifest points at).
    """
    pid = int(group["partition_id"][0].as_py())
    m = read_manifest(lake_dir, pid)

    src = group["source"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(src):
        max_src = int(src.max())
        thr = np.full(max_src + 1, -1, dtype=np.int64)
        for k, v in m.applied_lsns.items():
            ki = int(k)
            if ki <= max_src:
                thr[ki] = v
        commit = group["commit_lsn"].to_numpy(zero_copy_only=False)
        window = group.filter(pa.array(commit > thr[src]))
    else:
        window = group
    if window.num_rows == 0:
        return {"partition_id": pid, "applied_lsn": max(
            m.applied_lsns.values(), default=-1),
            "rows_applied": 0, "row_count": m.row_count,
            "applied_json": "{}", "skipped": True}

    payload = payload_columns(window.schema)
    unch_cols = [f"_unchanged_{c}" for c in payload
                 if f"_unchanged_{c}" in window.column_names]
    keep = ["lsn", "op", *payload, *unch_cols]
    vers = window.select(keep)
    # key-major, lsn-minor order: truncate rows carry null keys and sort to
    # the front of the partition; the read side splits them back out
    vers = vers.take(_sort_key_indices(vers, [*key_cols, "lsn"]))

    pdir = partition_dir(lake_dir, pid)
    os.makedirs(pdir, exist_ok=True)
    wsrc = window["source"].to_numpy(zero_copy_only=False).astype(np.int64)
    wcommit = window["commit_lsn"].to_numpy(zero_copy_only=False)
    per_source: dict = {}
    for s in np.unique(wsrc):
        per_source[int(s)] = int(wcommit[wsrc == s].max())
    max_commit = max(per_source.values())

    compact = len(m.fragments) + 1 >= COMPACT_AT
    frag_name = f"history-{m.epoch + 1:06d}-{max_commit}.parquet"
    if compact and m.fragments:
        olds = [pq.read_table(os.path.join(pdir, f)) for f in m.fragments]
        vers = pa.concat_tables([*olds, vers], promote_options="default")
        vers = vers.take(_sort_key_indices(vers, [*key_cols, "lsn"]))
        new_frags = [frag_name]
    else:
        new_frags = [*m.fragments, frag_name]
    tmp = os.path.join(pdir, f".{frag_name}.{uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(vers, tmp, compression="zstd")
    os.replace(tmp, os.path.join(pdir, frag_name))

    applied_events = (
        int(pc.sum(pc.fill_null(window["_weight"], 1)).as_py() or 0)
        if "_weight" in window.column_names else window.num_rows)
    row_count = (vers.num_rows if compact
                 else m.row_count + vers.num_rows)
    old_frags = list(m.fragments)
    record_window(m, per_source_max_commit=per_source,
                  window_min_lsn=pc.min(window["lsn"]).as_py(),
                  rows_applied=applied_events, fragments=new_frags,
                  row_count=row_count, compacted=compact)
    write_manifest_atomic(lake_dir, m)
    for dead in set(old_frags) - set(new_frags):
        try:
            os.remove(os.path.join(pdir, dead))
        except OSError:
            pass
    import json as _json

    return {"partition_id": pid,
            "applied_lsn": max(m.applied_lsns.values(), default=-1),
            "rows_applied": applied_events, "row_count": row_count,
            "applied_json": _json.dumps(per_source),
            "skipped": False}


class HistoryApplyGroup:
    """``groupby('partition_id').map_groups`` callable for the history sink.

    Must be fed the UNCOMBINED change stream (run_cdc passes
    precompact=False for sink='history' — the map-side LWW combiner would
    collapse the very versions this sink exists to retain).
    """

    def __init__(self, lake_dir: str, key_cols: Sequence[str] = KEY_COLS):
        self.lake_dir = lake_dir
        self.key_cols = tuple(key_cols)

    def __call__(self, group: pa.Table) -> pa.Table:
        summary = history_apply_partition_window(group, self.lake_dir,
                                                 key_cols=self.key_cols)
        return pa.table({k: [v] for k, v in summary.items()})


def version_intervals(vers: pa.Table,
                      key_cols: Sequence[str] = KEY_COLS,
                      payload: Optional[List[str]] = None) -> pa.Table:
    """Vectorized SCD2 interval reconstruction over one partition's raw
    version rows (columns: lsn, op, payload, ``_unchanged_*``; any
    fragment-chain concat order).

    Returns payload + (valid_from:int64, valid_to:int64 nullable,
    is_current:bool), delete/truncate rows consumed, TOAST columns
    carried, sorted by (key, valid_from).
    """
    if vers.num_rows == 0:
        cols = {c: vers[c] for c in (payload or payload_columns(vers.schema))}
        cols["valid_from"] = pa.array([], pa.int64())
        cols["valid_to"] = pa.array([], pa.int64())
        cols["is_current"] = pa.array([], pa.bool_())
        return pa.table(cols)
    if payload is None:
        payload = payload_columns(vers.schema)

    is_trunc = pc.equal(vers["op"], "truncate")
    trunc_lsns = np.array([], dtype=np.int64)
    if pc.any(is_trunc).as_py():
        trunc_lsns = np.unique(
            vers.filter(is_trunc)["lsn"].to_numpy(zero_copy_only=False))
        vers = vers.filter(pc.invert(is_trunc))
        if vers.num_rows == 0:
            return version_intervals(vers.slice(0, 0), key_cols, payload)

    t = vers.take(_sort_key_indices(vers, [*key_cols, "lsn"]))
    n = t.num_rows
    boundary = _group_boundaries(t, key_cols)
    grp = np.cumsum(boundary) - 1
    lsn = t["lsn"].to_numpy(zero_copy_only=False).astype(np.int64)

    # valid_to = next change's lsn within the key group, else +inf
    vt = np.full(n, _INF, dtype=np.int64)
    vt[:-1] = np.where(boundary[1:], _INF, lsn[1:])

    # truncate clamp: the first truncate AFTER this version opened closes
    # it (if it closes earlier than the next change already does)
    if trunc_lsns.size:
        ti = np.searchsorted(trunc_lsns, lsn, side="right")
        has_t = ti < trunc_lsns.size
        tval = np.where(has_t, trunc_lsns[np.minimum(ti, trunc_lsns.size - 1)],
                        _INF)
        vt = np.minimum(vt, tval)

    pos = np.arange(n, dtype=np.int64)
    BIG = np.int64(n + 2)
    out_cols = {}
    for c in payload:
        col = t[c]
        unch_name = f"_unchanged_{c}"
        if unch_name in t.column_names and pc.any(
                pc.fill_null(t[unch_name], False)).as_py():
            # TOAST carry per row: value from the last non-unchanged row
            # at-or-before it within the key group (setters include the
            # row itself; delete rows set null)
            unch = pc.fill_null(t[unch_name], False).to_numpy(
                zero_copy_only=False)
            setter = ~unch
            coord = np.where(setter, pos, np.int64(-1)) + grp * BIG
            last_setter = np.maximum.accumulate(coord) - grp * BIG
            valid = last_setter >= 0
            vals = col.take(pa.array(np.where(valid, last_setter, 0)))
            if not valid.all():
                vals = pc.if_else(pa.array(valid), vals,
                                  pa.scalar(None, col.type))
            out_cols[c] = vals
        else:
            out_cols[c] = col
    keep_row = pc.invert(pc.equal(t["op"], "delete"))
    out_cols["valid_from"] = pa.array(lsn)
    open_mask = vt == _INF
    vt_arr = pa.array(np.where(open_mask, 0, vt), pa.int64())
    if open_mask.any():
        vt_arr = pc.if_else(pa.array(open_mask), pa.scalar(None, pa.int64()),
                            vt_arr)
    out_cols["valid_to"] = vt_arr
    out_cols["is_current"] = pa.array(open_mask)
    return pa.table(out_cols).filter(keep_row)
