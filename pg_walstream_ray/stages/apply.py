"""Per-partition upsert apply: change window + lake fragment -> new fragment.

This is the engine's sink — the consumer side the reference deliberately
leaves to its users, specified by the safe-transaction-consumer
(/root/reference/examples/safe-transaction-consumer/src/main.rs:84-206 and
integration-tests/safe_transaction_consumer.rs:86-170): buffer by
transaction (done upstream — batches are commit-complete), apply in commit
order, advance the applied watermark only after durable apply.

Semantics per partition (all vectorized, no per-row Python):
  1. Exactly-once replay filter: drop rows with ``commit_lsn <=
     manifest.applied_lsn`` (monotone watermark, lsn.rs:105-173 analogue).
  2. Truncate: a truncate at LSN T wipes all state established before T
     (protocol.rs:954-982); only ops with lsn > T_last contribute to the
     final state, where T_last is the window's last truncate.
  3. Last-writer-wins upsert per primary key ``(conv_id, turn_idx)``:
     winner = max-lsn op per key; winner op delete -> key absent.
  4. TOAST 'u' columns carry the most recent prior SET value for the key
     (insert/update-with-value sets; delete sets null; chain computed via a
     grouped last-setter scan) — protocol.rs:317-318 semantics.
  5. Fragment written sorted by (conv_id, turn_idx) — stable turn ordering —
     with a ``_lsn`` last-writer column so the next window can merge;
     manifest published atomically AFTER the fragment (ack-after-apply,
     stream.rs:1563-1582).

The LWW/TOAST scan is the associative core: it is exactly the same
computation whether the input is (seed + window) here or (sub-results) in a
hierarchical merge, which is what makes salted sub-partitions mergeable.
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
    PartitionManifest,
    partition_dir,
    read_manifest,
    record_window,
    write_manifest_atomic,
)

KEY_COLS = ("conv_id", "turn_idx")
CONTROL = ("source", "lsn", "commit_lsn", "commit_ts_us", "xid", "op",
           "rel_version", "partition_id", "_cast_errors", "_weight")
COMPACT_AT = 8     # fragment-chain length that triggers a full merge


def payload_columns(schema: pa.Schema) -> List[str]:
    return [f.name for f in schema
            if f.name not in CONTROL and not f.name.startswith("_unchanged_")]


def _sort_key_indices(tbl: pa.Table, cols: Sequence[str]) -> pa.Array:
    return pc.sort_indices(tbl, sort_keys=[(c, "ascending") for c in cols])


def _group_boundaries(t: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Row-group boundaries over sorted key columns (generic: string keys
    via dictionary codes, numeric keys via raw values)."""
    n = t.num_rows
    boundary = np.zeros(n, dtype=bool)
    boundary[0] = True
    for kc in key_cols:
        col = t[kc]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            codes = pc.fill_null(col, -1).to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            enc = pc.dictionary_encode(col)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        boundary[1:] |= codes[1:] != codes[:-1]
    return boundary


def lww_resolve(ops: pa.Table, payload: Sequence[str],
                keep_tombstones: bool = False,
                key_cols: Sequence[str] = KEY_COLS) -> pa.Table:
    """Vectorized last-writer-wins + TOAST carry over a flat op table.

    ``ops`` columns: lsn, op, the payload columns, and ``_unchanged_<col>``
    bools.  Rows must already be truncate-filtered.  Returns the surviving
    final rows (payload + ``_lsn``), unsorted.

    With ``keep_tombstones=True`` delete-winning keys are RETAINED as
    tombstone rows (keys + ``_lsn`` + ``_tombstone=True``, null payload) —
    the delta-fragment form that lets merge-on-read cancel older fragments'
    values without rewriting them.
    """
    n = ops.num_rows
    if n == 0:
        out = {c: ops[c] for c in payload}
        out["_lsn"] = pa.array([], pa.int64())
        if keep_tombstones:
            out["_tombstone"] = pa.array([], pa.bool_())
        return pa.table(out)

    idx = _sort_key_indices(ops, [*key_cols, "lsn"])
    t = ops.take(idx)

    boundary = _group_boundaries(t, key_cols)
    grp = np.cumsum(boundary) - 1          # 0..G-1, contiguous per key
    G = int(grp[-1]) + 1

    pos = np.arange(n, dtype=np.int64)
    BIG = np.int64(n + 2)
    base = grp * BIG

    # last row per group = winner
    last_of_group = np.empty(G, dtype=np.int64)
    last_of_group[grp] = pos  # ascending within group -> last write wins
    winner_op = np.asarray(t["op"].take(pa.array(last_of_group)))
    alive = winner_op != "delete"
    if keep_tombstones:
        winners = last_of_group          # every key, dead ones flagged
        tomb = ~alive
    else:
        winners = last_of_group[alive]
        tomb = None

    out_cols = {}
    any_unch_cols = [c for c in payload if f"_unchanged_{c}" in t.column_names]
    for c in payload:
        col = t[c]
        unch_name = f"_unchanged_{c}"
        if unch_name in t.column_names and pc.any(
                pc.fill_null(t[unch_name], False)).as_py():
            # setter = row that establishes a value for this column:
            # any non-unchanged row (delete rows set null).
            unch = pc.fill_null(t[unch_name], False).to_numpy(zero_copy_only=False)
            setter = ~unch
            coord = np.where(setter, pos, np.int64(-1)) + base
            last_setter = np.maximum.accumulate(coord) - base
            # rows before any setter in their group -> -1 -> null value
            src = last_setter[winners]
            valid = src >= 0
            taker = pa.array(np.where(valid, src, 0), pa.int64())
            vals = col.take(taker)
            if not valid.all():
                vals = pc.if_else(pa.array(valid), vals,
                                  pa.scalar(None, col.type if not isinstance(col, pa.ChunkedArray) else col.type))
            out_cols[c] = vals
        else:
            out_cols[c] = col.take(pa.array(winners))
    out_cols["_lsn"] = t["lsn"].take(pa.array(winners))
    if tomb is not None:
        tomb_arr = pa.array(tomb)
        if tomb.any():
            # tombstones keep their key columns; other payload nulled (the
            # TOAST last-setter path above could otherwise resurrect a value)
            for c in payload:
                if c not in key_cols:
                    col = out_cols[c]
                    typ = col.type
                    out_cols[c] = pc.if_else(tomb_arr,
                                             pa.scalar(None, typ), col)
        out_cols["_tombstone"] = tomb_arr
    return pa.table(out_cols)


def _ensure_weight(t: pa.Table) -> pa.Table:
    """Uniform combiner output schema: every row carries ``_weight`` (how
    many source events it represents) so pass-through batches and compacted
    batches concat without null-filling — a missing ``_weight`` would make
    ``pc.sum(_weight)`` silently undercount pass-through rows."""
    if "_weight" in t.column_names:
        return t
    return t.append_column(
        "_weight", pa.array(np.ones(t.num_rows, dtype=np.int32)))


def precompact_typed(t: pa.Table,
                     key_cols: Sequence[str] = KEY_COLS) -> pa.Table:
    """Within-window LWW pre-compaction — the map-side COMBINER for the
    apply shuffle (SURVEY.md §7: pre-aggregate before the exchange).

    Collapses each ``key_cols`` group to its max-lsn winner, resolving the
    winner's TOAST-unchanged columns from earlier in-window setters (the
    same carry rule as lww_resolve, so the surviving row is exactly the
    row the apply-side LWW would have produced from this window slice).
    A ``_weight`` column accumulates how many events each survivor
    represents (exact events/s accounting downstream).

    Safe ONLY for a single source's contiguous LSN range with no truncate
    barrier — exactly one WAL segment, which is what the fused stage
    feeds it.  Anything else passes through untouched.
    """
    n = t.num_rows
    if (n == 0 or "_cast_errors" in t.column_names
            or any(k not in t.column_names for k in key_cols)):
        return _ensure_weight(t)
    if t.nbytes > 512 * n:
        # heavy-payload rows (2 KB texts, wide tables): the combiner's
        # sort+take copies the payload twice, which costs more than the
        # shuffle rows it saves (interleaved A/B on the Payload-2KB
        # scenario: 68.5 s with vs 41.5 s without) — skip
        return _ensure_weight(t)
    if pc.any(pc.equal(t["op"], "truncate")).as_py():
        return _ensure_weight(t)  # truncate barrier: order matters
    if pc.count_distinct(t["source"]).as_py() > 1:
        return _ensure_weight(t)  # cross-source lsn spaces are unordered
    idx = _sort_key_indices(t, [*key_cols, "lsn"])
    s = t.take(idx)
    boundary = _group_boundaries(s, key_cols)
    grp = np.cumsum(boundary) - 1
    G = int(grp[-1]) + 1
    in_w = (s["_weight"].to_numpy(zero_copy_only=False)
            if "_weight" in s.column_names
            else np.ones(n, dtype=np.int64))
    if G == n:
        return _ensure_weight(t)
    pos = np.arange(n, dtype=np.int64)
    winners = np.empty(G, dtype=np.int64)
    winners[grp] = pos                       # ascending lsn -> last wins
    weights = np.bincount(grp, weights=in_w, minlength=G).astype(np.int32)
    payload = payload_columns(s.schema)
    take_w = pa.array(winners)
    out: dict = {}
    for name in s.column_names:
        if name == "_weight" or name.startswith("_unchanged_"):
            continue                          # handled with their payload
        unch_name = f"_unchanged_{name}"
        if name in payload and unch_name in s.column_names and pc.any(
                pc.fill_null(s[unch_name], False)).as_py():
            # TOAST carry (same rule as lww_resolve): winner's value comes
            # from the last non-unchanged row at-or-before it in the group
            unch = pc.fill_null(s[unch_name], False).to_numpy(
                zero_copy_only=False)
            setter = ~unch
            BIG = np.int64(n + 2)
            coord = np.where(setter, pos, np.int64(-1)) + grp * BIG
            last_setter = np.maximum.accumulate(coord) - grp * BIG
            srcp = last_setter[winners]
            valid = srcp >= 0
            vals = s[name].take(pa.array(np.where(valid, srcp, 0)))
            if not valid.all():
                vals = pc.if_else(pa.array(valid), vals,
                                  pa.scalar(None, s[name].type))
            out[name] = vals
            out[unch_name] = pa.array(~valid)  # residual: fragment fill
        else:
            out[name] = s[name].take(take_w)
            if unch_name in s.column_names:
                out[unch_name] = s[unch_name].take(take_w)
    out["_weight"] = pa.array(weights)
    cols = [c for c in s.column_names if c != "_weight"] + ["_weight"]
    return pa.table({c: out[c] for c in cols})


def merged_partition_state(pdir: str, fragments: Sequence[str],
                           payload: Optional[List[str]] = None,
                           key_cols: Sequence[str] = KEY_COLS,
                           key_equals=None) -> pa.Table:
    """Merge-on-read of a partition's fragment chain -> current state
    (payload + ``_lsn``, tombstones resolved and dropped).

    When ``payload`` is given it is also a COLUMN-PRUNING pushdown: each
    fragment read touches only the requested payload plus the merge
    internals (key columns, ``_lsn``, ``_tombstone``) — a 2-column
    projection of a wide lake reads 2 columns' worth of pages, not the
    row, which is the read-amplification contract the serving path needs.

    ``key_equals=(col, value)`` is a ROW-GROUP-PRUNING pushdown for point
    lookups: fragments are written sorted by the key columns, so a
    parquet predicate on the leading key touches only the row groups
    whose stats admit the value.  LWW stays exact because every fragment
    is filtered by the same key — all versions of that key are read.
    """
    want = None
    if payload is not None:
        want = set(payload) | set(key_cols) | {"_lsn", "_tombstone"}
    filters = [(key_equals[0], "==", key_equals[1])] if key_equals else None
    tables = []
    for name in fragments:
        path = os.path.join(pdir, name)
        if want is None:
            t = pq.read_table(path, filters=filters)
        else:
            have = set(pq.ParquetFile(path).schema_arrow.names)
            t = pq.read_table(path, columns=[c for c in want if c in have],
                              filters=filters)
        tables.append(t)
    if not tables:
        return pa.table({})
    if payload is None:
        seen: List[str] = []
        for t in tables:
            for c in t.column_names:
                if c not in ("_lsn", "_tombstone") and c not in seen:
                    seen.append(c)
        payload = seen
    proto = max(tables, key=lambda t: len(t.column_names))
    ops_parts = []
    for t in tables:
        n = t.num_rows
        tombs = t["_tombstone"] if "_tombstone" in t.column_names \
            else pa.array(np.zeros(n, dtype=bool))
        cols = {"lsn": t["_lsn"],
                "op": pc.if_else(tombs, pa.scalar("delete"),
                                 pa.scalar("insert"))}
        for c in payload:
            if c in t.column_names:
                cols[c] = t[c]
            else:
                want = proto.schema.field(c).type \
                    if c in proto.column_names else pa.string()
                cols[c] = pa.nulls(n, want)
        ops_parts.append(pa.table(cols))
    ops = pa.concat_tables(ops_parts, promote_options="default")
    return lww_resolve(ops, payload, key_cols=key_cols)


def _conform(tbl: pa.Table, target_payload: List[str],
             schema_of: pa.Table) -> pa.Table:
    """Schema-evolve a seed fragment onto the current payload schema:
    add missing columns as nulls, widen types via cast (SURVEY.md §1.4)."""
    cols = {}
    n = tbl.num_rows
    for c in target_payload:
        want = schema_of.schema.field(c).type
        if c in tbl.column_names:
            col = tbl[c]
            if col.type != want:
                col = pc.cast(col, want)
            cols[c] = col
        else:
            cols[c] = pa.nulls(n, want)
    cols["_lsn"] = tbl["_lsn"] if "_lsn" in tbl.column_names \
        else pa.array(np.full(n, -1, dtype=np.int64))
    return pa.table(cols)


def apply_partition_window(group: pa.Table, lake_dir: str,
                           key_cols: Sequence[str] = KEY_COLS) -> dict:
    """Apply one partition's change window against its lake fragment.

    Returns a summary dict (one manifest line). Idempotent: re-running with
    an already-applied window is a no-op thanks to the commit_lsn filter +
    atomic manifest publish.
    """
    pid = int(group["partition_id"][0].as_py())
    m = read_manifest(lake_dir, pid)

    # exactly-once replay filter, PER SOURCE (vector watermark): an event is
    # new iff its commit_lsn exceeds this partition's applied mark for ITS
    # source slot.  Vectorized: threshold lookup per row via np.take over
    # the (tiny) source id space.
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
    is_trunc = pc.equal(window["op"], "truncate")
    t_last = -1
    if pc.any(is_trunc).as_py():
        t_last = pc.max(window.filter(is_trunc)["lsn"]).as_py()
    dml = window.filter(pc.invert(is_trunc))
    if t_last >= 0:
        dml = dml.filter(pc.greater(dml["lsn"], t_last))

    pdir = partition_dir(lake_dir, pid)
    unch_cols = [f"_unchanged_{c}" for c in payload
                 if f"_unchanged_{c}" in dml.column_names]
    any_unchanged = any(pc.any(pc.fill_null(dml[c], False)).as_py()
                        for c in unch_cols) if dml.num_rows else False

    # Write mode (the 100TB write-amplification control):
    #   delta  — resolve the window alone; deletes become tombstone rows;
    #            append to the fragment chain (no state rewrite).
    #   base   — full merge (chain + window) -> single fragment.  Required
    #            when a truncate wiped history, when TOAST 'u' columns need
    #            prior values (the read is needed anyway), when the chain
    #            reached COMPACT_AT, or on first write.
    full_merge = (t_last >= 0 or any_unchanged or not m.fragments
                  or len(m.fragments) + 1 >= COMPACT_AT)

    keep = ["lsn", "op", *payload, *unch_cols]
    ops = dml.select(keep)
    if full_merge and m.fragments and t_last < 0:
        state = merged_partition_state(pdir, m.fragments, None,
                                       key_cols=key_cols)
        state = _conform(state, payload, dml)
        seed_cols = {c: state[c] for c in payload}
        seed_cols["lsn"] = state["_lsn"]
        seed_cols["op"] = pa.array(
            np.full(state.num_rows, "insert", dtype=object), pa.string())
        for un in unch_cols:
            seed_cols[un] = pa.array(np.zeros(state.num_rows, dtype=bool))
        ops = pa.concat_tables([pa.table(seed_cols).select(keep), ops],
                               promote_options="default")

    applied_events = (
        int(pc.sum(pc.fill_null(dml["_weight"], 1)).as_py() or 0)
        if "_weight" in dml.column_names else dml.num_rows)

    # lww_resolve emits winners in group order of the (key, lsn) sort, so
    # the result is already key-sorted — no second sort (stable ordering
    # invariant checked by tests/test_property.py)
    final = lww_resolve(ops, payload, keep_tombstones=not full_merge,
                        key_cols=key_cols)

    os.makedirs(pdir, exist_ok=True)
    # per-source max applied commit_lsn in this window (vector watermark)
    wsrc = window["source"].to_numpy(zero_copy_only=False).astype(np.int64)
    wcommit = window["commit_lsn"].to_numpy(zero_copy_only=False)
    per_source: dict = {}
    for s in np.unique(wsrc):
        per_source[int(s)] = int(wcommit[wsrc == s].max())
    max_commit = max(per_source.values())
    kind = "base" if full_merge else "delta"
    frag_name = f"fragment-{m.epoch + 1:06d}-{max_commit}-{kind}.parquet"
    tmp = os.path.join(pdir, f".{frag_name}.{uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(final, tmp, compression="zstd")
    os.replace(tmp, os.path.join(pdir, frag_name))

    old_frags = list(m.fragments)
    if full_merge:
        new_frags = [frag_name]
        row_count = final.num_rows
    else:
        new_frags = old_frags + [frag_name]
        # estimate: exact only at base writes (documented in manifest.py)
        row_count = m.row_count + final.num_rows
    record_window(m, per_source_max_commit=per_source,
                  window_min_lsn=pc.min(window["lsn"]).as_py(),
                  rows_applied=applied_events, fragments=new_frags,
                  row_count=row_count, compacted=full_merge)
    write_manifest_atomic(lake_dir, m)
    for dead in set(old_frags) - set(new_frags):
        # dead once the manifest points away; best-effort GC
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


class ApplyGroup:
    """``groupby('partition_id').map_groups`` callable: one group per call."""

    def __init__(self, lake_dir: str, key_cols: Sequence[str] = KEY_COLS):
        self.lake_dir = lake_dir
        self.key_cols = tuple(key_cols)

    def __call__(self, group: pa.Table) -> pa.Table:
        summary = apply_partition_window(group, self.lake_dir,
                                         key_cols=self.key_cols)
        return pa.table({k: [v] for k, v in summary.items()})
