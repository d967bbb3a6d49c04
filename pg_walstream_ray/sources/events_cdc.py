"""Deterministic CDC change streams derived from the testdata ``events``
table — the SQL-verifiable correctness harness.

Each mode maps ``events`` rows 1:1 onto transcript change ops with pure,
SQL-expressible rules, so the driver can run the FULL engine stack
(logical ops -> pgoutput frames -> shard decode -> partition -> exactly-once
apply -> lake snapshot) and verify the final table against a DuckDB window
query over the same parquet (see ``__ray_entry__.oracle_sql``).

Shared derivation (identical in SQL):
  lsn      = event_id * 4 + 4            (gaps for Begin/Relation/Commit)
  conv_id  = 'c' || user_id
  role     = map(event_type): signup->system, click->user,
             purchase->assistant, error->tool, view->user
  text     = 'e' || event_id || ':' || props
  tool     = 'tool' || (event_id % 7)  when event_type='error' else NULL
  ts       = events.ts

Modes (op rules):
  insert_only   turn_idx = event_id            all inserts
  upsert        turn_idx = event_id % 13       signup/view -> insert,
                                               else update (LWW upsert)
  upsert_delete upsert, but error -> delete
  toast         upsert (no deletes); click updates carry text as
                TOAST-unchanged ('u') -> apply must carry prior text forward
  truncate      upsert + a table TRUNCATE spliced at lsn TRUNCATE_LSN
  evolve        upsert; events with event_id >= EVOLVE_AT use relation v2
                (adds score int4 = turn_idx % 5); earlier rows null-fill
  bounded       upsert, replay stopped inside transaction BOUNDED_TX —
                the crossing tx is delivered in full (tx = event_id // 50)
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .walgen import LOGICAL_SCHEMA, WalSpec, write_logical_shard

ROLE_MAP = {"signup": "system", "click": "user", "purchase": "assistant",
            "error": "tool", "view": "user"}

TURN_MOD = 13
TX_ROWS = 50

# streamed mode (protocol v2+ in-progress-transaction framing): every 3rd tx
# is emitted as StreamStart..StreamStop segments; every 9th is StreamAborted
# (a subset of the streamed ones) and must vanish from the final table
STREAMED_TX_MOD = 3
STREAM_ABORT_TX_MOD = 9

# two_phase mode (protocol v3+): every 4th tx goes through BeginPrepare..
# Prepare staging; every 12th is ALSO streamed (StreamPrepare variant); every
# 8th is resolved by RollbackPrepared and must vanish from the final table
PREPARED_TX_MOD = 4
PREPARED_STREAM_TX_MOD = 12
PREPARED_ROLLBACK_TX_MOD = 8
EVOLVE_AT = 500          # event_id threshold for relation v2
TRUNCATE_AFTER = 600     # truncate lands between events 599 and 600
BOUNDED_STOP_EVENT = 675  # stop target inside tx 13 (events 650..699)

# hot mode: every event collapses onto one of HOT_CONV_MOD conversations
# (each ~1/3 of the stream — far above the 0.2 hot-key probe threshold), so
# the salted-partition path MUST engage for the query to pass; the larger
# turn space gives the salt room to spread each hot conversation
HOT_CONV_MOD = 3
HOT_TURN_MOD = 997

DIRTY_SCORE_MOD = 10     # dirty mode: v2 rows with turn_idx % 10 == 0 carry
                         # an unparseable score (lenient dead-letter fixture)

MESSAGE_TX_MOD = 5       # messages mode: every 5th tx opens with a
                         # transactional pg_logical_emit_message ('M',
                         # prefix "audit", content "tx=<xid>")

ORIGIN_TX_MOD = 6        # origins mode: every 6th tx carries an Origin
                         # ('O') marker — foreign-originated; with
                         # origin_filter='none' it must vanish entirely


def derive_changes(events: pa.Table, mode: str) -> pa.Table:
    """events rows -> logical change table (walgen.LOGICAL_SCHEMA order
    preserved; one op per event). Fully vectorized."""
    ev_id = events["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ev_id)
    if n == 0:          # empty source table -> empty change stream
        return LOGICAL_SCHEMA.empty_table()
    lsn = ev_id * 4 + 4
    et = events["event_type"].to_numpy(zero_copy_only=False)

    if mode == "insert_only":
        turn = ev_id.astype(np.int32)
        op = np.full(n, "insert", dtype=object)
    else:
        turn = (ev_id % (HOT_TURN_MOD if mode == "hot" else TURN_MOD)) \
            .astype(np.int32)
        op = np.where(np.isin(et, ["signup", "view"]), "insert", "update")
        if mode == "upsert_delete":
            op = np.where(et == "error", "delete", op)
        op = op.astype(object)

    user_col = events["user_id"]
    if mode == "hot":
        u = user_col.to_numpy(zero_copy_only=False).astype(np.int64)
        user_col = pa.array(u % HOT_CONV_MOD)
    conv = pc.binary_join_element_wise(
        "c", pc.cast(user_col, pa.string()), "")
    role_np = np.empty(n, dtype=object)
    for k, v in ROLE_MAP.items():
        role_np[et == k] = v
    role = pa.array(role_np, pa.string())
    text = pc.binary_join_element_wise(
        "e", pc.cast(events["event_id"], pa.string()), ":", events["props"], "")
    is_err = et == "error"
    tool = np.where(is_err,
                    np.char.add("tool", np.char.mod("%d", ev_id % 7)).astype(object),
                    None)
    ts_us = pc.cast(events["ts"], pa.int64()).to_numpy(zero_copy_only=False)

    unchanged = np.zeros(n, dtype=bool)
    if mode == "toast":
        unchanged = (et == "click")  # updates carrying 'u' text

    rel_version = np.ones(n, dtype=np.int32)
    if mode in ("evolve", "dirty"):
        rel_version[ev_id >= EVOLVE_AT] = 2

    is_del = op == "delete"
    null_str = pa.scalar(None, pa.string())
    role = pc.if_else(pa.array(is_del), null_str, role)
    text_arr = pc.if_else(pa.array(is_del | unchanged), null_str, text)
    tool_arr = pa.array(np.where(is_del, None, tool), pa.string())

    t = pa.table({
        "lsn": pa.array(lsn),
        "xid": pa.array(np.zeros(n, dtype=np.int64)),  # assigned per shard
        "committed": pa.array(np.ones(n, dtype=bool)),
        "streamed": pa.array(np.zeros(n, dtype=bool)),
        "aborted": pa.array(np.zeros(n, dtype=bool)),
        "prepared": pa.array(np.zeros(n, dtype=bool)),
        "op": pa.array(op, pa.string()),
        "conv_id": conv,
        "turn_idx": pa.array(turn),
        "role": role,
        "text": text_arr,
        "tool": tool_arr,
        "ts_us": pa.array(ts_us),
        "text_unchanged": pa.array(unchanged),
        "rel_version": pa.array(rel_version),
    }, schema=LOGICAL_SCHEMA)
    return t


def _splice_truncate(logical: pa.Table) -> pa.Table:
    """Insert a table-wide TRUNCATE between events TRUNCATE_AFTER-1 and
    TRUNCATE_AFTER (lsn = TRUNCATE_AFTER*4+2)."""
    t_lsn = TRUNCATE_AFTER * 4 + 2
    trunc = pa.table({
        "lsn": pa.array([t_lsn], pa.int64()),
        "xid": pa.array([0], pa.int64()),
        "committed": pa.array([True]),
        "streamed": pa.array([False]),
        "aborted": pa.array([False]),
        "prepared": pa.array([False]),
        "op": pa.array(["truncate"]),
        "conv_id": pa.array([None], pa.string()),
        "turn_idx": pa.array([None], pa.int32()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts_us": pa.array([0], pa.int64()),
        "text_unchanged": pa.array([False]),
        "rel_version": pa.array([1], pa.int32()),
    }, schema=LOGICAL_SCHEMA)
    merged = pa.concat_tables([logical, trunc])
    return merged.take(pc.sort_indices(merged, sort_keys=[("lsn", "ascending")]))


def build_wal_from_events(sf_dir: str, mode: str, out_dir: str,
                          n_shards: int = 2) -> None:
    """Materialize the WAL lake for one mode. Deterministic; skipped if the
    output already exists (content is a pure function of inputs).

    Sharding: ``user_id % n_shards`` — each conversation lives in exactly
    one shard (slot), matching the engine's source-disjointness assumption.
    Transactions are TX_ROWS consecutive ops within a shard.
    """
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return
    events = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"])
    events = events.take(pc.sort_indices(events, sort_keys=[("event_id",
                                                             "ascending")]))
    logical = derive_changes(events, mode)
    user = events["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    spec = WalSpec(n_shards=n_shards,
                   dirty_score_mod=DIRTY_SCORE_MOD if mode == "dirty" else 0,
                   message_every_tx=MESSAGE_TX_MOD if mode == "messages"
                   else 0,
                   origin_every_tx=ORIGIN_TX_MOD if mode == "origins"
                   else 0)
    os.makedirs(out_dir, exist_ok=True)
    for s in range(n_shards):
        part = logical.filter(pa.array(user % n_shards == s))
        if mode == "truncate":
            part = _splice_truncate(part)
        # transaction grouping: TX_ROWS consecutive ops within the shard
        rank = np.arange(part.num_rows, dtype=np.int64)
        tx_idx = rank // TX_ROWS
        xid = (np.int64(s) << 24) + tx_idx + 1000
        part = part.set_column(part.schema.get_field_index("xid"), "xid",
                               pa.array(xid))

        def _set_bool(tbl: pa.Table, name: str, vals: np.ndarray) -> pa.Table:
            return tbl.set_column(tbl.schema.get_field_index(name), name,
                                  pa.array(vals))

        if mode == "streamed":
            # SQL-expressible tx rank (n_shards=1 in the driver query):
            # tx = (ROW_NUMBER() OVER (ORDER BY event_id) - 1) // TX_ROWS
            part = _set_bool(part, "streamed", tx_idx % STREAMED_TX_MOD == 0)
            part = _set_bool(part, "aborted",
                             tx_idx % STREAM_ABORT_TX_MOD == 0)
        elif mode == "two_phase":
            part = _set_bool(part, "prepared", tx_idx % PREPARED_TX_MOD == 0)
            part = _set_bool(part, "streamed",
                             tx_idx % PREPARED_STREAM_TX_MOD == 0)
            part = _set_bool(part, "aborted",
                             tx_idx % PREPARED_ROLLBACK_TX_MOD == 0)
        write_logical_shard(part, spec, s, out_dir)
    with open(done, "w") as f:
        f.write("ok")


def build_wal_from_events_phased(sf_dir: str, out_dir: str,
                                 n_shards: int = 2,
                                 phase_frac: float = 0.5):
    """Continuous-tailing fixture: the SAME upsert WAL as
    ``build_wal_from_events(mode='upsert')`` — identical logical rows,
    xids and commit LSNs, so every upsert-mode oracle applies unchanged —
    but split per shard at a TRANSACTION boundary into a phase-1 archive
    written now and a phase-2 appender returned to the caller.  A
    follower consuming ``out_dir`` sees phase 1, goes idle, then picks
    up phase 2 when the caller appends it mid-run (segments are
    self-describing, so the appended batch encodes identically).

    Returns ``(append_phase2, stats)``: stats carries per-source phase-1
    max frame LSNs (the watermark a fully-caught-up phase-1 lake must
    reach) and per-phase DML row counts.  Not cached: phases mutate the
    dir, so every caller gets a fresh build.
    """
    import shutil as _shutil

    shutil_rmtree = _shutil.rmtree
    if os.path.exists(out_dir):
        shutil_rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    events = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"])
    events = events.take(pc.sort_indices(
        events, sort_keys=[("event_id", "ascending")]))
    logical = derive_changes(events, "upsert")
    user = events["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    spec = WalSpec(n_shards=n_shards)
    dml = pa.array(["insert", "update", "delete"], pa.string())
    phase2_parts: List[Tuple[int, pa.Table]] = []
    stats = {"phase1_max_lsn": {}, "final_max_lsn": {},
             "phase1_dml": 0, "phase2_dml": 0}
    for s in range(n_shards):
        part = logical.filter(pa.array(user % n_shards == s))
        rank = np.arange(part.num_rows, dtype=np.int64)
        tx_idx = rank // TX_ROWS
        xid = (np.int64(s) << 24) + tx_idx + 1000
        part = part.set_column(part.schema.get_field_index("xid"), "xid",
                               pa.array(xid))
        n_txs = int(tx_idx[-1]) + 1 if part.num_rows else 0
        cut_tx = max(1, int(np.ceil(n_txs * phase_frac)))
        mask = tx_idx < cut_tx
        p1, p2 = part.filter(pa.array(mask)), part.filter(pa.array(~mask))
        # one segment per phase: phase 1 now, phase 2 via the appender
        write_logical_shard(p1, spec, s, out_dir,
                            segment_frames=max(1, p1.num_rows))
        phase2_parts.append((s, p2))
        if p1.num_rows:
            # phase-1 commit watermark = last commit lsn (max row lsn + 1,
            # encode_shard_frames' commit_lsn rule)
            stats["phase1_max_lsn"][s] = int(
                pc.max(p1["lsn"]).as_py()) + 1
        if part.num_rows:
            stats["final_max_lsn"][s] = int(
                pc.max(part["lsn"]).as_py()) + 1
        n1 = int(pc.sum(pc.cast(pc.is_in(p1["op"], value_set=dml),
                                pa.int64())).as_py() or 0)
        n2 = int(pc.sum(pc.cast(pc.is_in(p2["op"], value_set=dml),
                                pa.int64())).as_py() or 0)
        stats["phase1_dml"] += n1
        stats["phase2_dml"] += n2

    def append_phase2() -> None:
        for s, p2 in phase2_parts:
            if p2.num_rows:
                write_logical_shard(p2, spec, s, out_dir,
                                    segment_frames=max(1, p2.num_rows),
                                    segment_base=1)

    return append_phase2, stats
