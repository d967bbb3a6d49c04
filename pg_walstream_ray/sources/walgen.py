"""Deterministic synthetic WAL generator for the transcripts table.

Replaces the reference's live PostgreSQL + pgoutput encoder
(/root/reference/src/pgoutput_encode/*): emits the same logical message
sequence (Begin/Relation/Insert/Update/Delete/Truncate/Commit, streamed
transactions with abort, keepalives) as framed XLogData byte blobs, sharded
into N independent ordered logs ("synthetic slots").  Everything is seeded
and reproducible; no external data.

Shape of the target table is the authoritative input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` with primary key / replica identity ``(conv_id,
turn_idx)``.

Two layers:
  1. ``shard_logical_changes(spec, shard)`` -> vectorized Arrow table of
     logical ops (the ground truth used by the oracle).
  2. ``encode_shard_frames(logical, spec, shard)`` -> wire frames table
     ``(lsn:int64, frame:binary)`` — the pgoutput byte stream a decoder
     must parse back.

Transactions never span shards (conversations are sharded), mirroring a
one-slot-per-shard deployment.  Each shard's LSN space is a disjoint range
``shard << 44 | seq`` so LSNs are globally unique and per-shard monotone.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, asdict, replace
from typing import Dict, Iterator, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..wire import codec
from ..wire.frames import encode_xlogdata, encode_keepalive, unix_us_to_pg_ts

TRANSCRIPTS_OID = 16384
TEXT_OID = 25
INT4_OID = 23
INT8_OID = 20
TIMESTAMP_OID = 1114

ROLES = ("user", "assistant", "system", "tool")

# Base columns of the transcripts relation (input_hint).  ``flags & 1`` marks
# replica-identity key columns (protocol.rs:241-250).
BASE_COLUMNS = [
    codec.ColumnInfo(1, "conv_id", TEXT_OID, -1),
    codec.ColumnInfo(1, "turn_idx", INT4_OID, -1),
    codec.ColumnInfo(0, "role", TEXT_OID, -1),
    codec.ColumnInfo(0, "text", TEXT_OID, -1),
    codec.ColumnInfo(0, "tool", TEXT_OID, -1),
    codec.ColumnInfo(0, "ts", TIMESTAMP_OID, -1),
]
# rel_version 2 (schema evolution: add column -> null-fill; FIXTURES.md §4.8)
V2_COLUMNS = BASE_COLUMNS + [codec.ColumnInfo(0, "score", INT4_OID, -1)]

RELATION_VERSIONS = {1: BASE_COLUMNS, 2: V2_COLUMNS}

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, unix micros

LSN_SHARD_SHIFT = 44


@dataclass(frozen=True)
class WalSpec:
    """Seeded scenario parameters. All randomness derives from (seed, shard)."""

    n_convs: int = 100
    turns_per_conv: int = 10
    update_frac: float = 0.3       # updates as a fraction of inserts
    delete_frac: float = 0.05      # deletes as a fraction of inserts
    tx_rows: int = 50              # DML rows per transaction (last tx may be short)
    n_shards: int = 4
    seed: int = 42
    payload_bytes: int = 0         # pad text to at least this many bytes
    hot_conv_frac: float = 0.0     # fraction of events hitting conv 0 (skew)
    truncate_at_frac: Optional[float] = None  # position in op stream, 0..1
    streamed_frac: float = 0.0     # fraction of txs emitted as stream segments
    stream_abort_frac: float = 0.0  # fraction of *streamed* txs aborted
    two_phase_frac: float = 0.0    # fraction of txs prepared (two-phase,
                                   # protocol v3+: BeginPrepare..Prepare then
                                   # CommitPrepared / RollbackPrepared)
    two_phase_rollback_frac: float = 0.0  # fraction of *prepared* txs rolled back
    toast_unchanged_frac: float = 0.0  # fraction of updates with 'u' text
    schema_change_at_frac: Optional[float] = None  # switch to rel v2 here
    uncommitted_tail: bool = False  # leave the last tx without a Commit
    dirty_score_mod: int = 0       # >0: v2 rows with turn_idx % mod == 0
                                   # carry an UNPARSEABLE score value (the
                                   # lenient dead-letter fixture)
    binary_text: bool = False      # ship the text column as 'b' (binary)
                                   # tuple tags — the protocol with_binary
                                   # analogue (stream.rs:219-222); consumers
                                   # see the decoder's canonical hex text
                                   # form, so the logical ground truth
                                   # records that form too
    origin_every_tx: int = 0       # >0: every Nth tx opens with an Origin
                                   # ('O') message — the tx "was replicated
                                   # from another node" marker; with
                                   # origin_filter='none' the decoder must
                                   # drop the whole tx (loop avoidance)
    message_every_tx: int = 0      # >0: every Nth tx opens with a
                                   # transactional pg_logical_emit_message
                                   # ('M', prefix "audit", content
                                   # "tx=<xid32>") — protocol `messages`
                                   # option parity (protocol.rs:985-1053)
    keepalive_every: int = 256     # interleave a keepalive frame every N frames
    segment_rows: Optional[int] = None  # logical rows per WAL segment file
                                   # (tx-aligned; Relation re-sent per segment)

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @staticmethod
    def from_json(s: str) -> "WalSpec":
        return WalSpec(**json.loads(s))


LOGICAL_SCHEMA = pa.schema([
    ("lsn", pa.int64()),
    ("xid", pa.int64()),
    ("committed", pa.bool_()),
    ("streamed", pa.bool_()),
    ("aborted", pa.bool_()),      # streamed: StreamAbort; prepared: RollbackPrepared
    ("prepared", pa.bool_()),     # two-phase tx (BeginPrepare/Prepare staging)
    ("op", pa.string()),          # insert|update|delete|truncate
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts_us", pa.int64()),        # unix micros
    ("text_unchanged", pa.bool_()),  # TOAST 'u' tag on text for this update
    ("rel_version", pa.int32()),
])


def shard_lsn_base(shard: int) -> int:
    return (shard + 1) << LSN_SHARD_SHIFT


def shard_logical_changes(spec: WalSpec, shard: int) -> pa.Table:
    """Vectorized logical op stream for one shard (ground truth).

    Conversations ``c`` with ``c % n_shards == shard`` belong to this shard.
    Op order: all inserts conv-major, then a seeded shuffle of
    updates+deletes; optional truncate spliced at ``truncate_at_frac``.
    """
    rng = np.random.default_rng(spec.seed * 1_000_003 + shard)
    convs = np.arange(shard, spec.n_convs, spec.n_shards, dtype=np.int64)
    n_convs = len(convs)
    T = spec.turns_per_conv
    n_ins = n_convs * T

    ins_conv = np.repeat(convs, T)
    ins_turn = np.tile(np.arange(T, dtype=np.int32), n_convs)

    n_upd = int(n_ins * spec.update_frac)
    n_del = int(n_ins * spec.delete_frac)
    upd_pick = rng.integers(0, n_ins, size=n_upd)
    del_pick = rng.integers(0, n_ins, size=n_del)
    if spec.hot_conv_frac > 0 and n_convs > 0:
        # route a fraction of updates to the shard's first conversation
        hot = rng.random(n_upd) < spec.hot_conv_frac
        hot_slots = np.flatnonzero(ins_conv == convs[0])
        if len(hot_slots):
            upd_pick[hot] = hot_slots[upd_pick[hot] % len(hot_slots)]

    tail_conv = np.concatenate([ins_conv[upd_pick], ins_conv[del_pick]])
    tail_turn = np.concatenate([ins_turn[upd_pick], ins_turn[del_pick]])
    tail_op = np.concatenate([
        np.full(n_upd, "update", dtype=object),
        np.full(n_del, "delete", dtype=object),
    ])
    perm = rng.permutation(n_upd + n_del)
    tail_conv, tail_turn, tail_op = tail_conv[perm], tail_turn[perm], tail_op[perm]

    op = np.concatenate([np.full(n_ins, "insert", dtype=object), tail_op])
    conv = np.concatenate([ins_conv, tail_conv])
    turn = np.concatenate([ins_turn, tail_turn]).astype(np.int32)
    n = len(op)

    # optional truncate spliced into the stream
    if spec.truncate_at_frac is not None:
        pos = int(n * spec.truncate_at_frac)
        op = np.insert(op, pos, "truncate")
        conv = np.insert(conv, pos, -1)
        turn = np.insert(turn, pos, np.int32(-1))
        n += 1

    seq = np.arange(n, dtype=np.int64)
    # leave a gap of 4 LSN slots per row for Begin/Commit/Relation records
    lsn = shard_lsn_base(shard) + 4 * seq + 4

    # transactions: fixed-size row groups
    tx_idx = seq // spec.tx_rows
    xid = (np.int64(shard) << 24) + tx_idx + 1000
    n_tx = int(tx_idx[-1]) + 1 if n else 0

    committed = np.ones(n, dtype=bool)
    if spec.uncommitted_tail and n_tx > 0:
        committed[tx_idx == n_tx - 1] = False

    streamed = np.zeros(n, dtype=bool)
    aborted = np.zeros(n, dtype=bool)
    if spec.streamed_frac > 0 and n_tx > 0:
        tx_streamed = rng.random(n_tx) < spec.streamed_frac
        tx_aborted = tx_streamed & (rng.random(n_tx) < spec.stream_abort_frac)
        streamed = tx_streamed[tx_idx]
        aborted = tx_aborted[tx_idx]
    prepared = np.zeros(n, dtype=bool)
    if spec.two_phase_frac > 0 and n_tx > 0:
        tx_prepared = rng.random(n_tx) < spec.two_phase_frac
        tx_rolled = tx_prepared & (rng.random(n_tx)
                                   < spec.two_phase_rollback_frac)
        prepared = tx_prepared[tx_idx]
        # rollback reuses the aborted flag (replay_oracle excludes either
        # kind of discarded tx the same way)
        aborted = aborted | tx_rolled[tx_idx]

    rel_version = np.ones(n, dtype=np.int32)
    if spec.schema_change_at_frac is not None:
        rel_version[int(n * spec.schema_change_at_frac):] = 2

    conv_str = pc.binary_join_element_wise(
        "conv", pc.cast(pa.array(conv), pa.string()), "")
    turn_str = pc.cast(pa.array(turn), pa.string())
    lsn_str = pc.cast(pa.array(lsn), pa.string())
    role = pa.array(np.array(ROLES, dtype=object)[turn % len(ROLES)])
    is_upd = op == "update"
    prefix = np.where(is_upd, "upd", "txt")
    text = pc.binary_join_element_wise(
        pa.array(prefix.astype(object), type=pa.string()), "-",
        conv_str, "-", turn_str, "-", lsn_str, "")
    if spec.payload_bytes > 0:
        pad = "x" * spec.payload_bytes
        text = pc.binary_join_element_wise(text, pad, "|")
    tool_mask = np.asarray(pc.equal(role, "tool"))
    tool_names = np.char.add("tool", np.char.mod("%d", turn % 7)).astype(object)
    tool_names[~tool_mask] = None
    tool = pa.array(tool_names, type=pa.string())
    ts_us = BASE_TS_US + lsn

    text_unchanged = np.zeros(n, dtype=bool)
    if spec.toast_unchanged_frac > 0:
        text_unchanged = is_upd & (rng.random(n) < spec.toast_unchanged_frac)

    # delete/truncate rows carry no payload
    null_str = pa.scalar(None, pa.string())
    no_payload = pa.array((op == "delete") | (op == "truncate"))
    is_trunc = pa.array(op == "truncate")
    role = pc.if_else(no_payload, null_str, role)
    text = pc.if_else(no_payload, null_str, text)
    tool = pc.if_else(no_payload, null_str, tool)
    conv_col = pc.if_else(is_trunc, null_str, conv_str)
    turn_col = pc.if_else(is_trunc, pa.scalar(None, pa.int32()), pa.array(turn))
    if spec.binary_text:
        # binary ('b') values decode to the canonical \x hex text form
        # (stages/decode.py 'b' handler / column_value.rs:17-56), so the
        # ground truth IS that form; the encoder un-hexes it back to raw
        # bytes for the wire (generation-time only, not a benched path)
        text = pa.array([None if s is None else "\\x" + s.encode().hex()
                         for s in text.to_pylist()], pa.string())

    return pa.table({
        "lsn": pa.array(lsn),
        "xid": pa.array(xid),
        "committed": pa.array(committed),
        "streamed": pa.array(streamed),
        "aborted": pa.array(aborted),
        "prepared": pa.array(prepared),
        "op": pa.array(op, type=pa.string()),
        "conv_id": conv_col,
        "turn_idx": turn_col,
        "role": role,
        "text": text,
        "tool": tool,
        "ts_us": pa.array(ts_us),
        "text_unchanged": pa.array(text_unchanged),
        "rel_version": pa.array(rel_version),
    }, schema=LOGICAL_SCHEMA)


# ---------------------------------------------------------------------------
# Sequential oracle: the definitional replay (a plain state machine).  Used
# only in tests at small scale; the vectorized engine must match it exactly.
# Mirrors the safe-transaction-consumer apply contract
# (/root/reference/examples/safe-transaction-consumer/src/main.rs:84-206)
# with upsert semantics and TOAST carry-forward (protocol.rs:317-318).
# ---------------------------------------------------------------------------


def replay_oracle(logical_tables: List[pa.Table],
                  stop_lsn: Optional[int] = None) -> "pa.Table":
    """Replay committed, non-aborted ops in LSN order -> final table state.

    ``stop_lsn`` implements bounded replay per shard: apply transactions in
    commit order up to and including the first commit whose end_lsn >= the
    target — the crossing transaction is delivered in full
    (stream.rs:362-387, integration-tests/bounded_replay.rs:54-155).
    """
    import pandas as pd

    state: Dict[tuple, dict] = {}
    for t in logical_tables:
        df = t.to_pandas()
        df = df[df["committed"] & ~df["aborted"]]
        df = df.sort_values("lsn", kind="mergesort")
        if stop_lsn is not None and len(df):
            # encoder invariant: commit_lsn = max(row lsn)+1, end_lsn = +2
            commit_lsn = df.groupby("xid")["lsn"].transform("max") + 1
            end_lsn = commit_lsn + 1
            crossing = commit_lsn[end_lsn >= stop_lsn]
            cutoff = crossing.min() if len(crossing) else np.inf
            df = df[commit_lsn <= cutoff]
        for row in df.itertuples(index=False):
            if row.op == "truncate":
                state.clear()
                continue
            key = (row.conv_id, int(row.turn_idx))
            if row.op == "delete":
                state.pop(key, None)
                continue
            text = row.text
            if row.op == "update" and row.text_unchanged:
                prev = state.get(key)
                text = prev["text"] if prev is not None else None
            state[key] = {
                "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx),
                "role": row.role,
                "text": text,
                "tool": row.tool,
                "ts_us": int(row.ts_us),
            }
    rows = sorted(state.values(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    if not rows:
        return pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
        })
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# Frame encoding: logical table -> pgoutput wire frames (lsn, frame).
# ---------------------------------------------------------------------------


def _relation_msg(version: int) -> codec.Relation:
    return codec.Relation(TRANSCRIPTS_OID, "public", "transcripts", "d",
                          RELATION_VERSIONS[version])


def _fmt_ts(ts_us: int) -> bytes:
    # pgoutput text mode renders timestamps as ISO text; we keep micros-int
    # text form for lossless round-tripping (consumer casts at the edge).
    return str(ts_us).encode()


def _tuple_for(row, version: int, unchanged_text: bool,
               dirty_score_mod: int = 0,
               binary_text: bool = False) -> codec.TupleData:
    if unchanged_text:
        text_cell = (b"u", None)
    elif row["text"] is None:
        text_cell = (b"n", None)
    elif binary_text:
        # logical records the decoder-canonical \x hex form; the wire
        # carries the raw bytes under a 'b' tag (with_binary mode)
        text_cell = (b"b", bytes.fromhex(row["text"][2:]))
    else:
        text_cell = (b"t", row["text"].encode())
    tup: codec.TupleData = [
        (b"t", row["conv_id"].encode()),
        (b"t", str(row["turn_idx"]).encode()),
        (b"t", row["role"].encode()) if row["role"] is not None else (b"n", None),
        text_cell,
        (b"t", row["tool"].encode()) if row["tool"] is not None else (b"n", None),
        (b"t", _fmt_ts(row["ts_us"])),
    ]
    if version >= 2:
        if dirty_score_mod and row["turn_idx"] % dirty_score_mod == 0:
            # deliberately unparseable int4 text — the upstream-producer
            # corruption the lenient consumer must dead-letter, not crash on
            # (FieldError analogue, deserializer.rs:617-691)
            tup.append((b"t", b"x" + str(row["turn_idx"]).encode()))
        else:
            # evolved column: deterministic small int payload
            tup.append((b"t", str(row["turn_idx"] % 5).encode()))
    return tup


def _key_tuple_for(row, version: int) -> codec.TupleData:
    ncols = len(RELATION_VERSIONS[version])
    tup: codec.TupleData = [
        (b"t", row["conv_id"].encode()),
        (b"t", str(row["turn_idx"]).encode()),
    ]
    tup.extend([(b"n", None)] * (ncols - 2))
    return tup


def encode_shard_frames(logical: pa.Table, spec: WalSpec, shard: int,
                        segment_rows: Optional[int] = None):
    """Encode one shard's logical ops into framed pgoutput bytes.

    Emits, per transaction: Begin .. DML .. Commit — or, for streamed txs,
    StreamStart .. DML(xid-prefixed) .. StreamStop then StreamCommit /
    StreamAbort (protocol v2+ framing, protocol.rs:161-185).  A Relation
    message precedes the first DML of each relation version
    (protocol.rs:1871-1879: "Relation precedes the first data row").
    Keepalives are interleaved every ``spec.keepalive_every`` frames.

    With ``segment_rows``, transaction-aligned segment break indices are
    also returned and Relation messages are RE-SENT at the start of every
    segment (exactly PostgreSQL's reconnect behavior) — each segment is
    self-describing, which is what makes segment-level resume pruning
    safe.  Returns ``frames_table`` or ``(frames_table, seg_breaks)``.
    """
    rows = logical.to_pylist()
    frames_lsn: List[int] = []
    frames: List[bytes] = []
    sent_versions = set()
    ka = spec.keepalive_every
    seg_breaks: List[int] = []
    rows_in_segment = 0

    def emit(lsn: int, msg_bytes: bytes) -> None:
        ts = unix_us_to_pg_ts(BASE_TS_US + lsn)
        frames_lsn.append(lsn)
        frames.append(encode_xlogdata(lsn, lsn, ts, msg_bytes))
        if ka and len(frames) % ka == 0:
            frames_lsn.append(lsn)
            frames.append(encode_keepalive(lsn, ts, False))

    i = 0
    n = len(rows)
    tx_counter = -1
    while i < n:
        tx_counter += 1
        if segment_rows and rows_in_segment >= segment_rows:
            seg_breaks.append(len(frames))
            sent_versions.clear()     # Relation re-send in the new segment
            rows_in_segment = 0
        xid = rows[i]["xid"]
        j = i
        while j < n and rows[j]["xid"] == xid:
            j += 1
        tx = rows[i:j]
        i = j
        first, last = tx[0], tx[-1]
        begin_lsn = first["lsn"] - 2
        commit_lsn = last["lsn"] + 1
        end_lsn = commit_lsn + 1
        commit_ts = unix_us_to_pg_ts(BASE_TS_US + commit_lsn)
        streamed = bool(first["streamed"])
        prepared = bool(first.get("prepared", False))
        stream_xid = (xid & 0xFFFFFFFF) if streamed else None
        xid32 = xid & 0xFFFFFFFF
        gid = f"gid-{xid32}"

        if streamed:
            emit(begin_lsn, codec.encode_message(
                codec.StreamStart(stream_xid, True)))
        elif prepared:
            # two-phase (protocol v3+): BeginPrepare opens, Prepare stages
            # at tx end, CommitPrepared/RollbackPrepared resolves
            # (protocol.rs:1135-1292).  The whole lifecycle stays inside
            # this transaction's frame run so tx-aligned segment breaks
            # keep every segment self-contained (parallel segment decode).
            emit(begin_lsn, codec.encode_message(
                codec.BeginPrepare(commit_lsn, end_lsn, commit_ts, xid32,
                                   gid)))
        else:
            # Begin is always emitted; an uncommitted tail tx simply never
            # gets its Commit (crash mid-transaction).
            emit(begin_lsn, codec.encode_message(
                codec.Begin(commit_lsn, commit_ts, xid & 0xFFFFFFFF)))

        if spec.origin_every_tx and tx_counter % spec.origin_every_tx == 0:
            # replication-origin marker: this tx originated elsewhere
            emit(begin_lsn, codec.encode_message(
                codec.Origin(begin_lsn, "upstream"),
                in_stream_xid=stream_xid))

        if spec.message_every_tx and tx_counter % spec.message_every_tx == 0:
            # transactional logical message (pg_logical_emit_message
            # analogue): rides inside the tx, released with its Commit
            emit(begin_lsn, codec.encode_message(
                codec.LogicalMessage(1, begin_lsn, "audit",
                                     f"tx={xid32}".encode()),
                in_stream_xid=stream_xid))

        for row in tx:
            ver = int(row["rel_version"])
            if ver not in sent_versions:
                emit(row["lsn"] - 1, codec.encode_message(
                    _relation_msg(ver), in_stream_xid=stream_xid))
                sent_versions.add(ver)
            op = row["op"]
            if op == "insert":
                m = codec.Insert(TRANSCRIPTS_OID, _tuple_for(
                    row, ver, False, spec.dirty_score_mod,
                    spec.binary_text))
            elif op == "update":
                m = codec.Update(TRANSCRIPTS_OID, b"K", _key_tuple_for(row, ver),
                                 _tuple_for(row, ver,
                                            bool(row["text_unchanged"]),
                                            spec.dirty_score_mod,
                                            spec.binary_text))
            elif op == "delete":
                m = codec.Delete(TRANSCRIPTS_OID, b"K", _key_tuple_for(row, ver))
            elif op == "truncate":
                m = codec.Truncate(0, [TRANSCRIPTS_OID])
            else:  # pragma: no cover
                raise ValueError(op)
            emit(row["lsn"], codec.encode_message(m, in_stream_xid=stream_xid))

        if streamed and prepared:
            # streamed two-phase: StreamPrepare stages the assembled stream
            # buffer, then CommitPrepared / RollbackPrepared resolves it
            emit(commit_lsn - 1, codec.encode_message(codec.StreamStop()))
            emit(commit_lsn, codec.encode_message(
                codec.StreamPrepare(0, commit_lsn, end_lsn, commit_ts,
                                    xid32, gid)))
            if first["aborted"]:
                emit(end_lsn, codec.encode_message(
                    codec.RollbackPrepared(0, end_lsn, end_lsn + 1,
                                           commit_ts, commit_ts, xid32, gid)))
            elif first["committed"]:
                emit(end_lsn, codec.encode_message(
                    codec.CommitPrepared(0, end_lsn, end_lsn + 1, commit_ts,
                                         xid32, gid)))
        elif streamed:
            emit(commit_lsn - 1, codec.encode_message(codec.StreamStop()))
            if first["aborted"]:
                emit(commit_lsn, codec.encode_message(
                    codec.StreamAbort(stream_xid, stream_xid,
                                      abort_lsn=commit_lsn, abort_ts=commit_ts)))
            elif first["committed"]:
                emit(commit_lsn, codec.encode_message(
                    codec.StreamCommit(stream_xid, 0, commit_lsn, end_lsn,
                                       commit_ts)))
        elif prepared:
            emit(commit_lsn, codec.encode_message(
                codec.Prepare(0, commit_lsn, end_lsn, commit_ts, xid32, gid)))
            if first["aborted"]:
                emit(end_lsn, codec.encode_message(
                    codec.RollbackPrepared(0, end_lsn, end_lsn + 1,
                                           commit_ts, commit_ts, xid32, gid)))
            elif first["committed"]:
                emit(end_lsn, codec.encode_message(
                    codec.CommitPrepared(0, end_lsn, end_lsn + 1, commit_ts,
                                         xid32, gid)))
        elif first["committed"]:
            emit(commit_lsn, codec.encode_message(
                codec.Commit(0, commit_lsn, end_lsn, commit_ts)))
        rows_in_segment += len(tx)

    tab = pa.table({
        "lsn": pa.array(frames_lsn, pa.int64()),
        "frame": pa.array(frames, pa.binary()),
    })
    if segment_rows is not None:
        return tab, seg_breaks
    return tab


def write_logical_shard(logical: pa.Table, spec: WalSpec, shard: int,
                        out_dir: str,
                        segment_frames: Optional[int] = None,
                        segment_base: int = 0) -> dict:
    """Encode + write one shard of an arbitrary logical change table
    (LOGICAL_SCHEMA): ``out_dir/shard=NNNN/wal.parquet`` + schema sidecar.

    With ``segment_frames`` the stream is split into ordered segment files
    ``wal-0000.parquet, wal-0001.parquet, ...`` — the WAL-archive layout
    that lets resume prune fully-applied segments via footer LSN stats
    without decoding them (pipelines/cdc.py).  ``segment_base`` offsets
    the segment numbering — the append hook for continuous-tailing
    fixtures that land later WAL into an archive a follower is already
    consuming (segments are self-describing, so a later batch encodes
    identically whether written up front or appended live).
    """
    import os
    import pyarrow.parquet as pq

    segment_frames = segment_frames or spec.segment_rows
    d = os.path.join(out_dir, f"shard={shard:04d}")
    os.makedirs(d, exist_ok=True)
    if segment_frames:
        # segment_frames is interpreted as LOGICAL ROWS per segment; breaks
        # are tx-aligned and every segment re-sends Relation messages
        frames, breaks = encode_shard_frames(logical, spec, shard,
                                             segment_rows=segment_frames)
        bounds = [0, *breaks, frames.num_rows]
        for seg, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            if hi <= lo:
                continue
            part = frames.slice(lo, hi - lo)
            name = f"wal-{segment_base + seg:04d}.parquet"
            tmp = os.path.join(d, f".{name}.tmp")
            pq.write_table(part, tmp, compression="zstd")
            os.replace(tmp, os.path.join(d, name))
    else:
        frames = encode_shard_frames(logical, spec, shard)
        tmp = os.path.join(d, ".wal.parquet.tmp")
        pq.write_table(frames, tmp, compression="zstd")
        os.replace(tmp, os.path.join(d, "wal.parquet"))

    # sidecar schema registry (fast path for the pipeline's pre-scan; the
    # stream itself stays self-describing via Relation messages)
    from ..stages.decode import relation_to_meta
    versions = sorted(set(logical["rel_version"].to_pylist()))
    metas = [relation_to_meta(_relation_msg(v), v, None) for v in versions]
    with open(os.path.join(d, "relations.json"), "w") as f:
        json.dump(metas, f)
    return {"shard": shard, "frames": frames.num_rows, "logical": logical}


def write_wal_shard(spec: WalSpec, shard: int, out_dir: str) -> dict:
    """Generate + encode + write one shard: ``out_dir/shard=NNNN/wal.parquet``.

    Returns shard stats. Pure function of (spec, shard) — safe to run as a
    Ray task, one task per shard (SURVEY.md §4: N source tasks).
    """
    logical = shard_logical_changes(spec, shard)
    r = write_logical_shard(logical, spec, shard, out_dir)
    return {"shard": shard, "frames": r["frames"],
            "dml_rows": int(pc.sum(pc.cast(pc.is_in(
                logical["op"], value_set=pa.array(["insert", "update", "delete"])),
                pa.int64())).as_py() or 0)}


def write_wal_lake(spec: WalSpec, out_dir: str, parallel: bool = True) -> List[dict]:
    """Materialize all shards of the synthetic WAL lake (+ spec.json)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "spec.json"), "w") as f:
        f.write(spec.to_json())
    if parallel and spec.n_shards > 1:
        import ray

        @ray.remote
        def _one(shard: int) -> dict:
            return write_wal_shard(spec, shard, out_dir)

        return ray.get([_one.remote(s) for s in range(spec.n_shards)])
    return [write_wal_shard(spec, s, out_dir) for s in range(spec.n_shards)]
