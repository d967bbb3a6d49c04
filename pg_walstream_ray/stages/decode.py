"""Decode stage: pgoutput frames -> Arrow change-event batches.

Reference parity:
  - ``PgOutputDecoder`` offline decode (no connection): /root/reference/src/protocol.rs:1880-1932
  - ``message_to_change_event`` core (relation cache, schema-diff detection,
    unknown-relation drop): protocol.rs:1415-1869
  - transaction buffering until Commit (commit-complete release): the
    safe-transaction-consumer contract, examples/safe-transaction-consumer/src/main.rs:84-206
  - streamed-transaction assembly + abort discard: protocol.rs:744-758, 1055-1133
  - bounded replay (stop at first commit with end_lsn >= target, crossing tx
    delivered in full): stream.rs:362-387, 646-694

Parallelism model (SURVEY.md §4): the WAL is N independent ordered shards;
one sequential decoder per shard, shards decoded concurrently.  Within a
shard the decoder is an ordered state machine (relation cache + in-flight
transaction buffers); across shards there is no shared state.  Decoded
output is the fixed, schema-stable *envelope*: payload tuples ride as
``list<string>`` columns plus an ``unchanged_mask``; typed projection to the
transcripts schema happens vectorized in stages/typed.py using the relation
registry carried in-band as ``op='relation'`` rows.
"""

from __future__ import annotations

import json
import logging
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..wire import codec
from ..wire.frames import (
    frame_kind,
    parse_keepalive,
    parse_xlogdata_header,
    pg_ts_to_unix_us,
    XLOGDATA_HEADER_LEN,
)

logger = logging.getLogger(__name__)

ENVELOPE_SCHEMA = pa.schema([
    ("source", pa.int32()),            # WAL shard / slot id: each source is
                                       # an independent ordered LSN space
    ("lsn", pa.int64()),
    ("commit_lsn", pa.int64()),
    ("commit_ts_us", pa.int64()),      # unix micros
    ("xid", pa.int64()),
    ("op", pa.string()),               # insert|update|delete|truncate|relation|message|origin|type
    ("rel_oid", pa.int32()),
    ("rel_version", pa.int32()),
    ("schema_name", pa.string()),
    ("table_name", pa.string()),
    ("key_type", pa.string()),         # 'K' | 'O' | ''
    ("before_values", pa.list_(pa.string())),
    ("after_values", pa.list_(pa.string())),
    ("unchanged_mask", pa.list_(pa.bool_())),   # True where column tag was 'u'
    ("meta", pa.string()),             # JSON side-channel (relation schema, truncate info)
])

_DML_OPS = ("insert", "update", "delete")


def _tuple_to_lists(tup: Optional[codec.TupleData]):
    """TupleData -> (values list[bytes|None], unchanged list[bool]).

    'n' -> None, 't' -> raw utf8 bytes (decoded to Arrow string in ONE
    vectorized cast at take_batch, not per value), 'b' -> pg hex bytea text
    form ('\\x…', column_value.rs:17-56), 'u' -> None + unchanged flag
    (TupleData::into_row_data TOAST skip, protocol.rs:310-328).
    """
    if tup is None:
        return None, None
    vals: List[Optional[bytes]] = []
    unchanged: List[bool] = []
    for tag, v in tup:
        if tag == b"t":
            vals.append(v)
            unchanged.append(False)
        elif tag == b"n":
            vals.append(None)
            unchanged.append(False)
        elif tag == b"u":
            vals.append(None)
            unchanged.append(True)
        else:  # b'b' binary -> hex text form
            vals.append(b"\\x" + v.hex().encode())
            unchanged.append(False)
    return vals, unchanged


def _list_column(rows, value_type, cast_to=None) -> pa.Array:
    """Build list<value_type> from python lists-of-scalars via flat +
    offsets (ListArray.from_arrays) — much cheaper than pa.array's nested
    per-element inference over 10^5+ rows.  ``rows`` items may be None
    (null list)."""
    flat: list = []
    offsets = np.empty(len(rows) + 1, dtype=np.int32)
    offsets[0] = 0
    validity = np.ones(len(rows), dtype=bool)
    for i, r in enumerate(rows):
        if r is None:
            validity[i] = False
        else:
            flat.extend(r)
        offsets[i + 1] = len(flat)
    arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(flat, value_type),
        mask=pa.array(~validity))
    if cast_to is not None:
        arr = arr.cast(cast_to)
    return arr


def relation_to_meta(rel: codec.Relation, version: int, diff: Optional[dict]) -> str:
    return json.dumps({
        "oid": rel.oid,
        "version": version,
        "namespace": rel.namespace,
        "name": rel.name,
        "replica_identity": rel.replica_identity,
        "columns": [
            {"name": c.name, "type_oid": c.type_oid,
             "type_modifier": c.type_modifier, "is_key": bool(c.flags & 1)}
            for c in rel.columns
        ],
        "diff": diff,
    })


def relation_diff(old: codec.Relation, new: codec.Relation) -> Optional[dict]:
    """Full column diff (name/type_oid/type_modifier/is_key + table-level
    fields), mirroring protocol.rs:1430-1443. None means identical."""
    changes: List[dict] = []
    if (old.namespace, old.name, old.replica_identity) != \
            (new.namespace, new.name, new.replica_identity):
        changes.append({"kind": "table_meta"})
    n_old, n_new = len(old.columns), len(new.columns)
    for i in range(max(n_old, n_new)):
        if i >= n_old:
            changes.append({"kind": "add_column", "index": i,
                            "name": new.columns[i].name})
        elif i >= n_new:
            changes.append({"kind": "drop_column", "index": i,
                            "name": old.columns[i].name})
        else:
            oc, nc = old.columns[i], new.columns[i]
            if oc.name != nc.name:
                changes.append({"kind": "rename_column", "index": i,
                                "from": oc.name, "to": nc.name})
            if oc.type_oid != nc.type_oid:
                changes.append({"kind": "retype_column", "index": i,
                                "name": nc.name, "from_oid": oc.type_oid,
                                "to_oid": nc.type_oid})
            if (oc.flags & 1) != (nc.flags & 1):
                changes.append({"kind": "key_change", "index": i, "name": nc.name})
    return changes or None


class PgOutputDecoder:
    """Sequential decoder for ONE ordered pgoutput frame stream.

    ``feed_frames(frames)`` consumes framed bytes in order and returns
    envelope rows released at commit boundaries only (commit-complete).
    State: relation cache, per-xid transaction buffers (plain + streamed),
    LSN watermarks, bounded-replay stop rule.
    """

    def __init__(self, stop_at_lsn: Optional[int] = None,
                 emit_control_rows: bool = True,
                 collect_dml: bool = True,
                 source: int = 0,
                 version_map: Optional[Dict[tuple, int]] = None,
                 origin_filter: str = "any"):
        # origin_filter: pgoutput `origin` slot option parity
        # (sql_builder.rs:380-407 option list): "any" keeps every tx;
        # "none" discards transactions that carry an Origin ('O') message
        # — i.e. changes replicated FROM another node — the loop-avoidance
        # filter of bidirectional replication.
        self.origin_filter = origin_filter
        self._tx_foreign = False
        self._foreign_streams: set = set()
        # version_map: relation fingerprint -> GLOBAL version id (from
        # SchemaRegistry.version_map()).  Keeps rel_version numbering
        # consistent across decoders that each see only a slice of the
        # Relation stream (segment-parallel replay of a segmented archive);
        # unmapped relations fall back to local arrival-order numbering.
        self.version_map = version_map or {}
        # collect_dml=False turns this into a control-plane-only scan
        # (relation/commit bookkeeping without materializing DML rows) —
        # used by the registry pre-scan fallback when no sidecar exists.
        self.collect_dml = collect_dml
        # source = shard/slot id. Exactly-once watermarks are tracked PER
        # SOURCE because each slot owns an independent monotone LSN space
        # (the reference's single-stream watermark, vectorized over slots).
        self.source = source
        self.relations: Dict[int, codec.Relation] = {}
        self.rel_versions: Dict[int, int] = {}
        self._relmeta: Dict[int, tuple] = {}   # oid -> (version, ns, name)
        self._next_version = 1
        self.tx_buf: List[tuple] = []          # current plain transaction
        self.tx_xid: Optional[int] = None
        self.stream_bufs: Dict[int, List[tuple]] = {}
        # two-phase (v3+): gid -> staged rows; Prepare stages, CommitPrepared
        # publishes, RollbackPrepared discards (protocol.rs:1135-1292)
        self.prepared: Dict[str, List[tuple]] = {}
        self.in_stream_xid: Optional[int] = None
        self.last_received_lsn = 0
        self.last_commit_lsn = 0
        self.stop_at_lsn = stop_at_lsn
        self.stopped = False
        self.unknown_relation_drops = 0
        self.emit_control_rows = emit_control_rows
        self._released: List[tuple] = []       # 12-tuples (no commit cols)
        self._commit_runs: List[tuple] = []    # (n_rows, commit_lsn, ts)

    def seed_relations(self, metas: List[str]) -> None:
        """Pre-load the relation cache from registry metadata (the JSON
        form of relation_to_meta).  Needed when replay starts past the
        segment that carried the Relation frames (segment pruning): the
        stream is self-describing, but a pruned prefix isn't re-read."""
        max_ver = 0
        for m in metas:
            d = json.loads(m)
            cols = [codec.ColumnInfo(
                (1 if c["is_key"] else 0), c["name"], c["type_oid"],
                c["type_modifier"]) for c in d["columns"]]
            rel = codec.Relation(d["oid"], d["namespace"], d["name"],
                                 d["replica_identity"], cols)
            ver = int(d["version"])
            self.relations[d["oid"]] = rel
            self.rel_versions[d["oid"]] = ver
            self._relmeta[d["oid"]] = (ver, d["namespace"], d["name"])
            max_ver = max(max_ver, ver)
        self._next_version = max(self._next_version, max_ver + 1)

    # -- row assembly ------------------------------------------------------

    def _mk_row(self, lsn: int, xid: int, op: str, rel_oid: int = 0,
                key_type: str = "", before=None, after=None,
                unchanged=None, meta: Optional[str] = None) -> tuple:
        # (version, namespace, name) cached per oid — one dict hit per row
        ver, ns, name = self._relmeta.get(rel_oid, (0, "", ""))
        return (lsn, xid, op, rel_oid, ver, ns, name,
                key_type, before, after, unchanged, meta)

    def _release_tx(self, rows: List[tuple], commit_lsn: int,
                    commit_ts_us: int) -> None:
        # rows stay as 12-tuples; commit metadata rides as a run-length
        # entry — no per-row tuple re-allocation on release
        self.last_commit_lsn = commit_lsn
        if rows:
            self._released.extend(rows)
            self._commit_runs.append((len(rows), commit_lsn, commit_ts_us))

    # -- frame pump --------------------------------------------------------

    def feed_frames(self, frames: List[bytes]) -> None:
        """Consume frames in order; released rows accumulate internally.
        Hot loop: header fields are unpacked inline (only wal_start is
        needed) and DML bodies are parsed in place without a body copy."""
        u64 = codec._u64
        dispatch_fast = self._dispatch_dml_fast
        collect = self.collect_dml
        for f in frames:
            if self.stopped:
                break
            if f[0] == 107:                     # 'k' keepalive
                wal_end, _ts, _reply = parse_keepalive(f)
                if wal_end > self.last_received_lsn:
                    self.last_received_lsn = wal_end
                continue
            (wal_start,) = u64.unpack_from(f, 1)
            if wal_start > self.last_received_lsn:
                self.last_received_lsn = wal_start
            tag0 = f[XLOGDATA_HEADER_LEN]
            if collect and tag0 in (73, 85, 68):          # I / U / D
                dispatch_fast(f, wal_start, XLOGDATA_HEADER_LEN)
            else:
                self._dispatch(f[XLOGDATA_HEADER_LEN:], wal_start)

    # -- DML fast path -----------------------------------------------------
    # Insert/Update/Delete are ~90% of frames; parse their tuples straight
    # into (values, unchanged) lists in ONE pass, skipping the codec's
    # dataclass round-trip (TupleData tuples + message object + re-walk).
    # Control messages still go through codec.parse_message.

    @staticmethod
    def _tuple_fast(buf: bytes, off: int):
        (ncols,) = codec._u16.unpack_from(buf, off)
        off += 2
        vals: List[Optional[bytes]] = []
        unch: List[bool] = []
        vappend = vals.append
        uappend = unch.append
        u32 = codec._u32
        for _ in range(ncols):
            tag = buf[off]
            off += 1
            if tag == 116:                     # 't'
                (ln,) = u32.unpack_from(buf, off)
                off += 4
                vappend(buf[off:off + ln])
                off += ln
                uappend(False)
            elif tag == 110:                   # 'n'
                vappend(None)
                uappend(False)
            elif tag == 117:                   # 'u' unchanged TOAST
                vappend(None)
                uappend(True)
            elif tag == 98:                    # 'b' binary -> hex text form
                (ln,) = u32.unpack_from(buf, off)
                off += 4
                vappend(b"\\x" + buf[off:off + ln].hex().encode())
                off += ln
                uappend(False)
            else:
                raise ValueError(f"bad tuple tag {tag!r}")
        return vals, unch, off

    def _dispatch_dml_fast(self, body: bytes, lsn: int,
                           base: int = 0) -> bool:
        """Returns True if handled (I/U/D of a known relation).  ``base``
        lets the caller pass the whole frame without slicing the body."""
        tag = body[base]
        off = base + 1
        stream_xid = None
        if self.in_stream_xid is not None:
            (stream_xid,) = codec._u32.unpack_from(body, off)
            off += 4
        (oid,) = codec._u32.unpack_from(body, off)
        off += 4
        if not self._known(oid):
            return True                        # known-drop, handled
        xid = stream_xid or self.tx_xid or 0
        if tag == 73:                          # 'I'
            vals, unch, _ = self._tuple_fast(body, off + 1)
            row = self._mk_row(lsn, xid, "insert", oid, "", None, vals, unch)
        elif tag == 85:                        # 'U'
            marker = body[off]
            bvals = None
            kt = ""
            if marker in (75, 79):             # 'K' | 'O'
                kt = chr(marker)
                bvals, _b, off2 = self._tuple_fast(body, off + 1)
                off = off2
                marker = body[off]
            vals, unch, _ = self._tuple_fast(body, off + 1)
            row = self._mk_row(lsn, xid, "update", oid, kt, bvals, vals, unch)
        else:                                  # 'D'
            kt = chr(body[off])
            bvals, _b, _ = self._tuple_fast(body, off + 1)
            row = self._mk_row(lsn, xid, "delete", oid, kt, bvals, None, None)
        self._buffer(stream_xid, row)
        return True

    def _dispatch(self, body: bytes, lsn: int) -> None:
        if self.collect_dml and body[0] in (73, 85, 68):  # I / U / D
            self._dispatch_dml_fast(body, lsn)
            return
        in_stream = self.in_stream_xid is not None
        msg, stream_xid = codec.parse_message(body, in_stream=in_stream)
        t = type(msg)

        if t is codec.Begin:
            self.tx_xid = msg.xid
            self.tx_buf = []
            self._tx_foreign = False
            return
        if t is codec.Commit:
            rows, self.tx_buf, self.tx_xid = self.tx_buf, [], None
            if self._tx_foreign:
                # origin='none': the whole foreign-originated tx vanishes;
                # the commit still advances the watermark (our LSN space)
                rows = []
                self._tx_foreign = False
            self._release_tx(rows, msg.commit_lsn,
                             pg_ts_to_unix_us(msg.commit_ts))
            if self.stop_at_lsn is not None and msg.end_lsn >= self.stop_at_lsn:
                self.stopped = True
            return
        if t is codec.StreamStart:
            self.in_stream_xid = msg.xid
            self.stream_bufs.setdefault(msg.xid, [])
            return
        if t is codec.StreamStop:
            self.in_stream_xid = None
            return
        if t is codec.StreamCommit:
            rows = self.stream_bufs.pop(msg.xid, [])
            if msg.xid in self._foreign_streams:
                self._foreign_streams.discard(msg.xid)
                rows = []
            self._release_tx(rows, msg.commit_lsn,
                             pg_ts_to_unix_us(msg.commit_ts))
            if self.stop_at_lsn is not None and msg.end_lsn >= self.stop_at_lsn:
                self.stopped = True
            return
        if t is codec.StreamAbort:
            # aborted streamed tx: discard entirely (protocol.rs:1105-1133)
            self.stream_bufs.pop(msg.xid, None)
            self._foreign_streams.discard(msg.xid)
            return
        if t is codec.BeginPrepare:
            # opens a to-be-prepared transaction; DML buffers under its xid
            self.tx_xid = msg.xid
            self.tx_buf = []
            return
        if t is codec.Prepare:
            # stage: buffered rows move to the gid ledger, NOT released —
            # exactly-once requires publish only at CommitPrepared
            rows, self.tx_buf, self.tx_xid = self.tx_buf, [], None
            if self._tx_foreign:
                rows = []
                self._tx_foreign = False
            self.prepared[msg.gid] = rows
            return
        if t is codec.StreamPrepare:
            # streamed variant: the assembled stream buffer becomes staged
            rows = self.stream_bufs.pop(msg.xid, [])
            if msg.xid in self._foreign_streams:
                self._foreign_streams.discard(msg.xid)
                rows = []
            self.prepared[msg.gid] = rows
            return
        if t is codec.CommitPrepared:
            # publish the staged transaction at its commit LSN; a gid
            # prepared before our replay window started resolves to nothing
            rows = self.prepared.pop(msg.gid, [])
            self._release_tx(rows, msg.commit_lsn,
                             pg_ts_to_unix_us(msg.commit_ts))
            if self.stop_at_lsn is not None and msg.end_lsn >= self.stop_at_lsn:
                self.stopped = True
            return
        if t is codec.RollbackPrepared:
            self.prepared.pop(msg.gid, None)
            return
        if t is codec.Relation:
            old = self.relations.get(msg.oid)
            diff = relation_diff(old, msg) if old is not None else None
            if old is None or diff is not None:
                self.relations[msg.oid] = msg
                version = self._next_version
                if self.version_map:
                    from ..state.schema_registry import relation_fingerprint

                    fp = relation_fingerprint(
                        msg.oid, msg.namespace, msg.name,
                        msg.replica_identity,
                        ((c.name, c.type_oid, c.type_modifier,
                          bool(c.flags & 1)) for c in msg.columns))
                    version = self.version_map.get(fp, version)
                self.rel_versions[msg.oid] = version
                self._relmeta[msg.oid] = (version, msg.namespace, msg.name)
                self._next_version = max(self._next_version, version) + 1
                if self.emit_control_rows:
                    # schema-change events release immediately (not tx-buffered):
                    # downstream needs them before the rows that use them.
                    meta = relation_to_meta(msg, version, diff)
                    self._released.append(self._mk_row(
                        lsn, stream_xid or self.tx_xid or 0, "relation",
                        msg.oid, meta=meta))
                    self._commit_runs.append((1, lsn, 0))
            return
        if t in (codec.PgType, codec.Origin, codec.LogicalMessage):
            if t is codec.Origin and self.origin_filter == "none":
                # Origin marks this tx as replicated from another node:
                # with origin='none' its entire change set is discarded at
                # the closing boundary (Commit/Prepare/StreamCommit).
                # Inside a stream segment 'O' carries no xid prefix — the
                # segment's open xid identifies the tx.
                sx = stream_xid if stream_xid is not None \
                    else self.in_stream_xid
                if sx is not None:
                    self._foreign_streams.add(sx)
                else:
                    self._tx_foreign = True
            if self.emit_control_rows:
                if t is codec.LogicalMessage:
                    meta = json.dumps({"prefix": msg.prefix, "flags": msg.flags,
                                       "content_hex": msg.content.hex()})
                    op = "message"
                elif t is codec.Origin:
                    meta = json.dumps({"name": msg.name,
                                       "commit_lsn": msg.commit_lsn})
                    op = "origin"
                else:
                    meta = json.dumps({"oid": msg.oid, "namespace": msg.namespace,
                                       "name": msg.name})
                    op = "type"
                # 'O'/'Y' carry no xid prefix even inside stream segments —
                # the segment's open xid owns them (else they'd leak into
                # the plain tx buffer and outlive the stream)
                sx = stream_xid if stream_xid is not None \
                    else self.in_stream_xid
                self._buffer(sx, self._mk_row(
                    lsn, sx or self.tx_xid or 0, op, meta=meta))
            return

        # DML + truncate
        if not self.collect_dml:
            return
        if t is codec.Insert:
            if not self._known(msg.relation_oid):
                return
            vals, unch = _tuple_to_lists(msg.new_tuple)
            row = self._mk_row(lsn, stream_xid or self.tx_xid or 0, "insert",
                               msg.relation_oid, "", None, vals, unch)
        elif t is codec.Update:
            if not self._known(msg.relation_oid):
                return
            bvals, _bunch = _tuple_to_lists(msg.old_tuple)
            avals, aunch = _tuple_to_lists(msg.new_tuple)
            kt = msg.key_type.decode() if msg.key_type else ""
            row = self._mk_row(lsn, stream_xid or self.tx_xid or 0, "update",
                               msg.relation_oid, kt, bvals, avals, aunch)
        elif t is codec.Delete:
            if not self._known(msg.relation_oid):
                return
            bvals, _bunch = _tuple_to_lists(msg.old_tuple)
            row = self._mk_row(lsn, stream_xid or self.tx_xid or 0, "delete",
                               msg.relation_oid, msg.key_type.decode(),
                               bvals, None, None)
        elif t is codec.Truncate:
            meta = json.dumps({"options": msg.options, "oids": msg.relation_oids})
            # one truncate row per targeted relation
            for oid in msg.relation_oids:
                self._buffer(stream_xid, self._mk_row(
                    lsn, stream_xid or self.tx_xid or 0, "truncate", oid,
                    meta=meta))
            return
        else:
            # two-phase (Prepare family) minimal handling: treat
            # CommitPrepared as releasing nothing here (no staged support yet)
            return
        self._buffer(stream_xid, row)

    def _known(self, oid: int) -> bool:
        # data rows for an unknown relation: drop with a warning, not an
        # error (protocol.rs:1502-1505)
        if oid in self.relations:
            return True
        self.unknown_relation_drops += 1
        if self.unknown_relation_drops <= 3:
            logger.warning("dropping DML for unknown relation oid=%d", oid)
        return False

    def _buffer(self, stream_xid: Optional[int], row: tuple) -> None:
        if stream_xid is not None:
            self.stream_bufs.setdefault(stream_xid, []).append(row)
        else:
            self.tx_buf.append(row)

    # -- output ------------------------------------------------------------

    def take_batch(self) -> Optional[pa.RecordBatch]:
        """Drain released rows into one envelope RecordBatch (or None)."""
        rows = self._released
        if not rows:
            return None
        runs = self._commit_runs
        self._released = []
        self._commit_runs = []
        cols = list(zip(*rows))
        # row layout: (lsn, xid, op, rel_oid, rel_version, schema, table,
        #              key_type, before, after, unchanged, meta); commit
        #              metadata reconstructed from run-lengths
        n = len(rows)
        lens = np.fromiter((r[0] for r in runs), dtype=np.int64,
                           count=len(runs))
        commit_lsn = np.repeat(np.fromiter((r[1] for r in runs),
                                           dtype=np.int64, count=len(runs)),
                               lens)
        commit_ts = np.repeat(np.fromiter((r[2] for r in runs),
                                          dtype=np.int64, count=len(runs)),
                              lens)
        lstr = pa.list_(pa.string())
        arrays = [
            pa.array(np.full(n, self.source, dtype=np.int32)),   # source
            pa.array(cols[0], pa.int64()),       # lsn
            pa.array(commit_lsn),                # commit_lsn
            pa.array(commit_ts),                 # commit_ts_us
            pa.array(cols[1], pa.int64()),       # xid
            pa.array(cols[2], pa.string()),      # op
            pa.array(cols[3], pa.int32()),       # rel_oid
            pa.array(cols[4], pa.int32()),       # rel_version
            pa.array(cols[5], pa.string()),      # schema_name
            pa.array(cols[6], pa.string()),      # table_name
            pa.array(cols[7], pa.string()),      # key_type
            # tuple payloads: bytes kept raw until here, then ONE vectorized
            # binary->string cast per column (utf8 validated by Arrow)
            _list_column(cols[8], pa.binary(), lstr),   # before_values
            _list_column(cols[9], pa.binary(), lstr),   # after_values
            _list_column(cols[10], pa.bool_()),         # unchanged_mask
            pa.array(cols[11], pa.string()),     # meta
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=ENVELOPE_SCHEMA)


def decode_frames(frames: List[bytes],
                  stop_at_lsn: Optional[int] = None) -> pa.Table:
    """One-shot offline decode of an ordered frame list (test convenience,
    shape of PgOutputDecoder usage in protocol.rs:1918-1925)."""
    dec = PgOutputDecoder(stop_at_lsn=stop_at_lsn)
    dec.feed_frames(frames)
    b = dec.take_batch()
    return pa.Table.from_batches([b] if b else [], schema=ENVELOPE_SCHEMA)


class DecodeShard:
    """Ray Data stage: shard descriptor row -> stream of envelope batches.

    Used as ``ds_of_shards.map_batches(DecodeShard(...), batch_size=1,
    batch_format='pyarrow')`` with one input row per WAL shard.  The shard's
    frame parquet is streamed row-group by row-group through a sequential
    ``PgOutputDecoder`` (ordering is per-shard, the semantic requirement),
    yielding commit-complete Arrow batches with bounded memory.  Parallelism
    comes from decoding many shards at once, matching the reference's
    "scale by running concurrent streams/slots" model (lib.rs:43-51).
    """

    def __init__(self, stop_at_lsn: Optional[int] = None,
                 out_batch_rows: int = 16384,
                 prune_below: Optional[Dict[int, int]] = None,
                 relation_metas: Optional[List[str]] = None,
                 version_map: Optional[Dict[tuple, int]] = None,
                 origin_filter: str = "any"):
        self.origin_filter = origin_filter
        self.stop_at_lsn = stop_at_lsn
        self.out_batch_rows = out_batch_rows
        self.version_map = version_map
        # prune_below[source] = commit LSN below-or-at which every
        # partition has durably applied — segments whose footer max(lsn)
        # is <= it are skipped WITHOUT decoding (resume must not re-read
        # 10^10 already-applied events).  Requires relation_metas so the
        # relation cache survives a pruned prefix.
        self.prune_below = prune_below or {}
        self.relation_metas = relation_metas or []
        self.segments_pruned = 0

    @staticmethod
    def source_of(path: str) -> int:
        """shard id from .../shard=NNNN/wal*.parquet path."""
        import re

        m = re.search(r"shard=(\d+)", path)
        return int(m.group(1)) if m else 0

    @staticmethod
    def _segment_max_lsn(pf) -> Optional[int]:
        """max(lsn) from parquet footer stats (no data read)."""
        md = pf.metadata
        idx = pf.schema_arrow.get_field_index("lsn")
        mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            mx = st.max if mx is None else max(mx, st.max)
        return mx

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        import pyarrow.parquet as pq

        col = "wal_paths" if "wal_paths" in batch.column_names else "wal_path"
        for entry in batch[col].to_pylist():
            segments = entry if isinstance(entry, list) else [entry]
            source = self.source_of(segments[0])
            dec = PgOutputDecoder(stop_at_lsn=self.stop_at_lsn,
                                  source=source,
                                  version_map=self.version_map,
                                  origin_filter=self.origin_filter)
            if self.relation_metas:
                dec.seed_relations(self.relation_metas)
            wm = self.prune_below.get(source, -1)
            pending: List[pa.RecordBatch] = []
            pending_rows = 0
            for path in segments:
                if dec.stopped:
                    break
                pf = pq.ParquetFile(path)
                if wm >= 0:
                    mx = self._segment_max_lsn(pf)
                    if mx is not None and mx <= wm:
                        self.segments_pruned += 1
                        continue          # fully applied everywhere: skip
                import os as _os
                if self.stop_at_lsn is None and not _os.environ.get(
                        "PGWR_NO_VDECODE"):
                    # vectorized fast path: whole-segment numpy decode
                    # (~5-10x the scalar state machine); falls back below
                    # on anything outside the hot profile (vdecode.py)
                    from .vdecode import try_decode_segment

                    vout = try_decode_segment(
                        dec, pf.read(columns=["frame"])["frame"],
                        out_batch_rows=self.out_batch_rows)
                    if vout is not None:
                        for rb in vout:
                            pending.append(rb)
                            pending_rows += rb.num_rows
                            if pending_rows >= self.out_batch_rows:
                                yield pa.Table.from_batches(
                                    pending, schema=ENVELOPE_SCHEMA)
                                pending, pending_rows = [], 0
                        continue
                for rg in range(pf.num_row_groups):
                    frames = pf.read_row_group(rg, columns=["frame"])["frame"]
                    dec.feed_frames(frames.to_pylist())
                    out = dec.take_batch()
                    if out is not None:
                        pending.append(out)
                        pending_rows += out.num_rows
                    if pending_rows >= self.out_batch_rows:
                        yield pa.Table.from_batches(pending,
                                                    schema=ENVELOPE_SCHEMA)
                        pending, pending_rows = [], 0
                    if dec.stopped:
                        break
            if pending:
                yield pa.Table.from_batches(pending, schema=ENVELOPE_SCHEMA)
