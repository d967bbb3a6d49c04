"""pgoutput logical-replication message codec (encode + parse).

A from-scratch Python implementation of the PostgreSQL ``pgoutput``
logical-decoding output plugin's message formats (protocol versions 1-4),
as published in the PostgreSQL documentation ("Logical Streaming Replication
Protocol" / "Logical Replication Message Formats").

Parity targets in the reference (/root/reference, isdaniel/pg-walstream):
  - message parse:  src/protocol.rs:698-1325  (``parse_wal_message`` + per-type)
  - message encode: src/pgoutput_encode/ (byte-faithful inverse; the reference
    proves ``parse(encode(m)) == m`` and ``encode(parse(b)) == b``)
  - tuple tags 'n'/'t'/'b'/'u': src/protocol.rs:1294-1325
  - streaming xid prefix (v2+): src/protocol.rs:744-780

Everything is big-endian, per the PostgreSQL wire protocol.  Values travel
as text by default (pgoutput text mode); ``b`` tags carry binary.  This
module is pure (no I/O, no Ray) so it unit-tests without a cluster — the
same property the reference exploits with ``PgOutputDecoder``
(src/protocol.rs:1880-1932).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# ---------------------------------------------------------------------------
# Message dataclasses (mirror of the reference's LogicalReplicationMessage
# enum, src/protocol.rs:94-237 — 19 variants).
# ---------------------------------------------------------------------------


@dataclass
class Begin:
    final_lsn: int
    commit_ts: int  # microseconds since 2000-01-01 (Postgres epoch)
    xid: int


@dataclass
class Commit:
    flags: int
    commit_lsn: int
    end_lsn: int
    commit_ts: int


@dataclass
class ColumnInfo:
    # flags bit0 = part of the key (replica identity)
    flags: int
    name: str
    type_oid: int
    type_modifier: int


@dataclass
class Relation:
    oid: int
    namespace: str
    name: str
    replica_identity: str  # 'd' | 'n' | 'f' | 'i'
    columns: List[ColumnInfo] = field(default_factory=list)


@dataclass
class PgType:
    oid: int
    namespace: str
    name: str


@dataclass
class Origin:
    commit_lsn: int
    name: str


@dataclass
class LogicalMessage:
    flags: int
    lsn: int
    prefix: str
    content: bytes


# TupleData: list of (tag, value). tag in b'n' null / b'u' unchanged-TOAST /
# b't' text / b'b' binary. value is bytes for t/b, None for n/u.
TupleData = List[Tuple[bytes, Optional[bytes]]]


@dataclass
class Insert:
    relation_oid: int
    new_tuple: TupleData


@dataclass
class Update:
    relation_oid: int
    # key_type: b'K' (replica-identity key old tuple), b'O' (full old tuple),
    # or None (no old tuple present)
    key_type: Optional[bytes]
    old_tuple: Optional[TupleData]
    new_tuple: TupleData


@dataclass
class Delete:
    relation_oid: int
    key_type: bytes  # b'K' or b'O'
    old_tuple: TupleData


@dataclass
class Truncate:
    options: int  # bit0 CASCADE, bit1 RESTART IDENTITY
    relation_oids: List[int]


@dataclass
class StreamStart:
    xid: int
    first_segment: bool


@dataclass
class StreamStop:
    pass


@dataclass
class StreamCommit:
    xid: int
    flags: int
    commit_lsn: int
    end_lsn: int
    commit_ts: int


@dataclass
class StreamAbort:
    xid: int
    subtransaction_xid: int
    # protocol v4 additions (streaming=parallel)
    abort_lsn: Optional[int] = None
    abort_ts: Optional[int] = None


@dataclass
class BeginPrepare:
    prepare_lsn: int
    end_lsn: int
    prepare_ts: int
    xid: int
    gid: str


@dataclass
class Prepare:
    flags: int
    prepare_lsn: int
    end_lsn: int
    prepare_ts: int
    xid: int
    gid: str


@dataclass
class CommitPrepared:
    flags: int
    commit_lsn: int
    end_lsn: int
    commit_ts: int
    xid: int
    gid: str


@dataclass
class RollbackPrepared:
    flags: int
    prepare_end_lsn: int
    rollback_end_lsn: int
    prepare_ts: int
    rollback_ts: int
    xid: int
    gid: str


@dataclass
class StreamPrepare:
    flags: int
    prepare_lsn: int
    end_lsn: int
    prepare_ts: int
    xid: int
    gid: str


# Tags for messages that, inside a streamed transaction (protocol v2+),
# carry a 4-byte xid immediately after the tag byte.
_XID_PREFIXED_TAGS = frozenset(b"RYIUDTM")

_u32 = struct.Struct(">I")
_u16 = struct.Struct(">H")
_u64 = struct.Struct(">Q")
_i64 = struct.Struct(">q")
_i32 = struct.Struct(">i")


def _cstr_encode(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def _cstr_decode(buf: bytes, off: int) -> Tuple[str, int]:
    end = buf.index(0, off)
    return buf[off:end].decode("utf-8"), end + 1


# ---------------------------------------------------------------------------
# Encoding (the WAL synthesizer's backbone — reference parity:
# src/pgoutput_encode/mod.rs:33 encode_message)
# ---------------------------------------------------------------------------


def encode_tuple(tup: TupleData) -> bytes:
    parts = [_u16.pack(len(tup))]
    for tag, val in tup:
        if tag in (b"n", b"u"):
            parts.append(tag)
        elif tag in (b"t", b"b"):
            parts.append(tag)
            parts.append(_u32.pack(len(val)))
            parts.append(val)
        else:  # pragma: no cover - generator never emits bad tags
            raise ValueError(f"bad tuple tag {tag!r}")
    return b"".join(parts)


def encode_message(msg, in_stream_xid: Optional[int] = None) -> bytes:
    """Encode one logical replication message to pgoutput wire bytes.

    ``in_stream_xid`` non-None emits the v2+ streamed-transaction xid prefix
    for the message types that carry it (reference: encode_streaming_message,
    src/pgoutput_encode/mod.rs:218).
    """
    t = type(msg)
    if t is Begin:
        return b"B" + _u64.pack(msg.final_lsn) + _i64.pack(msg.commit_ts) + _u32.pack(msg.xid)
    if t is Commit:
        return (b"C" + bytes([msg.flags]) + _u64.pack(msg.commit_lsn)
                + _u64.pack(msg.end_lsn) + _i64.pack(msg.commit_ts))
    xid_prefix = b""
    if in_stream_xid is not None:
        xid_prefix = _u32.pack(in_stream_xid)
    if t is Relation:
        cols = b"".join(
            bytes([c.flags]) + _cstr_encode(c.name) + _u32.pack(c.type_oid)
            + _i32.pack(c.type_modifier)
            for c in msg.columns
        )
        return (b"R" + xid_prefix + _u32.pack(msg.oid) + _cstr_encode(msg.namespace)
                + _cstr_encode(msg.name) + msg.replica_identity.encode()
                + _u16.pack(len(msg.columns)) + cols)
    if t is PgType:
        return (b"Y" + xid_prefix + _u32.pack(msg.oid) + _cstr_encode(msg.namespace)
                + _cstr_encode(msg.name))
    if t is Origin:
        return b"O" + _u64.pack(msg.commit_lsn) + _cstr_encode(msg.name)
    if t is LogicalMessage:
        return (b"M" + xid_prefix + bytes([msg.flags]) + _u64.pack(msg.lsn)
                + _cstr_encode(msg.prefix) + _u32.pack(len(msg.content)) + msg.content)
    if t is Insert:
        return b"I" + xid_prefix + _u32.pack(msg.relation_oid) + b"N" + encode_tuple(msg.new_tuple)
    if t is Update:
        out = b"U" + xid_prefix + _u32.pack(msg.relation_oid)
        if msg.key_type is not None:
            out += msg.key_type + encode_tuple(msg.old_tuple)
        return out + b"N" + encode_tuple(msg.new_tuple)
    if t is Delete:
        return (b"D" + xid_prefix + _u32.pack(msg.relation_oid) + msg.key_type
                + encode_tuple(msg.old_tuple))
    if t is Truncate:
        return (b"T" + xid_prefix + _u32.pack(len(msg.relation_oids)) + bytes([msg.options])
                + b"".join(_u32.pack(o) for o in msg.relation_oids))
    if t is StreamStart:
        return b"S" + _u32.pack(msg.xid) + (b"\x01" if msg.first_segment else b"\x00")
    if t is StreamStop:
        return b"E"
    if t is StreamCommit:
        return (b"c" + _u32.pack(msg.xid) + bytes([msg.flags]) + _u64.pack(msg.commit_lsn)
                + _u64.pack(msg.end_lsn) + _i64.pack(msg.commit_ts))
    if t is StreamAbort:
        out = b"A" + _u32.pack(msg.xid) + _u32.pack(msg.subtransaction_xid)
        if msg.abort_lsn is not None:  # protocol v4
            out += _u64.pack(msg.abort_lsn) + _i64.pack(msg.abort_ts)
        return out
    if t is BeginPrepare:
        return (b"b" + _u64.pack(msg.prepare_lsn) + _u64.pack(msg.end_lsn)
                + _i64.pack(msg.prepare_ts) + _u32.pack(msg.xid) + _cstr_encode(msg.gid))
    if t is Prepare:
        return (b"P" + bytes([msg.flags]) + _u64.pack(msg.prepare_lsn) + _u64.pack(msg.end_lsn)
                + _i64.pack(msg.prepare_ts) + _u32.pack(msg.xid) + _cstr_encode(msg.gid))
    if t is CommitPrepared:
        return (b"K" + bytes([msg.flags]) + _u64.pack(msg.commit_lsn) + _u64.pack(msg.end_lsn)
                + _i64.pack(msg.commit_ts) + _u32.pack(msg.xid) + _cstr_encode(msg.gid))
    if t is RollbackPrepared:
        return (b"r" + bytes([msg.flags]) + _u64.pack(msg.prepare_end_lsn)
                + _u64.pack(msg.rollback_end_lsn) + _i64.pack(msg.prepare_ts)
                + _i64.pack(msg.rollback_ts) + _u32.pack(msg.xid) + _cstr_encode(msg.gid))
    if t is StreamPrepare:
        return (b"p" + bytes([msg.flags]) + _u64.pack(msg.prepare_lsn) + _u64.pack(msg.end_lsn)
                + _i64.pack(msg.prepare_ts) + _u32.pack(msg.xid) + _cstr_encode(msg.gid))
    raise TypeError(f"unknown message type {t}")


# ---------------------------------------------------------------------------
# Parsing (reference parity: parse_wal_message, src/protocol.rs:698-780)
# ---------------------------------------------------------------------------


def parse_tuple(buf: bytes, off: int) -> Tuple[TupleData, int]:
    """Per-column tag loop -> TupleData (reference src/protocol.rs:1294-1325)."""
    (ncols,) = _u16.unpack_from(buf, off)
    off += 2
    out: TupleData = []
    append = out.append
    for _ in range(ncols):
        tag = buf[off:off + 1]
        off += 1
        if tag == b"t" or tag == b"b":
            (ln,) = _u32.unpack_from(buf, off)
            off += 4
            append((tag, buf[off:off + ln]))
            off += ln
        elif tag == b"n" or tag == b"u":
            append((tag, None))
        else:
            raise ValueError(f"bad tuple tag {tag!r} at offset {off - 1}")
    return out, off


def parse_message(buf: bytes, in_stream: bool = False,
                  proto_version: int = 4):
    """Parse one pgoutput message body into (message, xid_or_None).

    ``in_stream`` True means the parser is between StreamStart and StreamStop
    for some transaction, so xid-prefixed tags carry a 4-byte xid (the
    reference tracks this as parser state, src/protocol.rs:674-678).
    Returns (msg, stream_xid): stream_xid is the embedded xid if present.
    """
    tag = buf[0:1]
    off = 1
    stream_xid = None
    if in_stream and tag in (b"R", b"Y", b"I", b"U", b"D", b"T", b"M"):
        (stream_xid,) = _u32.unpack_from(buf, off)
        off += 4
    if tag == b"B":
        final_lsn, commit_ts, xid = struct.unpack_from(">QqI", buf, off)
        return Begin(final_lsn, commit_ts, xid), stream_xid
    if tag == b"C":
        flags = buf[off]
        commit_lsn, end_lsn, commit_ts = struct.unpack_from(">QQq", buf, off + 1)
        return Commit(flags, commit_lsn, end_lsn, commit_ts), stream_xid
    if tag == b"R":
        (oid,) = _u32.unpack_from(buf, off)
        off += 4
        ns, off = _cstr_decode(buf, off)
        name, off = _cstr_decode(buf, off)
        replident = chr(buf[off])
        off += 1
        (ncols,) = _u16.unpack_from(buf, off)
        off += 2
        cols = []
        for _ in range(ncols):
            flags = buf[off]
            off += 1
            cname, off = _cstr_decode(buf, off)
            type_oid, typmod = struct.unpack_from(">Ii", buf, off)
            off += 8
            cols.append(ColumnInfo(flags, cname, type_oid & 0xFFFFFFFF, typmod))
        return Relation(oid, ns, name, replident, cols), stream_xid
    if tag == b"Y":
        (oid,) = _u32.unpack_from(buf, off)
        off += 4
        ns, off = _cstr_decode(buf, off)
        name, off = _cstr_decode(buf, off)
        return PgType(oid, ns, name), stream_xid
    if tag == b"O":
        (lsn,) = _u64.unpack_from(buf, off)
        name, _ = _cstr_decode(buf, off + 8)
        return Origin(lsn, name), stream_xid
    if tag == b"M":
        flags = buf[off]
        (lsn,) = _u64.unpack_from(buf, off + 1)
        prefix, off2 = _cstr_decode(buf, off + 9)
        (ln,) = _u32.unpack_from(buf, off2)
        content = buf[off2 + 4:off2 + 4 + ln]
        return LogicalMessage(flags, lsn, prefix, content), stream_xid
    if tag == b"I":
        (oid,) = _u32.unpack_from(buf, off)
        off += 4
        assert buf[off:off + 1] == b"N", "Insert must carry a 'N' new tuple"
        tup, _ = parse_tuple(buf, off + 1)
        return Insert(oid, tup), stream_xid
    if tag == b"U":
        (oid,) = _u32.unpack_from(buf, off)
        off += 4
        key_type = None
        old_tuple = None
        marker = buf[off:off + 1]
        if marker in (b"K", b"O"):
            key_type = marker
            old_tuple, off = parse_tuple(buf, off + 1)
            marker = buf[off:off + 1]
        assert marker == b"N", "Update must carry a 'N' new tuple"
        tup, _ = parse_tuple(buf, off + 1)
        return Update(oid, key_type, old_tuple, tup), stream_xid
    if tag == b"D":
        (oid,) = _u32.unpack_from(buf, off)
        off += 4
        key_type = buf[off:off + 1]
        assert key_type in (b"K", b"O"), f"bad delete key marker {key_type!r}"
        tup, _ = parse_tuple(buf, off + 1)
        return Delete(oid, key_type, tup), stream_xid
    if tag == b"T":
        (nrels,) = _u32.unpack_from(buf, off)
        options = buf[off + 4]
        oids = list(struct.unpack_from(f">{nrels}I", buf, off + 5))
        return Truncate(options, oids), stream_xid
    if tag == b"S":
        (xid,) = _u32.unpack_from(buf, off)
        return StreamStart(xid, buf[off + 4] == 1), None
    if tag == b"E":
        return StreamStop(), None
    if tag == b"c":
        (xid,) = _u32.unpack_from(buf, off)
        flags = buf[off + 4]
        commit_lsn, end_lsn, ts = struct.unpack_from(">QQq", buf, off + 5)
        return StreamCommit(xid, flags, commit_lsn, end_lsn, ts), None
    if tag == b"A":
        xid, subxid = struct.unpack_from(">II", buf, off)
        if proto_version >= 4 and len(buf) >= off + 8 + 16:
            abort_lsn, abort_ts = struct.unpack_from(">Qq", buf, off + 8)
            return StreamAbort(xid, subxid, abort_lsn, abort_ts), None
        return StreamAbort(xid, subxid), None
    if tag == b"b":
        p, e, ts, xid = struct.unpack_from(">QQqI", buf, off)
        gid, _ = _cstr_decode(buf, off + 28)
        return BeginPrepare(p, e, ts, xid, gid), None
    if tag == b"P":
        flags = buf[off]
        p, e, ts, xid = struct.unpack_from(">QQqI", buf, off + 1)
        gid, _ = _cstr_decode(buf, off + 29)
        return Prepare(flags, p, e, ts, xid, gid), None
    if tag == b"K":
        flags = buf[off]
        c, e, ts, xid = struct.unpack_from(">QQqI", buf, off + 1)
        gid, _ = _cstr_decode(buf, off + 29)
        return CommitPrepared(flags, c, e, ts, xid, gid), None
    if tag == b"r":
        flags = buf[off]
        pe, re_, pts, rts, xid = struct.unpack_from(">QQqqI", buf, off + 1)
        gid, _ = _cstr_decode(buf, off + 37)
        return RollbackPrepared(flags, pe, re_, pts, rts, xid, gid), None
    if tag == b"p":
        flags = buf[off]
        p, e, ts, xid = struct.unpack_from(">QQqI", buf, off + 1)
        gid, _ = _cstr_decode(buf, off + 29)
        return StreamPrepare(flags, p, e, ts, xid, gid), None
    raise ValueError(f"unknown pgoutput message tag {tag!r}")
