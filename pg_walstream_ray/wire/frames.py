"""Replication-stream framing: XLogData ('w') and keepalive ('k') frames,
LSN text form, Postgres-epoch timestamps.

Reference parity:
  - XLogData 25-byte header (tag 'w', wal_start u64, wal_end u64,
    send_time i64): /root/reference/src/stream.rs:1046-1075
  - keepalive 18-byte frame ('k', wal_end u64, ts i64, reply u8):
    /root/reference/src/protocol.rs:1940-1957
  - parse_lsn / format_lsn "hi/lo" hex: /root/reference/src/types.rs:184-226
  - Postgres epoch (2000-01-01) micros offset: /root/reference/src/types.rs:17
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

# Microseconds between 1970-01-01 (Unix) and 2000-01-01 (Postgres) epochs.
PG_EPOCH_OFFSET_US = 946_684_800_000_000

_XLOGDATA = struct.Struct(">cQQq")
_KEEPALIVE = struct.Struct(">cQqB")

XLOGDATA_HEADER_LEN = 25
KEEPALIVE_LEN = 18


def pg_ts_to_unix_us(pg_us: int) -> int:
    return pg_us + PG_EPOCH_OFFSET_US


def unix_us_to_pg_ts(unix_us: int) -> int:
    return unix_us - PG_EPOCH_OFFSET_US


def format_lsn(lsn: int) -> str:
    """int -> Postgres text form 'hi/lo' hex (types.rs:224-226)."""
    return f"{(lsn >> 32) & 0xFFFFFFFF:X}/{lsn & 0xFFFFFFFF:X}"


def parse_lsn(text: str) -> int:
    """'hi/lo' hex -> int (types.rs:184-197). Raises ValueError on bad form."""
    hi, sep, lo = text.partition("/")
    if not sep or not hi or not lo:
        raise ValueError(f"bad LSN text {text!r}")
    hi_v = int(hi, 16)
    lo_v = int(lo, 16)
    if hi_v > 0xFFFFFFFF or lo_v > 0xFFFFFFFF:
        raise ValueError(f"LSN component out of range in {text!r}")
    return (hi_v << 32) | lo_v


def encode_xlogdata(wal_start: int, wal_end: int, send_time_pg_us: int,
                    payload: bytes) -> bytes:
    return _XLOGDATA.pack(b"w", wal_start, wal_end, send_time_pg_us) + payload


def parse_xlogdata_header(frame: bytes) -> Tuple[int, int, int]:
    """25-byte header decode -> (wal_start, wal_end, send_time_pg_us).

    Reference: parse_xlogdata_header, src/stream.rs:1046-1075.
    """
    tag, wal_start, wal_end, ts = _XLOGDATA.unpack_from(frame, 0)
    if tag != b"w":
        raise ValueError(f"not an XLogData frame (tag {tag!r})")
    return wal_start, wal_end, ts


def encode_keepalive(wal_end: int, ts_pg_us: int, reply_requested: bool) -> bytes:
    return _KEEPALIVE.pack(b"k", wal_end, ts_pg_us, 1 if reply_requested else 0)


def parse_keepalive(frame: bytes) -> Tuple[int, int, bool]:
    """18-byte fixed decode (protocol.rs:1940-1957)."""
    tag, wal_end, ts, reply = _KEEPALIVE.unpack_from(frame, 0)
    if tag != b"k":
        raise ValueError(f"not a keepalive frame (tag {tag!r})")
    return wal_end, ts, reply == 1


def frame_kind(frame: bytes) -> bytes:
    """First byte: b'w' XLogData | b'k' keepalive (stream.rs:646-694 dispatch)."""
    return frame[0:1]


def encode_standby_status_update(write_lsn: int, flush_lsn: int, apply_lsn: int,
                                 ts_pg_us: int, reply_requested: bool = False) -> bytes:
    """Standby status ('r') — the feedback sink (connection/libpq.rs:337-413)."""
    return struct.pack(">cQQQqB", b"r", write_lsn, flush_lsn, apply_lsn,
                       ts_pg_us, 1 if reply_requested else 0)


def parse_standby_status_update(frame: bytes):
    tag, w, f, a, ts, reply = struct.unpack_from(">cQQQqB", frame, 0)
    if tag != b"r":
        raise ValueError(f"not a standby status frame (tag {tag!r})")
    return w, f, a, ts, reply == 1
