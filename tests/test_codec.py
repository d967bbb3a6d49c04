"""Wire-codec tests: byte-faithful encode/parse roundtrips for every pgoutput
message type (the reference's fidelity bar: encode(parse(b)) == b and
parse(encode(m)) == m — integration-tests/pgoutput_fidelity.rs,
fuzz/fuzz_targets/roundtrip_*.rs)."""

import pytest
from hypothesis import given, settings, strategies as st

from pg_walstream_ray.wire import codec
from pg_walstream_ray.wire.frames import (
    encode_keepalive, encode_standby_status_update, encode_xlogdata,
    format_lsn, parse_keepalive, parse_lsn, parse_standby_status_update,
    parse_xlogdata_header, pg_ts_to_unix_us, unix_us_to_pg_ts,
)

TUPLE = [(b"t", b"hello"), (b"n", None), (b"u", None), (b"b", b"\x00\xff"),
         (b"t", b"")]

MESSAGES = [
    codec.Begin(123456789, 987654, 42),
    codec.Commit(0, 100, 102, 5555),
    codec.Relation(16384, "public", "transcripts", "d", [
        codec.ColumnInfo(1, "conv_id", 25, -1),
        codec.ColumnInfo(1, "turn_idx", 23, -1),
        codec.ColumnInfo(0, "text", 25, -1),
    ]),
    codec.PgType(60000, "public", "mood"),
    codec.Origin(777, "origin_a"),
    codec.LogicalMessage(1, 888, "prefix", b"payload"),
    codec.Insert(16384, TUPLE),
    codec.Update(16384, b"K", [(b"t", b"k1"), (b"n", None)], TUPLE),
    codec.Update(16384, b"O", TUPLE, TUPLE),
    codec.Update(16384, None, None, TUPLE),
    codec.Delete(16384, b"K", [(b"t", b"k1")]),
    codec.Delete(16384, b"O", TUPLE),
    codec.Truncate(3, [16384, 16385]),
    codec.StreamStart(900, True),
    codec.StreamStop(),
    codec.StreamCommit(900, 0, 1000, 1002, 123),
    codec.StreamAbort(900, 901, abort_lsn=1010, abort_ts=456),
    codec.BeginPrepare(1, 2, 3, 4, "gid-1"),
    codec.Prepare(0, 1, 2, 3, 4, "gid-1"),
    codec.CommitPrepared(0, 1, 2, 3, 4, "gid-1"),
    codec.RollbackPrepared(0, 1, 2, 3, 4, 5, "gid-1"),
    codec.StreamPrepare(0, 1, 2, 3, 4, "gid-1"),
]


@pytest.mark.parametrize("msg", MESSAGES, ids=lambda m: type(m).__name__)
def test_roundtrip_message(msg):
    b = codec.encode_message(msg)
    parsed, xid = codec.parse_message(b)
    assert parsed == msg
    assert xid is None
    # byte-fixpoint: encode(parse(bytes)) == bytes
    assert codec.encode_message(parsed) == b


@pytest.mark.parametrize("msg", [
    codec.Relation(1, "s", "t", "f", [codec.ColumnInfo(0, "c", 25, -1)]),
    codec.Insert(16384, TUPLE),
    codec.Update(16384, b"O", TUPLE, TUPLE),
    codec.Delete(16384, b"K", [(b"t", b"k")]),
    codec.Truncate(0, [16384]),
    codec.LogicalMessage(0, 5, "p", b"x"),
    codec.PgType(9, "a", "b"),
], ids=lambda m: type(m).__name__)
def test_roundtrip_streamed_xid_prefix(msg):
    """v2+ in-stream messages carry a 4-byte xid after the tag
    (protocol.rs:744-780)."""
    b = codec.encode_message(msg, in_stream_xid=4242)
    parsed, xid = codec.parse_message(b, in_stream=True)
    assert parsed == msg
    assert xid == 4242
    assert codec.encode_message(parsed, in_stream_xid=4242) == b


def test_stream_abort_v1_no_tail():
    m = codec.StreamAbort(7, 8)
    b = codec.encode_message(m)
    parsed, _ = codec.parse_message(b)
    assert parsed == m


def test_tuple_roundtrip_empty_and_tags():
    for tup in ([], TUPLE, [(b"n", None)] * 5):
        enc = codec.encode_tuple(tup)
        out, off = codec.parse_tuple(enc, 0)
        assert out == tup
        assert off == len(enc)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(
    st.tuples(st.just(b"t"), st.binary(max_size=64)),
    st.tuples(st.just(b"b"), st.binary(max_size=64)),
    st.tuples(st.just(b"n"), st.none()),
    st.tuples(st.just(b"u"), st.none()),
), max_size=20))
def test_tuple_roundtrip_property(tup):
    tup = [(t, v if t in (b"t", b"b") else None) for t, v in tup]
    enc = codec.encode_tuple(tup)
    out, _ = codec.parse_tuple(enc, 0)
    assert out == tup


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1),
       st.integers(-2**62, 2**62), st.binary(max_size=128))
def test_xlogdata_roundtrip(ws, we, ts, payload):
    f = encode_xlogdata(ws, we, ts, payload)
    assert parse_xlogdata_header(f) == (ws, we, ts)
    assert f[25:] == payload


def test_keepalive_roundtrip():
    f = encode_keepalive(999, 123, True)
    assert len(f) == 18
    assert parse_keepalive(f) == (999, 123, True)


def test_standby_status_roundtrip():
    f = encode_standby_status_update(1, 2, 3, 99, True)
    assert parse_standby_status_update(f) == (1, 2, 3, 99, True)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**64 - 1))
def test_lsn_text_roundtrip(lsn):
    assert parse_lsn(format_lsn(lsn)) == lsn


def test_lsn_text_forms():
    # types.rs:184-226 semantics
    assert format_lsn(0) == "0/0"
    assert parse_lsn("16/B374D848") == (0x16 << 32) | 0xB374D848
    for bad in ("", "1", "1/", "/1", "x/y", "1/123456789AB"):
        with pytest.raises(ValueError):
            parse_lsn(bad)


def test_pg_epoch_conversion():
    # types.rs:17: 2000-01-01 epoch offset
    assert pg_ts_to_unix_us(0) == 946_684_800_000_000
    assert unix_us_to_pg_ts(pg_ts_to_unix_us(12345)) == 12345
