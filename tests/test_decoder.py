"""Decoder semantics: commit-complete release, streamed-tx assembly/abort,
unknown-relation drop, schema-diff detection, bounded replay — mirroring the
reference's stream/protocol unit tests (stream.rs:1957+, protocol.rs:2012+)."""

import pyarrow as pa
import pyarrow.compute as pc

from pg_walstream_ray.wire import codec
from pg_walstream_ray.wire.frames import encode_xlogdata, encode_keepalive
from pg_walstream_ray.stages.decode import PgOutputDecoder, decode_frames

OID = 16384
REL = codec.Relation(OID, "public", "t", "d", [
    codec.ColumnInfo(1, "k", 23, -1),
    codec.ColumnInfo(0, "v", 25, -1),
])


def frame(lsn, msg, xid=None):
    return encode_xlogdata(lsn, lsn, 0, codec.encode_message(msg, in_stream_xid=xid))


def ins(k, v):
    return codec.Insert(OID, [(b"t", str(k).encode()), (b"t", v.encode())])


def test_commit_complete_release():
    """Rows are released only at Commit; an uncommitted tx leaves no trace
    (safe-transaction-consumer contract, main.rs:84-206)."""
    frames = [
        frame(1, codec.Begin(10, 0, 1)),
        frame(2, REL),
        frame(3, ins(1, "a")),
        frame(4, ins(2, "b")),
    ]
    dec = PgOutputDecoder()
    dec.feed_frames(frames)
    b = dec.take_batch()
    # only the relation control row released so far
    ops = b.column("op").to_pylist() if b else []
    assert "insert" not in ops

    dec.feed_frames([frame(10, codec.Commit(0, 10, 11, 777))])
    b = dec.take_batch()
    t = pa.Table.from_batches([b])
    d = t.filter(pc.equal(t["op"], "insert"))
    assert d.num_rows == 2
    assert d["commit_lsn"].to_pylist() == [10, 10]
    assert set(d["xid"].to_pylist()) == {1}


def test_uncommitted_tail_dropped():
    frames = [
        frame(1, codec.Begin(10, 0, 1)),
        frame(2, REL),
        frame(3, ins(1, "a")),
        frame(10, codec.Commit(0, 10, 11, 0)),
        frame(20, codec.Begin(30, 0, 2)),
        frame(21, ins(2, "b")),     # no commit ever arrives
    ]
    env = decode_frames(frames)
    d = env.filter(pc.equal(env["op"], "insert"))
    assert d.num_rows == 1
    assert d["after_values"].to_pylist() == [["1", "a"]]


def test_streamed_tx_commit_and_abort():
    """StreamStart..StreamStop segments buffer per xid; StreamCommit releases,
    StreamAbort discards entirely (protocol.rs:1055-1133)."""
    frames = [
        frame(1, codec.StreamStart(100, True)),
        frame(2, REL, xid=100),
        frame(3, ins(1, "a"), xid=100),
        frame(4, codec.StreamStop()),
        frame(5, codec.StreamStart(200, True)),
        frame(6, ins(2, "doomed"), xid=200),
        frame(7, codec.StreamStop()),
        # interleaved second segment of xid 100
        frame(8, codec.StreamStart(100, False)),
        frame(9, ins(3, "c"), xid=100),
        frame(10, codec.StreamStop()),
        frame(11, codec.StreamAbort(200, 200, abort_lsn=11, abort_ts=0)),
        frame(12, codec.StreamCommit(100, 0, 12, 13, 999)),
    ]
    env = decode_frames(frames)
    d = env.filter(pc.equal(env["op"], "insert"))
    assert d.num_rows == 2
    assert [v[1] for v in d["after_values"].to_pylist()] == ["a", "c"]
    assert d["commit_lsn"].to_pylist() == [12, 12]


def test_unknown_relation_dropped_with_warning():
    """DML for a never-announced OID is dropped, not an error
    (protocol.rs:1502-1505)."""
    frames = [
        frame(1, codec.Begin(5, 0, 1)),
        frame(2, codec.Insert(99999, [(b"t", b"1")])),
        frame(5, codec.Commit(0, 5, 6, 0)),
    ]
    dec = PgOutputDecoder()
    dec.feed_frames(frames)
    assert dec.unknown_relation_drops == 1
    b = dec.take_batch()
    assert b is None or "insert" not in b.column("op").to_pylist()


def test_schema_diff_emits_relation_event():
    """A changed Relation emits a relation change-event with the column diff;
    an identical re-announcement does not (protocol.rs:1430-1483)."""
    rel_v2 = codec.Relation(OID, "public", "t", "d", [
        codec.ColumnInfo(1, "k", 23, -1),
        codec.ColumnInfo(0, "v", 25, -1),
        codec.ColumnInfo(0, "extra", 20, -1),
    ])
    frames = [
        frame(1, codec.Begin(10, 0, 1)),
        frame(2, REL),
        frame(3, REL),           # identical: no new event, no version bump
        frame(4, rel_v2),        # diff: add_column
        frame(10, codec.Commit(0, 10, 11, 0)),
    ]
    env = decode_frames(frames)
    rels = env.filter(pc.equal(env["op"], "relation"))
    assert rels.num_rows == 2
    assert rels["rel_version"].to_pylist() == [1, 2]
    import json
    diff = json.loads(rels["meta"][1].as_py())["diff"]
    assert any(c["kind"] == "add_column" and c["name"] == "extra" for c in diff)


def test_rename_and_retype_diff():
    renamed = codec.Relation(OID, "public", "t", "d", [
        codec.ColumnInfo(1, "k", 20, -1),       # retype int4 -> int8
        codec.ColumnInfo(0, "v2", 25, -1),      # rename v -> v2
    ])
    from pg_walstream_ray.stages.decode import relation_diff
    diff = relation_diff(REL, renamed)
    kinds = {c["kind"] for c in diff}
    assert kinds == {"rename_column", "retype_column"}


def test_bounded_replay_stop_at_lsn():
    """Stop at the first commit whose end_lsn >= target; the crossing tx is
    delivered in full, nothing after (stream.rs:362-387,
    bounded_replay.rs:54-155)."""
    frames = [
        frame(1, codec.Begin(10, 0, 1)), frame(2, REL),
        frame(3, ins(1, "a")), frame(10, codec.Commit(0, 10, 11, 0)),
        frame(20, codec.Begin(30, 0, 2)),
        frame(21, ins(2, "b")), frame(30, codec.Commit(0, 30, 31, 0)),
        frame(40, codec.Begin(50, 0, 3)),
        frame(41, ins(3, "c")), frame(50, codec.Commit(0, 50, 51, 0)),
    ]
    # target lands inside tx2's range: tx2 is the crossing commit -> included
    env = decode_frames(frames, stop_at_lsn=25)
    d = env.filter(pc.equal(env["op"], "insert"))
    assert [v[0] for v in d["after_values"].to_pylist()] == ["1", "2"]


def test_keepalive_advances_watermark_only():
    dec = PgOutputDecoder()
    dec.feed_frames([encode_keepalive(12345, 0, False)])
    assert dec.last_received_lsn == 12345
    assert dec.take_batch() is None


def test_toast_unchanged_tag_surfaces_in_mask():
    upd = codec.Update(OID, b"K", [(b"t", b"1"), (b"n", None)],
                       [(b"t", b"1"), (b"u", None)])
    frames = [
        frame(1, codec.Begin(10, 0, 1)), frame(2, REL),
        frame(3, upd), frame(10, codec.Commit(0, 10, 11, 0)),
    ]
    env = decode_frames(frames)
    d = env.filter(pc.equal(env["op"], "update"))
    assert d["unchanged_mask"].to_pylist() == [[False, True]]
    assert d["after_values"].to_pylist() == [["1", None]]
    assert d["key_type"].to_pylist() == ["K"]


def test_two_phase_commit_prepared_publishes():
    """BeginPrepare..DML..Prepare stages; CommitPrepared publishes at its
    commit LSN (protocol.rs:1135-1292 semantics)."""
    frames = [
        frame(1, codec.BeginPrepare(10, 11, 0, 7, "gid-a")),
        frame(2, REL),
        frame(3, ins(1, "a")),
        frame(4, ins(2, "b")),
        frame(10, codec.Prepare(0, 10, 11, 0, 7, "gid-a")),
    ]
    dec = PgOutputDecoder()
    dec.feed_frames(frames)
    b = dec.take_batch()
    ops = b.column("op").to_pylist() if b else []
    assert "insert" not in ops          # staged, not published

    dec.feed_frames([frame(20, codec.CommitPrepared(0, 20, 21, 555, 7,
                                                    "gid-a"))])
    t = pa.Table.from_batches([dec.take_batch()])
    d = t.filter(pc.equal(t["op"], "insert"))
    assert d.num_rows == 2
    assert d["commit_lsn"].to_pylist() == [20, 20]


def test_two_phase_rollback_discards():
    frames = [
        frame(1, codec.BeginPrepare(10, 11, 0, 8, "gid-b")),
        frame(2, REL),
        frame(3, ins(3, "c")),
        frame(10, codec.Prepare(0, 10, 11, 0, 8, "gid-b")),
        frame(20, codec.RollbackPrepared(0, 11, 21, 0, 0, 8, "gid-b")),
        # later unrelated tx must still flow
        frame(30, codec.Begin(40, 0, 9)),
        frame(31, ins(4, "d")),
        frame(40, codec.Commit(0, 40, 41, 0)),
    ]
    t = decode_frames(frames)
    d = t.filter(pc.equal(t["op"], "insert"))
    assert d.num_rows == 1
    assert d["xid"].to_pylist() == [9]


def test_two_phase_streamed_prepare():
    """StreamPrepare moves an assembled streamed tx into the staged ledger;
    CommitPrepared publishes it."""
    frames = [
        frame(1, codec.StreamStart(12, True)),
        frame(2, REL, xid=12),
        frame(3, ins(5, "e"), xid=12),
        frame(4, codec.StreamStop()),
        frame(10, codec.StreamPrepare(0, 10, 11, 0, 12, "gid-s")),
    ]
    dec = PgOutputDecoder()
    dec.feed_frames(frames)
    b = dec.take_batch()
    ops = b.column("op").to_pylist() if b else []
    assert "insert" not in ops
    dec.feed_frames([frame(20, codec.CommitPrepared(0, 20, 21, 0, 12,
                                                    "gid-s"))])
    t = pa.Table.from_batches([dec.take_batch()])
    d = t.filter(pc.equal(t["op"], "insert"))
    assert d.num_rows == 1 and d["commit_lsn"].to_pylist() == [20]


def test_commit_prepared_unknown_gid_noop():
    """A CommitPrepared whose Prepare predates the replay window publishes
    nothing (restart-resume behavior)."""
    frames = [
        frame(20, codec.CommitPrepared(0, 20, 21, 0, 13, "gid-missing")),
        frame(30, codec.Begin(40, 0, 14)),
        frame(31, REL),
        frame(32, ins(6, "f")),
        frame(40, codec.Commit(0, 40, 41, 0)),
    ]
    t = decode_frames(frames)
    d = t.filter(pc.equal(t["op"], "insert"))
    assert d.num_rows == 1 and d["xid"].to_pylist() == [14]


def test_malformed_frames_fail_loud_never_silent():
    """Corrupt input raises (distinct errors per corruption) — never a
    silently wrong decode; the vectorized path falls back cleanly
    (returns None, decoder state untouched) and the scalar path then
    surfaces the error."""
    import pytest

    from pg_walstream_ray.stages.decode import (PgOutputDecoder,
                                                decode_frames)
    from pg_walstream_ray.stages.vdecode import try_decode_segment
    from pg_walstream_ray.wire import codec
    from pg_walstream_ray.wire.frames import encode_xlogdata

    with pytest.raises(ValueError):
        decode_frames([encode_xlogdata(1, 1, 0, b"\x99garbage")])

    rel = codec.Relation(1, "p", "t", "d",
                         [codec.ColumnInfo(1, "k", 23, -1)])
    good = [encode_xlogdata(1, 1, 0,
                            codec.encode_message(codec.Begin(9, 0, 1))),
            encode_xlogdata(2, 2, 0, codec.encode_message(rel))]
    ins = codec.encode_message(codec.Insert(1, [(b"t", b"12")]))
    with pytest.raises(Exception):
        decode_frames(good + [encode_xlogdata(3, 3, 0, ins[:-3])])
    with pytest.raises(Exception):
        decode_frames([b"w" + b"\x00" * 10])

    # vectorized fast path: corrupt segment -> clean fallback, state
    # untouched (the caller then re-runs the scalar path, which raises)
    import pyarrow as pa

    dec = PgOutputDecoder()
    frames_col = pa.array(good + [encode_xlogdata(3, 3, 0, ins[:-3])],
                          pa.binary())
    before = dict(dec.relations)
    assert try_decode_segment(dec, frames_col) is None
    assert dec.relations == before and dec.last_received_lsn == 0
