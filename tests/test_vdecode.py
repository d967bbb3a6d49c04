"""Vectorized decoder == scalar decoder, byte-for-byte.

The vectorized path (stages/vdecode.py) must produce the exact envelope
table — same rows, same order, same decoder state afterwards — as the
scalar ``PgOutputDecoder`` over every scenario shape, or cleanly fall
back (return None).  No Ray needed: both decoders are pure functions
over frame lists."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from pg_walstream_ray.sources import walgen
from pg_walstream_ray.stages import vdecode
from pg_walstream_ray.stages.decode import ENVELOPE_SCHEMA, PgOutputDecoder
from pg_walstream_ray.stages.typed import project_envelope
from pg_walstream_ray.state.schema_registry import SchemaRegistry

from .helpers import make_wal


_EXAMPLES = int(os.environ.get("PGWR_HYP_EXAMPLES", "12"))

def _frames_of(wal_dir: str):
    """Per shard: frame column (arrow) for each segment, in order."""
    for d in sorted(glob.glob(os.path.join(wal_dir, "shard=*"))):
        segs = sorted(glob.glob(os.path.join(d, "wal*.parquet")))
        yield [pq.read_table(p, columns=["frame"])["frame"] for p in segs]


def _assert_equivalent(spec: walgen.WalSpec, expect_fallback: bool = False,
                       origin_filter: str = "any"):
    wal = make_wal(spec)
    saw_vectorized = False
    for seg_cols in _frames_of(wal):
        ds = PgOutputDecoder(source=0, origin_filter=origin_filter)
        dv = PgOutputDecoder(source=0, origin_filter=origin_filter)
        for col in seg_cols:
            ds.feed_frames(col.to_pylist())
            b = ds.take_batch()
            scalar = pa.Table.from_batches([b] if b else [],
                                           schema=ENVELOPE_SCHEMA)
            out = vdecode.try_decode_segment(dv, col)
            if out is None:
                # fallback: replay through the scalar path on dv to keep
                # state in sync for the next segment (what DecodeShard does)
                dv.feed_frames(col.to_pylist())
                bv = dv.take_batch()
                vec = pa.Table.from_batches([bv] if bv else [],
                                            schema=ENVELOPE_SCHEMA)
            else:
                saw_vectorized = True
                vec = pa.Table.from_batches(list(out),
                                            schema=ENVELOPE_SCHEMA)
            assert scalar.equals(vec), \
                f"envelope mismatch (spec={spec.to_json()})"
        assert ds._next_version == dv._next_version
        assert ds.last_commit_lsn == dv.last_commit_lsn
        assert ds.unknown_relation_drops == dv.unknown_relation_drops
    if expect_fallback:
        assert not saw_vectorized
    else:
        assert saw_vectorized, "vectorized path never engaged"


def _registry_of(wal_dir: str) -> SchemaRegistry:
    reg = SchemaRegistry()
    for d in sorted(glob.glob(os.path.join(wal_dir, "shard=*"))):
        with open(os.path.join(d, "relations.json")) as f:
            reg.ingest_relation_rows(json.load(f))
    return reg


def _assert_typed_equivalent(spec: walgen.WalSpec,
                             expect_fallback: bool = False,
                             origin_filter: str = "any"):
    """typed-direct decode == project_envelope(scalar decode), up to row
    order (typed emits grouped by op/version; downstream orders by lsn)."""
    wal = make_wal(spec)
    reg = _registry_of(wal)
    vmap = reg.version_map()
    oid = walgen.TRANSCRIPTS_OID
    saw_typed = False
    for seg_cols in _frames_of(wal):
        ds = PgOutputDecoder(source=0, version_map=vmap,
                             origin_filter=origin_filter)
        dt = PgOutputDecoder(source=0, version_map=vmap,
                             origin_filter=origin_filter)
        for col in seg_cols:
            ds.feed_frames(col.to_pylist())
            b = ds.take_batch()
            env = pa.Table.from_batches([b] if b else [],
                                        schema=ENVELOPE_SCHEMA)
            expect = project_envelope(env, reg, oid)
            out = vdecode.try_decode_segment_typed(dt, col, reg, oid)
            if out is None:
                # fallback: sync state through the scalar path, like fused
                dt.feed_frames(col.to_pylist())
                dt.take_batch()
                continue
            saw_typed = True
            got = pa.concat_tables(out) if out else expect.slice(0, 0)
            assert got.num_rows == expect.num_rows, spec.to_json()
            if expect.num_rows:
                # every DML/truncate row has a unique lsn in walgen
                e = expect.sort_by("lsn")
                g = got.select(expect.column_names).sort_by("lsn")
                assert e.equals(g), spec.to_json()
        assert ds._next_version == dt._next_version
        assert ds.last_commit_lsn == dt.last_commit_lsn
    if expect_fallback:
        assert not saw_typed
    else:
        assert saw_typed, "typed-direct path never engaged"


def test_baseline():
    _assert_equivalent(walgen.WalSpec(n_convs=60, turns_per_conv=8,
                                      n_shards=2))


def test_binary_mode_fast_path():
    # protocol with_binary analogue: 'b' tuple tags must stay vectorized
    # (stream.rs:219-222 — binary mode is the reference's best-case config)
    _assert_equivalent(walgen.WalSpec(
        n_convs=50, turns_per_conv=6, update_frac=0.5, delete_frac=0.1,
        toast_unchanged_frac=0.3, binary_text=True, n_shards=2))


def test_typed_direct_scenarios():
    for spec in (
        walgen.WalSpec(n_convs=60, turns_per_conv=8, n_shards=2),
        walgen.WalSpec(n_convs=50, turns_per_conv=6, update_frac=0.6,
                       delete_frac=0.2, toast_unchanged_frac=0.4,
                       truncate_at_frac=0.5, n_shards=2),
        walgen.WalSpec(n_convs=60, turns_per_conv=6,
                       schema_change_at_frac=0.5, segment_rows=120,
                       n_shards=2),
        walgen.WalSpec(n_convs=50, turns_per_conv=6, update_frac=0.5,
                       binary_text=True, n_shards=1),
        walgen.WalSpec(n_convs=40, turns_per_conv=6, hot_conv_frac=0.5,
                       payload_bytes=256, n_shards=1),
    ):
        _assert_typed_equivalent(spec)


def test_typed_direct_uncommitted_tail_falls_back():
    _assert_typed_equivalent(
        walgen.WalSpec(n_convs=20, turns_per_conv=4, uncommitted_tail=True,
                       n_shards=1), expect_fallback=True)


def test_mixed_dml_toast_truncate():
    _assert_equivalent(walgen.WalSpec(
        n_convs=50, turns_per_conv=6, update_frac=0.6, delete_frac=0.2,
        toast_unchanged_frac=0.4, truncate_at_frac=0.5, n_shards=2))


def test_two_phase_vectorized():
    # prepared txs (incl. StreamPrepare + RollbackPrepared) must stay on
    # the vectorized path and match the scalar decoder byte-for-byte
    _assert_equivalent(walgen.WalSpec(
        n_convs=50, turns_per_conv=6, update_frac=0.5, delete_frac=0.1,
        two_phase_frac=0.6, two_phase_rollback_frac=0.4,
        streamed_frac=0.4, stream_abort_frac=0.2, n_shards=2))
    _assert_typed_equivalent(walgen.WalSpec(
        n_convs=50, turns_per_conv=6, update_frac=0.5,
        two_phase_frac=0.5, two_phase_rollback_frac=0.3, n_shards=2))


def test_streamed_and_aborted():
    _assert_equivalent(walgen.WalSpec(
        n_convs=50, turns_per_conv=6, streamed_frac=0.5,
        stream_abort_frac=0.3, n_shards=2))


def test_schema_evolution_and_segments():
    _assert_equivalent(walgen.WalSpec(
        n_convs=60, turns_per_conv=6, schema_change_at_frac=0.5,
        segment_rows=120, n_shards=2))


def test_hot_keys_payload():
    _assert_equivalent(walgen.WalSpec(
        n_convs=40, turns_per_conv=6, hot_conv_frac=0.5, payload_bytes=256,
        n_shards=1))


def test_uncommitted_tail_falls_back():
    # an unresolved transaction at segment end must NOT be half-decoded
    _assert_equivalent(walgen.WalSpec(n_convs=20, turns_per_conv=4,
                                      uncommitted_tail=True, n_shards=1),
                       expect_fallback=True)


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.builds(
    walgen.WalSpec,
    n_convs=st.integers(10, 60),
    turns_per_conv=st.integers(2, 8),
    update_frac=st.floats(0, 0.8),
    delete_frac=st.floats(0, 0.3),
    tx_rows=st.integers(5, 80),
    n_shards=st.integers(1, 3),
    seed=st.integers(0, 10_000),
    hot_conv_frac=st.floats(0, 0.6),
    truncate_at_frac=st.one_of(st.none(), st.floats(0.1, 0.9)),
    streamed_frac=st.floats(0, 0.7),
    stream_abort_frac=st.floats(0, 0.5),
    two_phase_frac=st.floats(0, 0.7),
    two_phase_rollback_frac=st.floats(0, 0.5),
    toast_unchanged_frac=st.floats(0, 0.5),
    schema_change_at_frac=st.one_of(st.none(), st.floats(0.1, 0.9)),
    keepalive_every=st.integers(16, 512),
    segment_rows=st.one_of(st.none(), st.integers(50, 200)),
    binary_text=st.booleans(),
    origin_every_tx=st.sampled_from([0, 0, 2, 3, 5]),
    message_every_tx=st.sampled_from([0, 0, 2, 4]),
))
def test_property_random_specs(spec):
    wal = make_wal(spec)
    # origin markers present -> exercise the filtering path (the
    # interesting one); no markers -> default keep-all
    origin_filter = "none" if spec.origin_every_tx else "any"
    for seg_cols in _frames_of(wal):
        ds = PgOutputDecoder(source=0, origin_filter=origin_filter)
        dv = PgOutputDecoder(source=0, origin_filter=origin_filter)
        for col in seg_cols:
            ds.feed_frames(col.to_pylist())
            b = ds.take_batch()
            scalar = pa.Table.from_batches([b] if b else [],
                                           schema=ENVELOPE_SCHEMA)
            out = vdecode.try_decode_segment(dv, col)
            if out is None:
                dv.feed_frames(col.to_pylist())
                bv = dv.take_batch()
                vec = pa.Table.from_batches([bv] if bv else [],
                                            schema=ENVELOPE_SCHEMA)
            else:
                vec = pa.Table.from_batches(list(out),
                                            schema=ENVELOPE_SCHEMA)
            assert scalar.equals(vec), spec.to_json()
        assert ds._next_version == dv._next_version


def test_origin_filter_equivalent():
    """origin='none' drops foreign-marked txs identically on the scalar
    and vectorized paths — plain, prepared, and streamed txs (the streamed
    'O' arrives unprefixed; the segment's open xid identifies the tx)."""
    spec = walgen.WalSpec(n_convs=20, turns_per_conv=6, n_shards=1,
                          tx_rows=10, origin_every_tx=3)
    _assert_equivalent(spec, origin_filter="none")
    _assert_typed_equivalent(spec, origin_filter="none")
    streamed = walgen.WalSpec(n_convs=20, turns_per_conv=6, n_shards=1,
                              tx_rows=10, origin_every_tx=2,
                              streamed_frac=0.5, stream_abort_frac=0.2)
    _assert_equivalent(streamed, origin_filter="none")
    two_phase = walgen.WalSpec(n_convs=20, turns_per_conv=6, n_shards=1,
                               tx_rows=10, origin_every_tx=2,
                               two_phase_frac=0.5,
                               two_phase_rollback_frac=0.25)
    _assert_equivalent(two_phase, origin_filter="none")
    # origin markers present but filter 'any': nothing is dropped and the
    # fast path stays engaged
    _assert_equivalent(spec, origin_filter="any")
