"""Multi-table routing: one WAL stream -> two destination lakes, each with
its own schema and key columns (WalRouter parity, router.rs:40-202)."""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pg_walstream_ray import lake as lakemod
from pg_walstream_ray.pipelines.router import TableRoute, run_cdc_router
from pg_walstream_ray.wire import codec
from pg_walstream_ray.wire.frames import encode_xlogdata

OID_A = 20001   # transcripts-ish, key (conv_id, turn_idx)
OID_B = 20002   # users,           key (id)

REL_A = codec.Relation(OID_A, "public", "chats", "d", [
    codec.ColumnInfo(1, "conv_id", 25, -1),
    codec.ColumnInfo(1, "turn_idx", 23, -1),
    codec.ColumnInfo(0, "text", 25, -1),
])
REL_B = codec.Relation(OID_B, "public", "users", "d", [
    codec.ColumnInfo(1, "id", 20, -1),
    codec.ColumnInfo(0, "name", 25, -1),
])


def f(lsn, msg):
    return encode_xlogdata(lsn, lsn, 0, codec.encode_message(msg))


def tup(*vals):
    return [(b"n", None) if v is None else (b"t", str(v).encode())
            for v in vals]


def build_wal(tmp):
    frames = [
        f(1, codec.Begin(40, 0, 1)),
        f(2, REL_A),
        f(3, REL_B),
        f(4, codec.Insert(OID_A, tup("c1", 0, "hello"))),
        f(5, codec.Insert(OID_A, tup("c1", 1, "world"))),
        f(6, codec.Insert(OID_B, tup(7, "alice"))),
        f(7, codec.Insert(OID_B, tup(8, "bob"))),
        f(40, codec.Commit(0, 40, 41, 0)),
        f(50, codec.Begin(70, 0, 2)),
        f(51, codec.Update(OID_A, b"K", tup("c1", 0, None),
                           tup("c1", 0, "hello2"))),
        f(52, codec.Delete(OID_B, b"K", tup(8, None))),
        f(53, codec.Insert(OID_B, tup(9, "carol"))),
        f(70, codec.Commit(0, 70, 71, 0)),
    ]
    d = os.path.join(tmp, "shard=0000")
    os.makedirs(d)
    pq.write_table(pa.table({
        "lsn": pa.array(range(len(frames)), pa.int64()),
        "frame": pa.array(frames, pa.binary()),
    }), os.path.join(d, "wal.parquet"))
    return tmp


def test_router_two_tables(ray_session):
    wal = build_wal(tempfile.mkdtemp(prefix="rw_"))
    lake_a = tempfile.mkdtemp(prefix="rla_")
    lake_b = tempfile.mkdtemp(prefix="rlb_")
    m = run_cdc_router(wal, [TableRoute(OID_A, lake_a, 4),
                             TableRoute(OID_B, lake_b, 2)])
    assert m["tables"][OID_A]["rows_applied"] == 3
    assert m["tables"][OID_B]["rows_applied"] == 4

    snap_a = lakemod.snapshot_table(
        lake_a, key_cols=("conv_id", "turn_idx")).to_pylist()
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in snap_a] == \
        [("c1", 0, "hello2"), ("c1", 1, "world")]

    snap_b = lakemod.snapshot_table(lake_b, key_cols=("id",)).to_pylist()
    assert [(r["id"], r["name"]) for r in snap_b] == \
        [(7, "alice"), (9, "carol")]          # bob deleted


def test_router_truncate_broadcast(ray_session):
    """A truncate of table A wipes A in every partition; B untouched."""
    tmp = tempfile.mkdtemp(prefix="rwt_")
    frames = [
        f(1, codec.Begin(20, 0, 1)),
        f(2, REL_A),
        f(3, REL_B),
        f(4, codec.Insert(OID_A, tup("c1", 0, "x"))),
        f(5, codec.Insert(OID_A, tup("c2", 0, "y"))),
        f(6, codec.Insert(OID_B, tup(1, "keep"))),
        f(20, codec.Commit(0, 20, 21, 0)),
        f(30, codec.Begin(40, 0, 2)),
        f(31, codec.Truncate(0, [OID_A])),
        f(32, codec.Insert(OID_A, tup("c3", 0, "after"))),
        f(40, codec.Commit(0, 40, 41, 0)),
    ]
    d = os.path.join(tmp, "shard=0000")
    os.makedirs(d)
    pq.write_table(pa.table({
        "lsn": pa.array(range(len(frames)), pa.int64()),
        "frame": pa.array(frames, pa.binary()),
    }), os.path.join(d, "wal.parquet"))

    lake_a = tempfile.mkdtemp(prefix="rta_")
    lake_b = tempfile.mkdtemp(prefix="rtb_")
    run_cdc_router(tmp, [TableRoute(OID_A, lake_a, 4),
                         TableRoute(OID_B, lake_b, 2)])
    snap_a = lakemod.snapshot_table(lake_a).to_pylist()
    assert [(r["conv_id"], r["text"]) for r in snap_a] == [("c3", "after")]
    snap_b = lakemod.snapshot_table(lake_b, key_cols=("id",)).to_pylist()
    assert len(snap_b) == 1 and snap_b[0]["name"] == "keep"


def test_rename_and_retype_evolution_end_to_end(ray_session):
    """Mid-stream Relation diff renames a column and widens another; the
    lake's unified schema keeps the NEWEST name (positional identity) and
    the widest type, with pre-evolution rows preserved under them
    (protocol.rs:1430-1483 diff -> SURVEY.md §1.4 merge rules)."""
    OID = 20003
    rel_v1 = codec.Relation(OID, "public", "ev", "d", [
        codec.ColumnInfo(1, "k", 23, -1),          # int4 key
        codec.ColumnInfo(0, "val", 23, -1),        # int4
        codec.ColumnInfo(0, "tool", 25, -1),       # text
    ])
    rel_v2 = codec.Relation(OID, "public", "ev", "d", [
        codec.ColumnInfo(1, "k", 23, -1),
        codec.ColumnInfo(0, "val", 20, -1),        # retype -> int8
        codec.ColumnInfo(0, "tool_name", 25, -1),  # rename
    ])
    frames = [
        f(1, codec.Begin(20, 0, 1)),
        f(2, rel_v1),
        f(3, codec.Insert(OID, tup(1, 10, "a"))),
        f(4, codec.Insert(OID, tup(2, 20, "b"))),
        f(20, codec.Commit(0, 20, 21, 0)),
        f(30, codec.Begin(50, 0, 2)),
        f(31, rel_v2),
        f(32, codec.Insert(OID, tup(3, 2**40, "c"))),      # needs int8
        f(33, codec.Update(OID, b"K", tup(1, None, None),
                           tup(1, 11, "a2"))),
        f(50, codec.Commit(0, 50, 51, 0)),
    ]
    tmp = tempfile.mkdtemp(prefix="evo_")
    d = os.path.join(tmp, "shard=0000")
    os.makedirs(d)
    pq.write_table(pa.table({
        "lsn": pa.array(range(len(frames)), pa.int64()),
        "frame": pa.array(frames, pa.binary()),
    }), os.path.join(d, "wal.parquet"))

    from pg_walstream_ray.pipelines.router import TableRoute, run_cdc_router

    lake = tempfile.mkdtemp(prefix="evl_")
    run_cdc_router(tmp, [TableRoute(OID, lake, 2)])
    snap = lakemod.snapshot_table(lake, key_cols=("k",))
    assert snap.schema.field("val").type == pa.int64()      # widened
    assert "tool_name" in snap.column_names                 # renamed
    assert "tool" not in snap.column_names
    rows = {r["k"]: r for r in snap.to_pylist()}
    assert rows[1]["val"] == 11 and rows[1]["tool_name"] == "a2"
    assert rows[2]["val"] == 20 and rows[2]["tool_name"] == "b"  # v1 row,
    #                                    preserved under the NEW names/types
    assert rows[3]["val"] == 2**40 and rows[3]["tool_name"] == "c"


def test_toast_unchanged_on_multiple_columns(ray_session):
    """The 'u' (unchanged TOAST) tag carries prior values forward for ANY
    column, not just text — two different columns unchanged in different
    updates of the same key."""
    OID = 20004
    rel = codec.Relation(OID, "public", "t4", "d", [
        codec.ColumnInfo(1, "k", 23, -1),
        codec.ColumnInfo(0, "a", 25, -1),
        codec.ColumnInfo(0, "b", 25, -1),
    ])

    def u():
        return (b"u", None)

    frames = [
        f(1, codec.Begin(30, 0, 1)),
        f(2, rel),
        f(3, codec.Insert(OID, tup(1, "a0", "b0"))),
        # update 1: a set, b unchanged
        f(4, codec.Update(OID, b"K", tup(1, None, None),
                          [(b"t", b"1"), (b"t", b"a1"), u()])),
        # update 2: a unchanged, b set
        f(5, codec.Update(OID, b"K", tup(1, None, None),
                          [(b"t", b"1"), u(), (b"t", b"b2")])),
        f(30, codec.Commit(0, 30, 31, 0)),
    ]
    tmp = tempfile.mkdtemp(prefix="toastm_")
    d = os.path.join(tmp, "shard=0000")
    os.makedirs(d)
    pq.write_table(pa.table({
        "lsn": pa.array(range(len(frames)), pa.int64()),
        "frame": pa.array(frames, pa.binary()),
    }), os.path.join(d, "wal.parquet"))

    lake = tempfile.mkdtemp(prefix="toastl_")
    run_cdc_router(tmp, [TableRoute(OID, lake, 2)])
    snap = lakemod.snapshot_table(lake, key_cols=("k",)).to_pylist()
    assert snap == [{"k": 1, "a": "a1", "b": "b2"}]


def test_generic_table_wal_roundtrip(ray_session):
    """tablegen: any Arrow table -> pgoutput WAL -> router replay -> same
    table back (wide 20-column schema, segmented)."""
    import numpy as np

    from pg_walstream_ray.sources.tablegen import write_table_wal

    n = 2000
    ncols = 20
    OID = 21001
    rel = codec.Relation(OID, "public", "wide", "d", [
        codec.ColumnInfo(1, "id", 20, -1),
        *[codec.ColumnInfo(0, f"c{i:02d}", 25, -1) for i in range(ncols - 1)],
    ])
    rng = np.random.default_rng(3)
    data = {"id": pa.array(np.arange(n, dtype=np.int64))}
    for i in range(ncols - 1):
        data[f"c{i:02d}"] = pa.array(
            [f"v{i}-{x}" for x in rng.integers(0, 1000, n)])
    rows = pa.table(data)

    wal = tempfile.mkdtemp(prefix="gwal_")
    write_table_wal(rows, rel, wal, tx_rows=100, segment_rows=500)
    segs = sorted(os.listdir(os.path.join(wal, "shard=0000")))
    assert sum(1 for s in segs if s.startswith("wal-")) == 4

    lake = tempfile.mkdtemp(prefix="glake_")
    m = run_cdc_router(wal, [TableRoute(OID, lake, 4)])
    assert m["tables"][OID]["rows_applied"] == n
    snap = lakemod.snapshot_table(lake, key_cols=("id",))
    assert snap.num_rows == n
    assert snap.column_names[:1] == ["id"]
    got = snap.to_pydict()
    want = rows.sort_by("id").to_pydict()
    assert got["id"] == want["id"]
    assert got["c07"] == want["c07"]
    assert got["c18"] == want["c18"]
