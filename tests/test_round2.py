"""Round-2 surfaces: hot-key salted apply, lenient dead-letter stats,
throttle combinator, partitioned anti-join building blocks."""
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con(sf=SF):
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem", "customer", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_cdc_hot_key_salted_apply_matches_oracle(ray_session):
    import __ray_entry__ as E

    res = E.queries()["cdc_hot_key"](SF)
    mine = _norm(res.to_pandas())
    oracle = _norm(_con().execute(E.oracle_sql()["cdc_hot_key"]).df())
    pd.testing.assert_frame_equal(mine, oracle)


def test_cdc_hot_key_probe_detects_and_salts(ray_session):
    """The skewed WAL must actually trip the probe (else the query tests
    nothing) and the salted routing must spread each hot conversation over
    multiple partitions."""
    import hashlib
    import os

    from pg_walstream_ray.sources.events_cdc import build_wal_from_events
    from pg_walstream_ray.pipelines.cdc import (build_registry,
                                                discover_shards,
                                                probe_hot_keys)
    from pg_walstream_ray.sources.walgen import TRANSCRIPTS_OID
    from pg_walstream_ray.stages.partition import Partitioner

    key = hashlib.sha1(f"{os.path.abspath(SF)}|hot|1"
                       .encode()).hexdigest()[:12]
    wal = os.path.join("/tmp/pgwr_cdc", f"wal-hot-{key}")
    build_wal_from_events(SF, "hot", wal, n_shards=1)
    sp = discover_shards(wal)
    hot = probe_hot_keys(sp, build_registry(wal, sp), TRANSCRIPTS_OID)
    assert hot == ("c0", "c1", "c2")

    p = Partitioner(8, hot_keys=hot, salt=8)
    t = pa.table({
        "op": pa.array(["insert"] * 64, pa.string()),
        "conv_id": pa.array(["c0"] * 64, pa.string()),
        "turn_idx": pa.array(np.arange(64, dtype=np.int32)),
    })
    pid = p(t)["partition_id"].to_numpy(zero_copy_only=False)
    assert len(np.unique(pid)) > 1          # hot conv fans out
    # same (conv, turn) always lands in ONE partition
    pid2 = p(t)["partition_id"].to_numpy(zero_copy_only=False)
    assert (pid == pid2).all()


def test_cdc_lenient_deadletter_matches_oracle(ray_session):
    import __ray_entry__ as E

    res = E.queries()["cdc_lenient_deadletter"](SF)
    mine = _norm(res.to_pandas())
    oracle = _norm(_con().execute(
        E.oracle_sql()["cdc_lenient_deadletter"]).df())
    assert mine["n_bad"].sum() > 0          # fixture actually injects errors
    pd.testing.assert_frame_equal(mine, oracle)


def test_throttle_caps_release_rate(ray_session):
    import ray.data as rd

    from pg_walstream_ray.pipelines.events import throttle

    n = 3000
    ds = rd.from_items([{"x": i} for i in range(n)],
                       override_num_blocks=4)
    t0 = time.monotonic()
    out = throttle(ds, rows_per_s=2000, batch_size=500).take_all()
    wall = time.monotonic() - t0
    assert len(out) == n
    assert wall >= n / 2000 * 0.8           # paced (some slop for startup)


def test_fast_hash_dedup_equivalent_to_md5(ray_session):
    """hash_mode only changes the hash function, never the dedup result
    (both are collision-free at test scale)."""
    from pg_walstream_ray.pipelines import dedup

    a = _norm(dedup.exact_dedup(SF, hash_mode="fast").to_pandas())
    b = _norm(dedup.exact_dedup(SF, hash_mode="md5").to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_fast_hash_corpus_clean_equivalent_to_md5(ray_session):
    from pg_walstream_ray.pipelines import corpus

    a = _norm(corpus.corpus_clean(SF, hash_mode="fast").to_pandas())
    b = _norm(corpus.corpus_clean(SF, hash_mode="md5").to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_fast_hash_hll_accuracy(ray_session):
    from pg_walstream_ray.pipelines import sketches

    exact = _con().execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT user_id,"
        " date_trunc('day', ts) FROM events)").fetchone()[0]
    approx = int(sketches.approx_user_days(SF)["n_approx"][0])  # fast mode
    assert abs(approx - exact) / exact < 0.05


def test_throttle_noop_without_caps(ray_session):
    import ray.data as rd

    from pg_walstream_ray.pipelines.events import throttle

    ds = rd.from_items([{"x": i} for i in range(10)])
    assert throttle(ds) is ds


def test_logical_messages_transported(ray_session, tmp_path):
    """'M' (pg_logical_emit_message) records ride the full decode stack —
    transactional release with their tx's commit, prefix/content intact —
    including through the vectorized fast path's control scan
    (protocol.rs:985-1053 parity)."""
    import json

    from pg_walstream_ray.pipelines import events
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    spec = WalSpec(n_convs=6, turns_per_conv=8, n_shards=1, tx_rows=10,
                   message_every_tx=3, uncommitted_tail=True)
    write_wal_lake(spec, str(tmp_path))
    ds = events.filter_ops(events.envelope_dataset(str(tmp_path)),
                           ["message"])
    rows = ds.to_pandas()
    assert len(rows) > 0
    metas = [json.loads(m) for m in rows["meta"]]
    for xid, m in zip(rows["xid"], metas):
        assert m["prefix"] == "audit"
        assert bytes.fromhex(m["content_hex"]).decode() == f"tx={xid}"
    # transactional: an uncommitted tail tx's message must NOT release
    n_txs_with_msg = len(rows)
    spec2 = WalSpec(n_convs=6, turns_per_conv=8, n_shards=1, tx_rows=10,
                    message_every_tx=3, uncommitted_tail=False)
    d2 = tmp_path / "committed"
    write_wal_lake(spec2, str(d2))
    rows2 = events.filter_ops(events.envelope_dataset(str(d2)),
                              ["message"]).to_pandas()
    assert len(rows2) >= n_txs_with_msg


def test_window_frame_ntile_small_groups(ray_session, tmp_path):
    """NTILE/moving-frame edge cases the testdata never hits (users with
    fewer events than tiles): exact SQL NTILE semantics vs DuckDB on a
    planted tiny events table (group sizes 1, 2, 3, 5, 9)."""
    import duckdb
    import pyarrow.parquet as pq

    from pg_walstream_ray.pipelines.temporal import events_window_frame

    rows = []
    eid = 0
    for u, n in [(1, 1), (2, 2), (3, 3), (4, 5), (5, 9)]:
        for i in range(n):
            rows.append((eid, np.datetime64("2024-01-01", "us")
                         + np.timedelta64(eid, "m"), u, "click",
                         float(eid % 7) + 0.25, "{}"))
            eid += 1
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = events_window_frame(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = duckdb.sql(f"""
      SELECT event_id, user_id,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS mov_cents,
             CAST(NTILE(4) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS tile
      FROM read_parquet('{tmp_path}/events.parquet')
      ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "mov_cents", "tile"]],
        want, check_dtype=False)


def test_lake_lookup_key_prunes_partitions(ray_session, tmp_path):
    """Point lookup reads only the owning partition chain and equals the
    full-snapshot filter, for both normal and hot (salted) keys."""
    from pg_walstream_ray.lake import lookup_key, snapshot_table
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    wal = str(tmp_path / "wal"); lake = str(tmp_path / "lake")
    spec = WalSpec(n_convs=30, turns_per_conv=6, n_shards=2, tx_rows=20,
                   hot_conv_frac=0.4)
    write_wal_lake(spec, wal, parallel=False)
    run_cdc(wal, lake, num_partitions=8, auto_detect_hot_keys=True)

    snap = snapshot_table(lake).to_pandas()
    assert len(snap)
    import json, os
    cfg = json.load(open(os.path.join(lake, "config.json")))
    # one hot key (conv 0 under hot_conv_frac skew) and one normal key
    targets = ["conv0", snap["conv_id"].iloc[-1]]
    if cfg["hot_keys"]:
        targets[0] = cfg["hot_keys"][0]
    for key in targets:
        got = lookup_key(lake, key).to_pandas()
        want = snap[snap["conv_id"] == key].reset_index(drop=True)
        got = got[want.columns].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_mv_refresh_is_partition_incremental(ray_session, tmp_path):
    """After a second change window, refresh_mv recomputes ONLY the
    partitions whose manifest epoch advanced; the MV equals a group-by
    over the lake snapshot either way."""
    from pg_walstream_ray.lake import read_mv, refresh_mv, snapshot_table
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    import numpy as np

    from pg_walstream_ray.sources.walgen import shard_logical_changes

    wal = str(tmp_path / "wal"); lake = str(tmp_path / "lake")
    mv = str(tmp_path / "mv")
    # insert-only, conv-major event order: the tail of the LSN space
    # touches only the LAST conversations -> few partitions advance
    spec = WalSpec(n_convs=40, turns_per_conv=5, n_shards=2, tx_rows=5,
                   update_frac=0.0, delete_frac=0.0)
    write_wal_lake(spec, wal, parallel=False)
    lsns = np.concatenate([
        shard_logical_changes(spec, s)["lsn"].to_numpy(
            zero_copy_only=False) for s in range(2)])
    mid = int(np.quantile(lsns, 0.85))
    # ~85% replay -> full MV build
    run_cdc(wal, lake, num_partitions=32, stop_at_lsn=mid)
    r1 = refresh_mv(lake, mv)
    assert r1["refreshed"] == r1["partitions"] > 0
    # no new data: refresh is a complete no-op
    r2 = refresh_mv(lake, mv)
    assert r2["refreshed"] == 0
    # the remaining tail of the stream touches only the last conversations
    applied = run_cdc(wal, lake, num_partitions=32)["rows_applied"]
    assert applied > 0
    r3 = refresh_mv(lake, mv)
    assert 0 < r3["refreshed"] < r3["partitions"]
    # MV == group-by over the live snapshot
    snap = snapshot_table(lake).to_pandas()
    want = snap.groupby("conv_id", as_index=False).agg(
        n_turns=("turn_idx", "size")).sort_values("conv_id") \
        .reset_index(drop=True)
    got = read_mv(mv).to_pandas()[["conv_id", "n_turns"]] \
        .sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_snapshot_column_pushdown(ray_session, tmp_path):
    """snapshot_table/snapshot_dataset with columns= prune the fragment
    reads but return the same values as a post-hoc projection."""
    from pg_walstream_ray.lake import snapshot_dataset, snapshot_table
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    wal = str(tmp_path / "wal"); lake = str(tmp_path / "lake")
    spec = WalSpec(n_convs=12, turns_per_conv=4, n_shards=1, tx_rows=10,
                   delete_frac=0.1)
    write_wal_lake(spec, wal, parallel=False)
    run_cdc(wal, lake, num_partitions=4)

    full = snapshot_table(lake).to_pandas()
    pruned = snapshot_table(lake, columns=["role"]).to_pandas()
    assert set(pruned.columns) == {"conv_id", "turn_idx", "role"}
    pd.testing.assert_frame_equal(
        pruned.reset_index(drop=True),
        full[["conv_id", "turn_idx", "role"]].reset_index(drop=True))

    ds = snapshot_dataset(lake, columns=["role"]).to_pandas()
    assert set(ds.columns) == {"conv_id", "turn_idx", "role"}
    assert len(ds) == len(full)


def test_poll_envelopes_generator(ray_session, tmp_path):
    """Pull-based consumption (examples/polling parity): the generator
    yields every DML envelope row exactly once, caller-paced."""
    from pg_walstream_ray.pipelines.events import poll_envelopes
    from pg_walstream_ray.sources.walgen import (WalSpec,
                                                 shard_logical_changes,
                                                 write_wal_lake)

    wal = str(tmp_path / "wal")
    spec = WalSpec(n_convs=10, turns_per_conv=5, n_shards=2)
    write_wal_lake(spec, wal, parallel=False)
    total = 0
    for batch in poll_envelopes(wal, batch_size=64,
                                ops=["insert", "update", "delete"]):
        assert batch.num_rows <= 64
        total += batch.num_rows
    oracle = sum(shard_logical_changes(spec, s).num_rows for s in range(2))
    assert total == oracle


def test_mv_refresh_crash_rerunnable(ray_session, tmp_path):
    """A refresh interrupted after part writes but BEFORE the MV manifest
    publish re-runs cleanly and converges to the same MV (atomic
    tmp+rename parts, manifest-last)."""
    import json
    import os

    from pg_walstream_ray.lake import read_mv, refresh_mv
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    wal = str(tmp_path / "wal"); lake = str(tmp_path / "lake")
    mv = str(tmp_path / "mv")
    spec = WalSpec(n_convs=10, turns_per_conv=4, n_shards=1, tx_rows=10)
    write_wal_lake(spec, wal, parallel=False)
    run_cdc(wal, lake, num_partitions=4)
    refresh_mv(lake, mv)
    want = read_mv(mv).to_pandas()
    # simulate the crash window: manifest lost, part files remain
    os.remove(os.path.join(mv, "mv_manifest.json"))
    r = refresh_mv(lake, mv)
    assert r["refreshed"] == r["partitions"]     # re-did the lost work
    got = read_mv(mv).to_pandas()
    pd.testing.assert_frame_equal(got, want)


def _env_batch(rows):
    """rows: (source, commit_ts_us, conv) -> minimal envelope table."""
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.int32()),
        "commit_ts_us": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array(["insert"] * len(rows), pa.string()),
        "after_values": pa.array([[r[2]] for r in rows],
                                 pa.list_(pa.string())),
        "before_values": pa.array([None] * len(rows),
                                  pa.list_(pa.string())),
    })


def test_stream_windows_progressive_and_late():
    """Watermark semantics: windows finalize as soon as every source's
    watermark passes (NOT at stream end); rows behind a finalized window
    are dropped and counted."""
    from pg_walstream_ray.pipelines.streaming import (
        TumblingWindowAggregator)

    agg = TumblingWindowAggregator(width_us=100, sources=[0, 1])
    # both sources fill window [0,100); source watermarks reach 150
    out1 = agg.ingest(_env_batch([(0, 10, "a"), (1, 20, "b"),
                                  (0, 150, "c"), (1, 160, "a")]))
    # window 0 closed mid-stream (progressive emission)
    assert [w["window_start_us"] for w in out1] == [0]
    assert out1[0]["n_events"] == 2 and out1[0]["n_convs"] == 2
    # a row for the already-finalized window 0 is late -> dropped
    out2 = agg.ingest(_env_batch([(0, 30, "z")]))
    assert out2 == [] and agg.late_dropped == 1
    # flush closes the open [100,200) window; the late row never counted
    rest = agg.flush()
    assert [w["window_start_us"] for w in rest] == [100]
    assert rest[0]["n_events"] == 2
    tbl = agg.result_table()
    assert tbl["n_events"].to_pylist() == [2, 2]


def test_stream_windows_lateness_grace():
    """allowed_lateness keeps windows open past the watermark: the same
    out-of-order row is ACCEPTED under a sufficient grace period."""
    from pg_walstream_ray.pipelines.streaming import (
        TumblingWindowAggregator)

    agg = TumblingWindowAggregator(width_us=100, sources=[0, 1],
                                   lateness_us=100)
    agg.ingest(_env_batch([(0, 10, "a"), (1, 20, "b"),
                           (0, 150, "c"), (1, 160, "a")]))
    assert agg.emitted == []                 # grace holds window 0 open
    out = agg.ingest(_env_batch([(0, 30, "z")]))   # accepted, not late
    assert agg.late_dropped == 0 and out == []
    agg.ingest(_env_batch([(0, 260, "x"), (1, 270, "y")]))
    done = {w["window_start_us"]: w for w in agg.emitted}
    assert done[0]["n_events"] == 3 and done[0]["n_convs"] == 3


def test_stream_hopping_windows():
    """Hopping width=200/slide=100: every event lands in TWO overlapping
    windows; finalization waits for start + WIDTH (not + slide), and a
    row behind a finalized window is late for that window only."""
    from pg_walstream_ray.pipelines.streaming import (
        HoppingWindowAggregator)

    agg = HoppingWindowAggregator(width_us=200, slide_us=100,
                                  sources=[0, 1])
    # events at 10 (windows -100 and 0) and 120 (windows 0 and 100)
    out1 = agg.ingest(_env_batch([(0, 10, "a"), (1, 120, "b")]))
    # watermark = min(10, 120) = 10: nothing final yet
    assert out1 == []
    out2 = agg.ingest(_env_batch([(0, 130, "c"), (1, 310, "d")]))
    # watermark 130: window [-100, 100) finalizes with the single event
    assert [w["window_start_us"] for w in out2] == [-100]
    assert out2[0]["n_events"] == 1 and out2[0]["n_convs"] == 1
    rest = agg.flush()
    done = {w["window_start_us"]: w for w in agg.emitted}
    # window [0,200): events 10, 120, 130 from convs a,b,c
    assert done[0]["n_events"] == 3 and done[0]["n_convs"] == 3
    # window [100,300): events 120, 130
    assert done[100]["n_events"] == 2
    # windows [200,400) and [300,500): event 310
    assert done[200]["n_events"] == 1 and done[300]["n_events"] == 1
    assert len(rest) == 4 and agg.late_dropped == 0


def test_stream_hopping_late_rows():
    from pg_walstream_ray.pipelines.streaming import (
        HoppingWindowAggregator)

    agg = HoppingWindowAggregator(width_us=200, slide_us=100,
                                  sources=[0, 1])
    agg.ingest(_env_batch([(0, 10, "a"), (1, 350, "b"),
                           (0, 360, "c")]))
    # watermark 350: windows [-100,100) and [0,200) final
    done = sorted(w["window_start_us"] for w in agg.emitted)
    assert done == [-100, 0]
    # a row at 30 belongs to both finalized windows: late twice
    agg.ingest(_env_batch([(1, 30, "z")]))
    assert agg.late_dropped == 2


def test_stream_windows_approx_distinct():
    """distinct_mode='approx' (per-window HLL registers, fixed 4 KiB
    state) tracks the exact distinct-conv counts within HLL tolerance
    (~1.6% rel. std at p=12; assert 5%), with n_events identical."""
    from pg_walstream_ray.pipelines.streaming import (
        TumblingWindowAggregator)

    rng = np.random.default_rng(7)
    # 3 windows x ~4000 distinct convs, convs repeat within a window
    rows = []
    for w in range(3):
        convs = [f"c{w}_{i}" for i in range(4000)]
        for c in rng.choice(convs, size=6000, replace=True):
            rows.append((0, w * 1000 + int(rng.integers(0, 1000)), c))
    rows.sort(key=lambda r: r[1])
    exact = TumblingWindowAggregator(width_us=1000, sources=[0])
    approx = TumblingWindowAggregator(width_us=1000, sources=[0],
                                      distinct_mode="approx")
    for lo in range(0, len(rows), 4096):
        batch = _env_batch(rows[lo:lo + 4096])
        exact.ingest(batch)
        approx.ingest(batch)
    te = {r["window_start_us"]: r for r in exact.flush() + exact.emitted}
    ta = {r["window_start_us"]: r for r in approx.flush() + approx.emitted}
    assert set(te) == set(ta) and len(te) == 3
    for w, er in te.items():
        ar = ta[w]
        assert ar["n_events"] == er["n_events"]
        assert abs(ar["n_convs"] - er["n_convs"]) <= 0.05 * er["n_convs"]


def test_stream_checkpoint_restore():
    """Flink-style state checkpointing: serialize mid-stream, restore
    into a FRESH aggregator, continue — byte-identical results to the
    uninterrupted run, for all three aggregator kinds (exact + approx
    tumbling, top-k, sessions).  The checkpoint round-trips pickle."""
    import pickle

    from pg_walstream_ray.pipelines.streaming import (
        StreamSessionizer, TumblingWindowAggregator, WindowTopKAggregator)

    rng = np.random.default_rng(11)
    rows = sorted(
        ((int(rng.integers(0, 2)), int(t), f"c{int(rng.integers(0, 40))}")
         for t in rng.integers(0, 5000, size=2000)),
        key=lambda r: r[1])
    batches = [_env_batch(rows[lo:lo + 200])
               for lo in range(0, len(rows), 200)]

    makers = [
        lambda: TumblingWindowAggregator(width_us=500, sources=[0, 1]),
        lambda: TumblingWindowAggregator(width_us=500, sources=[0, 1],
                                         distinct_mode="approx"),
        lambda: WindowTopKAggregator(width_us=500, sources=[0, 1], k=3),
        lambda: StreamSessionizer(gap_us=40),
    ]
    for make in makers:
        base = make()
        for b in batches:
            base.ingest(b)
        base.flush()
        want = base.result_table()

        half = make()
        for b in batches[:5]:
            half.ingest(b)
        ckpt = pickle.loads(pickle.dumps(half.state_dict()))
        resumed = make()
        resumed.load_state(ckpt)
        for b in batches[5:]:
            resumed.ingest(b)
        resumed.flush()
        assert resumed.result_table().equals(want), type(base).__name__
        assert getattr(resumed, "late_dropped", 0) == \
            getattr(base, "late_dropped", 0)


def test_stream_sessions_per_source_independence():
    """A conversation's session closes against ITS source's watermark —
    a lagging other source does not delay it (key->source affinity)."""
    from pg_walstream_ray.pipelines.streaming import StreamSessionizer

    agg = StreamSessionizer(gap_us=50)
    # conv a (source 0): events at 10, 20; source 0 watermark runs to 200
    # conv b (source 1): event at 15; source 1 stuck at 15
    agg.ingest(_env_batch([(0, 10, "a"), (1, 15, "b"), (0, 20, "a")]))
    out = agg.ingest(_env_batch([(0, 200, "c")]))
    done = {w["conv_id"] for w in out}
    assert "a" in done                     # closed by source-0 watermark
    assert "b" not in done                 # source 1 hasn't advanced
    a = [w for w in out if w["conv_id"] == "a"][0]
    assert a["session_start_us"] == 10 and a["session_end_us"] == 20
    assert a["n_events"] == 2
    rest = agg.flush()
    assert {w["conv_id"] for w in rest} == {"b", "c"}


def _env_batch_ops(rows):
    """rows: (source, commit_ts_us, conv, op) — deletes carry the key in
    before_values ONLY (real pgoutput delete shape)."""
    ops = [r[3] for r in rows]
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.int32()),
        "commit_ts_us": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array(ops, pa.string()),
        "after_values": pa.array(
            [None if o == "delete" else [r[2]]
             for r, o in zip(rows, ops)], pa.list_(pa.string())),
        "before_values": pa.array(
            [[r[2]] if o == "delete" else None
             for r, o in zip(rows, ops)], pa.list_(pa.string())),
    })


def test_stream_sessions_delete_key_fallback():
    """DELETE envelopes carry only before_values: the sessionizer must key
    them on the before tuple, not group them under a None conv (which
    broke flush()'s sorted() with a TypeError)."""
    from pg_walstream_ray.pipelines.streaming import StreamSessionizer

    agg = StreamSessionizer(gap_us=50)
    agg.ingest(_env_batch_ops([(0, 10, "a", "insert"),
                               (0, 20, "a", "delete"),
                               (0, 30, "b", "delete")]))
    rest = agg.flush()
    got = {(w["conv_id"], w["n_events"]) for w in rest}
    assert got == {("a", 2), ("b", 1)}


def test_stream_windows_delete_key_fallback():
    from pg_walstream_ray.pipelines.streaming import TumblingWindowAggregator

    agg = TumblingWindowAggregator(width_us=100, sources=[0])
    agg.ingest(_env_batch_ops([(0, 10, "a", "insert"),
                               (0, 20, "b", "delete")]))
    out = agg.flush()
    assert out[0]["n_events"] == 2 and out[0]["n_convs"] == 2


def test_sessionizer_vectorized_multi_segment_batch():
    """One batch carrying several gap-separated segments of the same conv:
    the segment scan must emit the middle segments and keep only the last
    open — and stitch the first onto a compatible open session."""
    from pg_walstream_ray.pipelines.streaming import StreamSessionizer

    agg = StreamSessionizer(gap_us=10)
    agg.ingest(_env_batch([(0, 100, "a")]))            # opens a@100
    agg.ingest(_env_batch([(0, 105, "a"), (0, 108, "b"),
                           (0, 200, "a"), (0, 205, "a"),
                           (0, 300, "a")]))
    # a@100-105 stitched then closed by the in-batch gap; a@200-205 closed
    emitted = {(w["conv_id"], w["session_start_us"], w["session_end_us"],
                w["n_events"]) for w in agg.emitted}
    assert ("a", 100, 105, 2) in emitted
    assert ("a", 200, 205, 2) in emitted
    # b@108 was evicted mid-stream by the source watermark (300 > 108+gap)
    assert ("b", 108, 108, 1) in emitted
    rest = agg.flush()
    got = {(w["conv_id"], w["session_start_us"], w["n_events"])
           for w in rest}
    assert got == {("a", 300, 1)}


def test_sharded_streaming_matches_single(ray_session, tmp_path):
    """The N-actor conv-routed deployment must produce exactly the single
    consumer's windows and sessions (upsert_delete WAL: exercises the
    delete-key fallback through the routed path too)."""
    from pg_walstream_ray.pipelines.streaming import (stream_sessions,
                                                      stream_windows)
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    wal = str(tmp_path / "wal")
    build_wal_from_events("/root/testdata/sf0.001", "upsert_delete", wal,
                          n_shards=2)

    single_w = stream_windows(wal, 4096, n_sources=2).result_table()
    shard_w = stream_windows(wal, 4096, n_sources=2,
                             n_actors=3).result_table()
    assert shard_w.equals(single_w.sort_by("window_start_us"))

    single_s = stream_sessions(wal, 500).result_table()
    shard_s = stream_sessions(wal, 500, n_actors=3).result_table()
    assert shard_s.equals(single_s)


def test_sharded_topk_matches_single(ray_session, tmp_path):
    """Windowed heavy hitters: the N-actor deployment must equal the
    single consumer exactly (convs are actor-disjoint, so per-actor
    top-k merge + re-cut is lossless), including the delete-key path."""
    from pg_walstream_ray.pipelines.streaming import stream_window_topk
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    wal = str(tmp_path / "wal")
    build_wal_from_events("/root/testdata/sf0.001", "upsert_delete", wal,
                          n_shards=2)

    single = stream_window_topk(wal, 4096, n_sources=2, k=3) \
        .result_table()
    sharded = stream_window_topk(wal, 4096, n_sources=2, k=3,
                                 n_actors=3).result_table()
    assert sharded.equals(single)
    # the cut is a real cut: no window carries more than k rows
    import collections
    per_w = collections.Counter(
        single["window_start_us"].to_pylist())
    assert per_w and max(per_w.values()) <= 3


def test_pagerank_invariants(ray_session):
    """Stochasticity (sum 1), symmetry within identical-degree groups,
    hub dominance on a star graph, and a nonempty corpus run."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pg_walstream_ray.pipelines.dedup import (dedup_pagerank,
                                                  pagerank)

    pairs = rd.from_arrow(pa.table({
        "vec_a": pa.array([0, 0, 0, 0, 0, 10], pa.int64()),
        "vec_b": pa.array([1, 2, 3, 4, 5, 11], pa.int64())}))
    r = pagerank(pairs, iters=20).to_pandas().set_index("node")["rank"]
    assert abs(r.sum() - 1.0) < 1e-9
    assert (r > 0).all()
    assert r[0] > 2 * r[1]                      # hub dominates spokes
    spokes = r[[1, 2, 3, 4, 5]]
    assert spokes.max() - spokes.min() < 1e-12  # symmetric group equal
    assert abs(r[10] - r[11]) < 1e-12

    out = dedup_pagerank("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert abs(out["rank"].sum() - 1.0) < 1e-6
