"""Invariant tests for the round-3 session operators: changefeed sequence
contract, windowed funnel monotonicity, cohort-LTV accumulation, band
lookup totals, turn latency vs a brute-force recompute, conversation-level
near-dup consistency.  Exact-value correctness is covered by the DuckDB
oracles (tools/check_correctness.py); these tests pin the operator
CONTRACTS that the oracles cannot see (contiguity, ordering, additivity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _as_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def test_changefeed_seq_contiguous_and_lsn_ordered(ray_session):
    import __ray_entry__ as e

    df = _as_df(e.queries()["cdc_changefeed"](SF))
    assert len(df) > 0
    for src, g in df.groupby("source"):
        s = g.sort_values("seq")
        # contiguous 1..N per source (the outbox contract: gaps mean loss)
        assert s["seq"].to_numpy().tolist() == list(range(1, len(s) + 1))
        # seq order IS lsn (commit) order
        assert np.all(np.diff(s["lsn"].to_numpy(np.int64)) > 0)


def test_funnel_windowed_monotone_and_bounded(ray_session):
    from pg_walstream_ray.pipelines.temporal import (events_funnel,
                                                     funnel_windowed)

    df = _as_df(funnel_windowed(SF)).sort_values("step_idx")
    n = df["n_users"].to_numpy(np.int64)
    assert len(n) == 3
    # funnel counts can only shrink down the cascade
    assert np.all(np.diff(n) <= 0)
    # the windowed funnel is a strict subset of the unconstrained funnel
    base = _as_df(events_funnel(SF))
    for depth in (1, 2, 3):
        assert n[depth - 1] <= int((base["reached"] >= depth).sum())


def test_funnel_window_tightens(ray_session):
    from pg_walstream_ray.pipelines.temporal import funnel_windowed

    wide = _as_df(funnel_windowed(SF, window_days=3650)) \
        .sort_values("step_idx")["n_users"].to_numpy(np.int64)
    tight = _as_df(funnel_windowed(SF, window_days=1)) \
        .sort_values("step_idx")["n_users"].to_numpy(np.int64)
    assert np.all(tight <= wide)
    assert tight[0] == wide[0]           # step 1 has no window constraint


def test_cohort_ltv_cum_is_running_sum(ray_session):
    from pg_walstream_ray.pipelines.temporal import cohort_ltv

    df = _as_df(cohort_ltv(SF))
    assert len(df) > 0
    for cw, g in df.groupby("cohort_week"):
        s = g.sort_values("week_offset")
        assert np.array_equal(s["cum_cents"].to_numpy(np.int64),
                              np.cumsum(s["wk_cents"].to_numpy(np.int64)))
        assert np.all(np.diff(s["week_offset"].to_numpy(np.int64)) > 0)


def test_band_lookup_totals(ray_session):
    import os

    from pg_walstream_ray.pipelines.analytics import value_band_lookup

    df = _as_df(value_band_lookup(SF))
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["value"])
    cents = np.rint(ev["value"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
    in_range = int((cents >= 0).sum())
    assert int(df["n_events"].sum()) == in_range
    assert int(df["sum_cents"].sum()) == int(cents[cents >= 0].sum())


def test_turn_latency_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    state = _as_df(q["cdc_upsert_lww"](SF))
    got = _as_df(q["cdc_turn_latency"](SF)).sort_values("conv_id") \
        .reset_index(drop=True)

    # brute force: per conv sorted by turn_idx, gaps into assistant rows
    rows = []
    for conv, g in state.groupby("conv_id"):
        s = g.sort_values("turn_idx")
        ts = s["ts"].to_numpy("datetime64[us]").astype(np.int64)
        rl = s["role"].to_numpy(object)
        gaps = [ts[i] - ts[i - 1] for i in range(1, len(ts))
                if rl[i] == "assistant"]
        if gaps:
            rows.append((conv, len(gaps), int(sum(gaps)), int(max(gaps))))
    want = pd.DataFrame(rows, columns=["conv_id", "n_responses",
                                       "total_gap_us", "max_gap_us"]) \
        .sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_responses": np.int64, "total_gap_us": np.int64,
                    "max_gap_us": np.int64}), want.astype(
            {"n_responses": np.int64, "total_gap_us": np.int64,
             "max_gap_us": np.int64}))


def test_conv_near_dup_consistent_with_doc_minhash(ray_session):
    """The conversation-level composite must agree with running the
    generic minhash flags over the exported docs directly (same band
    keys, same keeper rule) — and flag at least the exact-duplicate
    conversations (identical docs collide in every band)."""
    import __ray_entry__ as e

    q = e.queries()
    flags = _as_df(q["cdc_conv_near_dup"](SF))
    docs = _as_df(q["cdc_export_conversations"](SF))
    assert set(flags["conv_id"]) == set(docs["conv_id"])

    dup_docs = docs[docs.duplicated("doc", keep=False)]
    if len(dup_docs):
        by_doc = dup_docs.groupby("doc")["conv_id"].apply(
            lambda s: sorted(s, key=lambda c: int(c[1:])))
        flagged = set(flags[flags["is_dup"]]["conv_id"])
        for convs in by_doc:
            # all but the smallest-id copy must be flagged
            assert set(convs[1:]) <= flagged


def test_tool_stats_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    state = _as_df(q["cdc_upsert_lww"](SF))
    got = _as_df(q["cdc_tool_stats"](SF)).sort_values("tool") \
        .reset_index(drop=True)

    t = state[state["tool"].notna()]
    want = t.groupby("tool").agg(
        n_calls=("conv_id", "size"), n_convs=("conv_id", "nunique"),
        sum_turn_idx=("turn_idx", "sum")).reset_index() \
        .sort_values("tool").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_calls": np.int64, "n_convs": np.int64,
                    "sum_turn_idx": np.int64}),
        want.astype({"n_calls": np.int64, "n_convs": np.int64,
                     "sum_turn_idx": np.int64}))


def test_context_windows_matches_bruteforce(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    state = _as_df(q["cdc_upsert_lww"](SF))
    got = _as_df(q["cdc_context_windows"](SF)) \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["ctx_turns"] <= 4).all()
    assert (got["ctx_chars"] >= 0).all()

    rows = []
    for conv, g in state.groupby("conv_id"):
        s = g.sort_values("turn_idx")
        texts = s["text"].to_numpy(object)
        roles = s["role"].to_numpy(object)
        tis = s["turn_idx"].to_numpy(np.int64)
        for i in range(len(s)):
            if roles[i] != "assistant":
                continue
            lo = max(0, i - 4)
            rows.append((conv, int(tis[i]), i - lo,
                         int(sum(len(t) for t in texts[lo:i]))))
    want = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                       "ctx_turns", "ctx_chars"]) \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": np.int64, "ctx_turns": np.int64,
                    "ctx_chars": np.int64}),
        want.astype({"turn_idx": np.int64, "ctx_turns": np.int64,
                     "ctx_chars": np.int64}))


def test_gdpr_purge_erases_and_does_not_resurrect(ray_session):
    """Purged keys must be gone from the final state, everything else
    byte-identical to the unpurged LWW state — and a REPLAY of the same
    WAL over the purged lake must apply nothing (the exactly-once guard
    is what keeps erased keys erased across restarts)."""
    import hashlib as _hl
    import os as _os
    import tempfile as _tf
    import shutil as _sh

    import __ray_entry__ as e
    from pg_walstream_ray.lake import purge_keys, snapshot_table
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    q = e.queries()
    base = _as_df(q["cdc_upsert_lww"](SF))
    purged = _as_df(q["cdc_gdpr_purge"](SF))
    doomed = {c for c in base["conv_id"].unique() if int(c[1:]) % 13 == 0}
    assert doomed, "fixture must contain at least one purge target"
    assert set(purged["conv_id"]).isdisjoint(doomed)
    keep = base[~base["conv_id"].isin(doomed)]
    assert len(purged) == len(keep)

    # no-resurrection: replay the same WAL onto a purged lake -> no-op
    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    lake = _tf.mkdtemp(prefix="pgwr_purge_replay_")
    try:
        run_cdc(wal_dir, lake, num_partitions=4)
        convs = snapshot_table(lake, sort=False, columns=["conv_id"])
        uniq = set(convs["conv_id"].to_pylist())
        target = sorted(c for c in uniq if int(c[1:]) % 13 == 0)
        purge_keys(lake, target)
        before = snapshot_table(lake)
        run_cdc(wal_dir, lake, num_partitions=4)   # resume, same WAL
        after = snapshot_table(lake)
        assert before.equals(after)
        assert set(after["conv_id"].to_pylist()).isdisjoint(target)
    finally:
        _sh.rmtree(lake, ignore_errors=True)


def test_deadletter_repair_restores_clean_state(ray_session):
    """Quarantine + repair == never-corrupted evolve replay; the repair
    merge is idempotent (second run is a no-op)."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import __ray_entry__ as e
    from pg_walstream_ray.lake import snapshot_table
    from pg_walstream_ray.pipelines.cdc import (reprocess_deadletters,
                                                run_cdc_quarantine)
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|dirty|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-dirty-{key}")
    build_wal_from_events(SF, "dirty", wal_dir, n_shards=2)
    lake = _tf.mkdtemp(prefix="pgwr_dltest_lake_")
    dl = _tf.mkdtemp(prefix="pgwr_dltest_dlq_")
    try:
        stats = run_cdc_quarantine(wal_dir, lake, dl, num_partitions=4)
        assert stats["dl_files"] > 0
        # every quarantined score cell carries the corruption signature
        import pyarrow.parquet as _pq
        for f in _os.listdir(dl):
            t = _pq.read_table(_os.path.join(dl, f))
            for vals in t["after_values"].to_pylist():
                assert len(vals) >= 7 and vals[6].startswith("x")
        pre = snapshot_table(lake)
        assert "score" in pre.column_names

        r1 = reprocess_deadletters(dl, lake, e._repair_score_cells,
                                   wal_dir)
        assert r1["repaired"] > 0
        after1 = snapshot_table(lake)
        # repaired state == the clean evolve replay
        want = e.queries()["cdc_schema_evolution"](SF)
        a = after1.select(want.column_names).to_pandas() \
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        w = want.to_pandas().sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, w)
        # idempotent: merging the same DL set again changes nothing
        reprocess_deadletters(dl, lake, e._repair_score_cells, wal_dir)
        assert snapshot_table(lake).equals(after1)
    finally:
        _sh.rmtree(lake, ignore_errors=True)
        _sh.rmtree(dl, ignore_errors=True)


def test_repair_merge_does_not_resurrect_tombstones(ray_session):
    """A repaired row OLDER than an existing tombstone must stay dead; a
    repaired row NEWER than the tombstone resurrects the key."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as _pq
    from pg_walstream_ray.lake import write_lake_config
    from pg_walstream_ray.pipelines.cdc import _repair_merge_partition
    from pg_walstream_ray.state.manifest import (PartitionManifest,
                                                 partition_dir,
                                                 write_manifest_atomic)

    lake = _tf.mkdtemp(prefix="pgwr_tombtest_")
    try:
        write_lake_config(lake, 1)
        d = partition_dir(lake, 0)
        _os.makedirs(d, exist_ok=True)
        frag = pa.table({
            "conv_id": pa.array(["cA", "cB"]),
            "turn_idx": pa.array([1, 1], pa.int32()),
            "text": pa.array([None, None], pa.string()),
            "_lsn": pa.array([100, 100], pa.int64()),
            "_tombstone": pa.array([True, True])})
        _pq.write_table(frag, _os.path.join(d, "fragment-000001-x.parquet"))
        m = PartitionManifest(partition_id=0, row_count=0,
                              fragments=["fragment-000001-x.parquet"],
                              epoch=1)
        write_manifest_atomic(lake, m)

        def typed(conv, lsn):
            return pa.table({
                "source": pa.array([0], pa.int64()),
                "lsn": pa.array([lsn], pa.int64()),
                "commit_lsn": pa.array([lsn], pa.int64()),
                "op": pa.array(["insert"]),
                "rel_version": pa.array([1], pa.int32()),
                "conv_id": pa.array([conv]),
                "turn_idx": pa.array([1], pa.int32()),
                "text": pa.array(["fixed"]),
                "_unchanged_conv_id": pa.array([False]),
                "_unchanged_turn_idx": pa.array([False]),
                "_unchanged_text": pa.array([False]),
                "partition_id": pa.array([0], pa.int32())})

        # cA repaired at lsn 50 (< tombstone 100): stays dead
        # cB repaired at lsn 150 (> tombstone 100): resurrects
        group = pa.concat_tables([typed("cA", 50), typed("cB", 150)])
        n = _repair_merge_partition(lake, 0, group)
        assert n == 1
        state = _pq.read_table(_os.path.join(
            d, [f for f in _os.listdir(d)
                if f.startswith("fragment-000002")][0]))
        assert state["conv_id"].to_pylist() == ["cB"]
        assert state["text"].to_pylist() == ["fixed"]
    finally:
        _sh.rmtree(lake, ignore_errors=True)


def test_update_diffs_excludes_delete_gaps(ray_session):
    """A version following a DELETE is a re-insert, not an update — the
    diff stream must emit only contiguous transitions (predecessor's
    valid_to == successor's valid_from)."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as _pq
    import ray as _ray
    from pg_walstream_ray.lake import update_diffs, write_lake_config
    from pg_walstream_ray.state.manifest import (PartitionManifest,
                                                 partition_dir,
                                                 write_manifest_atomic)

    lake = _tf.mkdtemp(prefix="pgwr_diffgap_")
    try:
        write_lake_config(lake, 1, sink="history")
        d = partition_dir(lake, 0)
        _os.makedirs(d, exist_ok=True)
        frag = pa.table({
            "lsn": pa.array([10, 20, 30, 40], pa.int64()),
            "op": pa.array(["insert", "update", "delete", "insert"]),
            "conv_id": pa.array(["cA"] * 4),
            "turn_idx": pa.array([1] * 4, pa.int32()),
            "text": pa.array(["a", "b", None, "c"]),
            "_unchanged_conv_id": pa.array([False] * 4),
            "_unchanged_turn_idx": pa.array([False] * 4),
            "_unchanged_text": pa.array([False] * 4)})
        _pq.write_table(frag, _os.path.join(d, "fragment-000001-h.parquet"))
        m = PartitionManifest(partition_id=0, row_count=4,
                              fragments=["fragment-000001-h.parquet"],
                              epoch=1)
        write_manifest_atomic(lake, m)

        tables = [t for t in _ray.get(update_diffs(lake).to_arrow_refs())
                  if t.num_rows]
        got = pa.concat_tables(tables).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["lsn"], r["old_text"], r["new_text"]) == (20, "a", "b")
    finally:
        _sh.rmtree(lake, ignore_errors=True)


def test_lake_stats_merges_int_extremes_numerically(ray_session):
    """Partition A max turn_idx 9, partition B max 10: a lexicographic
    merge would answer "9"; the type-aware merge must answer "10"."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as _pq
    import ray as _ray
    from pg_walstream_ray.lake import lake_stats, write_lake_config
    from pg_walstream_ray.state.manifest import (PartitionManifest,
                                                 partition_dir,
                                                 write_manifest_atomic)

    lake = _tf.mkdtemp(prefix="pgwr_statstest_")
    try:
        write_lake_config(lake, 2)
        for pid, turns in ((0, [2, 9]), (1, [10, 3])):
            d = partition_dir(lake, pid)
            _os.makedirs(d, exist_ok=True)
            frag = pa.table({
                "conv_id": pa.array([f"c{pid}"] * 2),
                "turn_idx": pa.array(turns, pa.int32()),
                "text": pa.array(["x", None]),
                "_lsn": pa.array([1, 2], pa.int64())})
            _pq.write_table(frag,
                            _os.path.join(d, "fragment-000001-s.parquet"))
            m = PartitionManifest(partition_id=pid, row_count=2,
                                  fragments=["fragment-000001-s.parquet"],
                                  epoch=1)
            write_manifest_atomic(lake, m)
        stats = pa.concat_tables(
            [t for t in _ray.get(lake_stats(lake).to_arrow_refs())
             if t.num_rows]).to_pandas().set_index("col_name")
        assert stats.loc["turn_idx", "min_str"] == "2"
        assert stats.loc["turn_idx", "max_str"] == "10"
        assert int(stats.loc["text", "n_null"]) == 2
        assert int(stats.loc["turn_idx", "n_rows"]) == 4
    finally:
        _sh.rmtree(lake, ignore_errors=True)


def test_turn_dedup_one_keeper_per_template(ray_session):
    import re

    import __ray_entry__ as e

    q = e.queries()
    flags = _as_df(q["cdc_turn_dedup"](SF))
    state = _as_df(q["cdc_upsert_lww"](SF))
    m = state.merge(flags, on=["conv_id", "turn_idx"])
    assert len(m) == len(state)
    m["tmpl"] = m["text"].map(lambda s: re.sub(r"[0-9]{2,}", "#", s))
    for tmpl, g in m.groupby("tmpl"):
        keep = g[~g["is_dup"]]
        assert len(keep) == 1
        # the keeper is the minimum (uid, turn) in its group
        okey = g["conv_id"].map(lambda c: int(c[1:])) * (1 << 20) \
            + g["turn_idx"]
        assert int(okey[keep.index[0]]) == int(okey.min())


def test_quarantine_rerun_is_exactly_once(ray_session):
    """Re-running the quarantine replay is a no-op on the lake (clean
    channel exactly-once) and the DL files are overwritten, not
    duplicated; repair after the re-run still lands the clean state."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import __ray_entry__ as e
    from pg_walstream_ray.lake import snapshot_table
    from pg_walstream_ray.pipelines.cdc import (reprocess_deadletters,
                                                run_cdc_quarantine)
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|dirty|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-dirty-{key}")
    build_wal_from_events(SF, "dirty", wal_dir, n_shards=2)
    lake = _tf.mkdtemp(prefix="pgwr_qrerun_lake_")
    dl = _tf.mkdtemp(prefix="pgwr_qrerun_dlq_")
    try:
        s1 = run_cdc_quarantine(wal_dir, lake, dl, num_partitions=4)
        state1 = snapshot_table(lake)
        files1 = sorted(_os.listdir(dl))
        s2 = run_cdc_quarantine(wal_dir, lake, dl, num_partitions=4)
        assert s2["rows_applied"] == 0          # replay guard held
        assert snapshot_table(lake).equals(state1)
        assert sorted(_os.listdir(dl)) == files1  # overwritten, not added
        reprocess_deadletters(dl, lake, e._repair_score_cells, wal_dir)
        want = e.queries()["cdc_schema_evolution"](SF).to_pandas() \
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        got = snapshot_table(lake).select(want.columns.tolist()) \
            .to_pandas().sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert s1["dl_files"] > 0
    finally:
        _sh.rmtree(lake, ignore_errors=True)
        _sh.rmtree(dl, ignore_errors=True)


def _brute_join_pairs(conv, cts, flag, width):
    acc = {}
    rows = list(zip(conv, cts, flag))
    for i, (cv, t, f) in enumerate(rows):
        if f != 1:
            continue
        n = sum(1 for cv2, t2, f2 in rows[:i]
                if cv2 == cv and f2 == 0 and t2 >= t - width)
        e, p = acc.get(cv, (0, 0))
        acc[cv] = (e + 1, p + n)
    return acc


def test_stream_joiner_matches_bruteforce_chunked():
    """Random keyed stream (cts monotone per conv), fed in chunks of
    varying size: the joiner's per-conv (n_emits, n_pairs) must equal the
    O(n^2) brute force, and a checkpoint/restore mid-stream must not
    change the result."""
    import pickle

    from pg_walstream_ray.pipelines.streaming import StreamJoiner

    rng = np.random.default_rng(11)
    n, width = 400, 50
    convs = np.array([f"c{int(u)}" for u in rng.integers(0, 12, n)],
                     dtype=object)
    # per-conv monotone cts: global monotone clock works for every conv
    cts = np.cumsum(rng.integers(1, 9, n)).astype(np.int64)
    flag = rng.choice(np.array([0, 1, -1], np.int8), size=n,
                      p=[0.5, 0.35, 0.15])
    src = np.zeros(n, np.int32)

    want = _brute_join_pairs(convs[flag >= 0], cts[flag >= 0],
                             flag[flag >= 0], width)

    for chunks in (1, 7, 64):
        agg = StreamJoiner(width)
        restored = None
        bounds = np.linspace(0, n, chunks + 1).astype(int)
        for ci, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
            if ci == chunks // 2:           # checkpoint mid-stream
                restored = StreamJoiner(width)
                restored.load_state(
                    pickle.loads(pickle.dumps(agg.state_dict())))
                agg = restored
            agg.ingest_keyed(convs[a:b], cts[a:b], src[a:b], flag[a:b])
        got = {r["conv_id"]: (r["n_emits"], r["n_pairs"])
               for r in agg.result_table().to_pylist()}
        assert got == want, f"chunks={chunks}"


def test_stream_join_sharded_matches_single(ray_session):
    """4-actor sharded run == the oracle SQL semantics == a 1-actor run
    (conv-disjoint merge is exact)."""
    import hashlib as _hl
    import os as _os

    import __ray_entry__ as e
    from pg_walstream_ray.pipelines.streaming import stream_join
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    four = stream_join(wal_dir, e.STREAM_JOIN_WINDOW_US,
                       n_actors=4).result_table()
    one = stream_join(wal_dir, e.STREAM_JOIN_WINDOW_US,
                      n_actors=1).result_table()
    assert four.equals(one)
    assert four.num_rows > 0
    assert int(pa.compute.sum(four["n_pairs"]).as_py()) > 0


def test_train_val_split_contract(ray_session):
    from pg_walstream_ray.pipelines.textops import train_val_split

    df = _as_df(train_val_split(SF).to_pandas() if hasattr(
        train_val_split(SF), "to_pandas") else train_val_split(SF))
    assert set(df["split"].unique()) <= {"train", "val"}
    # val rows are never flagged leaky
    assert (df.loc[df["split"] == "val", "leaky"] == 0).all()
    # identity-hash split: deterministic across runs
    df2 = _as_df(train_val_split(SF).to_pandas() if hasattr(
        train_val_split(SF), "to_pandas") else train_val_split(SF))
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id").reset_index(drop=True),
        df2.sort_values("doc_id").reset_index(drop=True))
    # every doc appears exactly once
    assert df["doc_id"].is_unique


def test_router_atomic_cut_whole_transactions(ray_session):
    """Any stop LSN inside tx T yields exactly transactions 0..T in BOTH
    lakes — no partial transaction ever becomes visible in either table
    (commit-unit contract across tables)."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as _pq
    import __ray_entry__ as e
    from pg_walstream_ray.lake import snapshot_table
    from pg_walstream_ray.pipelines.router import (TableRoute,
                                                   run_cdc_router)

    # reuse the query fixture's WAL (built by the driver query)
    e.queries()["cdc_router_atomic_cut"](SF)
    key = _hl.sha1(f"{_os.path.abspath(SF)}|atomcut".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-atomcut-{key}")
    KC, KO, B, base = 10, 100, 1 + 2 + 10 + 100 + 1, 1 << 44
    cust = _pq.read_metadata(
        _os.path.join(SF, "customer.parquet")).num_rows
    orde = _pq.read_metadata(
        _os.path.join(SF, "orders.parquet")).num_rows
    n_txs = max((cust + KC - 1) // KC, (orde + KO - 1) // KO)
    T = n_txs // 2
    # cut points: first insert slot, inside customer block, inside orders
    # block, and the commit LSN itself minus 1
    for off in (3, 3 + KC // 2, 3 + KC + KO // 2, B - 2):
        lk_c = _tf.mkdtemp(prefix="pgwr_atc_")
        lk_o = _tf.mkdtemp(prefix="pgwr_ato_")
        try:
            run_cdc_router(wal_dir, [TableRoute(32001, lk_c, 2),
                                     TableRoute(32002, lk_o, 2)],
                           stop_at_lsn=base + T * B + off)
            nc = snapshot_table(lk_c, key_cols=("c_custkey",)).num_rows
            no = snapshot_table(lk_o, key_cols=("o_orderkey",)).num_rows
            assert nc == min(cust, (T + 1) * KC), off
            assert no == min(orde, (T + 1) * KO), off
        finally:
            _sh.rmtree(lk_c, ignore_errors=True)
            _sh.rmtree(lk_o, ignore_errors=True)


def test_stream_dedup_index_shard_invariant(ray_session):
    """Distinct counts are exact regardless of index shard count
    (hash-range ownership: 1 shard == 4 shards)."""
    import hashlib as _hl
    import os as _os

    import __ray_entry__ as e
    from pg_walstream_ray.pipelines.streaming import stream_dedup_index
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    one = stream_dedup_index(wal_dir, n_actors=1)
    four = stream_dedup_index(wal_dir, n_actors=4)
    assert one.equals(four)
    d = one.to_pandas()
    assert (d["n_distinct"] <= d["n_rows"]).all()
    assert len(d) > 0


def test_survival_curve_km_accounting(ray_session):
    """Risk-set bookkeeping: at_risk(day0) == cohort size, at_risk is
    the reverse-cumulative of removals, every signup user is accounted
    exactly once (sum conv + sum cens == n signup users), and the
    conversion count matches conversion_time_quantiles' n_users."""
    from pg_walstream_ray.pipelines.analytics import (
        conversion_time_quantiles, survival_curve)

    t = _as_df(survival_curve(SF)).sort_values("day").reset_index(drop=True)
    assert len(t) > 0
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    n_cohort = ev[ev.event_type == "signup"]["user_id"].nunique()
    removed = (t["n_converted"] + t["n_censored"]).to_numpy()
    assert t["n_at_risk"].iloc[0] == removed.sum() == n_cohort
    # reverse-cumulative identity
    expect = n_cohort - np.concatenate([[0], removed.cumsum()[:-1]])
    assert (t["n_at_risk"].to_numpy() == expect).all()
    assert (t["n_at_risk"] >= t["n_converted"] + t["n_censored"]).all()
    q = _as_df(conversion_time_quantiles(SF))
    assert int(t["n_converted"].sum()) == int(q["n_users"].iloc[0])


def test_mmr_diverse_topk_invariants(ray_session):
    """First pick == relevance argmax; lam=1 degenerates to the brute
    top-k set; rows are rnk-contiguous per query; deterministic."""
    from pg_walstream_ray.pipelines.similarity import (ann_brute_topk,
                                                       mmr_diverse_topk)

    m = _as_df(mmr_diverse_topk(SF)).sort_values(
        ["query_id", "rnk"]).reset_index(drop=True)
    bt = _as_df(ann_brute_topk(SF))
    assert len(m) > 0
    for qid, g in m.groupby("query_id"):
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert g["neighbor_id"].is_unique
        top1 = bt[(bt.query_id == qid) & (bt.rnk == 1)]
        assert int(g.iloc[0]["neighbor_id"]) == int(top1["neighbor_id"])
        # greedy scores can only decrease weakly in rank
        assert (np.diff(g["mmr_score"].to_numpy()) <= 1e-12).all()
    m1 = _as_df(mmr_diverse_topk(SF, lam=1.0))
    for qid in bt["query_id"].unique():
        assert (set(m1[m1.query_id == qid]["neighbor_id"])
                == set(bt[bt.query_id == qid]["neighbor_id"]))
    again = _as_df(mmr_diverse_topk(SF)).sort_values(
        ["query_id", "rnk"]).reset_index(drop=True)
    assert m.equals(again)


def test_wap_audit_gates_publish(ray_session):
    """WAP: green audit publishes atomically; tampered staging (missing
    fragment / orphan file / short watermark) raises AuditError and the
    target lake never appears."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import pytest as _pt

    import __ray_entry__ as e
    from pg_walstream_ray.pipelines.wap import (AuditError, audit_lake,
                                                wap_replay)
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events
    from pg_walstream_ray.state.manifest import (list_partitions,
                                                 partition_dir,
                                                 read_manifest)

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    root = _tf.mkdtemp(prefix="pgwr_wap_t_")
    try:
        # happy path: publish succeeds, staging is gone, audit all-green
        lake = _os.path.join(root, "ok")
        report, published = wap_replay(wal_dir, lake, num_partitions=4)
        assert published == lake and _os.path.isdir(lake)
        assert not _os.path.exists(lake + ".staging")
        assert all(report["ok"].to_pylist())
        assert report.num_rows == 4

        # tamper 1: orphan parquet file -> audit red on that partition
        pid0 = list_partitions(lake)[0]
        orphan = _os.path.join(partition_dir(lake, pid0), "zz-orphan.parquet")
        with open(orphan, "wb") as f:
            f.write(b"not a real fragment")
        rep = audit_lake(lake)
        row = rep.to_pandas().set_index("pid").loc[pid0]
        assert not row["ok"] and row["orphans"] == 1
        _os.remove(orphan)

        # tamper 2: missing fragment -> red
        m = read_manifest(lake, pid0)
        frag = _os.path.join(partition_dir(lake, pid0), m.fragments[-1])
        bak = frag + ".bak"
        _os.rename(frag, bak)
        rep = audit_lake(lake)
        assert not rep.to_pandas().set_index("pid").loc[pid0]["ok"]
        _os.rename(bak, frag)

        # tamper 3: watermark gate — expecting an LSN beyond the replay
        wm = {s: lsn + 10_000 for s, lsn in
              ((s, m.applied_lsns[s]) for s in m.applied_lsns)}
        rep = audit_lake(lake, expected_watermark=wm)
        assert not any(rep["watermark_ok"].to_pylist())

        # wap_replay itself refuses to publish a failing audit: target
        # pre-existing is also rejected
        with _pt.raises(ValueError):
            wap_replay(wal_dir, lake, num_partitions=4)
    finally:
        _sh.rmtree(root, ignore_errors=True)


def test_retracting_changelog_protocol(ray_session):
    """Upsert/retract pane protocol: per-window alternation with exact
    retraction values, exactly one final pane (the last emission),
    changelog replay == consolidated state == plain tumbling result,
    for MULTIPLE batch chunkings; sharded consolidation matches too."""
    import hashlib as _hl
    import os as _os

    import __ray_entry__ as e
    from pg_walstream_ray.pipelines.streaming import (
        stream_window_changelog, stream_windows)
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    W = e.STREAM_WINDOW_US

    plain = stream_windows(wal_dir, W, n_sources=2).result_table() \
        .to_pandas().sort_values("window_start_us").reset_index(drop=True)

    for bs in (64, 1024, 8192):
        agg = stream_window_changelog(wal_dir, W, n_sources=2,
                                      batch_size=bs)
        log = agg.changelog_table().to_pandas()
        assert len(log) > 0
        assert (log["seq"].to_numpy() == np.arange(len(log))).all()
        # per-window protocol
        store = {}
        for w, g in log.groupby("window_start_us"):
            g = g.sort_values("seq")
            kinds = list(g["kind"])
            # alternation: upsert first, then retract/upsert pairs
            assert kinds[0] == "upsert"
            for i in range(1, len(kinds)):
                assert kinds[i] != kinds[i - 1]
            # each retraction carries the previous upsert's exact values
            prev = None
            for _, r in g.iterrows():
                if r["kind"] == "retract":
                    assert prev is not None
                    assert (r["n_events"], r["n_convs"]) == prev
                else:
                    prev = (r["n_events"], r["n_convs"])
            finals = g[g["is_final"]]
            assert len(finals) == 1 and finals["kind"].iloc[0] == "upsert"
            assert finals["seq"].iloc[0] == g["seq"].iloc[-1]
        # replay == consolidation == plain tumbling
        for _, r in log.sort_values("seq").iterrows():
            if r["kind"] == "upsert":
                store[r["window_start_us"]] = (r["n_events"], r["n_convs"])
            else:
                assert store.pop(r["window_start_us"]) == \
                    (r["n_events"], r["n_convs"])
        cons = agg.consolidated_table().to_pandas() \
            .sort_values("window_start_us").reset_index(drop=True)
        assert {w: (r, c) for w, (r, c) in store.items()} == {
            int(r["window_start_us"]): (int(r["n_events"]),
                                         int(r["n_convs"]))
            for _, r in cons.iterrows()}
        assert cons.equals(plain)

    sharded = stream_window_changelog(wal_dir, W, n_sources=2,
                                      n_actors=4).result_table() \
        .to_pandas().sort_values("window_start_us").reset_index(drop=True)
    assert sharded.equals(plain)


def test_kcore_equals_brute_peeling(ray_session):
    """Distributed h-index fixpoint == brute-force peeling coreness on
    the corpus near-dup graph + a hand graph with known cores."""
    import collections

    import pyarrow as _pa
    import ray.data as _rd

    from pg_walstream_ray.pipelines.dedup import (dedup_kcore,
                                                  kcore_decomposition)
    from pg_walstream_ray.pipelines.similarity import embedding_near_dup

    pairs = _rd.from_arrow(_pa.table({
        "vec_a": _pa.array([0, 1, 2, 2, 10], _pa.int64()),
        "vec_b": _pa.array([1, 2, 0, 3, 11], _pa.int64())}))
    r = kcore_decomposition(pairs).to_pandas() \
        .set_index("node")["coreness"].to_dict()
    assert r == {0: 2, 1: 2, 2: 2, 3: 1, 10: 1, 11: 1}

    out = _as_df(dedup_kcore(SF))
    p = _as_df(embedding_near_dup(SF))
    adj = collections.defaultdict(set)
    for a, b in zip(p["vec_a"], p["vec_b"]):
        adj[a].add(b)
        adj[b].add(a)
    alive = {n: len(s) for n, s in adj.items()}
    core, k = {}, 0
    while alive:
        k = max(k, min(alive.values()))
        peel = [n for n, d in alive.items() if d <= k]
        while peel:
            n = peel.pop()
            if n not in alive:
                continue
            core[n] = k
            del alive[n]
            for m in adj[n]:
                if m in alive:
                    alive[m] -= 1
                    if alive[m] <= k:
                        peel.append(m)
    assert out.set_index("vec_id")["coreness"].to_dict() == core
    assert len(out) == len(core) > 0


def test_stream_quantiles_exact_and_shard_invariant(ray_session):
    """Windowed length-quantile aggregator: single-consumer == 4-actor
    sharded (histogram-partial merge) == brute-force quantile_disc per
    window over the raw envelope stream; checkpoint/restore round-trips."""
    import hashlib as _hl
    import os as _os

    import __ray_entry__ as e
    from pg_walstream_ray.pipelines.events import envelope_dataset
    from pg_walstream_ray.pipelines.streaming import (
        WindowQuantileAggregator, stream_window_quantiles)
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    W = e.STREAM_WINDOW_US

    single = _as_df(stream_window_quantiles(
        wal_dir, W, n_sources=2).result_table()) \
        .sort_values("window_start_us").reset_index(drop=True)
    shard = _as_df(stream_window_quantiles(
        wal_dir, W, n_sources=2, n_actors=4).result_table()) \
        .sort_values("window_start_us").reset_index(drop=True)
    assert single.equals(shard)
    assert len(single) > 0

    # brute force over the raw envelopes
    env = envelope_dataset(wal_dir).to_pandas()
    dml = env[env["op"].isin(["insert", "update"])]
    lens = dml["after_values"].map(lambda v: len(v[3]))
    w = dml["commit_ts_us"] - dml["commit_ts_us"] % W
    df = pd.DataFrame({"w": w.to_numpy(), "len": lens.to_numpy()})

    def qd(v, q):
        v = np.sort(v.to_numpy())
        return int(v[max(int(np.ceil(q * len(v))), 1) - 1])

    brute = df.groupby("w")["len"].agg(
        n_events="size", p50_len=lambda v: qd(v, 0.5),
        p95_len=lambda v: qd(v, 0.95)).reset_index() \
        .rename(columns={"w": "window_start_us"})
    assert single.astype(np.int64).equals(brute.astype(np.int64))

    # checkpoint/restore equivalence mid-stream
    from pg_walstream_ray.pipelines.events import poll_envelopes
    a1 = WindowQuantileAggregator(width_us=W, sources=[0, 1])
    batches = list(poll_envelopes(wal_dir, batch_size=512))
    half = len(batches) // 2
    for b in batches[:half]:
        a1.ingest(b)
    snap = a1.state_dict()
    a2 = WindowQuantileAggregator(width_us=W, sources=[0, 1])
    a2.load_state(snap)
    for b in batches[half:]:
        a1.ingest(b)
        a2.ingest(b)
    a1.flush()
    a2.flush()
    assert _as_df(a1.result_table()).equals(_as_df(a2.result_table()))


def test_lineage_report_per_partition_detail(ray_session):
    """Per-partition lineage invariants behind the oracled rollup:
    epoch == len(lineage), per-window rows_applied sums to the replay
    total, fragment chains exist on disk, and the empty-table query
    degrades typed."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import __ray_entry__ as e
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events
    from pg_walstream_ray.state.manifest import (all_manifests,
                                                 partition_dir)

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    lake = _tf.mkdtemp(prefix="pgwr_lin_t_")
    try:
        m = run_cdc(wal_dir, lake, num_partitions=8)
        ms = all_manifests(lake)
        assert len(ms) > 0
        total = 0
        for pid, man in ms.items():
            assert man.epoch == len(man.lineage)
            assert [w["epoch"] for w in man.lineage] == \
                list(range(1, man.epoch + 1))
            total += sum(w.get("rows_applied", 0) for w in man.lineage)
            for f in man.fragments:
                assert _os.path.exists(_os.path.join(
                    partition_dir(lake, pid), f))
        assert total == m["rows_applied"]
    finally:
        _sh.rmtree(lake, ignore_errors=True)

    rep = _as_df(e.queries()["cdc_lineage_report"](SF))
    assert int(rep["total_rows_applied"].iloc[0]) > 0
    assert int(rep["total_live_rows"].iloc[0]) > 0


def test_export_corpus_resumable_after_torn_write(ray_session):
    """export_corpus: second run skips every finished partition; a torn
    partition (marker removed, file half-gone) is rewritten alone —
    other partitions' files untouched (mtime-stable) — and the rewritten
    content equals the original."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import __ray_entry__ as e
    from pg_walstream_ray.lake import export_corpus
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    root = _tf.mkdtemp(prefix="pgwr_exp_t_")
    lake = _os.path.join(root, "lake")
    out = _os.path.join(root, "corpus")
    try:
        run_cdc(wal_dir, lake, num_partitions=4)
        rep = export_corpus(lake, out)
        assert rep["written"] == rep["partitions"] > 0
        assert rep["rows"] > 0

        parts = sorted(_os.listdir(out))
        victim = _os.path.join(out, parts[0])
        orig = pq.read_table(_os.path.join(victim, "docs.parquet"))
        others = {p: _os.path.getmtime(_os.path.join(out, p,
                                                     "docs.parquet"))
                  for p in parts[1:]}

        # torn write: marker gone, data file gone (crash mid-partition)
        _os.remove(_os.path.join(victim, "_DONE"))
        _os.remove(_os.path.join(victim, "docs.parquet"))
        rep2 = export_corpus(lake, out)
        assert rep2["written"] == 1
        assert rep2["skipped"] == rep["partitions"] - 1
        assert rep2["rows"] == rep["rows"]
        redone = pq.read_table(_os.path.join(victim, "docs.parquet"))
        assert redone.equals(orig)
        for p, mt in others.items():
            assert _os.path.getmtime(_os.path.join(out, p,
                                                   "docs.parquet")) == mt
    finally:
        _sh.rmtree(root, ignore_errors=True)


def test_role_transitions_brute_force(ray_session):
    """Lake role-transition matrix equals a brute-force recompute from
    the exported conversation state (pairs never cross conversations)."""
    import collections

    import __ray_entry__ as e

    got = _as_df(e.queries()["cdc_role_transitions"](SF))
    assert len(got) > 0
    # brute force from the oracled export surface
    exp = _as_df(e.queries()["cdc_export_conversations"](SF))
    want: dict = collections.Counter()
    for doc in exp["doc"]:
        roles = [line.split(":", 1)[0] for line in doc.split("\n")]
        for a, b in zip(roles, roles[1:]):
            want[(a, b)] += 1
    assert {(r["from_role"], r["to_role"]): r["n"]
            for _, r in got.iterrows()} == dict(want)


def test_retracting_hopping_consolidates_to_plain(ray_session):
    """Hopping retraction changelog: consolidated state == plain hopping
    windows for single-consumer and sharded deployments, and the pane
    protocol (alternation, exact retraction values, final-last) holds
    per overlapping window."""
    import hashlib as _hl
    import os as _os

    import __ray_entry__ as e
    from pg_walstream_ray.pipelines.streaming import (
        stream_hopping_windows, stream_window_changelog)
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    key = _hl.sha1(f"{_os.path.abspath(SF)}|upsert|2".encode()) \
        .hexdigest()[:12]
    wal_dir = _os.path.join(e._CDC_TMP_ROOT, f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", wal_dir, n_shards=2)
    W = e.STREAM_WINDOW_US

    plain = _as_df(stream_hopping_windows(
        wal_dir, 2 * W, W, n_sources=2).result_table()) \
        .sort_values("window_start_us").reset_index(drop=True)
    agg = stream_window_changelog(wal_dir, 2 * W, n_sources=2,
                                  slide_us=W, batch_size=256)
    cons = _as_df(agg.consolidated_table()) \
        .sort_values("window_start_us").reset_index(drop=True)
    assert cons.equals(plain) and len(plain) > 0
    log = _as_df(agg.changelog_table())
    for w, g in log.groupby("window_start_us"):
        g = g.sort_values("seq")
        kinds = list(g["kind"])
        assert kinds[0] == "upsert"
        assert all(kinds[i] != kinds[i - 1] for i in range(1, len(kinds)))
        finals = g[g["is_final"]]
        assert len(finals) == 1 and finals["seq"].iloc[0] == g["seq"].iloc[-1]
    sharded = _as_df(stream_window_changelog(
        wal_dir, 2 * W, n_sources=2, slide_us=W,
        n_actors=4).result_table()) \
        .sort_values("window_start_us").reset_index(drop=True)
    assert sharded.equals(plain)


def test_tool_chains_brute_force(ray_session):
    """Tool-chain distribution equals a brute-force recompute from the
    exported conversation state."""
    import collections

    import __ray_entry__ as e

    got = _as_df(e.queries()["cdc_tool_chains"](SF))
    assert len(got) > 0
    exp = _as_df(e.queries()["cdc_export_conversations"](SF))
    want: dict = collections.Counter()
    for doc in exp["doc"]:
        roles = [line.split(":", 1)[0] for line in doc.split("\n")]
        run = 0
        for r in roles + ["<end>"]:
            if r == "tool":
                run += 1
            elif run:
                want[run] += 1
                run = 0
    assert {int(r["chain_len"]): int(r["n_chains"])
            for _, r in got.iterrows()} == dict(want)
