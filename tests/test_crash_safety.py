"""Crash-safety property tests (SURVEY.md §5 / §7 hard part 1): replay from
ANY cut point — and with torn on-disk state from a simulated kill — must
reproduce the single-shot final table byte-for-byte.  The engine analogue of
the reference's restart-from-last_received_lsn + idempotent re-ack contract
(stream.rs:862-898, lsn.rs:105-173)."""

import os
import tempfile

import numpy as np
import pyarrow.parquet as pq
import pytest

from pg_walstream_ray import lake as lakemod
from pg_walstream_ray.pipelines.cdc import run_cdc
from pg_walstream_ray.sources import walgen
from pg_walstream_ray.state.manifest import all_manifests, partition_dir

from .helpers import assert_lake_matches, make_wal, normalize, oracle_df

SPEC = walgen.WalSpec(n_convs=60, turns_per_conv=6, update_frac=0.5,
                      delete_frac=0.1, tx_rows=20, n_shards=3)


@pytest.fixture(scope="module")
def wal_and_oracle(ray_session):
    wal = make_wal(SPEC)
    return wal, oracle_df(SPEC)


def _commit_lsns(shard: int):
    """All commit LSNs of one shard (cut points must be commit-aligned in
    expectation, but the engine must also tolerate arbitrary targets)."""
    logical = walgen.shard_logical_changes(SPEC, shard)
    import numpy as np

    lsn = logical["lsn"].to_numpy(zero_copy_only=False)
    tx = np.arange(len(lsn)) // SPEC.tx_rows
    return [int(lsn[tx == t].max() + 1) for t in np.unique(tx)]


def test_random_cut_points_replay(wal_and_oracle):
    """prefix-replay (stop_at_lsn=L) then full replay == single-shot full
    replay, for seeded random cut points INCLUDING mid-transaction LSNs."""
    wal, oracle = wal_and_oracle
    rng = np.random.default_rng(7)
    lo = walgen.shard_lsn_base(0)
    hi = walgen.shard_lsn_base(0) + 4 * SPEC.n_convs * SPEC.turns_per_conv
    cuts = [int(x) for x in rng.integers(lo, hi, size=4)]
    for cut in cuts:
        lk = tempfile.mkdtemp(prefix="cut_")
        run_cdc(wal, lk, num_partitions=4, stop_at_lsn=cut)
        run_cdc(wal, lk, num_partitions=4)
        assert_lake_matches(lk, oracle)


def test_torn_fragment_without_manifest_is_invisible(wal_and_oracle):
    """Simulated kill between fragment write and manifest publish: an
    orphan fragment + stale tmp file must not affect the final state."""
    wal, oracle = wal_and_oracle
    lk = tempfile.mkdtemp(prefix="torn_")
    cut = walgen.shard_lsn_base(0) + 200
    run_cdc(wal, lk, num_partitions=4, stop_at_lsn=cut)

    # fabricate torn state in every partition: orphan fragment (never
    # referenced) + a half-written .tmp
    for pid, m in all_manifests(lk).items():
        d = partition_dir(lk, pid)
        os.makedirs(d, exist_ok=True)
        if m.fragment:
            src = os.path.join(d, m.fragment)
            orphan = os.path.join(d, "fragment-999999-999.parquet")
            with open(src, "rb") as f, open(orphan, "wb") as g:
                g.write(f.read())
            with open(os.path.join(d, ".fragment-999999-999.parquet.abcd.tmp"),
                      "wb") as g:
                g.write(b"torn")

    run_cdc(wal, lk, num_partitions=4)
    assert_lake_matches(lk, oracle)


def test_double_apply_of_same_window_is_noop(wal_and_oracle):
    """Running the full replay N times over the same lake never changes the
    result nor inflates row counts (re-ack no-op, lsn.rs:139-173)."""
    wal, oracle = wal_and_oracle
    lk = tempfile.mkdtemp(prefix="dup_")
    run_cdc(wal, lk, num_partitions=4)
    snap1 = normalize(lakemod.snapshot_table(lk))
    m1 = {p: (m.epoch, m.row_count) for p, m in all_manifests(lk).items()}
    for _ in range(2):
        run_cdc(wal, lk, num_partitions=4)
    snap2 = normalize(lakemod.snapshot_table(lk))
    import pandas as pd

    pd.testing.assert_frame_equal(snap1, snap2)
    m2 = {p: (m.epoch, m.row_count) for p, m in all_manifests(lk).items()}
    assert {p: rc for p, (_, rc) in m1.items()} == \
        {p: rc for p, (_, rc) in m2.items()}
    assert_lake_matches(lk, oracle)


def test_staggered_per_shard_progress(wal_and_oracle):
    """Sources at different replay positions (vector watermarks): apply
    shard 0 fully first via a single-shard WAL view, then the full WAL —
    per-source applied_lsns keep the overlap idempotent."""
    wal, oracle = wal_and_oracle
    lk = tempfile.mkdtemp(prefix="stag_")
    # stage 1: bounded replay that stops shard sources at different points
    cut = walgen.shard_lsn_base(1) + 300        # beyond shard0's space start
    run_cdc(wal, lk, num_partitions=4, stop_at_lsn=cut)
    # stage 2: full catch-up
    run_cdc(wal, lk, num_partitions=4)
    assert_lake_matches(lk, oracle)
    # every source's watermark must have caught up to its max commit
    ms = all_manifests(lk)
    sources = {s for m in ms.values() for s in m.applied_lsns}
    assert sources == {str(s) for s in range(SPEC.n_shards)}


def test_incremental_windows_delta_chain_and_compaction(ray_session):
    """Apply the WAL in many small windows: delta fragments accumulate
    (deletes ride as tombstones, no state rewrite), the chain compacts at
    COMPACT_AT, and the final state still equals the oracle."""
    from pg_walstream_ray.stages.apply import COMPACT_AT

    spec = walgen.WalSpec(n_convs=30, turns_per_conv=5, update_frac=0.6,
                          delete_frac=0.2, tx_rows=10, n_shards=1)
    wal = make_wal(spec)
    lk = tempfile.mkdtemp(prefix="delta_")
    logical = walgen.shard_logical_changes(spec, 0)
    lsn = logical["lsn"].to_numpy(zero_copy_only=False)
    cuts = [int(lsn[int(len(lsn) * f)]) for f in
            (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)]
    for cut in cuts:
        run_cdc(wal, lk, num_partitions=2, stop_at_lsn=cut)
    run_cdc(wal, lk, num_partitions=2)

    ms = all_manifests(lk)
    delta_writes = sum(1 for m in ms.values() for e in m.lineage
                      if e.get("compacted") is False)
    assert delta_writes > 0, "no delta fragments were ever written"
    for m in ms.values():
        assert len(m.fragments) <= COMPACT_AT
    assert_lake_matches(lk, oracle_df(spec))


def test_segmented_wal_resume_prunes_applied_segments(ray_session):
    """Segmented WAL (Relation re-sent per segment): partial replay then
    full replay matches the oracle; a fully-applied resume decodes ZERO
    rows because every segment's footer max(lsn) is under the watermark."""
    import pyarrow as pa

    from pg_walstream_ray.lake import read_lake_config
    from pg_walstream_ray.pipelines.cdc import discover_shards
    from pg_walstream_ray.stages.decode import DecodeShard
    from pg_walstream_ray.state.manifest import global_watermark

    spec = walgen.WalSpec(n_convs=40, turns_per_conv=6, update_frac=0.5,
                          delete_frac=0.1, tx_rows=10, n_shards=2,
                          segment_rows=60,
                          schema_change_at_frac=0.5)   # evolution crosses
    #                                                    segment boundaries
    wal = make_wal(spec)
    segs = discover_shards(wal)
    assert all(len(s) > 2 for s in segs), "WAL was not segmented"

    lk = tempfile.mkdtemp(prefix="seg_")
    cut = walgen.shard_lsn_base(0) + 700
    run_cdc(wal, lk, num_partitions=4, stop_at_lsn=cut)
    run_cdc(wal, lk, num_partitions=4)
    assert_lake_matches(lk, oracle_df(spec))

    # fully-applied resume: with the final watermark every segment prunes
    wm = {int(s): lsn for s, lsn in global_watermark(lk, 4).items()}
    assert all(lsn > 0 for lsn in wm.values())
    dec = DecodeShard(prune_below=wm)
    rows = 0
    for shard_segs in segs:
        for out in dec(pa.table({"wal_paths": [shard_segs]})):
            rows += out.num_rows
    assert rows == 0, f"resume decoded {rows} rows; pruning failed"
    assert dec.segments_pruned == sum(len(s) for s in segs)


def test_explicit_compaction_preserves_state(ray_session):
    """compact_lake collapses every fragment chain to one base; snapshot
    (and oracle equality) unchanged."""
    from pg_walstream_ray.lake import compact_lake

    spec = walgen.WalSpec(n_convs=30, turns_per_conv=5, update_frac=0.6,
                          delete_frac=0.2, tx_rows=10, n_shards=1)
    wal = make_wal(spec)
    lk = tempfile.mkdtemp(prefix="cmp_")
    logical = walgen.shard_logical_changes(spec, 0)
    lsn = logical["lsn"].to_numpy(zero_copy_only=False)
    for frac in (0.3, 0.6):
        run_cdc(wal, lk, num_partitions=2,
                stop_at_lsn=int(lsn[int(len(lsn) * frac)]))
    run_cdc(wal, lk, num_partitions=2)
    assert any(len(m.fragments) > 1 for m in all_manifests(lk).values())
    compact_lake(lk)
    assert all(len(m.fragments) == 1 for m in all_manifests(lk).values())
    assert_lake_matches(lk, oracle_df(spec))


def test_follow_mode_tails_appended_segments(ray_session):
    """run_cdc_follow applies segments that appear between passes (live
    tail posture); final state equals the oracle."""
    import shutil

    from pg_walstream_ray.pipelines.cdc import run_cdc_follow

    spec = walgen.WalSpec(n_convs=30, turns_per_conv=5, update_frac=0.5,
                          tx_rows=10, n_shards=1, segment_rows=50)
    staging = make_wal(spec)
    live = tempfile.mkdtemp(prefix="live_")
    sdir = os.path.join(live, "shard=0000")
    os.makedirs(sdir)
    src = os.path.join(staging, "shard=0000")
    segs = sorted(f for f in os.listdir(src) if f.startswith("wal-"))
    assert len(segs) >= 3
    shutil.copy(os.path.join(src, "relations.json"),
                os.path.join(sdir, "relations.json"))

    lk = tempfile.mkdtemp(prefix="lkf_")
    # phase 1: only the first segment exists
    shutil.copy(os.path.join(src, segs[0]), os.path.join(sdir, segs[0]))
    run_cdc_follow(live, lk, num_partitions=2, poll_interval_s=0.01,
                   max_idle_polls=1)
    # phase 2: the rest arrive; follow picks them up
    for s in segs[1:]:
        shutil.copy(os.path.join(src, s), os.path.join(sdir, s))
    m = run_cdc_follow(live, lk, num_partitions=2, poll_interval_s=0.01,
                       max_idle_polls=1)
    assert m["rows_applied"] > 0
    assert_lake_matches(lk, oracle_df(spec))
