"""Replay-scenario corpus (FIXTURES.md §4): each deterministic change log is
replayed through the FULL Ray pipeline and the lake snapshot must equal the
sequential oracle's final table state — the engine-level analogue of the
reference's integration suites (ci-checks.yml:249-340)."""

import tempfile

import pytest

from pg_walstream_ray import lake as lakemod
from pg_walstream_ray.pipelines.cdc import run_cdc
from pg_walstream_ray.sources import walgen
from pg_walstream_ray.state.manifest import (all_manifests, global_watermark,
                                             min_watermark)

from .helpers import assert_lake_matches, make_wal, oracle_df, run_and_check


@pytest.mark.usefixtures("ray_session")
class TestScenarios:
    def test_insert_only(self):
        run_and_check(walgen.WalSpec(n_convs=40, turns_per_conv=6,
                                     update_frac=0, delete_frac=0, n_shards=2))

    def test_insert_update_delete(self):
        run_and_check(walgen.WalSpec(n_convs=40, turns_per_conv=6,
                                     update_frac=0.5, delete_frac=0.15,
                                     n_shards=2))

    def test_truncate_midstream(self):
        # final = only post-truncate rows (protocol.rs:954-982)
        run_and_check(walgen.WalSpec(n_convs=30, turns_per_conv=5,
                                     update_frac=0.4, delete_frac=0.1,
                                     truncate_at_frac=0.6, n_shards=1))

    def test_uncommitted_tail_tx_leaves_no_trace(self):
        run_and_check(walgen.WalSpec(n_convs=20, turns_per_conv=5,
                                     update_frac=0.3, uncommitted_tail=True,
                                     n_shards=1))

    def test_streamed_transactions_with_abort(self):
        run_and_check(walgen.WalSpec(n_convs=40, turns_per_conv=6,
                                     update_frac=0.4, delete_frac=0.1,
                                     streamed_frac=0.5, stream_abort_frac=0.3,
                                     n_shards=2))

    def test_two_phase_prepared_transactions(self):
        """BeginPrepare/Prepare stage, CommitPrepared publishes,
        RollbackPrepared discards (protocol.rs:1135-1292) — through the
        FULL pipeline, mixed with plain and streamed transactions."""
        run_and_check(walgen.WalSpec(n_convs=40, turns_per_conv=6,
                                     update_frac=0.4, delete_frac=0.1,
                                     two_phase_frac=0.5,
                                     two_phase_rollback_frac=0.3,
                                     n_shards=2))

    def test_two_phase_streamed_prepare(self):
        """A tx that is both streamed and prepared resolves via
        StreamPrepare -> CommitPrepared/RollbackPrepared."""
        run_and_check(walgen.WalSpec(n_convs=30, turns_per_conv=5,
                                     update_frac=0.5, streamed_frac=0.6,
                                     two_phase_frac=0.6,
                                     two_phase_rollback_frac=0.4,
                                     stream_abort_frac=0.2, n_shards=2,
                                     segment_rows=40))

    def test_toast_unchanged_carry_forward(self):
        run_and_check(walgen.WalSpec(n_convs=30, turns_per_conv=5,
                                     update_frac=0.6,
                                     toast_unchanged_frac=0.4, n_shards=2))

    def test_schema_evolution_add_column(self):
        # Relation re-emission adds 'score' mid-stream; earlier rows null-fill
        lk = run_and_check(walgen.WalSpec(n_convs=30, turns_per_conv=5,
                                          update_frac=0.4,
                                          schema_change_at_frac=0.5,
                                          n_shards=2))
        snap = lakemod.snapshot_table(lk)
        assert "score" in snap.column_names
        assert snap["score"].null_count > 0          # pre-evolution rows
        assert snap["score"].null_count < snap.num_rows  # post-evolution rows

    def test_hot_key_skew_with_salt(self):
        spec = walgen.WalSpec(n_convs=40, turns_per_conv=6, update_frac=1.5,
                              hot_conv_frac=0.5, n_shards=2)
        # conv 0 and 1 are the shards' hot keys
        run_and_check(spec, hot_keys=["conv0", "conv1"], salt=4)

    def test_bounded_replay(self):
        spec = walgen.WalSpec(n_convs=30, turns_per_conv=6, update_frac=0.5,
                              delete_frac=0.1, n_shards=1)
        stop = walgen.shard_lsn_base(0) + 250
        run_and_check(spec, stop_at_lsn=stop)

    def test_restart_midstream_exactly_once(self):
        """Kill/resume: apply a bounded prefix, then replay the FULL stream
        into the same lake — the final state must equal an uninterrupted run
        (monotone-watermark exactly-once, lsn.rs:105-173)."""
        spec = walgen.WalSpec(n_convs=40, turns_per_conv=6, update_frac=0.5,
                              delete_frac=0.1, toast_unchanged_frac=0.2,
                              n_shards=2)
        wal = make_wal(spec)
        lk = tempfile.mkdtemp(prefix="lake_")
        stop = walgen.shard_lsn_base(0) + 300   # partial window for shard 0
        run_cdc(wal, lk, num_partitions=4, stop_at_lsn=stop)
        wm_partial = global_watermark(lk)
        run_cdc(wal, lk, num_partitions=4)       # resume: full replay
        assert_lake_matches(lk, oracle_df(spec))
        wm_full = global_watermark(lk)
        for s, v in wm_partial.items():
            assert wm_full.get(s, -1) >= v       # monotone per source

    def test_replay_is_idempotent(self):
        spec = walgen.WalSpec(n_convs=30, turns_per_conv=5, update_frac=0.5,
                              n_shards=2)
        wal = make_wal(spec)
        lk = tempfile.mkdtemp(prefix="lake_")
        run_cdc(wal, lk, num_partitions=4)
        snap1 = lakemod.snapshot_table(lk)
        m = run_cdc(wal, lk, num_partitions=4)
        assert m["rows_applied"] == 0
        assert lakemod.snapshot_table(lk).equals(snap1)

    def test_manifests_and_watermark(self):
        spec = walgen.WalSpec(n_convs=30, turns_per_conv=5, n_shards=2)
        wal = make_wal(spec)
        lk = tempfile.mkdtemp(prefix="lake_")
        run_cdc(wal, lk, num_partitions=4)
        ms = all_manifests(lk)
        assert len(ms) == 4
        for m in ms.values():
            assert max(m.applied_lsns.values(), default=-1) > 0
            assert m.fragment is not None
            assert m.lineage and m.lineage[-1]["rows_applied"] >= 0
        assert min_watermark(lk, num_partitions=4) > 0

    def test_num_partitions_change_rejected_on_resume(self):
        spec = walgen.WalSpec(n_convs=10, turns_per_conv=3, n_shards=1)
        wal = make_wal(spec)
        lk = tempfile.mkdtemp(prefix="lake_")
        run_cdc(wal, lk, num_partitions=4)
        with pytest.raises(ValueError):
            run_cdc(wal, lk, num_partitions=8)

    def test_auto_hot_key_detection(self):
        """auto_detect_hot_keys probes the WAL prefix, pins the detected
        keys in the lake config, and the salted run still matches the
        oracle."""
        import tempfile

        from pg_walstream_ray.lake import read_lake_config

        from .helpers import assert_lake_matches, make_wal, oracle_df

        spec = walgen.WalSpec(n_convs=12, turns_per_conv=8, update_frac=2.0,
                              hot_conv_frac=0.7, n_shards=1)
        wal = make_wal(spec)
        lk = tempfile.mkdtemp(prefix="auto_hot_")
        run_cdc(wal, lk, num_partitions=4, auto_detect_hot_keys=True)
        cfg = read_lake_config(lk)
        assert cfg["hot_keys"], "no hot key detected despite 70% skew"
        assert "conv0" in cfg["hot_keys"]
        assert_lake_matches(lk, oracle_df(spec))
