"""SCD2 history sink + lake repartitioning: invariants and cross-checks.

The LWW sink is the already-oracled ground truth, so the strongest cheap
check is consistency: the history view's CURRENT rows must equal the LWW
snapshot on the same WAL (deletes close versions <-> deletes kill rows;
truncate closes versions <-> truncate wipes state; TOAST carries in both).
"""

import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pg_walstream_ray import lake as lakemod
from pg_walstream_ray.pipelines.cdc import run_cdc
from pg_walstream_ray.sources import walgen

from .helpers import make_wal, normalize, oracle_df

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _run_both(spec: walgen.WalSpec, num_partitions: int = 4):
    wal = make_wal(spec)
    lww = tempfile.mkdtemp(prefix="lake_lww_")
    hist = tempfile.mkdtemp(prefix="lake_hist_")
    run_cdc(wal, lww, num_partitions=num_partitions)
    run_cdc(wal, hist, num_partitions=num_partitions, sink="history")
    return wal, lww, hist


def _current_payload(hist_dir: str) -> pd.DataFrame:
    t = lakemod.history_table(hist_dir)
    cur = t.filter(t["is_current"])
    return normalize(cur.select([c for c in PAYLOAD
                                 if c in cur.column_names]))


class TestHistorySink:
    def test_current_equals_lww_upsert_delete(self, ray_session):
        spec = walgen.WalSpec(n_convs=40, turns_per_conv=8,
                              update_frac=0.5, delete_frac=0.15, seed=7)
        _, lww, hist = _run_both(spec)
        lww_df = normalize(lakemod.snapshot_table(lww))
        cur_df = _current_payload(hist)
        pd.testing.assert_frame_equal(cur_df, lww_df[sorted(PAYLOAD)],
                                      check_dtype=False)

    def test_interval_chain_invariants(self, ray_session):
        spec = walgen.WalSpec(n_convs=30, turns_per_conv=6,
                              update_frac=0.6, delete_frac=0.1, seed=11)
        _, _, hist = _run_both(spec)
        t = lakemod.history_table(hist)
        df = t.to_pandas().sort_values(
            ["conv_id", "turn_idx", "valid_from"])
        # per key: valid_from strictly increasing; each version's valid_to
        # (when closed by a successor version) equals the successor's
        # valid_from; at most one current version per key
        for (_, _), g in df.groupby(["conv_id", "turn_idx"]):
            vf = g["valid_from"].to_numpy()
            assert (np.diff(vf) > 0).all()
            assert int(g["is_current"].sum()) <= 1
            if g["is_current"].any():
                assert g["is_current"].iloc[-1]   # only the last can be open
            vt = g["valid_to"].to_numpy()
            closed = ~g["is_current"].to_numpy()
            assert (vt[closed] > vf[closed]).all()
            # successor-closed versions: valid_to == next valid_from unless
            # a delete (which emits no row) closed the interval earlier --
            # then valid_to < next valid_from
            assert (vt[:-1][closed[:-1]] <= vf[1:][closed[:-1]]).all()

    def test_version_count_matches_logical_stream(self, ray_session):
        spec = walgen.WalSpec(n_convs=25, turns_per_conv=5,
                              update_frac=0.4, delete_frac=0.1, seed=3)
        wal = make_wal(spec)
        hist = tempfile.mkdtemp(prefix="lake_hist_")
        run_cdc(wal, hist, num_partitions=4, sink="history")
        logs = pa.concat_tables(
            [walgen.shard_logical_changes(spec, s)
             for s in range(spec.n_shards)], promote_options="default")
        n_versions = logs.filter(
            pc.is_in(logs["op"], value_set=pa.array(["insert", "update"]))
        ).num_rows
        assert lakemod.history_table(hist).num_rows == n_versions

    def test_rerun_idempotent(self, ray_session):
        spec = walgen.WalSpec(n_convs=20, turns_per_conv=5,
                              update_frac=0.5, delete_frac=0.1, seed=5)
        wal = make_wal(spec)
        hist = tempfile.mkdtemp(prefix="lake_hist_")
        run_cdc(wal, hist, num_partitions=4, sink="history")
        t1 = lakemod.history_table(hist)
        m = run_cdc(wal, hist, num_partitions=4, sink="history")
        assert m["rows_applied"] == 0
        t2 = lakemod.history_table(hist)
        assert t1.equals(t2)

    def test_truncate_closes_open_versions(self, ray_session):
        spec = walgen.WalSpec(n_convs=30, turns_per_conv=6, update_frac=0.4,
                              truncate_at_frac=0.5, seed=9)
        _, lww, hist = _run_both(spec)
        # cross-check current state against the (truncate-aware) LWW sink
        pd.testing.assert_frame_equal(
            _current_payload(hist),
            normalize(lakemod.snapshot_table(lww))[sorted(PAYLOAD)],
            check_dtype=False)
        # every version opened before the truncate is closed at or before it
        logs = pa.concat_tables(
            [walgen.shard_logical_changes(spec, s)
             for s in range(spec.n_shards)], promote_options="default")
        tr = logs.filter(pc.equal(logs["op"], "truncate"))
        assert tr.num_rows >= 1
        t_first = pc.min(tr["lsn"]).as_py()
        t = lakemod.history_table(hist).to_pandas()
        before = t[t["valid_from"] < t_first]
        assert (~before["is_current"]).all()
        assert (before["valid_to"] <= pc.max(tr["lsn"]).as_py()).all()

    def test_toast_carry_in_history(self, ray_session):
        spec = walgen.WalSpec(n_convs=25, turns_per_conv=6, update_frac=0.6,
                              toast_unchanged_frac=0.5, seed=13)
        _, lww, hist = _run_both(spec)
        pd.testing.assert_frame_equal(
            _current_payload(hist),
            normalize(lakemod.snapshot_table(lww))[sorted(PAYLOAD)],
            check_dtype=False)

    def test_history_dataset_streaming_equals_table(self, ray_session):
        spec = walgen.WalSpec(n_convs=20, turns_per_conv=4,
                              update_frac=0.5, seed=17)
        wal = make_wal(spec)
        hist = tempfile.mkdtemp(prefix="lake_hist_")
        run_cdc(wal, hist, num_partitions=4, sink="history")
        ds = lakemod.history_dataset(hist)
        t_ds = pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)),
            promote_options="default")
        a = t_ds.to_pandas().sort_values(
            ["conv_id", "turn_idx", "valid_from"]).reset_index(drop=True)
        b = lakemod.history_table(hist).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                      b[sorted(b.columns)])

    def test_sink_mismatch_rejected_on_resume(self, ray_session):
        spec = walgen.WalSpec(n_convs=5, turns_per_conv=3, seed=1)
        wal = make_wal(spec)
        lk = tempfile.mkdtemp(prefix="lake_")
        run_cdc(wal, lk, num_partitions=2, sink="history")
        with pytest.raises(ValueError, match="sink"):
            run_cdc(wal, lk, num_partitions=2)


class TestHistoryDiff:
    """lake.history_diff: applying the diff to state-at-A must reproduce
    state-at-B exactly (the checkpoint-to-checkpoint sync contract)."""

    def _diff_df(self, hist: str, a: int, b: int) -> pd.DataFrame:
        ds = lakemod.history_diff(hist, a, b)
        tables = list(ds.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))
        if not tables:
            return pd.DataFrame(columns=[*PAYLOAD, "change"])
        return pa.concat_tables(tables,
                                promote_options="default").to_pandas()

    def test_apply_diff_reconstructs_b(self, ray_session):
        spec = walgen.WalSpec(n_convs=40, turns_per_conv=8,
                              update_frac=0.5, delete_frac=0.15, seed=29)
        wal = make_wal(spec)
        hist = tempfile.mkdtemp(prefix="lake_hist_")
        run_cdc(wal, hist, num_partitions=4, sink="history")
        t = lakemod.history_table(hist)
        max_lsn = int(pc.max(t["valid_from"]).as_py())
        a_lsn, b_lsn = max_lsn // 3, (2 * max_lsn) // 3
        d = self._diff_df(hist, a_lsn, b_lsn)
        assert len(d) > 0
        assert set(d["change"].unique()) <= {"added", "removed", "updated"}
        # removed rows carry NULL payload
        rem = d[d["change"] == "removed"]
        assert rem["text"].isna().all() and rem["role"].isna().all()

        key = ["conv_id", "turn_idx"]
        state_a = lakemod.history_as_of(hist, a_lsn).to_pandas() \
            .set_index(key)
        state_b = lakemod.history_as_of(hist, b_lsn).to_pandas() \
            .set_index(key)
        # added keys absent at A, removed keys absent at B
        added = d[d["change"] == "added"].set_index(key)
        assert not added.index.isin(state_a.index).any()
        assert added.index.isin(state_b.index).all()
        rem_i = rem.set_index(key)
        assert rem_i.index.isin(state_a.index).all()
        assert not rem_i.index.isin(state_b.index).any()
        # A + diff == B
        upserts = d[d["change"] != "removed"].set_index(key)[
            [c for c in PAYLOAD if c not in key]]
        merged = state_a.drop(index=rem_i.index) \
            .drop(index=upserts.index, errors="ignore")
        merged = pd.concat([merged, upserts]).sort_index()
        pd.testing.assert_frame_equal(
            merged[sorted(merged.columns)],
            state_b.sort_index()[sorted(state_b.columns)],
            check_dtype=False)

    def test_diff_same_point_is_empty(self, ray_session):
        spec = walgen.WalSpec(n_convs=10, turns_per_conv=4,
                              update_frac=0.5, seed=31)
        wal = make_wal(spec)
        hist = tempfile.mkdtemp(prefix="lake_hist_")
        run_cdc(wal, hist, num_partitions=2, sink="history")
        t = lakemod.history_table(hist)
        mid = int(pc.max(t["valid_from"]).as_py()) // 2
        assert len(self._diff_df(hist, mid, mid)) == 0


class TestMergeLakes:
    def test_merge_disjoint_shards_equals_full_replay(self, ray_session,
                                                      tmp_path):
        """Two lakes each replaying half the WAL shards merge into the
        full-replay state, and a resume against the merged lake is
        exactly-once (applies nothing)."""
        spec = walgen.WalSpec(n_convs=40, turns_per_conv=8, n_shards=2,
                              update_frac=0.5, delete_frac=0.1, seed=37)
        wal = make_wal(spec)
        import os

        splits = []
        for s in range(2):
            d = str(tmp_path / f"only{s}")
            os.makedirs(d)
            os.symlink(os.path.join(wal, f"shard={s:04d}"),
                       os.path.join(d, f"shard={s:04d}"))
            splits.append(d)
        lake_a = str(tmp_path / "a"); lake_b = str(tmp_path / "b")
        merged = str(tmp_path / "m")
        run_cdc(splits[0], lake_a, num_partitions=3)
        run_cdc(splits[1], lake_b, num_partitions=4)
        lakemod.merge_lakes([lake_a, lake_b], merged, num_partitions=6)
        from .helpers import assert_lake_matches

        assert_lake_matches(merged, oracle_df(spec))
        m = run_cdc(wal, merged, num_partitions=6)
        assert m["rows_applied"] == 0

    def test_merge_overlapping_keys_lww_by_lsn(self, ray_session,
                                               tmp_path):
        """Overlapping keys (same lake snapshot merged with itself after
        extra updates): the higher-_lsn version wins per key."""
        spec = walgen.WalSpec(n_convs=10, turns_per_conv=4, n_shards=1,
                              update_frac=0.6, seed=41)
        wal = make_wal(spec)
        lake1 = str(tmp_path / "l1")
        run_cdc(wal, lake1, num_partitions=2)
        merged = str(tmp_path / "m")
        lakemod.merge_lakes([lake1, lake1], merged, num_partitions=3)
        a = normalize(lakemod.snapshot_table(lake1))
        b = normalize(lakemod.snapshot_table(merged))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestLakeRewrites:
    """backfill_column / enforce_retention: compact-style rewrites must
    stay exactly-once-compatible (resume applies nothing new; the rewrite
    survives a replay untouched for already-applied events)."""

    def test_backfill_then_resume_exactly_once(self, ray_session,
                                               tmp_path):
        spec = walgen.WalSpec(n_convs=20, turns_per_conv=5,
                              update_frac=0.5, seed=43)
        wal = make_wal(spec)
        lk = str(tmp_path / "l")
        run_cdc(wal, lk, num_partitions=3)
        r = lakemod.backfill_column(
            lk, "n_chars_text",
            lambda t: pc.cast(pc.utf8_length(t["text"]), pa.int64()))
        t = lakemod.snapshot_table(lk)
        assert "n_chars_text" in t.column_names
        got = t["n_chars_text"].to_numpy(zero_copy_only=False)
        want = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        assert (got == want).all()
        assert r["rows"] == t.num_rows
        # resume: nothing re-applies, backfilled column intact
        m = run_cdc(wal, lk, num_partitions=3)
        assert m["rows_applied"] == 0
        assert "n_chars_text" in lakemod.snapshot_table(lk).column_names
        # re-backfill is idempotent
        lakemod.backfill_column(
            lk, "n_chars_text",
            lambda t: pc.cast(pc.utf8_length(t["text"]), pa.int64()))
        t2 = lakemod.snapshot_table(lk)
        assert t2.num_rows == t.num_rows

    def test_retention_drops_old_and_stays_dropped(self, ray_session,
                                                   tmp_path):
        spec = walgen.WalSpec(n_convs=20, turns_per_conv=5,
                              update_frac=0.4, seed=47)
        wal = make_wal(spec)
        lk = str(tmp_path / "l")
        run_cdc(wal, lk, num_partitions=3)
        t = lakemod.snapshot_table(lk)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        cutoff = pa.scalar(np.sort(ts)[len(ts) // 2], pa.timestamp("us"))
        lakemod.enforce_retention(lk, cutoff)
        t2 = lakemod.snapshot_table(lk)
        kept = t2["ts"].to_numpy(zero_copy_only=False)
        assert (kept >= cutoff.as_py()).all()
        assert 0 < t2.num_rows < t.num_rows
        # replay does not resurrect expired rows (events already applied)
        m = run_cdc(wal, lk, num_partitions=3)
        assert m["rows_applied"] == 0
        assert lakemod.snapshot_table(lk).num_rows == t2.num_rows


class TestRepartitionLake:
    def test_repartition_midstream_resume(self, ray_session):
        spec = walgen.WalSpec(n_convs=40, turns_per_conv=8,
                              update_frac=0.5, delete_frac=0.1, seed=21)
        wal = make_wal(spec)
        logs = [walgen.shard_logical_changes(spec, s)
                for s in range(spec.n_shards)]
        max_lsn = max(pc.max(t["lsn"]).as_py() for t in logs)
        lake1 = tempfile.mkdtemp(prefix="lake_a_")
        lake2 = tempfile.mkdtemp(prefix="lake_b_") + "/new"
        run_cdc(wal, lake1, num_partitions=3, stop_at_lsn=max_lsn // 2)
        lakemod.repartition_lake(lake1, lake2, num_partitions=7)
        cfg = lakemod.read_lake_config(lake2)
        assert cfg["num_partitions"] == 7
        run_cdc(wal, lake2, num_partitions=7)
        from .helpers import assert_lake_matches

        assert_lake_matches(lake2, oracle_df(spec))
        # resume after repartition is exactly-once: nothing re-applies
        m = run_cdc(wal, lake2, num_partitions=7)
        assert m["rows_applied"] == 0

    def test_repartition_preserves_true_lsn(self, ray_session):
        spec = walgen.WalSpec(n_convs=15, turns_per_conv=4,
                              update_frac=0.5, seed=23)
        wal = make_wal(spec)
        lake1 = tempfile.mkdtemp(prefix="lake_a_")
        lake2 = tempfile.mkdtemp(prefix="lake_b_") + "/new"
        run_cdc(wal, lake1, num_partitions=2)
        before = lakemod.snapshot_table(lake1, drop_internal=False)
        lakemod.repartition_lake(lake1, lake2, num_partitions=5)
        after = lakemod.snapshot_table(lake2, drop_internal=False)
        a = before.to_pandas().sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        b = after.to_pandas().sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                      b[sorted(b.columns)],
                                      check_dtype=False)
        assert "_lsn" in b.columns

    def test_repartition_rejects_history_lake(self, ray_session):
        spec = walgen.WalSpec(n_convs=5, turns_per_conv=3, seed=2)
        wal = make_wal(spec)
        lk = tempfile.mkdtemp(prefix="lake_")
        run_cdc(wal, lk, num_partitions=2, sink="history")
        with pytest.raises(NotImplementedError):
            lakemod.repartition_lake(lk, lk + "_new", num_partitions=4)
