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
