"""Temporal / ordered-stream operators over ``events`` — as-of join,
range join, sliding windows, distinct-day set aggregation.

These are the custom operators Ray Data lacks natively (reference has no
analogue either — they're the training-pipeline extensions the engine
needs at 100 TB).  Partitioning assumption, shared by all of them: ONE
hash shuffle on ``user_id``; after it every per-user time series is
partition-local, so the temporal logic is a vectorized numpy pass inside
``map_groups`` (searchsorted over the sorted per-user timeline), never a
cross-partition exchange.  Window aggregation instead pre-aggregates
inside ``map_batches`` (each event maps to a handful of window starts) so
the global shuffle only moves (window, partial) rows — the partial/
combiner pattern, not raw events.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _events(sf_dir: str, columns=("event_id", "ts", "user_id",
                                  "event_type")):
    from ..functions.scale import sized_read_parquet

    return sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                              columns=list(columns))


from ..functions.scale import coarse_npart

# coarse buckets: the shuffle key is user_id % NPART, so a map_groups call
# handles a BUCKET of users with vectorized pandas kernels (merge_asof
# by=user_id), never one tiny Python group per user — per-key groups cost
# ~25 ms each in Ray's map_groups (measured 38 s for 1.5k groups).  NPART
# derives from the live cluster size (functions/scale.py) so reduce
# parallelism scales with the cluster instead of capping at a constant.


def _bucketed(sf_dir: str, *types: str):
    """events filtered to the given types, with a bucket column."""
    ds = _events(sf_dir)
    pred = " or ".join(f"event_type == '{t}'" for t in types)
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    return ds.filter(expr=pred).map_batches(add_bucket,
                                            batch_format="pyarrow")


# ---------------------------------------------------------------------------
# as-of join: purchase <- latest prior-or-equal click of the same user
# ---------------------------------------------------------------------------


def events_asof_join(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click"):
    """As-of (backward) join: for each ``left_type`` event, the newest
    ``right_type`` event of the same user with ``right.ts <= left.ts``;
    lefts with no prior right keep nulls (left join).

    Output: (purchase_id, user_id, purchase_ts, click_id, click_ts).

    Per group the match is one ``np.searchsorted`` over the user's sorted
    right-side timeline — O(n log n) in the group, no pairwise blowup.
    """
    ds = _bucketed(sf_dir, left_type, right_type)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("ts", kind="mergesort")
        left = g[g["event_type"] == left_type]
        right = g[g["event_type"] == right_type][
            ["user_id", "ts", "event_id"]].rename(
            columns={"event_id": "click_id", "ts": "click_ts"})
        m = pd.merge_asof(left.sort_values("ts"), right.sort_values("click_ts"),
                          left_on="ts", right_on="click_ts", by="user_id",
                          direction="backward", allow_exact_matches=True)
        # Arrow-typed output: click_id must be int64-with-nulls (NOT pandas
        # nullable Int64) so downstream pandas conversion matches DuckDB's
        # NULL-able BIGINT representation and the value hash agrees.
        return pa.table({
            "purchase_id": pa.array(m["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(m["user_id"].to_numpy(), pa.int64()),
            "purchase_ts": pa.array(m["ts"].to_numpy(), pa.timestamp("us")),
            "click_id": pa.array(m["click_id"].astype("Int64"),
                                 pa.int64()),
            "click_ts": pa.array(m["click_ts"], pa.timestamp("us")),
        })

    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                           num_cpus=1)


# ---------------------------------------------------------------------------
# range join: clicks in the trailing window before each purchase
# ---------------------------------------------------------------------------


def events_range_join(sf_dir: str, left_type: str = "purchase",
                      right_type: str = "click",
                      window_minutes: int = 30):
    """Range (interval) join, pre-aggregated: for each ``left_type`` event,
    how many ``right_type`` events of the same user fall in
    ``[left.ts - window, left.ts)``.

    Output: (purchase_id, user_id, n_clicks_30m).

    Same single-shuffle + per-user searchsorted shape as the as-of join:
    two binary searches per left row give the window's [lo, hi) postings
    range — never a per-pair expansion (the naive range join is quadratic
    in hot users).
    """
    win = np.timedelta64(window_minutes * 60 * 1_000_000, "us")
    ds = _bucketed(sf_dir, left_type, right_type)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        left = g[g["event_type"] == left_type].sort_values("ts")
        right = g[g["event_type"] == right_type].sort_values("ts")
        # per-user running click count; #(rt < t) via backward as-of with
        # exact matches excluded, so count([t-win, t)) = hi(t) - hi(t-win)
        right = right.assign(
            cum=right.groupby("user_id").cumcount() + 1)[
            ["user_id", "ts", "cum"]]

        def hi(at: pd.DataFrame) -> np.ndarray:
            m = pd.merge_asof(at, right, left_on="at", right_on="ts",
                              by="user_id", direction="backward",
                              allow_exact_matches=False)
            return m["cum"].fillna(0).to_numpy(np.int64)

        base = pd.DataFrame({"user_id": left["user_id"].to_numpy(),
                             "at": left["ts"].to_numpy()})
        n_hi = hi(base)                          # #(rt <  t)
        n_lo = hi(base.assign(at=base["at"] - win))   # #(rt < t-win)
        # [t-win, t) count: rows at exactly t-win are in n_hi, not n_lo
        return pd.DataFrame({
            "purchase_id": left["event_id"].to_numpy(),
            "user_id": left["user_id"].to_numpy(),
            "n_clicks_30m": (n_hi - n_lo).astype(np.int64),
        })

    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                           num_cpus=1)


# ---------------------------------------------------------------------------
# sliding windows: 1 h length, 15 min slide
# ---------------------------------------------------------------------------

SLIDE_MIN = 15
WINDOW_SLIDES = 4      # window length = SLIDE_MIN * WINDOW_SLIDES = 1 h


def events_sliding_window(sf_dir: str):
    """Sliding-window aggregate: 1-hour windows every 15 minutes;
    per window, event count and value sum.

    Output: (window_start, n_events, sum_value)  [sum rounded to 2dp].

    Each event belongs to exactly ``WINDOW_SLIDES`` windows
    (``floor15(ts) - k*15min`` for k in 0..3), so the explode factor is a
    small constant and happens INSIDE ``map_batches`` fused with partial
    aggregation — the shuffle moves (window, count, sum) partials, not
    exploded events.
    """
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=("ts", "value"))
    slide = np.timedelta64(SLIDE_MIN * 60 * 1_000_000, "us")

    def explode_partial(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], multiple=SLIDE_MIN, unit="minute")
        base_np = base.to_numpy(zero_copy_only=False)
        vals = t["value"].to_numpy(zero_copy_only=False)
        parts = []
        for k in range(WINDOW_SLIDES):
            w = base_np - k * slide
            parts.append(pa.table({
                "window_start": pa.array(w, pa.timestamp("us")),
                "value": pa.array(vals),
            }))
        cat = pa.concat_tables(parts)
        return cat.group_by("window_start").aggregate(
            [("value", "sum"), ("value", "count")])

    agg = ds.map_batches(explode_partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("window_start").aggregate(
            Sum("value_sum", alias_name="sum_v"),
            Sum("value_count", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        from .analytics import _round   # DuckDB-identical double rounding

        return pa.table({
            "window_start": t["window_start"],
            "n_events": pc.cast(t["n"], pa.int64()),
            "sum_value": _round(t["sum_v"], 2),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distinct active days per user (exact distinct via two-level dedup)
# ---------------------------------------------------------------------------


def user_active_days(sf_dir: str):
    """Per-user exact count of distinct active days.

    Output: (user_id, n_days).

    Two-level distinct: per-batch (user, day) dedup inside ``map_batches``
    (the combiner — collapses each batch to at most users x days rows),
    then one shuffle on user_id and an exact per-group nunique.  The
    shuffle never moves raw events, only the deduped pairs.
    """
    ds = _events(sf_dir, columns=("user_id", "ts"))
    npart = coarse_npart()

    def batch_distinct(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        pairs = pa.table({"user_id": t["user_id"], "day": day})
        pairs = pairs.group_by(["user_id", "day"]).aggregate([])
        bucket = pc.cast(pc.bit_wise_and(pairs["user_id"], npart - 1),
                         pa.int64())
        return pairs.append_column("bucket", bucket)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id")["day"].nunique()
        return pd.DataFrame({"user_id": agg.index.to_numpy(),
                             "n_days": agg.to_numpy(np.int64)})

    return (ds.map_batches(batch_distinct, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1))


def decayed_user_value(sf_dir: str, half_life_days: int = 7):
    """Per-user exponentially time-decayed engagement value: each event
    contributes ``cents * 0.5 ** age_weeks`` where ``age_weeks =
    floor(days_before_anchor / half_life_days)`` and the anchor is the
    corpus max event date.  The recency-weighted LTV/engagement score a
    ranking or sampling stage consumes.

    Exactness: decay weights are POWERS OF TWO over integer cents, so
    every contribution is an exact int64 multiple of cents/2^kmax — the
    distributed sum is order-independent and bit-equal to the SQL oracle
    regardless of block arrival order (the same reason grouped_corr uses
    integer moments).  Output: (user_id, n_events, decayed_q) with
    decayed_q in units of cents / 2^kmax, kmax = floor(span_days /
    half_life).

    Scale shape: one bounded aggregate pass for the (min, max) date
    anchor, then one scoring scan with per-batch per-user partial sums
    (the combiner) and ONE coarse user-bucket reduction; raw events never
    shuffle.
    """
    from ray.data.aggregate import Max, Min

    npart = coarse_npart()
    US_DAY = 86_400_000_000
    bounds = _events(sf_dir, columns=("ts",)).aggregate(
        Max("ts"), Min("ts"))
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64()),
                      "decayed_q": pa.array([], pa.int64())})
    if bounds is None or bounds.get("max(ts)") is None:
        import ray
        return ray.data.from_arrow(empty)
    d1 = int(pd.Timestamp(bounds["max(ts)"]).value // 1000) // US_DAY
    d0 = int(pd.Timestamp(bounds["min(ts)"]).value // 1000) // US_DAY
    kmax = (d1 - d0) // half_life_days

    def partial(t: pa.Table) -> pa.Table:
        e_days = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                  // US_DAY)
        k = (d1 - e_days) // half_life_days
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        contrib = cents << (kmax - k)
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(
            zero_copy_only=False), "n_events": 1, "decayed_q": contrib})
        agg = df.groupby("user_id", sort=False, as_index=False).sum()
        agg["bucket"] = agg["user_id"] % npart
        return pa.Table.from_pandas(agg, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)[
            ["n_events", "decayed_q"]].sum()

    return (_events(sf_dir, columns=("ts", "user_id", "value"))
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=262144)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1))


def rolling_active_users(sf_dir: str, window: int = 7):
    """Exact trailing-N-day distinct active users (rolling DAU/WAU): for
    every day that appears in the data, the number of DISTINCT users with
    at least one event in [day - (window-1), day] — the sliding-window
    COUNT DISTINCT that neither a plain groupby (windows overlap) nor a
    per-user pass (count is per-day) expresses.

    Output: (day, n_users) with day as midnight timestamp[us], only days
    observed in the data.

    Scale shape: the per-batch combiner dedups to distinct (user, day)
    pairs (at most users x days rows per batch); each pair explodes into
    ``window`` (window_day, user) membership int pairs; ONE shuffle
    bucketed by window_day co-locates every window's members, so the
    per-bucket distinct-and-count is exact with no second exchange (a
    given (window_day, user) duplicate always lands in the same bucket).
    Partial output is bounded (<= |days| rows).  Events themselves never
    shuffle, and the explosion factor is the window length — constant.
    """
    ds = _events(sf_dir, columns=("user_id", "ts"))
    npart = coarse_npart()

    def explode(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        pairs = pa.table({"user_id": t["user_id"], "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])
        u = pairs["user_id"].to_numpy(zero_copy_only=False)
        d_us = pairs["day"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)                     # midnight micros
        d = d_us // 86_400_000_000                    # day ordinal
        k = np.arange(window, dtype=np.int64)
        wday = (d[:, None] + k).ravel()
        return pa.table({
            "wday": pa.array(wday),
            "user_id": pa.array(np.repeat(u, window)),
            "is_base": pa.array(np.tile(k == 0, len(d))),
            "bucket": pa.array(wday % npart),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("wday").agg(
            n_users=("user_id", "nunique"), obs=("is_base", "max"))
        agg = agg[agg["obs"]]
        day_us = agg.index.to_numpy(np.int64) * 86_400_000_000
        return pd.DataFrame({
            "day": day_us.astype("datetime64[us]"),
            "n_users": agg["n_users"].to_numpy(np.int64)})

    return (ds.map_batches(explode, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1))


# ---------------------------------------------------------------------------
# per-user window functions: ROW_NUMBER, running SUM, LAG delta
# ---------------------------------------------------------------------------


def events_window_functions(sf_dir: str):
    """The ROW_NUMBER / cumulative-SUM / LAG window-function surface, per
    user over the event stream ordered by (ts, event_id).

    Output: (event_id, user_id, rn, cum_cents, gap_us)
      rn        ROW_NUMBER() within the user's timeline
      cum_cents running sum of ROUND(value*100) as int64 (integer cents —
                float accumulation order would make the value-hash flaky)
      gap_us    microseconds since the user's previous event (NULL first)

    Same single-shuffle shape as the other temporal operators: bucket by
    ``user_id % NPART``, then one vectorized pandas pass per bucket —
    cumulative kernels are exactly the per-key order-dependent compute
    that must live inside a partition at 100 TB.
    """
    ds = _events(sf_dir, columns=("event_id", "ts", "user_id", "value"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        # DuckDB-identical ROUND(value*100): rint differs half-to-even vs
        # half-away, but *100 of two-decimal doubles never lands exactly
        # on .5; analytics._round documents the ULP rationale
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "t": ts_us, "c": cents},
                          index=np.arange(len(g)))
        gr = df.groupby("u", sort=False)
        rn = (gr.cumcount() + 1).to_numpy(np.int64)
        cum = gr["c"].cumsum().to_numpy(np.int64)
        gap = df["t"] - gr["t"].shift()          # float64 with NaN firsts
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(np.int64)),
            "user_id": pa.array(df["u"].to_numpy()),
            "rn": pa.array(rn),
            "cum_cents": pa.array(cum),
            "gap_us": pa.array(gap.astype("Int64"), pa.int64()),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                          num_cpus=1))


def events_window_frame(sf_dir: str, frame: int = 3, tiles: int = 4):
    """The frame-bounded / tiling window surface: per user over (ts,
    event_id) order,
      mov_cents  SUM(cents) OVER (... ROWS BETWEEN 3 PRECEDING AND
                 CURRENT ROW) — sliding-frame aggregate, integer cents
      tile       NTILE(4) OVER (PARTITION BY user_id ORDER BY ...) —
                 rank-based tiling (first n%k tiles get the extra row)

    Same single-shuffle shape as events_window_functions: bucket by
    ``user_id % NPART``, one vectorized pandas/numpy pass per bucket
    (rolling sum via cumsum difference; NTILE via the exact rank formula,
    never qcut).  Output: (event_id, user_id, mov_cents, tile).
    """
    ds = _events(sf_dir, columns=("event_id", "ts", "user_id", "value"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "c": cents}, index=np.arange(len(g)))
        gr = df.groupby("u", sort=False)
        # frame sum = cumsum - cumsum lagged by frame+1 within the key
        # (groupby.rolling would reorder rows group-major; cumsum/shift
        # stay aligned to the original row order)
        cum = gr["c"].cumsum()
        lagged = cum.groupby(df["u"], sort=False).shift(frame + 1)
        mov = (cum - lagged.fillna(0)).to_numpy(np.float64).astype(np.int64)
        # NTILE(k): rows 0..n-1 by rank; first (n % k) tiles take
        # ceil(n/k) rows, the rest floor(n/k) (SQL standard)
        rn0 = gr.cumcount().to_numpy(np.int64)
        n = gr["c"].transform("size").to_numpy(np.int64)
        big = n % tiles                       # tiles with ceil(n/k) rows
        ceil_sz = (n + tiles - 1) // tiles
        floor_sz = np.maximum(n // tiles, 1)
        split = big * ceil_sz                 # rank where small tiles start
        in_big = rn0 < split
        tile = np.where(in_big, rn0 // np.maximum(ceil_sz, 1),
                        big + (rn0 - split) // floor_sz) + 1
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(np.int64)),
            "user_id": pa.array(df["u"].to_numpy()),
            "mov_cents": pa.array(mov),
            "tile": pa.array(tile.astype(np.int64)),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                          num_cpus=1))


def events_rank_lead(sf_dir: str):
    """The ranking / forward-looking window surface, completing the
    window-function family (ROW_NUMBER/LAG/SUM: events_window_functions;
    frames/NTILE: events_window_frame):
      rnk        RANK() OVER (PARTITION BY user_id ORDER BY cents DESC)
                 — ties share the rank, gaps follow
      drnk       DENSE_RANK() — ties share, no gaps
      lead_cents LEAD(cents) OVER (PARTITION BY user_id
                 ORDER BY cents DESC, event_id) — NULL at partition end

    Output: (event_id, user_id, cents, rnk, drnk, lead_cents).

    Same single-shuffle shape as the sibling operators: bucket by
    ``user_id % NPART``, one vectorized pandas pass per bucket (C rank
    kernels + shift; no per-row Python).
    """
    ds = _events(sf_dir, columns=("event_id", "ts", "user_id", "value"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "c": cents,
                           "e": g["event_id"].to_numpy(np.int64)})
        df = df.sort_values(["u", "c", "e"], ascending=[True, False, True],
                            kind="mergesort", ignore_index=True)
        gr = df.groupby("u", sort=False)
        rnk = gr["c"].rank(ascending=False, method="min") \
            .to_numpy(np.int64)
        drnk = gr["c"].rank(ascending=False, method="dense") \
            .to_numpy(np.int64)
        lead = gr["c"].shift(-1)                 # float64 with NaN at ends
        return pa.table({
            "event_id": pa.array(df["e"].to_numpy()),
            "user_id": pa.array(df["u"].to_numpy()),
            "cents": pa.array(df["c"].to_numpy()),
            "rnk": pa.array(rnk),
            "drnk": pa.array(drnk),
            "lead_cents": pa.array(lead.astype("Int64"), pa.int64()),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                          num_cpus=1))


def user_event_journey(sf_dir: str, sep: str = ","):
    """Ordered collect / string_agg surface: each user's event-type
    sequence joined in (ts, event_id) order — the "session journey"
    string a funnel analysis consumes.

    Output: (user_id, n_events, journey).

    One shuffle (user bucket), then a vectorized per-bucket pass: sort
    once, ''.join per group via pandas str agg — no per-row Python in the
    outer stream, and journeys stay bounded by the per-user event count
    (document the per-key cardinality assumption: a single key's events
    must fit one worker, the same contract every ordered window op has).
    """
    ds = _events(sf_dir, columns=("event_id", "ts", "user_id",
                                  "event_type"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", sort=False)["event_type"] \
            .agg(n_events="size", journey=sep.join)
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(np.int64),
            "n_events": agg["n_events"].to_numpy(np.int64),
            "journey": agg["journey"].to_numpy(object),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                          num_cpus=1))


def events_funnel(sf_dir: str, steps=("view", "click", "purchase")):
    """Ordered-funnel analysis: how far each user progresses through the
    step sequence, each step strictly AFTER the previous one in time (the
    classic product-analytics funnel; not mere set membership).

    Output: (user_id, reached) — reached in 0..len(steps).

    Scale shape: one user-bucket shuffle; inside each bucket the step
    cascade is vectorized pandas (per-step groupby-min + merge + filter),
    never a per-user Python loop.  Users are bucket-local so per-bucket
    results are the global result.
    """
    ds = _events(sf_dir, columns=("event_id", "ts", "user_id",
                                  "event_type"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        users = pd.DataFrame({"user_id": g["user_id"].unique()})
        reached = pd.Series(np.zeros(len(users), np.int64),
                            index=users["user_id"])
        prev = pd.DataFrame({
            "user_id": users["user_id"],
            "t_prev": np.full(len(users), np.datetime64("1677-09-22"),
                              dtype="datetime64[us]")})
        for depth, step in enumerate(steps, start=1):
            ev = g[g["event_type"] == step][["user_id", "ts"]]
            m = ev.merge(prev, on="user_id", how="inner")
            m = m[m["ts"] > m["t_prev"]]
            if not len(m):
                break
            t_step = m.groupby("user_id", as_index=False)["ts"].min()
            reached.loc[t_step["user_id"].to_numpy()] = depth
            prev = t_step.rename(columns={"ts": "t_prev"})
        return pa.table({
            "user_id": pa.array(users["user_id"].to_numpy(np.int64)),
            "reached": pa.array(reached.to_numpy(np.int64)),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                          num_cpus=1))


def _week_start_str(ts_us: np.ndarray) -> np.ndarray:
    """datetime64[us] -> Monday-start week as 'YYYY-MM-DD' strings
    (DuckDB date_trunc('week', ts) semantics)."""
    d = ts_us.astype("datetime64[D]")
    dow = (d.astype(np.int64) + 3) % 7          # 1970-01-01 was a Thursday
    return (d - dow.astype("timedelta64[D]")).astype(str)


def retention_cohorts(sf_dir: str):
    """Retention-cohort matrix: users grouped by their signup week
    (cohort), counted in every week they produce any event at or after
    the cohort week.

    Output: (cohort_week, week, n_users) — weeks as Monday-start
    'YYYY-MM-DD' strings; users with no signup event are excluded.

    Scale shape: one user-bucket shuffle computes each user's cohort and
    distinct activity weeks (users are bucket-local, so the per-bucket
    (cohort, week) partial counts are additive); the final reduce is over
    the BOUNDED (weeks x weeks x buckets) partial rows — constant-sized
    at any user count, collected driver-side like the other bounded
    reduces.
    """
    ds = _events(sf_dir, columns=("ts", "user_id", "event_type"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        su = g[g["event_type"] == "signup"]
        cohort_ts = su.groupby("user_id", as_index=False)["ts"].min()
        cohort_ts["cohort_week"] = _week_start_str(
            cohort_ts["ts"].to_numpy("datetime64[us]"))
        acts = g[["user_id", "ts"]].copy()
        acts["week"] = _week_start_str(acts["ts"].to_numpy("datetime64[us]"))
        acts = acts[["user_id", "week"]].drop_duplicates()
        m = acts.merge(cohort_ts[["user_id", "cohort_week"]], on="user_id",
                       how="inner")
        m = m[m["week"] >= m["cohort_week"]]
        agg = m.groupby(["cohort_week", "week"], as_index=False).size()
        return pa.table({
            "cohort_week": pa.array(agg["cohort_week"].to_numpy(object),
                                    pa.string()),
            "week": pa.array(agg["week"].to_numpy(object), pa.string()),
            "n": pa.array(agg["size"].to_numpy(np.int64)),
        })

    partials = (ds.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("bucket").map_groups(per_bucket,
                                              batch_format="pandas",
                                              num_cpus=1))
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    if not parts:
        return pa.table({"cohort_week": pa.array([], pa.string()),
                         "week": pa.array([], pa.string()),
                         "n_users": pa.array([], pa.int64())})
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts]).to_pandas()
    agg = rows.groupby(["cohort_week", "week"], as_index=False)["n"].sum()
    return pa.table({
        "cohort_week": pa.array(agg["cohort_week"].to_numpy(object),
                                pa.string()),
        "week": pa.array(agg["week"].to_numpy(object), pa.string()),
        "n_users": pa.array(agg["n"].to_numpy(np.int64)),
    })


def cohort_ltv(sf_dir: str):
    """Cohort lifetime-value matrix: users grouped by signup week, purchase
    revenue accumulated by week offset since the cohort week — the
    monetized companion of ``retention_cohorts`` (does revenue compound or
    stall per acquisition cohort?).

    Output: (cohort_week, week_offset, wk_cents, cum_cents) — exact
    integer cents; offsets only for weeks with at least one purchase
    (cum runs over the present offsets, mirroring the SQL window).

    Scale shape: one user-bucket shuffle (users are bucket-local, so the
    per-bucket (cohort, offset) revenue partials are additive); the final
    reduce + running sum happens over the BOUNDED weeks x weeks x buckets
    partial rows on the driver, like the other bounded reduces.
    """
    ds = _events(sf_dir, columns=("ts", "user_id", "event_type", "value"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        su = g[g["event_type"] == "signup"]
        cohort = su.groupby("user_id", as_index=False)["ts"].min()
        cw_days = cohort["ts"].to_numpy("datetime64[us]") \
            .astype("datetime64[D]")
        cw_days = cw_days - ((cw_days.astype(np.int64) + 3) % 7) \
            .astype("timedelta64[D]")         # Monday start (_week_start)
        cohort = pd.DataFrame({"user_id": cohort["user_id"],
                               "cw": cw_days})
        pu = g[g["event_type"] == "purchase"][["user_id", "ts", "value"]]
        if not len(pu) or not len(cohort):
            return pa.table({"cohort_week": pa.array([], pa.string()),
                             "week_offset": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        pw = pu["ts"].to_numpy("datetime64[us]").astype("datetime64[D]")
        pw = pw - ((pw.astype(np.int64) + 3) % 7).astype("timedelta64[D]")
        pu = pd.DataFrame({
            "user_id": pu["user_id"].to_numpy(np.int64),
            "pw": pw,
            # DuckDB-identical ROUND(value*100) (half away from zero on
            # the .5 grid reachable from 2-decimal doubles)
            "cents": np.rint(pu["value"].to_numpy(np.float64) * 100.0)
            .astype(np.int64)})
        m = pu.merge(cohort, on="user_id", how="inner")
        m = m[m["pw"] >= m["cw"]]
        if not len(m):
            return pa.table({"cohort_week": pa.array([], pa.string()),
                             "week_offset": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        off = ((m["pw"].to_numpy("datetime64[D]")
                - m["cw"].to_numpy("datetime64[D]"))
               .astype(np.int64) // 7)
        agg = pd.DataFrame({
            "cohort_week": m["cw"].to_numpy("datetime64[D]").astype(str),
            "week_offset": off,
            "cents": m["cents"].to_numpy(np.int64)}) \
            .groupby(["cohort_week", "week_offset"], as_index=False)[
            "cents"].sum()
        return pa.table({
            "cohort_week": pa.array(agg["cohort_week"].to_numpy(object),
                                    pa.string()),
            "week_offset": pa.array(agg["week_offset"]
                                    .to_numpy(np.int64)),
            "cents": pa.array(agg["cents"].to_numpy(np.int64)),
        })

    partials = (ds.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("bucket").map_groups(per_bucket,
                                              batch_format="pandas",
                                              num_cpus=1))
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    empty = pa.table({"cohort_week": pa.array([], pa.string()),
                      "week_offset": pa.array([], pa.int64()),
                      "wk_cents": pa.array([], pa.int64()),
                      "cum_cents": pa.array([], pa.int64())})
    if not parts:
        return empty
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts]).to_pandas()
    if not len(rows):
        return empty
    agg = rows.groupby(["cohort_week", "week_offset"], as_index=False)[
        "cents"].sum().sort_values(["cohort_week", "week_offset"])
    cum = agg.groupby("cohort_week")["cents"].cumsum()
    return pa.table({
        "cohort_week": pa.array(agg["cohort_week"].to_numpy(object),
                                pa.string()),
        "week_offset": pa.array(agg["week_offset"].to_numpy(np.int64)),
        "wk_cents": pa.array(agg["cents"].to_numpy(np.int64)),
        "cum_cents": pa.array(cum.to_numpy(np.int64)),
    })


def funnel_windowed(sf_dir: str, steps=("view", "click", "purchase"),
                    window_days: int = 7):
    """Time-constrained funnel: each step must happen strictly AFTER the
    previous step AND within ``window_days`` of it (the product-analytics
    "conversion window" variant of ``events_funnel`` — a purchase three
    months after the click no longer counts as funnel progress).

    Output: (step_idx, step, n_users) — one row per step, the number of
    users whose windowed cascade reaches it.

    Scale shape: one user-bucket shuffle; inside each bucket the cascade
    is the same vectorized per-step groupby-min + merge as
    ``events_funnel`` with the window upper bound added; per-bucket step
    counts are additive, so the final reduce is len(steps) x buckets rows
    on the driver.
    """
    ds = _events(sf_dir, columns=("ts", "user_id", "event_type"))
    npart = coarse_npart()
    win = np.timedelta64(window_days, "D")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        counts = np.zeros(len(steps), np.int64)
        first = g[g["event_type"] == steps[0]] \
            .groupby("user_id", as_index=False)["ts"].min()
        counts[0] = len(first)
        prev = first.rename(columns={"ts": "t_prev"})
        for depth, step in enumerate(steps[1:], start=1):
            if not len(prev):
                break
            ev = g[g["event_type"] == step][["user_id", "ts"]]
            m = ev.merge(prev, on="user_id", how="inner")
            m = m[(m["ts"] > m["t_prev"]) & (m["ts"] <= m["t_prev"] + win)]
            if not len(m):
                break
            t_step = m.groupby("user_id", as_index=False)["ts"].min()
            counts[depth] = len(t_step)
            prev = t_step.rename(columns={"ts": "t_prev"})
        return pa.table({"step_idx": pa.array(
            np.arange(1, len(steps) + 1, dtype=np.int64)),
            "n": pa.array(counts)})

    partials = (ds.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("bucket").map_groups(per_bucket,
                                              batch_format="pandas",
                                              num_cpus=1))
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    totals = np.zeros(len(steps), np.int64)
    for p in parts:
        t = p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
        if t.num_rows:
            idx = t["step_idx"].to_numpy(zero_copy_only=False) - 1
            np.add.at(totals, idx, t["n"].to_numpy(zero_copy_only=False))
    return pa.table({
        "step_idx": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
        "step": pa.array(list(steps), pa.string()),
        "n_users": pa.array(totals),
    })


def events_anomaly_days(sf_dir: str):
    """Daily-volume anomaly detection per event type: flag days whose
    event count deviates from the type's mean by more than two population
    standard deviations — the monitoring primitive over an event stream.

    Output: (event_type, day, n, is_anomaly) — day as 'YYYY-MM-DD', n the
    day's count, flag exact.

    The |z| > 2 test is evaluated in EXACT integer arithmetic
    ((n*d - S)^2 > 4*(Q*d - S^2), with d = #days, S = sum n, Q = sum n^2
    per type — both sides integers), so the flag can never disagree with
    the SQL oracle over float rounding.  At extreme daily volumes the
    squares outgrow int64 and production would flip to floats; the
    integer form is the oracle-bridge contract (same convention as the
    basis-point quality scores).

    Scale shape: per-batch (type, day) count partials (the combiner —
    each batch ships one row per distinct pair), one small groupby over
    the BOUNDED (types x days) key space, and a driver-side flag pass
    over that bounded table.
    """
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=("ts", "event_type"))

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t["ts"], unit="day"),
                          format="%Y-%m-%d")
        pairs = pa.table({"event_type": t["event_type"], "day": day})
        agg = pairs.group_by(["event_type", "day"]).aggregate(
            [("day", "count")])
        return pa.table({"event_type": agg["event_type"],
                         "day": agg["day"],
                         "cnt": pc.cast(agg["day_count"], pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby(["event_type", "day"])
            .aggregate(Sum("cnt", alias_name="n"))
            .take_all())                 # bounded: |types| x |days|
    if not rows:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "day": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "is_anomaly": pa.array([], pa.bool_())})
    df = pd.DataFrame(rows)
    g = df.groupby("event_type")["n"]
    d = g.transform("size").to_numpy(np.int64)
    S = g.transform("sum").to_numpy(np.int64)
    Q = g.transform(lambda s: (s.astype(np.int64) ** 2).sum()) \
        .to_numpy(np.int64)
    n = df["n"].to_numpy(np.int64)
    flag = (n * d - S) ** 2 > 4 * (Q * d - S * S)
    order = np.lexsort((df["day"].to_numpy(object),
                        df["event_type"].to_numpy(object)))
    return pa.table({
        "event_type": pa.array(df["event_type"].to_numpy(object)[order],
                               pa.string()),
        "day": pa.array(df["day"].to_numpy(object)[order], pa.string()),
        "n": pa.array(n[order]),
        "is_anomaly": pa.array(flag[order]),
    })


def events_streaks(sf_dir: str):
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    (the classic streak/retention primitive SQL solves with the
    row_number-difference trick).

    Output: (user_id, start_day, end_day, n_days) — one row per island,
    days as 'YYYY-MM-DD'.

    Scale shape (same discipline as user_active_days): a per-batch
    DISTINCT (user_id, day) combiner collapses each batch to at most one
    row per active pair BEFORE the shuffle, then ONE hash shuffle on
    ``user_id % NPART`` and a vectorized island scan per bucket
    (sort + cumcount; island id = epoch_day - per-user rank, constant
    within a run).  Nothing is order-dependent across buckets because
    islands never span users.
    """
    ds = _events(sf_dir, columns=("ts", "user_id"))
    npart = coarse_npart()

    def batch_distinct(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                              pa.date32()), pa.int32())
        pairs = pa.table({"user_id": t["user_id"], "day": day})
        uniq = pairs.group_by(["user_id", "day"]).aggregate([])
        b = pc.cast(pc.bit_wise_and(uniq["user_id"], npart - 1), pa.int64())
        return uniq.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # re-distinct (batch combiner dedups within batches only)
        g = g.drop_duplicates(["user_id", "day"]) \
             .sort_values(["user_id", "day"], kind="mergesort",
                          ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        rn = np.arange(len(g)) - \
            pd.Series(np.arange(len(g))).groupby(u, sort=False) \
              .transform("min").to_numpy(np.int64)
        island = day - rn                     # constant within a run
        df = pd.DataFrame({"u": u, "i": island, "d": day})
        gr = df.groupby(["u", "i"], sort=False)["d"]
        agg = gr.agg(["min", "max", "size"]).reset_index()
        fmt = np.datetime_as_string(
            agg["min"].to_numpy(np.int64).astype("datetime64[D]"), unit="D")
        fmt_end = np.datetime_as_string(
            agg["max"].to_numpy(np.int64).astype("datetime64[D]"), unit="D")
        return pa.table({
            "user_id": pa.array(agg["u"].to_numpy(np.int64)),
            "start_day": pa.array(fmt, pa.string()),
            "end_day": pa.array(fmt_end, pa.string()),
            "n_days": pa.array(agg["size"].to_numpy(np.int64)),
        })

    return (ds.map_batches(batch_distinct, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                          num_cpus=1))


def events_percent_rank(sf_dir: str):
    """PERCENT_RANK / CUME_DIST per user over spend cents — the relative-
    rank window surface, in exact integer micro-units so the value hash
    can never drift on IEEE division order:
      pr_micro  (rank-1) * 1e6 // (n-1)   (0 when the user has one row)
      cd_micro  (#rows with cents <= current) * 1e6 // n

    Output: (event_id, user_id, cents, pr_micro, cd_micro).

    Same single-shuffle shape as the sibling window operators: bucket by
    ``user_id % NPART``, one vectorized pandas rank pass per bucket
    (method='min' for PERCENT_RANK, method='max' for the <=-count of
    CUME_DIST — both C kernels).
    """
    ds = _events(sf_dir, columns=("event_id", "ts", "user_id", "value"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "c": cents})
        gr = df.groupby("u", sort=False)
        rnk = gr["c"].rank(method="min").to_numpy(np.int64)
        le = gr["c"].rank(method="max").to_numpy(np.int64)
        n = gr["c"].transform("size").to_numpy(np.int64)
        pr = np.where(n > 1, (rnk - 1) * 1_000_000 // np.maximum(n - 1, 1),
                      0)
        cd = le * 1_000_000 // n
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(np.int64)),
            "user_id": pa.array(df["u"].to_numpy()),
            "cents": pa.array(df["c"].to_numpy()),
            "pr_micro": pa.array(pr.astype(np.int64)),
            "cd_micro": pa.array(cd.astype(np.int64)),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                          num_cpus=1))


def event_transitions(sf_dir: str):
    """First-order Markov transition statistics over per-user event
    sequences — the sequence-mining primitive behind next-action models
    and funnel diagnostics: count consecutive (from_type -> to_type)
    transitions in each user's (ts, event_id)-ordered timeline, with the
    row-conditional probability in exact integer micro-units
    (p_micro = n * 1e6 // n_from, so the value hash can never drift on
    float division).

    Output: (from_type, to_type, n, p_micro).

    Scale shape: ONE hash shuffle on ``user_id % NPART``; each bucket
    emits its |types|^2-bounded partial transition counts (vectorized
    shift-compare, no per-row Python), then a BOUNDED groupby + driver
    conditional-probability pass over |types|^2 rows.
    """
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=("event_id", "ts", "user_id",
                                  "event_type"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                          ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        same = np.empty(len(g), dtype=bool)
        if len(g):
            same[0] = False
            same[1:] = u[1:] == u[:-1]
        src = et[np.flatnonzero(same) - 1]
        dst = et[same]
        df = pd.DataFrame({"from_type": src, "to_type": dst})
        agg = df.groupby(["from_type", "to_type"], sort=False) \
            .size().reset_index(name="c")
        return pa.Table.from_pandas(agg, preserve_index=False)

    rows = (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("c", alias_name="n"))
            .take_all())                    # bounded: |types|^2 rows
    if not rows:
        return pa.table({"from_type": pa.array([], pa.string()),
                         "to_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "p_micro": pa.array([], pa.int64())})
    df = pd.DataFrame(rows).sort_values(["from_type", "to_type"],
                                        ignore_index=True)
    n = df["n"].to_numpy(np.int64)
    n_from = df.groupby("from_type")["n"].transform("sum") \
        .to_numpy(np.int64)
    return pa.table({
        "from_type": pa.array(df["from_type"].to_numpy(object),
                              pa.string()),
        "to_type": pa.array(df["to_type"].to_numpy(object), pa.string()),
        "n": pa.array(n),
        "p_micro": pa.array(n * 1_000_000 // n_from),
    })


def session_concurrency(sf_dir: str):
    """Interval-overlap sweep: the maximum number of user sessions open
    at the same instant, and the earliest microsecond it happens — the
    capacity-planning primitive (peak concurrency) and the engine's
    distributed ORDERED-PREFIX-SUM pattern.

    Sessions use the same 30-minute-gap rule as events_sessionize; a
    session [s, e] is open on the closed interval (a one-event session
    is open at its instant).

    Output: ONE row (max_concurrent, at_micro).

    Scale shape (scan-combine, no global sort): one user-bucket shuffle
    builds session intervals vectorized; interval endpoints become
    (+1 at s, -1 at e) deltas routed by DAY bucket; each day bucket
    sorts ITS deltas (t, +1-before--1), computes its local prefix sums,
    and emits a 4-number summary (total, local max, earliest argmax t,
    day).  The driver folds the bounded day summaries left-to-right —
    global offset per day is the running total, global max is
    max(offset + local max) — the classic parallel-scan combine; no
    per-event data crosses the driver.
    """
    ds = _events(sf_dir, columns=("user_id", "ts"))
    npart = coarse_npart()
    gap_us = 30 * 60 * 1_000_000
    day_us = 86_400_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def intervals(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="mergesort",
                          ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new = np.empty(len(g), dtype=bool)
        if len(g):
            new[0] = True
            new[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(g)) - 1
        s, e = ts[starts], ts[ends]
        t_all = np.concatenate([s, e])
        delta = np.concatenate([np.ones(len(s), np.int64),
                                np.full(len(e), -1, np.int64)])
        return pa.table({"dbkt": pa.array(t_all // day_us),
                         "t": pa.array(t_all), "delta": pa.array(delta)})

    def day_summary(g: pd.DataFrame) -> pa.Table:
        # +1 before -1 at equal t: sort by (t, -delta)
        g = g.sort_values(["t", "delta"], ascending=[True, False],
                          kind="mergesort", ignore_index=True)
        run = g["delta"].to_numpy(np.int64).cumsum()
        mx = int(run.max())
        at = int(g["t"].to_numpy(np.int64)[int(np.argmax(run == mx))])
        return pa.table({"day": pa.array([int(g["dbkt"].iloc[0])]),
                         "total": pa.array([int(run[-1])]),
                         "mx": pa.array([mx]), "at": pa.array([at])})

    rows = (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(intervals,
                                          batch_format="pandas")
            .groupby("dbkt").map_groups(day_summary,
                                        batch_format="pandas")
            .take_all())                  # bounded: one row per day
    rows.sort(key=lambda r: r["day"])
    offset, best, best_at = 0, None, None
    for r in rows:
        cand = offset + int(r["mx"])
        if best is None or cand > best:
            best, best_at = cand, int(r["at"])
        offset += int(r["total"])
    if best is None:
        return pa.table({"max_concurrent": pa.array([], pa.int64()),
                         "at_micro": pa.array([], pa.int64())})
    return pa.table({"max_concurrent": pa.array([best], pa.int64()),
                     "at_micro": pa.array([best_at], pa.int64())})


EVENT_PATTERN = "v+cp"        # views then click then purchase


def event_pattern_match(sf_dir: str, pattern: str = EVENT_PATTERN):
    """MATCH_RECOGNIZE-lite sequence pattern mining: each user's
    time-ordered event types compressed to an initials string
    (signup->s, view->v, click->c, purchase->p, error->e) and scanned
    for non-overlapping REGEX occurrences — 'v+cp' = "one or more views,
    then a click, then a purchase", the row-pattern-matching shape SQL
    standard MATCH_RECOGNIZE covers and most engines lack.

    Output: (user_id, n_events, n_matches).

    Scale shape: one user-bucket shuffle (the ordered-collect machinery
    of user_event_journey), then a vectorized per-bucket pass — the
    regex runs ONCE per user string via Arrow's RE2 kernel
    (count_substring_regex), never per event.  Both engines are RE2, so
    leftmost non-overlapping counts agree exactly with the oracle's
    regexp_extract_all.
    """
    ds = _events(sf_dir, columns=("event_id", "ts", "user_id",
                                  "event_type"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        ini = pc.utf8_slice_codeunits(t["event_type"], 0, 1)
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"], "ini": ini,
                         "bucket": b})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", sort=False)["ini"] \
            .agg(n_events="size", s="".join)
        n_matches = pc.count_substring_regex(
            pa.array(agg["s"].to_numpy(object), pa.string()), pattern)
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(np.int64),
            "n_events": agg["n_events"].to_numpy(np.int64),
            "n_matches": np.asarray(n_matches).astype(np.int64),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1))


PATH_TOPK = 20


def journey_trigram_paths(sf_dir: str, k: int = PATH_TOPK):
    """Common-path mining (PrefixSpan-lite): the top-k contiguous
    3-event paths by DISTINCT-user support over time-ordered journeys —
    the product-analytics "what do people actually do" table.  Output:
    (path, n_users, rk), path = three event-type initials, ties broken
    path ASC.

    Scale shape: per-user journey strings assemble in the user-bucket
    pass (one shuffle, same machinery as user_event_journey); each
    bucket emits its DISTINCT (path, user) pairs pre-deduped, so the
    final groupby counts |paths| x bucket rows; paths are a bounded
    |event_types|^3 domain.
    """
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=("event_id", "ts", "user_id",
                                  "event_type"))
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        ini = pc.utf8_slice_codeunits(t["event_type"], 0, 1)
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"], "ini": ini,
                         "bucket": b})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: sort (user, ts, event_id), pack each
        # within-user char trigram into an int, distinct (user, tri)
        # via np.unique — users are bucket-complete, so per-bucket
        # distinct counts sum exactly
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        c = np.frombuffer("".join(g["ini"]).encode("utf-32-le"),
                          dtype="<u4").astype(np.int64)
        if len(c) < 3:
            return pd.DataFrame({"path": [], "n": []})
        same = (u[:-2] == u[1:-1]) & (u[:-2] == u[2:])
        tri = (c[:-2] << 16) | (c[1:-1] << 8) | c[2:]
        key = np.unique(u[:-2][same] * (1 << 24) + tri[same])
        tri_u, cnt = np.unique(key % (1 << 24), return_counts=True)
        paths = ["".join(chr(int(x)) for x in
                         ((t >> 16) & 0xFF, (t >> 8) & 0xFF, t & 0xFF))
                 for t in tri_u]
        return pd.DataFrame({"path": paths, "n": cnt.astype(np.int64)})

    counts = (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas",
                                            num_cpus=1)
              .groupby("path").aggregate(Sum("n", alias_name="n_users")))

    def topk(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas().sort_values(["n_users", "path"],
                                       ascending=[False, True]).head(k)
        return pa.table({
            "path": pa.array(df["path"].astype(str)),
            "n_users": pa.array(df["n_users"].to_numpy(np.int64)),
            "rk": pa.array(np.arange(1, len(df) + 1, dtype=np.int64))})

    # bounded domain (|event_types|^3): a single final cut is exact
    return counts.repartition(1).map_batches(topk,
                                             batch_format="pyarrow")
