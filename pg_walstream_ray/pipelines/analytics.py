"""Analytics pipelines over the testdata tables — the engine's general
data-processing surface (grouped aggregation with partial combine, broadcast
join, sessionization / windowed aggregates), expressed Ray-Data-first.

Patterns demonstrated:
  - pre-aggregate inside map_batches, then groupby over the partials
    (avoids shuffling every row);
  - broadcast the small join side via ray.put + lookup inside map_batches
    (no shuffle join);
  - session windows as groupby(key).map_groups over ts-sorted groups.

All float aggregates are rounded at the edge (ROUND(x, 2)) because
distributed summation order differs from any sequential oracle's.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    from ..functions.scale import sized_read_parquet

    return sized_read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def _round(arr, ndigits: int):
    """DuckDB-identical ROUND for doubles: rint(x * 10^n) / 10^n.
    pyarrow.compute.round yields a different ULP for many values, which
    breaks the driver's exact value-hash compare against the SQL oracle."""
    scale = 10.0 ** ndigits
    x = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else arr
    return pa.array(np.rint(np.asarray(x, dtype=np.float64) * scale) / scale)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate over lineitem with per-batch partial
    aggregation before the (tiny) groupby shuffle."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax",
                        "l_shipdate"])

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), batch["l_tax"]))
        batch = batch.append_column("disc_price", disc_price)
        batch = batch.append_column("charge", charge)
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("l_extendedprice", "sum"),
            ("disc_price", "sum"), ("charge", "sum"),
            ("l_discount", "sum"), ("l_quantity", "count"),
        ])
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=64 * 1024)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="s_qty"),
        Sum("l_extendedprice_sum", alias_name="s_base"),
        Sum("disc_price_sum", alias_name="s_disc"),
        Sum("charge_sum", alias_name="s_charge"),
        Sum("l_discount_sum", alias_name="s_discount"),
        Sum("l_quantity_count", alias_name="n"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"]
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": _round(t["s_qty"], 2),
            "sum_base_price": _round(t["s_base"], 2),
            "sum_disc_price": _round(t["s_disc"], 2),
            "sum_charge": _round(t["s_charge"], 2),
            "avg_qty": _round(pc.divide(t["s_qty"], pc.cast(n, pa.float64())), 4),
            "avg_disc": _round(pc.divide(t["s_discount"],
                                          pc.cast(n, pa.float64())), 4),
            "count_order": pc.cast(n, pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def customer_order_totals(sf_dir: str):
    """Per-customer order totals via partial agg + BROADCAST join of the
    small customer dimension (ray.put once, dict lookup per batch — no
    shuffle join)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_mktsegment"])
    cust = cust.take(pc.sort_indices(cust["c_custkey"])).combine_chunks()
    # broadcast sorted parallel arrays; attach via searchsorted (vectorized,
    # no per-row dict lookups)
    lookup_ref = ray.put((
        cust["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False),
        cust["c_name"].combine_chunks(),
        cust["c_mktsegment"].combine_chunks()))

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("o_custkey").aggregate([
            ("o_totalprice", "sum"), ("o_totalprice", "count")])

    # large partial-agg batches: with Ray's default small blocks each
    # partial barely reduces (every block touches most customers) and the
    # sort shuffle sees ~full input; 256k-row batches collapse the shuffle
    # input to ~key-cardinality rows per task (measured 4x wall)
    agg = orders.map_batches(partial, batch_format="pyarrow",
                             batch_size=262144) \
        .groupby("o_custkey").aggregate(
            Sum("o_totalprice_sum", alias_name="total"),
            Sum("o_totalprice_count", alias_name="n_orders"))

    class AttachName:
        def __init__(self, ref):
            self.keys, self.names, self.segs = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["o_custkey"].to_numpy(zero_copy_only=False)
            idx = pa.array(np.searchsorted(self.keys, k))  # FK: all hit
            return pa.table({
                "c_custkey": t["o_custkey"],
                "c_name": self.names.take(idx),
                "c_mktsegment": self.segs.take(idx),
                "total_spent": _round(t["total"], 2),
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
            })

    from ..stages.taskmode import as_tasks

    return agg.map_batches(as_tasks(AttachName, ref=lookup_ref),
                           batch_format="pyarrow")


SESSION_GAP_US = 30 * 60 * 1_000_000


def sessionize_events(sf_dir: str):
    """Session windows per user (gap > 30 min starts a new session) —
    groupby(key).map_groups over ts-sorted groups (the engine's windowed
    aggregate surface; Ray Data has no event-time windows natively)."""
    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over the whole bucket of users: session
        # starts where the user changes or the gap exceeds the threshold
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        gaps = g["ts"].diff().dt.total_seconds() * 1e6
        new_user = g["user_id"].ne(g["user_id"].shift())
        new_session = new_user | gaps.isna() | (gaps > SESSION_GAP_US)
        out = g.assign(new_s=new_session.astype(np.int64)).groupby(
            "user_id", as_index=False).agg(
            n_sessions=("new_s", "sum"), n_events=("new_s", "size"))
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1))


def session_type_lift(sf_dir: str):
    """Within-session event-type co-occurrence LIFT (association-rule
    mining over session baskets): for every unordered event-type pair
    (a < b), the number of sessions containing BOTH types and the lift
    ``P(a,b) / (P(a) P(b))`` in exact integer micro-units —
    ``lift_micro = n_ab * n_sessions * 10^6 // (n_a * n_b)`` (pure int64
    arithmetic, no float division, bit-equal to the SQL oracle).
    Sessions are the engine's standard 30-min-gap windows
    (sessionize_events).

    Output: (type_a, type_b, n_ab, lift_micro).

    Scale shape: one user-bucket shuffle (sessions are user-local, so
    every basket resolves inside its bucket); per bucket ONE vectorized
    sessionize scan + distinct (session, type) dedupe + predecessor-trick
    pair emission (baskets have <= |types| items, so pairs per session
    are bounded); partials are |types|^2 + |types| + 1 rows per bucket,
    reduced in one bounded driver pass.
    """
    import pandas as _pd

    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        gaps = g["ts"].diff().dt.total_seconds() * 1e6
        new_user = g["user_id"].ne(g["user_id"].shift())
        new_s = (new_user | gaps.isna()
                 | (gaps > SESSION_GAP_US)).to_numpy()
        sid = np.cumsum(new_s)                 # bucket-local session id
        # distinct (session, type) basket items
        items = _pd.DataFrame({"sid": sid,
                               "ty": g["event_type"].to_numpy()}) \
            .drop_duplicates()
        items = items.sort_values(["sid", "ty"], kind="mergesort")
        s = items["sid"].to_numpy()
        ty = items["ty"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        cnt = np.diff(np.append(starts, len(s)))
        # predecessor trick: row k in its basket pairs with each earlier
        # item; types sort ascending within a basket, so a < b holds
        local = np.arange(len(s), dtype=np.int64) - np.repeat(starts, cnt)
        csum = np.cumsum(local)
        total = int(csum[-1]) if len(csum) else 0
        rows = []
        if total:
            tb = np.repeat(ty, local)
            off = np.arange(total, dtype=np.int64) \
                - np.repeat(csum - local, local)
            ta = ty[np.repeat(np.arange(len(s), dtype=np.int64)
                              - local, local) + off]
            pc_df = _pd.DataFrame({"a": ta, "b": tb, "n": 1}) \
                .groupby(["a", "b"], as_index=False).sum()
            rows.append(_pd.DataFrame({"kind": "pair", "a": pc_df["a"],
                                       "b": pc_df["b"], "n": pc_df["n"]}))
        tc = items.groupby("ty", as_index=False).agg(n=("sid", "size"))
        rows.append(_pd.DataFrame({"kind": "type", "a": tc["ty"],
                                   "b": "", "n": tc["n"]}))
        rows.append(_pd.DataFrame({"kind": ["sess"], "a": [""],
                                   "b": [""], "n": [len(starts)]}))
        return _pd.concat(rows, ignore_index=True)

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas",
                                           num_cpus=1)
             .to_pandas())                    # bounded partial rows
    cols = ["type_a", "type_b", "n_ab", "lift_micro"]
    if len(parts) == 0:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c.startswith("type") else np.int64)
            for c in cols})
    agg = parts.groupby(["kind", "a", "b"], as_index=False)["n"].sum()
    n_sess = int(agg.loc[agg["kind"] == "sess", "n"].sum())
    n_ty = dict(zip(agg.loc[agg["kind"] == "type", "a"],
                    agg.loc[agg["kind"] == "type", "n"].astype(np.int64)))
    pr = agg[agg["kind"] == "pair"]
    n_ab = pr["n"].to_numpy(np.int64)
    na = np.fromiter((n_ty[a] for a in pr["a"]), np.int64, len(pr))
    nb = np.fromiter((n_ty[b] for b in pr["b"]), np.int64, len(pr))
    lift = (n_ab * n_sess * 1_000_000) // (na * nb)
    return pd.DataFrame({"type_a": pr["a"].to_numpy(),
                         "type_b": pr["b"].to_numpy(),
                         "n_ab": n_ab, "lift_micro": lift})


def hourly_event_stats(sf_dir: str):
    """Tumbling 1-hour windows: vectorized bucket column + grouped agg."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"hour": hour, "value": t["value"],
                         "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    agg = ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("hour").aggregate(Sum("value", alias_name="sum_value"),
                                   Sum("one", alias_name="n_events"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour": t["hour"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": _round(t["sum_value"], 2),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def value_histogram(sf_dir: str, width: float = 25.0):
    """Fixed-width histogram of event value per event type (the
    width_bucket primitive): bin = floor(value / width).

    Output: (event_type, bin, n_events) — one row per non-empty bin.

    Scale shape: per-batch combiner collapses each batch to at most
    |types| x |bins| partial-count rows, then ONE tiny groupby by type
    with a vectorized per-type bin sum; raw events never shuffle.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.floor(t["value"].to_numpy(zero_copy_only=False)
                     / width).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_numpy(
            zero_copy_only=False), "bin": b, "n_events": 1})
        agg = df.groupby(["event_type", "bin"], sort=False,
                         as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "bin"], as_index=False)[
            "n_events"].sum()

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("event_type").map_groups(per_type,
                                              batch_format="pandas",
                                              num_cpus=1))


BAND_TABLE = (("T0", 0, 1000), ("T1", 1000, 2500), ("T2", 2500, 5000),
              ("T3", 5000, 10000), ("T4", 10000, 25000),
              ("T5", 25000, np.iinfo(np.int64).max))


def value_band_lookup(sf_dir: str, bands=BAND_TABLE):
    """Broadcast RANGE-LOOKUP join: map each event's value (integer cents)
    into a named tier from a small [lo, hi) band table and aggregate per
    tier — the dimension-banding primitive (price tiers, latency SLO
    buckets, age bands) that a naive engine runs as a theta-join.

    Output: (tier, n_events, sum_cents) — tiers with no events are absent
    (inner-join semantics, mirroring the SQL oracle).

    Scale shape: the band table is tiny and broadcast in the task closure
    (one np.searchsorted per batch — no theta-join, no shuffle of raw
    events); each batch collapses to <= |bands| partial rows and the final
    reduce over |bands| x blocks rows happens in one tiny groupby.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["value"])
    names = np.array([b[0] for b in bands], object)
    lo = np.array([b[1] for b in bands], np.int64)   # sorted, contiguous

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        idx = np.searchsorted(lo, cents, side="right") - 1
        keep = idx >= 0                    # below the first band: no tier
        idx, cents = idx[keep], cents[keep]
        n = np.bincount(idx, minlength=len(lo))
        s = np.bincount(idx, weights=cents.astype(np.float64),
                        minlength=len(lo)).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table({"tier": pa.array(names[nz], pa.string()),
                         "n_events": pa.array(n[nz].astype(np.int64)),
                         "sum_cents": pa.array(s[nz])})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("tier").aggregate(Sum("n_events", alias_name="n_events"),
                                       Sum("sum_cents",
                                           alias_name="sum_cents")))


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped filtered aggregate: predicate applied per batch on
    pruned columns, partial sums, one global reduce. Returns one row."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                            pc.less(t["l_shipdate"], hi)),
                    pc.and_(pc.and_(
                        pc.greater_equal(t["l_discount"], 0.04),
                        pc.less_equal(t["l_discount"], 0.06)),
                        pc.less(t["l_quantity"], 24.0)))
        f = t.filter(m)
        rev = pc.sum(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table({"rev": pa.array([rev.as_py() or 0.0])})

    total = ds.map_batches(partial, batch_format="pyarrow").sum("rev")
    return pa.table({"revenue": _round(np.array([total]), 2)})


def q3_top_unshipped(sf_dir: str):
    """TPC-H Q3-shaped: 3-table join (small sides broadcast), grouped
    revenue, global sort + limit (the engine's top-k surface).
    Output: (l_orderkey, revenue, o_orderdate, o_orderpriority)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.taskmode import as_tasks

    cutoff = np.datetime64("1997-06-01", "us")

    # dimension build is DISTRIBUTED: both filters run in map_batches over
    # the streaming read; only the FILTERED dimension (BUILDING customers'
    # pre-cutoff orders — a few % of the orders table) is collected and
    # broadcast.  Driver memory is bounded by the filtered dimension, never
    # the raw fact/dimension cardinality.
    bld_parts = [
        b["c_custkey"].to_numpy(zero_copy_only=False)
        for b in _read(sf_dir, "customer",
                       columns=["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    bld = np.sort(np.concatenate(bld_parts)) if bld_parts \
        else np.array([], dtype=np.int64)
    bld_ref = ray.put(bld)

    def filter_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(bld_ref)          # local cached fetch per worker
        m = pc.less(t["o_orderdate"], pa.scalar(cutoff))
        f = t.filter(m)
        ck = f["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        hit = (pos < len(keys)) & (keys[np.clip(pos, 0, max(len(keys) - 1,
                                                            0))] == ck)
        return f.filter(pa.array(hit))

    dim = _read(sf_dir, "orders",
                columns=["o_orderkey", "o_custkey", "o_orderdate",
                         "o_orderpriority"]) \
        .map_batches(filter_orders, batch_format="pyarrow")
    # collect ONLY the filtered dimension; broadcast as sorted parallel
    # arrays (searchsorted attach — no per-row dict lookups)
    dim_parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                 for b in dim.iter_batches(batch_format="pyarrow",
                                           batch_size=1 << 20)]
    dim_tbl = pa.concat_tables(dim_parts) if dim_parts else \
        pa.table({"o_orderkey": pa.array([], pa.int64()),
                  "o_custkey": pa.array([], pa.int64()),
                  "o_orderdate": pa.array([], pa.timestamp("us")),
                  "o_orderpriority": pa.array([], pa.string())})
    order = pc.sort_indices(dim_tbl["o_orderkey"])
    dim_tbl = dim_tbl.take(order).combine_chunks()
    okeys_np = dim_tbl["o_orderkey"].to_numpy(zero_copy_only=False)
    dim_ref = ray.put((okeys_np,
                       dim_tbl["o_orderdate"].combine_chunks(),
                       dim_tbl["o_orderpriority"].combine_chunks()))

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    class Partial:
        def __init__(self, ref):
            self.okeys = ray.get(ref)[0]

        def __call__(self, t: pa.Table) -> pa.Table:
            f = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
            lk = f["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.okeys, lk)
            hit = (pos < len(self.okeys)) & (
                self.okeys[np.clip(pos, 0, max(len(self.okeys) - 1, 0))]
                == lk)
            f = f.filter(pa.array(hit))
            rev = pc.multiply(f["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), f["l_discount"]))
            return f.append_column("rev", rev).group_by("l_orderkey") \
                .aggregate([("rev", "sum")])

    agg = ds.map_batches(as_tasks(Partial, ref=dim_ref),
                         batch_format="pyarrow", batch_size=262144) \
        .groupby("l_orderkey").aggregate(Sum("rev_sum", alias_name="rev"))

    class Attach:
        def __init__(self, ref):
            self.okeys, self.dates, self.prios = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_orderkey"].to_numpy(zero_copy_only=False)
            idx = pa.array(np.searchsorted(self.okeys, k))  # all hit
            return pa.table({
                "l_orderkey": t["l_orderkey"],
                "revenue": _round(t["rev"], 2),
                "o_orderdate": self.dates.take(idx),
                "o_orderpriority": self.prios.take(idx),
            })

    out = agg.map_batches(as_tasks(Attach, ref=dim_ref),
                          batch_format="pyarrow")

    def block_topk(t: pa.Table) -> pa.Table:
        # per-block top-10 under the final ordering: the global top-10 is a
        # subset of the union of block top-10s, so the all-to-all sort below
        # sees <= 10 x n_blocks rows instead of the full aggregate
        idx = pc.sort_indices(t, sort_keys=[("revenue", "descending"),
                                            ("l_orderkey", "ascending")])
        return t.take(idx[:10])

    out = out.map_batches(block_topk, batch_format="pyarrow")
    # deterministic top-10: rounded revenue desc, orderkey asc (same keys
    # in the oracle's ORDER BY)
    return out.sort(["revenue", "l_orderkey"],
                    descending=[True, False]).limit(10)


def top_orders_per_customer(sf_dir: str, k: int = 2):
    """Top-k per group (the window-function ROW_NUMBER surface): each
    customer's k highest-value orders with their rank.

    Output: (o_custkey, o_orderkey, o_totalprice, rk).

    One shuffle on the group key; ranking is a per-group vectorized sort.
    At 100 TB the per-batch pre-top-k combiner applies (keep k rows per
    custkey per batch before the shuffle) — cardinality here makes the
    direct groupby cheaper.
    """
    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def combine_topk(t: pa.Table) -> pa.Table:
        # per-batch combiner: keep at most k rows per custkey before the
        # shuffle, and route by a COARSE bucket (custkey % npart) — per-key
        # map_groups costs ~25 ms of Python per tiny group
        df = t.to_pandas()
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        df = df[df.groupby("o_custkey").cumcount() < k]
        df["bucket"] = (df["o_custkey"] % npart).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        rk = g.groupby("o_custkey").cumcount() + 1
        g = g.assign(rk=rk.astype(np.int64))
        return g[g["rk"] <= k][["o_custkey", "o_orderkey",
                                "o_totalprice", "rk"]]

    return (ds.map_batches(combine_topk, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1))


def bloom_semi_join(sf_dir: str, date_lo: str = "1997-01-01",
                    m_bits: int = 1 << 20, k_hashes: int = 4):
    """Bloom-filter-pruned SEMI join: revenue of lineitems whose order
    is recent (``o_orderdate >= date_lo``), by return flag — the classic
    distributed-join optimization: a 128 KiB Bloom bitmap over the build
    side's keys is broadcast once (``ray.put``) and pre-filters the probe
    side INSIDE its map stage, so only bloom-surviving lineitem rows
    enter the join shuffle; an in-bucket ``np.isin`` against the true key
    set then removes Bloom false positives, so the RESULT is exact
    regardless of the filter's error rate.

    Output: (l_returnflag, n_items, revenue_cbp) with revenue_cbp =
    sum over items of cents(extendedprice) * (10000 - bp(discount)) —
    exact int64 micro-units (cents x basis points), order-independent
    (same integer-moments convention as grouped_corr).

    Scale shape: build side is read once for the bitmap partials (fixed
    128 KiB per block, OR-merged in one bounded driver pass — at larger
    build cardinality swap for a tree-reduce or partitioned blooms) and
    once for the bucketed true-key stream; the probe side never ships a
    row the bloom rejects (~selectivity x |lineitem| saved from the
    all-to-all).  Final reduce is |returnflags| x NPART partial rows.
    """
    import ray

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    mask = np.int64(m_bits - 1)
    # multiply-shift position hashes (odd 64-bit constants)
    A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                  0x165667B19E3779F9, 0xD6E8FEB86659FD93],
                 dtype=np.uint64)[:k_hashes]

    shift = np.uint64(64 - (int(m_bits).bit_length() - 1))

    def _positions(keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        return np.stack([((k * a) >> shift).astype(np.int64) & mask
                         for a in A])

    def build_bloom(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t["o_orderdate"], lo))
        bits = np.zeros(m_bits, dtype=bool)
        if f.num_rows:
            pos = _positions(f["o_orderkey"].to_numpy(zero_copy_only=False))
            bits[pos.ravel()] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    bloom_parts = (_read(sf_dir, "orders",
                         columns=["o_orderkey", "o_orderdate"])
                   .map_batches(build_bloom, batch_format="pyarrow")
                   .take_all())
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in bloom_parts:
        bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    bloom_ref = ray.put(np.unpackbits(bits).view(bool))

    def build_keys(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t["o_orderdate"], lo))
        k = f["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bucket": pa.array(k & (npart - 1)),
                         "key": pa.array(k),
                         "rflag": pa.nulls(len(k), pa.string()),
                         "rev": pa.array(np.zeros(len(k), np.int64)),
                         "is_probe": pa.array(np.zeros(len(k), bool))})

    def probe(t: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = bloom[_positions(k)].all(axis=0)     # k_hashes x n bit tests
        f = t.filter(pa.array(ok))
        kk = k[ok]
        cents = np.rint(f["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        bp = np.rint(f["l_discount"].to_numpy(zero_copy_only=False)
                     * 10000.0).astype(np.int64)
        return pa.table({"bucket": pa.array(kk & (npart - 1)),
                         "key": pa.array(kk),
                         "rflag": f["l_returnflag"],
                         "rev": pa.array(cents * (10000 - bp)),
                         "is_probe": pa.array(np.ones(len(kk), bool))})

    build = _read(sf_dir, "orders",
                  columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(build_keys, batch_format="pyarrow")
    probe_ds = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_returnflag",
                              "l_extendedprice", "l_discount"]) \
        .map_batches(probe, batch_format="pyarrow", batch_size=262144)

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_probe = g["is_probe"].to_numpy()
        true_keys = g["key"].to_numpy()[~is_probe]
        p = g[is_probe]
        keep = np.isin(p["key"].to_numpy(), true_keys)  # kill bloom FPs
        p = p[keep]
        agg = p.groupby("rflag", as_index=False).agg(
            n_items=("rev", "size"), revenue_cbp=("rev", "sum"))
        return agg

    def final(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("rflag", as_index=False)[
            ["n_items", "revenue_cbp"]].sum()
        return pd.DataFrame({"l_returnflag": a["rflag"].astype(str),
                             "n_items": a["n_items"].to_numpy(np.int64),
                             "revenue_cbp": a["revenue_cbp"].to_numpy(
                                 np.int64)})

    return (build.union(probe_ds)
            .groupby("bucket").map_groups(verify_bucket,
                                          batch_format="pandas",
                                          num_cpus=1)
            .groupby("rflag").map_groups(final, batch_format="pandas"))


def orders_without_lineitems(sf_dir: str):
    """Partitioned ANTI join: orders with no lineitem rows.

    Output: (o_orderkey, o_custkey, o_totalprice).

    Fully distributed and exact — nothing key-cardinality-sized ever
    lands on the driver.  Both sides are bucketed by ``orderkey % NPART``
    (probe side pre-deduped per batch so the shuffle ships distinct keys,
    not lineitem rows), unioned, and each bucket resolves the anti-join
    with one vectorized ``np.isin``.  Every orderkey lives wholly in one
    bucket, so the per-bucket result is the global result.
    """
    import ray.data as rd

    from ..functions.scale import coarse_npart

    npart = coarse_npart()

    def probe_side(t: pa.Table) -> pa.Table:
        d = t.group_by("l_orderkey").aggregate([])   # per-batch combiner
        k = d["l_orderkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(k, npart - 1), pa.int64()),
            "o_orderkey": pc.cast(k, pa.int64()),
            "o_custkey": pa.nulls(d.num_rows, pa.int64()),
            "o_totalprice": pa.nulls(d.num_rows, pa.float64()),
            "is_probe": pa.array(np.ones(d.num_rows, dtype=bool)),
        })

    def build_side(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(k, npart - 1), pa.int64()),
            "o_orderkey": pc.cast(k, pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_totalprice": pc.cast(t["o_totalprice"], pa.float64()),
            "is_probe": pa.array(np.zeros(t.num_rows, dtype=bool)),
        })

    probe = _read(sf_dir, "lineitem", columns=["l_orderkey"]) \
        .map_batches(probe_side, batch_format="pyarrow", batch_size=1 << 20)
    build = _read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(build_side, batch_format="pyarrow")

    def anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_probe = g["is_probe"].to_numpy()
        have = np.unique(g["o_orderkey"].to_numpy()[is_probe])
        orders = g[~is_probe]
        m = ~np.isin(orders["o_orderkey"].to_numpy(), have)
        out = orders[m]
        return pd.DataFrame({
            "o_orderkey": out["o_orderkey"].to_numpy(np.int64),
            "o_custkey": out["o_custkey"].to_numpy(np.int64),
            "o_totalprice": out["o_totalprice"].to_numpy(np.float64),
        })

    return build.union(probe).groupby("bucket").map_groups(
        anti_bucket, batch_format="pandas", num_cpus=1)


def q4_order_priority(sf_dir: str):
    """Co-partitioned large-large SEMI join (TPC-H Q4 shape): count orders,
    per priority, having at least one lineitem shipped after the order
    date.

    Output: (o_orderpriority, order_count).

    Neither side fits a broadcast at 100 TB, so this is the canonical
    co-partitioned join: both tables bucket by ``orderkey % NPART`` (ONE
    shuffle each), and every orderkey resolves wholly inside its bucket.
    The lineitem side pre-aggregates per batch to ``max(l_shipdate) per
    orderkey`` — the EXISTS predicate only needs the max — so the shuffle
    ships one row per (batch, orderkey), never raw lineitems.  Bucket
    output is a per-priority partial count; the final groupby moves
    NPART x 5 tiny rows.
    """
    from ray.data.aggregate import Sum

    from ..functions.scale import coarse_npart

    npart = coarse_npart()

    def li_side(t: pa.Table) -> pa.Table:
        d = t.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        k = d["l_orderkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(k, npart - 1), pa.int64()),
            "orderkey": pc.cast(k, pa.int64()),
            "date_us": pc.cast(d["l_shipdate_max"], pa.int64()),
            "priority": pa.nulls(d.num_rows, pa.string()),
            "is_li": pa.array(np.ones(d.num_rows, dtype=bool)),
        })

    def o_side(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(k, npart - 1), pa.int64()),
            "orderkey": pc.cast(k, pa.int64()),
            "date_us": pc.cast(t["o_orderdate"], pa.int64()),
            "priority": t["o_orderpriority"],
            "is_li": pa.array(np.zeros(t.num_rows, dtype=bool)),
        })

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]) \
        .map_batches(o_side, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_li = g["is_li"].to_numpy()
        li_g = g[is_li]
        od_g = g[~is_li]
        mx = li_g.groupby("orderkey")["date_us"].max()  # max of partial maxes
        m = od_g.merge(mx.rename("max_ship"), left_on="orderkey",
                       right_index=True, how="inner")
        m = m[m["max_ship"] > m["date_us"]]
        cnt = m.groupby("priority").size()
        return pd.DataFrame({"o_orderpriority": cnt.index.to_numpy(object),
                             "n": cnt.to_numpy(np.int64)})

    agg = orders.union(li).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas", num_cpus=1) \
        .groupby("o_orderpriority").aggregate(Sum("n", alias_name="cnt"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "order_count": pc.cast(t["cnt"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def group_quantiles(sf_dir: str):
    """Exact distributed grouped quantiles via value histograms: p25/p50/p90
    of ``l_quantity`` per ``l_returnflag`` (DuckDB ``quantile_disc``
    semantics: the element at index ``ceil(q*n)-1`` of the sorted group).

    Output: (l_returnflag, p25, p50, p90).

    Scale shape: the shuffle moves (group, value, count) histogram partials
    — one row per distinct value per batch — never data rows.  Exact for
    any bounded-cardinality value domain (quantities, ratings, code
    points); for unbounded/continuous domains the t-digest sketch
    (pipelines/sketches.py) is the companion scale path.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")])
        return pa.table({
            "l_returnflag": d["l_returnflag"],
            "val": d["l_quantity"],
            "cnt": pc.cast(d["l_quantity_count"], pa.int64()),
        })

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=262144) \
        .groupby(["l_returnflag", "val"]).aggregate(Sum("cnt",
                                                        alias_name="n"))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("val", kind="mergesort")
        cum = g["n"].to_numpy(np.int64).cumsum()
        vals = g["val"].to_numpy(np.float64)
        n = int(cum[-1])
        out = {"l_returnflag": [g["l_returnflag"].iloc[0]]}
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            idx = max(int(np.ceil(q * float(n))) - 1, 0)
            out[name] = [vals[np.searchsorted(cum, idx + 1)]]
        return pd.DataFrame(out)

    return hist.groupby("l_returnflag").map_groups(per_group,
                                                   batch_format="pandas",
                                                   num_cpus=1)


def events_rollup(sf_dir: str):
    """Hierarchical aggregate (GROUP BY ROLLUP (day, event_type)): event
    counts and value sums at the (day, type), (day) and grand-total
    levels, NULL-filled like SQL ROLLUP.

    Output: (day, event_type, n, sum_cents).

    Scale shape: ONE distributed leaf aggregation at the finest level;
    the coarser rollup levels derive from the leaves in a final
    single-block pass (leaf cardinality = days x types — tiny by
    construction, so re-aggregating leaves costs nothing and the raw
    events are only scanned once).
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        cents = pa.array(np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100.0)
            .astype(np.int64))
        d = pa.table({"day": day, "event_type": t["event_type"],
                      "c": cents}) \
            .group_by(["day", "event_type"]).aggregate(
                [("c", "sum"), ("c", "count")])
        return pa.table({"day": d["day"], "event_type": d["event_type"],
                         "s": d["c_sum"],
                         "n": pc.cast(d["c_count"], pa.int64())})

    leaves = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=262144) \
        .groupby(["day", "event_type"]).aggregate(
            Sum("s", alias_name="sum_c"), Sum("n", alias_name="cnt"))

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        leaf = pd.DataFrame({
            "day": df["day"], "event_type": df["event_type"],
            "n": df["cnt"].astype(np.int64),
            "sum_cents": df["sum_c"].astype(np.int64)})
        by_day = leaf.groupby("day", as_index=False)[["n", "sum_cents"]] \
            .sum().assign(event_type=None)
        total = pd.DataFrame({"day": [pd.NaT], "event_type": [None],
                              "n": [leaf["n"].sum()],
                              "sum_cents": [leaf["sum_cents"].sum()]})
        out = pd.concat([leaf, by_day, total], ignore_index=True)
        return pa.table({
            "day": pa.array(out["day"], pa.timestamp("us")),
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "sum_cents": pa.array(out["sum_cents"].to_numpy(np.int64)),
        })

    return leaves.repartition(1).map_batches(finalize,
                                             batch_format="pyarrow",
                                             batch_size=None)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str):
    """Pivot (long -> wide): per day, one count column per event type.

    Output: (day, n_click, n_error, n_purchase, n_signup, n_view).

    Scale shape: the pivot happens INSIDE map_batches (each batch emits
    one wide partial row per day), so the shuffle moves wide partials
    keyed by day — the column fan-out never becomes a join or a second
    pass over the events.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "day": pc.floor_temporal(t["ts"], unit="day")
            .to_numpy(zero_copy_only=False),
            "et": t["event_type"].to_numpy(zero_copy_only=False),
        })
        wide = pd.crosstab(df["day"], df["et"])
        cols = {"day": pa.array(wide.index.to_numpy(), pa.timestamp("us"))}
        for et in EVENT_TYPES:
            vals = wide[et].to_numpy(np.int64) if et in wide.columns \
                else np.zeros(len(wide), np.int64)
            cols[f"n_{et}"] = pa.array(vals)
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("day").aggregate(
            *[Sum(f"n_{et}", alias_name=f"n_{et}") for et in EVENT_TYPES])

    def finalize(t: pa.Table) -> pa.Table:
        cols = {"day": t["day"]}
        for et in EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(t[f"n_{et}"], pa.int64())
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


def docs_cube(sf_dir: str):
    """CUBE aggregate (GROUP BY CUBE (lang, source)) over documents: doc
    counts and n_chars sums at the (lang, source), (lang), (source) and
    grand-total levels, NULL-filled like SQL CUBE.

    Output: (lang, source, n, sum_chars).

    Scale shape: ONE distributed leaf aggregation at the finest level
    (lang x source); all four CUBE levels derive from the leaves in a
    final single-block pass (leaf cardinality is tiny by construction, so
    re-aggregating leaves costs nothing and the corpus is scanned once).
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.group_by(["lang", "source"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return pa.table({"lang": d["lang"], "source": d["source"],
                         "s": d["n_chars_sum"],
                         "n": pc.cast(d["n_chars_count"], pa.int64())})

    leaves = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=262144) \
        .groupby(["lang", "source"]).aggregate(
            Sum("s", alias_name="sum_c"), Sum("n", alias_name="cnt"))

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        leaf = pd.DataFrame({
            "lang": df["lang"], "source": df["source"],
            "n": df["cnt"].astype(np.int64),
            "sum_chars": df["sum_c"].astype(np.int64)})
        by_lang = leaf.groupby("lang", as_index=False)[["n", "sum_chars"]] \
            .sum().assign(source=None)
        by_source = leaf.groupby("source",
                                 as_index=False)[["n", "sum_chars"]] \
            .sum().assign(lang=None)
        total = pd.DataFrame({"lang": [None], "source": [None],
                              "n": [leaf["n"].sum()],
                              "sum_chars": [leaf["sum_chars"].sum()]})
        out = pd.concat([leaf, by_lang, by_source, total],
                        ignore_index=True)
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "sum_chars": pa.array(out["sum_chars"].to_numpy(np.int64)),
        })

    return leaves.repartition(1).map_batches(finalize,
                                             batch_format="pyarrow",
                                             batch_size=None)


def group_quantiles_cont(sf_dir: str):
    """Interpolated grouped quantiles (SQL ``quantile_cont`` semantics:
    linear interpolation at index ``q*(n-1)`` of the sorted group) —
    p25/p50/p90 of ``l_quantity`` per ``l_returnflag``, emitted as exact
    integer cents so the driver's value-hash compare is float-order-proof.

    Output: (l_returnflag, p25_cents, p50_cents, p90_cents).

    Scale shape: identical to group_quantiles — the shuffle moves
    (group, value, count) histogram partials, never data rows; the
    interpolation happens on the tiny per-group histogram.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")])
        return pa.table({
            "l_returnflag": d["l_returnflag"],
            "val": d["l_quantity"],
            "cnt": pc.cast(d["l_quantity_count"], pa.int64()),
        })

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=262144) \
        .groupby(["l_returnflag", "val"]).aggregate(Sum("cnt",
                                                        alias_name="n"))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("val", kind="mergesort")
        cum = g["n"].to_numpy(np.int64).cumsum()
        vals = g["val"].to_numpy(np.float64)
        n = int(cum[-1])
        out = {"l_returnflag": [g["l_returnflag"].iloc[0]]}
        for q, name in ((0.25, "p25_cents"), (0.5, "p50_cents"),
                        (0.9, "p90_cents")):
            h = q * float(n - 1)
            lo_i = int(np.floor(h))
            frac = h - lo_i
            lo = vals[np.searchsorted(cum, lo_i + 1)]
            hi = vals[np.searchsorted(cum, min(lo_i + 1, n - 1) + 1)]
            out[name] = [int(np.rint((lo + frac * (hi - lo)) * 100.0))]
        return pd.DataFrame(out)

    return hist.groupby("l_returnflag").map_groups(per_group,
                                                   batch_format="pandas",
                                                   num_cpus=1)


def winsorized_stats(sf_dir: str):
    """Winsorized (outlier-clipped) grouped statistics: per ``event_type``,
    clip ``value`` (as integer cents) to its own [p05, p95] band
    (``quantile_disc`` semantics) and report the clipped mean — the robust
    location estimate a reward/quality monitor uses when a handful of
    extreme values would swamp a plain AVG.

    Output: (event_type, p05_cents, p95_cents, wmean_cents, n).

    Scale shape: ONE scan + ONE shuffle.  The per-batch combiner emits
    (group, cents, count) histogram partials — the cents domain is bounded
    by the value range (~10^4 distinct), so partial size is
    O(|types| x |domain|) per batch regardless of row count; the shuffle
    moves partials straight to the per-type group (duplicate cents rows
    from different batches merge INSIDE the per-group kernel — a separate
    (type, cents)-keyed pre-aggregation exchange would double the
    all-to-all count for zero data reduction, measured 6.4 s -> ~1 s at
    sf0.1).  Both the quantile thresholds AND the winsorized mean come
    from the same merged per-group histogram (clip applied to the
    histogram's value column, weighted by counts), so no second pass over
    the data rows is needed — unlike the naive two-scan
    threshold-then-clip plan.  Exact integer arithmetic end-to-end (cents
    sums in int64, floor division), so the driver's value-hash compare is
    float-order-proof.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pa.array(np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100.0)
            .astype(np.int64))
        d = pa.table({"event_type": t["event_type"], "cents": cents}) \
            .group_by(["event_type", "cents"]).aggregate([("cents", "count")])
        return pa.table({
            "event_type": d["event_type"],
            "cents": d["cents"],
            "n": pc.cast(d["cents_count"], pa.int64()),
        })

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=262144)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        etype = g["event_type"].iloc[0]
        g = g.groupby("cents", as_index=False)["n"].sum() \
            .sort_values("cents", kind="mergesort")
        cnt = g["n"].to_numpy(np.int64)
        vals = g["cents"].to_numpy(np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        # quantile_disc: element at index ceil(q*n)-1 of the sorted group
        def disc(q: float) -> int:
            idx = max(int(np.ceil(q * float(n))) - 1, 0)
            return int(vals[np.searchsorted(cum, idx + 1)])
        p05, p95 = disc(0.05), disc(0.95)
        clipped = np.clip(vals, p05, p95)
        wsum = int((clipped * cnt).sum())       # int64-exact: |cents|<2^31
        return pd.DataFrame({
            "event_type": [etype],
            "p05_cents": [p05], "p95_cents": [p95],
            "wmean_cents": [wsum // n], "n": [n]})

    return hist.groupby("event_type").map_groups(per_group,
                                                 batch_format="pandas",
                                                 num_cpus=1)


def conversion_time_quantiles(sf_dir: str):
    """Conversion-latency distribution: per user, the delay from FIRST
    signup to the first purchase at-or-after it; exact ``quantile_disc``
    p50/p90 over those per-user delays (the activation-latency KPI).

    Output: one row (n_users, p50_s, p90_s).

    Scale shape: one user-bucket shuffle of slim (user, ts, type) rows;
    per bucket a vectorized first-signup/first-qualifying-purchase
    reduction, emitted as a (delay_seconds, count) HISTOGRAM partial —
    the final exact quantile runs over the merged histogram (bounded by
    the delay domain in seconds over the retention window), never over
    per-user rows.
    """
    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sig = g[g["event_type"] == "signup"] \
            .groupby("user_id")["ts"].min()
        pur = g[g["event_type"] == "purchase"][["user_id", "ts"]] \
            .merge(sig.rename("ts0"), left_on="user_id",
                   right_index=True)
        pur = pur[pur["ts"] >= pur["ts0"]]
        first = pur.groupby("user_id", as_index=False) \
            .agg(ts1=("ts", "min"), ts0=("ts0", "first"))
        dt = ((first["ts1"].to_numpy("datetime64[us]").astype(np.int64)
               - first["ts0"].to_numpy("datetime64[us]").astype(np.int64))
              // 1_000_000)
        out = pd.DataFrame({"dt_s": dt, "n": 1})
        return out.groupby("dt_s", as_index=False).sum()

    hist = (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1)
            .to_pandas())                # bounded: delay-seconds domain
    if len(hist) == 0:
        return pd.DataFrame({"n_users": pd.Series([], dtype=np.int64),
                             "p50_s": pd.Series([], dtype=np.int64),
                             "p90_s": pd.Series([], dtype=np.int64)})
    h = hist.groupby("dt_s", as_index=False)["n"].sum() \
        .sort_values("dt_s", kind="mergesort")
    vals = h["dt_s"].to_numpy(np.int64)
    cum = h["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])

    def disc(q: float) -> int:
        idx = max(int(np.ceil(q * float(n))) - 1, 0)
        return int(vals[np.searchsorted(cum, idx + 1)])

    return pd.DataFrame({"n_users": [n], "p50_s": [disc(0.5)],
                         "p90_s": [disc(0.9)]})


def survival_curve(sf_dir: str):
    """Kaplan-Meier risk-set table for signup->purchase conversion with
    right-censoring: cohort = users with >=1 signup (t0 = first signup);
    the event is the first purchase at-or-after t0; users who never
    convert are censored at the corpus's global max timestamp.  Output is
    the exact KM accounting grid — one row per day carrying at least one
    event or censoring:

        (day, n_at_risk, n_converted, n_censored)

    where ``n_at_risk(d)`` counts users whose event-or-censor day >= d.
    The survival estimate S(d) = prod(1 - d_i/n_i) is a trivial
    downstream fold over this table; emitting the integer grid keeps the
    operator exactly SQL-oracled (no float products in the hash).

    Scale shape: one slim (user, ts, type) user-bucket shuffle; each
    bucket reduces its users vectorized (first signup / first qualifying
    purchase) and emits a (day, is_event) HISTOGRAM partial — the final
    risk-set cumsum runs on the driver over the bounded day domain
    (observation-window days x 2 rows), never over per-user rows.  The
    global max timestamp is a single-column Ray aggregate.
    """
    from ..functions.scale import coarse_npart

    empty = pd.DataFrame({
        "day": pd.Series([], dtype=np.int64),
        "n_at_risk": pd.Series([], dtype=np.int64),
        "n_converted": pd.Series([], dtype=np.int64),
        "n_censored": pd.Series([], dtype=np.int64)})

    max_ts = _read(sf_dir, "events", columns=["ts"]).max("ts")
    if max_ts is None:
        return empty
    max_us = int(np.datetime64(max_ts, "us").astype(np.int64))

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    npart = coarse_npart()
    DAY_US = 86_400_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sig = g[g["event_type"] == "signup"].groupby("user_id")["ts"].min()
        if len(sig) == 0:
            return pd.DataFrame({"day": pd.Series([], dtype=np.int64),
                                 "is_event": pd.Series([], dtype=bool),
                                 "n": pd.Series([], dtype=np.int64)})
        pur = g[g["event_type"] == "purchase"][["user_id", "ts"]] \
            .merge(sig.rename("ts0"), left_on="user_id", right_index=True)
        pur = pur[pur["ts"] >= pur["ts0"]]
        first = pur.groupby("user_id")["ts"].min().reindex(sig.index)
        ts0 = sig.to_numpy("datetime64[us]").astype(np.int64)
        ev = first.to_numpy("datetime64[us]").astype(np.int64)
        conv = first.notna().to_numpy()
        day = np.where(conv, (ev - ts0) // DAY_US,
                       (max_us - ts0) // DAY_US)
        out = pd.DataFrame({"day": day.astype(np.int64),
                            "is_event": conv})
        return out.groupby(["day", "is_event"], as_index=False) \
            .size().rename(columns={"size": "n"})

    hist = (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas",
                                          num_cpus=1)
            .to_pandas())               # bounded: day domain x 2
    if len(hist) == 0:
        return empty
    grid = hist.groupby("day").apply(
        lambda x: pd.Series({
            "n_converted": int(x.loc[x["is_event"], "n"].sum()),
            "n_censored": int(x.loc[~x["is_event"], "n"].sum())}),
        include_groups=False).reset_index().sort_values("day")
    removed = (grid["n_converted"] + grid["n_censored"]).to_numpy(np.int64)
    total = int(removed.sum())
    at_risk = total - np.concatenate([[0], removed.cumsum()[:-1]])
    return pd.DataFrame({
        "day": grid["day"].to_numpy(np.int64),
        "n_at_risk": at_risk.astype(np.int64),
        "n_converted": grid["n_converted"].to_numpy(np.int64),
        "n_censored": grid["n_censored"].to_numpy(np.int64)})


def events_resample(sf_dir: str):
    """Dense time-series RESAMPLE: hourly event counts per type with the
    missing hours ZERO-FILLED over the corpus's [min, max] hour range —
    the gap-filling step every downstream forecaster/anomaly detector
    needs (a sparse group-by emits no row for an empty hour; this
    operator makes absence explicit).

    Output: (event_type, hour, n_events) — |types| x |hours| rows.

    Scale shape: the aggregation is the usual per-batch combiner + tiny
    groupby (bounded by types x hours, row-count-independent); the
    zero-fill grid is built on the driver over that bounded result.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        d = pa.table({"event_type": t["event_type"], "hour": hour}) \
            .group_by(["event_type", "hour"]).aggregate([("hour", "count")])
        return pa.table({"event_type": d["event_type"], "hour": d["hour"],
                         "n": pc.cast(d["hour_count"], pa.int64())})

    sparse = (ds.map_batches(bucket, batch_format="pyarrow",
                             batch_size=262144)
              .groupby("event_type").map_groups(
                  lambda g: g.groupby(["event_type", "hour"],
                                      as_index=False)["n"].sum(),
                  batch_format="pandas", num_cpus=1)
              .to_pandas())               # bounded: |types| x |hours|
    if len(sparse) == 0:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "hour": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype=np.int64)})
    hours = pd.date_range(sparse["hour"].min(), sparse["hour"].max(),
                          freq="h")
    types = sorted(sparse["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, hours],
                                      names=["event_type", "hour"])
    dense = sparse.set_index(["event_type", "hour"]) \
        .reindex(grid, fill_value=0).reset_index()
    return pd.DataFrame({
        "event_type": dense["event_type"],
        "hour": dense["hour"].astype("datetime64[us]"),
        "n_events": dense["n"].to_numpy(np.int64)})


def events_debounce(sf_dir: str, min_gap_s: int = 60):
    """Stream-hygiene DEBOUNCE audit: an event is kept iff it is the
    user's first event of its type or the gap to the user's PREVIOUS
    same-type event exceeds ``min_gap_s`` (LAG semantics — each event
    compares to its actual predecessor, the dedup rule for double-fired
    client events).  Output: per type, kept/dropped counts.

    Output: (event_type, n_kept, n_dropped).

    Scale shape: one user-bucket shuffle of slim rows; ONE vectorized
    sort + shift per bucket; |types| partial rows per bucket, bounded
    driver reduce.
    """
    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    npart = coarse_npart()
    gap_us = int(min_gap_s) * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same_key = (g["user_id"].eq(g["user_id"].shift())
                    & g["event_type"].eq(g["event_type"].shift())) \
            .to_numpy()
        gap = np.empty(len(ts), dtype=np.int64)
        gap[0] = np.iinfo(np.int64).max
        gap[1:] = ts[1:] - ts[:-1]
        keep = ~same_key | (gap > gap_us)
        out = pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                            "k": keep.astype(np.int64), "n": 1})
        return out.groupby("event_type", as_index=False).sum()

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas",
                                           num_cpus=1)
             .to_pandas())                 # bounded: |types| x NPART
    if len(parts) == 0:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n_kept": pd.Series([], dtype=np.int64),
                             "n_dropped": pd.Series([], dtype=np.int64)})
    agg = parts.groupby("event_type", as_index=False)[["k", "n"]].sum()
    return pd.DataFrame({"event_type": agg["event_type"],
                         "n_kept": agg["k"].to_numpy(np.int64),
                         "n_dropped": (agg["n"] - agg["k"]).to_numpy(
                             np.int64)})


def ks_drift(sf_dir: str):
    """Exact two-sample KOLMOGOROV-SMIRNOV statistic between every pair
    of event types' value distributions — the distribution-drift test a
    data monitor runs between slices (the nonparametric complement of
    psi_source_drift's binned PSI).  D = max over the union support of
    |F_a(c) - F_b(c)|, computed EXACTLY in integers: the numerator
    ``|cum_a * N_b - cum_b * N_a|`` never touches floats, and
    ``ks_micro = max_num * 10^6 // (N_a * N_b)``.

    Output: (type_a, type_b, ks_micro, n_a, n_b) for ordered pairs a < b.

    Scale shape: ONE scan emitting (type, cents, count) histogram
    partials (bounded by the cents domain — row-count-independent), one
    cents-bucket shuffle to merge duplicates, then a bounded driver
    finalize (|types| x |domain| rows) that evaluates all pairs with
    numpy cumsums over the shared support.
    """
    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    npart = coarse_npart()

    def partial(t: pa.Table) -> pa.Table:
        cents = pa.array(np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100.0)
            .astype(np.int64))
        d = pa.table({"ty": t["event_type"], "cents": cents}) \
            .group_by(["ty", "cents"]).aggregate([("cents", "count")])
        c = d["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(c % npart),
                         "ty": d["ty"], "cents": d["cents"],
                         "n": pc.cast(d["cents_count"], pa.int64())})

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["ty", "cents"], as_index=False)["n"].sum()

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").map_groups(merge_bucket,
                                          batch_format="pandas",
                                          num_cpus=1)
            .to_pandas())                   # bounded: |types| x |domain|
    cols = ["type_a", "type_b", "ks_micro", "n_a", "n_b"]
    if len(hist) == 0:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c.startswith("type") else np.int64)
            for c in cols})
    support = np.unique(hist["cents"].to_numpy(np.int64))
    types = sorted(hist["ty"].unique())
    cums, totals = {}, {}
    for ty in types:
        h = hist[hist["ty"] == ty]
        counts = np.zeros(len(support), dtype=np.int64)
        idx = np.searchsorted(support, h["cents"].to_numpy(np.int64))
        counts[idx] = h["n"].to_numpy(np.int64)
        cums[ty] = counts.cumsum()
        totals[ty] = int(cums[ty][-1])
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            num = np.abs(cums[a] * totals[b] - cums[b] * totals[a]).max()
            rows.append((a, b,
                         int(num) * 1_000_000 // (totals[a] * totals[b]),
                         totals[a], totals[b]))
    return pd.DataFrame(rows, columns=cols)


def purchase_attribution(sf_dir: str):
    """LAST-TOUCH attribution: for every purchase event, the event type
    of the same user's immediately preceding event (strictly earlier in
    (ts, event_id) order), counted per attributed type — the marketing
    attribution primitive (LAG + conditional aggregation).  Purchases
    with no prior event attribute to 'none'.

    Output: (attributed_type, n_purchases).

    Scale shape: one user-bucket shuffle of slim (user, ts, id, type)
    rows; per bucket ONE vectorized sort + shift (no per-user Python);
    final reduce is |types|+1 partial rows per bucket.
    """
    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    npart = coarse_npart()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev_ty = g["event_type"].shift()
        new_user = g["user_id"].ne(g["user_id"].shift())
        attributed = prev_ty.where(~new_user, other=None).fillna("none")
        m = g["event_type"].to_numpy() == "purchase"
        out = pd.DataFrame({"attributed_type": attributed.to_numpy()[m],
                            "n": 1})
        agg = out.groupby("attributed_type", as_index=False).sum()
        return agg

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas",
                                           num_cpus=1)
             .to_pandas())                  # bounded: (|types|+1) x NPART
    if len(parts) == 0:
        return pd.DataFrame({"attributed_type": pd.Series([], dtype=object),
                             "n_purchases": pd.Series([], dtype=np.int64)})
    agg = parts.groupby("attributed_type", as_index=False)["n"].sum()
    return pd.DataFrame({"attributed_type": agg["attributed_type"],
                         "n_purchases": agg["n"].to_numpy(np.int64)})


def pareto_frontier(sf_dir: str):
    """Per-group PARETO FRONTIER (skyline / dominance query): events of a
    type that no other event of the same type strictly dominates on BOTH
    dimensions (higher value AND later ts) — the maxima set a
    multi-objective ranking keeps.

    Output: (event_type, event_id, cents, ts_us), one row per
    non-dominated event.

    Scale shape: one event-type-bucket shuffle of slim (type, id, cents,
    ts) rows; per bucket a vectorized skyline scan — sort by value
    descending, prefix-max of ts over STRICTLY greater values (ties on
    value do not dominate each other), keep rows whose ts is not below
    that prefix max.  O(n log n) per group, no pairwise comparisons.
    """
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value", "ts"])

    def slim(t: pa.Table) -> pa.Table:
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        ts_us = t["ts"].cast(pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "event_id": t["event_id"],
                         "cents": pa.array(cents),
                         "ts_us": ts_us})

    def skyline(g: pd.DataFrame) -> pd.DataFrame:
        # one group == one event type (groupby key), vectorized scan
        g = g.sort_values(["cents", "ts_us"], ascending=[False, False],
                          kind="mergesort")
        cents = g["cents"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        # prefix max of ts over rows with STRICTLY greater cents: group
        # rows by distinct cents (descending), shift the running max by
        # one value-group
        new_val = np.concatenate([[True], cents[1:] != cents[:-1]])
        grp = np.cumsum(new_val) - 1               # 0-based value-group
        run = np.maximum.accumulate(ts)
        # max ts within each value-group's prefix == run at group ends
        ends = np.flatnonzero(np.concatenate([new_val[1:], [True]]))
        gmax = run[ends]                           # per value-group max
        prev_max = np.concatenate([[np.iinfo(np.int64).min],
                                   gmax[:-1]])[grp]
        keep = ts >= prev_max                      # strictly-later wins
        out = g[keep]
        return pd.DataFrame({
            "event_type": out["event_type"].to_numpy(),
            "event_id": out["event_id"].to_numpy(np.int64),
            "cents": out["cents"].to_numpy(np.int64),
            "ts_us": out["ts_us"].to_numpy(np.int64)})

    return (ds.map_batches(slim, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("event_type").map_groups(skyline,
                                              batch_format="pandas",
                                              num_cpus=1))


def weighted_median(sf_dir: str):
    """Exact VALUE-WEIGHTED median per event type: the smallest value v
    such that rows with value <= v carry at least half the group's total
    value mass (the revenue-splitting point, not the row-count median) —
    computed with no global sort, from the same bounded integer-cents
    histogram as winsorized_stats.

    Output: (event_type, wmedian_cents, total_cents, n).

    Scale shape: ONE scan + ONE shuffle of (type, cents, count) histogram
    partials (bounded by the cents domain per type, row-count-
    independent); the per-group kernel is a cumsum over the merged
    histogram.  Exact int64 arithmetic end-to-end.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pa.array(np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100.0)
            .astype(np.int64))
        d = pa.table({"event_type": t["event_type"], "cents": cents}) \
            .group_by(["event_type", "cents"]).aggregate(
                [("cents", "count")])
        return pa.table({
            "event_type": d["event_type"],
            "cents": d["cents"],
            "n": pc.cast(d["cents_count"], pa.int64()),
        })

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=262144)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        etype = g["event_type"].iloc[0]
        g = g.groupby("cents", as_index=False)["n"].sum() \
            .sort_values("cents", kind="mergesort")
        cnt = g["n"].to_numpy(np.int64)
        vals = g["cents"].to_numpy(np.int64)
        mass = vals * cnt                    # int64-exact: |cents| < 2^31
        cum = mass.cumsum()
        tot = int(cum[-1])
        idx = int(np.argmax(2 * cum >= tot))
        return pd.DataFrame({
            "event_type": [etype],
            "wmedian_cents": [int(vals[idx])],
            "total_cents": [tot],
            "n": [int(cnt.sum())]})

    return hist.groupby("event_type").map_groups(per_group,
                                                 batch_format="pandas",
                                                 num_cpus=1)


def user_segments(sf_dir: str):
    """Distinct-set operations (INTERSECT / EXCEPT) as audience segments:
    users who both clicked AND purchased ('both'), clicked only, or
    purchased only.

    Output: (user_id, segment).

    Scale shape: per-batch distinct (user_id, has_click, has_purchase)
    partials collapse inside map_batches (an Arrow group_by per batch), so
    the ONE shuffle moves at most one row per distinct user per batch; the
    set algebra (INTERSECT = both bits, EXCEPT = one bit) is a vectorized
    bit test after a Max-reduce — pairwise comparison never materializes.
    """
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        c = pc.cast(pc.equal(et, "click"), pa.int64())
        p = pc.cast(pc.equal(et, "purchase"), pa.int64())
        t2 = pa.table({"user_id": t["user_id"], "c": c, "p": p})
        d = t2.group_by("user_id").aggregate([("c", "max"), ("p", "max")])
        d = d.filter(pc.or_(pc.equal(d["c_max"], 1),
                            pc.equal(d["p_max"], 1)))
        return pa.table({"user_id": d["user_id"],
                         "c": d["c_max"], "p": d["p_max"]})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("user_id").aggregate(Max("c", alias_name="c"),
                                      Max("p", alias_name="p"))

    def finalize(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(bool)
        p = t["p"].to_numpy(zero_copy_only=False).astype(bool)
        seg = np.where(c & p, "both",
                       np.where(c, "click_only", "purchase_only"))
        return pa.table({"user_id": t["user_id"],
                         "segment": pa.array(seg, pa.string())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def audience_overlap(sf_dir: str):
    """Exact Jaccard overlap between every pair of event-type audiences
    (the \"how much do clickers and purchasers overlap\" question a
    segmentation/mixing decision needs): for each type pair (a < b),
    |users(a) ∩ users(b)| / |users(a) ∪ users(b)| in integer micro-units.

    Output: (type_a, type_b, n_a, n_b, n_both, jaccard_micro), one row
    per pair with a non-empty intersection.

    Scale shape: per-batch Arrow group_by collapses to distinct
    (user_id, event_type) pairs, so the ONE shuffle (coarse user bucket)
    moves at most one row per distinct pair per batch — never event rows;
    each bucket's pair counting is a vectorized self-merge over its own
    distinct pairs and emits a BOUNDED partial (<= |types|^2 + |types|
    rows); the final reduce is O(|types|^2) on the driver.  Users never
    co-locate globally — only same-user rows must share a bucket, which
    the user-id bucket key guarantees.
    """
    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    npart = coarse_npart()

    def partial(t: pa.Table) -> pa.Table:
        d = t.group_by(["user_id", "event_type"]).aggregate([])
        u = d["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": d["user_id"],
                         "event_type": d["event_type"],
                         "bucket": pa.array(u % npart)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        sizes = d.groupby("event_type", as_index=False).size()
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"],
                          as_index=False).size()
        return pd.DataFrame({
            "a": pd.concat([sizes["event_type"], pairs["event_type_x"]],
                           ignore_index=True),
            "b": pd.concat([pd.Series([""] * len(sizes)),
                            pairs["event_type_y"]], ignore_index=True),
            "cnt": pd.concat([sizes["size"], pairs["size"]],
                             ignore_index=True).astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144) \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                      num_cpus=1)
    rows = _gather(parts)
    empty = pa.table({"type_a": pa.array([], pa.string()),
                      "type_b": pa.array([], pa.string()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "n_both": pa.array([], pa.int64()),
                      "jaccard_micro": pa.array([], pa.int64())})
    if rows is None:
        import ray.data as rd

        return rd.from_arrow(empty)
    df = rows.to_pandas().groupby(["a", "b"], as_index=False)["cnt"].sum()
    sizes = {r.a: int(r.cnt) for r in df[df["b"] == ""].itertuples()}
    pairs = df[df["b"] != ""].sort_values(["a", "b"], kind="mergesort")
    n_a = pairs["a"].map(sizes).to_numpy(np.int64)
    n_b = pairs["b"].map(sizes).to_numpy(np.int64)
    both = pairs["cnt"].to_numpy(np.int64)
    union = n_a + n_b - both
    # same double expression as the oracle: floor(n_both*1e6 / union)
    jac = np.floor(both * 1000000.0 / union).astype(np.int64)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "type_a": pa.array(pairs["a"].astype(str), pa.string()),
        "type_b": pa.array(pairs["b"].astype(str), pa.string()),
        "n_a": pa.array(n_a), "n_b": pa.array(n_b),
        "n_both": pa.array(both), "jaccard_micro": pa.array(jac)}))


def q5_local_supplier(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5-shaped 6-table join: revenue per nation from lineitems
    where the supplier's nation equals the customer's nation, customers
    restricted to one region, orders to one year.

    Output: (n_name, revenue) — revenue rounded to cents at the edge.

    Scale shape (the canonical distributed Q5 plan):
      - region -> nation -> supplier are broadcast dimensions: filtered
        distributed reads collected into sorted key arrays (bounded by the
        dimension sizes, tiny by TPC-H construction) and attached via
        searchsorted inside map_batches;
      - customer x orders is a co-partitioned large-large equijoin — both
        sides bucket by ``custkey % NPART`` (ONE shuffle each side, only
        (custkey, nationkey) / (custkey, orderkey) pairs move);
      - its output co-partitions with lineitem by ``orderkey % NPART``
        (second shuffle), where the supplier-nation == customer-nation
        filter and the revenue partial aggregation happen in-bucket;
      - the final groupby moves NPART x |nations| tiny partials.
    """
    import ray

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01", "us").astype(np.int64)

    # -- broadcast chain: region -> nations -> suppliers ------------------
    def _collect(ds, cols):
        parts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                            batch_size=1 << 20)]
        if not parts:
            return {c: np.array([], np.int64) for c in cols}
        t = pa.concat_tables(
            [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
             for p in parts])
        return {c: t[c].to_numpy(zero_copy_only=False) for c in cols}

    # region (5 rows) and nation (25 rows) are CONSTANT-sized by TPC-H
    # construction — direct driver reads (each Ray Dataset execution costs
    # ~1-1.5 s of fixed scheduling latency, which dominated this query's
    # wall time; supplier, the largest dimension, stays a distributed read)
    import pyarrow.parquet as pq

    reg_t = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                          columns=["r_regionkey", "r_name"])
    reg = reg_t.filter(pc.equal(reg_t["r_name"], region))["r_regionkey"] \
        .to_numpy(zero_copy_only=False)
    nat_full = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                             columns=["n_nationkey", "n_regionkey",
                                      "n_name"])
    nat = {c: nat_full[c].to_numpy(zero_copy_only=False)
           for c in ("n_nationkey", "n_regionkey")}
    in_region = np.isin(nat["n_regionkey"], reg)
    region_nations = np.sort(nat["n_nationkey"][in_region])
    name_by_key = dict(zip(nat_full["n_nationkey"].to_pylist(),
                           nat_full["n_name"].to_pylist()))

    sup = _collect(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        ["s_suppkey", "s_nationkey"])
    s_in = np.isin(sup["s_nationkey"], region_nations)
    s_keys = sup["s_suppkey"][s_in]
    s_nat = sup["s_nationkey"][s_in]
    order_s = np.argsort(s_keys)
    sup_ref = ray.put((s_keys[order_s], s_nat[order_s]))
    rn_ref = ray.put(region_nations)

    # -- stage 1: customer x orders co-partitioned by custkey -------------
    def cust_side(t: pa.Table) -> pa.Table:
        rn = ray.get(rn_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array(np.isin(nk, rn)))
        ck = pc.cast(f["c_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "payload": pc.cast(f["c_nationkey"], pa.int64()),
            "is_cust": pa.array(np.ones(f.num_rows, dtype=bool)),
        })

    def order_side(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        f = t.filter(pa.array((d >= lo) & (d < hi)))
        ck = pc.cast(f["o_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "payload": pc.cast(f["o_orderkey"], pa.int64()),
            "is_cust": pa.array(np.zeros(f.num_rows, dtype=bool)),
        })

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_side, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(order_side, batch_format="pyarrow")

    def join_cust(g: pd.DataFrame) -> pd.DataFrame:
        cu = g[g["is_cust"]]
        od = g[~g["is_cust"]]
        m = od.merge(cu[["custkey", "payload"]].rename(
            columns={"payload": "c_nationkey"}), on="custkey", how="inner")
        ok = m["payload"].to_numpy(np.int64)        # orderkey
        # Arrow output so the downstream union with the Arrow-block
        # lineitem stream stays homogeneous
        return pa.table({
            "bucket": pa.array(ok % npart),
            "orderkey": pa.array(ok),
            "c_nationkey": pa.array(m["c_nationkey"].to_numpy(np.int64)),
            "rev_c": pa.array(np.zeros(len(m), np.float64)),
            "is_ord": pa.array(np.ones(len(m), bool)),
        })

    ord_nat = cust.union(orders).groupby("bucket").map_groups(
        join_cust, batch_format="pandas", num_cpus=1)

    # -- stage 2: x lineitem co-partitioned by orderkey --------------------
    def li_side(t: pa.Table) -> pa.Table:
        keys, nats = ray.get(sup_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, sk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        hit = (pos < len(keys)) & (len(keys) > 0) & (keys[pos_c] == sk)
        f = t.filter(pa.array(hit))
        snat = nats[np.searchsorted(keys, f["l_suppkey"].to_numpy(
            zero_copy_only=False))] if f.num_rows else \
            np.array([], np.int64)
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        ok = pc.cast(f["l_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(ok % npart),
            "orderkey": pa.array(ok),
            "c_nationkey": pa.array(snat.astype(np.int64)),  # s_nat here
            "rev_c": pa.array(rev),
            "is_ord": pa.array(np.zeros(len(ok), bool)),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["is_ord"]]
        lig = g[~g["is_ord"]]
        m = lig.merge(od[["orderkey", "c_nationkey"]].rename(
            columns={"c_nationkey": "cust_nat"}), on="orderkey",
            how="inner")
        m = m[m["c_nationkey"] == m["cust_nat"]]    # local supplier only
        # canonical row order before the float sum: block-arrival order
        # inside a shuffle bucket is not stable across runs, and float
        # addition is not associative — sort by (nation, orderkey, rev)
        # so each bucket partial is bit-identical run to run
        m = m.sort_values(["c_nationkey", "orderkey", "rev_c"],
                          kind="mergesort")
        agg = m.groupby("c_nationkey", as_index=False, sort=True)[
            "rev_c"].sum()
        return pd.DataFrame({
            "nationkey": agg["c_nationkey"].to_numpy(np.int64),
            "rev": agg["rev_c"].to_numpy(np.float64),
            "pbucket": np.full(len(agg), int(g["bucket"].iloc[0])
                               if len(g) else 0, np.int64)})

    partials = ord_nat.union(li).groupby("bucket").map_groups(
        join_li, batch_format="pandas", num_cpus=1)

    # final reduce: the partials are BOUNDED (<= npart x |nations| rows —
    # both constants, not data-sized), so a driver-side numpy reduce
    # replaces a third all-to-all exchange whose fixed sort latency would
    # dominate this query's wall time.  Summation order is fully
    # deterministic: each bucket partial is sorted before its float sum
    # (join_li), and the cross-bucket order is lexsorted by
    # (nationkey, pbucket) — bucket-arrival order never reaches the sum.
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    if not parts:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64())})
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts])
    nk = rows["nationkey"].to_numpy(zero_copy_only=False)
    rv = rows["rev"].to_numpy(zero_copy_only=False)
    pb = rows["pbucket"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pb, nk))
    nk, rv = nk[order], rv[order]
    starts = np.flatnonzero(np.concatenate(
        [[True], nk[1:] != nk[:-1]])) if len(nk) else np.array([], np.int64)
    keys = nk[starts]
    sums = np.add.reduceat(rv, starts) if len(nk) else np.array([])
    names = [name_by_key[int(k)] for k in keys]
    return pa.table({"n_name": pa.array(names, pa.string()),
                     "revenue": _round(pa.array(sums), 2)})


def props_json_stats(sf_dir: str):
    """Semi-structured column extraction: parse the integer ``k`` out of
    the JSON-ish ``props`` string with a vectorized regex
    (pyarrow.compute.extract_regex — RE2, no Python per row) and
    aggregate per event_type.

    Output: (event_type, n, sum_k, max_k).

    Scale shape: extraction + partial aggregation fuse into the scan
    batch; the shuffle moves |event_type| x num_batches partial rows.
    """
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        d = pa.table({"event_type": t["event_type"], "k": k}) \
            .group_by("event_type").aggregate(
                [("k", "sum"), ("k", "count"), ("k", "max")])
        return pa.table({"event_type": d["event_type"],
                         "s": d["k_sum"],
                         "n": pc.cast(d["k_count"], pa.int64()),
                         "mx": d["k_max"]})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("event_type").aggregate(
            Sum("s", alias_name="sum_k"), Sum("n", alias_name="n"),
            Max("mx", alias_name="max_k"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "n": pc.cast(t["n"], pa.int64()),
                         "sum_k": pc.cast(t["sum_k"], pa.int64()),
                         "max_k": pc.cast(t["max_k"], pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def events_global_topn(sf_dir: str, k: int = 100):
    """Global ORDER BY value DESC, event_id LIMIT k with rank — the
    global-sort/limit surface done the scale way: a per-block partial
    top-k combiner (only k rows leave each block, never the stream), then
    ONE k*nblocks-row merge block assigns the final rank.  A full
    ``Dataset.sort`` would be an all-to-all over every row for a k-row
    answer.  Output: (rnk, event_id, cents)."""
    import ray.data as rd

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        eid = t["event_id"].to_numpy()
        order = np.lexsort((eid, -v))[:k]
        return t.take(pa.array(np.sort(order)))

    def final(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        eid = t["event_id"].to_numpy()
        order = np.lexsort((eid, -v))[:k]
        cents = np.rint(v[order] * 100.0).astype(np.int64)
        return pa.table({
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "event_id": pa.array(eid[order]),
            "cents": pa.array(cents),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(final, batch_size=None, batch_format="pyarrow")


def user_day_click_purchase(sf_dir: str):
    """FULL OUTER co-partitioned join: per (user_id, day) click activity
    vs purchase activity — either side may be absent (NULL columns), the
    join surface the engine previously lacked (inner/semi/anti/asof/left
    all exist).

    One pass over events (both types in one read, one filter), one
    shuffle by ``user_id % NPART`` (both sides co-partition; day rides
    along), then a vectorized per-bucket groupby + unstack — emitted as
    an Arrow table with explicit nullable int64 columns so NULL semantics
    hash identically to the SQL FULL OUTER.

    Output: (user_id, day, n_clicks, click_cents, n_purchases,
    purchase_cents)."""
    from ..functions.scale import coarse_npart

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])
    npart = coarse_npart()

    def route(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        b = pc.cast(pc.bit_wise_and(t["user_id"], npart - 1), pa.int64())
        return pa.table({"user_id": t["user_id"], "day": day,
                         "etype": t["event_type"], "value": t["value"],
                         "bucket": b})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "d": g["day"].to_numpy(object),
                           "t": g["etype"].to_numpy(object),
                           "c": cents})
        agg = df.groupby(["u", "d", "t"])["c"].agg(["size", "sum"]) \
            .unstack("t")          # columns: (size|sum) x (click|purchase)
        idx = agg.index
        def col(stat, typ):
            if (stat, typ) in agg.columns:
                return pa.array(agg[(stat, typ)].astype("Int64"),
                                pa.int64())
            return pa.nulls(len(agg), pa.int64())
        return pa.table({
            "user_id": pa.array(idx.get_level_values("u").to_numpy(np.int64)),
            "day": pa.array(idx.get_level_values("d").to_numpy(object),
                            pa.string()),
            "n_clicks": col("size", "click"),
            "click_cents": col("sum", "click"),
            "n_purchases": col("size", "purchase"),
            "purchase_cents": col("sum", "purchase"),
        })

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas",
                                      num_cpus=1)


def q14_promo_revenue(sf_dir: str, year: int = 1996):
    """TPC-H Q14-shaped promo-revenue share: of one year's lineitem
    revenue, the fraction earned by PROMO-type parts.

    Output: one row (promo_cents, total_cents, promo_bp) — integer cents
    and basis points (floor), float-free for the value hash.

    Scale shape: part is the broadcast dimension (only (p_partkey,
    is_promo) ships — a sorted key array + bitmask via ray.put, searched
    with one np.searchsorted per batch); lineitem streams through a
    zero-shuffle map emitting two-cell partials, reduced driver-side
    (bounded: 2 ints per block).
    """
    import ray

    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    keys = part["p_partkey"].to_numpy(zero_copy_only=False)
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(
        zero_copy_only=False)
    order = np.argsort(keys)
    dim_ref = ray.put((keys[order], promo[order]))
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    def partial(t: pa.Table) -> pa.Table:
        k, is_promo = ray.get(dim_ref)
        d = t["l_shipdate"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array((d >= lo) & (d < hi)))
        if f.num_rows == 0:
            return pa.table({"promo_cents": pa.array([0], pa.int64()),
                             "total_cents": pa.array([0], pa.int64())})
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        # DuckDB ROUND is half-AWAY (std::round); revenue products DO
        # land on exact .5 boundaries (unlike the two-decimal events
        # values where rint suffices).  floor + (frac >= .5) computes
        # half-away exactly, avoiding the floor(x+0.5) ULP pitfall.
        y = rev * 100.0
        base = np.floor(y)
        cents = (base + (y - base >= 0.5)).astype(np.int64)
        pk = f["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, pk)
        posc = np.clip(pos, 0, max(len(k) - 1, 0))
        hit = (len(k) > 0) & (pos < len(k)) & (k[posc] == pk)
        pm = np.where(hit, is_promo[posc], False)
        # inner-join semantics (matches the oracle): unmatched partkeys
        # contribute to neither sum (l_partkey is an FK, so none in
        # practice)
        return pa.table({
            "promo_cents": pa.array([int(cents[pm].sum())], pa.int64()),
            "total_cents": pa.array([int(cents[hit].sum())], pa.int64())})

    parts = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_shipdate", "l_extendedprice",
                           "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=1 << 20)
    blocks = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
              for b in parts.iter_batches(batch_format="pyarrow",
                                          batch_size=1 << 20)]
    if not blocks:                       # fully-empty input
        return pa.table({"promo_cents": pa.array([0], pa.int64()),
                         "total_cents": pa.array([0], pa.int64()),
                         "promo_bp": pa.array([0], pa.int64())})
    rows = pa.concat_tables(blocks)
    p = int(pc.sum(rows["promo_cents"]).as_py() or 0)
    tot = int(pc.sum(rows["total_cents"]).as_py() or 0)
    bp = int(np.floor(p * 10000.0 / tot)) if tot else 0
    return pa.table({"promo_cents": pa.array([p], pa.int64()),
                     "total_cents": pa.array([tot], pa.int64()),
                     "promo_bp": pa.array([bp], pa.int64())})


def _cents_half_away(rev: np.ndarray) -> np.ndarray:
    """DuckDB-identical ROUND(x*100) as int64: half-AWAY-from-zero via
    floor + (frac >= .5) — revenue products DO land on exact .5
    boundaries, and floor(x+0.5) has a ULP pitfall (see q14)."""
    y = np.asarray(rev, np.float64) * 100.0
    base = np.floor(y)
    return (base + (y - base >= 0.5)).astype(np.int64)


def _broadcast_sorted(table: pa.Table, key: str, cols) -> tuple:
    """(sorted key array, payload arrays) for np.searchsorted probes."""
    k = table[key].to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="mergesort")
    return k[order], tuple(
        table[c].to_numpy(zero_copy_only=False)[order] for c in cols)


def _probe(keys_sorted: np.ndarray, probe: np.ndarray) -> tuple:
    """np.searchsorted membership probe: (hit mask, clipped positions)."""
    if len(keys_sorted) == 0:
        return np.zeros(len(probe), bool), np.zeros(len(probe), np.int64)
    pos = np.searchsorted(keys_sorted, probe)
    posc = np.clip(pos, 0, len(keys_sorted) - 1)
    hit = (pos < len(keys_sorted)) & (keys_sorted[posc] == probe)
    return hit, posc


def q7_volume_shipping(sf_dir: str, nation_a: int = 1, nation_b: int = 2):
    """TPC-H Q7-shaped volume shipping: revenue between two nations by
    (supp_nation, cust_nation, year) over a two-year shipdate window.

    Scale shape (mirrors q5): supplier is the broadcast dimension
    (sorted (s_suppkey -> s_nationkey) restricted to the two nations);
    customer x orders co-partition by custkey (customers pre-filtered to
    the two nations, so the shuffled side is 2/|nations| of the table);
    then ONE orderkey co-partition joins the lineitem side.  The final
    reduce is bounded (2 nation-pairs x 2 years).
    """
    import ray

    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    pair = (nation_a, nation_b)
    nat_t = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_name"])
    name_by_key = dict(zip(nat_t["n_nationkey"].to_pylist(),
                           nat_t["n_name"].to_pylist()))
    sup_t = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_nationkey"])
    sup_t = sup_t.filter(pc.is_in(sup_t["s_nationkey"],
                                  pa.array(pair, pa.int64())))
    s_keys, (s_nat,) = _broadcast_sorted(sup_t, "s_suppkey",
                                         ["s_nationkey"])
    sup_ref = ray.put((s_keys, s_nat))
    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def cust_side(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array(np.isin(nk, pair)))
        ck = pc.cast(f["c_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "payload": pc.cast(f["c_nationkey"], pa.int64()),
            "is_cust": pa.array(np.ones(f.num_rows, bool)),
        })

    def order_side(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["o_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "payload": pc.cast(t["o_orderkey"], pa.int64()),
            "is_cust": pa.array(np.zeros(t.num_rows, bool)),
        })

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_side, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
        .map_batches(order_side, batch_format="pyarrow")

    def join_cust(g: pd.DataFrame) -> pa.Table:
        cu = g[g["is_cust"]]
        od = g[~g["is_cust"]]
        m = od.merge(cu[["custkey", "payload"]].rename(
            columns={"payload": "cust_nat"}), on="custkey", how="inner")
        ok = m["payload"].to_numpy(np.int64)
        return pa.table({
            "bucket": pa.array(ok % npart),
            "orderkey": pa.array(ok),
            "nat": pa.array(m["cust_nat"].to_numpy(np.int64)),
            "year": pa.array(np.zeros(len(m), np.int64)),
            "cents": pa.array(np.zeros(len(m), np.int64)),
            "is_ord": pa.array(np.ones(len(m), bool)),
        })

    ord_nat = cust.union(orders).groupby("bucket").map_groups(
        join_cust, batch_format="pandas", num_cpus=1)

    def li_side(t: pa.Table) -> pa.Table:
        keys, nats = ray.get(sup_ref)
        d = t["l_shipdate"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array((d >= lo) & (d < hi)))
        sk = f["l_suppkey"].to_numpy(zero_copy_only=False)
        hit, posc = _probe(keys, sk)
        f = f.filter(pa.array(hit))
        snat = nats[posc[hit]] if f.num_rows else np.array([], np.int64)
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        years = f["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        ok = pc.cast(f["l_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(ok % npart),
            "orderkey": pa.array(ok),
            "nat": pa.array(snat.astype(np.int64)),
            "year": pa.array(years),
            "cents": pa.array(_cents_half_away(rev)),
            "is_ord": pa.array(np.zeros(len(ok), bool)),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["is_ord"]]
        lig = g[~g["is_ord"]]
        m = lig.merge(od[["orderkey", "nat"]].rename(
            columns={"nat": "cust_nat"}), on="orderkey", how="inner")
        m = m[m["nat"] != m["cust_nat"]]     # cross-nation only
        agg = m.groupby(["nat", "cust_nat", "year"], as_index=False,
                        sort=True)["cents"].sum()
        return pd.DataFrame({
            "supp_nat": agg["nat"].to_numpy(np.int64),
            "cust_nat": agg["cust_nat"].to_numpy(np.int64),
            "l_year": agg["year"].to_numpy(np.int64),
            "cents": agg["cents"].to_numpy(np.int64)})

    partials = ord_nat.union(li).groupby("bucket").map_groups(
        join_li, batch_format="pandas", num_cpus=1)

    # bounded final reduce: <= 2 pairs x 2 years x npart partial rows
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    empty = pa.table({"supp_nation": pa.array([], pa.string()),
                      "cust_nation": pa.array([], pa.string()),
                      "l_year": pa.array([], pa.int64()),
                      "revenue_cents": pa.array([], pa.int64())})
    if not parts:
        return empty
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts])
    if rows.num_rows == 0:
        return empty
    df = rows.to_pandas().groupby(
        ["supp_nat", "cust_nat", "l_year"], as_index=False)["cents"].sum()
    return pa.table({
        "supp_nation": pa.array([name_by_key[k] for k in df["supp_nat"]]),
        "cust_nation": pa.array([name_by_key[k] for k in df["cust_nat"]]),
        "l_year": pa.array(df["l_year"].to_numpy(np.int64)),
        "revenue_cents": pa.array(df["cents"].to_numpy(np.int64))})


def q10_returned_items(sf_dir: str, k: int = 20):
    """TPC-H Q10-shaped returned-item report: top-k customers by revenue
    from RETURNED lineitems against one quarter's orders.

    Scale shape: orders (quarter-filtered) union-tagged with the
    returnflag='R' lineitem rows, ONE orderkey co-partition joins them
    and re-keys partial (custkey, cents) sums by custkey bucket; a
    second co-partitioned groupby finishes per-customer sums and emits
    only its bucket's TOP-K (k rows per bucket move); the driver merges
    <= k x npart rows and fetches the k winners' attributes with a
    keyed parquet read (row-group pruned) — customer never shuffles.
    """
    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")

    def order_side(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array((d >= lo) & (d < hi)))
        ok = pc.cast(f["o_orderkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "custkey": pc.cast(f["o_custkey"], pa.int64()),
            "cents": pa.array(np.zeros(f.num_rows, np.int64)),
            "is_ord": pa.array(np.ones(f.num_rows, bool)),
        })

    def li_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        ok = pc.cast(f["l_orderkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "custkey": pa.array(np.zeros(f.num_rows, np.int64)),
            "cents": pa.array(_cents_half_away(rev)),
            "is_ord": pa.array(np.zeros(f.num_rows, bool)),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(order_side, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def join_ok(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["is_ord"]]
        lig = g[~g["is_ord"]]
        m = lig.merge(od[["orderkey", "custkey"]].rename(
            columns={"custkey": "ck"}), on="orderkey", how="inner")
        agg = m.groupby("ck", as_index=False, sort=True)["cents"].sum()
        ck = agg["ck"].to_numpy(np.int64)
        return pd.DataFrame({
            "cbucket": ck % npart, "custkey": ck,
            "cents": agg["cents"].to_numpy(np.int64)})

    per_cust = orders.union(li).groupby("bucket").map_groups(
        join_ok, batch_format="pandas", num_cpus=1)

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("custkey", as_index=False, sort=True)["cents"].sum()
        order = np.lexsort((agg["custkey"].to_numpy(np.int64),
                            -agg["cents"].to_numpy(np.int64)))[:k]
        return agg.iloc[order][["custkey", "cents"]]

    partials = per_cust.groupby("cbucket").map_groups(
        topk_bucket, batch_format="pandas", num_cpus=1)

    # driver merge: <= k x npart rows
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                      "c_name": pa.array([], pa.string()),
                      "c_acctbal": pa.array([], pa.float64()),
                      "n_name": pa.array([], pa.string()),
                      "revenue_cents": pa.array([], pa.int64())})
    if not parts:
        return empty
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts])
    if rows.num_rows == 0:
        return empty
    ck = rows["custkey"].to_numpy(zero_copy_only=False)
    cents = rows["cents"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, -cents))[:k]
    ck, cents = ck[order], cents[order]

    import pyarrow.dataset as pads
    cust = pads.dataset(os.path.join(sf_dir, "customer.parquet")) \
        .to_table(columns=["c_custkey", "c_name", "c_acctbal",
                           "c_nationkey"],
                  filter=pads.field("c_custkey").isin(ck.tolist()))
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    name_by_key = dict(zip(nat["n_nationkey"].to_pylist(),
                           nat["n_name"].to_pylist()))
    attr = {r["c_custkey"]: r for r in cust.to_pylist()}
    return pa.table({
        "c_custkey": pa.array(ck),
        "c_name": pa.array([attr[c]["c_name"] for c in ck]),
        "c_acctbal": pa.array([attr[c]["c_acctbal"] for c in ck],
                              pa.float64()),
        "n_name": pa.array([name_by_key[attr[c]["c_nationkey"]]
                            for c in ck]),
        "revenue_cents": pa.array(cents)})


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13-shaped customer order-count distribution, INCLUDING
    zero-order customers (the LEFT JOIN shape).

    Scale shape: orders pre-aggregate to per-batch (custkey, n) partials
    inside map_batches, so the single custkey co-partition ships one row
    per distinct (batch, custkey), not one per order; customers
    union-tag into the same shuffle; each bucket left-joins its
    customers against its counts (absent custkey = 0 orders) and emits a
    BOUNDED (c_count, n_cust) distribution partial; the driver reduce is
    O(distinct order counts).
    """
    from ..functions.scale import coarse_npart

    npart = coarse_npart()

    def order_side(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["o_custkey"], pa.int64())
        g = pa.table({"custkey": ck}).group_by("custkey") \
            .aggregate([("custkey", "count")])
        ckk = g["custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ckk, npart - 1), pa.int64()),
            "custkey": ckk,
            "n": pc.cast(g["custkey_count"], pa.int64()),
            "is_cust": pa.array(np.zeros(g.num_rows, bool)),
        })

    def cust_side(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["c_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "n": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_cust": pa.array(np.ones(t.num_rows, bool)),
        })

    orders = _read(sf_dir, "orders", columns=["o_custkey"]) \
        .map_batches(order_side, batch_format="pyarrow",
                     batch_size=1 << 20)
    cust = _read(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(cust_side, batch_format="pyarrow")

    def dist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cu = g.loc[g["is_cust"], "custkey"].to_numpy(np.int64)
        od = g[~g["is_cust"]]
        counts = od.groupby("custkey")["n"].sum()
        per_cust = counts.reindex(cu, fill_value=0).to_numpy(np.int64)
        vals, freq = np.unique(per_cust, return_counts=True)
        return pd.DataFrame({"c_count": vals,
                             "n_cust": freq.astype(np.int64)})

    partials = orders.union(cust).groupby("bucket").map_groups(
        dist_bucket, batch_format="pandas", num_cpus=1)

    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    if not parts:
        return pa.table({"c_count": pa.array([], pa.int64()),
                         "custdist": pa.array([], pa.int64())})
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts])
    df = rows.to_pandas().groupby("c_count", as_index=False)["n_cust"] \
        .sum().sort_values("c_count")
    return pa.table({"c_count": pa.array(df["c_count"].to_numpy(np.int64)),
                     "custdist": pa.array(df["n_cust"].to_numpy(np.int64))})


def q17_small_quantity(sf_dir: str, brand: str = "Brand#11",
                       max_size: int = 10):
    """TPC-H Q17-shaped small-quantity revenue: lineitems of one brand's
    small parts whose quantity is below 20% of that part's average
    quantity (the correlated-subquery shape).

    Scale shape: the part subset is the broadcast dimension (sorted
    partkey array); surviving lineitems co-partition ONCE by partkey, so
    each bucket computes its parts' exact averages and the qty<0.2*avg
    filter locally, emitting a bounded (sum_cents, n_rows) partial.
    Exact-integer compare: quantities are integer-valued, so per-part
    sums and the 0.2*avg product are IEEE-exact and match the oracle
    bit-for-bit.
    """
    import ray

    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    part = part.filter(pc.and_(pc.equal(part["p_brand"], brand),
                               pc.less(part["p_size"], max_size)))
    keys = np.sort(part["p_partkey"].to_numpy(zero_copy_only=False))
    keys_ref = ray.put(keys)

    def li_side(t: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        hit, _ = _probe(k, pk)
        f = t.filter(pa.array(hit))
        pkf = f["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(pkf % npart),
            "partkey": pa.array(pkf),
            "qty": f["l_quantity"],
            "cents": pa.array(_cents_half_away(
                f["l_extendedprice"].to_numpy(zero_copy_only=False))),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        qty = g["qty"].to_numpy(np.float64)
        avg = g.groupby("partkey")["qty"].transform("mean") \
            .to_numpy(np.float64)
        keep = qty < 0.2 * avg
        return pd.DataFrame({
            "sum_cents": [int(g.loc[keep, "cents"].sum())],
            "n_rows": [int(keep.sum())]})

    partials = li.groupby("bucket").map_groups(
        per_part, batch_format="pandas", num_cpus=1)
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    if not parts:
        return pa.table({"sum_cents": pa.array([0], pa.int64()),
                         "n_rows": pa.array([0], pa.int64())})
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts])
    return pa.table({
        "sum_cents": pa.array([int(pc.sum(rows["sum_cents"]).as_py()
                                   or 0)], pa.int64()),
        "n_rows": pa.array([int(pc.sum(rows["n_rows"]).as_py() or 0)],
                           pa.int64())})


def q18_large_orders(sf_dir: str, qty_threshold: int = 300, k: int = 100):
    """TPC-H Q18-shaped large-volume orders: orders whose total lineitem
    quantity exceeds the threshold, top-k by order value.

    Scale shape: lineitem pre-aggregates (orderkey, qty) per batch, then
    ONE orderkey co-partition merges the partials with the union-tagged
    orders side; each bucket applies the HAVING filter and emits only
    its TOP-K rows; the driver merges <= k x npart rows and fetches the
    k winning customers' names with a keyed parquet read.
    """
    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()

    def li_side(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        g = pa.table({"orderkey": ok, "qty": t["l_quantity"]}) \
            .group_by("orderkey").aggregate([("qty", "sum")])
        okk = g["orderkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(okk, npart - 1), pa.int64()),
            "orderkey": okk,
            "qty": g["qty_sum"],
            "custkey": pa.array(np.zeros(g.num_rows, np.int64)),
            "odate": pa.array(np.zeros(g.num_rows, np.int64)),
            "price_cents": pa.array(np.zeros(g.num_rows, np.int64)),
            "is_ord": pa.array(np.zeros(g.num_rows, bool)),
        })

    def order_side(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "qty": pa.array(np.zeros(t.num_rows, np.float64)),
            "custkey": pc.cast(t["o_custkey"], pa.int64()),
            "odate": pc.cast(t["o_orderdate"], pa.int64()),
            "price_cents": pa.array(_cents_half_away(
                t["o_totalprice"].to_numpy(zero_copy_only=False))),
            "is_ord": pa.array(np.ones(t.num_rows, bool)),
        })

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"]) \
        .map_batches(order_side, batch_format="pyarrow")

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lig = g[~g["is_ord"]]
        qty = lig.groupby("orderkey")["qty"].sum()
        big = qty[qty > qty_threshold]
        od = g[g["is_ord"]]
        m = od[od["orderkey"].isin(big.index)].copy()
        m["sum_qty"] = big.reindex(m["orderkey"]).to_numpy(np.float64)
        order = np.lexsort((m["orderkey"].to_numpy(np.int64),
                            m["odate"].to_numpy(np.int64),
                            -m["price_cents"].to_numpy(np.int64)))[:k]
        return m.iloc[order][["custkey", "orderkey", "odate",
                              "price_cents", "sum_qty"]]

    partials = li.union(orders).groupby("bucket").map_groups(
        topk_bucket, batch_format="pandas", num_cpus=1)

    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    empty = pa.table({"c_name": pa.array([], pa.string()),
                      "c_custkey": pa.array([], pa.int64()),
                      "o_orderkey": pa.array([], pa.int64()),
                      "o_orderdate": pa.array([], pa.timestamp("us")),
                      "totalprice_cents": pa.array([], pa.int64()),
                      "sum_qty": pa.array([], pa.int64())})
    if not parts:
        return empty
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts])
    if rows.num_rows == 0:
        return empty
    order = np.lexsort((rows["orderkey"].to_numpy(zero_copy_only=False),
                        rows["odate"].to_numpy(zero_copy_only=False),
                        -rows["price_cents"].to_numpy(
                            zero_copy_only=False)))[:k]
    rows = rows.take(pa.array(order))

    import pyarrow.dataset as pads
    ck = rows["custkey"].to_numpy(zero_copy_only=False)
    cust = pads.dataset(os.path.join(sf_dir, "customer.parquet")) \
        .to_table(columns=["c_custkey", "c_name"],
                  filter=pads.field("c_custkey").isin(
                      np.unique(ck).tolist()))
    name = dict(zip(cust["c_custkey"].to_pylist(),
                    cust["c_name"].to_pylist()))
    return pa.table({
        "c_name": pa.array([name[c] for c in ck]),
        "c_custkey": pa.array(ck),
        "o_orderkey": rows["orderkey"],
        "o_orderdate": pc.cast(rows["odate"], pa.timestamp("us")),
        "totalprice_cents": rows["price_cents"],
        # quantities are integer-valued doubles; the sum is exact
        "sum_qty": pa.array(rows["sum_qty"].to_numpy(
            zero_copy_only=False).astype(np.int64)),
    })


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19-shaped discounted revenue: OR of three (brand, size,
    quantity-range) predicate groups across the lineitem x part join.

    Scale shape: part ships as a broadcast triple (sorted partkey, brand
    id, size); lineitem streams through one zero-shuffle map that
    evaluates all three predicate groups vectorized and emits a single
    cents partial per batch; the driver reduce is O(blocks).
    """
    import ray

    import pyarrow.parquet as pq

    GROUPS = (("Brand#12", 1, 15, 1, 11),
              ("Brand#23", 1, 25, 10, 20),
              ("Brand#24", 1, 35, 20, 30))

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    keys = part["p_partkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    brands = part["p_brand"].to_pylist()
    bid = np.array([next((i for i, g in enumerate(GROUPS)
                          if g[0] == b), -1) for b in brands],
                   np.int64)[order]
    size = part["p_size"].to_numpy(zero_copy_only=False)[order]
    dim_ref = ray.put((keys[order], bid, size))

    def partial(t: pa.Table) -> pa.Table:
        k, b, sz = ray.get(dim_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        hit, posc = _probe(k, pk)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(pk), bool)
        for gi, (_, s_lo, s_hi, q_lo, q_hi) in enumerate(GROUPS):
            keep |= (hit & (b[posc] == gi) & (sz[posc] >= s_lo) &
                     (sz[posc] <= s_hi) & (qty >= q_lo) & (qty <= q_hi))
        f = t.filter(pa.array(keep))
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({
            "cents": pa.array([int(_cents_half_away(rev).sum())],
                              pa.int64()),
            "n": pa.array([f.num_rows], pa.int64())})

    parts = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_quantity", "l_extendedprice",
                           "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=1 << 20)
    blocks = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
              for b in parts.iter_batches(batch_format="pyarrow",
                                          batch_size=1 << 20)]
    if not blocks:                       # fully-empty input
        return pa.table({"revenue_cents": pa.array([0], pa.int64()),
                         "n_rows": pa.array([0], pa.int64())})
    rows = pa.concat_tables(blocks)
    return pa.table({
        "revenue_cents": pa.array([int(pc.sum(rows["cents"]).as_py()
                                       or 0)], pa.int64()),
        "n_rows": pa.array([int(pc.sum(rows["n"]).as_py() or 0)],
                           pa.int64())})


def q8_market_share(sf_dir: str, region: str = "EUROPE",
                    target_nation: int = 3, p_type: str = "PROMO"):
    """TPC-H Q8-shaped market share: of one region's revenue for one
    part type over 1995-1996, the fraction supplied by the target
    nation, by order year.

    Scale shape: part (type-filtered partkeys) and supplier
    (suppkey -> is-target-nation) are broadcast sorted arrays; customer
    (region-filtered) x orders (date-filtered) co-partition by custkey;
    the filtered lineitem side joins on ONE orderkey co-partition; the
    final reduce is bounded (2 years x 2 cells).  Output is float-free:
    integer cents + basis points (floor).
    """
    import ray

    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    reg_t = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                          columns=["r_regionkey", "r_name"])
    rkeys = reg_t.filter(pc.equal(reg_t["r_name"], region))["r_regionkey"] \
        .to_numpy(zero_copy_only=False)
    nat_t = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_regionkey"])
    region_nations = np.sort(
        nat_t.filter(pa.array(np.isin(
            nat_t["n_regionkey"].to_numpy(zero_copy_only=False), rkeys)))
        ["n_nationkey"].to_numpy(zero_copy_only=False))
    part_t = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_type"])
    pkeys = np.sort(part_t.filter(pc.equal(part_t["p_type"], p_type))
                    ["p_partkey"].to_numpy(zero_copy_only=False))
    sup_t = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_nationkey"])
    s_keys, (s_nat,) = _broadcast_sorted(sup_t, "s_suppkey",
                                         ["s_nationkey"])
    dim_ref = ray.put((pkeys, s_keys, s_nat == target_nation))
    rn_ref = ray.put(region_nations)
    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def cust_side(t: pa.Table) -> pa.Table:
        rn = ray.get(rn_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array(np.isin(nk, rn)))
        ck = pc.cast(f["c_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "payload": pa.array(np.zeros(f.num_rows, np.int64)),
            "year": pa.array(np.zeros(f.num_rows, np.int64)),
            "is_cust": pa.array(np.ones(f.num_rows, bool)),
        })

    def order_side(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array((d >= lo) & (d < hi)))
        ck = pc.cast(f["o_custkey"], pa.int64())
        years = f["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "payload": pc.cast(f["o_orderkey"], pa.int64()),
            "year": pa.array(years),
            "is_cust": pa.array(np.zeros(f.num_rows, bool)),
        })

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_side, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(order_side, batch_format="pyarrow")

    def join_cust(g: pd.DataFrame) -> pa.Table:
        cu = g[g["is_cust"]]
        od = g[~g["is_cust"]]
        m = od[od["custkey"].isin(cu["custkey"])]
        ok = m["payload"].to_numpy(np.int64)
        return pa.table({
            "bucket": pa.array(ok % npart),
            "orderkey": pa.array(ok),
            "year": pa.array(m["year"].to_numpy(np.int64)),
            "cents": pa.array(np.zeros(len(m), np.int64)),
            "is_target": pa.array(np.zeros(len(m), bool)),
            "is_ord": pa.array(np.ones(len(m), bool)),
        })

    ord_side = cust.union(orders).groupby("bucket").map_groups(
        join_cust, batch_format="pandas", num_cpus=1)

    def li_side(t: pa.Table) -> pa.Table:
        pk_set, sk_set, s_is_target = ray.get(dim_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        hit_p, _ = _probe(pk_set, pk)
        f = t.filter(pa.array(hit_p))
        sk = f["l_suppkey"].to_numpy(zero_copy_only=False)
        hit_s, posc = _probe(sk_set, sk)
        f = f.filter(pa.array(hit_s))
        tgt = s_is_target[posc[hit_s]] if f.num_rows else \
            np.array([], bool)
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        ok = pc.cast(f["l_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(ok % npart),
            "orderkey": pa.array(ok),
            "year": pa.array(np.zeros(len(ok), np.int64)),
            "cents": pa.array(_cents_half_away(rev)),
            "is_target": pa.array(tgt),
            "is_ord": pa.array(np.zeros(len(ok), bool)),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["is_ord"]]
        lig = g[~g["is_ord"]]
        m = lig.merge(od[["orderkey", "year"]].rename(
            columns={"year": "o_year"}), on="orderkey", how="inner")
        agg = m.groupby(["o_year", "is_target"], as_index=False,
                        sort=True)["cents"].sum()
        return pd.DataFrame({
            "o_year": agg["o_year"].to_numpy(np.int64),
            "is_target": agg["is_target"].to_numpy(bool),
            "cents": agg["cents"].to_numpy(np.int64)})

    partials = ord_side.union(li).groupby("bucket").map_groups(
        join_li, batch_format="pandas", num_cpus=1)

    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20))
    empty = pa.table({"o_year": pa.array([], pa.int64()),
                      "target_cents": pa.array([], pa.int64()),
                      "total_cents": pa.array([], pa.int64()),
                      "share_bp": pa.array([], pa.int64())})
    if not parts:
        return empty
    rows = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts])
    if rows.num_rows == 0:
        return empty
    df = rows.to_pandas()
    tot = df.groupby("o_year")["cents"].sum()
    tgt = df[df["is_target"]].groupby("o_year")["cents"].sum() \
        .reindex(tot.index, fill_value=0)
    years = tot.index.to_numpy(np.int64)
    share = np.floor(tgt.to_numpy(np.float64) * 10000.0 /
                     np.maximum(tot.to_numpy(np.float64), 1)) \
        .astype(np.int64)
    return pa.table({"o_year": pa.array(years),
                     "target_cents": pa.array(tgt.to_numpy(np.int64)),
                     "total_cents": pa.array(tot.to_numpy(np.int64)),
                     "share_bp": pa.array(share)})

def _gather(ds) -> pa.Table | None:
    """Collect a BOUNDED Dataset of partial rows into one Arrow table
    (None when no rows).  Only for dimension-sized / top-k-combined
    partials — never data-sized streams."""
    parts = list(ds.iter_batches(batch_format="pyarrow",
                                 batch_size=1 << 20))
    tabs = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
            for p in parts]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return None
    return pa.concat_tables(tabs)


def q12_shipmode_priority(sf_dir: str, late_days: int = 60):
    """TPC-H Q12-shaped shipping-priority audit: among LATE lineitems
    (shipped more than ``late_days`` after the order date — the reduced
    schema's analogue of receipt-past-commit), how many belong to
    high-priority orders vs low, per return-flag class (the schema's
    shipmode analogue).

    Scale shape: ONE orderkey co-partition of the union-tagged orders
    (orderkey -> odate, priority class) and lineitem (orderkey ->
    shipdate, returnflag) sides; each bucket joins locally and emits a
    bounded (class, high, low) partial; driver reduce is <= 3 rows x
    npart.  Reference parity: TPC-H Q12 semantics (conditional counts
    over a late-shipment join).
    """
    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    late_us = np.int64(late_days) * np.int64(86_400_000_000)
    high = ("1-URGENT", "2-HIGH")

    def order_side(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "ts": pc.cast(pc.cast(t["o_orderdate"], pa.int64()),
                          pa.int64()),
            "rf": pa.array([""] * t.num_rows, pa.string()),
            "is_high": pc.is_in(t["o_orderpriority"],
                                pa.array(high, pa.string())),
            "is_ord": pa.array(np.ones(t.num_rows, bool)),
        })

    def li_side(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "ts": pc.cast(pc.cast(t["l_shipdate"], pa.int64()),
                          pa.int64()),
            "rf": t["l_returnflag"],
            "is_high": pa.array(np.zeros(t.num_rows, bool)),
            "is_ord": pa.array(np.zeros(t.num_rows, bool)),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]) \
        .map_batches(order_side, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_returnflag"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["is_ord"]]
        lig = g[~g["is_ord"]]
        m = lig.merge(od[["orderkey", "ts", "is_high"]].rename(
            columns={"ts": "ts_o", "is_high": "hi"}),
            on="orderkey", how="inner")
        late = m["ts"].to_numpy(np.int64) > \
            m["ts_o"].to_numpy(np.int64) + late_us
        m = m[late]
        if not len(m):
            return pd.DataFrame({"ship_class": pd.Series([], dtype=str),
                                 "high": pd.Series([], dtype=np.int64),
                                 "low": pd.Series([], dtype=np.int64)})
        hi = m["hi"].to_numpy(bool)
        agg = pd.DataFrame({"ship_class": m["rf"].to_numpy(object),
                            "high": hi.astype(np.int64),
                            "low": (~hi).astype(np.int64)}) \
            .groupby("ship_class", as_index=False, sort=True).sum()
        return agg

    partials = orders.union(li).groupby("bucket").map_groups(
        per_bucket, batch_format="pandas", num_cpus=1)
    rows = _gather(partials)
    empty = pa.table({"ship_class": pa.array([], pa.string()),
                      "high_line_count": pa.array([], pa.int64()),
                      "low_line_count": pa.array([], pa.int64())})
    if rows is None:
        return empty
    df = rows.to_pandas().groupby("ship_class", as_index=False,
                                  sort=True).sum()
    return pa.table({
        "ship_class": pa.array(df["ship_class"].astype(str)),
        "high_line_count": pa.array(df["high"].to_numpy(np.int64)),
        "low_line_count": pa.array(df["low"].to_numpy(np.int64))})


def q15_top_supplier(sf_dir: str, start: str = "1996-01-01"):
    """TPC-H Q15-shaped top supplier: the supplier(s) with maximum
    revenue over a three-month shipdate window (the revenue-view +
    global-MAX correlated filter shape).

    Scale shape: per-batch partial (suppkey, cents) sums -> ONE suppkey
    groupby -> materialized supplier-revenue dataset (|suppliers| rows,
    stays in the object store); the global max is a per-block partial
    max (O(blocks) driver reduce) and only argmax rows leave the
    cluster.  Exact integers end-to-end.
    """
    from ray.data.aggregate import Sum

    lo = np.datetime64(start, "us")
    hi = (np.datetime64(start, "M") + 3).astype("datetime64[us]")

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array((d >= lo) & (d < hi)))
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        g = pa.table({
            "suppkey": pc.cast(f["l_suppkey"], pa.int64()),
            "cents": pa.array(_cents_half_away(rev)),
        }).group_by("suppkey").aggregate([("cents", "sum")])
        return g.rename_columns(["suppkey", "cents"])

    agg = _read(sf_dir, "lineitem",
                columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                         "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=1 << 20) \
        .groupby("suppkey").aggregate(Sum("cents",
                                          alias_name="total_cents")) \
        .materialize()

    def block_max(t: pa.Table) -> pa.Table:
        m = pc.max(t["total_cents"]).as_py() if t.num_rows else None
        return pa.table({"m": pa.array([m] if m is not None else [],
                                       pa.int64())})

    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "total_cents": pa.array([], pa.int64())})
    maxes = _gather(agg.map_batches(block_max, batch_format="pyarrow"))
    if maxes is None:
        return empty
    mx = int(pc.max(maxes["m"]).as_py())

    def winners(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["total_cents"], mx))

    win = _gather(agg.map_batches(winners, batch_format="pyarrow"))
    if win is None:
        return empty
    sk = np.sort(win["suppkey"].to_numpy(zero_copy_only=False))

    import pyarrow.dataset as pads
    sup = pads.dataset(os.path.join(sf_dir, "supplier.parquet")) \
        .to_table(columns=["s_suppkey", "s_name"],
                  filter=pads.field("s_suppkey").isin(sk.tolist()))
    name = dict(zip(sup["s_suppkey"].to_pylist(),
                    sup["s_name"].to_pylist()))
    return pa.table({
        "s_suppkey": pa.array(sk),
        "s_name": pa.array([name[s] for s in sk]),
        "total_cents": pa.array(np.full(len(sk), mx, np.int64))})


def q22_global_sales(sf_dir: str, nations=(1, 3, 5, 7, 9),
                     cutoff: str = "1999-01-01"):
    """TPC-H Q22-shaped global sales opportunity: per nation (the
    reduced schema's country-code analogue), count + total balance of
    above-average-balance customers with NO recent orders (anti-join).

    Scale shape: pass 1 computes the global positive-balance average as
    exact integers via per-batch (sum_cents, n) partials (bounded
    driver reduce); pass 2 union-tags the threshold-filtered customers
    with the recent-order custkeys on ONE custkey co-partition and
    anti-joins per bucket, emitting bounded (nation, count, cents)
    partials.  The avg threshold compares cents*n > sum_cents in exact
    int64 (no float boundary flake).
    """
    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    nat = np.asarray(nations, np.int64)
    cut = np.datetime64(cutoff, "us")

    def bal_partial(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        m = np.isin(nk, nat) & (bal > 0.0)
        cents = _cents_half_away(bal[m])
        return pa.table({"s": pa.array([int(cents.sum())], pa.int64()),
                         "n": pa.array([int(m.sum())], pa.int64())})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    tot = _gather(_read(sf_dir, "customer", columns=cust_cols)
                  .map_batches(bal_partial, batch_format="pyarrow"))
    empty = pa.table({"cntrycode": pa.array([], pa.int64()),
                      "numcust": pa.array([], pa.int64()),
                      "totacctbal_cents": pa.array([], pa.int64())})
    if tot is None:
        return empty
    sum_cents = int(pc.sum(tot["s"]).as_py() or 0)
    n_pos = int(pc.sum(tot["n"]).as_py() or 0)

    def cust_side(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = _cents_half_away(
            t["c_acctbal"].to_numpy(zero_copy_only=False))
        m = np.isin(nk, nat) & (cents * n_pos > sum_cents)
        f = t.filter(pa.array(m))
        ck = pc.cast(f["c_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "nk": pa.array(nk[m]),
            "cents": pa.array(cents[m]),
            "is_cust": pa.array(np.ones(int(m.sum()), bool)),
        })

    def order_side(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        f = t.filter(pa.array(d >= cut))
        ck = pc.cast(f["o_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ck, npart - 1), pa.int64()),
            "custkey": ck,
            "nk": pa.array(np.zeros(f.num_rows, np.int64)),
            "cents": pa.array(np.zeros(f.num_rows, np.int64)),
            "is_cust": pa.array(np.zeros(f.num_rows, bool)),
        })

    cust = _read(sf_dir, "customer", columns=cust_cols) \
        .map_batches(cust_side, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate"]) \
        .map_batches(order_side, batch_format="pyarrow")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        cu = g[g["is_cust"]]
        od = g[~g["is_cust"]]
        keep = cu[~cu["custkey"].isin(od["custkey"])]
        if not len(keep):
            return pd.DataFrame({"nk": pd.Series([], dtype=np.int64),
                                 "numcust": pd.Series([], dtype=np.int64),
                                 "cents": pd.Series([], dtype=np.int64)})
        a = keep.groupby("nk", as_index=False, sort=True) \
            .agg(numcust=("custkey", "size"), cents=("cents", "sum"))
        return a

    rows = _gather(cust.union(orders).groupby("bucket").map_groups(
        anti, batch_format="pandas", num_cpus=1))
    if rows is None:
        return empty
    df = rows.to_pandas().groupby("nk", as_index=False, sort=True).sum()
    return pa.table({
        "cntrycode": pa.array(df["nk"].to_numpy(np.int64)),
        "numcust": pa.array(df["numcust"].to_numpy(np.int64)),
        "totacctbal_cents": pa.array(df["cents"].to_numpy(np.int64))})

def _region_suppliers(sf_dir: str, region: str) -> pa.Table:
    """Suppliers in one region (tiny dim join on the driver):
    (s_suppkey, s_name, s_acctbal, s_nationkey, n_name)."""
    import pyarrow.parquet as pq

    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rk = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"] \
        .to_numpy(zero_copy_only=False)
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nat = nat.filter(pa.array(np.isin(
        nat["n_regionkey"].to_numpy(zero_copy_only=False), rk)))
    nname = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"))
    sup = sup.filter(pa.array(np.isin(
        sup["s_nationkey"].to_numpy(zero_copy_only=False),
        nat["n_nationkey"].to_numpy(zero_copy_only=False))))
    return sup.append_column(
        "n_name", pa.array([nname[k] for k in
                            sup["s_nationkey"].to_pylist()], pa.string()))


def q2_min_cost_supplier(sf_dir: str, max_size: int = 25,
                         p_type: str = "STANDARD",
                         region: str = "EUROPE", k: int = 100):
    """TPC-H Q2-shaped minimum-cost supplier: for each qualifying part,
    the region supplier(s) offering it at the minimum observed unit
    price (min lineitem extendedprice — the reduced schema's
    ps_supplycost analogue), with the correlated per-part MIN + join
    back (argmin) shape.

    Scale shape: part subset and region-supplier set are broadcast
    sorted arrays; lineitem pre-reduces (partkey, suppkey) -> min cents
    per batch, then ONE partkey co-partition finishes per-pair mins,
    takes each part's min, and emits only argmin rows (<= a few per
    part); the driver sorts the bounded result and cuts top-k.
    """
    import ray

    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_size", "p_type"])
    part = part.filter(pc.and_(pc.less(part["p_size"], max_size),
                               pc.equal(part["p_type"], p_type)))
    pkeys = np.sort(part["p_partkey"].to_numpy(zero_copy_only=False))
    sup = _region_suppliers(sf_dir, region)
    skeys = np.sort(sup["s_suppkey"].to_numpy(zero_copy_only=False))
    dim_ref = ray.put((pkeys, skeys))

    def li_side(t: pa.Table) -> pa.Table:
        pks, sks = ray.get(dim_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        hp, _ = _probe(pks, pk)
        f = t.filter(pa.array(hp))
        sk = f["l_suppkey"].to_numpy(zero_copy_only=False)
        hs, _ = _probe(sks, sk)
        f = f.filter(pa.array(hs))
        cents = _cents_half_away(
            f["l_extendedprice"].to_numpy(zero_copy_only=False))
        g = pa.table({
            "partkey": pc.cast(f["l_partkey"], pa.int64()),
            "suppkey": pc.cast(f["l_suppkey"], pa.int64()),
            "cents": pa.array(cents),
        }).group_by(["partkey", "suppkey"]).aggregate([("cents", "min")])
        pkk = g["partkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(pkk % npart),
            "partkey": g["partkey"],
            "suppkey": g["suppkey"],
            "cents": g["cents_min"],
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def argmin_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["partkey", "suppkey"], as_index=False,
                        sort=False)["cents"].min()
        best = per.groupby("partkey")["cents"].transform("min")
        w = per[per["cents"].to_numpy(np.int64) ==
                best.to_numpy(np.int64)]
        return w[["partkey", "suppkey", "cents"]]

    rows = _gather(li.groupby("bucket").map_groups(
        argmin_bucket, batch_format="pandas", num_cpus=1))
    empty = pa.table({"s_acctbal_cents": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "n_name": pa.array([], pa.string()),
                      "p_partkey": pa.array([], pa.int64()),
                      "cost_cents": pa.array([], pa.int64())})
    if rows is None:
        return empty
    df = rows.to_pandas()
    meta = {int(s): (int(np.rint(b * 100.0)), nm, nn)
            for s, b, nm, nn in zip(sup["s_suppkey"].to_pylist(),
                                    sup["s_acctbal"].to_pylist(),
                                    sup["s_name"].to_pylist(),
                                    sup["n_name"].to_pylist())}
    trip = [meta[int(s)] for s in df["suppkey"]]
    out = pd.DataFrame({
        "s_acctbal_cents": np.array([t[0] for t in trip], np.int64),
        "s_name": [t[1] for t in trip],
        "n_name": [t[2] for t in trip],
        "p_partkey": df["partkey"].to_numpy(np.int64),
        "cost_cents": df["cents"].to_numpy(np.int64)})
    out = out.sort_values(
        ["s_acctbal_cents", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True]).head(k)
    return pa.Table.from_pandas(out, preserve_index=False)


def q9_product_profit(sf_dir: str, word: str = "widget",
                      cost_rate: float = 0.1):
    """TPC-H Q9-shaped product-type profit: per (supplier nation, order
    year), net profit of lineitems whose part name contains ``word`` —
    revenue minus a retail-price-proportional cost (the reduced
    schema's ps_supplycost analogue).

    Scale shape: part (name-matched partkey -> retailprice) and
    supplier (suppkey -> nationkey) are broadcast sorted arrays; the
    order year joins on ONE orderkey co-partition; the final reduce is
    bounded (|nations| x |years|).  Profit is the exact difference of
    two nonneg half-away cent roundings (matches DuckDB ROUND without
    negative-half ambiguity).
    """
    import ray

    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"])
    part = part.filter(pc.match_substring(part["p_name"], word))
    p_keys, (p_rp,) = _broadcast_sorted(part, "p_partkey",
                                        ["p_retailprice"])
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    s_keys, (s_nat,) = _broadcast_sorted(sup, "s_suppkey",
                                         ["s_nationkey"])
    nat_t = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_name"])
    nname = dict(zip(nat_t["n_nationkey"].to_pylist(),
                     nat_t["n_name"].to_pylist()))
    dim_ref = ray.put((p_keys, p_rp, s_keys, s_nat))

    def order_side(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64())
        years = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "nat": pa.array(np.zeros(t.num_rows, np.int64)),
            "year": pa.array(years),
            "cents": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_ord": pa.array(np.ones(t.num_rows, bool)),
        })

    def li_side(t: pa.Table) -> pa.Table:
        pks, rps, sks, nats = ray.get(dim_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        hp, pp = _probe(pks, pk)
        f = t.filter(pa.array(hp))
        rp = rps[pp[hp]] if f.num_rows else np.array([], np.float64)
        sk = f["l_suppkey"].to_numpy(zero_copy_only=False)
        hs, ps = _probe(sks, sk)
        f = f.filter(pa.array(hs))
        rp = rp[hs]
        nat = nats[ps[hs]] if f.num_rows else np.array([], np.int64)
        rev = f["l_extendedprice"].to_numpy(zero_copy_only=False) * \
            (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
        cost = (cost_rate * rp) * \
            f["l_quantity"].to_numpy(zero_copy_only=False)
        cents = _cents_half_away(rev) - _cents_half_away(cost)
        ok = pc.cast(f["l_orderkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(ok % npart),
            "orderkey": pa.array(ok),
            "nat": pa.array(nat.astype(np.int64)),
            "year": pa.array(np.zeros(len(ok), np.int64)),
            "cents": pa.array(cents),
            "is_ord": pa.array(np.zeros(len(ok), bool)),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(order_side, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["is_ord"]]
        lig = g[~g["is_ord"]]
        m = lig.merge(od[["orderkey", "year"]].rename(
            columns={"year": "o_year"}), on="orderkey", how="inner")
        agg = m.groupby(["nat", "o_year"], as_index=False,
                        sort=True)["cents"].sum()
        return agg

    rows = _gather(orders.union(li).groupby("bucket").map_groups(
        join_li, batch_format="pandas", num_cpus=1))
    empty = pa.table({"nation": pa.array([], pa.string()),
                      "o_year": pa.array([], pa.int64()),
                      "profit_cents": pa.array([], pa.int64())})
    if rows is None:
        return empty
    df = rows.to_pandas().groupby(["nat", "o_year"],
                                  as_index=False).sum()
    df = df.sort_values(["nat", "o_year"],
                        ascending=[True, False])
    return pa.table({
        "nation": pa.array([nname[n] for n in df["nat"]], pa.string()),
        "o_year": pa.array(df["o_year"].to_numpy(np.int64)),
        "profit_cents": pa.array(df["cents"].to_numpy(np.int64))})


def q11_important_stock(sf_dir: str, region: str = "ASIA",
                        fraction: float = 0.0001):
    """TPC-H Q11-shaped important stock: parts whose shipped value from
    one region's suppliers exceeds ``fraction`` of the global total
    (the grouped-sum + global-threshold HAVING shape).

    Scale shape: region suppliers broadcast; per-batch (partkey, cents)
    partial sums -> ONE partkey groupby, materialized in the object
    store; the global total is an O(blocks) per-block partial-sum
    reduce, and only above-threshold rows (mathematically <=
    1/fraction of them) ever reach the driver.
    """
    import ray

    from ray.data.aggregate import Sum

    sup = _region_suppliers(sf_dir, region)
    skeys = np.sort(sup["s_suppkey"].to_numpy(zero_copy_only=False))
    sk_ref = ray.put(skeys)

    def partial(t: pa.Table) -> pa.Table:
        sks = ray.get(sk_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        hs, _ = _probe(sks, sk)
        f = t.filter(pa.array(hs))
        cents = _cents_half_away(
            f["l_extendedprice"].to_numpy(zero_copy_only=False))
        g = pa.table({
            "partkey": pc.cast(f["l_partkey"], pa.int64()),
            "cents": pa.array(cents),
        }).group_by("partkey").aggregate([("cents", "sum")])
        return g.rename_columns(["partkey", "cents"])

    agg = _read(sf_dir, "lineitem",
                columns=["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=1 << 20) \
        .groupby("partkey").aggregate(Sum("cents",
                                          alias_name="value_cents")) \
        .materialize()

    def block_sum(t: pa.Table) -> pa.Table:
        s = pc.sum(t["value_cents"]).as_py() if t.num_rows else None
        return pa.table({"s": pa.array([s] if s is not None else [],
                                       pa.int64())})

    empty = pa.table({"p_partkey": pa.array([], pa.int64()),
                      "value_cents": pa.array([], pa.int64())})
    sums = _gather(agg.map_batches(block_sum, batch_format="pyarrow"))
    if sums is None:
        return empty
    total = int(pc.sum(sums["s"]).as_py() or 0)
    thresh = total * fraction            # float compare, both sides exact

    def above(t: pa.Table) -> pa.Table:
        v = t["value_cents"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(v > thresh))

    win = _gather(agg.map_batches(above, batch_format="pyarrow"))
    if win is None:
        return empty
    order = np.lexsort((win["partkey"].to_numpy(zero_copy_only=False),
                        -win["value_cents"].to_numpy(
                            zero_copy_only=False)))
    win = win.take(pa.array(order))
    return pa.table({"p_partkey": win["partkey"],
                     "value_cents": win["value_cents"]})

def q16_supplier_cnt(sf_dir: str, excl_brand: str = "Brand#13",
                     excl_type: str = "PROMO",
                     sizes=(5, 10, 15, 20, 25, 30, 35, 40),
                     min_bal: float = 1000.0):
    """TPC-H Q16-shaped parts/supplier relationship: per (brand, type,
    size), how many DISTINCT suppliers ship that part class — with
    brand/type/size exclusions and a supplier blacklist (low account
    balance standing in for the complaints predicate).

    Scale shape: the part subset maps partkey -> a dense (brand, type,
    size)-class id, broadcast with the supplier whitelist as sorted
    arrays; lineitem emits per-batch DISTINCT (partkey, suppkey) pairs
    (Arrow group_by, no row loop), deduped on ONE partkey-bucketed
    co-partition, re-keyed as distinct (class, suppkey) on a SECOND
    hash co-partition so every distinct pair counts exactly once; the
    driver reduce is bounded (|classes| x npart).
    """
    import ray

    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    sz = np.asarray(sizes, np.int64)
    keep = pc.and_(pc.and_(
        pc.not_equal(part["p_brand"], excl_brand),
        pc.not_equal(part["p_type"], excl_type)),
        pa.array(np.isin(part["p_size"].to_numpy(zero_copy_only=False)
                         .astype(np.int64), sz)))
    part = part.filter(keep)
    pdf = part.to_pandas()
    cls = pdf.groupby(["p_brand", "p_type", "p_size"]).ngroup() \
        .to_numpy(np.int64)
    classes = pdf.assign(cls=cls).drop_duplicates("cls") \
        .set_index("cls").sort_index()
    order = np.argsort(pdf["p_partkey"].to_numpy(np.int64),
                       kind="mergesort")
    p_keys = pdf["p_partkey"].to_numpy(np.int64)[order]
    p_cls = cls[order]
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_acctbal"])
    sup = sup.filter(pc.greater_equal(sup["s_acctbal"], min_bal))
    skeys = np.sort(sup["s_suppkey"].to_numpy(zero_copy_only=False))
    dim_ref = ray.put((p_keys, p_cls, skeys))
    MIX = np.int64(0x9E3779B9)

    def li_pairs(t: pa.Table) -> pa.Table:
        pks, pcls, sks = ray.get(dim_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        hp, _ = _probe(pks, pk)
        f = t.filter(pa.array(hp))
        sk = f["l_suppkey"].to_numpy(zero_copy_only=False)
        hs, _ = _probe(sks, sk)
        f = f.filter(pa.array(hs))
        g = pa.table({
            "partkey": pc.cast(f["l_partkey"], pa.int64()),
            "suppkey": pc.cast(f["l_suppkey"], pa.int64()),
        }).group_by(["partkey", "suppkey"]).aggregate([])
        pkk = g["partkey"].to_numpy(zero_copy_only=False)
        skk = g["suppkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((pkk * MIX + skk) % npart),
            "partkey": g["partkey"],
            "suppkey": g["suppkey"],
        })

    pairs = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_suppkey"]) \
        .map_batches(li_pairs, batch_format="pyarrow",
                     batch_size=1 << 20)

    def dedup_to_class(g: pd.DataFrame) -> pd.DataFrame:
        pks, pcls, _ = ray.get(dim_ref)
        d = g.drop_duplicates(["partkey", "suppkey"])
        pk = d["partkey"].to_numpy(np.int64)
        pos = np.searchsorted(pks, pk)
        c = pcls[pos]
        out = pd.DataFrame({"cls": c,
                            "suppkey": d["suppkey"].to_numpy(np.int64)}) \
            .drop_duplicates()
        out["bucket2"] = (out["cls"].to_numpy(np.int64) * MIX +
                          out["suppkey"].to_numpy(np.int64)) % npart
        return out

    cls_pairs = pairs.groupby("bucket").map_groups(
        dedup_to_class, batch_format="pandas", num_cpus=1)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["cls", "suppkey"])
        a = d.groupby("cls", as_index=False, sort=True) \
            .agg(cnt=("suppkey", "size"))
        return a

    rows = _gather(cls_pairs.groupby("bucket2").map_groups(
        count_bucket, batch_format="pandas", num_cpus=1))
    empty = pa.table({"p_brand": pa.array([], pa.string()),
                      "p_type": pa.array([], pa.string()),
                      "p_size": pa.array([], pa.int64()),
                      "supplier_cnt": pa.array([], pa.int64())})
    if rows is None:
        return empty
    df = rows.to_pandas().groupby("cls", as_index=False).sum()
    m = classes.loc[df["cls"].to_numpy(np.int64)]
    out = pd.DataFrame({
        "p_brand": m["p_brand"].to_numpy(object),
        "p_type": m["p_type"].to_numpy(object),
        "p_size": m["p_size"].to_numpy(np.int64),
        "supplier_cnt": df["cnt"].to_numpy(np.int64)})
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True])
    return pa.Table.from_pandas(out, preserve_index=False)


def q20_part_promotion(sf_dir: str, word: str = "bolt",
                       year: int = 1996, region: str = "AMERICA"):
    """TPC-H Q20-shaped part-promotion candidates: region suppliers
    who, for some name-matched part, shipped more than half of their
    all-time quantity of it inside one year (the nested
    half-of-total-quantity threshold shape).

    Scale shape: part subset broadcast; per-batch partial
    (suppkey, partkey) -> (qty_in_year, qty_total) sums; ONE pair-hash
    co-partition finishes the sums, applies the exact 2*qty_year >
    qty_all compare (integer-valued doubles), and emits each bucket's
    DISTINCT qualifying suppkeys; the region filter + name fetch touch
    only the bounded winner set.
    """
    import ray

    import pyarrow.parquet as pq

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    part = part.filter(pc.match_substring(part["p_name"], word))
    pkeys = np.sort(part["p_partkey"].to_numpy(zero_copy_only=False))
    pk_ref = ray.put(pkeys)
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")
    MIX = np.int64(0x9E3779B9)

    def li_partial(t: pa.Table) -> pa.Table:
        pks = ray.get(pk_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        hp, _ = _probe(pks, pk)
        f = t.filter(pa.array(hp))
        d = f["l_shipdate"].to_numpy(zero_copy_only=False)
        qty = f["l_quantity"].to_numpy(zero_copy_only=False)
        in_year = ((d >= lo) & (d < hi)).astype(np.float64) * qty
        g = pa.table({
            "suppkey": pc.cast(f["l_suppkey"], pa.int64()),
            "partkey": pc.cast(f["l_partkey"], pa.int64()),
            "qy": pa.array(in_year),
            "qa": pa.array(qty),
        }).group_by(["suppkey", "partkey"]).aggregate(
            [("qy", "sum"), ("qa", "sum")])
        skk = g["suppkey"].to_numpy(zero_copy_only=False)
        pkk = g["partkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((skk * MIX + pkk) % npart),
            "suppkey": g["suppkey"],
            "partkey": g["partkey"],
            "qy": g["qy_sum"],
            "qa": g["qa_sum"],
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow",
                     batch_size=1 << 20)

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["suppkey", "partkey"], as_index=False,
                      sort=False)[["qy", "qa"]].sum()
        w = a[2.0 * a["qy"].to_numpy(np.float64) >
              a["qa"].to_numpy(np.float64)]
        return pd.DataFrame({
            "suppkey": np.unique(w["suppkey"].to_numpy(np.int64))})

    rows = _gather(li.groupby("bucket").map_groups(
        winners, batch_format="pandas", num_cpus=1))
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string())})
    if rows is None:
        return empty
    sup = _region_suppliers(sf_dir, region)
    name = dict(zip(sup["s_suppkey"].to_pylist(),
                    sup["s_name"].to_pylist()))
    sk = np.unique(rows["suppkey"].to_numpy(zero_copy_only=False))
    sk = np.array([s for s in sk if s in name], np.int64)
    return pa.table({
        "s_suppkey": pa.array(sk),
        "s_name": pa.array([name[s] for s in sk], pa.string())})


def q21_waiting_suppliers(sf_dir: str, region: str = "ASIA",
                          late_days: int = 90, k: int = 100):
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting: for finished
    ('F') orders with MULTIPLE suppliers where EXACTLY ONE supplier
    shipped late (> ``late_days`` past the order date), count per
    supplier how often they were that sole late supplier; top-k among
    one region's suppliers (the EXISTS / NOT-EXISTS pair shape).

    Scale shape: ONE orderkey co-partition of the F-filtered orders and
    lineitem sides evaluates the per-order exists/not-exists predicate
    locally and pre-counts (suppkey, waits) per bucket; a second small
    suppkey groupby finishes counts; per-block top-k emission bounds
    the driver merge; names come from a keyed parquet fetch.
    """
    import ray

    from ray.data.aggregate import Sum

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    late_us = np.int64(late_days) * np.int64(86_400_000_000)
    sup = _region_suppliers(sf_dir, region)
    name = dict(zip(sup["s_suppkey"].to_pylist(),
                    sup["s_name"].to_pylist()))
    skeys = np.sort(sup["s_suppkey"].to_numpy(zero_copy_only=False))
    sk_ref = ray.put(skeys)

    def order_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderstatus"], "F"))
        ok = pc.cast(f["o_orderkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "suppkey": pa.array(np.zeros(f.num_rows, np.int64)),
            "ts": pc.cast(pc.cast(f["o_orderdate"], pa.int64()),
                          pa.int64()),
            "is_ord": pa.array(np.ones(f.num_rows, bool)),
        })

    def li_side(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(ok, npart - 1), pa.int64()),
            "orderkey": ok,
            "suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "ts": pc.cast(pc.cast(t["l_shipdate"], pa.int64()),
                          pa.int64()),
            "is_ord": pa.array(np.zeros(t.num_rows, bool)),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus",
                            "o_orderdate"]) \
        .map_batches(order_side, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(li_side, batch_format="pyarrow", batch_size=1 << 20)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["is_ord"]]
        lig = g[~g["is_ord"]]
        m = lig.merge(od[["orderkey", "ts"]].rename(
            columns={"ts": "ts_o"}), on="orderkey", how="inner")
        if not len(m):
            return pd.DataFrame({"suppkey": pd.Series([], dtype=np.int64),
                                 "waits": pd.Series([], dtype=np.int64)})
        late = (m["ts"].to_numpy(np.int64) >
                m["ts_o"].to_numpy(np.int64) + late_us)
        per = pd.DataFrame({"orderkey": m["orderkey"],
                            "suppkey": m["suppkey"],
                            "late": late}) \
            .groupby(["orderkey", "suppkey"], as_index=False,
                     sort=False)["late"].max()
        agg = per.groupby("orderkey").agg(
            nsupp=("suppkey", "size"), nlate=("late", "sum"))
        ok = agg[(agg["nsupp"] > 1) & (agg["nlate"] == 1)].index
        w = per[per["late"] & per["orderkey"].isin(ok)]
        # region filter BEFORE the count/top-k so below-global-top-k
        # region suppliers survive the per-block cut
        sks = ray.get(sk_ref)
        hit, _ = _probe(sks, w["suppkey"].to_numpy(np.int64))
        w = w[hit]
        out = w.groupby("suppkey", as_index=False, sort=True) \
            .agg(waits=("orderkey", "size"))
        return out

    counts = orders.union(li).groupby("bucket").map_groups(
        per_bucket, batch_format="pandas", num_cpus=1) \
        .groupby("suppkey").aggregate(Sum("waits", alias_name="numwait"))

    def block_topk(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"suppkey": pa.array([], pa.int64()),
                             "numwait": pa.array([], pa.int64())})
        order = np.lexsort((t["suppkey"].to_numpy(zero_copy_only=False),
                            -t["numwait"].to_numpy(
                                zero_copy_only=False)))[:k]
        t = t.take(pa.array(order))
        return pa.table({"suppkey": pc.cast(t["suppkey"], pa.int64()),
                         "numwait": pc.cast(t["numwait"], pa.int64())})

    rows = _gather(counts.map_batches(block_topk,
                                      batch_format="pyarrow"))
    empty = pa.table({"s_name": pa.array([], pa.string()),
                      "numwait": pa.array([], pa.int64())})
    if rows is None:
        return empty
    df = rows.to_pandas()
    order = np.lexsort((df["suppkey"].to_numpy(np.int64),
                        -df["numwait"].to_numpy(np.int64)))[:k]
    df = df.iloc[order]
    return pa.table({
        "s_name": pa.array([name[s] for s in df["suppkey"]], pa.string()),
        "numwait": pa.array(df["numwait"].to_numpy(np.int64))})


def grouped_corr(sf_dir: str):
    """Grouped statistical aggregates — CORR / REGR_SLOPE / COVAR_POP of
    (quantity cents, discount basis points) per returnflag — via EXACT
    integer moment partials.

    Distributed float summation is order-dependent, so the five moments
    (sum x, sum y, sum x^2, sum y^2, sum xy) are accumulated as int64
    per batch (inputs are bounded: x <= 5000, y <= 1000, so per-batch and
    global sums stay far from overflow through sf1), merged exactly by a
    Sum over 3 group rows, and only the FINAL formula touches floats — in
    the same expression order as the SQL oracle, on Python arbitrary-
    precision ints for the n*sxx-style products that outgrow int64.

    Output: (grp, n, corr_micro, slope_micro, covp_centi) — micro/centi
    FLOOR-scaled integers.

    Scale shape: one combiner pass (5 int64 sums per group per batch),
    one tiny groupby over |groups| rows, O(|groups|) driver finalize.
    """
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        y = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                    * 10000.0).astype(np.int64)
        df = pd.DataFrame({"grp": t["l_returnflag"].to_numpy(
            zero_copy_only=False),
            "n": 1, "sx": x, "sy": y, "sxx": x * x, "syy": y * y,
            "sxy": x * y})
        agg = df.groupby("grp", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("grp").aggregate(
                Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
                Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"))
            .take_all())                    # bounded: |groups| rows
    rows.sort(key=lambda r: r["grp"])
    out = {"grp": [], "n": [], "corr_micro": [], "slope_micro": [],
           "covp_centi": []}
    for r in rows:
        # python ints: n*sxx products exceed int64 at large sf
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        out["grp"].append(r["grp"])
        out["n"].append(n)
        # identical IEEE expression order to the SQL oracle
        out["corr_micro"].append(math.floor(
            1000000.0 * float(num) / math.sqrt(float(vx) * float(vy))))
        out["slope_micro"].append(math.floor(
            1000000.0 * float(num) / float(vx)))
        out["covp_centi"].append(math.floor(
            100.0 * float(num) / n / n))
    return pa.table({"grp": pa.array(out["grp"], pa.string()),
                     "n": pa.array(out["n"], pa.int64()),
                     "corr_micro": pa.array(out["corr_micro"], pa.int64()),
                     "slope_micro": pa.array(out["slope_micro"], pa.int64()),
                     "covp_centi": pa.array(out["covp_centi"], pa.int64())})


def mode_per_group(sf_dir: str):
    """MODE() — most frequent quantity (cents) per returnflag, ties
    broken by the smallest value (made deterministic; SQL's mode() alone
    is tie-unspecified, so the oracle spells out the same rule).

    Output: (grp, mode_cents, n) with n the winner's frequency.

    Scale shape: per-batch (grp, value) value_counts combiner — each
    batch ships at most |groups| x |distinct values| partial rows — one
    groupby over (grp, value) pairs, then a per-group vectorized argmax
    over the BOUNDED distinct-value set.  The raw column never shuffles.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        df = pd.DataFrame({"grp": t["l_returnflag"].to_numpy(
            zero_copy_only=False), "v": v})
        agg = df.groupby(["grp", "v"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "v"], ascending=[False, True],
                          kind="mergesort")
        top = g.iloc[:1]
        return pd.DataFrame({"grp": top["grp"].to_numpy(),
                             "mode_cents": top["v"].to_numpy(np.int64),
                             "n": top["n"].to_numpy(np.int64)})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby(["grp", "v"]).aggregate(Sum("c", alias_name="n"))
            .groupby("grp").map_groups(pick, batch_format="pandas",
                                       num_cpus=0.5))


def key_skew_audit(sf_dir: str):
    """Key-skew audit — exact Gini coefficient of the per-user activity
    distribution within each event type, in integer micro-units.  The
    corpus-level analogue of the CDC hot-key probe: a type whose Gini
    approaches 1 concentrates its volume on few users (the partitioning
    hazard the salted-shuffle path exists for).

    Output: (event_type, k, tot, gini_micro) — k distinct users, tot
    events, Gini from the rank-weighted sum identity.

    Scale shape: one (type, user)-bucket shuffle for exact per-pair
    counts; each bucket emits COUNT-OF-COUNTS partials ((type, n) ->
    #users with n events), so the final groupby is bounded by
    |types| x |distinct counts| regardless of user cardinality; the
    driver computes Gini from that histogram with the tied-rank series
    formula (sum of ranks over a tied block is arithmetic), never
    touching per-user rows.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    from ..functions.scale import coarse_npart
    npart = coarse_npart()

    def pair_partials(t: pa.Table) -> pa.Table:
        agg = t.group_by(["event_type", "user_id"]).aggregate(
            [("user_id", "count")])
        u = agg["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"bkt": pa.array(u % npart),
                         "event_type": agg["event_type"],
                         "user_id": agg["user_id"],
                         "c": pc.cast(agg["user_id_count"], pa.int64())})

    def count_of_counts(g: pd.DataFrame) -> pa.Table:
        tot = g.groupby(["event_type", "user_id"], sort=False)["c"].sum() \
            .reset_index(name="n")
        hist = tot.groupby(["event_type", "n"], sort=False) \
            .size().reset_index(name="m")
        return pa.Table.from_pandas(hist, preserve_index=False)

    rows = (ds.map_batches(pair_partials, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bkt").map_groups(count_of_counts,
                                       batch_format="pandas")
            .groupby(["event_type", "n"])
            .aggregate(Sum("m", alias_name="m"))
            .take_all())          # bounded: |types| x |distinct counts|
    out = {"event_type": [], "k": [], "tot": [], "gini_micro": []}
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["n"]), int(r["m"])))
    for et in sorted(by_type):
        hist = sorted(by_type[et])
        k = sum(m for _, m in hist)
        tot = sum(n * m for n, m in hist)
        pos, wsum = 0, 0
        for n, m in hist:          # ranks pos+1 .. pos+m share value n
            wsum += n * (m * pos + m * (m + 1) // 2)
            pos += m
        out["event_type"].append(et)
        out["k"].append(k)
        out["tot"].append(tot)
        out["gini_micro"].append(
            (2 * wsum * 1_000_000) // (k * tot)
            - ((k + 1) * 1_000_000) // k)
    return pa.table({"event_type": pa.array(out["event_type"], pa.string()),
                     "k": pa.array(out["k"], pa.int64()),
                     "tot": pa.array(out["tot"], pa.int64()),
                     "gini_micro": pa.array(out["gini_micro"], pa.int64())})


def arg_max_per_user(sf_dir: str):
    """Grouped ARG_MAX — for every user, the event carrying their maximum
    spend (ties broken by the larger event_id, spelled out in the oracle
    because SQL's arg_max alone is tie-unspecified).

    Output: (user_id, top_event_id, top_cents).

    Scale shape: per-batch argmax combiner — each batch ships ONE row
    per user present in it — then one groupby over those partials with
    the same vectorized argmax.  The raw event stream never shuffles.
    """
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    from ..functions.scale import coarse_npart
    npart = coarse_npart()

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(
            zero_copy_only=False),
            "top_event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "top_cents": cents})
        # (cents, event_id) lexicographic argmax via stable sort-last
        df = df.sort_values(["user_id", "top_cents", "top_event_id"],
                            kind="mergesort")
        agg = df.groupby("user_id", sort=False, as_index=False).last()
        agg["bucket"] = agg["user_id"].to_numpy(np.int64) % npart
        return pa.Table.from_pandas(agg, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per USER BUCKET (never one Python group per
        # user): stable sort + last-row-per-user
        g = g.sort_values(["user_id", "top_cents", "top_event_id"],
                          kind="mergesort")
        out = g.groupby("user_id", sort=False, as_index=False).last()
        return out[["user_id", "top_event_id", "top_cents"]]

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").map_groups(reduce_bucket,
                                          batch_format="pandas",
                                          num_cpus=1))


# ---------------------------------------------------------------------------
# Z-order (Morton) multi-column layout
# ---------------------------------------------------------------------------

ZORDER_BITS = 8          # low bits interleaved per dimension
ZORDER_BUCKET_SHIFT = 8  # zbucket = top 8 morton bits -> 256 buckets


def _morton16(ub: np.ndarray, db: np.ndarray) -> np.ndarray:
    """Interleave the low ZORDER_BITS of two uint dimensions (user bit at
    the odd position) — vectorized; mirrored term-by-term in the SQL
    oracle."""
    z = np.zeros(len(ub), np.int64)
    for i in range(ZORDER_BITS):
        z |= ((ub >> i) & 1) << (2 * i + 1)
        z |= ((db >> i) & 1) << (2 * i)
    return z


def zorder_profile(sf_dir: str):
    """Z-ORDER LAYOUT profile of the events table: every row mapped to a
    Morton bucket over (user_id % 256, epoch-day % 256) and per-bucket
    extents reported — (zbucket, n_rows, u_min, u_max, d_min, d_max).

    This is the clustering step of a multi-column data-layout rewrite
    (Delta/Iceberg OPTIMIZE ZORDER BY): rows co-located by interleaved
    bits of BOTH predicates, so one clustered file covers a small
    (user x day) rectangle and a two-column range scan prunes most
    buckets by their min/max footer stats — single-column partitioning
    can only prune one of the two.  The profile IS the pruning index;
    the rewrite itself is the lake repartition machinery
    (lake.repartition_lake) keyed by zbucket instead of hash.

    Scale shape: zero-shuffle per-batch bucket partials (bit-op numpy +
    one local group_by), then a 256-row groupby combine — the only
    exchange carries O(buckets) rows per block.  All-integer, fully
    SQL-oracled.
    """
    from ray.data.aggregate import Max, Min, Sum

    empty = pa.table({
        "zbucket": pa.array([], pa.int64()),
        "n_rows": pa.array([], pa.int64()),
        "u_min": pa.array([], pa.int64()),
        "u_max": pa.array([], pa.int64()),
        "d_min": pa.array([], pa.int64()),
        "d_max": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        z = _morton16(u % 256, d % 256) >> ZORDER_BUCKET_SHIFT
        loc = pa.table({"zbucket": pa.array(z), "u": pa.array(u),
                        "d": pa.array(d)})
        g = loc.group_by("zbucket").aggregate([
            ("u", "count"), ("u", "min"), ("u", "max"),
            ("d", "min"), ("d", "max")])
        return pa.table({
            "zbucket": g["zbucket"],
            "n_rows": pc.cast(g["u_count"], pa.int64()),
            "u_min": g["u_min"], "u_max": g["u_max"],
            "d_min": g["d_min"], "d_max": g["d_max"]})

    return _read(sf_dir, "events", columns=["user_id", "ts"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=262144) \
        .groupby("zbucket").aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("u_min", alias_name="u_min"),
            Max("u_max", alias_name="u_max"),
            Min("d_min", alias_name="d_min"),
            Max("d_max", alias_name="d_max")) \
        .map_batches(lambda t: pa.table({
            "zbucket": pc.cast(t["zbucket"], pa.int64()),
            "n_rows": pc.cast(t["n_rows"], pa.int64()),
            "u_min": pc.cast(t["u_min"], pa.int64()),
            "u_max": pc.cast(t["u_max"], pa.int64()),
            "d_min": pc.cast(t["d_min"], pa.int64()),
            "d_max": pc.cast(t["d_max"], pa.int64())}),
            batch_format="pyarrow")


_ZORDER_CACHE = "/tmp/pgwr_zorder"


def _zorder_layout(sf_dir: str) -> str:
    """Write (once per sf_dir) the events table CLUSTERED by Morton
    bucket: one parquet directory per zbucket — the OPTIMIZE ZORDER
    rewrite whose per-file (user, day) extents zorder_profile reports.
    One groupby(zbucket) co-location shuffle; each bucket writes its own
    directory (resumable layout: a re-run skips via the _DONE marker)."""
    import hashlib as _hl

    key = _hl.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(_ZORDER_CACHE, f"events-{key}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    # sub-sharding bounds the per-task group: at 100 TB one Morton
    # bucket holds ~1/256 of the table, far beyond one worker's heap —
    # (zbucket, sub) groups keep each write task at bucket/NSUB rows
    # and the layout stays prunable by the zb= directory alone
    nsub = 4

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        z = _morton16(u % 256, d % 256) >> ZORDER_BUCKET_SHIFT
        sub = (t["event_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64) % nsub)
        return t.append_column("zbucket", pa.array(z)) \
            .append_column("sub", pa.array(sub))

    def write_bucket(g) -> "pa.Table":
        import pyarrow.parquet as pq_
        zb = int(g["zbucket"].iloc[0])
        sub = int(g["sub"].iloc[0])
        bdir = os.path.join(out, f"zb={zb}")
        os.makedirs(bdir, exist_ok=True)
        pq_.write_table(pa.Table.from_pandas(
            g.drop(columns=["zbucket", "sub"]), preserve_index=False),
            os.path.join(bdir, f"part-{sub:02d}.parquet"))
        return pa.table({"zbucket": pa.array([zb], pa.int64()),
                         "n": pa.array([len(g)], pa.int64())})

    _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby(["zbucket", "sub"]) \
        .map_groups(write_bucket, batch_format="pandas") \
        .materialize()
    with open(done, "w") as f:
        f.write("ok")
    return out


ZORDER_Q_USER = (3, 9)          # fixed driver-query rectangle
ZORDER_Q_DAY = (19730, 19737)   # mirrored in the SQL oracle


def zorder_pruned_scan(sf_dir: str, u_range=ZORDER_Q_USER,
                       d_range=ZORDER_Q_DAY):
    """Two-column range scan over the Z-ordered layout: only buckets
    whose interleaved-bit cell rectangle intersects the query rectangle
    are READ (bucket candidacy computed driver-side from the Morton
    construction — 65536 cells max, microseconds), then the exact
    predicate filters inside.  Results are layout-invariant, so the
    oracle is the plain WHERE over the raw table; the pruning win
    (files read << total) is pinned by test.

    Output: (event_id, user_id, d).
    """
    import ray.data as rd

    from ..functions.scale import sized_read_parquet

    out = _zorder_layout(sf_dir)
    ulo, uhi = u_range
    dlo, dhi = d_range
    ubs = np.unique(np.arange(ulo, uhi + 1, dtype=np.int64) % 256) \
        if uhi - ulo < 256 else np.arange(256, dtype=np.int64)
    dbs = np.unique(np.arange(dlo, dhi + 1, dtype=np.int64) % 256) \
        if dhi - dlo < 256 else np.arange(256, dtype=np.int64)
    uu, dd = np.meshgrid(ubs, dbs, indexing="ij")
    cand = np.unique(_morton16(uu.ravel(), dd.ravel())
                     >> ZORDER_BUCKET_SHIFT)
    paths = [os.path.join(out, f"zb={b}") for b in cand]
    paths = [p for p in paths if os.path.isdir(p)]
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "d": pa.array([], pa.int64())})
    if not paths:
        return rd.from_arrow(empty)

    def scan(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        keep = (u >= ulo) & (u <= uhi) & (d >= dlo) & (d <= dhi)
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64())
            .filter(pa.array(keep)),
            "user_id": pa.array(u[keep]),
            "d": pa.array(d[keep])})

    return sized_read_parquet(paths) \
        .map_batches(scan, batch_format="pyarrow")
