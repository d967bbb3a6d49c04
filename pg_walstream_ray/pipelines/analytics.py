"""Analytics pipelines over the testdata tables — the engine's general
data-processing surface (grouped aggregation with partial combine, broadcast
join, sessionization / windowed aggregates), expressed Ray-Data-first.

Patterns demonstrated (ray_guide.md):
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
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
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
    lookup_ref = ray.put({
        k: (n, s) for k, n, s in zip(cust["c_custkey"].to_pylist(),
                                     cust["c_name"].to_pylist(),
                                     cust["c_mktsegment"].to_pylist())})

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
            self.lookup = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_pylist()
            names = [self.lookup.get(k, (None, None))[0] for k in keys]
            segs = [self.lookup.get(k, (None, None))[1] for k in keys]
            return pa.table({
                "c_custkey": t["o_custkey"],
                "c_name": pa.array(names, pa.string()),
                "c_mktsegment": pa.array(segs, pa.string()),
                "total_spent": _round(t["total"], 2),
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
            })

    return agg.map_batches(AttachName, fn_constructor_kwargs={"ref": lookup_ref},
                           batch_format="pyarrow", concurrency=2)


SESSION_GAP_US = 30 * 60 * 1_000_000


def sessionize_events(sf_dir: str):
    """Session windows per user (gap > 30 min starts a new session) —
    groupby(key).map_groups over ts-sorted groups (the engine's windowed
    aggregate surface; Ray Data has no event-time windows natively)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int64())
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
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    cutoff = np.datetime64("1997-06-01", "us")
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    bld = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    bld_np = bld.to_numpy(zero_copy_only=False)
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_custkey", "o_orderdate",
                                    "o_orderpriority"])
    om = pc.and_(pc.less(orders["o_orderdate"], pa.scalar(cutoff)),
                 pc.is_in(orders["o_custkey"], value_set=bld))
    orders = orders.filter(om)
    # broadcast the filtered order dimension (small side; at 100TB this
    # becomes a hash join on o_orderkey instead)
    ord_ref = ray.put({
        int(k): (d, p) for k, d, p in zip(
            orders["o_orderkey"].to_pylist(),
            orders["o_orderdate"].to_pylist(),
            orders["o_orderpriority"].to_pylist())})
    okeys = orders["o_orderkey"]

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(t["l_shipdate"], pa.scalar(cutoff)),
                    pc.is_in(t["l_orderkey"], value_set=okeys))
        f = t.filter(m)
        rev = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        g = f.append_column("rev", rev).group_by("l_orderkey") \
            .aggregate([("rev", "sum")])
        return g

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("l_orderkey").aggregate(Sum("rev_sum", alias_name="rev"))

    class Attach:
        def __init__(self, ref):
            self.orders = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["l_orderkey"].to_pylist()
            dates = [self.orders[k][0] for k in keys]
            prios = [self.orders[k][1] for k in keys]
            return pa.table({
                "l_orderkey": t["l_orderkey"],
                "revenue": _round(t["rev"], 2),
                "o_orderdate": pa.array(dates, pa.timestamp("us")),
                "o_orderpriority": pa.array(prios, pa.string()),
            })

    out = agg.map_batches(Attach, fn_constructor_kwargs={"ref": ord_ref},
                          batch_format="pyarrow", concurrency=2)

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
    NBUCKET = 64
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def combine_topk(t: pa.Table) -> pa.Table:
        # per-batch combiner: keep at most k rows per custkey before the
        # shuffle, and route by a COARSE bucket (custkey % 64) — per-key
        # map_groups costs ~25 ms of Python per tiny group
        df = t.to_pandas()
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        df = df[df.groupby("o_custkey").cumcount() < k]
        df["bucket"] = (df["o_custkey"] % NBUCKET).astype(np.int64)
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


def orders_without_lineitems(sf_dir: str):
    """Broadcast ANTI join: orders with no lineitem rows.

    Output: (o_orderkey, o_custkey, o_totalprice).

    The distinct probe-side key set is built with a per-batch dedup
    combiner, collected small, and broadcast via ``ray.put`` — the filter
    side then streams with a vectorized ``np.isin`` per batch and no
    shuffle.  At 100 TB, when the distinct key set outgrows a broadcast,
    the drop-in replacement is a bloom filter built the same way (union of
    per-batch blooms) at ~10 bits/key.
    """
    import ray

    lkeys = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def batch_distinct(t: pa.Table) -> pa.Table:
        return t.group_by("l_orderkey").aggregate([])

    # per-batch dedup first: the driver collects |distinct| rows, not |rows|
    distinct = lkeys.map_batches(batch_distinct, batch_format="pyarrow",
                                 batch_size=1 << 20)
    have = np.unique(np.concatenate(
        [b["l_orderkey"].to_numpy(zero_copy_only=False)
         for b in distinct.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 20)]))
    have_ref = ray.put(have)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(have_ref)     # local cached fetch per worker
        m = ~np.isin(t["o_orderkey"].to_numpy(zero_copy_only=False), keys)
        return t.filter(pa.array(m))

    return orders.map_batches(anti, batch_format="pyarrow")
