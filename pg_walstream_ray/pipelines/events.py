"""Event-stream taps: the EventStream / next_raw_event parity surface.

The reference exposes the decoded stream as a futures::Stream with
combinators (filter / take_while / throttle — stream.rs:1524-1767) and a
raw-frame tap with no auto-ack (``next_raw_event``, stream.rs:815-830).
Ray-Data-first, those are just Datasets:

    envelope_dataset(wal)                    # decoded change events
        .filter(...)                         # combinators = Dataset ops
    raw_frames_dataset(wal)                  # undecoded (source, lsn, frame)

Consuming the tap does NOT advance any watermark (no auto-ack): acks happen
only in the apply stage's manifests — the for_each_event ack-after-apply
contract (stream.rs:1563-1582) is structural here.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.decode import DecodeShard
from .cdc import discover_shards


def raw_frames_dataset(wal_dir: str):
    """Undecoded wire frames: (source, lsn, frame) — BYO-decoder tap
    (RawXLogData parity, stream.rs:60-69)."""
    import ray.data as rd

    shard_paths = discover_shards(wal_dir)

    def load(batch: pa.Table):
        import pyarrow.parquet as pq

        for segs in batch["wal_paths"].to_pylist():
            src = DecodeShard.source_of(segs[0])
            for path in segs:
                pf = pq.ParquetFile(path)
                for rg in range(pf.num_row_groups):
                    t = pf.read_row_group(rg)
                    yield t.append_column("source", pa.array(
                        [src] * t.num_rows, pa.int32()))

    ds = rd.from_items([{"wal_paths": segs} for segs in shard_paths],
                       override_num_blocks=len(shard_paths))
    return ds.map_batches(load, batch_size=1, batch_format="pyarrow")


def envelope_dataset(wal_dir: str, stop_at_lsn: Optional[int] = None,
                     concurrency: Optional[int] = None):
    """Decoded change-event envelope stream (commit-complete, LSN order per
    source). The Dataset IS the EventStream; chain filters/limits on it."""
    import ray
    import ray.data as rd

    shard_paths = discover_shards(wal_dir)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    c = concurrency or max(1, min(len(shard_paths), ncpu // 2))
    ds = rd.from_items([{"wal_paths": segs} for segs in shard_paths],
                       override_num_blocks=len(shard_paths))

    def decode_fn(batch: pa.Table):
        # task-based (no actor-pool spin-up; taps are short-lived) —
        # same rationale as cdc.decode_segments_fn
        yield from DecodeShard(stop_at_lsn=stop_at_lsn)(batch)

    return ds.map_batches(decode_fn, batch_size=None,
                          batch_format="pyarrow", concurrency=c, num_cpus=1)


def filter_ops(ds, ops: Iterable[str]):
    """Combinator: keep only the given op kinds (insert/update/delete/...)."""
    vals = pa.array(list(ops), pa.string())

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["op"], value_set=vals))

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_tables(ds, names: Iterable[str]):
    """Combinator: keep only events of the named tables."""
    vals = pa.array(list(names), pa.string())

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["table_name"], value_set=vals))

    return ds.map_batches(fn, batch_format="pyarrow")


class _ThrottleStage:
    """Token-bucket release gate: the pacing state lives in ONE actor so
    the cap is global, not per-task."""

    def __init__(self, rows_per_s=None, bytes_per_s=None):
        import time

        self._now = time.monotonic
        self._sleep = time.sleep
        self.rows_per_s = rows_per_s
        self.bytes_per_s = bytes_per_s
        self.t0 = self._now()
        self.rows_out = 0
        self.bytes_out = 0

    def __call__(self, t: pa.Table) -> pa.Table:
        self.rows_out += t.num_rows
        self.bytes_out += t.nbytes
        elapsed = self._now() - self.t0
        due = 0.0
        if self.rows_per_s:
            due = max(due, self.rows_out / self.rows_per_s)
        if self.bytes_per_s:
            due = max(due, self.bytes_out / self.bytes_per_s)
        if due > elapsed:
            self._sleep(due - elapsed)
        return t


def throttle(ds, rows_per_s: Optional[float] = None,
             bytes_per_s: Optional[float] = None,
             batch_size: int = 4096):
    """Combinator: cap the tap's release rate (rows/s and/or bytes/s) —
    EventStream throttle parity (stream.rs:1524-1767,
    examples/rate-limited-streaming).  A single-actor token-bucket stage:
    each batch is released only once the cumulative budget allows it, so
    downstream consumers see a paced stream while upstream decode proceeds
    under normal backpressure.  ``batch_size`` bounds burst granularity."""
    if not rows_per_s and not bytes_per_s:
        return ds
    return ds.map_batches(
        _ThrottleStage,
        fn_constructor_kwargs={"rows_per_s": rows_per_s,
                               "bytes_per_s": bytes_per_s},
        batch_size=batch_size, batch_format="pyarrow", concurrency=1,
        num_cpus=0.5)


def until_lsn(ds, lsn: int):
    """Combinator: events at or below a commit LSN (take_while analogue —
    applied per batch; the decoder's stop_at_lsn is the transport-level
    cutoff when you want commit-boundary rounding)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["commit_lsn"], lsn))

    return ds.map_batches(fn, batch_format="pyarrow")


def poll_envelopes(wal_dir: str, batch_size: int = 8192,
                   ops: "list[str] | None" = None):
    """Pull-based consumption: a plain Python generator of envelope
    batches — the lower-level polling API for callers that want to own
    the loop instead of composing Dataset stages (reference parity:
    examples/polling — 'useful when you want more control over the
    polling loop or when integrating with systems that don't work well
    with async streams').  Backpressure is inherent: the streaming
    executor only materializes blocks as the caller consumes them.

        for batch in poll_envelopes(wal, ops=["insert", "update"]):
            handle(batch)          # pa.Table
    """
    ds = envelope_dataset(wal_dir)
    if ops is not None:
        ds = filter_ops(ds, ops)
    yield from ds.iter_batches(batch_format="pyarrow",
                               batch_size=batch_size)


def changefeed(wal_dir: str, bits: int = 12,
               out_dir: Optional[str] = None):
    """Ordered changefeed export (CDC-out / outbox): every DML envelope
    gets a CONTIGUOUS per-source sequence number ``seq`` (1-based, in LSN
    order) — the downstream-consumer contract of a Kafka-partition-style
    feed: per source, seq gaps mean loss and seq order IS commit order.

    Output: (source, seq, lsn, conv_id, turn_idx, op) as a Dataset; with
    ``out_dir`` the feed is also written as per-(source, seq-range)
    Parquet files (resumable: finished ranges can be skipped on re-run).

    Scale shape (no global sort operator — same histogram-rank design as
    textops.train_shuffle):
      1. decode ONCE -> slim staging Parquet (source, lsn, key cols);
      2. one bounded Max + one per-(source, lsn>>shift) histogram scan
         over the staging columns, driver prefix-sums <= 2^bits x sources
         offsets;
      3. route rows by (source, bucket); each bucket sorts locally by lsn
         and adds its offset -> exact contiguous seq, one all-to-all of
         slim rows only.
    LSN-prefix buckets are size-balanced because LSNs are dense in WAL
    order (the reference's lsn.rs monotone space).
    """
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    dml = pa.array(["insert", "update", "delete"], pa.string())

    def slim(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["op"], value_set=dml))
        is_del = pc.equal(t["op"], "delete")
        vals = pc.if_else(is_del, t["before_values"], t["after_values"])
        conv = pc.list_element(vals, 0)
        turn = pc.cast(pc.list_element(vals, 1), pa.int32())
        return pa.table({
            "source": pc.cast(t["source"], pa.int64()),
            "lsn": t["lsn"],
            "conv_id": conv,
            "turn_idx": turn,
            "op": t["op"]})

    staging = tempfile.mkdtemp(prefix="pgwr_feed_stage_")
    envelope_dataset(wal_dir).map_batches(slim, batch_format="pyarrow") \
        .write_parquet(staging)

    empty = pa.table({"source": pa.array([], pa.int64()),
                      "seq": pa.array([], pa.int64()),
                      "lsn": pa.array([], pa.int64()),
                      "conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "op": pa.array([], pa.string())})
    if not any(f.endswith(".parquet") for f in os.listdir(staging)):
        return rd.from_arrow(empty)
    stage_ds = rd.read_parquet(staging, columns=["source", "lsn"])
    mx = stage_ds.max("lsn") if stage_ds.count() else None
    if mx is None:
        return rd.from_arrow(empty)
    shift = max(0, int(mx).bit_length() - bits)

    def hist(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "bucket": t["lsn"].to_numpy(zero_copy_only=False) >> shift,
            "n": 1})
        agg = df.groupby(["source", "bucket"], sort=False,
                         as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    rows = (rd.read_parquet(staging, columns=["source", "lsn"])
            .map_batches(hist, batch_format="pyarrow", batch_size=262144)
            .map_batches(lambda t: t.append_column(
                "sb", pc.add(pc.multiply(t["source"],
                                         np.int64(1) << bits),
                             t["bucket"])), batch_format="pyarrow")
            .groupby("sb").aggregate(Sum("n", alias_name="n"))
            .take_all())                   # bounded: <= 2^bits x sources
    # per-source prefix offsets over the bucket space
    offsets: dict = {}
    per_src: dict = {}
    for r in rows:
        s, b = divmod(int(r["sb"]), 1 << bits)
        per_src.setdefault(s, []).append((b, int(r["n"])))
    for s, lst in per_src.items():
        lst.sort()
        off, acc = {}, 0
        for b, n in lst:
            off[b] = acc
            acc += n
        offsets[s] = off

    def route(t: pa.Table) -> pa.Table:
        sb = (t["source"].to_numpy(zero_copy_only=False)
              * (np.int64(1) << bits)
              + (t["lsn"].to_numpy(zero_copy_only=False) >> shift))
        return t.append_column("sb", pa.array(sb))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s, b = divmod(int(g["sb"].iloc[0]), 1 << bits)
        base = offsets[s][b]
        o = np.argsort(g["lsn"].to_numpy(np.int64), kind="stable")
        out = g.iloc[o]
        return pd.DataFrame({
            "source": out["source"].to_numpy(np.int64),
            "seq": base + 1 + np.arange(len(g), dtype=np.int64),
            "lsn": out["lsn"].to_numpy(np.int64),
            "conv_id": out["conv_id"].to_numpy(object),
            "turn_idx": out["turn_idx"].to_numpy(np.int32),
            "op": out["op"].to_numpy(object)})

    feed = (rd.read_parquet(staging)
            .map_batches(route, batch_format="pyarrow")
            .groupby("sb").map_groups(rank_bucket, batch_format="pandas",
                                      num_cpus=1))
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        feed = feed.map_batches(
            lambda t: t, batch_format="pyarrow")  # no-op: keep lazy graph
        feed.write_parquet(out_dir)
        return rd.read_parquet(out_dir)
    return feed


def prefix_state_enrich(wal_dir: str, emit_role: str = "assistant",
                        npart: int = 0):
    """AS-OF-LSN prefix-state enrichment of the change stream: every EMIT
    event (role == ``emit_role``) is annotated with the number of
    DISTINCT turns its conversation had accumulated STRICTLY BEFORE it in
    WAL order — the evolving-state join a feature pipeline needs ("how
    much context existed when this reply was written"), computed from the
    stream itself rather than a lake probe per event.

    Output: (conv_id, lsn, n_turns_before), one row per emit event.

    Scale shape: ONE shuffle of slim (conv, lsn, turn, emit) int rows
    bucketed by conv hash; per bucket the prefix-distinct count is a
    sorted first-occurrence cumsum — no per-event state probe, no
    N-probe lake reads.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.scale import coarse_npart
    from ..stages.partition import stable_hash_strings

    npart = npart or coarse_npart()
    ds = filter_ops(envelope_dataset(wal_dir), ["insert", "update"])

    def slim(t):
        after = t["after_values"]
        if isinstance(after, pa.ChunkedArray):
            after = after.combine_chunks()
        conv = pc.list_element(after, 0)
        turn = pc.cast(pc.list_element(after, 1), pa.int64())
        role = pc.list_element(after, 2)
        h = stable_hash_strings(pa.chunked_array([conv])) % npart
        return pa.table({
            "part": pa.array(h.astype(np.int64)),
            "conv": conv, "lsn": t["lsn"], "turn": turn,
            "emit": pc.equal(role, emit_role)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "lsn"], kind="mergesort")
        first = ~g.duplicated(subset=["conv", "turn"], keep="first")
        distinct_prefix = first.groupby(
            g["conv"], sort=False).cumsum()       # inclusive of row i
        before = distinct_prefix - first.astype(np.int64)
        e = g["emit"].to_numpy(bool)
        return pd.DataFrame({
            "conv_id": g["conv"].to_numpy(object)[e],
            "lsn": g["lsn"].to_numpy(np.int64)[e],
            "n_turns_before": before.to_numpy(np.int64)[e]})

    return ds.map_batches(slim, batch_format="pyarrow") \
        .groupby("part").map_groups(per_bucket, batch_format="pandas",
                                    num_cpus=1)


def source_timeline(wal_dir: str, width_us: int):
    """Per-SOURCE ingest timeline: change events per commit-time window
    per WAL source — the per-slot throughput/lag dashboard row (a source
    whose windows thin out is a stalling replication slot; the global
    tumbling windows cannot see which one).

    Output: (source, window_start_us, n_events).

    Scale shape: per-batch (source, window) partial counts inside the
    decode map — |sources| x |windows| partial rows — then one tiny
    groupby sum.  Text never leaves the decoder.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = filter_ops(envelope_dataset(wal_dir),
                    ["insert", "update", "delete"])

    def partial(t: pa.Table) -> pa.Table:
        cts = t["commit_ts_us"].to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = cts - cts % width_us
        df = pd.DataFrame({"source": src, "window_start_us": w})
        g = df.groupby(["source", "window_start_us"], sort=False) \
            .size().reset_index(name="n")
        return pa.table({
            "source": pa.array(g["source"].to_numpy(np.int64)),
            "window_start_us": pa.array(
                g["window_start_us"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "window_start_us"]) \
        .aggregate(Sum("n", alias_name="n_events"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": pc.cast(t["source"], pa.int64()),
            "window_start_us": pc.cast(t["window_start_us"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def enrich_with_dimension(wal_dir: str, sf_dir: str):
    """In-stream BROADCAST-DIMENSION enrichment (the Flink broadcast-join
    pattern): every change envelope is annotated with its customer's
    market segment — dimension shipped ONCE via ray.put as sorted
    parallel arrays, attached per batch with a vectorized searchsorted,
    no shuffle join — then reduced to per-segment stream statistics.

    Output: (mktsegment, n_events, n_convs) — exact distinct convs via
    bounded (segment, conv) pair partials (|segments| x |convs| rows,
    orders below the event count).

    Scale shape: the dimension is the SMALL side (customers), the stream
    is the big side; a shuffle join here would move every envelope —
    the broadcast lookup moves only the dimension, once per actor.
    """
    import os as _os

    import ray
    import pyarrow.parquet as _pq

    from ..stages.taskmode import as_tasks

    cust = _pq.read_table(_os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_mktsegment"])
    order = pc.sort_indices(cust["c_custkey"])
    cust = cust.take(order).combine_chunks()
    dim_ref = ray.put((
        cust["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False),
        cust["c_mktsegment"].combine_chunks()))

    dml_ops = pa.array(["insert", "update", "delete"], pa.string())

    class Enrich:
        def __init__(self, ref):
            self.keys, self.segs = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            d = t.filter(pc.is_in(t["op"], value_set=dml_ops))
            if d.num_rows == 0:
                return pa.table({"mktsegment": pa.array([], pa.string()),
                                 "conv": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            after = d["after_values"]
            if isinstance(after, pa.ChunkedArray):
                after = after.combine_chunks()
            conv = pc.list_element(after, 0)
            is_del = pc.equal(d["op"], "delete")
            if pc.any(is_del).as_py():
                before = d["before_values"]
                if isinstance(before, pa.ChunkedArray):
                    before = before.combine_chunks()
                conv = pc.if_else(is_del, pc.list_element(before, 0), conv)
            uid = pc.cast(pc.utf8_slice_codeunits(conv, 1, 32),
                          pa.int64()).to_numpy(zero_copy_only=False)
            idx = pa.array(np.searchsorted(self.keys, uid))
            seg = self.segs.take(idx)
            g = pa.table({"mktsegment": seg, "conv": conv}) \
                .group_by(["mktsegment", "conv"]) \
                .aggregate([("conv", "count")])
            return pa.table({"mktsegment": g["mktsegment"],
                             "conv": g["conv"],
                             "n": pc.cast(g["conv_count"], pa.int64())})

    def per_segment(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame({
            "mktsegment": [g["mktsegment"].iloc[0]],
            "n_events": [np.int64(g["n"].sum())],
            "n_convs": [np.int64(g["conv"].nunique())]})

    return envelope_dataset(wal_dir) \
        .map_batches(as_tasks(Enrich, ref=dim_ref),
                     batch_format="pyarrow") \
        .groupby("mktsegment").map_groups(per_segment,
                                          batch_format="pandas")
