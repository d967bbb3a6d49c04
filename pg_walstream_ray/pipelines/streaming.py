"""Streaming windowed aggregation over the CDC tap with per-source
watermarks — the stateful stream-processing primitive the Dataset API
cannot express (brief: "a streaming window" belongs in the
actor/stateful-consumer tier).

Semantics (standard event-stream windowing):
  - tumbling windows of ``width_us`` over COMMIT time (``commit_ts_us``)
    — commit time is MONOTONE per source (a WAL is commit-ordered), which
    is what makes watermarks exact rather than heuristic;
  - per-source watermark = max commit_ts seen from that source; the
    GLOBAL watermark is the min across all declared sources (same
    vector-min rule as the lake's applied-LSN watermark);
  - a window finalizes (emits, state freed) when
    ``global_watermark >= window_end + allowed_lateness`` — so open-state
    is bounded by source skew + lateness, never by stream length;
  - rows older than an already-finalized window are LATE: counted and
    dropped (``late_dropped``), exactly the Beam/Flink allowed-lateness
    contract.

The aggregator is a plain driver/actor-side object fed from
``events.poll_envelopes`` (or any envelope batch source).  Per-window
state here is (count, distinct-conv set); at 100 TB the set swaps for
the mergeable HLL sketch in ``pipelines/sketches.py`` and one aggregator
runs per key-range (the envelope stream is already hash-partitionable by
conv) — the windowing logic is unchanged.

Reference parity note: the reference hands consumers a commit-ordered
event stream and leaves windowing to them (safe-transaction-consumer
pattern); this module is that consumer, expressed once, reusable.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DML_OPS = pa.array(["insert", "update", "delete"], pa.string())


class TumblingWindowAggregator:
    """Exact tumbling-window counts + distinct-conversation counts."""

    def __init__(self, width_us: int, sources: Iterable[int],
                 lateness_us: int = 0):
        self.width = int(width_us)
        self.late = int(lateness_us)
        self.wm: Dict[int, int] = {int(s): -1 for s in sources}
        self.open: Dict[int, list] = {}        # start -> [n, conv_set]
        self.closed_before = -1                # windows ending <= this are final
        self.late_dropped = 0
        self.emitted: List[dict] = []

    def _global_watermark(self) -> int:
        return min(self.wm.values())

    def ingest(self, batch: pa.Table) -> List[dict]:
        """Feed one envelope batch; returns windows finalized by it."""
        dml = batch.filter(pc.is_in(batch["op"], value_set=DML_OPS))
        if dml.num_rows:
            cts = dml["commit_ts_us"].to_numpy(zero_copy_only=False)
            src = dml["source"].to_numpy(zero_copy_only=False)
            # conversation key = tuple column 0 (the relation's first
            # column); deletes carry only the before(key) tuple
            after = pc.list_element(dml["after_values"].combine_chunks()
                                    if isinstance(dml["after_values"],
                                                  pa.ChunkedArray)
                                    else dml["after_values"], 0)
            is_del = pc.equal(dml["op"], "delete")
            if pc.any(is_del).as_py():
                before = pc.list_element(
                    dml["before_values"].combine_chunks()
                    if isinstance(dml["before_values"], pa.ChunkedArray)
                    else dml["before_values"], 0)
                after = pc.if_else(is_del, before, after)
            conv = after.to_pylist()
            starts = cts - cts % self.width
            for s, w, c in zip(src.tolist(), starts.tolist(), conv):
                # a row whose window already finalized is, by
                # construction, beyond the allowed lateness
                if w + self.width - 1 <= self.closed_before:
                    self.late_dropped += 1
                    continue
                st = self.open.get(w)
                if st is None:
                    st = [0, set()]
                    self.open[w] = st
                st[0] += 1
                st[1].add(c)
            for s in np.unique(src):
                m = int(cts[src == s].max())
                if m > self.wm.get(int(s), -1):
                    self.wm[int(s)] = m
        return self._advance()

    def _advance(self) -> List[dict]:
        gw = self._global_watermark()
        out = []
        for w in sorted(self.open):
            if w + self.width + self.late <= gw:
                n, convs = self.open.pop(w)
                out.append({"window_start_us": w, "n_events": n,
                            "n_convs": len(convs)})
                self.closed_before = max(self.closed_before,
                                         w + self.width - 1)
        self.emitted.extend(out)
        return out

    def flush(self) -> List[dict]:
        """End of stream: finalize every open window."""
        out = [{"window_start_us": w, "n_events": st[0],
                "n_convs": len(st[1])}
               for w, st in sorted(self.open.items())]
        self.open.clear()
        self.emitted.extend(out)
        return out

    def result_table(self) -> pa.Table:
        rows = sorted(self.emitted, key=lambda r: r["window_start_us"])
        return pa.table({
            "window_start_us": pa.array(
                [r["window_start_us"] for r in rows], pa.int64()),
            "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
            "n_convs": pa.array([r["n_convs"] for r in rows], pa.int64()),
        })


def stream_windows(wal_dir: str, width_us: int, n_sources: int,
                   lateness_us: int = 0,
                   batch_size: int = 8192) -> TumblingWindowAggregator:
    """Consume a WAL dir through the polling tap into a windowed
    aggregate; returns the aggregator (emitted windows + late count)."""
    from .events import poll_envelopes

    agg = TumblingWindowAggregator(width_us, range(n_sources), lateness_us)
    for batch in poll_envelopes(wal_dir, batch_size=batch_size):
        agg.ingest(batch)
    agg.flush()
    return agg


class StreamSessionizer:
    """Streaming SESSION windows (gap-close) over the CDC tap: a
    conversation's session ends when no event arrives for ``gap_us`` of
    commit time.

    Watermark rule: a conversation lives entirely in ONE source (the
    engine's shard-disjointness invariant), so its sessions close against
    THAT source's watermark alone — no cross-source min, which means one
    slow slot never delays another slot's session output (a strictly
    better bound than the tumbling aggregator's global min, available
    precisely because the key->source affinity holds).
    """

    def __init__(self, gap_us: int):
        self.gap = int(gap_us)
        self.wm: Dict[int, int] = {}
        # conv -> [source, start, last, n]
        self.open: Dict[str, list] = {}
        self.emitted: List[dict] = []

    def ingest(self, batch: pa.Table) -> List[dict]:
        dml = batch.filter(pc.is_in(batch["op"], value_set=DML_OPS))
        if dml.num_rows:
            cts = dml["commit_ts_us"].to_numpy(zero_copy_only=False)
            src = dml["source"].to_numpy(zero_copy_only=False)
            after = dml["after_values"]
            if isinstance(after, pa.ChunkedArray):
                after = after.combine_chunks()
            conv = pc.list_element(after, 0).to_pylist()
            for s, t, c in zip(src.tolist(), cts.tolist(), conv):
                st = self.open.get(c)
                if st is None:
                    self.open[c] = [s, t, t, 1]
                elif t - st[2] > self.gap:      # gap exceeded: new session
                    self._emit(c, st)
                    self.open[c] = [s, t, t, 1]
                else:
                    st[2] = max(st[2], t)
                    st[3] += 1
            for s in np.unique(src):
                m = int(cts[src == s].max())
                if m > self.wm.get(int(s), -1):
                    self.wm[int(s)] = m
        return self._advance()

    def _emit(self, conv: str, st: list) -> None:
        self.emitted.append({"conv_id": conv, "session_start_us": st[1],
                             "session_end_us": st[2], "n_events": st[3]})

    def _advance(self) -> List[dict]:
        before = len(self.emitted)
        for c in [c for c, st in self.open.items()
                  if self.wm.get(st[0], -1) > st[2] + self.gap]:
            self._emit(c, self.open.pop(c))
        return self.emitted[before:]

    def flush(self) -> List[dict]:
        before = len(self.emitted)
        for c in sorted(self.open):
            self._emit(c, self.open.pop(c))
        return self.emitted[before:]

    def result_table(self) -> pa.Table:
        rows = sorted(self.emitted,
                      key=lambda r: (r["conv_id"], r["session_start_us"]))
        return pa.table({
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "session_start_us": pa.array(
                [r["session_start_us"] for r in rows], pa.int64()),
            "session_end_us": pa.array(
                [r["session_end_us"] for r in rows], pa.int64()),
            "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
        })


def stream_sessions(wal_dir: str, gap_us: int,
                    batch_size: int = 8192) -> StreamSessionizer:
    """Consume a WAL dir through the polling tap into session windows."""
    from .events import poll_envelopes

    agg = StreamSessionizer(gap_us)
    for batch in poll_envelopes(wal_dir, batch_size=batch_size):
        agg.ingest(batch)
    agg.flush()
    return agg
