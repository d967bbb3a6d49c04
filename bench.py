"""Benchmark harness — headline CDC replay + analytics/operator suite.

Usage:
    python bench.py                  # full suite over $GRAFT_SF_DIR (sf0.1)
    python bench.py --scaling        # same headline job at 4 vs 16 pinned
                                     # cores in fresh processes; prints both
                                     # throughputs + scaling efficiency
    python bench.py --scaling --fair-share
                                     # fully-loaded-box variant: 8x4-core vs
                                     # 2x16-core concurrent jobs, median
                                     # per-job throughput (models N vs 4N
                                     # equally-busy nodes; see BASELINE.md)
    python bench.py --headline-only  # just the CDC replay (used by --scaling)

Prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

This script OWNS its Ray session (ray.init/shutdown) — the library never
does (driver contract).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline WAL shape: enough shards that decode parallelism can use the
# machine, few enough that each shard is a meaningful sequential log
N_SHARDS = 16
NUM_PARTITIONS = 32


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _wal_dir(sf_dir: str, mode: str, n_shards: int) -> str:
    key = hashlib.sha1(f"{os.path.abspath(sf_dir)}|{mode}|{n_shards}"
                       .encode()).hexdigest()[:12]
    return os.path.join("/tmp/pgwr_bench", f"wal-{mode}-{key}")


# scenario grid mirroring the reference's load tests (README.md:388-394,
# LOAD_TEST_COMPARISON.md): Baseline, Batch-5000 (5000-row txs),
# Payload-2KB (2 KiB text values), Mixed-DML (heavy update/delete mix)
WAL_SCENARIOS = {
    "baseline": dict(tx_rows=200),
    "batch5000": dict(tx_rows=5000),
    "payload2k": dict(tx_rows=200, payload_bytes=2048),
    "mixed": dict(tx_rows=200, update_frac=0.8, delete_frac=0.2),
    # with_binary mode (reference best-case config, LOAD_TEST_COMPARISON.md:10):
    # text column ships as 'b'-tagged raw bytes, decoded on the vectorized
    # fast path to the canonical hex text form
    "binary": dict(tx_rows=200, binary_text=True),
}


def _synthetic_wal(n_events: int, n_shards: int = 64,
                   scenario: str = "baseline") -> str:
    """Build (once) a WalSpec synthetic WAL with ~n_events DML events —
    the compute-dominated input for the scaling criterion (the sf-tied
    events WAL is too small to outgrow fixed pipeline overhead)."""
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    kw = dict(WAL_SCENARIOS[scenario])
    per_insert = 1 + kw.get("update_frac", 0.3) + kw.get("delete_frac", 0.05)
    n_convs = max(n_shards, int(n_events / (10 * per_insert)))
    wal = os.path.join("/tmp/pgwr_bench",
                       f"wal-synth-{scenario}-{n_events}-{n_shards}")
    if not os.path.exists(os.path.join(wal, "spec.json")):
        spec = WalSpec(n_convs=n_convs, turns_per_conv=10,
                       n_shards=n_shards, keepalive_every=512, **kw)
        write_wal_lake(spec, wal, parallel=True)
    return wal


def bench_wide20(n_rows: int = 1_000_000) -> dict:
    """Wide-20col scenario (reference README.md:392) through the generic
    table->WAL encoder + the multi-table router pipeline."""
    import numpy as np
    import pyarrow as pa

    from pg_walstream_ray.sources.tablegen import write_table_wal
    from pg_walstream_ray.pipelines.router import (TableRoute,
                                                   run_cdc_router)
    from pg_walstream_ray.wire import codec

    OID = 22001
    ncols = 20
    wal = os.path.join("/tmp/pgwr_bench", f"wal-wide20-{n_rows}")
    if not os.path.exists(os.path.join(wal, "shard=0000")):
        rel = codec.Relation(OID, "public", "wide", "d", [
            codec.ColumnInfo(1, "id", 20, -1),
            *[codec.ColumnInfo(0, f"c{i:02d}", 25, -1)
              for i in range(ncols - 1)],
        ])
        rng = np.random.default_rng(5)
        data = {"id": pa.array(np.arange(n_rows, dtype=np.int64))}
        vals = np.char.add("val-", rng.integers(
            0, 10_000, n_rows).astype(str))
        for i in range(ncols - 1):
            data[f"c{i:02d}"] = pa.array(np.roll(vals, i))
        write_table_wal(pa.table(data), rel, wal, tx_rows=500,
                        segment_rows=50_000)
    lake = tempfile.mkdtemp(prefix="pgwr_wide_")
    try:
        t0 = time.time()
        m = run_cdc_router(wal, [TableRoute(OID, lake, 32)])
        wall = time.time() - t0
        rows = m["tables"][OID]["rows_applied"]
        return {"sec": wall, "events_per_s": rows / wall,
                "rows_applied": rows, "lake_rows": rows}
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def bench_cdc_synthetic(n_events: int, scenario: str = "baseline") -> dict:
    """Timed CDC replay over the synthetic WAL (decode->apply only; WAL
    materialization is the stand-in for PostgreSQL and is cached)."""
    from pg_walstream_ray.pipelines.cdc import run_cdc

    wal = _synthetic_wal(n_events, scenario=scenario)
    best = None
    for _ in range(2):           # warmup + measure, keep the best — the
        lake = tempfile.mkdtemp(  # box's shared-infra noise swings +-40%
            prefix="pgwr_bench_lake_syn_")
        try:
            t0 = time.time()
            m = run_cdc(wal, lake, num_partitions=64)
            wall = time.time() - t0
            r = {"sec": wall, "events_per_s": m["rows_applied"] / wall,
                 "rows_applied": m["rows_applied"],
                 "lake_rows": m["lake_rows"]}
            if best is None or r["sec"] < best["sec"]:
                best = r
        finally:
            shutil.rmtree(lake, ignore_errors=True)
    return best


def bench_cdc_headline(sf_dir: str) -> dict:
    """Headline: events-derived upsert change stream -> pgoutput frames ->
    sharded decode -> partition -> exactly-once apply -> transcript lake.

    WAL materialization is the generator side (stand-in for PostgreSQL) and
    is cached/not timed; the timed section is the engine: decode->apply.
    """
    import ray

    from pg_walstream_ray.sources.events_cdc import build_wal_from_events
    from pg_walstream_ray.pipelines.cdc import run_cdc

    wal = _wal_dir(sf_dir, "upsert", N_SHARDS)
    needs_build = not os.path.exists(wal)
    build_wal_from_events(sf_dir, "upsert", wal, n_shards=N_SHARDS)
    if needs_build:
        # recycle the session: WAL materialization is the untimed generator
        # side (the PostgreSQL stand-in) and leaves the session hot with its
        # own workers/objects; measure the engine from a clean session
        # (reference methodology: warmup excluded, README.md:364)
        ray.shutdown()
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True)

    best = None
    for _ in range(2):           # warmup + measure; keep the best
        lake = tempfile.mkdtemp(prefix="pgwr_bench_lake_")
        try:
            t0 = time.time()
            m = run_cdc(wal, lake, num_partitions=NUM_PARTITIONS)
            wall = time.time() - t0
            r = {"sec": wall, "events_per_s": m["rows_applied"] / wall,
                 "rows_applied": m["rows_applied"],
                 "lake_rows": m["lake_rows"]}
            if best is None or r["sec"] < best["sec"]:
                best = r
        finally:
            shutil.rmtree(lake, ignore_errors=True)
    return best


def bench_lake_maintenance(n_events: int = 16_000_000) -> dict:
    """Incremental-sink surface: compaction, MV refresh (stale + no-op
    epoch-skip), and point lookups against a freshly replayed lake.

    The replay lands in two bounded windows (stop at the mid-shard LSN,
    then resume to the end) so every partition carries a 2-fragment
    chain — the post-change-window shape compact_lake exists for."""
    from pg_walstream_ray.lake import (compact_lake, lookup_key, read_mv,
                                       refresh_mv)
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import shard_lsn_base

    wal = _synthetic_wal(n_events, n_shards=64)
    lake = tempfile.mkdtemp(prefix="pgwr_bench_maint_")
    mv = tempfile.mkdtemp(prefix="pgwr_bench_mv_")
    try:
        run_cdc(wal, lake, num_partitions=64,
                stop_at_lsn=shard_lsn_base(32))     # window 1: shards 0-31
        m = run_cdc(wal, lake, num_partitions=64)   # window 2: the rest
        t0 = time.time()
        c = compact_lake(lake)
        t_compact = time.time() - t0
        t0 = time.time()
        r1 = refresh_mv(lake, mv)
        t_mv = time.time() - t0
        t0 = time.time()
        r2 = refresh_mv(lake, mv)                   # all epochs unchanged
        t_noop = time.time() - t0
        keys = read_mv(mv)["conv_id"].to_pylist()[:4096:256]  # 16 spread
        t0 = time.time()
        found = sum(lookup_key(lake, k).num_rows for k in keys)
        t_lookup = time.time() - t0
        assert found >= len(keys), "lookup_key missed replayed convs"
        assert r2["refreshed"] == 0, "no-op refresh recomputed partitions"
        return {
            "sec": round(t_compact + t_mv + t_noop + t_lookup, 3),
            "compact_sec": round(t_compact, 3),
            "partitions_compacted": c["partitions_compacted"],
            "mv_refresh_sec": round(t_mv, 3),
            "mv_partitions": r1["partitions"],
            "mv_noop_sec": round(t_noop, 3),
            "lookup_ms": round(1000 * t_lookup / max(len(keys), 1), 1),
            "lake_rows": m["lake_rows"],
        }
    finally:
        shutil.rmtree(lake, ignore_errors=True)
        shutil.rmtree(mv, ignore_errors=True)


def bench_streaming_sessions(n_events: int = 4_000_000) -> dict:
    """Sharded streaming sessionizer: same WAL at 2 vs 8 aggregator
    actors (verdict r2 item #2 done-criterion: session throughput must
    scale with actor count).  Best-of-2 per config."""
    from pg_walstream_ray.pipelines.streaming import stream_sessions

    wal = _synthetic_wal(n_events)
    out: dict = {}
    for n in (2, 8):
        best = None
        for _ in range(2):
            t0 = time.time()
            res = stream_sessions(wal, gap_us=1_000_000, n_actors=n)
            dt = time.time() - t0
            rows = res.result_table().num_rows
            if best is None or dt < best[0]:
                best = (dt, rows)
        out[f"sec_actors{n}"] = round(best[0], 3)
        out[f"events_per_s_actors{n}"] = round(n_events / best[0], 1)
        out["sessions"] = best[1]
    out["speedup_2_to_8"] = round(
        out["sec_actors2"] / out["sec_actors8"], 2)
    out["sec"] = out["sec_actors8"]
    return out


def bench_live_ann(n_events: int = 4_000_000) -> dict:
    """CDC-fed live ANN index tier: replay the synthetic WAL into the
    sharded mutable vector index (decode + hash-embed + route + LWW
    ingest) and answer a broadcast top-k from index state.  4 vs 8
    shards, best-of-2."""
    import numpy as np

    from pg_walstream_ray.pipelines.streaming import stream_ann_index

    wal = _synthetic_wal(n_events)
    qids = np.arange(4, dtype=np.int64)
    rng = np.random.default_rng(7)
    qv = rng.integers(-3, 4, size=(4, 16)).astype(np.int64)
    out: dict = {}
    for n in (4, 8):
        best = None
        for _ in range(2):
            t0 = time.time()
            res = stream_ann_index(wal, qids, qv, k=10, n_actors=n,
                                   hash_mode="fast")
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, res.num_rows)
        out[f"sec_shards{n}"] = round(best[0], 3)
        out[f"events_per_s_shards{n}"] = round(n_events / best[0], 1)
        out["topk_rows"] = best[1]
    out["sec"] = out["sec_shards8"]
    return out


def bench_streaming_windows(n_events: int = 4_000_000) -> dict:
    """Windowed streaming tier over the same synthetic WAL, 8 conv-routed
    aggregator actors: tumbling (exact distinct), hopping 2x overlap
    (exact), hopping with HLL distinct state (the fixed-4KiB/window
    100 TB shape).  Best-of-2 per config."""
    from pg_walstream_ray.pipelines.streaming import (
        stream_hopping_windows, stream_windows)
    from pg_walstream_ray.pipelines.streaming import stream_join \
        as _stream_join

    wal = _synthetic_wal(n_events)
    width = 1 << 20
    configs = {
        "tumbling": lambda: stream_windows(
            wal, width, n_sources=64, n_actors=8),
        "hopping2x": lambda: stream_hopping_windows(
            wal, 2 * width, width, n_sources=64, n_actors=8),
        "hopping2x_hll": lambda: stream_hopping_windows(
            wal, 2 * width, width, n_sources=64, n_actors=8,
            distinct_mode="approx"),
        "interval_join": lambda: _stream_join(
            wal, width // 4, n_actors=8),
        "quantiles": lambda: __import__(
            "pg_walstream_ray.pipelines.streaming",
            fromlist=["stream_window_quantiles"])
            .stream_window_quantiles(wal, width, n_sources=64, n_actors=8),
    }
    out: dict = {}
    for name, fn in configs.items():
        best = None
        for _ in range(2):
            t0 = time.time()
            res = fn()
            dt = time.time() - t0
            rows = res.result_table().num_rows
            if best is None or dt < best[0]:
                best = (dt, rows)
        out[f"sec_{name}"] = round(best[0], 3)
        out[f"events_per_s_{name}"] = round(n_events / best[0], 1)
        out[f"windows_{name}"] = best[1]
    out["sec"] = out["sec_hopping2x"]
    return out


def bench_graph_tier(n_nodes: int = 1_000_000, avg_deg: int = 8) -> dict:
    """Pregel-shard graph tier: PageRank (10 supersteps) and exact
    k-core decomposition over a deterministic synthetic power-law-ish
    graph (~n_nodes * avg_deg directed edges after symmetrization).
    Reports edges/s per PageRank superstep and total k-core wall — the
    throughput row for the iterative-graph engines, like the replay
    tier's events/s.  Best-of-2 per engine."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pg_walstream_ray.pipelines.dedup import (kcore_decomposition,
                                                  pagerank)

    n_edges = n_nodes * avg_deg // 2
    rng = np.random.default_rng(20_260_820)        # deterministic
    # preferential-attachment-ish: endpoint b drawn from sqrt-skewed ids
    a_ids = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    b_ids = (rng.random(n_edges) ** 2 * n_nodes).astype(np.int64)
    keep = a_ids != b_ids
    pairs_tab = pa.table({"vec_a": pa.array(a_ids[keep]),
                          "vec_b": pa.array(b_ids[keep])})
    ne = pairs_tab.num_rows
    out: dict = {"n_nodes": n_nodes, "n_edges": ne}
    for name, fn in (
            ("pagerank10", lambda: pagerank(
                rd.from_arrow(pairs_tab), iters=10)),
            ("kcore", lambda: kcore_decomposition(
                rd.from_arrow(pairs_tab)))):
        best = None
        for _ in range(2):
            t0 = time.time()
            rows = fn().count()
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, rows)
        out[f"sec_{name}"] = round(best[0], 3)
        out[f"rows_{name}"] = best[1]
    # 2x for symmetrization: each input pair is two directed edges/round
    out["pagerank_edges_per_s_per_superstep"] = round(
        2 * ne * 10 / out["sec_pagerank10"], 1)
    out["sec"] = out["sec_pagerank10"]
    return out


def _consume(res) -> int:
    """Materialize a query result minimally; return row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    total = 0
    for b in res.iter_batches(batch_format="pyarrow", batch_size=65536):
        total += b.num_rows
    return total


def bench_queries(sf_dir: str) -> dict:
    """Time every queries() entry that isn't a CDC-harness duplicate of the
    headline (those re-run the same engine stack at other modes).

    Best-of-2 per query, same as the scenario grid: the first execution of
    a pipeline in a session pays task-worker spin-up and page-cache warmup
    (measured 2-5x inflation on payload-heavy queries), which is a
    process-lifetime artifact, not engine throughput (BASELINE.md)."""
    import __ray_entry__ as e

    skip_prefix = "cdc_"   # headline already covers the CDC stack
    out = {}
    for name, fn in e.queries().items():
        if name.startswith(skip_prefix):
            continue
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = _consume(fn(sf_dir))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = {"sec": round(best, 3), "rows": n}

    # production-default hash mode (vectorized xxhash) for the content-hash
    # operators — the queries() entries above pin hash_mode='md5' so the
    # driver's SQL-oracle compare stays exact; these rows quantify the gap
    from pg_walstream_ray.pipelines import corpus, dedup, textops

    for name, fn in (
            ("dedup_exact_fast", dedup.exact_dedup),
            ("corpus_clean_fast", corpus.corpus_clean),
            ("doc_fingerprint_fast", textops.doc_fingerprint),
            ("doc_sample_fast", textops.doc_sample)):
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = _consume(fn(sf_dir))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = {"sec": round(best, 3), "rows": n}
    return out


def run_suite(sf_dir: str, headline_only: bool,
              synthetic_events: int = 0) -> dict:
    import ray

    objstore = os.environ.get("RAY_GRAFT_OBJSTORE_BYTES")
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True,
             **({"object_store_memory": int(objstore)} if objstore else {}))
    try:
        if synthetic_events:
            head = bench_cdc_synthetic(synthetic_events)
        else:
            head = bench_cdc_headline(sf_dir)
        queries = {"cdc_replay": round(head["sec"], 3)}
        extra = {}
        syn = None
        if not headline_only:
            q = bench_queries(sf_dir)
            queries.update({k: v["sec"] for k, v in q.items()})
            extra = {k: v["rows"] for k, v in q.items()}
            # throughput-regime headline: the sf-tied WAL (~100k events at
            # sf0.1) is constant-overhead-dominated, so also measure a 4M
            # DML-event synthetic replay (WAL generation cached, untimed)
            syn = bench_cdc_synthetic(4_000_000)
            queries["cdc_replay_synthetic4m"] = round(syn["sec"], 3)
            maint = bench_lake_maintenance(16_000_000)
            queries["compact_refresh_lookup"] = maint["sec"]
            strm = bench_streaming_sessions(4_000_000)
            queries["stream_sessions_sharded"] = strm["sec"]
            wnd = bench_streaming_windows(4_000_000)
            queries["stream_hopping_sharded"] = wnd["sec"]
            lann = bench_live_ann(4_000_000)
            queries["live_ann_indexed"] = lann["sec"]
            graph = bench_graph_tier()
            queries["graph_pagerank_4m_edges"] = graph["sec"]
        return {
            "metric": "cdc_replay_wall_sec (events applied/sec in events_per_s)",
            "value": round(head["sec"], 3),
            "unit": "sec",
            "queries": queries,
            "sf": _sf_of(sf_dir),
            "num_cpus": NUM_CPUS,
            "events_per_s": round(head["events_per_s"], 1),
            "rows_applied": head["rows_applied"],
            "lake_rows": head["lake_rows"],
            **({"synthetic_events_per_s": round(syn["events_per_s"], 1),
                "synthetic_rows_applied": syn["rows_applied"]}
               if syn else {}),
            **({"lake_maintenance": maint,
                "streaming_sessions": strm,
                "streaming_windows": wnd,
                "live_ann": lann,
                "graph_tier": graph} if not headline_only else {}),
            "rows_out": extra,
        }
    finally:
        ray.shutdown()


def run_scaling(sf_dir: str, low: int, high: int,
                synthetic_events: int = 16_000_000) -> dict:
    """Same CDC job at two parallelism levels in FRESH processes (sandbox
    stand-in for N vs 4N nodes; north_rule scaling criterion).

    Each run is PINNED to that many physical cores via taskset: an
    unpinned low-CPU run borrows the whole machine's memory bandwidth and
    under-reports scaling, while comparing against the fully saturated
    32-core box conflates per-node bandwidth with cluster scaling (real 4N
    nodes bring 4x bandwidth).  Defaults 4 vs 16 keep both runs inside the
    box's bandwidth envelope."""
    if synthetic_events:     # build once, in a throwaway session
        import ray

        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True)
        try:
            _synthetic_wal(synthetic_events)
        finally:
            ray.shutdown()
    results = {}
    # interleave the legs (low, high, low, high) and keep each leg's best:
    # the host's shared-infra noise comes in waves, so a single unlucky
    # window would otherwise poison one leg and randomize the ratio
    for cpus in (low, high, low, high):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir)
        cmd = [sys.executable, os.path.abspath(__file__), "--headline-only",
               "--synthetic-events", str(synthetic_events)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        p = subprocess.run(
            cmd,
            env=env, capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(f"scaling run cpus={cpus} failed:\n"
                               f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
        r = json.loads(line[-1])
        if cpus not in results or r["value"] < results[cpus]["value"]:
            results[cpus] = r
    thr_low = results[low]["events_per_s"]
    thr_high = results[high]["events_per_s"]
    eff = (thr_high / thr_low) / (high / low)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "low_cpus": low, "high_cpus": high,
        "throughput_low": round(thr_low, 1),
        "throughput_high": round(thr_high, 1),
        "sec_low": results[low]["value"],
        "sec_high": results[high]["value"],
        "queries": {f"cdc_replay_cpus{low}": results[low]["value"],
                    f"cdc_replay_cpus{high}": results[high]["value"]},
        "num_cpus": high,
    }


def run_scaling_fair(sf_dir: str, low: int, high: int,
                     synthetic_events: int = 16_000_000,
                     total: int = 0) -> dict:
    """Fair-share strong-scaling: the box is FULLY loaded in both configs
    with identical per-node jobs (total//cpus concurrent copies, each
    taskset-pinned to its own core range), and we compare per-job
    throughput at `high` vs `low` cores.

    Rationale: the idle-box pinned protocol (run_scaling) lets the low leg
    borrow the whole machine's DRAM bandwidth — measured ~1.7x per-core
    advantage for a 4-core leg once the decode path went
    memory-bandwidth-bound — so it UNDERSTATES scaling exactly when the
    engine is fastest.  On a real cluster every node brings its own memory
    bus and every node is busy; loading all 32 cores in both configs gives
    each job a bandwidth share proportional to its cores, which is the
    honest single-box analogue of N vs 4N equally-busy nodes.  Per-config
    aggregation is the MEDIAN job (robust to end-of-config stragglers
    running briefly uncontended)."""
    import statistics

    total = total or os.cpu_count() or 32
    if synthetic_events:     # build once, in a throwaway session
        import ray

        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True)
        try:
            _synthetic_wal(synthetic_events)
        finally:
            ray.shutdown()
    # fixed object-store pool split proportionally so 8 concurrent Ray
    # instances cannot OOM the box (default 30%-of-RAM each would)
    POOL = 48 << 30
    results: dict[int, dict] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for cpus in (low, high, low, high):   # interleave vs noise waves
        n_jobs = total // cpus
        procs = []
        for i in range(n_jobs):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                       GRAFT_SF_DIR=sf_dir,
                       RAY_GRAFT_OBJSTORE_BYTES=str(POOL * cpus // total))
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--headline-only",
                   "--synthetic-events", str(synthetic_events)]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c",
                       f"{i * cpus}-{(i + 1) * cpus - 1}"] + cmd
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, text=True, cwd=here))
        thrs = []
        for p in procs:
            out, _ = p.communicate(timeout=3600)
            line = [l for l in out.splitlines() if l.startswith("{")]
            if line:
                thrs.append(json.loads(line[-1])["events_per_s"])
        if len(thrs) < max(1, n_jobs // 2 + 1):
            raise RuntimeError(
                f"fair-share config cpus={cpus}: only {len(thrs)}/{n_jobs} "
                f"jobs returned a result")
        med = statistics.median(thrs)
        if cpus not in results or med > results[cpus]["per_job"]:
            results[cpus] = {"per_job": med,
                             "jobs": sorted(round(t, 1) for t in thrs)}
    eff = (results[high]["per_job"] / results[low]["per_job"]) / (high / low)
    return {
        "metric": "scaling_efficiency_fair_share",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "low_cpus": low, "high_cpus": high, "total_cpus": total,
        "jobs_low": total // low, "jobs_high": total // high,
        "per_job_low": round(results[low]["per_job"], 1),
        "per_job_high": round(results[high]["per_job"], 1),
        "all_jobs_low": results[low]["jobs"],
        "all_jobs_high": results[high]["jobs"],
        "queries": {f"per_job_ev_s_cpus{low}": results[low]["per_job"],
                    f"per_job_ev_s_cpus{high}": results[high]["per_job"]},
        "num_cpus": total,
    }


# queries kept in the final stdout line (the driver's tail capture is the
# LAST 2000 chars of stdout: round 2's full per-query line outgrew it and
# parsed as null — the full maps now live in BENCH_full.json + stderr)
_HEADLINE_QUERIES = (
    "cdc_replay", "cdc_replay_synthetic4m", "q1_pricing_summary",
    "q5_local_supplier", "q3_top_unshipped", "corpus_clean", "dedup_exact",
    "dedup_minhash_lsh", "dup_span_removal", "dedup_clusters",
    "semantic_dedup", "tfidf_top_terms", "ann_brute_topk", "pack_sequences",
    "events_window_functions", "compact_refresh_lookup",
    "stream_sessions_sharded",
)
_FINAL_LINE_BUDGET = 1600


def _emit(out: dict, fname_override: str = "") -> None:
    """Print the result with the driver's tail-capture contract: the final
    stdout line is ONE compact JSON object guaranteed to fit in the last
    2000 captured chars.  The untrimmed result (all per-query timings +
    row counts) is written to BENCH_full.json next to this script and
    echoed to stderr."""
    full = json.dumps(out)
    # Side-run outputs (scaling samples, scenario grids) get their own
    # files so they never clobber the full-suite grid in BENCH_full.json.
    metric = str(out.get("metric", ""))
    if fname_override:
        fname = fname_override
    elif metric.startswith("scaling_efficiency"):
        fname = "BENCH_scaling.json"
    elif metric.startswith("scenario_grid"):
        fname = "BENCH_scenarios.json"
    else:
        fname = "BENCH_full.json"
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            fname)
        with open(path, "w") as f:
            f.write(full + "\n")
    except OSError:
        pass
    print(full, file=sys.stderr)

    slim = dict(out)
    slim.pop("rows_out", None)
    q = slim.get("queries")
    if isinstance(q, dict):
        slim["suite_sec_total"] = round(sum(q.values()), 3)
        slim["n_queries_timed"] = len(q)
    line = json.dumps(slim, separators=(",", ":"))
    if len(line) > _FINAL_LINE_BUDGET and isinstance(q, dict):
        slim["queries"] = {k: v for k, v in q.items()
                           if k in _HEADLINE_QUERIES}
        line = json.dumps(slim, separators=(",", ":"))
    for k in ("lake_maintenance", "streaming_sessions"):
        if len(line) > _FINAL_LINE_BUDGET and k in slim:
            slim.pop(k)                 # survives in BENCH_full.json
            line = json.dumps(slim, separators=(",", ":"))
    while len(line) > _FINAL_LINE_BUDGET and slim.get("queries"):
        slim["queries"].popitem()
        line = json.dumps(slim, separators=(",", ":"))
    sys.stdout.flush()
    print(line, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--fair-share", action="store_true",
                    help="with --scaling: fully load the box in both "
                         "configs (total//cpus concurrent pinned jobs) and "
                         "compare median per-job throughput — models N vs "
                         "4N equally-busy nodes with private bandwidth")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--synthetic-events", type=int, default=0,
                    help="CDC headline over a WalSpec synthetic WAL of ~N "
                         "DML events instead of the sf events table")
    ap.add_argument("--scenario-grid", action="store_true",
                    help="run the reference's load-test scenario grid "
                         "(baseline/batch5000/payload2k/mixed) at "
                         "--synthetic-events scale")
    args = ap.parse_args()

    if args.scenario_grid:
        import ray

        n = args.synthetic_events or 4_000_000
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True)
        try:
            out = {"metric": "scenario_grid_events_per_s", "unit": "ev/s",
                   "num_cpus": NUM_CPUS, "events": n, "queries": {},
                   "value": 0.0, "sf": -1.0}
            # best-of-2 per scenario: the first run pays task-worker +
            # page-cache warmup (the reference's own protocol is 10 s
            # warmup + 30 s measure, README.md:364 — warm is the fair
            # comparison)
            for sc in WAL_SCENARIOS:
                r = min((bench_cdc_synthetic(n, scenario=sc)
                         for _ in range(2)), key=lambda x: x["sec"])
                out["queries"][sc] = round(r["sec"], 3)
                out[f"{sc}_events_per_s"] = round(r["events_per_s"], 1)
            r = min((bench_wide20(min(n // 4, 1_000_000))
                     for _ in range(2)), key=lambda x: x["sec"])
            out["queries"]["wide20"] = round(r["sec"], 3)
            out["wide20_events_per_s"] = round(r["events_per_s"], 1)
            out["value"] = out["queries"]["baseline"]
            out["unit"] = "sec"
        finally:
            ray.shutdown()
        _emit(out)
        return

    if args.scaling:
        fn = run_scaling_fair if args.fair_share else run_scaling
        out = fn(args.sf_dir, args.low, args.high,
                 synthetic_events=args.synthetic_events
                 or 16_000_000)
    else:
        out = run_suite(args.sf_dir, args.headline_only,
                        synthetic_events=args.synthetic_events)
    # headline-only / synthetic side-runs must not clobber the
    # full-suite per-query grid in BENCH_full.json
    partial = args.headline_only or bool(args.synthetic_events)
    _emit(out, fname_override="BENCH_headline.json" if partial else "")


if __name__ == "__main__":
    main()
