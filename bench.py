"""Benchmark harness — headline CDC replay + analytics/operator suite.

Usage:
    python bench.py                  # full suite over $GRAFT_SF_DIR (sf0.1)
    python bench.py --scaling        # same headline job at 8 vs 32 CPUs in
                                     # fresh processes; prints both
                                     # throughputs + scaling efficiency
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


def bench_cdc_headline(sf_dir: str) -> dict:
    """Headline: events-derived upsert change stream -> pgoutput frames ->
    sharded decode -> partition -> exactly-once apply -> transcript lake.

    WAL materialization is the generator side (stand-in for PostgreSQL) and
    is cached/not timed; the timed section is the engine: decode->apply.
    """
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events
    from pg_walstream_ray.pipelines.cdc import run_cdc

    wal = _wal_dir(sf_dir, "upsert", N_SHARDS)
    build_wal_from_events(sf_dir, "upsert", wal, n_shards=N_SHARDS)

    lake = tempfile.mkdtemp(prefix="pgwr_bench_lake_")
    try:
        t0 = time.time()
        m = run_cdc(wal, lake, num_partitions=NUM_PARTITIONS)
        wall = time.time() - t0
        return {"sec": wall, "events_per_s": m["rows_applied"] / wall,
                "rows_applied": m["rows_applied"],
                "lake_rows": m["lake_rows"]}
    finally:
        shutil.rmtree(lake, ignore_errors=True)


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
    headline (those re-run the same engine stack at other modes)."""
    import __ray_entry__ as e

    skip_prefix = "cdc_"   # headline already covers the CDC stack
    out = {}
    for name, fn in e.queries().items():
        if name.startswith(skip_prefix):
            continue
        t0 = time.time()
        n = _consume(fn(sf_dir))
        out[name] = {"sec": round(time.time() - t0, 3), "rows": n}
    return out


def run_suite(sf_dir: str, headline_only: bool) -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True)
    try:
        head = bench_cdc_headline(sf_dir)
        queries = {"cdc_replay": round(head["sec"], 3)}
        extra = {}
        if not headline_only:
            q = bench_queries(sf_dir)
            queries.update({k: v["sec"] for k, v in q.items()})
            extra = {k: v["rows"] for k, v in q.items()}
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
            "rows_out": extra,
        }
    finally:
        ray.shutdown()


def run_scaling(sf_dir: str, low: int, high: int) -> dict:
    """Same headline job at two parallelism levels in FRESH processes
    (sandbox stand-in for N vs 4N nodes; north_rule scaling criterion)."""
    # pre-build the WAL once so both runs time only the engine
    results = {}
    for cpus in (low, high):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(f"scaling run cpus={cpus} failed:\n"
                               f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
        results[cpus] = json.loads(line[-1])
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    if args.scaling:
        out = run_scaling(args.sf_dir, args.low, args.high)
    else:
        out = run_suite(args.sf_dir, args.headline_only)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
