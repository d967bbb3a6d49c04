"""Driver-emulation correctness check: run every `queries()` entry that has
an `oracle_sql()` entry at a given scale factor, compare against DuckDB the
way the driver does — row count, sorted-by-name schema, and a
dtype-sensitive value hash (the driver's hash distinguishes int 5 from
float 5.0, which is what bit `events_asof_join` in round 1).

Usage:  python tools/check_correctness.py [--sf /root/testdata/sf0.01]
                                          [--only name1,name2] [-v]
Prints one line per query and a JSON summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()          # ray Dataset


def _canon_cell(v) -> str:
    """Dtype-sensitive canonical repr: int 5 != float 5.0 (mimics the
    driver's value hash, which caught the round-1 asof Int64-vs-float64
    artifact)."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "\x00NULL"
    if isinstance(v, (np.floating, float)):
        return f"f:{float(v)!r}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"i:{int(v)}"
    if isinstance(v, (np.bool_, bool)):
        return f"b:{bool(v)}"
    if isinstance(v, bytes):
        return "y:" + v.hex()
    if isinstance(v, np.ndarray):
        return "l:[" + ",".join(_canon_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "l:[" + ",".join(_canon_cell(x) for x in v) + "]"
    return "s:" + str(v)


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append("\x01".join(_canon_cell(v) for v in tup))
    rows.sort()
    return hashlib.md5("\x02".join(rows).encode()).hexdigest()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    names = [n for n in queries if n in oracles]
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    results, bad = {}, []
    for name in names:
        t0 = time.time()
        try:
            got = _to_df(queries[name](args.sf))
            con = _duck(args.sf)
            want = con.execute(oracles[name]).fetchdf()
            con.close()
            rows_ok = len(got) == len(want)
            schema_ok = sorted(got.columns) == sorted(want.columns)
            hash_ok = rows_ok and schema_ok and \
                _value_hash(got) == _value_hash(want)
            results[name] = {"rows": rows_ok, "schema": schema_ok,
                             "hash": hash_ok, "n": len(got),
                             "oracle_n": len(want),
                             "sec": round(time.time() - t0, 2)}
            ok = rows_ok and schema_ok and hash_ok
            if not ok:
                bad.append(name)
                if args.verbose:
                    g = got[sorted(got.columns)]
                    w = want[sorted(want.columns)]
                    print(f"--- {name} dtypes ray vs oracle:")
                    for c in sorted(set(g.columns) | set(w.columns)):
                        gd = g[c].dtype if c in g else "MISSING"
                        wd = w[c].dtype if c in w else "MISSING"
                        mark = "" if str(gd) == str(wd) else "   <-- differs"
                        print(f"    {c}: {gd} vs {wd}{mark}")
            status = "OK " if ok else "FAIL"
            print(f"{status} {name:32s} rows={len(got):>7} "
                  f"({results[name]['sec']}s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": f"{type(ex).__name__}: {ex}"}
            bad.append(name)
            print(f"ERR  {name:32s} {type(ex).__name__}: {ex}", flush=True)

    print(json.dumps({"checked": len(names), "failed": bad}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
