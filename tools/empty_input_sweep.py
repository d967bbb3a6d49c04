"""Robustness sweep: run every queries() entry over an EMPTY scale-factor
directory (all ten tables present with the sf schemas but 0 rows).

At 100 TB empty BLOCKS are routine; empty TABLES appear in backfills,
filtered reads and dev runs — operators must degrade to an empty (or
sensible constant) result, never raise.  Usage:

    python tools/empty_input_sweep.py            # prints PASS/FAIL per query
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def make_empty_sf() -> str:
    d = tempfile.mkdtemp(prefix="sf_empty_")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(d, f"{t}.parquet"))
    return d


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import pandas as pd

    import __ray_entry__ as e

    sf = make_empty_sf()
    bad = []
    for name, fn in e.queries().items():
        try:
            res = fn(sf)
            df = res if isinstance(res, (pd.DataFrame, pa.Table)) \
                else res.to_pandas()
            n = len(df) if not isinstance(df, pa.Table) else df.num_rows
            print(f"PASS {name:32s} rows={n}", flush=True)
        except Exception:  # noqa: BLE001
            bad.append(name)
            tb = traceback.format_exc().strip().splitlines()
            print(f"FAIL {name:32s} {tb[-1]}", flush=True)
    print(json.dumps({"failed": bad}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
