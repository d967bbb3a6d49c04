"""Shared test helpers: run the full pipeline on a WalSpec and compare the
lake snapshot with the sequential oracle."""

import tempfile

import pandas as pd
import pyarrow as pa

from pg_walstream_ray import lake as lakemod
from pg_walstream_ray.pipelines.cdc import run_cdc
from pg_walstream_ray.sources import walgen


def make_wal(spec: walgen.WalSpec, parallel: bool = False) -> str:
    wal = tempfile.mkdtemp(prefix="wal_")
    walgen.write_wal_lake(spec, wal, parallel=parallel)
    return wal


def oracle_df(spec: walgen.WalSpec, stop_lsn=None) -> pd.DataFrame:
    logs = [walgen.shard_logical_changes(spec, s) for s in range(spec.n_shards)]
    t = walgen.replay_oracle(logs, stop_lsn=stop_lsn)
    return normalize(t)


def normalize(t) -> pd.DataFrame:
    df = t.to_pandas() if isinstance(t, pa.Table) else t
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return df[sorted(df.columns)]


def assert_lake_matches(lake_dir: str, expected: pd.DataFrame) -> None:
    raw = lakemod.snapshot_table(lake_dir)
    if raw.num_rows == 0 and len(expected) == 0:
        return      # vacuously equal (e.g. every transaction aborted);
                    # an empty lake has no fragments, hence no schema
    snap = normalize(raw)
    common = [c for c in expected.columns if c in snap.columns]
    assert common, "no common columns between snapshot and oracle"
    pd.testing.assert_frame_equal(snap[common], expected[common],
                                  check_dtype=False)


def run_and_check(spec: walgen.WalSpec, num_partitions: int = 4,
                  **cdc_kwargs) -> str:
    wal = make_wal(spec)
    lk = tempfile.mkdtemp(prefix="lake_")
    run_cdc(wal, lk, num_partitions=num_partitions, **cdc_kwargs)
    assert_lake_matches(lk, oracle_df(spec, stop_lsn=cdc_kwargs.get("stop_at_lsn")))
    return lk
