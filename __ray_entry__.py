"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline on sf0.001; ``queries()`` exposes
each implemented operator/pipeline (SURVEY.md §2) as a callable over an
``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (the driver compares row-count + schema +
order-insensitive value-hash at sf=0.01).

The CDC queries exercise the FULL engine stack — deterministic change
derivation from the ``events`` table -> pgoutput frame encoding -> sharded
sequential decode -> typed projection -> hash partitioning -> exactly-once
per-partition upsert apply -> lake snapshot — and the SQL oracle recomputes
the same final table with window functions (see
pg_walstream_ray/sources/events_cdc.py for the derivation rules).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any, Optional

# ---------------------------------------------------------------------------
# CDC query harness
# ---------------------------------------------------------------------------

_CDC_TMP_ROOT = "/tmp/pgwr_cdc"


def _cdc_run(sf_dir: str, mode: str, n_shards: int = 2,
             stop_at_lsn: Optional[int] = None,
             extra_cols: tuple = ()) -> Any:
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.lake import snapshot_table

    key = hashlib.sha1(f"{os.path.abspath(sf_dir)}|{mode}|{n_shards}"
                       .encode()).hexdigest()[:12]
    wal_dir = os.path.join(_CDC_TMP_ROOT, f"wal-{mode}-{key}")
    build_wal_from_events(sf_dir, mode, wal_dir, n_shards=n_shards)
    lake_dir = tempfile.mkdtemp(prefix=f"pgwr_lake_{mode}_")
    try:
        run_cdc(wal_dir, lake_dir, num_partitions=8, stop_at_lsn=stop_at_lsn)
        snap = snapshot_table(lake_dir)
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                *extra_cols]
        return snap.select([c for c in cols if c in snap.column_names])
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)


# SQL building blocks shared by the CDC oracles (must mirror
# events_cdc.derive_changes exactly)
_ROLE_SQL = ("CASE event_type WHEN 'signup' THEN 'system' "
             "WHEN 'click' THEN 'user' WHEN 'purchase' THEN 'assistant' "
             "WHEN 'error' THEN 'tool' ELSE 'user' END")
_TEXT_SQL = "'e' || CAST(event_id AS VARCHAR) || ':' || props"
_TOOL_SQL = ("CASE WHEN event_type='error' THEN 'tool' || "
             "CAST(event_id % 7 AS VARCHAR) ELSE NULL END")
_CONV_SQL = "'c' || CAST(user_id AS VARCHAR)"

_UPSERT_CHANGES = f"""
  SELECT event_id * 4 + 4 AS lsn,
         {_CONV_SQL} AS conv_id,
         CAST(event_id % 13 AS INTEGER) AS turn_idx,
         CASE WHEN event_type IN ('signup','view') THEN 'insert'
              ELSE 'update' END AS op,
         {_ROLE_SQL} AS role,
         {_TEXT_SQL} AS text,
         {_TOOL_SQL} AS tool,
         ts, event_id, event_type
  FROM events
"""

_LWW = """
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY lsn DESC) AS rn
  FROM changes
"""


def entry() -> Any:
    """Flagship: full CDC replay of the sf0.001 events-derived change stream
    into a transcript lake; returns the final table."""
    return _cdc_run("/root/testdata/sf0.001", "upsert", n_shards=2)


def queries() -> dict[str, Callable[[str], Any]]:
    from pg_walstream_ray.pipelines import analytics
    from pg_walstream_ray.sources.events_cdc import (BOUNDED_STOP_EVENT,
                                                     TRUNCATE_AFTER)

    q: dict[str, Callable[[str], Any]] = {}

    # -- CDC core (full stack, SQL-oracled) --------------------------------
    q["cdc_insert_only"] = lambda sf: _cdc_run(sf, "insert_only")
    q["cdc_upsert_lww"] = lambda sf: _cdc_run(sf, "upsert")
    q["cdc_upsert_delete"] = lambda sf: _cdc_run(sf, "upsert_delete")
    q["cdc_toast_carry"] = lambda sf: _cdc_run(sf, "toast")
    q["cdc_truncate"] = lambda sf: _cdc_run(sf, "truncate", n_shards=1)
    q["cdc_bounded_replay"] = lambda sf: _cdc_run(
        sf, "upsert", n_shards=1,
        stop_at_lsn=BOUNDED_STOP_EVENT * 4 + 5)
    q["cdc_schema_evolution"] = lambda sf: _cdc_run(
        sf, "evolve", extra_cols=("score",))

    # -- analytics / windowed aggregates -----------------------------------
    q["q1_pricing_summary"] = analytics.q1_pricing_summary
    q["customer_order_totals"] = analytics.customer_order_totals
    q["events_sessionize"] = analytics.sessionize_events
    q["events_hourly"] = analytics.hourly_event_stats

    return q


def oracle_sql() -> dict[str, str]:
    from pg_walstream_ray.sources.events_cdc import (BOUNDED_STOP_EVENT,
                                                     EVOLVE_AT,
                                                     TRUNCATE_AFTER, TX_ROWS)

    sql: dict[str, str] = {}

    sql["cdc_insert_only"] = f"""
      SELECT {_CONV_SQL} AS conv_id,
             CAST(event_id AS INTEGER) AS turn_idx,
             {_ROLE_SQL} AS role,
             {_TEXT_SQL} AS text,
             {_TOOL_SQL} AS tool,
             ts
      FROM events
    """

    sql["cdc_upsert_lww"] = f"""
      WITH changes AS ({_UPSERT_CHANGES}), ranked AS ({_LWW})
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1
    """

    sql["cdc_upsert_delete"] = f"""
      WITH changes AS (
        SELECT lsn, conv_id, turn_idx,
               CASE WHEN event_type = 'error' THEN 'delete' ELSE op END AS op,
               CASE WHEN event_type = 'error' THEN NULL ELSE role END AS role,
               CASE WHEN event_type = 'error' THEN NULL ELSE text END AS text,
               CASE WHEN event_type = 'error' THEN NULL ELSE tool END AS tool,
               ts
        FROM ({_UPSERT_CHANGES})
      ), ranked AS ({_LWW})
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'delete'
    """

    # TOAST: click updates carry text as unchanged -> NULL in changes; the
    # applied value is the most recent prior set value per key
    sql["cdc_toast_carry"] = f"""
      WITH changes AS (
        SELECT lsn, conv_id, turn_idx, op, role,
               CASE WHEN event_type = 'click' THEN NULL ELSE text END AS text,
               tool, ts
        FROM ({_UPSERT_CHANGES})
      ), filled AS (
        SELECT *,
               LAST_VALUE(text IGNORE NULLS) OVER (
                 PARTITION BY conv_id, turn_idx ORDER BY lsn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS text_f,
               ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                  ORDER BY lsn DESC) AS rn
        FROM changes
      )
      SELECT conv_id, turn_idx, role, text_f AS text, tool, ts
      FROM filled WHERE rn = 1
    """

    trunc_lsn = TRUNCATE_AFTER * 4 + 2
    sql["cdc_truncate"] = f"""
      WITH changes AS ({_UPSERT_CHANGES}), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY lsn DESC) AS rn
        FROM changes WHERE lsn > {trunc_lsn}
      )
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1
    """

    # bounded replay: stop target lands inside transaction
    # floor(event_id/TX_ROWS) == BOUNDED_STOP_EVENT//TX_ROWS; that tx is
    # delivered in full, nothing after -> event_id < (tx+1)*TX_ROWS
    bound = (BOUNDED_STOP_EVENT // TX_ROWS + 1) * TX_ROWS
    sql["cdc_bounded_replay"] = f"""
      WITH changes AS ({_UPSERT_CHANGES}), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY lsn DESC) AS rn
        FROM changes WHERE event_id < {bound}
      )
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1
    """

    sql["cdc_schema_evolution"] = f"""
      WITH changes AS (
        SELECT *, CASE WHEN event_id >= {EVOLVE_AT}
                       THEN CAST((event_id % 13) % 5 AS INTEGER) END AS score
        FROM ({_UPSERT_CHANGES})
      ), ranked AS ({_LWW})
      SELECT conv_id, turn_idx, role, text, tool, ts, score
      FROM ranked WHERE rn = 1
    """

    sql["q1_pricing_summary"] = """
      SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
             ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
             ROUND(SUM(l_discount) / COUNT(*), 4) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """

    sql["customer_order_totals"] = """
      SELECT c.c_custkey, c.c_name, c.c_mktsegment,
             ROUND(SUM(o.o_totalprice), 2) AS total_spent,
             COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    """

    sql["events_sessionize"] = """
      WITH g AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
      )
      SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
             COUNT(*) AS n_events
      FROM g GROUP BY user_id
    """

    sql["events_hourly"] = """
      SELECT date_trunc('hour', ts) AS hour,
             COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS sum_value
      FROM events GROUP BY 1
    """

    return sql
