"""Multi-table routing: one WAL stream -> N destination lake tables.

The reference's ``WalRouter`` dispatches each change event to a per-(table,
kind) handler via a hash lookup (/root/reference/src/router.rs:40-148,
registration surface router.rs:61-202).  Ray-Data-first equivalent: the
route table IS the partitioning function — a single decode pass assigns
every DML/truncate row a global route id ``(table_index, key_hash %
partitions_per_table)`` and ONE shuffle delivers each (table, partition)
group to an apply task that projects with that table's schema and upserts
into that table's lake.  No per-table re-scan, no second shuffle.

Key columns per table come from the Relation message's replica-identity
flags (protocol.rs:241-250) — the same source of truth the reference uses.
"""

from __future__ import annotations

import os
import time
import zlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..lake import read_lake_config, write_lake_config
from ..stages.apply import apply_partition_window
from ..stages.decode import DecodeShard
from ..stages.typed import CONTROL_COLS, project_dml
from ..state.schema_registry import SchemaRegistry


@dataclass(frozen=True)
class TableRoute:
    """Destination spec for one relation oid."""

    oid: int
    lake_dir: str
    num_partitions: int = 8


def _key_columns(registry: SchemaRegistry, oid: int) -> List[str]:
    """Replica-identity key columns of the newest relation version."""
    rv = registry.latest(oid)
    keys = [c.name for c in rv.columns if c.is_key]
    return keys or [c.name for c in rv.columns]   # identity FULL fallback


class RouterStage:
    """map_batches stage: envelope rows -> routed rows with ``route_pid``.

    Key hash: crc32 over the '|'-joined key-column values (taken from the
    after-tuple for insert/update, before-tuple for delete — the tuple that
    carries the key, protocol.rs:1338-1366).  Truncates broadcast to every
    partition of their table.  Unrouted relations are dropped (mirrors the
    reference's unrouted-events counter, router.rs:129-147).
    """

    def __init__(self, registry_ref, routes: Sequence[TableRoute]):
        import ray

        self.registry = ray.get(registry_ref) if not isinstance(
            registry_ref, SchemaRegistry) else registry_ref
        self.routes = {r.oid: r for r in routes}
        self.table_index = {r.oid: i for i, r in enumerate(routes)}
        self.key_idx: Dict[int, List[int]] = {}
        for r in routes:
            rv = self.registry.latest(r.oid)
            names = [c.name for c in rv.columns]
            self.key_idx[r.oid] = [
                names.index(k) for k in _key_columns(self.registry, r.oid)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.partition import stable_hash_strings

        keep = pc.is_in(batch["rel_oid"],
                        value_set=pa.array(list(self.routes), pa.int32()))
        dmlish = pc.is_in(batch["op"], value_set=pa.array(
            ["insert", "update", "delete", "truncate"]))
        t = batch.filter(pc.and_(keep, dmlish))
        if t.num_rows == 0:
            return t.append_column("route_pid", pa.array([], pa.int64()))

        is_trunc = pc.equal(t["op"], "truncate")
        dml = t.filter(pc.invert(is_trunc))
        oid_np = dml["rel_oid"].to_numpy(zero_copy_only=False)
        # the tuple carrying the key: before for deletes, after otherwise
        # (key_columns_for_relation semantics, protocol.rs:1338-1366)
        tup_col = pc.if_else(pc.equal(dml["op"], "delete"),
                             dml["before_values"], dml["after_values"])
        pids = np.zeros(dml.num_rows, dtype=np.int64)
        for oid, route in self.routes.items():      # few tables; rows vector
            m = oid_np == oid
            if not m.any():
                continue
            sub = tup_col.filter(pa.array(m))
            parts: List = []
            for j in self.key_idx[oid]:
                if parts:
                    parts.append("|")
                parts.append(pc.fill_null(pc.list_element(sub, j), ""))
            key = parts[0] if len(parts) == 1 else \
                pc.binary_join_element_wise(*parts, "")
            h = stable_hash_strings(pa.chunked_array([key]) if isinstance(
                key, pa.Array) else key)
            pids[m] = (self.table_index[oid] * (10 ** 6)
                       + (h % route.num_partitions).astype(np.int64))

        out = dml.append_column("route_pid", pa.array(pids))
        if pc.any(is_trunc).as_py():
            pieces = [out]
            trunc = t.filter(is_trunc)
            toid = trunc["rel_oid"].to_numpy(zero_copy_only=False)
            for oid, route in self.routes.items():
                tm = toid == oid
                if not tm.any():
                    continue
                sub = trunc.filter(pa.array(tm))
                base = self.table_index[oid] * (10 ** 6)
                for p in range(route.num_partitions):   # broadcast
                    pieces.append(sub.append_column("route_pid", pa.array(
                        np.full(sub.num_rows, base + p, dtype=np.int64))))
            out = pa.concat_tables(pieces)
        return out


class MultiApply:
    """groupby(route_pid).map_groups callable: project the group with its
    table's schema, then run the standard exactly-once partition apply into
    that table's lake."""

    def __init__(self, registry, routes: Sequence[TableRoute]):
        self.registry = registry
        self.routes = list(routes)

    def __call__(self, group: pa.Table) -> pa.Table:
        rp = int(group["route_pid"][0].as_py())
        route = self.routes[rp // (10 ** 6)]
        pid = rp % (10 ** 6)
        env = group.drop(["route_pid"])
        is_trunc = pc.equal(env["op"], "truncate")
        typed = project_dml(env.filter(pc.invert(is_trunc)),
                            self.registry, route.oid)
        if pc.any(is_trunc).as_py():
            trunc = env.filter(is_trunc)
            cols = {c: trunc[c] for c in CONTROL_COLS}
            for name in typed.column_names:
                if name not in cols:
                    cols[name] = pa.nulls(trunc.num_rows,
                                          typed.schema.field(name).type)
            typed = pa.concat_tables([typed, pa.table(cols).select(
                typed.column_names)])
        typed = typed.append_column("partition_id", pa.array(
            np.full(typed.num_rows, pid, dtype=np.int32)))
        key_cols = _key_columns(self.registry, route.oid)
        summary = apply_partition_window(typed, route.lake_dir,
                                         key_cols=key_cols)
        summary["oid"] = route.oid
        return pa.table({k: [v] for k, v in summary.items()})


class DecodeRoute:
    """FUSED decode+route per-shard stage (same rationale as cdc.run_cdc's
    fused map side: the envelope never hits the object store).  Module-level
    so the task-mode per-worker instance cache keys on a stable class."""

    def __init__(self, registry_ref, routes, stop_at_lsn=None):
        self.router = RouterStage(registry_ref=registry_ref, routes=routes)
        self.stop_at_lsn = stop_at_lsn
        # global rel_version numbering: a decoder seeing only a subset of
        # the Relation messages (one segment, or a multi-relation shard)
        # must not number them by local arrival order (see
        # SchemaRegistry.version_map)
        self.version_map = self.router.registry.version_map()

    def __call__(self, batch):
        shard = DecodeShard(stop_at_lsn=self.stop_at_lsn,
                            version_map=self.version_map)
        for env in shard(batch):
            routed = self.router(env)
            if routed.num_rows:
                yield routed


def run_cdc_router(wal_dir: str, routes: Sequence[TableRoute],
                   stop_at_lsn: Optional[int] = None) -> dict:
    """One decode pass, one shuffle, N destination tables."""
    import ray
    import ray.data as rd

    from .cdc import build_registry, discover_shards

    t0 = time.time()
    shard_paths = discover_shards(wal_dir)
    registry = build_registry(wal_dir, shard_paths)
    registry_ref = ray.put(registry)
    for r in routes:
        if read_lake_config(r.lake_dir) is None:
            write_lake_config(r.lake_dir, r.num_partitions)

    fused_kw = dict(registry_ref=registry_ref, routes=tuple(routes),
                    stop_at_lsn=stop_at_lsn)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # SEGMENT-parallel decode (same as run_cdc): segments are
    # transaction-closed and self-describing (Relation re-sent per
    # segment), so decode parallelism scales with data size, not with the
    # slot count — a single-shard wide-table WAL otherwise decodes on ONE
    # task regardless of cluster width
    work_items = [{"wal_paths": [seg]} for segs in shard_paths
                  for seg in segs]
    map_c = max(1, min(len(work_items), (3 * ncpu) // 4))
    total_bytes = sum(os.path.getsize(it["wal_paths"][0])
                      for it in work_items)
    ds = rd.from_items(work_items, override_num_blocks=len(work_items))
    if total_bytes < 128 * 1024 * 1024:
        from ..stages.taskmode import as_tasks

        routed = ds.map_batches(as_tasks(DecodeRoute, **fused_kw),
                                batch_size=None, batch_format="pyarrow",
                                num_cpus=1, concurrency=map_c)
    else:
        routed = ds.map_batches(
            DecodeRoute, fn_constructor_kwargs=fused_kw,
            batch_size=None, batch_format="pyarrow", concurrency=map_c,
            num_cpus=1, max_task_retries=-1)
    applier = MultiApply(registry, routes)

    def apply_fn(group: pa.Table) -> pa.Table:
        return applier(group)

    summaries = routed.groupby("route_pid").map_groups(
        apply_fn, batch_format="pyarrow")
    sdf = summaries.to_pandas()
    if os.environ.get("PGWR_STATS"):
        import sys
        print(summaries.stats(), file=sys.stderr)
    wall = time.time() - t0
    per_table = {}
    if len(sdf):
        for oid, g in sdf.groupby("oid"):
            per_table[int(oid)] = {
                "rows_applied": int(g["rows_applied"].sum()),
                "partitions": int(len(g)),
            }
    return {"wall_s": wall, "tables": per_table}
