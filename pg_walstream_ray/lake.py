"""Transcript lake: partitioned Parquet fragments + manifests.

Layout (resumable output, one directory per partition):

    lake_dir/
      config.json                     # num_partitions, hot_keys, salt
      part=00000/
        manifest.json                 # applied_lsn, row_count, fragment, lineage
        fragment-000001-<lsn>.parquet # current state, sorted (conv_id, turn_idx)
      part=00001/ ...

Snapshot reads list each partition's manifest and read exactly the fragment
it points to — a half-written fragment (no manifest pointing at it) is
invisible, which is what makes kill-at-any-point safe.  Schema differences
across fragments (written before/after a schema evolution) are conformed on
read: missing columns null-filled, narrower ints widened (SURVEY.md §1.4).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .state.manifest import all_manifests, partition_dir


def write_lake_config(lake_dir: str, num_partitions: int,
                      hot_keys: Tuple[str, ...] = (), salt: int = 8) -> None:
    os.makedirs(lake_dir, exist_ok=True)
    p = os.path.join(lake_dir, "config.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_partitions": num_partitions,
                   "hot_keys": sorted(hot_keys), "salt": salt}, f)
    os.replace(tmp, p)


def read_lake_config(lake_dir: str) -> Optional[dict]:
    p = os.path.join(lake_dir, "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def live_fragments(lake_dir: str) -> List[str]:
    """Fragment paths the manifests currently point to."""
    out = []
    for pid, m in sorted(all_manifests(lake_dir).items()):
        if m.fragment:
            out.append(os.path.join(partition_dir(lake_dir, pid), m.fragment))
    return out


def _unify(tables: List[pa.Table]) -> pa.Table:
    if not tables:
        return pa.table({})
    schema = pa.unify_schemas([t.schema for t in tables],
                              promote_options="permissive")
    conformed = []
    for t in tables:
        cols = {}
        for f in schema:
            if f.name in t.column_names:
                col = t[f.name]
                cols[f.name] = pc.cast(col, f.type) if col.type != f.type else col
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        conformed.append(pa.table(cols))
    return pa.concat_tables(conformed)


def snapshot_table(lake_dir: str, sort: bool = True,
                   drop_internal: bool = True) -> pa.Table:
    """Materialized snapshot (driver-side; use for tests / small results).

    Stable turn ordering: global sort by (conv_id, turn_idx).
    """
    frags = live_fragments(lake_dir)
    tables = [pq.read_table(p) for p in frags]
    t = _unify(tables)
    if t.num_rows and drop_internal and "_lsn" in t.column_names:
        t = t.drop(["_lsn"])
    if t.num_rows and sort:
        t = t.take(pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    return t


def snapshot_dataset(lake_dir: str, drop_internal: bool = True):
    """Streaming snapshot as a ray.data.Dataset (the scale path).

    Per-partition fragments are already sorted by (conv_id, turn_idx); a
    global sort is NOT applied — ordering is per-conversation and
    conversations are partition-local (SURVEY.md §2.7).
    """
    import ray.data as rd

    frags = live_fragments(lake_dir)
    if not frags:
        return rd.from_items([])
    ds = rd.read_parquet(frags)
    if drop_internal:
        ds = ds.map_batches(
            lambda t: t.drop(["_lsn"]) if "_lsn" in t.column_names else t,
            batch_format="pyarrow")
    return ds


def compact_partition(lake_dir: str, pid: int) -> None:
    """GC stray tmp/dead fragment files not referenced by the manifest."""
    from .state.manifest import read_manifest

    m = read_manifest(lake_dir, pid)
    d = partition_dir(lake_dir, pid)
    if not os.path.isdir(d):
        return
    for name in os.listdir(d):
        if name in ("manifest.json", m.fragment):
            continue
        if name.startswith((".", "fragment-")):
            try:
                os.remove(os.path.join(d, name))
            except OSError:
                pass
