"""Fused decode->project->route stage: one task per WAL segment.

The unfused pipeline ships the full change stream through the object
store twice between map stages (envelope -> typed -> routed is ~32 MB per
250k-event segment per hop — ~4 GB of extra store traffic on the
16M-event bench).  Fusing the three per-segment transforms into one
stage removes both hops: a segment is decoded (vectorized fast path with
scalar fallback, stages/vdecode.py), typed-projected and partition-routed
inside a single task, and only the routed output — the one table the
shuffle actually needs — is materialized.

Semantics are identical to the unfused stages by construction (the same
functions run in the same order); run_cdc output equality is covered by
the scenario/property suites.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import pyarrow as pa

from ..state.schema_registry import SchemaRegistry
from .decode import DecodeShard, PgOutputDecoder
from .partition import Partitioner
from .typed import project_envelope


class DecodeProjectRoute:
    """Callable stage (works as tasks or an actor pool): shard/segment
    descriptor rows -> routed typed batches ready for the apply shuffle."""

    def __init__(self, registry_ref, oid: int, num_partitions: int,
                 hot_keys=(), salt: int = 8,
                 stop_at_lsn: Optional[int] = None,
                 prune_below: Optional[Dict[int, int]] = None,
                 out_batch_rows: int = 32768):
        import ray

        self.registry = registry_ref if isinstance(
            registry_ref, SchemaRegistry) else ray.get(registry_ref)
        self.oid = oid
        self.partitioner = Partitioner(num_partitions, hot_keys, salt)
        self.stop_at_lsn = stop_at_lsn
        self.prune_below = prune_below or {}
        self.out_batch_rows = out_batch_rows

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        # reuse DecodeShard's segment loop (pruning, vectorized fast path,
        # stop-at-LSN, scalar fallback); fuse projection+routing per yield
        shard = DecodeShard(stop_at_lsn=self.stop_at_lsn,
                            prune_below=self.prune_below,
                            out_batch_rows=self.out_batch_rows)
        for env in shard(batch):
            routed = self.partitioner(
                project_envelope(env, self.registry, self.oid))
            if routed.num_rows:
                yield routed
