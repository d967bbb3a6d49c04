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
                 out_batch_rows: int = 32768, precompact: Optional[bool] = None):
        import ray

        self.registry = registry_ref if isinstance(
            registry_ref, SchemaRegistry) else ray.get(registry_ref)
        self.oid = oid
        # shed control columns the apply side never reads BEFORE the
        # all-to-all exchange — xid/commit_ts_us are ~12% of shuffle bytes
        # on the baseline shape (apply keys its replay filter on
        # source+commit_lsn and LWW on lsn only)
        self.partitioner = Partitioner(num_partitions, hot_keys, salt,
                                       drop_cols=("xid", "commit_ts_us"))
        self.stop_at_lsn = stop_at_lsn
        self.prune_below = prune_below or {}
        self.out_batch_rows = out_batch_rows
        if precompact is None:
            import os
            precompact = not os.environ.get("PGWR_NO_PRECOMPACT")
        self.precompact = precompact

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        from .apply import precompact_typed

        # reuse DecodeShard's segment loop (pruning, vectorized fast path,
        # stop-at-LSN, scalar fallback) at WHOLE-SEGMENT granularity
        # (out_batch_rows=0): the per-segment LWW pre-compaction combiner
        # needs the segment's full key history to collapse superseded rows
        # (~26% of the upsert shape) before the shuffle
        shard = DecodeShard(stop_at_lsn=self.stop_at_lsn,
                            prune_below=self.prune_below,
                            out_batch_rows=0)
        for env in shard(batch):
            typed = project_envelope(env, self.registry, self.oid)
            if self.precompact:
                typed = precompact_typed(typed)
            routed = self.partitioner(typed)
            # slice the ROUTED output (zero-copy) so the shuffle sees
            # pipelinable chunks, not whole-segment blocks
            step = self.out_batch_rows or routed.num_rows or 1
            for s in range(0, routed.num_rows, step):
                sl = routed.slice(s, step)
                if sl.num_rows:
                    yield sl
