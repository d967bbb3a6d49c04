"""Fused decode->project->route stage: one task per WAL segment.

The unfused pipeline ships the full change stream through the object
store twice between map stages (envelope -> typed -> routed is ~32 MB per
250k-event segment per hop — ~4 GB of extra store traffic on the
16M-event bench).  Fusing the three per-segment transforms into one
stage removes both hops: a segment is decoded, typed-projected and
partition-routed inside a single task, and only the routed output — the
one table the shuffle actually needs — is materialized.

Decode ladder per segment, fastest first:
  1. TYPED-DIRECT vectorized decode (vdecode.try_decode_segment_typed):
     per-column typed arrays built straight from the wire buffers — the
     ``list<string>`` envelope is never built and never re-split.  This
     removes ~2 full payload passes per segment, the measured map-side
     DRAM ceiling of round 1 (BASELINE.md).
  2. Envelope vectorized decode + project_envelope (anything the typed
     emitter can't express falls through here).
  3. Scalar state-machine decode + project_envelope (bounded replay,
     two-phase, parse anomalies).
All three produce the same typed schema; per-segment LWW pre-compaction
and partition routing run on the result.

Semantics are identical to the unfused stages by construction (the same
functions run in the same order); run_cdc output equality is covered by
the scenario/property suites.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import pyarrow as pa

from ..state.schema_registry import SchemaRegistry
from .decode import DecodeShard, ENVELOPE_SCHEMA, PgOutputDecoder
from .partition import Partitioner
from .typed import project_envelope


class DecodeProjectRoute:
    """Callable stage (works as tasks or an actor pool): shard/segment
    descriptor rows -> routed typed batches ready for the apply shuffle."""

    def __init__(self, registry_ref, oid: int, num_partitions: int,
                 hot_keys=(), salt: int = 8,
                 stop_at_lsn: Optional[int] = None,
                 prune_below: Optional[Dict[int, int]] = None,
                 out_batch_rows: int = 32768,
                 precompact: Optional[bool] = None,
                 version_map: Optional[Dict[tuple, int]] = None,
                 origin_filter: str = "any"):
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
            precompact = not os.environ.get("PGWR_NO_PRECOMPACT")
        self.precompact = precompact
        # global rel_version numbering for segment-parallel decoders
        # (SchemaRegistry.version_map()); default-derive so every caller
        # gets consistent numbering even on multi-segment shards
        self.version_map = version_map if version_map is not None \
            else self.registry.version_map()
        self.typed_direct = not os.environ.get("PGWR_NO_TYPED_DECODE")
        self.vdecode_env = not os.environ.get("PGWR_NO_VDECODE")
        self.origin_filter = origin_filter

    def _decode_typed_segments(self, batch: pa.Table) -> Iterator[pa.Table]:
        """Per WAL entry: stream TYPED tables, one per segment (whole-
        segment granularity, as the pre-compaction combiner needs the
        segment's full key history)."""
        import pyarrow.parquet as pq

        from .vdecode import try_decode_segment, try_decode_segment_typed

        col = "wal_paths" if "wal_paths" in batch.column_names else "wal_path"
        for entry in batch[col].to_pylist():
            segments = entry if isinstance(entry, list) else [entry]
            source = DecodeShard.source_of(segments[0])
            dec = PgOutputDecoder(stop_at_lsn=self.stop_at_lsn,
                                  source=source,
                                  version_map=self.version_map,
                                  origin_filter=self.origin_filter)
            wm = self.prune_below.get(source, -1)
            for path in segments:
                if dec.stopped:
                    break
                pf = pq.ParquetFile(path)
                if wm >= 0:
                    mx = DecodeShard._segment_max_lsn(pf)
                    if mx is not None and mx <= wm:
                        continue          # fully applied everywhere: skip
                frames = pf.read(columns=["frame"])["frame"]
                if self.typed_direct:
                    tout = try_decode_segment_typed(dec, frames,
                                                    self.registry, self.oid)
                    if tout is not None:
                        if tout:
                            yield pa.concat_tables(tout)
                        continue
                env_out = try_decode_segment(dec, frames, out_batch_rows=0) \
                    if self.vdecode_env else None
                if env_out is not None:
                    env = pa.Table.from_batches(env_out,
                                                schema=ENVELOPE_SCHEMA)
                else:
                    # scalar fallback: the sequential state machine handles
                    # everything (two-phase, bounded replay, anomalies)
                    dec.feed_frames(frames.to_pylist())
                    b = dec.take_batch()
                    if b is None:
                        continue
                    env = pa.Table.from_batches([b], schema=ENVELOPE_SCHEMA)
                if env.num_rows:
                    yield project_envelope(env, self.registry, self.oid)

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        from .apply import precompact_typed

        for typed in self._decode_typed_segments(batch):
            if typed.num_rows == 0:
                continue
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
