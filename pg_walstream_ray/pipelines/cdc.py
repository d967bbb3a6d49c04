"""End-to-end CDC pipeline wiring: WAL shards -> Parquet transcript lake.

Dataflow (all Ray Data, streaming executor with backpressure):

  from_items(segment descriptors)              # N segments, decode-parallel
    -> map_batches(DecodeProjectRoute)         # FUSED map side: vectorized
                                               #   pgoutput decode + typed
                                               #   projection + stable-hash
                                               #   route + per-segment LWW
                                               #   pre-compaction (combiner)
                                               #   in ONE stage — the
                                               #   envelope/typed tables
                                               #   never hit the object
                                               #   store (stages/fused.py)
    -> groupby(partition_id).map_groups(Apply) # THE shuffle; per-partition
                                               #   exactly-once upsert
    -> small summary table                     # one row per partition

(The unfused building blocks — decode_segments_fn / project_batch_fn /
ProjectStage / Partitioner — remain public for taps, tests and custom
pipelines.)

The only all-to-all exchange is the partition routing (SURVEY.md §7
"Shuffles and their keys"); everything upstream is per-shard-local and
everything downstream is per-partition-local.  Never materializes the
change stream: blocks flow decode -> project -> route -> apply under
backpressure, and the lake write is inside the apply stage.

Resume: re-running the same pipeline over the same (or extended) WAL is
idempotent — apply filters ``commit_lsn <= applied_lsn`` per partition
(reference semantics: restart resumes from last_received_lsn and re-acks
are no-ops, /root/reference/src/stream.rs:862-898 + lsn.rs:105-173).

Ray session ownership: this module never calls ray.init()/shutdown()
(driver contract).
"""

from __future__ import annotations

import glob
import json
import os
import time
from functools import partial
from typing import Iterable, Optional, Sequence

import pyarrow as pa

from ..sources.walgen import TRANSCRIPTS_OID
from ..stages.apply import ApplyGroup
from ..stages.decode import DecodeShard, ENVELOPE_SCHEMA, PgOutputDecoder
from ..stages.partition import Partitioner
from ..stages.typed import ProjectStage, project_envelope
from ..state.schema_registry import SchemaRegistry
from ..state.manifest import global_watermark, min_watermark
from ..lake import read_lake_config, write_lake_config


# Below this many worker CPUs, a LARGE replay's fused map side runs as a
# fixed actor pool; at or above it, plain tasks win (see run_cdc's adaptive
# execution mode comment for the measured A/B grid).  Crossover measured
# between 8 and 16 cpus on the 16M-event replay.
_MAP_TASKS_MIN_CPUS = 12


def discover_shards(wal_dir: str) -> list:
    """Per shard: the ORDERED list of segment files (single-file shards
    yield a one-element list).  Segments are the WAL-archive unit: resume
    prunes fully-applied ones via footer LSN stats without decoding."""
    out = []
    for d in sorted(glob.glob(os.path.join(wal_dir, "shard=*"))):
        segs = sorted(glob.glob(os.path.join(d, "wal*.parquet")))
        if segs:
            out.append(segs)
    if not out:
        raise FileNotFoundError(f"no WAL shards under {wal_dir}")
    return out


def _scan_shard_relations(segs: Sequence[str]) -> list:
    """Control-plane pre-scan of ONE shard: decode its segments in order
    with ``collect_dml=False`` (Relation/meta rows only — DML tuples are
    never materialized) and return the relation ``meta`` JSON strings.
    Runs as a Ray task, one per missing-sidecar shard, so a multi-TB
    shard's registry scan never happens on the driver."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dec = PgOutputDecoder(collect_dml=False)
    for p in segs:
        pf = pq.ParquetFile(p)
        for rg in range(pf.num_row_groups):
            dec.feed_frames(pf.read_row_group(rg, columns=["frame"])
                            ["frame"].to_pylist())
    b = dec.take_batch()
    if b is None:
        return []
    t = pa.Table.from_batches([b])
    return t.filter(pc.equal(t["op"], "relation"))["meta"].to_pylist()


def build_registry(wal_dir: str, shard_paths: Sequence[str]) -> SchemaRegistry:
    """Schema registry from sidecars (fast path), else a control-plane
    pre-scan of the frames (decode with collect_dml=False — the stream is
    self-describing via Relation messages, protocol.rs:1871-1879).  The
    no-sidecar scan fans out as one Ray task per shard and only the tiny
    relation-meta rows return to the driver (a 1.5 TB shard costs the
    cluster one sequential control-plane decode, the driver nothing)."""
    reg = SchemaRegistry()
    missing = []
    for segs in shard_paths:
        sidecar = os.path.join(os.path.dirname(segs[0]), "relations.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                reg.ingest_relation_rows(json.load(f))
        else:
            missing.append(segs)
    if missing:
        import ray

        scan = ray.remote(num_cpus=1)(_scan_shard_relations)
        for metas in ray.get([scan.remote(list(segs)) for segs in missing]):
            reg.ingest_relation_rows(metas)
    return reg


def probe_hot_keys(shard_paths: Sequence[str], registry: SchemaRegistry,
                   oid: int, frames_per_shard: int = 8192,
                   threshold_frac: float = 0.2) -> tuple:
    """Skew probe (SURVEY.md §4): decode a PREFIX of each shard and count
    key frequencies; keys above ``threshold_frac`` of sampled DML are hot.
    Driver-side and bounded — the sample is a few thousand frames per
    shard, not a pipeline pass.  The result must be pinned into the lake
    config BEFORE the first window so reruns partition identically."""
    import pyarrow.parquet as pq

    rv = registry.latest(oid)
    if rv is None:
        return ()
    names = [c.name for c in rv.columns]
    key_i = names.index(rv.key_columns[0]) if rv.key_columns else 0
    counts: dict = {}
    total = 0
    for segs in shard_paths:
        p = segs[0]                       # prefix sample: first segment
        dec = PgOutputDecoder(source=DecodeShard.source_of(p))
        pf = pq.ParquetFile(p)
        fed = 0
        for rg in range(pf.num_row_groups):
            frames = pf.read_row_group(rg, columns=["frame"])["frame"]
            dec.feed_frames(frames.to_pylist())
            fed += len(frames)
            if fed >= frames_per_shard:
                break
        b = dec.take_batch()
        if b is None:
            continue
        t = pa.Table.from_batches([b])
        t = t.filter(pa.compute.equal(t["rel_oid"], oid))
        for vals in t["after_values"].to_pylist():
            if vals is not None and key_i < len(vals) and vals[key_i]:
                counts[vals[key_i]] = counts.get(vals[key_i], 0) + 1
                total += 1
    if not total:
        return ()
    return tuple(sorted(k for k, c in counts.items()
                        if c / total >= threshold_frac))


def decode_segments_fn(batch: pa.Table, *, stop_at_lsn: Optional[int] = None,
                       prune_below: Optional[dict] = None):
    """Task-based decode stage: each input row is one self-contained WAL
    segment (transaction-closed, Relation re-sent per segment), so the
    decoder state machine never spans batches and the stage runs as plain
    Ray tasks — no actor pool to spin up per pipeline execution (measured:
    actor pools cost ~2-3 s of startup per run; warm task workers are
    reused across executions).  Task retries (Ray default) replace actor
    restarts for fault recovery: decode is deterministic and side-effect
    free, so a retried segment yields identical envelope batches."""
    yield from DecodeShard(stop_at_lsn=stop_at_lsn,
                           prune_below=prune_below)(batch)


def project_batch_fn(batch: pa.Table, *, registry_ref, oid: int,
                     lenient: bool = False) -> pa.Table:
    """Task-based typed projection. The registry rides the object store
    (``ray.put`` once on the driver); ``ray.get`` per batch is a local
    cached fetch on the worker — broadcast-small-side, never re-shipped
    with the task closure."""
    import ray

    reg = registry_ref if isinstance(registry_ref, SchemaRegistry) \
        else ray.get(registry_ref)
    return project_envelope(batch, reg, oid, lenient=lenient)


def lenient_deadletter_stats(wal_dir: str, oid: int = TRANSCRIPTS_OID):
    """Lenient-mode scan: decode + LENIENT typed projection (cast failures
    become per-row ``_cast_errors`` counts instead of hard errors — the
    FieldError-list contract, /root/reference/src/deserializer.rs:617-691),
    reduced to per-conversation dead-letter stats.

    Returns a Dataset of (conv_id, n_ops, n_bad): total change ops and ops
    with at least one failed column cast.  Per-batch partial aggregation
    before the (tiny) conv_id groupby — the dead-letter COUNT streams, the
    bad rows themselves never leave their decode task.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    import numpy as np
    import pyarrow.compute as pc

    shard_paths = discover_shards(wal_dir)
    registry_ref = ray.put(build_registry(wal_dir, shard_paths))
    work = [{"wal_paths": [seg]} for segs in shard_paths for seg in segs]
    ds = rd.from_items(work, override_num_blocks=len(work))

    def scan(batch: pa.Table):
        for env in DecodeShard()(batch):
            t = project_batch_fn(env, registry_ref=registry_ref, oid=oid,
                                 lenient=True)
            if t.num_rows == 0:
                continue
            part = pa.table({
                "conv_id": t["conv_id"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "bad": pc.cast(pc.greater(t["_cast_errors"], 0), pa.int64()),
            }).group_by("conv_id").aggregate([("one", "sum"),
                                              ("bad", "sum")])
            yield part

    agg = ds.map_batches(scan, batch_size=None, batch_format="pyarrow",
                         num_cpus=1) \
        .groupby("conv_id").aggregate(Sum("one_sum", alias_name="n_ops"),
                                      Sum("bad_sum", alias_name="n_bad"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": t["conv_id"],
            "n_ops": pc.cast(t["n_ops"], pa.int64()),
            "n_bad": pc.cast(t["n_bad"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def run_cdc_quarantine(wal_dir: str, lake_dir: str, dl_dir: str,
                       num_partitions: int = 8,
                       oid: int = TRANSCRIPTS_OID) -> dict:
    """CDC replay with a dead-letter QUARANTINE channel: clean rows apply
    exactly-once exactly as ``run_cdc``; rows whose typed cast fails are
    captured in RAW envelope form (text cells intact) under ``dl_dir`` —
    one parquet file per WAL segment with a DETERMINISTIC name, so a
    retried decode task overwrites its own file instead of duplicating
    rows (idempotent side channel).  ``reprocess_deadletters`` repairs and
    merges them later.

    Scale shape: identical to run_cdc minus the fused fast path — decode +
    lenient projection + routing in one map stage per segment, ONE
    all-to-all for the apply.  The DL write adds no shuffle: each segment
    task writes its own quarantine file next to its decode.  Hot-key
    salting is pinned OFF for quarantine lakes (the repair merge routes by
    the same unsalted partitioner).
    """
    import ray
    import ray.data as rd

    from ..stages.typed import project_envelope_quarantine

    t0 = time.time()
    shard_paths = discover_shards(wal_dir)
    registry_ref = ray.put(build_registry(wal_dir, shard_paths))
    if read_lake_config(lake_dir) is None:
        write_lake_config(lake_dir, num_partitions, (), 8, sink="lww")
    os.makedirs(dl_dir, exist_ok=True)
    work = [{"wal_paths": [seg]} for segs in shard_paths for seg in segs]
    ds = rd.from_items(work, override_num_blocks=len(work))
    partitioner = Partitioner(num_partitions,
                              drop_cols=("xid", "commit_ts_us"))

    def scan(batch: pa.Table):
        import pyarrow.parquet as pq
        import ray as _ray

        reg = _ray.get(registry_ref)
        seg_path = batch["wal_paths"].to_pylist()[0][0]
        source = DecodeShard.source_of(seg_path)
        dl_acc = []
        for env in DecodeShard()(batch):
            typed, dl = project_envelope_quarantine(env, reg, oid)
            if dl.num_rows:
                dl_acc.append(dl)
            if typed.num_rows:
                yield partitioner(typed)
        if dl_acc:
            name = (f"dl-{source}-"
                    f"{os.path.basename(seg_path)}")
            tmp = os.path.join(dl_dir, f".{name}.tmp")
            pq.write_table(pa.concat_tables(dl_acc), tmp,
                           compression="zstd")
            os.replace(tmp, os.path.join(dl_dir, name))

    routed = ds.map_batches(scan, batch_size=None, batch_format="pyarrow",
                            num_cpus=1)
    apply_group = ApplyGroup(lake_dir)
    sdf = routed.groupby("partition_id").map_groups(
        lambda g: apply_group(g), batch_format="pyarrow").to_pandas()
    wall = time.time() - t0
    rows = int(sdf["rows_applied"].sum()) if len(sdf) else 0
    dl_files = [f for f in os.listdir(dl_dir) if f.startswith("dl-")]
    return {"wall_s": wall, "rows_applied": rows,
            "dl_files": len(dl_files),
            "lake_rows": int(sdf["row_count"].sum()) if len(sdf) else 0}


def reprocess_deadletters(dl_dir: str, lake_dir: str, repair_fn,
                          wal_dir: str,
                          oid: int = TRANSCRIPTS_OID) -> dict:
    """Dead-letter REPAIR pass: read the quarantined raw envelope rows,
    apply ``repair_fn`` (envelope table -> envelope table, fixing the raw
    text cells once the producer bug is understood), STRICT-project them,
    route by the lake's partitioner, and merge each touched partition at
    the FRAGMENT level — union of the existing fragment chain (as ops:
    tombstones become delete ops at their ``_lsn``) with the repaired rows,
    resolved by ``lww_resolve`` and rewritten as ONE fragment (atomic
    tmp+rename, manifest epoch bump, dead-fragment GC).

    The replay-LSN guard is deliberately bypassed: quarantined rows were
    never applied, so their LSNs being below the watermark is exactly the
    situation the quarantine exists for.  The merge is idempotent —
    re-running with the same DL set reproduces the same state — and
    LWW-correct: a clean delete/update newer than a repaired row still
    wins, because everything re-resolves by true ``_lsn``.

    Scale shape: DL volume is the anomaly rate, not the corpus — a 10^10
    event replay with 10^-5 corruption yields ~10^5 DL rows; the repair is
    one small read + one routed shuffle + one rewrite task per TOUCHED
    partition (untouched partitions are not rewritten).
    """
    import ray
    import ray.data as rd

    files = sorted(os.path.join(dl_dir, f) for f in os.listdir(dl_dir)
                   if f.startswith("dl-") and f.endswith(".parquet"))
    if not files:
        return {"repaired": 0, "partitions": 0}
    cfg = read_lake_config(lake_dir)
    num_partitions = cfg["num_partitions"]
    shard_paths = discover_shards(wal_dir)
    registry_ref = ray.put(build_registry(wal_dir, shard_paths))
    partitioner = Partitioner(num_partitions,
                              drop_cols=("xid", "commit_ts_us"))
    ds = rd.read_parquet(files)

    def fix_and_project(t: pa.Table) -> pa.Table:
        import ray as _ray

        reg = _ray.get(registry_ref)
        repaired = repair_fn(t)
        typed = project_envelope(repaired, reg, oid)   # strict
        return partitioner(typed)

    def merge(group: pa.Table) -> pa.Table:
        pid = group["partition_id"][0].as_py()
        n = _repair_merge_partition(lake_dir, int(pid), group)
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "repaired": pa.array([group.num_rows], pa.int64()),
                         "row_count": pa.array([n], pa.int64())})

    sdf = ds.map_batches(fix_and_project, batch_format="pyarrow") \
        .groupby("partition_id") \
        .map_groups(merge, batch_format="pyarrow").to_pandas()
    return {"repaired": int(sdf["repaired"].sum()) if len(sdf) else 0,
            "partitions": int(len(sdf))}


def _repair_merge_partition(lake_dir: str, pid: int,
                            group: pa.Table) -> int:
    """Fragment-level merge of repaired typed rows into one partition:
    existing chain rows re-enter LWW as ops (tombstone -> delete at its
    ``_lsn``), repaired rows enter at their true lsn; the resolved state
    is written as a single fragment (tombstones droppable: nothing older
    remains to cancel).  Same atomicity as compaction."""
    import uuid as _uuid

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.apply import KEY_COLS, lww_resolve
    from ..state.manifest import (partition_dir, read_manifest,
                                  write_manifest_atomic)

    m = read_manifest(lake_dir, pid)
    d = partition_dir(lake_dir, pid)
    os.makedirs(d, exist_ok=True)

    # repaired rows -> op form (payload + lsn + op + _unchanged_*)
    from ..stages.apply import payload_columns

    payload = payload_columns(group.schema)
    parts = []
    rep_cols: dict = {c: group[c] for c in payload}
    rep_cols["lsn"] = group["lsn"]
    rep_cols["op"] = group["op"]
    for c in payload:
        un = f"_unchanged_{c}"
        rep_cols[un] = group[un] if un in group.column_names \
            else pa.array(np.zeros(group.num_rows, dtype=bool))
    parts.append(pa.table(rep_cols))

    for name in m.fragments:
        t = pq.read_table(os.path.join(d, name))
        n = t.num_rows
        tomb = t["_tombstone"] if "_tombstone" in t.column_names \
            else pa.array(np.zeros(n, dtype=bool))
        cols: dict = {}
        for c in payload:
            cols[c] = t[c] if c in t.column_names \
                else pa.nulls(n, parts[0][c].type)
            cols[f"_unchanged_{c}"] = pa.array(np.zeros(n, dtype=bool))
        cols["lsn"] = t["_lsn"]
        cols["op"] = pc.if_else(pc.fill_null(tomb, False), "delete",
                                "insert")
        parts.append(pa.table(cols).select(parts[0].column_names))

    ops = pa.concat_tables(parts)
    final = lww_resolve(ops, payload, keep_tombstones=False,
                        key_cols=KEY_COLS)
    final = final.take(pc.sort_indices(
        final, sort_keys=[(c, "ascending") for c in KEY_COLS]))
    frag = f"fragment-{m.epoch + 1:06d}-repair.parquet"
    tmp = os.path.join(d, f".{frag}.{_uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(final, tmp, compression="zstd")
    os.replace(tmp, os.path.join(d, frag))
    old = list(m.fragments)
    m.fragments = [frag]
    m.row_count = final.num_rows
    m.epoch += 1
    m.lineage.append({"epoch": m.epoch, "repair": True,
                      "rows_applied": int(group.num_rows)})
    write_manifest_atomic(lake_dir, m)
    for dead in old:
        try:
            os.remove(os.path.join(d, dead))
        except OSError:
            pass
    return final.num_rows


def run_cdc_follow(wal_dir: str, lake_dir: str, num_partitions: int = 16,
                   poll_interval_s: float = 2.0, max_idle_polls: int = 3,
                   **kw) -> dict:
    """Tailing mode: repeatedly replay the WAL directory, picking up
    segments that appeared since the last pass.  Segment pruning makes
    each pass incremental (already-applied segments are skipped from
    footer stats), so the steady-state cost is proportional to NEW data —
    the micro-batch analogue of the reference's continuous stream.
    Stops after ``max_idle_polls`` consecutive empty passes."""
    idle = 0
    rounds = 0
    total = 0
    while idle < max_idle_polls:
        m = run_cdc(wal_dir, lake_dir, num_partitions=num_partitions, **kw)
        rounds += 1
        if m["rows_applied"] == 0:
            idle += 1
            time.sleep(poll_interval_s)
        else:
            idle = 0
            total += m["rows_applied"]
    return {"rounds": rounds, "rows_applied": total,
            "watermark": global_watermark(lake_dir),
            "min_watermark": min_watermark(lake_dir)}


def run_cdc(wal_dir: str, lake_dir: str, num_partitions: int = 16,
            stop_at_lsn: Optional[int] = None,
            hot_keys: Optional[Iterable[str]] = None, salt: int = 8,
            oid: int = TRANSCRIPTS_OID,
            decode_concurrency: Optional[int] = None,
            project_concurrency: Optional[int] = None,
            auto_detect_hot_keys: bool = False,
            origin_filter: str = "any",
            sink: str = "lww") -> dict:
    """Replay the WAL lake into the transcript lake. Returns run metrics.

    Safe to re-run (exactly-once); safe to kill at any point and re-run.
    Partitioning parameters are pinned in the lake config on first run and
    must not change across resumes.

    ``sink`` selects the consumer shape (pinned in the lake config):
      - "lww"     — last-writer-wins upsert state (stages/apply.py), the
                    safe-transaction-consumer contract.
      - "history" — SCD type-2 append-only version lake (stages/history.py);
                    read back with lake.history_table / history_dataset.
                    Disables the map-side LWW pre-compaction combiner (it
                    would collapse the versions this sink retains).
    """
    import ray
    import ray.data as rd

    if sink not in ("lww", "history"):
        raise ValueError(f"unknown sink {sink!r}")
    t0 = time.time()
    shard_paths = discover_shards(wal_dir)
    n_shards = len(shard_paths)

    cfg = read_lake_config(lake_dir)
    if cfg is None:
        hot = tuple(sorted(hot_keys)) if hot_keys else ()
        if not hot and auto_detect_hot_keys:
            hot = probe_hot_keys(shard_paths,
                                 build_registry(wal_dir, shard_paths), oid)
        write_lake_config(lake_dir, num_partitions, hot, salt, sink=sink)
        cfg = read_lake_config(lake_dir)
    else:
        if cfg["num_partitions"] != num_partitions:
            raise ValueError(
                f"lake at {lake_dir} was created with num_partitions="
                f"{cfg['num_partitions']}; cannot resume with {num_partitions}")
        if cfg.get("sink", "lww") != sink:
            raise ValueError(
                f"lake at {lake_dir} was created with sink="
                f"{cfg.get('sink', 'lww')!r}; cannot resume with {sink!r}")
    hot = tuple(cfg["hot_keys"])
    salt = cfg["salt"]

    registry = build_registry(wal_dir, shard_paths)
    registry_ref = ray.put(registry)

    # resume pruning: a segment whose footer max(lsn) <= every partition's
    # applied mark for its source is skipped without decoding.  Conservative
    # by construction (min over ALL partitions, missing manifests count -1).
    prune = {int(s): lsn
             for s, lsn in global_watermark(lake_dir, num_partitions).items()
             if lsn >= 0}

    # SEGMENT-parallel decode: segments written by write_logical_shard are
    # transaction-closed and self-describing (Relation re-sent per segment
    # — PostgreSQL reconnect semantics), so each can be decoded by an
    # independent state machine.  This removes the per-shard serial decode
    # bottleneck: a 1.5 TB shard is no longer one sequential scan.  Apply
    # is order-insensitive (per-key LWW by lsn), so cross-segment decode
    # order does not matter.  Single-file shards degrade to one item.
    #
    # Bounded replay composes with this: the crossing transaction lives in
    # the FIRST segment whose last commit end (footer max lsn + 1) reaches
    # the target; later segments are dropped up front — otherwise each
    # would independently deliver its own "first crossing tx".
    if stop_at_lsn is not None:
        import pyarrow.parquet as pq

        bounded = []
        for segs in shard_paths:
            kept = []
            for p in segs:
                kept.append(p)
                mx = DecodeShard._segment_max_lsn(pq.ParquetFile(p))
                if mx is not None and mx + 1 >= stop_at_lsn:
                    break                 # crossing segment: keep, stop here
            bounded.append(kept)
        shard_paths = bounded
    work_items = [{"wal_paths": [seg]} for segs in shard_paths
                  for seg in segs]
    ds = rd.from_items(work_items, override_num_blocks=len(work_items))
    # FUSED map side: decode -> typed projection -> partition routing run
    # inside ONE stage per segment (stages/fused.py) — the intermediate
    # envelope and typed tables never hit the object store (two ~2 GB hops
    # saved on the 16M-event bench).  Adaptive execution mode (A/B-measured
    # on the 16M-event replay, round 4):
    #  - TASKS when the input is small (constant-overhead regime) OR the
    #    worker has plenty of CPUs: warm task workers are reused across
    #    pipeline executions (no per-run pool spin-up) and interleave
    #    freely with the shuffle+apply stages — 16 cpus: 1.96M vs 1.76M
    #    ev/s; 32 cpus: 3.51M vs 2.25M ev/s over the fixed pool.
    #  - FIXED ACTOR POOL only for LARGE inputs on CPU-SCARCE workers
    #    (< _MAP_TASKS_MIN_CPUS): under scarcity dedicated pinned
    #    processes pipeline better (4 cpus: 657k vs 352k; 8 cpus: 1.20M
    #    vs 921k ev/s) and avoid task-vs-reduce scheduling churn.
    # The pool gets at most 3/4 of the CPUs — a map side saturating every
    # CPU starves the concurrent shuffle+apply stages.
    from ..stages.fused import DecodeProjectRoute

    total_bytes = sum(os.path.getsize(it["wal_paths"][0])
                      for it in work_items)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # PGWR_MAP_MODE=tasks|actors overrides the adaptive choice (A/B knob;
    # tasks reuse warm workers across runs, actors pin processes)
    mode = os.environ.get("PGWR_MAP_MODE", "auto")
    if mode == "auto":
        use_tasks = (total_bytes < 128 * 1024 * 1024
                     or ncpu >= _MAP_TASKS_MIN_CPUS)
    else:
        use_tasks = mode == "tasks"
    small = use_tasks
    map_c = decode_concurrency or max(1, min(len(work_items),
                                             (3 * ncpu) // 4))
    fused_kw = dict(registry_ref=registry_ref, oid=oid,
                    num_partitions=num_partitions, hot_keys=hot, salt=salt,
                    stop_at_lsn=stop_at_lsn, prune_below=prune,
                    origin_filter=origin_filter)
    if sink == "history":
        fused_kw["precompact"] = False
    if small:
        # tasks with per-worker instance caching: the stage (registry
        # ray.get, Partitioner/hot-key build) is constructed once per warm
        # task worker, not once per batch (stages/taskmode.py)
        from ..stages.taskmode import as_tasks

        routed = ds.map_batches(as_tasks(DecodeProjectRoute, **fused_kw),
                                batch_size=None, batch_format="pyarrow",
                                num_cpus=1, concurrency=map_c)
    else:
        routed = ds.map_batches(
            DecodeProjectRoute, fn_constructor_kwargs=fused_kw,
            batch_size=None, batch_format="pyarrow", concurrency=map_c,
            num_cpus=1, max_task_retries=-1)
    if sink == "history":
        from ..stages.history import HistoryApplyGroup

        apply_group = HistoryApplyGroup(lake_dir)
    else:
        apply_group = ApplyGroup(lake_dir)

    def apply_fn(group: pa.Table) -> pa.Table:
        return apply_group(group)

    summaries = routed.groupby("partition_id").map_groups(
        apply_fn, batch_format="pyarrow")
    sdf = summaries.to_pandas()   # one row per touched partition — tiny
    if os.environ.get("PGWR_STATS"):
        import sys
        print(summaries.stats(), file=sys.stderr)

    # Watermark advancement barrier (the consumer-side "ack up to the last
    # contiguous applied commit", main.rs:190-206): the pipeline completed,
    # so EVERY partition has seen its full slice of the released stream —
    # each may ack the stream's per-source end, not just its own last row.
    # Without this, a partition whose keys went quiet early drags the
    # global watermark (and segment pruning) arbitrarily far behind.
    if len(sdf) and "applied_json" in sdf.columns:
        stream_end: dict = {}
        for j in sdf["applied_json"]:
            for s, lsn in json.loads(j).items():
                si = int(s)
                stream_end[si] = max(stream_end.get(si, -1), int(lsn))
        if stream_end:
            from ..state.manifest import read_manifest, write_manifest_atomic

            for pid in range(num_partitions):
                mm = read_manifest(lake_dir, pid)
                changed = False
                for s, lsn in stream_end.items():
                    k = str(s)
                    if mm.applied_lsns.get(k, -1) < lsn:
                        mm.applied_lsns[k] = lsn
                        changed = True
                if changed:
                    write_manifest_atomic(lake_dir, mm)

    wall = time.time() - t0
    rows_applied = int(sdf["rows_applied"].sum()) if len(sdf) else 0
    return {
        "wall_s": wall,
        "shards": n_shards,
        "partitions_touched": int(len(sdf)),
        "rows_applied": rows_applied,
        "events_per_s": rows_applied / wall if wall > 0 else 0.0,
        "lake_rows": int(sdf["row_count"].sum()) if len(sdf) else 0,
        "watermark": global_watermark(lake_dir),   # per-source feedback point
        "min_watermark": min_watermark(lake_dir),
    }
