"""Fault injection: a decode actor PROCESS dies mid-run (os._exit — no
Python cleanup, like an OOM kill); Ray restarts the actor, the task is
retried, and the final lake state is still exactly the oracle's.  The
engine analogue of the reference's reconnect-and-resume-from-
last_received_lsn recovery (stream.rs:957-1043, retry.rs)."""

import os
import tempfile

import pyarrow as pa
import pytest

from pg_walstream_ray.pipelines.cdc import build_registry, discover_shards
from pg_walstream_ray.sources import walgen
from pg_walstream_ray.stages.apply import ApplyGroup
from pg_walstream_ray.stages.decode import DecodeShard
from pg_walstream_ray.stages.partition import Partitioner
from pg_walstream_ray.stages.typed import ProjectStage
from pg_walstream_ray.lake import write_lake_config

from .helpers import assert_lake_matches, make_wal, oracle_df


class CrashingDecode(DecodeShard):
    """Kills its worker process once (grabs the sentinel atomically) then
    behaves normally on the restarted actor."""

    def __init__(self, crash_flag: str, **kw):
        super().__init__(**kw)
        self.crash_flag = crash_flag

    def __call__(self, batch: pa.Table):
        try:
            fd = os.open(self.crash_flag, os.O_CREAT | os.O_EXCL)
            os.close(fd)
            os._exit(1)          # hard kill, no cleanup
        except FileExistsError:
            pass
        yield from super().__call__(batch)


@pytest.mark.usefixtures("ray_session")
def test_decode_actor_crash_recovers_exactly_once():
    import ray
    import ray.data as rd

    spec = walgen.WalSpec(n_convs=40, turns_per_conv=6, update_frac=0.4,
                          delete_frac=0.1, n_shards=2)
    wal = make_wal(spec)
    lake = tempfile.mkdtemp(prefix="fault_")
    write_lake_config(lake, 4)
    crash_flag = os.path.join(tempfile.mkdtemp(prefix="flag_"), "crashed")

    shards = discover_shards(wal)
    registry_ref = ray.put(build_registry(wal, shards))
    ds = rd.from_items([{"wal_path": p} for p in shards],
                       override_num_blocks=len(shards))
    env = ds.map_batches(
        CrashingDecode,
        fn_constructor_kwargs={"crash_flag": crash_flag, "stop_at_lsn": None},
        batch_size=None, batch_format="pyarrow", concurrency=2, num_cpus=1,
        max_task_retries=-1)
    typed = env.map_batches(ProjectStage, fn_constructor_kwargs={
        "registry_ref": registry_ref, "oid": walgen.TRANSCRIPTS_OID},
        batch_format="pyarrow", concurrency=2, num_cpus=1)
    routed = typed.map_batches(Partitioner(4, (), 8), batch_format="pyarrow")
    ag = ApplyGroup(lake)

    def apply_fn(g: pa.Table) -> pa.Table:
        return ag(g)

    routed.groupby("partition_id").map_groups(
        apply_fn, batch_format="pyarrow").to_pandas()

    assert os.path.exists(crash_flag), "the injected crash never fired"
    assert_lake_matches(lake, oracle_df(spec))


def test_graph_shard_death_raises_then_rerun_succeeds(ray_session):
    """Pregel graph shards follow BSP restart-on-failure: killing a
    shard actor mid-computation surfaces a Ray actor error (no silent
    wrong answer), and a fresh run over the same materialized pairs
    succeeds with the exact same ranks."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray
    import ray.data as rd

    from pg_walstream_ray.pipelines.dedup import _PrShard

    rng = np.random.default_rng(7)
    a = rng.integers(0, 2000, 8000, dtype=np.int64)
    b = rng.integers(0, 2000, 8000, dtype=np.int64)
    keep = a != b
    tab = pa.table({"vec_a": pa.array(a[keep]), "vec_b": pa.array(b[keep])})

    # manual run so we can kill a shard between supersteps
    k = 4
    Shard = ray.remote(num_cpus=0.25)(_PrShard)
    actors = [Shard.remote(k) for _ in range(k)]
    src = np.concatenate([a[keep], b[keep]])
    dst = np.concatenate([b[keep], a[keep]])
    n_nodes = sum(ray.get([actors[i].load.remote(
        np.ascontiguousarray(src[src % k == i]),
        np.ascontiguousarray(dst[src % k == i])) for i in range(k)]))
    ray.get([x.init_rank.remote(1.0 / n_nodes) for x in actors])
    for _ in range(2):
        outs = [x.scatter.options(num_returns=k).remote() for x in actors]
        ray.get([actors[bb].gather.remote(0.0375, 0.85,
                                          *[outs[aa][bb]
                                            for aa in range(k)])
                 for bb in range(k)])
    ray.kill(actors[1])
    with pytest.raises((ray.exceptions.RayActorError,
                        ray.exceptions.ActorDiedError,
                        ray.exceptions.RayTaskError)):
        outs = [x.scatter.options(num_returns=k).remote() for x in actors]
        ray.get([actors[bb].gather.remote(0.0375, 0.85,
                                          *[outs[aa][bb]
                                            for aa in range(k)])
                 for bb in range(k)])

    # fresh run over the same pairs: deterministic, succeeds
    from pg_walstream_ray.pipelines.dedup import pagerank
    r1 = pagerank(rd.from_arrow(tab), iters=5).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    r2 = pagerank(rd.from_arrow(tab), iters=5).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert len(r1) > 0 and r1.equals(r2)
    assert abs(r1["rank"].sum() - 1.0) < 1e-9
