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
