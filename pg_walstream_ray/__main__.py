"""CLI entry point — runnable locally or via ``ray job submit``:

    python -m pg_walstream_ray gen     --events 1000000 --shards 16 --out /tmp/wal
    python -m pg_walstream_ray replay  --wal /tmp/wal --lake /tmp/lake \
                                       --partitions 32 [--stop-at-lsn L]
    python -m pg_walstream_ray snapshot --lake /tmp/lake [--out snap.parquet]
    python -m pg_walstream_ray watermark --lake /tmp/lake
    python -m pg_walstream_ray lookup --lake /tmp/lake --key conv00042
    python -m pg_walstream_ray refresh-mv --lake /tmp/lake --mv /tmp/mv

Owns the Ray session (the library never calls ray.init; driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pg_walstream_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="synthesize a sharded pgoutput WAL lake")
    g.add_argument("--events", type=int, default=1_000_000)
    g.add_argument("--shards", type=int, default=16)
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("replay", help="replay WAL -> transcript lake")
    r.add_argument("--wal", required=True)
    r.add_argument("--lake", required=True)
    r.add_argument("--partitions", type=int, default=32)
    r.add_argument("--stop-at-lsn", type=int, default=None)
    r.add_argument("--sink", choices=("lww", "history"), default="lww",
                   help="lww = upsert state; history = SCD2 version lake")

    rp = sub.add_parser("repartition", help="re-key a lake to a new "
                                            "partition count (watermarks "
                                            "and _lsn carried; resumable)")
    rp.add_argument("--lake", required=True)
    rp.add_argument("--out", required=True)
    rp.add_argument("--partitions", type=int, required=True)

    hi = sub.add_parser("history", help="SCD2 interval view of a "
                                        "sink=history lake (optionally "
                                        "AS OF an lsn)")
    hi.add_argument("--lake", required=True)
    hi.add_argument("--as-of-lsn", type=int, default=None)
    hi.add_argument("--out", default=None)

    s = sub.add_parser("snapshot", help="materialize the lake state")
    s.add_argument("--lake", required=True)
    s.add_argument("--out", default=None)

    w = sub.add_parser("watermark", help="print per-source applied watermarks")
    w.add_argument("--lake", required=True)

    c = sub.add_parser("compact", help="merge every partition's fragment "
                                       "chain to one base fragment")
    c.add_argument("--lake", required=True)

    fo = sub.add_parser("follow", help="tail the WAL dir: apply new "
                                       "segments until idle")
    fo.add_argument("--wal", required=True)
    fo.add_argument("--lake", required=True)
    fo.add_argument("--partitions", type=int, default=32)
    fo.add_argument("--poll-interval", type=float, default=2.0)
    fo.add_argument("--max-idle-polls", type=int, default=3)

    lk = sub.add_parser("lookup", help="point-lookup one conversation's "
                                       "state (partition-pruned read)")
    lk.add_argument("--lake", required=True)
    lk.add_argument("--key", required=True)

    mv = sub.add_parser("refresh-mv", help="incrementally refresh the "
                                           "per-conversation stats MV "
                                           "(O(changed partitions))")
    mv.add_argument("--lake", required=True)
    mv.add_argument("--mv", required=True)

    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False)
    try:
        if args.cmd == "gen":
            from .sources.walgen import WalSpec, write_wal_lake

            n_convs = max(args.shards, int(args.events / (10 * 1.35)))
            spec = WalSpec(n_convs=n_convs, turns_per_conv=10,
                           n_shards=args.shards, seed=args.seed,
                           tx_rows=200, keepalive_every=512)
            stats = write_wal_lake(spec, args.out, parallel=True)
            print(json.dumps({"shards": len(stats),
                              "dml_rows": sum(s["dml_rows"] for s in stats),
                              "out": args.out}))
        elif args.cmd == "replay":
            from .pipelines.cdc import run_cdc

            m = run_cdc(args.wal, args.lake, num_partitions=args.partitions,
                        stop_at_lsn=args.stop_at_lsn, sink=args.sink)
            print(json.dumps(m))
        elif args.cmd == "repartition":
            from .lake import repartition_lake

            print(json.dumps(repartition_lake(
                args.lake, args.out, num_partitions=args.partitions)))
        elif args.cmd == "history":
            from .lake import history_as_of, history_table

            t = history_as_of(args.lake, args.as_of_lsn) \
                if args.as_of_lsn is not None else history_table(args.lake)
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(t, args.out)
            print(json.dumps({"rows": t.num_rows,
                              "columns": t.column_names,
                              "out": args.out}))
        elif args.cmd == "snapshot":
            from .lake import snapshot_table

            t = snapshot_table(args.lake)
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(t, args.out)
            print(json.dumps({"rows": t.num_rows,
                              "columns": t.column_names,
                              "out": args.out}))
        elif args.cmd == "watermark":
            from .state.manifest import global_watermark, min_watermark

            print(json.dumps({"per_source": global_watermark(args.lake),
                              "min": min_watermark(args.lake)}))
        elif args.cmd == "compact":
            from .lake import compact_lake

            print(json.dumps(compact_lake(args.lake)))
        elif args.cmd == "refresh-mv":
            from .lake import refresh_mv

            print(json.dumps(refresh_mv(args.lake, args.mv)))
        elif args.cmd == "lookup":
            from .lake import lookup_key

            t = lookup_key(args.lake, args.key)
            print(json.dumps({"rows": t.num_rows,
                              "records": t.to_pylist()}, default=str))
        elif args.cmd == "follow":
            from .pipelines.cdc import run_cdc_follow

            print(json.dumps(run_cdc_follow(
                args.wal, args.lake, num_partitions=args.partitions,
                poll_interval_s=args.poll_interval,
                max_idle_polls=args.max_idle_polls)))
    finally:
        if owns_session:          # never tear down a caller-owned session
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
