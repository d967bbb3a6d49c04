"""Text-file corpus sources: JSONL (and gzip JSONL) ingestion into the
same (doc_id, text, ...) Dataset shape the parquet reader produces —
the raw-crawl entry format most corpus pipelines start from (parquet is
the lake format, JSONL is the wire format).

Scale shape: ``ray.data.read_json`` streams file-parallel blocks; the
converter keeps the JSONL source byte-identical to the parquet corpus
(oracled by comparing aggregates computed from each), and a cached
one-time export under /tmp gives the driver a deterministic fixture
without touching the read-only testdata."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_JSONL_CACHE = "/tmp/pgwr_jsonl"


def export_documents_jsonl(sf_dir: str, shards: int = 4) -> str:
    """Write (once) the sf_dir documents table as a sharded JSONL dir —
    the fixture standing in for a crawler's raw output."""
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(_JSONL_CACHE, f"docs-{key}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    import json

    n = t.num_rows
    per = max(1, -(-n // shards))
    for s in range(shards):
        rows = t.slice(s * per, per).to_pylist()
        with open(os.path.join(out, f"part-{s:03d}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    with open(done, "w") as f:
        f.write("ok")
    return out


def read_documents_jsonl(sf_dir: str):
    """documents as a Dataset sourced from JSONL shards (file-parallel
    ray.data.read_json), schema-normalized to the parquet reader's
    types."""
    import ray.data as rd

    path = export_documents_jsonl(sf_dir)
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".jsonl"))
    ds = rd.read_json(files)

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "text": pc.cast(t["text"], pa.string()),
            "lang": pc.cast(t["lang"], pa.string()),
            "source": pc.cast(t["source"], pa.string()),
            "n_chars": pc.cast(t["n_chars"], pa.int64())})

    return ds.map_batches(norm, batch_format="pyarrow")


def jsonl_corpus_stats(sf_dir: str):
    """Round-trip proof query: per-(lang, source) doc counts, char sums
    and text-hash XOR computed FROM THE JSONL SOURCE — must equal the
    same aggregates over the parquet table (the oracle), pinning the
    ingestion path end-to-end (parse, schema, value fidelity)."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import fast_hash64

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "source": t["source"].to_numpy(zero_copy_only=False),
            "n_docs": 1,
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            # md5-bridge per-text hash mod 2^31, SUMMED (order-free,
            # SQL-exact, no int64 overflow at any group size)
            "h": (pa_md5_int60(t["text"]) % (1 << 31)).astype(object),
        })
        agg = df.groupby(["lang", "source"], as_index=False).sum()
        agg["h"] = agg["h"].astype(object)
        return pa.table({
            "lang": pa.array(agg["lang"].astype(str)),
            "source": pa.array(agg["source"].astype(str)),
            "n_docs": pa.array(agg["n_docs"].to_numpy("int64")),
            "n_chars": pa.array(agg["n_chars"].to_numpy("int64")),
            "h": pa.array([int(x) for x in agg["h"]], pa.int64()),
        })

    return read_documents_jsonl(sf_dir) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "source"]).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
            Sum("h", alias_name="h_sum")) \
        .map_batches(lambda t: pa.table({
            "lang": t["lang"], "source": t["source"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
            "h_sum": pc.cast(t["h_sum"], pa.int64())}),
            batch_format="pyarrow")


def pa_md5_int60(texts):
    """Vectorized-enough md5 60-bit ints per text (the SQL bridge hash);
    one hashlib call per row is acceptable here because the stats query
    is a fixture-fidelity check, not a hot path."""
    import numpy as np

    vals = texts.to_pylist() if not isinstance(texts, list) else texts
    return np.array([int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
                     for v in vals], dtype=object)


_CSV_CACHE = "/tmp/pgwr_csv"


def export_events_csv(sf_dir: str, shards: int = 4) -> str:
    """Write (once) the events table as sharded CSV (ts in ISO micros) —
    the other ubiquitous wire format."""
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(_CSV_CACHE, f"events-{key}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    import pyarrow.csv as pacsv

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    n = t.num_rows
    per = max(1, -(-n // shards))
    for s in range(shards):
        pacsv.write_csv(t.slice(s * per, per),
                        os.path.join(out, f"part-{s:03d}.csv"))
    with open(done, "w") as f:
        f.write("ok")
    return out


def csv_events_stats(sf_dir: str):
    """CSV ingestion round-trip: per-event-type counts, value-cent sums
    and user XOR-free modular id sums computed FROM the CSV shards
    (ray.data.read_csv, file-parallel) — equal to the parquet oracle."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = export_events_csv(sf_dir)
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".csv"))
    ds = rd.read_csv(files)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "n": 1, "cents": cents,
            "uid_mod": t["user_id"].to_numpy(zero_copy_only=False)
            % 1_000_003,
        })
        agg = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("cents", alias_name="cents"),
            Sum("uid_mod", alias_name="uid_mod")) \
        .map_batches(lambda t: pa.table({
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "cents": pc.cast(t["cents"], pa.int64()),
            "uid_mod": pc.cast(t["uid_mod"], pa.int64())}),
            batch_format="pyarrow")
