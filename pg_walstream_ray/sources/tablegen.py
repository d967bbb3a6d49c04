"""Generic table -> pgoutput WAL encoder: turn ANY Arrow table into a
synthetic change stream for its own relation schema (the generalization of
walgen's transcripts-only generator; used for wide-table scenarios and
router inputs).

Values are rendered in pg text form (everything text-mode, SURVEY.md §1.2);
segments are transaction-closed with Relation re-sent per segment, so the
output composes with segment-parallel decode and resume pruning.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import pyarrow as pa

from ..wire import codec
from ..wire.frames import encode_xlogdata, unix_us_to_pg_ts
from ..stages.decode import relation_to_meta

BASE_TS_US = 1_700_000_000_000_000


def _text_cell(v) -> Optional[bytes]:
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    return str(v).encode()


def write_table_wal(rows: pa.Table, relation: codec.Relation, out_dir: str,
                    shard: int = 0, tx_rows: int = 200,
                    segment_rows: Optional[int] = None,
                    lsn_base: int = 1 << 44) -> dict:
    """Encode ``rows`` as one shard of Insert-only pgoutput WAL for
    ``relation`` (column order must match).  Writes
    ``out_dir/shard=NNNN/wal[-SSSS].parquet`` + relations.json sidecar."""
    cols = [rows[c].to_pylist() for c in
            [f.name for f in rows.schema]]
    assert len(cols) == len(relation.columns), "schema/relation mismatch"
    n = rows.num_rows

    frames: List[bytes] = []
    lsns: List[int] = []
    seg_breaks: List[int] = []
    rel_bytes = codec.encode_message(relation)
    sent_rel = False
    rows_in_segment = 0

    def emit(lsn, body):
        lsns.append(lsn)
        frames.append(encode_xlogdata(
            lsn, lsn, unix_us_to_pg_ts(BASE_TS_US + lsn), body))

    i = 0
    xid = 1000
    while i < n:
        if segment_rows and rows_in_segment >= segment_rows:
            seg_breaks.append(len(frames))
            sent_rel = False
            rows_in_segment = 0
        j = min(i + tx_rows, n)
        begin_lsn = lsn_base + 4 * i + 2
        commit_lsn = lsn_base + 4 * (j - 1) + 5
        emit(begin_lsn, codec.encode_message(codec.Begin(
            commit_lsn, unix_us_to_pg_ts(BASE_TS_US + commit_lsn),
            xid & 0xFFFFFFFF)))
        if not sent_rel:
            emit(begin_lsn + 1, rel_bytes)
            sent_rel = True
        for r in range(i, j):
            tup = [(b"t", _text_cell(col[r])) if col[r] is not None
                   else (b"n", None) for col in cols]
            emit(lsn_base + 4 * r + 4,
                 codec.encode_message(codec.Insert(relation.oid, tup)))
        emit(commit_lsn, codec.encode_message(codec.Commit(
            0, commit_lsn, commit_lsn + 1,
            unix_us_to_pg_ts(BASE_TS_US + commit_lsn))))
        rows_in_segment += j - i
        xid += 1
        i = j

    import pyarrow.parquet as pq

    d = os.path.join(out_dir, f"shard={shard:04d}")
    os.makedirs(d, exist_ok=True)
    tab = pa.table({"lsn": pa.array(lsns, pa.int64()),
                    "frame": pa.array(frames, pa.binary())})
    if segment_rows:
        bounds = [0, *seg_breaks, tab.num_rows]
        for seg, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            if hi > lo:
                pq.write_table(tab.slice(lo, hi - lo),
                               os.path.join(d, f"wal-{seg:04d}.parquet"),
                               compression="zstd")
    else:
        pq.write_table(tab, os.path.join(d, "wal.parquet"),
                       compression="zstd")
    with open(os.path.join(d, "relations.json"), "w") as f:
        json.dump([relation_to_meta(relation, 1, None)], f)
    return {"frames": tab.num_rows, "rows": n}


def write_multi_table_wal(tables, out_dir: str, shard: int = 0,
                          lsn_base: int = 1 << 44) -> dict:
    """Multi-table-TRANSACTION WAL: one shard whose every transaction
    interleaves rows of ALL relations — tx ``t`` carries rows
    ``[t*k_i, (t+1)*k_i)`` of each table ``i`` (ragged tails allowed).
    The fixture for cross-table atomicity: a bounded replay must cut BOTH
    tables at the same transaction boundary or the sink lost the
    reference's commit-unit contract.

    ``tables``: list of (rows: pa.Table, relation: codec.Relation,
    k: rows-per-tx).  Frame slots are AFFINE — every tx reserves
    ``B = 1 + len(tables) + sum(k_i) + 1`` LSN slots (begin, one Relation
    slot per table — frames emitted in tx 0 only, slots always reserved —
    then the inserts, then commit) and slots for absent ragged rows are
    skipped, not renumbered, so callers can compute any tx's LSNs
    arithmetically:
    ``commit_lsn(t) = lsn_base + t*B + B - 1``.

    Returns {"frames", "n_txs", "block", "lsn_base"}.
    """
    import pyarrow.parquet as pq

    ks = [k for _, _, k in tables]
    ns = [rows.num_rows for rows, _, _ in tables]
    n_txs = max((n + k - 1) // k for n, k in zip(ns, ks))
    B = 1 + len(tables) + sum(ks) + 1
    cols_per = [[rows[f.name].to_pylist() for f in rows.schema]
                for rows, _, _ in tables]
    rels = [codec.encode_message(rel) for _, rel, _ in tables]

    frames: List[bytes] = []
    lsns: List[int] = []

    def emit(lsn, body):
        lsns.append(lsn)
        frames.append(encode_xlogdata(
            lsn, lsn, unix_us_to_pg_ts(BASE_TS_US + lsn), body))

    for t in range(n_txs):
        base = lsn_base + t * B
        commit_lsn = base + B - 1
        emit(base, codec.encode_message(codec.Begin(
            commit_lsn, unix_us_to_pg_ts(BASE_TS_US + commit_lsn),
            (1000 + t) & 0xFFFFFFFF)))
        slot = base + 1
        for rb in rels:
            if t == 0:       # Relation sent once; slots stay reserved so
                emit(slot, rb)   # the LSN layout is affine in t
            slot += 1
        for (rows, rel, k), cols, n in zip(tables, cols_per, ns):
            for p in range(k):
                r = t * k + p
                if r < n:
                    tup = [(b"t", _text_cell(col[r]))
                           if col[r] is not None else (b"n", None)
                           for col in cols]
                    emit(slot, codec.encode_message(
                        codec.Insert(rel.oid, tup)))
                slot += 1            # absent ragged row: slot reserved
        emit(commit_lsn, codec.encode_message(codec.Commit(
            0, commit_lsn, commit_lsn + 1,
            unix_us_to_pg_ts(BASE_TS_US + commit_lsn))))

    d = os.path.join(out_dir, f"shard={shard:04d}")
    os.makedirs(d, exist_ok=True)
    tab = pa.table({"lsn": pa.array(lsns, pa.int64()),
                    "frame": pa.array(frames, pa.binary())})
    pq.write_table(tab, os.path.join(d, "wal.parquet"),
                   compression="zstd")
    with open(os.path.join(d, "relations.json"), "w") as f:
        json.dump([relation_to_meta(rel, 1, None)
                   for _, rel, _ in tables], f)
    return {"frames": tab.num_rows, "n_txs": n_txs, "block": B,
            "lsn_base": lsn_base}
