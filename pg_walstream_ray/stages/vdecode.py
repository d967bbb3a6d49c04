"""Vectorized pgoutput segment decode: numpy over the raw frame buffers.

The scalar ``PgOutputDecoder`` walks every tuple column in Python
(~100-140k events/s/core); this module decodes a whole segment's DML in
a handful of numpy gathers instead, at millions of events/s/core, while
delegating the (rare) control frames — Begin/Commit/Relation/Stream*/
Truncate/Message/... — to the *same* scalar state machine so semantics
stay identical by construction:

1. One vectorized pass classifies every frame (tag byte at a fixed
   offset) and extracts LSNs.
2. The few control frames (<2% of a stream) run through a CLONE of the
   caller's ``PgOutputDecoder`` in order, recording transaction spans
   (Begin..Commit), streamed-xid resolutions (StreamCommit/Abort),
   relation-version epochs and the released control rows with their
   release positions.
3. DML frames are decoded columnar: group by (op, stream-ness, tuple
   marker, ncols), then peel tuple columns with per-column numpy gathers
   — value bytes are collected with a single fancy-index per tuple side
   and wrapped zero-copy into Arrow list<string> arrays.
4. Rows are ordered exactly as the scalar decoder releases them
   (sort by (release event position, frame position)) and merged with
   the control rows into envelope batches.

Binary ('b') column tags — protocol ``with_binary`` mode, the reference's
best-case config (stream.rs:219-222, LOAD_TEST_COMPARISON.md:10) — stay
on the fast path: values render to the pg hex text form with a
vectorized nibble LUT.  Falls back (returns None, caller uses the scalar
path) on anything outside the hot profile: two-phase frames,
transactions left unresolved at segment end, bounded replay, or parse
anomalies.  Correctness is pinned by tests comparing the vectorized
output byte-for-byte against the scalar decoder over the scenario corpus
and random WalSpecs (tests/test_vdecode.py).

``try_decode_segment_typed`` additionally fuses the typed projection INTO
the decode: per-column value arrays are built straight from the wire
buffers and cast to the unified schema, skipping the ``list<string>``
envelope build + ``list_element`` re-split entirely (round-1's measured
map-side DRAM ceiling — see BASELINE.md).

Reference parity notes: the DML wire layout decoded here is
protocol.rs:864-951 (Insert/Update/Delete) + protocol.rs:1294-1325
(tuple data); the release discipline is the safe-transaction-consumer
contract (commit-complete only).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..wire import codec
from ..wire.frames import XLOGDATA_HEADER_LEN, pg_ts_to_unix_us
from .decode import ENVELOPE_SCHEMA, PgOutputDecoder

logger = logging.getLogger(__name__)

_H = XLOGDATA_HEADER_LEN            # 25
_PREPARED_TAGS = (98, 80, 75, 114, 112)   # b P K r p — two-phase family


class _Fallback(Exception):
    pass


def _be(data: np.ndarray, idx: np.ndarray, nbytes: int) -> np.ndarray:
    """Big-endian uint gather at arbitrary positions (vectorized)."""
    out = data[idx].astype(np.int64)
    for k in range(1, nbytes):
        out = (out << 8) | data[idx + k]
    return out


def _clone_decoder(dec: PgOutputDecoder) -> PgOutputDecoder:
    c = PgOutputDecoder(emit_control_rows=dec.emit_control_rows,
                        collect_dml=dec.collect_dml, source=dec.source,
                        version_map=dec.version_map,
                        origin_filter=dec.origin_filter)
    c.relations = dict(dec.relations)
    c.rel_versions = dict(dec.rel_versions)
    c._relmeta = dict(dec._relmeta)
    c._next_version = dec._next_version
    c.last_received_lsn = dec.last_received_lsn
    c.last_commit_lsn = dec.last_commit_lsn
    return c


def _adopt(dec: PgOutputDecoder, c: PgOutputDecoder) -> None:
    dec.relations = c.relations
    dec.rel_versions = c.rel_versions
    dec._relmeta = c._relmeta
    dec._next_version = c._next_version
    dec.last_received_lsn = max(dec.last_received_lsn, c.last_received_lsn)
    dec.last_commit_lsn = max(dec.last_commit_lsn, c.last_commit_lsn)
    dec.unknown_relation_drops += c.unknown_relation_drops


def _frames_np(col) -> Tuple[np.ndarray, np.ndarray]:
    """Arrow binary column -> (data bytes, per-frame start offsets[+end])."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise _Fallback("null frames")
    bufs = col.buffers()
    if pa.types.is_large_binary(col.type):
        offs = np.frombuffer(bufs[1], np.int64)
    else:
        offs = np.frombuffer(bufs[1], np.int32).astype(np.int64)
    offs = offs[col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], np.uint8)
    # the tuple-peel index math below is int32 (bandwidth: the gather index
    # arrays are the module's biggest allocation); a >2 GiB segment would
    # silently wrap those indices, so route it to the scalar path instead
    if len(data) > np.iinfo(np.int32).max - 8 or (
            len(offs) and int(offs[-1]) > np.iinfo(np.int32).max - 8):
        raise _Fallback("segment exceeds int32 index range")
    return data, offs


_HEX_LUT = np.frombuffer(b"0123456789abcdef", np.uint8)


def _scan_tuples(data: np.ndarray, starts: np.ndarray):
    """One vectorized pass over a TupleData per row at ``starts``.

    Returns (v_start[n,ncols], v_len[n,ncols], code[n,ncols], end offsets).
    Tags: 't' (text) and 'b' (binary, protocol with_binary mode,
    stream.rs:219-222) are length-prefixed; 'n'/'u' are empty.  Rows must
    share a column count (caller groups by ncols first).

    int32 index math throughout: the gather index arrays are the module's
    biggest memory consumers (20M+ elements for a 250k x 10 segment) and
    concurrent decoders are bandwidth-bound, not compute-bound — int64
    indices measurably slow the whole pipeline at 16+ parallel decoders.
    (A >2 GiB segment falls back to the scalar path in _frames_np.)
    """
    n = len(starts)
    ncols_arr = _be(data, starts, 2)
    ncols = int(ncols_arr[0])
    if not np.all(ncols_arr == ncols):
        raise _Fallback("mixed ncols in group")        # caller groups; guard
    off = (starts + 2).astype(np.int32)
    v_start = np.empty((n, ncols), np.int32)
    v_len = np.zeros((n, ncols), np.int32)
    code = np.empty((n, ncols), np.uint8)
    for j in range(ncols):
        t = data[off]
        code[:, j] = t
        has_len = (t == 116) | (t == 98)               # 't' | 'b'
        if not np.all(has_len | (t == 110) | (t == 117)):
            raise _Fallback("unknown tuple tag")
        ln = np.zeros(n, np.int32)
        if has_len.any():
            it = off[has_len] + 1
            ln[has_len] = ((data[it].astype(np.int32) << 24)
                           | (data[it + 1].astype(np.int32) << 16)
                           | (data[it + 2].astype(np.int32) << 8)
                           | data[it + 3])
        v_start[:, j] = off + 5
        v_len[:, j] = ln
        off = off + 1 + np.where(has_len, 4 + ln, 0).astype(np.int32)
    return v_start, v_len, code, off


def _values_from_scan(data: np.ndarray, fs: np.ndarray, fl: np.ndarray,
                      fc: np.ndarray) -> pa.Array:
    """Flat per-value (start, len, code) arrays -> utf8 values Array.

    'n'/'u' -> null; 't' -> raw bytes (one fancy-index gather, zero-copy
    Arrow wrap); 'b' -> pg hex bytea text form '\\x…' built with a
    vectorized nibble-LUT (column_value.rs:17-56 text rendering) — binary
    mode stays on the fast path instead of falling back to the 5-10x
    slower scalar decoder.
    """
    is_t = fc == 116
    is_b = fc == 98
    out_len = np.where(is_t, fl, 0).astype(np.int64) \
        + np.where(is_b, 2 * fl.astype(np.int64) + 2, 0)
    cum = np.cumsum(out_len)
    total = int(cum[-1]) if len(cum) else 0
    if total > np.iinfo(np.int32).max - 8:
        raise _Fallback("value bytes exceed int32 offset range")
    char_off = np.empty(len(fl) + 1, np.int32)
    char_off[0] = 0
    char_off[1:] = cum
    if total and is_b.any():
        chars = np.empty(total, np.uint8)
        if is_t.any():
            tl = fl[is_t]
            csT = np.cumsum(tl)
            run = np.arange(int(csT[-1]) if len(csT) else 0, dtype=np.int32)
            src = run + np.repeat((fs[is_t] - (csT - tl)).astype(np.int32),
                                  tl)
            dst = run + np.repeat(
                (char_off[:-1][is_t] - (csT - tl)).astype(np.int32), tl)
            chars[dst] = data[src]
        bl = fl[is_b]
        bout = char_off[:-1][is_b]
        chars[bout] = 0x5C                               # '\'
        chars[bout + 1] = 0x78                           # 'x'
        csB = np.cumsum(bl)
        totB = int(csB[-1]) if len(csB) else 0
        if totB:
            run = np.arange(totB, dtype=np.int32)
            src = run + np.repeat((fs[is_b] - (csB - bl)).astype(np.int32),
                                  bl)
            raw = data[src]
            # per source byte k of value v: dest = out_start(v) + 2 + 2k
            dstb = 2 * run + np.repeat(
                (bout + 2 - 2 * (csB - bl)).astype(np.int32), bl)
            chars[dstb] = _HEX_LUT[raw >> 4]
            chars[dstb + 1] = _HEX_LUT[raw & 15]
    elif total:
        # text-only: ONE gather for all value bytes
        gather = np.arange(total, dtype=np.int32) + np.repeat(
            (fs - (cum - fl)).astype(np.int32), fl)
        chars = data[gather]
    else:
        chars = np.empty(0, np.uint8)
    valid = is_t | is_b                                # null for 'n'/'u'
    # pa.py_buffer wraps the numpy arrays zero-copy (holds a reference);
    # .tobytes() round-trips would copy ~2x the segment payload per tuple
    # side — pure DRAM traffic, which is what caps concurrent decoders on
    # a shared box
    vbuf = pa.py_buffer(np.packbits(valid, bitorder="little"))
    return pa.Array.from_buffers(
        pa.utf8(), len(fl),
        [vbuf, pa.py_buffer(char_off), pa.py_buffer(chars)],
        null_count=int((~valid).sum()))


def _peel_tuples(data: np.ndarray, starts: np.ndarray):
    """Envelope form: (values ListArray [list<string>], unchanged ListArray
    [list<bool>], end offsets) — row-major flatten, one value build."""
    v_start, v_len, code, off = _scan_tuples(data, starts)
    n, ncols = code.shape
    values = _values_from_scan(data, v_start.reshape(-1), v_len.reshape(-1),
                               code.reshape(-1))
    list_off = pa.array(np.arange(0, (n + 1) * ncols, ncols, dtype=np.int32),
                        pa.int32())
    vals = pa.ListArray.from_arrays(list_off, values)
    unch = pa.ListArray.from_arrays(
        list_off, pa.array(code.reshape(-1) == 117))
    return vals, unch, off


def _const_str(s: str, n: int) -> pa.Array:
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, np.int32)), pa.array([s])).cast(pa.string())


def _dict_str(codes: np.ndarray, values: List[str]) -> pa.Array:
    return pa.DictionaryArray.from_arrays(
        pa.array(codes.astype(np.int32)), pa.array(values, pa.string())
    ).cast(pa.string())


def _vdecode_ready(dec: PgOutputDecoder) -> bool:
    return not (dec.stop_at_lsn is not None or not dec.collect_dml
                or dec.tx_buf or dec.stream_bufs or dec.prepared
                or dec.in_stream_xid is not None or dec._released)


def try_decode_segment(dec: PgOutputDecoder, frames_col,
                       out_batch_rows: int = 32768) \
        -> Optional[List[pa.RecordBatch]]:
    """Vectorized decode of one segment's frame column using (and
    advancing) ``dec``'s relation/watermark state.  Returns envelope
    batches (sliced to ``out_batch_rows``; pass 0/None for one
    whole-segment batch), or None to signal the caller to use the scalar
    path (``dec`` is left untouched in that case)."""
    if not _vdecode_ready(dec):
        return None
    try:
        return _decode_segment(dec, frames_col, out_batch_rows)
    except _Fallback as ex:
        logger.debug("vectorized decode fallback: %s", ex)
        return None
    except Exception:                      # noqa: BLE001 — any parse anomaly
        # correctness-preserving fallback: _adopt runs last, so dec is
        # untouched and the scalar path re-decodes the segment cleanly
        logger.warning("vectorized decode failed; using scalar path",
                       exc_info=True)
        return None


def try_decode_segment_typed(dec: PgOutputDecoder, frames_col, registry,
                             oid: int) -> Optional[List[pa.Table]]:
    """Fused vectorized decode + typed projection of one segment: emits
    tables on the TYPED schema (``stages/typed.py`` CONTROL_COLS + unified
    payload + ``_unchanged_*``) directly from the wire buffers — the
    ``list<string>`` envelope is never built and never re-split, saving
    ~2 full payload passes per segment (the round-1 map-side DRAM
    ceiling).  Semantically identical to
    ``project_envelope(decode(segment))`` up to row order (downstream LWW
    orders by lsn, not row position).  Returns None to fall back (caller
    then uses the scalar decode + projection path; ``dec`` untouched)."""
    if not _vdecode_ready(dec):
        return None
    try:
        return _decode_segment_typed(dec, frames_col, registry, oid)
    except _Fallback as ex:
        logger.debug("typed vectorized decode fallback: %s", ex)
        return None
    except Exception:                      # noqa: BLE001 — any parse anomaly
        logger.warning("typed vectorized decode failed; using scalar path",
                       exc_info=True)
        return None


class _SegCtx:
    """Shared per-segment scan result: frame classification, control-scan
    bookkeeping and per-DML-row context arrays — consumed by both the
    envelope emitter (_decode_segment) and the typed emitter
    (_decode_segment_typed)."""

    __slots__ = ("data", "tag", "lsn", "c", "f", "keep", "hdr", "oid_arr",
                 "row_xid", "commit_lsn_row", "commit_ts_row", "seq_row",
                 "rel_code", "code_meta", "ctrl_seq", "ctrl_fidx")


def _scan_segment(dec: PgOutputDecoder, frames_col) -> Optional[_SegCtx]:
    data, offs = _frames_np(frames_col)
    n_frames = len(offs) - 1
    if n_frames == 0:
        return None
    base = offs[:-1]
    flen = np.diff(offs)
    kind = data[base]
    w = kind == 119                                     # 'w' XLogData
    if not np.all(w | (kind == 107)):
        raise _Fallback("unknown frame kind")
    if np.any(flen[w] < _H + 1):
        raise _Fallback("short frame")
    tag = np.zeros(n_frames, np.uint8)
    tag[w] = data[base[w] + _H]
    is_dml = w & np.isin(tag, (73, 85, 68))             # I / U / D
    lsn = np.zeros(n_frames, np.int64)
    lsn[w] = _be(data, base[w] + 1, 8)

    # ---- control scan (scalar, in order, on a clone) --------------------
    c = _clone_decoder(dec)
    ctrl_idx = np.nonzero(~is_dml)[0]
    begins: List[int] = []
    begin_xids: List[int] = []
    # per-tx close records: [boundary_idx, commit_lsn, ts_us, release_idx]
    # — for a plain Commit boundary == release; for a prepared tx the
    # boundary is the Prepare frame and the release is the CommitPrepared
    # (lsn/ts stay -1 = dropped until the gid resolves)
    commits: List[list] = []
    prep_pending: Dict[str, int] = {}              # gid -> commits index
    stream_prep: Dict[str, int] = {}               # gid -> streamed xid
    shadow_prepared: Dict[str, List[int]] = {}     # gid -> ctrl frame idxs
    s_starts: List[int] = []
    s_stops: List[int] = []
    stream_done: Dict[int, Tuple[int, int, int]] = {}  # xid->(lsn,ts,idx)
    rel_changes: Dict[int, List[Tuple[int, int, str, str]]] = {
        oid: [(-1, v[0], v[1], v[2])] for oid, v in dec._relmeta.items()}
    ctrl_fidx: List[int] = []                      # frame idx per ctrl row
    ctrl_seq: List[int] = []                       # release seq per ctrl row
    shadow_tx: List[int] = []
    shadow_stream: Dict[int, List[int]] = {}

    for i in ctrl_idx.tolist():
        s, e = int(base[i]), int(base[i] + flen[i])
        if kind[i] == 107:                          # keepalive
            wal_end = int.from_bytes(data[s + 1:s + 9].tobytes(), "big")
            if wal_end > c.last_received_lsn:
                c.last_received_lsn = wal_end
            continue
        body = data[s + _H:e].tobytes()
        t = tag[i]
        li = int(lsn[i])
        if li > c.last_received_lsn:
            c.last_received_lsn = li
        pre_rel = len(c._released)
        msg, _sx = codec.parse_message(body,
                                       in_stream=c.in_stream_xid is not None)
        if t == 66:                                 # Begin
            begins.append(i)
            begin_xids.append(msg.xid)
        elif t == 67:                               # Commit
            if c._tx_foreign:
                # origin='none', foreign tx: dropped marker — its DML rows
                # keep commit_lsn -1 and are never released (the clone
                # discards the shadowed control rows at its own Commit)
                commits.append([i, -1, -1, i])
            else:
                commits.append([i, msg.commit_lsn,
                                pg_ts_to_unix_us(msg.commit_ts), i])
        elif t == 98:                               # BeginPrepare: opens a tx
            begins.append(i)
            begin_xids.append(msg.xid)
        elif t == 80:                               # Prepare: closes the tx's
            # DML span; release context stays pending on the gid (dropped
            # -1 markers unless CommitPrepared resolves it in this segment)
            commits.append([i, -1, -1, i])
            if c._tx_foreign:
                pass            # foreign prepared tx: stays dropped forever
            else:
                prep_pending[msg.gid] = len(commits) - 1
        elif t == 112:                              # StreamPrepare
            if msg.xid in c._foreign_streams:
                # foreign streamed prepared tx: leave the gid unregistered
                # — its xid never resolves here, which routes the segment
                # to the scalar path (correct, rare)
                pass
            else:
                stream_prep[msg.gid] = msg.xid
        elif t == 75:                               # CommitPrepared
            ts_us = pg_ts_to_unix_us(msg.commit_ts)
            if msg.gid in prep_pending:
                j = prep_pending.pop(msg.gid)
                commits[j][1:] = [msg.commit_lsn, ts_us, i]
            elif msg.gid in stream_prep:
                stream_done[stream_prep.pop(msg.gid)] = \
                    (msg.commit_lsn, ts_us, i)
            # unknown gid (prepared before the replay window): nothing
        elif t == 114:                              # RollbackPrepared
            if msg.gid in prep_pending:
                prep_pending.pop(msg.gid)           # stays dropped (-1)
            elif msg.gid in stream_prep:
                stream_done[stream_prep.pop(msg.gid)] = (0, 0, -1)
        elif t == 83:                               # StreamStart
            s_starts.append(i)
            shadow_stream.setdefault(msg.xid, [])
        elif t == 69:                               # StreamStop
            s_stops.append(i)
        elif t == 99:                               # StreamCommit
            if msg.xid in c._foreign_streams:       # origin='none': discard
                stream_done[msg.xid] = (0, 0, -1)
            else:
                stream_done[msg.xid] = (msg.commit_lsn,
                                        pg_ts_to_unix_us(msg.commit_ts), i)
        elif t == 65:                               # StreamAbort
            stream_done[msg.xid] = (0, 0, -1)       # discarded
        pre_tx = len(c.tx_buf)
        pre_sb = {x: len(b) for x, b in c.stream_bufs.items()}
        # capture foreign state BEFORE dispatch (the clone's own boundary
        # handling resets it) so the shadow bookkeeping mirrors exactly
        # what the clone released vs discarded
        pre_foreign = c._tx_foreign
        pre_foreign_stream = t in (99, 112) and \
            msg.xid in c._foreign_streams
        c._dispatch(body, li)
        # mirror frame indices of any rows the dispatch buffered/released
        if t == 82:                                 # Relation (immediate)
            for _ in range(len(c._released) - pre_rel):
                ctrl_fidx.append(i)
                ctrl_seq.append(i)
        elif t == 67:                               # Commit released tx_buf
            if not pre_foreign:
                ctrl_fidx.extend(shadow_tx)
                ctrl_seq.extend([i] * len(shadow_tx))
            shadow_tx = []
        elif t == 99:                               # StreamCommit released
            rows = shadow_stream.pop(msg.xid, [])
            if not pre_foreign_stream:
                ctrl_fidx.extend(rows)
                ctrl_seq.extend([i] * len(rows))
        elif t == 65:                               # StreamAbort discarded
            shadow_stream.pop(msg.xid, None)
        elif t == 80:                               # Prepare staged tx_buf
            shadow_prepared[msg.gid] = [] if pre_foreign else shadow_tx
            shadow_tx = []
        elif t == 112:                              # StreamPrepare staged
            rows = shadow_stream.pop(msg.xid, [])
            shadow_prepared[msg.gid] = [] if pre_foreign_stream else rows
        elif t == 75:                               # CommitPrepared released
            rows = shadow_prepared.pop(msg.gid, [])
            ctrl_fidx.extend(rows)
            ctrl_seq.extend([i] * len(rows))
        elif t == 114:                              # RollbackPrepared dropped
            shadow_prepared.pop(msg.gid, None)
        elif t == 98:                               # BeginPrepare: no rows
            pass
        else:                                       # Y/O/M/T buffered rows
            grew = len(c.tx_buf) - pre_tx
            if grew:
                shadow_tx.extend([i] * grew)
            for x, b in c.stream_bufs.items():
                g = len(b) - pre_sb.get(x, 0)
                if g:
                    shadow_stream.setdefault(x, []).extend([i] * g)
        if t == 82:                                 # record version epoch
            oid = msg.oid
            ver, ns, name = c._relmeta[oid]
            rel_changes.setdefault(oid, []).append((i, ver, ns, name))

    if c.tx_buf or any(c.stream_bufs.values()) or c.prepared \
            or c.in_stream_xid is not None:
        raise _Fallback("unresolved transaction at segment end")
    if len(begins) != len(commits):
        raise _Fallback("unbalanced begin/commit")

    # ---- per-frame context for DML rows ---------------------------------
    ctx = _SegCtx()
    ctx.data, ctx.tag, ctx.lsn, ctx.c = data, tag, lsn, c
    ctx.ctrl_seq, ctx.ctrl_fidx = ctrl_seq, ctrl_fidx
    dml_idx = np.nonzero(is_dml)[0]
    ctx.f = dml_idx
    if len(dml_idx) == 0:
        ctx.keep = np.zeros(0, bool)
        ctx.hdr = np.zeros(0, np.int64)
        ctx.oid_arr = np.zeros(0, np.int64)
        ctx.row_xid = np.zeros(0, np.int64)
        ctx.commit_lsn_row = np.zeros(0, np.int64)
        ctx.commit_ts_row = np.zeros(0, np.int64)
        ctx.seq_row = np.zeros(0, np.int64)
        ctx.rel_code = np.zeros(0, np.int64)
        ctx.code_meta = []
        return ctx
    if True:
        b_arr = np.asarray(begins, np.int64)
        c_idx = np.asarray([x[0] for x in commits], np.int64)
        c_lsn = np.asarray([x[1] for x in commits], np.int64)
        c_ts = np.asarray([x[2] for x in commits], np.int64)
        c_seq = np.asarray([x[3] for x in commits], np.int64)
        bx = np.asarray(begin_xids, np.int64)
        ss = np.asarray(s_starts, np.int64)
        se = np.asarray(s_stops + [n_frames] * (len(s_starts) - len(s_stops)),
                        np.int64)
        f = dml_idx
        if len(ss):
            si = np.searchsorted(ss, f, side="right") - 1
            in_stream = (si >= 0) & (f < se[np.clip(si, 0, None)])
        else:
            in_stream = np.zeros(len(f), bool)

        hdr = base[f] + _H + 1 + np.where(in_stream, 4, 0)
        xid_stream = np.zeros(len(f), np.int64)
        if in_stream.any():
            xid_stream[in_stream] = _be(data, base[f[in_stream]] + _H + 1, 4)
        oid_arr = _be(data, hdr, 4)

        # plain-tx assignment
        if len(b_arr):
            ordn = np.searchsorted(b_arr, f, side="right") - 1
            plain_ok = (ordn >= 0) & (f < c_idx[np.clip(ordn, 0, None)])
        else:
            ordn = np.zeros(len(f), np.int64)
            plain_ok = np.zeros(len(f), bool)
        if np.any(~in_stream & ~plain_ok):
            raise _Fallback("DML outside any transaction")

        # streamed-tx resolution
        released = np.ones(len(f), bool)
        row_xid = np.where(in_stream, xid_stream,
                           bx[np.clip(ordn, 0, None)] if len(b_arr) else 0)
        commit_lsn_row = np.where(
            plain_ok & ~in_stream,
            c_lsn[np.clip(ordn, 0, None)] if len(c_idx) else 0, 0)
        commit_ts_row = np.where(
            plain_ok & ~in_stream,
            c_ts[np.clip(ordn, 0, None)] if len(c_idx) else 0, 0)
        seq_row = np.where(plain_ok & ~in_stream,
                           c_seq[np.clip(ordn, 0, None)] if len(c_seq) else 0,
                           0)
        if len(c_lsn):
            # prepared txs whose gid resolved to RollbackPrepared (or never
            # resolved inside this segment — impossible here, the
            # unresolved-at-end check below falls back first) keep the -1
            # drop marker: their rows are never released
            dropped = plain_ok & ~in_stream \
                & (c_lsn[np.clip(ordn, 0, None)] < 0)
        else:
            dropped = np.zeros(len(f), bool)
        released[dropped] = False
        if in_stream.any():
            for x in np.unique(xid_stream[in_stream]):
                m = in_stream & (xid_stream == x)
                done = stream_done.get(int(x))
                if done is None:
                    raise _Fallback("unresolved streamed xid")
                if done[2] < 0:                     # aborted
                    released[m] = False
                else:
                    commit_lsn_row[m] = done[0]
                    commit_ts_row[m] = done[1]
                    seq_row[m] = done[2]

        # relation-version epochs + unknown-relation drop
        rel_code = np.full(len(f), -1, np.int64)
        code_meta: List[Tuple[int, int, str, str]] = []   # (oid,ver,ns,name)
        for oid in np.unique(oid_arr):
            m = oid_arr == oid
            ch = rel_changes.get(int(oid))
            if not ch:
                dec_unknown = int(m.sum())
                c.unknown_relation_drops += dec_unknown
                released[m] = False
                continue
            pos_arr = np.asarray([p for p, *_ in ch], np.int64)
            which = np.searchsorted(pos_arr, f[m], side="right") - 1
            if np.any(which < 0):
                c.unknown_relation_drops += int((which < 0).sum())
                mm = np.nonzero(m)[0][which < 0]
                released[mm] = False
                which = np.clip(which, 0, None)
            codes = np.empty(len(which), np.int64)
            for k, (_p, ver, ns, name) in enumerate(ch):
                code_meta.append((int(oid), ver, ns, name))
                codes[which == k] = len(code_meta) - 1
            rel_code[m] = codes

        ctx.keep = released
        ctx.hdr = hdr
        ctx.oid_arr = oid_arr
        ctx.row_xid = row_xid
        ctx.commit_lsn_row = commit_lsn_row
        ctx.commit_ts_row = commit_ts_row
        ctx.seq_row = seq_row
        ctx.rel_code = rel_code
        ctx.code_meta = code_meta
    return ctx


def _decode_segment(dec: PgOutputDecoder, frames_col,
                    out_batch_rows: int = 32768) -> List[pa.RecordBatch]:
    ctx = _scan_segment(dec, frames_col)
    if ctx is None:
        return []
    data, tag, lsn, c, f = ctx.data, ctx.tag, ctx.lsn, ctx.c, ctx.f
    out_tables: List[pa.Table] = []
    # ---- decode DML groups vectorized -----------------------------------
    if len(f):
        for op_tag, op_name in ((73, "insert"), (85, "update"),
                                (68, "delete")):
            gm = ctx.keep & (tag[f] == op_tag)
            if not gm.any():
                continue
            for marker_split in _marker_groups(data, ctx.hdr, op_tag, gm):
                sub, before_start, after_start, key_type = marker_split
                if not sub.any():
                    continue
                for tbl in _emit_group(
                        data, f, sub, before_start, after_start, key_type,
                        op_name, lsn, ctx.row_xid, ctx.commit_lsn_row,
                        ctx.commit_ts_row, ctx.seq_row, ctx.rel_code,
                        ctx.code_meta, ctx.oid_arr, dec.source):
                    out_tables.append(tbl)

    # ---- control rows table ---------------------------------------------
    ctrl_batch = c.take_batch()
    if ctrl_batch is not None:
        t = pa.Table.from_batches([ctrl_batch])
        t = t.append_column("_seq", pa.array(np.asarray(ctx.ctrl_seq,
                                                        np.int64)))
        t = t.append_column("_fidx", pa.array(np.asarray(ctx.ctrl_fidx,
                                                         np.int64)))
        out_tables.append(t)

    if not out_tables:
        _adopt(dec, c)
        return []
    merged = pa.concat_tables(out_tables)
    order = pa.compute.sort_indices(
        merged.select(["_seq", "_fidx"]),
        sort_keys=[("_seq", "ascending"), ("_fidx", "ascending")])
    merged = merged.take(order).drop(["_seq", "_fidx"])
    merged = merged.select([fld.name for fld in ENVELOPE_SCHEMA])
    merged = merged.cast(ENVELOPE_SCHEMA).combine_chunks()
    # zero-copy slices: restore the scalar path's batch granularity so the
    # downstream stages pipeline per chunk instead of per whole segment
    # (the fused stage passes 0: it compacts per whole segment, then
    # slices its own routed output)
    out: List[pa.RecordBatch] = []
    step = out_batch_rows or merged.num_rows or 1
    for s in range(0, merged.num_rows, step):
        out.extend(merged.slice(s, step).to_batches())
    _adopt(dec, c)                 # mutate dec only once nothing can throw
    return out


def _decode_segment_typed(dec: PgOutputDecoder, frames_col, registry,
                          oid: int) -> List[pa.Table]:
    """Typed-direct emit: per (op, marker, ncols, rel_version) group, build
    per-COLUMN utf8 value arrays straight from the wire buffers and cast
    them to the unified typed schema — no list<string> envelope, no
    list_element re-split (round-1's measured map-side DRAM ceiling).
    Row order is NOT the scalar release order (irrelevant downstream:
    LWW/apply order by lsn)."""
    from ..functions.pgtext import cast_pg_text
    from .typed import project_envelope

    ctx = _scan_segment(dec, frames_col)
    if ctx is None:
        return []
    data, tag, lsn, c, f = ctx.data, ctx.tag, ctx.lsn, ctx.c, ctx.f
    unified = registry.unified_arrow_schema(oid)
    ver_of_code = np.asarray([cm[1] for cm in ctx.code_meta] or [0],
                             np.int64)
    out: List[pa.Table] = []

    def emit(sub, before_start, after_start, key_type, op_name):
        idx = np.nonzero(sub)[0]
        first_start = before_start if before_start is not None \
            else after_start
        ncols_first = _be(data, first_start[idx], 2)
        for nc in np.unique(ncols_first):
            rows0 = idx[ncols_first == nc]
            codes = ctx.rel_code[rows0]
            if np.any(codes < 0):
                raise _Fallback("released row without relation")
            vers = ver_of_code[codes]
            for v in np.unique(vers):
                rows = rows0[vers == v]
                rv = registry.maybe(oid, int(v))
                if rv is None or len(rv.columns) != int(nc):
                    raise _Fallback("version/ncols mismatch")
                if op_name == "delete":
                    v_start, v_len, code, _end = _scan_tuples(
                        data, before_start[rows])
                elif isinstance(after_start, str):      # update K|O + 'N'
                    _bs, _bl, _bc, end = _scan_tuples(data,
                                                      before_start[rows])
                    if not np.all(data[end] == 78):
                        raise _Fallback("update missing new tuple")
                    v_start, v_len, code, _e2 = _scan_tuples(data, end + 1)
                else:
                    v_start, v_len, code, _end = _scan_tuples(
                        data, after_start[rows])
                n = len(rows)
                cols: dict = {
                    "source": pa.array(np.full(n, dec.source, np.int32)),
                    "lsn": pa.array(lsn[f[rows]]),
                    "commit_lsn": pa.array(ctx.commit_lsn_row[rows]),
                    "commit_ts_us": pa.array(ctx.commit_ts_row[rows]),
                    "xid": pa.array(ctx.row_xid[rows]),
                    "op": _const_str(op_name, n),
                    "rel_version": pa.array(np.full(n, v, np.int32)),
                }
                false_arr = pa.array(np.zeros(n, dtype=bool))
                is_del = op_name == "delete"
                for fi, field in enumerate(unified):
                    if fi < int(nc):
                        vals = _values_from_scan(data, v_start[:, fi],
                                                 v_len[:, fi], code[:, fi])
                        typed, _err = cast_pg_text(vals, field.type)
                        if typed.type != field.type:
                            typed = pa.compute.cast(typed, field.type)
                        cols[field.name] = typed
                        cols[f"_unchanged_{field.name}"] = false_arr \
                            if is_del else pa.array(code[:, fi] == 117)
                    else:
                        cols[field.name] = pa.nulls(n, field.type)
                        cols[f"_unchanged_{field.name}"] = false_arr
                out.append(pa.table(cols))

    if len(f):
        oid_ok = ctx.oid_arr == oid
        for op_tag, op_name in ((73, "insert"), (85, "update"),
                                (68, "delete")):
            gm = ctx.keep & oid_ok & (tag[f] == op_tag)
            if not gm.any():
                continue
            for sub, b_start, a_start, kt in _marker_groups(
                    data, ctx.hdr, op_tag, gm):
                if sub.any():
                    emit(sub, b_start, a_start, kt, op_name)

    # control rows (truncate barriers and friends): tiny — project the
    # scalar clone's envelope batch with the standard projection
    ctrl_batch = c.take_batch()
    if ctrl_batch is not None:
        pt = project_envelope(pa.Table.from_batches([ctrl_batch]),
                              registry, oid)
        if pt.num_rows:
            out.append(pt)
    _adopt(dec, c)                 # mutate dec only once nothing can throw
    return out


def _marker_groups(data, hdr, op_tag, gm):
    """Split a DML group by old-tuple marker; yields
    (mask, before_tuple_start|None, after_tuple_start|None, key_type)."""
    if op_tag == 73:                                # Insert: 'N' + tuple
        yield gm, None, hdr + 5, ""
        return
    marker = np.zeros(len(gm), np.uint8)
    marker[gm] = data[hdr[gm] + 4]
    if op_tag == 68:                                # Delete: K|O + old tuple
        for mk in (75, 79):
            sub = gm & (marker == mk)
            if sub.any():
                yield sub, hdr + 5, None, chr(mk)
        if np.any(gm & ~np.isin(marker, (75, 79, 0))):
            raise _Fallback("bad delete marker")
        return
    # Update: optional K|O old tuple, then 'N' new tuple
    sub_n = gm & (marker == 78)
    if sub_n.any():
        yield sub_n, None, hdr + 5, ""
    for mk in (75, 79):
        sub = gm & (marker == mk)
        if sub.any():
            # before tuple at hdr+5; after tuple located after peel —
            # signalled with after_start=None + key_type marker
            yield sub, hdr + 5, "after-follows", chr(mk)
    if np.any(gm & ~np.isin(marker, (75, 79, 78, 0))):
        raise _Fallback("bad update marker")


def _emit_group(data, f, sub, before_start, after_start, key_type, op_name,
                lsn, row_xid, commit_lsn_row, commit_ts_row, seq_row,
                rel_code, code_meta, oid_arr, source):
    """Build envelope tables for one (op, marker) group, sub-split by
    ncols inside _peel_tuples' caller loop."""
    idx = np.nonzero(sub)[0]
    # sub-split by ncols of the first tuple to peel (groups are usually 1)
    first_start = before_start if before_start is not None else after_start
    fs = first_start[idx] if isinstance(first_start, np.ndarray) else None
    ncols_first = _be(data, fs, 2)
    for nc in np.unique(ncols_first):
        m2 = ncols_first == nc
        rows = idx[m2]
        n = len(rows)
        before = after = unch = None
        if before_start is not None:
            bvals, _bunch, end = _peel_tuples(data, before_start[rows])
            before = bvals
            if after_start == "after-follows":      # update K|O: 'N' + tuple
                if not np.all(data[end] == 78):
                    raise _Fallback("update missing new tuple")
                avals, aunch, _ = _peel_tuples(data, end + 1)
                after, unch = avals, aunch
        if isinstance(after_start, np.ndarray):
            avals, aunch, _ = _peel_tuples(data, after_start[rows])
            after, unch = avals, aunch
        null_list_str = pa.nulls(n, pa.list_(pa.string()))
        null_list_bool = pa.nulls(n, pa.list_(pa.bool_()))
        codes = rel_code[rows]
        if np.any(codes < 0):
            raise _Fallback("released row without relation")
        tbl = pa.table({
            "source": pa.array(np.full(n, source, np.int32)),
            "lsn": pa.array(lsn[f[rows]]),
            "commit_lsn": pa.array(commit_lsn_row[rows]),
            "commit_ts_us": pa.array(commit_ts_row[rows]),
            "xid": pa.array(row_xid[rows]),
            "op": _const_str(op_name, n),
            "rel_oid": pa.array(oid_arr[rows].astype(np.int32)),
            "rel_version": pa.array(
                np.asarray([code_meta[cd][1] for cd in range(len(code_meta))],
                           np.int32)[codes] if code_meta
                else np.zeros(n, np.int32)),
            "schema_name": _dict_str(
                codes, [cm[2] for cm in code_meta]) if code_meta
            else _const_str("", n),
            "table_name": _dict_str(
                codes, [cm[3] for cm in code_meta]) if code_meta
            else _const_str("", n),
            "key_type": _const_str(key_type, n),
            "before_values": before if before is not None else null_list_str,
            "after_values": after if after is not None else null_list_str,
            "unchanged_mask": unch if unch is not None else null_list_bool,
            "meta": pa.nulls(n, pa.string()),
            "_seq": pa.array(seq_row[rows]),
            "_fidx": pa.array(f[rows]),
        })
        yield tbl
