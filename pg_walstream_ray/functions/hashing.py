"""Deterministic text hashing primitives shared by the dedup / fingerprint
operators AND their DuckDB SQL oracles.

The bridge invariant: for any token ``s``,

    Python:  int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT

produce the same 60-bit integer, so every derived quantity (minhash
signatures, simhash bits, fingerprints) is reproducible in ANSI-ish SQL and
the driver can value-hash-compare the Ray pipeline against the oracle.

All per-token work is cached in a vocabulary dict held by the actor
(stateful stage): real corpora are Zipfian, so the cache converges and the
per-batch cost is numpy gathers, not per-token md5.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

H_PRIME = 2_147_483_647          # 2^31 - 1; all minhash arithmetic mod this
SIMHASH_BITS = 60                # md5-derived 60-bit token hashes
MINHASH_K = 16                   # signature length
MINHASH_BANDS = 4                # 4 bands x 4 rows
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
SIMHASH_BANDS = 4                # 4 x 15-bit bands for near-dup bucketing
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS

# fixed, seeded universal-hash parameters (shared with the SQL oracle via
# minhash_params_sql())
_rng = np.random.default_rng(123_456_789)
MINHASH_A = _rng.integers(1, H_PRIME, size=MINHASH_K, dtype=np.int64)
MINHASH_B = _rng.integers(0, H_PRIME, size=MINHASH_K, dtype=np.int64)


def md5_int60(s: str) -> int:
    """60-bit integer from the first 15 hex chars of md5 (SQL-bridgeable)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def fast_hash64(values) -> np.ndarray:
    """Vectorized deterministic 64-bit hash of a string column (uint64).

    The production default for content hashing: polars' Rust xxhash kernel
    over the Arrow buffers — measured 15x (200 B texts) to 300x (short ids)
    faster than the per-row ``hashlib.md5`` loop, with no GIL-bound Python
    in the hot path.  Deterministic and row-order-independent within an
    engine version (seedless), which is what hash-partitioned dedup and
    content sampling need; the md5 path stays available as the
    SQL-oracle-bridgeable mode (``hash_mode='md5'`` on the operators) since
    DuckDB can't reproduce xxhash.

    Accepts a pyarrow Array/ChunkedArray, numpy array or list of strings.
    """
    try:
        import polars as pl

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            s = pl.from_arrow(values)
        else:
            s = pl.Series(list(values))
        return s.hash(seed=0).to_numpy().astype(np.uint64)
    except ImportError:                      # pragma: no cover - polars baked
        return np.fromiter(
            (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
             for v in (values.to_pylist()
                       if isinstance(values, (pa.Array, pa.ChunkedArray))
                       else values)),
            dtype=np.uint64, count=len(values))


def content_hash60(texts, mode: str = "fast") -> np.ndarray:
    """Non-negative 60-bit int64 content hash of a string column.

    mode='fast': vectorized xxhash (production default, see fast_hash64).
    mode='md5':  per-row md5 bridge — bit-identical to the DuckDB oracle
    expression ``('0x' || substr(md5(s), 1, 15))::BIGINT``; used by the
    driver-checked queries so value-hash compares stay exact.
    """
    if mode == "md5":
        vals = texts.to_pylist() if isinstance(
            texts, (pa.Array, pa.ChunkedArray)) else texts
        return np.fromiter((md5_int60(s) for s in vals),
                           dtype=np.int64, count=len(vals))
    return (fast_hash64(texts) >> np.uint64(4)).astype(np.int64)


def minhash_params_sql() -> str:
    """VALUES list ``params(i, a, b)`` matching MINHASH_A/B for the oracle."""
    rows = ", ".join(f"({i}, {int(a)}, {int(b)})"
                     for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B)))
    return f"(VALUES {rows})"


class TokenHasher:
    """Vocabulary-cached token hasher (held per actor, __init__-once).

    For each new token computes, once:
      h60       60-bit md5 int
      hp        h60 % H_PRIME           (minhash input)
      sig[k]    (a_k * hp + b_k) % H_PRIME
      bits[60]  +1/-1 per bit of h60    (simhash contribution)
    """

    def __init__(self):
        self._idx: Dict[str, int] = {}
        self._sig_rows: List[np.ndarray] = []
        self._bit_rows: List[np.ndarray] = []
        self._h60_rows: List[int] = []
        self._sig_mat = np.empty((0, MINHASH_K), dtype=np.int64)
        self._bit_mat = np.empty((0, SIMHASH_BITS), dtype=np.int32)
        self._h60_arr = np.empty(0, dtype=np.int64)

    def _intern(self, tok: str) -> int:
        i = self._idx.get(tok)
        if i is not None:
            return i
        h60 = md5_int60(tok)
        hp = h60 % H_PRIME
        sig = (MINHASH_A * hp + MINHASH_B) % H_PRIME
        bits = np.fromiter(((h60 >> b) & 1 for b in range(SIMHASH_BITS)),
                           dtype=np.int32, count=SIMHASH_BITS) * 2 - 1
        i = len(self._idx)
        self._idx[tok] = i
        self._sig_rows.append(sig)
        self._bit_rows.append(bits)
        self._h60_rows.append(h60)
        return i

    def _sync(self) -> None:
        if len(self._sig_rows) != len(self._sig_mat):
            self._sig_mat = np.vstack(self._sig_rows)
            self._bit_mat = np.vstack(self._bit_rows)
            self._h60_arr = np.array(self._h60_rows, dtype=np.int64)

    def encode_tokens(self, tokens: List[str]) -> np.ndarray:
        """Token strings -> vocab ids (interning new ones)."""
        return np.fromiter((self._intern(t) for t in tokens),
                           dtype=np.int64, count=len(tokens))

    @property
    def sig_matrix(self) -> np.ndarray:
        self._sync()
        return self._sig_mat

    @property
    def bit_matrix(self) -> np.ndarray:
        self._sync()
        return self._bit_mat

    @property
    def h60_array(self) -> np.ndarray:
        """Global 60-bit hash per vocab id — the cross-actor-stable token
        identity (intern ids are per-actor and must never leave the actor)."""
        self._sync()
        return self._h60_arr


def tokenize_column(texts: pa.ChunkedArray | pa.Array,
                    hasher: TokenHasher) -> Tuple[np.ndarray, np.ndarray]:
    """Split on single spaces (identical to SQL string_split(text, ' ')).

    Returns (doc_offsets[n+1], token_ids[flat]) — token_ids grouped by doc.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    split = pc.split_pattern(texts, " ")
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    # Dictionary-encode first (C++ hash table) so the Python intern loop
    # runs once per DISTINCT token in the batch, not once per occurrence —
    # ~10-50x less GIL-bound work on natural-language shards where each
    # token repeats many times.  md5 bridge semantics are unchanged: the
    # hasher still interns by exact token string.
    denc = pc.dictionary_encode(split.flatten())
    vocab_ids = hasher.encode_tokens(denc.dictionary.to_pylist())
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return offsets, vocab_ids[idx]


def distinct_doc_tokens(offsets: np.ndarray, token_ids: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (doc, token) pairs, doc-grouped.

    Returns (doc_counts[n], doc_index[flat'], token_ids[flat']).
    """
    n = len(offsets) - 1
    doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                        np.diff(offsets))
    # dedupe (doc, token) via a combined sort key
    vocab = int(token_ids.max()) + 1 if len(token_ids) else 1
    key = doc_idx * vocab + token_ids
    uniq = np.unique(key)
    u_doc = uniq // vocab
    u_tok = uniq % vocab
    counts = np.bincount(u_doc, minlength=n).astype(np.int64)
    return counts, u_doc, u_tok


def doc_minhash(offsets: np.ndarray, token_ids: np.ndarray,
                hasher: TokenHasher) -> np.ndarray:
    """Per-doc minhash signatures [n, K] (min over tokens; duplicate tokens
    are harmless under min)."""
    n = len(offsets) - 1
    sig = hasher.sig_matrix[token_ids]          # [flat, K]
    out = np.full((n, MINHASH_K), np.iinfo(np.int64).max, dtype=np.int64)
    nonempty = np.flatnonzero(np.diff(offsets) > 0)
    if len(token_ids):
        red = np.minimum.reduceat(sig, offsets[:-1][nonempty], axis=0)
        out[nonempty] = red
    return out


def doc_simhash(offsets: np.ndarray, token_ids: np.ndarray,
                hasher: TokenHasher) -> np.ndarray:
    """Per-doc 60-bit simhash over DISTINCT tokens; bit b = 1 iff the signed
    bit-b sum over tokens is > 0."""
    n = len(offsets) - 1
    counts, u_doc, u_tok = distinct_doc_tokens(offsets, token_ids)
    bits = hasher.bit_matrix[u_tok]             # [flat', 60]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    sums = np.zeros((n, SIMHASH_BITS), dtype=np.int64)
    nonempty = np.flatnonzero(counts > 0)
    if len(u_tok):
        sums[nonempty] = np.add.reduceat(bits, starts[nonempty], axis=0)
    weights = (np.int64(1) << np.arange(SIMHASH_BITS, dtype=np.int64))
    return ((sums > 0).astype(np.int64) * weights).sum(axis=1)


def minhash_band_keys(sigs: np.ndarray) -> pa.Array:
    """Flat BAND-MAJOR bucket keys: element ``b*n + i`` is doc i's band-b
    key ``'b:s0,s1,...'`` — byte-identical strings to the SQL oracle's
    ``string_agg`` expression.  Vectorized (per-column cast +
    binary_join_element_wise); no per-doc Python loop."""
    n = len(sigs)
    if n == 0:
        return pa.array([], pa.string())
    cols = [pc.cast(pa.array(sigs[:, c]), pa.string())
            for c in range(MINHASH_K)]
    bands = []
    for b in range(MINHASH_BANDS):
        seg = cols[b * MINHASH_ROWS:(b + 1) * MINHASH_ROWS]
        joined = pc.binary_join_element_wise(*seg, ",")
        bands.append(pc.binary_join_element_wise(f"{b}:", joined, ""))
    return pa.concat_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
         for a in bands])


def simhash_band_keys(simhash: np.ndarray) -> np.ndarray:
    """[n, SIMHASH_BANDS] int band values ((sh >> 15*j) & 0x7FFF)."""
    shifts = np.arange(SIMHASH_BANDS, dtype=np.int64) * SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return (simhash[:, None] >> shifts[None, :]) & mask


_WORKER_HASHER = None
WORKER_HASHER_MAX_VOCAB = 4_000_000


def worker_token_hasher() -> "TokenHasher":
    """Per-worker-process singleton hasher for task-mode stages: the
    vocabulary cache survives across batches, tasks and pipeline
    executions exactly like an actor member would, shared by every stage
    class in the worker.  Reset when the vocabulary exceeds the cap so
    long-lived workers stay memory-bounded (hash results are deterministic,
    so a reset only costs recomputation)."""
    global _WORKER_HASHER
    if (_WORKER_HASHER is None
            or len(_WORKER_HASHER._idx) > WORKER_HASHER_MAX_VOCAB):
        _WORKER_HASHER = TokenHasher()
    return _WORKER_HASHER
