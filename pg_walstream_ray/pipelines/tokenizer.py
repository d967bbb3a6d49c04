"""Distributed BPE tokenizer training over the document corpus.

Byte-pair-encoding merge learning (Sennrich et al. 2016) re-expressed for
Ray: ONE Dataset shuffle builds the distinct word-frequency model (the
classic BPE training input — pair statistics are weighted by word counts,
so the corpus text itself is touched exactly once), then K merge rounds
run as BSP supersteps over word-sharded symbol-state actors — the same
Pregel-actor tier as the graph operators (dedup.pagerank): per round only
the per-shard PAIR-COUNT partials (bounded by the live pair vocabulary)
travel to the driver, the argmax merge rule broadcasts back, and each
shard rewrites its own flat symbol arrays in place.  Nothing static ever
re-ships and no Dataset all-to-all happens after the word count.

Determinism contract (what makes the unrolled-SQL oracle possible):

  * symbols ARE codepoints: a base character's symbol id is its Unicode
    codepoint, and the i-th merged symbol gets id ``0xE000 + i`` (the
    private-use area — asserted absent from the corpus), so every
    intermediate "symbol sequence" is literally a string and the engine's
    state after i merges equals DuckDB ``replace(word, l || r, chr(...))``
    applied i times;
  * pair occurrences are counted at every adjacent position (overlapping
    occurrences included), weighted by word count;
  * the merge rule is (count DESC, left char ASC, right char ASC) — for
    single-char symbols that is codepoint order, identical to DuckDB's
    binary string collation;
  * merge application is leftmost non-overlapping, the semantics of both
    ``str.replace`` and SQL ``replace`` (the only ambiguous case is
    left == right runs, resolved by run-parity below).

The reference engine ships raw change rows to sinks (src/handlers);
tokenizer training belongs to the training-data surface this engine adds
on top (SURVEY.md §2.12).

At 100 TB: the word-count shuffle is the only data-sized exchange and it
pre-aggregates per block before the groupby; the distinct-word model that
the actors shard is orders of magnitude smaller than the corpus and is
itself hash-partitioned, so no single process ever holds it; per-round
driver traffic is O(live pair vocabulary), independent of corpus size.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BPE_MERGES = 8
BPE_PLACEHOLDER_BASE = 0xE000   # private-use area; mirrored by chr() in SQL
_KEY_SHIFT = 21                 # codepoints < 0x110000 < 2**21


def _word_counts(sf_dir: str):
    """(word, cnt) over documents.text — split on single spaces, empty
    split artifacts dropped (same tokenization as the md5-bridge family).
    Per-batch value_counts pre-aggregates before the single shuffle."""
    from .textops import _docs

    def count(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.list_flatten(pc.split_pattern(text, " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    return _docs(sf_dir, columns=("text",)) \
        .map_batches(count, batch_format="pyarrow") \
        .groupby("word").sum("cnt") \
        .map_batches(lambda t: pa.table({
            "word": t["word"],
            "cnt": pc.cast(t["sum(cnt)"], pa.int64())}),
            batch_format="pyarrow")


class _BpeShard:
    """One word-shard of the BPE training state: a flat int64 symbol
    array (symbol id == codepoint, see module docstring) + per-word
    lengths + per-word counts, all rewritten in place per merge round.
    Every kernel is numpy over the flat arrays — no per-word Python in
    the supersteps."""

    def __init__(self):
        self._words: List[np.ndarray] = []
        self._cnts: List[np.ndarray] = []
        self._seen_parts: set = set()
        self.sym: Optional[np.ndarray] = None
        self.lengths: Optional[np.ndarray] = None
        self.cnts: Optional[np.ndarray] = None

    def load_part(self, words: list, cnts: np.ndarray,
                  part_key: bytes | None = None) -> None:
        """Ingest one word-count part.  ``part_key`` (a content digest
        of the part) makes the push idempotent: a Ray task retry
        (at-least-once execution) re-sending the same batch is dropped
        instead of double-counting its words (the same LWW-style
        idempotence the stream index actors use)."""
        if part_key is not None:
            if part_key in self._seen_parts:
                return
            self._seen_parts.add(part_key)
        cat = "".join(words)
        codes = np.frombuffer(cat.encode("utf-32-le"), dtype="<u4")
        self._words.append(codes.astype(np.int64))
        lens = np.fromiter((len(w) for w in words), np.int64, len(words))
        self._cnts.append(np.stack([lens, np.asarray(cnts, np.int64)]))

    def finalize(self) -> int:
        if self._words:
            self.sym = np.concatenate(self._words)
            packed = np.concatenate(self._cnts, axis=1)
            self.lengths, self.cnts = packed[0], packed[1]
        else:
            self.sym = np.empty(0, np.int64)
            self.lengths = np.empty(0, np.int64)
            self.cnts = np.empty(0, np.int64)
        self._words, self._cnts = [], []
        if len(self.sym):
            base_max = int(self.sym.max())
            assert base_max < BPE_PLACEHOLDER_BASE, \
                "corpus uses private-use codepoints reserved for merges"
        return len(self.lengths)

    def _pair_mask(self) -> Tuple[np.ndarray, np.ndarray]:
        """(valid adjacent-position mask over sym[:-1], per-position word
        count weights) — positions whose pair crosses a word boundary are
        invalid."""
        offsets = np.concatenate(([0], np.cumsum(self.lengths)))
        valid = np.ones(max(len(self.sym) - 1, 0), dtype=bool)
        ends = offsets[1:-1] - 1                 # last symbol of each word
        valid[ends[(ends >= 0) & (ends < len(valid))]] = False
        word_idx = np.repeat(np.arange(len(self.lengths)), self.lengths)
        w = self.cnts[word_idx[:-1]] if len(self.sym) > 1 else \
            np.empty(0, np.int64)
        return valid, w

    def pair_counts(self) -> Tuple[np.ndarray, np.ndarray]:
        """(packed pair keys a<<21|b, int64 weighted counts) for every
        live adjacent pair in this shard (overlap counted, SQL parity)."""
        if self.sym is None or len(self.sym) < 2:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        valid, w = self._pair_mask()
        a = self.sym[:-1][valid]
        b = self.sym[1:][valid]
        key = (a << _KEY_SHIFT) | b
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, w[valid])
        return uniq, sums

    def apply_merge(self, a: int, b: int, new_id: int) -> None:
        """Rewrite every leftmost non-overlapping (a, b) occurrence to
        ``new_id`` — str.replace semantics.  For a == b, runs of
        consecutive match positions resolve by run parity (keep even
        offsets within each run == greedy left-to-right)."""
        if self.sym is None or len(self.sym) < 2:
            return
        valid, _ = self._pair_mask()
        hit = (self.sym[:-1] == a) & (self.sym[1:] == b) & valid
        p = np.flatnonzero(hit)
        if len(p) == 0:
            return
        if a == b:
            # run-parity: within each run of consecutive positions keep
            # positions an even distance from the run start
            run_start = np.concatenate(([True], np.diff(p) != 1))
            run_id = np.cumsum(run_start) - 1
            first = p[run_start]
            p = p[(p - first[run_id]) % 2 == 0]
        self.sym[p] = new_id
        keep = np.ones(len(self.sym), dtype=bool)
        keep[p + 1] = False
        word_idx = np.repeat(np.arange(len(self.lengths)), self.lengths)
        np.subtract.at(self.lengths, word_idx[p + 1], 1)
        self.sym = self.sym[keep]


def train_bpe(word_counts_ds, n_merges: int = BPE_MERGES,
              n_shards: int = 4, return_ids: bool = False):
    """Run K BPE merge supersteps over word-sharded actors.

    Returns (rnk, left, right, pair, n): rank 1..K, the merged pair's
    EXPANDED left/right texts, their concatenation, and the (overlap-
    counted) weighted pair count that won the round.  With
    ``return_ids=True`` also returns the raw [(a_id, b_id, new_id)]
    merge list — the broadcastable form an encoder applies.
    """
    import ray

    empty = pa.table({"rnk": pa.array([], pa.int64()),
                      "left": pa.array([], pa.string()),
                      "right": pa.array([], pa.string()),
                      "pair": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    cpus = int(ray.cluster_resources().get("CPU", 1))
    k = max(1, min(n_shards, cpus))
    Shard = ray.remote(num_cpus=0.5)(_BpeShard)
    actors = [Shard.remote() for _ in range(k)]

    from ..functions.hashing import fast_hash64

    def push(t: pa.Table) -> pa.Table:
        words = t["word"]
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        h = fast_hash64(pa.chunked_array([words])) % k
        wl = words.to_pylist()
        refs = []
        for i in range(k):
            sel = np.flatnonzero(h == i)
            if len(sel):
                wsel = [wl[j] for j in sel]
                csel = np.ascontiguousarray(cnt[sel])
                # deterministic content key: word set is globally unique
                # post-groupby, so equal digests == the same part resent
                part_key = hashlib.blake2b(
                    "\x00".join(wsel).encode() + csel.tobytes(),
                    digest_size=16).digest()
                refs.append(actors[i].load_part.remote(
                    wsel, csel, part_key=part_key))
        ray.get(refs)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    txt = {}                                  # id -> expanded text
    rows: list = []
    id_merges: list = []                      # (a_id, b_id, new_id)
    try:
        word_counts_ds.map_batches(push, batch_format="pyarrow",
                                   batch_size=1 << 18).materialize()
        n_words = sum(ray.get([a.finalize.remote() for a in actors]))
        for i in range(n_merges if n_words else 0):
            parts = ray.get([a.pair_counts.remote() for a in actors])
            keys = np.concatenate([p[0] for p in parts])
            cnts = np.concatenate([p[1] for p in parts])
            if len(keys) == 0:
                break
            uniq, inv = np.unique(keys, return_inverse=True)
            sums = np.zeros(len(uniq), np.int64)
            np.add.at(sums, inv, cnts)
            # winner: count DESC, then smallest packed key == smallest
            # (left char, right char) == DuckDB (l ASC, r ASC)
            n_best = int(sums.max())
            best = int(uniq[sums == n_best].min())
            a_id = int(best >> _KEY_SHIFT)
            b_id = int(best & ((1 << _KEY_SHIFT) - 1))
            new_id = BPE_PLACEHOLDER_BASE + i
            ray.get([ac.apply_merge.remote(a_id, b_id, new_id)
                     for ac in actors])
            l_txt = txt.get(a_id, chr(a_id))
            r_txt = txt.get(b_id, chr(b_id))
            txt[new_id] = l_txt + r_txt
            rows.append((i + 1, l_txt, r_txt, l_txt + r_txt, n_best))
            id_merges.append((a_id, b_id, new_id))
    finally:
        for a in actors:
            ray.kill(a)
    if rows:
        rnk, left, right, pair, n = zip(*rows)
        out = pa.table({"rnk": pa.array(rnk, pa.int64()),
                        "left": pa.array(left, pa.string()),
                        "right": pa.array(right, pa.string()),
                        "pair": pa.array(pair, pa.string()),
                        "n": pa.array(n, pa.int64())})
    else:
        out = empty
    return (out, id_merges) if return_ids else out


def bpe_pair_counts(sf_dir: str):
    """First-round BPE pair statistics as a Dataset op: character-bigram
    counts weighted by word frequency over the whole corpus — the fully
    SQL-expressible face of the trainer (one shuffle; the flat-array
    bigram kernel is the same code the supersteps run).
    Output: (left, right, n)."""
    def bigrams(t: pa.Table) -> pa.Table:
        shard = _BpeShard()
        words = t["word"]
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        shard.load_part(words.to_pylist(),
                        t["cnt"].to_numpy(zero_copy_only=False))
        shard.finalize()
        keys, sums = shard.pair_counts()
        return pa.table({
            "left": pa.array([chr(int(x) >> _KEY_SHIFT) for x in keys],
                             pa.string()),
            "right": pa.array([chr(int(x) & ((1 << _KEY_SHIFT) - 1))
                               for x in keys], pa.string()),
            "n": pa.array(sums, pa.int64())})

    return _word_counts(sf_dir) \
        .map_batches(bigrams, batch_format="pyarrow") \
        .groupby(["left", "right"]).sum("n") \
        .map_batches(lambda t: pa.table({
            "left": t["left"], "right": t["right"],
            "n": pc.cast(t["sum(n)"], pa.int64())}),
            batch_format="pyarrow")


def bpe_train_merges(sf_dir: str, n_merges: int = BPE_MERGES) -> pa.Table:
    """Full distributed BPE training: K merge rounds over the corpus
    word model.  See train_bpe for the output columns."""
    return train_bpe(_word_counts(sf_dir), n_merges=n_merges)


def _apply_merges_lengths(words: list, id_merges: list) -> np.ndarray:
    """Token count per word after applying the merge list — the same
    flat-array kernel the training shards run, over a batch vocabulary."""
    shard = _BpeShard()
    shard.load_part(words, np.ones(len(words), np.int64))
    shard.finalize()
    for a_id, b_id, new_id in id_merges:
        shard.apply_merge(a_id, b_id, new_id)
    return shard.lengths.copy()


class _BpeEncodeStage:
    """Actor/worker stage: documents batch -> per-doc token counts under
    a broadcast merge list.  The merge kernel runs once per DISTINCT word
    (dictionary-encode first), and a worker-lifetime cache carries
    word -> token-count across batches — the actor-state pattern the
    token hasher uses."""

    def __init__(self, merges_ref, key_col: str = "doc_id",
                 text_col: str = "text"):
        import ray
        self.merges = ray.get(merges_ref) if not isinstance(
            merges_ref, list) else merges_ref
        self.key_col = key_col
        self.text_col = text_col
        self.cache: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = t.num_rows
        ntok = np.zeros(n, np.int64)
        if n:
            split = pc.split_pattern(text, " ")
            offsets = split.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            offsets = offsets - offsets[0]
            denc = pc.dictionary_encode(split.flatten())
            vocab = denc.dictionary.to_pylist()
            missing = [w for w in vocab
                       if w and w not in self.cache]
            if missing:
                lens = _apply_merges_lengths(missing, self.merges)
                self.cache.update(zip(missing, lens))
            per_word = np.fromiter(
                (self.cache.get(w, 0) for w in vocab), np.int64,
                len(vocab))                    # '' artifacts count 0
            idx = denc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(offsets))
            ntok = np.bincount(doc_idx, weights=per_word[idx],
                               minlength=n).astype(np.int64)
        key = t[self.key_col]
        if pa.types.is_integer(key.type):
            key = pc.cast(key, pa.int64())
        return pa.table({
            self.key_col: key,
            "n_tokens": pa.array(ntok, pa.int64())})


def bpe_encode_counts(sf_dir: str, n_merges: int = BPE_MERGES):
    """Tokenize the corpus with the BPE tokenizer trained ON that corpus
    and report per-document token counts — the token-budget accounting
    pass every training-data pipeline runs before packing.

    Scale shape: train_bpe's merge list (K int triples) broadcasts via
    ray.put; encoding is a zero-shuffle map with the per-distinct-word
    kernel + worker cache.  Output: (doc_id, n_tokens), one row per
    document (empty text -> 0)."""
    import ray

    from .textops import _docs

    _, id_merges = train_bpe(_word_counts(sf_dir), n_merges=n_merges,
                             return_ids=True)
    mref = ray.put(id_merges)
    return _docs(sf_dir).map_batches(
        _BpeEncodeStage, fn_constructor_args=(mref,),
        batch_format="pyarrow", concurrency=(1, 8))
