"""Deduplication operators over the ``documents`` table — the
training-data-pipeline surface of the engine (exact, MinHash+LSH, SimHash,
n-gram Jaccard).  Every operator is deterministic and mirrored by a DuckDB
SQL oracle in ``__ray_entry__.oracle_sql`` via the md5 bridge in
functions/hashing.py.

Scale design (100 TB):
  - exact dedup: hash-partition on a 60-bit content hash; the groupby ships
    (hash, doc_id) pairs only, never the text.
  - MinHash/SimHash: signatures are computed in a vocabulary-cached actor
    pool (map_batches, per-actor token cache); the only shuffles are over
    (bucket_key, doc_id) pairs — band keys, not documents.
  - duplicate flagging is two grouped reductions (bucket -> min doc_id,
    then doc -> min over its buckets), both over tiny rows; no pairwise
    candidate explosion.
  - n-gram Jaccard is the one genuinely pairwise op: it shuffles distinct
    (token, doc) postings and emits per-token candidate pairs.  At scale
    this REQUIRES a df cutoff (``max_df``) / prefix filtering — stop-like
    tokens otherwise produce O(df^2) pairs; the cutoff is part of the
    operator contract and mirrored in the oracle when set.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    worker_token_hasher,
    TokenHasher,
    content_hash60,
    doc_minhash,
    doc_simhash,
    md5_int60,
    minhash_band_keys,
    simhash_band_keys,
    tokenize_column,
    distinct_doc_tokens,
    fast_hash64,
    MINHASH_BANDS,
    SIMHASH_BANDS,
)
from ..stages.taskmode import as_tasks


def _docs(sf_dir: str, columns=("doc_id", "text")):
    from ..functions.scale import sized_read_parquet

    return sized_read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=list(columns))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


# Coarse hash partitions for fine-grained reductions: Ray's groupby is
# sort-based and pays per-group overhead, so reducing over millions of tiny
# key groups directly is ~100x slower than shuffling into coarse hash
# partitions and running an in-memory (pandas/numpy) groupby inside each —
# the same partial-aggregation discipline the CDC apply stage uses.  All
# fine-grained reductions in this module follow that pattern; the partition
# count derives from the live cluster size (functions/scale.py).
from ..functions.scale import coarse_npart


def exact_dedup(sf_dir: str, hash_mode: str = "fast"):
    """Exact dedup on content hash: one surviving doc_id (the minimum) per
    distinct text + the group size.  Output: (doc_id, n_copies).
    Ships (hash, doc_id) pairs only — never the text.

    ``hash_mode='fast'`` (default) uses the vectorized xxhash path;
    ``'md5'`` is the SQL-oracle bridge mode pinned by the driver queries
    (functions/hashing.content_hash60)."""
    npart = coarse_npart()

    def to_hash(t: pa.Table) -> pa.Table:
        h = content_hash60(t["text"], hash_mode)
        return pa.table({"part": pa.array(h % npart),
                         "h": pa.array(h), "doc_id": t["doc_id"]})

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return agg[["doc_id", "n_copies"]].astype(np.int64)

    return _docs(sf_dir).map_batches(to_hash, batch_format="pyarrow") \
        .groupby("part").map_groups(dedup_part, batch_format="pandas")


# ---------------------------------------------------------------------------
# LSH bucket machinery shared by minhash / simhash dedup
# ---------------------------------------------------------------------------


def _dup_flags_from_buckets(bucketed):
    """(bucket, doc_id) rows -> (doc_id, is_dup): a doc is a duplicate iff
    some bucket it occupies contains a smaller doc_id.  Two coarse-partition
    reductions (bucket -> min, then doc -> min over its buckets); never
    materializes candidate pairs.  ``bucket`` may be string or int."""
    npart = coarse_npart()

    def add_bpart(t: pa.Table) -> pa.Table:
        b = t["bucket"]
        if pa.types.is_integer(b.type):
            part = pc.cast(b, pa.int64()).to_numpy(
                zero_copy_only=False) % npart
        else:
            # NOT builtin hash(): that's per-process-seed randomized, which
            # would scatter one bucket across partitions on different
            # workers.  fast_hash64 (polars xxhash, seed=0) is vectorized
            # AND process-stable.
            part = (fast_hash64(b) % np.uint64(npart)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    def bucket_min_part(g: pd.DataFrame) -> pd.DataFrame:
        # buckets are wholly contained in their partition -> local min is
        # the global bucket min
        m = g.groupby("bucket")["doc_id"].transform("min")
        df = pd.DataFrame({"doc_id": g["doc_id"], "bucket_min": m})
        df["part"] = df["doc_id"] % npart
        return df

    def doc_min_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False)["bucket_min"].min()
        return pd.DataFrame({"doc_id": agg["doc_id"],
                             "is_dup": agg["bucket_min"] < agg["doc_id"]})

    return (bucketed.map_batches(add_bpart, batch_format="pyarrow")
            .groupby("part").map_groups(bucket_min_part,
                                        batch_format="pandas")
            .groupby("part").map_groups(doc_min_part, batch_format="pandas"))


class MinHashBuckets:
    """Actor stage: documents batch -> (bucket, doc_id) LSH band rows.
    Token hashes cached per actor (__init__-once; SURVEY.md §2.4)."""

    def __init__(self):
        self.hasher = worker_token_hasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        offsets, tok = tokenize_column(t["text"], self.hasher)
        sigs = doc_minhash(offsets, tok, self.hasher)
        keys = minhash_band_keys(sigs)        # band-major, len n*BANDS
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        flat_ids = np.tile(doc_ids, MINHASH_BANDS)
        return pa.table({"bucket": keys,
                         "doc_id": pa.array(flat_ids, pa.int64())})


def minhash_flags_for(docs_ds):
    """MinHash(16)+LSH(4x4) near-dup flags over ANY dataset with
    ``(doc_id:int64, text:string)`` columns — the reusable core behind
    ``minhash_dedup`` and the conversation-level composite
    (``cdc_conv_near_dup``: CDC lake -> assembled transcripts -> near-dup).
    Output: (doc_id, is_dup).  Same scale shape as minhash_dedup: the
    shuffles move (band_key, doc_id) pairs only, never the text."""
    bucketed = docs_ds.map_batches(
        as_tasks(MinHashBuckets), batch_format="pyarrow", batch_size=4096)
    return _dup_flags_from_buckets(bucketed)


def minhash_dedup(sf_dir: str, concurrency: int = 4):
    """MinHash(16 sigs) + LSH(4 bands x 4 rows) near-dup flags.
    Output: (doc_id, is_dup)."""
    return minhash_flags_for(_docs(sf_dir))


class SimHashStage:
    """Actor stage: documents batch -> (doc_id, simhash) — 60-bit simhash
    over distinct tokens (sign of per-bit signed sums)."""

    def __init__(self):
        self.hasher = worker_token_hasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        offsets, tok = tokenize_column(t["text"], self.hasher)
        sh = doc_simhash(offsets, tok, self.hasher)
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(sh, pa.int64())})


def simhash_signatures(sf_dir: str, concurrency: int = 4):
    """Pure map: (doc_id, simhash). The SQL oracle recomputes the exact
    bit pattern."""
    return _docs(sf_dir).map_batches(as_tasks(SimHashStage),
                                     batch_format="pyarrow",
                                     batch_size=4096)


def simhash_dedup(sf_dir: str, concurrency: int = 4):
    """SimHash near-dup via 4 x 15-bit band collision (docs agreeing on any
    15-bit band are bucket-mates). Output: (doc_id, is_dup)."""

    def to_buckets(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy(zero_copy_only=False)
        bands = simhash_band_keys(sh)             # [n, SIMHASH_BANDS]
        n = len(sh)
        doc_ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False),
                            SIMHASH_BANDS)
        band_idx = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
        bucket = band_idx * (1 << 15) * 2 + bands.reshape(-1)
        return pa.table({"bucket": pa.array(bucket, pa.int64()),
                         "doc_id": pa.array(doc_ids, pa.int64())})

    bucketed = simhash_signatures(sf_dir, concurrency).map_batches(
        to_buckets, batch_format="pyarrow")
    return _dup_flags_from_buckets(bucketed)


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard similarity pairs
# ---------------------------------------------------------------------------


class PostingsStage:
    """documents batch -> distinct (token_h, doc_id, doc_size) postings.
    doc_size rides along so pair scoring needs no size broadcast/join."""

    def __init__(self):
        self.hasher = worker_token_hasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        offsets, tok = tokenize_column(t["text"], self.hasher)
        counts, u_doc, u_tok = distinct_doc_tokens(offsets, tok)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # emit the GLOBAL h60 token hash, not the per-actor intern id
        return pa.table({
            "token": pa.array(self.hasher.h60_array[u_tok], pa.int64()),
            "doc_id": pa.array(doc_ids[u_doc], pa.int64()),
            "doc_size": pa.array(counts[u_doc], pa.int64()),
        })


NGRAM_MAX_DF = 2_000         # stop-token cutoff (mirrored in the oracle).
# Tokens in more than max_df docs are skipped for pair generation: a token
# at df produces O(df^2) candidate pairs, so without the cutoff one
# stop-word dominates the whole job (at df=5000 one token alone is 12.5M
# pairs).  This is the standard prefix/frequency filter of all-pairs
# similarity systems.
def _ngram_candidate_pairs(sf_dir: str, max_df: Optional[int],
                           npart: int):
    """Shared candidate-pair emission for the word-set similarity family
    (Jaccard / containment): distinct postings -> postings routed by
    ``token_h % NPART`` -> per-BUCKET vectorized pair explode.  Returns
    a Dataset of (part, doc_a, doc_b, size_a, size_b) rows, one per
    shared token per pair, coarse-partitioned by pair hash — callers
    aggregate per pair and apply their score rule."""
    post = _docs(sf_dir).map_batches(as_tasks(PostingsStage),
                                     batch_format="pyarrow",
                                     batch_size=4096)

    def add_tpart(t: pa.Table) -> pa.Table:
        tp = t["token"].to_numpy(zero_copy_only=False) % npart
        return t.append_column("tpart", pa.array(tp))

    def _boundaries(tok: np.ndarray):
        n = len(tok)
        bnd = np.empty(n, dtype=bool)
        bnd[0] = True
        bnd[1:] = tok[1:] != tok[:-1]
        starts = np.nonzero(bnd)[0]
        cnt = np.diff(np.append(starts, n))
        return bnd, starts, cnt

    def emit_pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all of this bucket's tokens in ONE vectorized pass: sort by
        # (token, doc), then for the row at local offset k within its token
        # group emit k pairs (row as doc_b, each predecessor as doc_a)
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        tok = g["token"].to_numpy()
        ids = g["doc_id"].to_numpy()
        sizes = g["doc_size"].to_numpy()
        empty = np.array([], dtype=np.int64)
        empty_df = pd.DataFrame({"part": empty, "doc_a": empty,
                                 "doc_b": empty, "size_a": empty,
                                 "size_b": empty})
        if len(tok) == 0:
            return empty_df
        if max_df is not None:
            bnd, starts, cnt = _boundaries(tok)
            grp = np.cumsum(bnd) - 1
            keep = (cnt <= max_df)[grp]
            tok, ids, sizes = tok[keep], ids[keep], sizes[keep]
            if len(tok) == 0:
                return empty_df
        _, starts, cnt = _boundaries(tok)
        local = np.arange(len(ids), dtype=np.int64) - np.repeat(starts, cnt)
        csum = np.cumsum(local)
        total = int(csum[-1])
        if total == 0:
            return empty_df
        doc_b = np.repeat(ids, local)
        size_b = np.repeat(sizes, local)
        off = np.arange(total, dtype=np.int64) - np.repeat(csum - local,
                                                           local)
        a_idx = np.repeat(np.arange(len(ids), dtype=np.int64) - local,
                          local) + off
        doc_a = ids[a_idx]
        size_a = sizes[a_idx]
        return pd.DataFrame({"part": (doc_a * 1_000_003 + doc_b) % npart,
                             "doc_a": doc_a, "doc_b": doc_b,
                             "size_a": size_a, "size_b": size_b})

    return (post.map_batches(add_tpart, batch_format="pyarrow")
            .groupby("tpart").map_groups(emit_pairs_bucket,
                                         batch_format="pandas"))


def _pair_stats(g: pd.DataFrame):
    """Per-pair (inter, size_a, size_b) over one coarse partition."""
    agg = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
        inter=("size_a", "size"), sa=("size_a", "first"),
        sb=("size_b", "first"))
    return (agg, agg["inter"].to_numpy().astype(np.int64),
            agg["sa"].to_numpy().astype(np.int64),
            agg["sb"].to_numpy().astype(np.int64))


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8,
                        max_df: Optional[int] = NGRAM_MAX_DF,
                        concurrency: int = 4):
    """All pairs with word-set Jaccard >= threshold.
    Output: (doc_a, doc_b, inter, union_size) with doc_a < doc_b.

    Pipeline (see _ngram_candidate_pairs): distinct postings -> token
    route -> per-BUCKET vectorized pair explode (task count is NPART,
    independent of token cardinality) -> groupby(coarse pair-hash
    partition) with the fine per-pair count done in pandas inside
    map_groups.  The ``max_df`` stop-token cutoff (tokens in more docs
    are skipped, mirrored in the oracle) bounds the per-token pair
    blowup.  The fine aggregation is NOT a Ray groupby: 10^5+ tiny
    groups through the sort-based aggregate is ~100x slower than coarse
    partitions x an in-memory hash groupby.  The threshold filter uses
    the unrounded float64 ratio so the SQL oracle (same integer
    arithmetic) agrees exactly.
    """
    npart = coarse_npart()
    pairs = _ngram_candidate_pairs(sf_dir, max_df, npart)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        agg, inter, sa, sb = _pair_stats(g)
        union = sa + sb - inter
        keep = inter.astype(np.float64) / union >= threshold
        return pd.DataFrame({"doc_a": agg["doc_a"].to_numpy()[keep],
                             "doc_b": agg["doc_b"].to_numpy()[keep],
                             "inter": inter[keep],
                             "union_size": union[keep]})

    return pairs.groupby("part").map_groups(count_part,
                                            batch_format="pandas")


def containment_dup_pairs(sf_dir: str, threshold_bp: int = 8000,
                          max_df: Optional[int] = NGRAM_MAX_DF):
    """NEAR-SUBSET detection: all pairs whose word-set CONTAINMENT
    |A intersect B| / min(|A|, |B|) reaches ``threshold_bp`` basis
    points — the one-sided cousin of Jaccard that catches a short doc
    embedded in a longer one (boilerplate pages, quoted articles,
    crawl supersets), which symmetric Jaccard misses because the union
    is dominated by the longer side.

    Output: (doc_a, doc_b, inter, size_a, size_b, cont_bp) with
    doc_a < doc_b and cont_bp = (inter * 10000) // min(size_a, size_b)
    — all-integer, so the oracle pins every cell.

    Scale shape: identical to ngram_jaccard_pairs (the shared candidate
    emission; doc sizes ride the postings, so containment needs no
    extra join or broadcast).
    """
    npart = coarse_npart()
    pairs = _ngram_candidate_pairs(sf_dir, max_df, npart)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        agg, inter, sa, sb = _pair_stats(g)
        cont_bp = (inter * 10000) // np.minimum(sa, sb)
        keep = cont_bp >= threshold_bp
        return pd.DataFrame({"doc_a": agg["doc_a"].to_numpy()[keep],
                             "doc_b": agg["doc_b"].to_numpy()[keep],
                             "inter": inter[keep],
                             "size_a": sa[keep], "size_b": sb[keep],
                             "cont_bp": cont_bp[keep]})

    return pairs.groupby("part").map_groups(count_part,
                                            batch_format="pandas")


INCREMENT_SOURCES = ("src0", "src1", "src2")


def incremental_dedup(sf_dir: str, new_sources=INCREMENT_SOURCES,
                      hash_mode: str = "fast"):
    """Incremental corpus dedup: documents arriving from ``new_sources``
    (the increment) survive only if their content hash appears neither in
    the existing corpus (every other source) nor earlier in the increment
    itself (min-doc_id keeper) — the "dedup the new crawl against the
    lake" pipeline of a continuously-updated training corpus.

    Output: (doc_id,) — surviving increment docs.

    Scale shape: ONE shuffle of (hash, doc_id, is_new) triples routed by
    ``hash % NPART`` — the text never moves, neither side is broadcast,
    and the per-bucket pass is a vectorized pandas reduction (groupby
    transform), so base-corpus cardinality only widens the shuffle, never
    a driver or worker working set.
    """
    npart = coarse_npart()
    new_set = set(new_sources)

    def to_hash(t: pa.Table) -> pa.Table:
        h = content_hash60(t["text"], hash_mode)
        is_new = pc.is_in(t["source"],
                          value_set=pa.array(sorted(new_set)))
        return pa.table({"part": pa.array(h % npart), "h": pa.array(h),
                         "doc_id": t["doc_id"],
                         "is_new": pc.cast(is_new, pa.int8())})

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["is_new"] == 1]
        base_h = g.loc[g["is_new"] == 0, "h"].unique()
        keep = new.groupby("h", as_index=False)["doc_id"].min()
        keep = keep[~keep["h"].isin(base_h)]
        return pd.DataFrame({"doc_id": keep["doc_id"]
                             .to_numpy(np.int64)})

    return _docs(sf_dir, columns=("doc_id", "text", "source")) \
        .map_batches(to_hash, batch_format="pyarrow") \
        .groupby("part").map_groups(dedup_part, batch_format="pandas")


def incremental_minhash_dedup(sf_dir: str,
                              new_sources=INCREMENT_SOURCES):
    """Incremental NEAR-dup: documents arriving from ``new_sources`` are
    flagged when any of their MinHash LSH bands collides with a
    base-corpus doc (near-dup of something already in the lake) or with
    an earlier increment doc — the fuzzy sibling of incremental_dedup,
    the gate a continuously-crawled corpus runs before admitting a new
    shard.  Output: (doc_id, is_dup) over the increment only.

    Scale shape: same as minhash_dedup — the shuffles move
    (band_key, doc_id, is_new) rows, never text; bucket verdicts reduce
    per band then OR per doc, candidate pairs never materialize.
    """
    npart = coarse_npart()
    new_set = pa.array(sorted(set(new_sources)))

    class _Buckets:
        def __init__(self):
            self.hasher = worker_token_hasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            offsets, tok = tokenize_column(t["text"], self.hasher)
            sigs = doc_minhash(offsets, tok, self.hasher)
            keys = minhash_band_keys(sigs)
            doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
            is_new = pc.is_in(t["source"], value_set=new_set) \
                .to_numpy(zero_copy_only=False).astype(np.int8)
            return pa.table({
                "bucket": keys,
                "doc_id": pa.array(np.tile(doc_ids, MINHASH_BANDS),
                                   pa.int64()),
                "is_new": pa.array(np.tile(is_new, MINHASH_BANDS))})

    def add_bpart(t: pa.Table) -> pa.Table:
        part = (fast_hash64(t["bucket"]) % np.uint64(npart)) \
            .astype(np.int64)
        return t.append_column("part", pa.array(part))

    def bucket_verdict_part(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("bucket")
        has_base = grp["is_new"].transform("min") == 0
        mnew = g.assign(
            nid=g["doc_id"].where(g["is_new"] == 1)) \
            .groupby("bucket")["nid"].transform("min")
        new = g["is_new"] == 1
        flag = (has_base | (mnew < g["doc_id"]))[new].astype(np.int8)
        df = pd.DataFrame({"doc_id": g.loc[new, "doc_id"], "f": flag})
        df["part"] = df["doc_id"] % npart
        return df

    def doc_or_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False)["f"].max()
        return pd.DataFrame({"doc_id": agg["doc_id"],
                             "is_dup": agg["f"] > 0})

    return (_docs(sf_dir, columns=("doc_id", "text", "source"))
            .map_batches(as_tasks(_Buckets), batch_format="pyarrow",
                         batch_size=4096)
            .map_batches(add_bpart, batch_format="pyarrow")
            .groupby("part").map_groups(bucket_verdict_part,
                                        batch_format="pandas")
            .groupby("part").map_groups(doc_or_part,
                                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# duplicate-cluster assignment: distributed connected components
# ---------------------------------------------------------------------------


def connected_components(pairs, npart: Optional[int] = None,
                         max_rounds: int = 100):
    """Distributed connected components over an undirected pair Dataset
    ``(vec_a, vec_b)`` -> label Dataset ``(node, lbl)``, where ``lbl`` is
    the MINIMUM node id in the component (the canonical cluster id).

    MapReduce-CC via iterative min-label propagation; per round:
      1. one co-partitioned pass routes current labels + directed edges by
         ``src % NPART`` and emits one ``(dst, lbl(src))`` message per edge
         (vectorized pandas map inside each bucket — never per-node Python);
      2. one grouped min over (messages U labels) by ``node % NPART``
         computes the new label + a per-node ``changed`` flag, then chases
         bucket-local label chains to their fixpoint (free in-memory
         pointer jumping — collapses chains that co-locate in a bucket).
    Rounds repeat until sum(changed) == 0 (bounded by the diameter of the
    BUCKET-contracted graph, not the node graph, thanks to the in-bucket
    chase; near-dup clusters are shallow anyway).  Scale shape: the edge
    set is the OUTPUT of a near-dup pass (orders of magnitude smaller than
    the corpus); each round shuffles O(|E|) three-int64 rows, labels are
    re-materialized per round (O(|V|), bounds lineage) and coalesced back
    to NPART blocks (a union otherwise doubles the block count every
    round — measured 3 -> 511 blocks by round 7 with per-round wall
    blowing up to 20 s), and the only driver-side value is the scalar
    convergence counter.  NPART adapts to the edge count (one bucket per
    ~50k edges, capped by the cluster-derived coarse_npart) so small pair
    sets converge in one or two rounds while corpus-scale sets keep full
    reduce parallelism.  For adversarially deep graphs add a global
    pointer-jump round (route labels by ``lbl % NPART``) for O(log n)
    convergence; measured graphs gain nothing from it (10 -> 8 rounds) so
    it is left out of the hot loop.
    """

    sym = pairs.map_batches(
        lambda t: pa.table(
            {"src": np.concatenate([t["vec_a"].to_numpy().astype(np.int64),
                                    t["vec_b"].to_numpy().astype(np.int64)]),
             "dst": np.concatenate([t["vec_b"].to_numpy().astype(np.int64),
                                    t["vec_a"].to_numpy().astype(np.int64)])}),
        batch_format="pyarrow").materialize()
    # bucket count adapts to the edge set: ~50k edges per bucket, capped by
    # the cluster-derived coarse partition count — small graphs then
    # converge in 1-2 rounds (the whole component fits one bucket and the
    # local chase collapses it), corpus-scale graphs keep full parallelism
    n_edges = sym.count()
    if not n_edges:
        import ray.data as rd
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "lbl": pa.array([], pa.int64())}))
    npart = npart or max(1, min(coarse_npart(), n_edges // 50_000 + 1))

    if npart == 1:
        # TINY-GRAPH fast path: the whole edge set fits one bucket, so
        # the min-label fixpoint runs in memory inside ONE Ray pass
        # (numpy min-scatter + pointer jumping, O(log n) sweeps) — no
        # per-round shuffles and no extra convergence round.  Same
        # result by construction: min node id per component.  The
        # generic iterative path below is the scale path (npart grows
        # with the edge count).
        def local_cc(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            nodes, inv_src = np.unique(src, return_inverse=True)
            inv_dst = np.searchsorted(nodes, dst)   # symmetrized: total
            lbl = np.arange(len(nodes))
            while True:
                new = lbl.copy()
                np.minimum.at(new, inv_dst, lbl[inv_src])
                new = np.minimum(new, new[new])     # pointer jump
                if (new == lbl).all():
                    break
                lbl = new
            return pa.table({"node": pa.array(nodes),
                             "lbl": pa.array(nodes[lbl])})

        return sym.repartition(1).map_batches(
            local_cc, batch_format="pyarrow", batch_size=None)

    def add_part(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        return pa.table({"src": src, "dst": t["dst"].to_numpy(),
                         "part": src % npart})

    edges = sym.map_batches(add_part, batch_format="pyarrow") \
        .repartition(npart).materialize()

    def seed_candidates(t: pa.Table) -> pa.Table:
        v = np.unique(t["src"].to_numpy())
        return pa.table({"node": v, "lbl": v.copy(), "part": v % npart})

    def seed_distinct(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("node")
        return pd.DataFrame({"node": g["node"].to_numpy(np.int64),
                             "lbl": g["lbl"].to_numpy(np.int64)})

    labels = edges.map_batches(seed_candidates, batch_format="pyarrow") \
        .groupby("part").map_groups(seed_distinct, batch_format="pandas") \
        .materialize()

    # record layouts for the co-partitioned message pass: label rows carry
    # dst = -1, edge rows carry lbl = 0 (ignored); both key on src/node.
    def lab_rec(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table({"key": node,
                         "dst": np.full(len(node), -1, np.int64),
                         "lbl": t["lbl"].to_numpy(), "part": node % npart})

    def edge_rec(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        return pa.table({"key": src, "dst": t["dst"].to_numpy(),
                         "lbl": np.zeros(len(src), np.int64),
                         "part": t["part"].to_numpy()})

    def emit_messages(g: pd.DataFrame) -> pd.DataFrame:
        ed = g[g["dst"] >= 0]
        if not len(ed):
            return pd.DataFrame({"node": np.empty(0, np.int64),
                                 "lbl": np.empty(0, np.int64)})
        lab = g[g["dst"] < 0]
        lut = pd.Series(lab["lbl"].to_numpy(np.int64),
                        index=lab["key"].to_numpy(np.int64))
        return pd.DataFrame({"node": ed["dst"].to_numpy(np.int64),
                             "lbl": lut[ed["key"].to_numpy(np.int64)]
                             .to_numpy(np.int64)})

    def msg_rec(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table({"node": node, "lbl": t["lbl"].to_numpy(),
                         "is_lab": np.zeros(len(node), np.int8),
                         "part": node % npart})

    def lab_rec2(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table({"node": node, "lbl": t["lbl"].to_numpy(),
                         "is_lab": np.ones(len(node), np.int8),
                         "part": node % npart})

    def min_and_chase(g: pd.DataFrame) -> pd.DataFrame:
        mn = g.groupby("node")["lbl"].min()
        node = mn.index.to_numpy(np.int64)
        lbl = mn.to_numpy(np.int64)
        # bucket-local pointer chase: map lbl through this bucket's own
        # (node -> lbl) pairs until fixpoint (labels only decrease, so any
        # chase step remains a valid component member <= node)
        while True:
            pos = np.searchsorted(node, lbl)
            pos = np.clip(pos, 0, len(node) - 1)
            hit = node[pos] == lbl
            nxt = np.where(hit, lbl[pos], lbl)
            if (nxt >= lbl).all():
                break
            lbl = np.minimum(lbl, nxt)
        old = g[g["is_lab"] == 1].set_index("node")["lbl"]
        changed = (lbl < old.reindex(mn.index).to_numpy(np.int64)) \
            .astype(np.int8)
        return pd.DataFrame({"node": node, "lbl": lbl, "changed": changed})

    for _ in range(max_rounds):
        msgs = labels.map_batches(lab_rec, batch_format="pyarrow") \
            .union(edges.map_batches(edge_rec, batch_format="pyarrow")) \
            .groupby("part").map_groups(emit_messages, batch_format="pandas")
        # repartition coalesces the union's additive block count back to
        # NPART before each sort shuffle (blocks otherwise double per
        # round: N -> 2N+1); map-only split/merge, no extra sort
        labels = msgs.map_batches(msg_rec, batch_format="pyarrow") \
            .union(labels.map_batches(lab_rec2, batch_format="pyarrow")) \
            .repartition(npart) \
            .groupby("part").map_groups(min_and_chase,
                                        batch_format="pandas") \
            .materialize()
        if not labels.sum("changed"):
            return labels.drop_columns(["changed"])
    raise RuntimeError(f"connected_components: no fixpoint in "
                       f"{max_rounds} rounds")


def dedup_clusters(sf_dir: str, threshold: float = 0.35,
                   pair_source: str = "auto"):
    """Duplicate-cluster assignment: connected components over the
    embedding near-dup pair graph (cosine >= ``threshold``), canonical
    cluster id = min vec_id per component.  The cluster view a dedup
    keeper policy consumes ("keep one doc per transitive duplicate
    cluster"), vs the pairwise view of ``embedding_near_dup`` — pair
    output alone under-merges because near-duplication is transitive in
    chains (A~B, B~C but A!~C).

    Output: (vec_id, cluster_id, cluster_size, keep) — one row per node
    that appears in at least one near-dup pair; keep = 1 iff the node is
    its cluster's canonical (minimum) member.

    Scale shape: the pair source routes by corpus size
    (similarity.near_dup_pairs) — the exact block-pair scorer under
    NEAR_DUP_EXACT_MAX_ROWS rows (the oracle bridge; two object-store
    blocks per task, no full-corpus read or broadcast, but O(n^2/2)
    flops), the LSH-banded generator above it (in-bucket exact verify,
    linear flops, recall pinned in tests) — same columns either way; CC
    shuffles only integer triples (see connected_components); the final
    sizing pass is ONE co-partitioned groupby by ``cluster_id % NPART``
    (a cluster's rows all land in one bucket, so the count is exact with
    no second pass).
    """
    from .similarity import near_dup_pairs

    pairs = near_dup_pairs(sf_dir, threshold=threshold,
                           pair_source=pair_source) \
        .select_columns(["vec_a", "vec_b"])
    labels = connected_components(pairs)
    npart = max(1, min(coarse_npart(), labels.count() // 50_000 + 1))

    def by_cluster(t: pa.Table) -> pa.Table:
        lbl = t["lbl"].to_numpy()
        return pa.table({"node": t["node"].to_numpy(), "lbl": lbl,
                         "part": lbl % npart})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy(np.int64)
        lbl = g["lbl"].to_numpy(np.int64)
        size = g.groupby("lbl")["node"].transform("size") \
            .to_numpy(np.int64)
        return pd.DataFrame({"vec_id": node, "cluster_id": lbl,
                             "cluster_size": size,
                             "keep": (node == lbl).astype(np.int32)})

    return labels.map_batches(by_cluster, batch_format="pyarrow") \
        .groupby("part").map_groups(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# cross-document duplicated spans (exact-substring dedup signal)
# ---------------------------------------------------------------------------


def dup_span_stats(sf_dir: str, k: int = 5, hash_mode: str = "fast"):
    """Cross-document duplicated-span statistics — the exact-substring
    dedup signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better"), at token-shingle granularity: for every
    document, how many of its k-token shingle positions carry a shingle
    that occurs MORE THAN ONCE in the whole corpus (in any document,
    intra-document repeats included).  A span-removal pass would join the
    duplicated shingle set back against token positions; this operator
    computes the per-document signal the removal (or filtering) decision
    consumes.

    Output: (doc_id, n_shingles, dup_shingles, dup_frac_q), with
    dup_frac_q = floor(dup/total * 10000) basis points.  Documents with
    fewer than k tokens have no shingles and emit no row (mirrored by the
    SQL oracle).

    Scale shape: the text never shuffles.  The map stage builds shingle
    strings with k zero-copy Arrow slices + one binary_join kernel and
    ships ONE (shingle_hash, doc_id, count) row per distinct pair; then
    two coarse-partition reductions (by hash bucket: global counts +
    per-doc partials; by doc bucket: final sums).  hash_mode='md5' is the
    SQL-bridge mode pinned by the driver query; 'fast' (default) is the
    vectorized xxhash production path.
    """
    npart = coarse_npart()

    def shingle_counts(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        L = len(flat)
        empty = pa.table({"bpart": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if L < k:
            return empty
        joined = pc.binary_join_element_wise(
            *[flat.slice(j, L - k + 1) for j in range(k)], " ")
        n_tokens = np.diff(offsets)
        doc_pos = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_tokens)
        ok = doc_pos[: L - k + 1] == doc_pos[k - 1:]
        if not ok.any():
            return empty
        h = content_hash60(joined, hash_mode)[ok]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        d = ids[doc_pos[: L - k + 1][ok]]
        order = np.lexsort((h, d))
        sh, sd = h[order], d[order]
        new = np.concatenate([[True], (sh[1:] != sh[:-1])
                              | (sd[1:] != sd[:-1])])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(sh))).astype(np.int64)
        return pa.table({"bpart": pa.array(sh[starts] % npart),
                         "h": pa.array(sh[starts]),
                         "doc_id": pa.array(sd[starts]),
                         "cnt": pa.array(cnt)})

    def per_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g["cnt"].to_numpy(np.int64)
        tot = g.groupby("h")["cnt"].transform("sum").to_numpy(np.int64)
        part = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "ns": cnt,
                             "dup": np.where(tot > 1, cnt, 0)})
        agg = part.groupby("doc_id", as_index=False).sum()
        agg["dpart"] = agg["doc_id"] % npart
        return agg

    def per_doc_bucket(g: pd.DataFrame) -> pa.Table:
        a = g.groupby("doc_id", as_index=False)[["ns", "dup"]].sum()
        ns = a["ns"].to_numpy(np.int64)
        dup = a["dup"].to_numpy(np.int64)
        q = np.floor(dup * 10000.0 / ns.astype(np.float64)).astype(np.int64)
        return pa.table({"doc_id": pa.array(a["doc_id"].to_numpy(np.int64)),
                         "n_shingles": pa.array(ns),
                         "dup_shingles": pa.array(dup),
                         "dup_frac_q": pa.array(q)})

    return (_docs(sf_dir)
            .map_batches(shingle_counts, batch_format="pyarrow",
                         batch_size=4096)
            .groupby("bpart").map_groups(per_hash_bucket,
                                         batch_format="pandas")
            .groupby("dpart").map_groups(per_doc_bucket,
                                         batch_format="pandas"))


def dup_span_removal(sf_dir: str, k: int = 5, hash_mode: str = "fast"):
    """Exact-substring span REMOVAL (the transform dup_span_stats is the
    signal for; Lee et al. 2021): every token covered by a k-token shingle
    that occurs more than once corpus-wide is dropped, and the document is
    re-emitted with the surviving tokens.

    Output: (doc_id, n_tokens, n_kept, clean_text) — all documents appear,
    fully-duplicated ones with n_kept = 0 and clean_text = ''.

    Fully distributed and exact — nothing corpus-cardinality-sized lands
    on the driver (same contract as the partitioned ANTI join in
    analytics.py): one (hash, doc, position) posting per shingle position
    shuffles by hash bucket (the positions-scale exchange every
    exact-substring method pays — Lee et al.'s suffix array likewise
    touches every position); buckets emit (doc, position) only for
    duplicated shingles; the duplicated positions then co-partition with
    the documents (union-tag pattern, text ships through exactly one
    shuffle) and each doc bucket rebuilds the kept text with one Arrow
    filter + list rebuild + binary_join.
    """
    npart = coarse_npart()

    def shingle_positions(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        L = len(flat)
        empty = pa.table({"bpart": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if L < k:
            return empty
        joined = pc.binary_join_element_wise(
            *[flat.slice(j, L - k + 1) for j in range(k)], " ")
        n_tokens = np.diff(offsets)
        doc_pos = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_tokens)
        ok = doc_pos[: L - k + 1] == doc_pos[k - 1:]
        if not ok.any():
            return empty
        h = content_hash60(joined, hash_mode)[ok]
        drow = doc_pos[: L - k + 1][ok]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.flatnonzero(ok) - offsets[:-1][drow]
        return pa.table({"bpart": pa.array(h % npart), "h": pa.array(h),
                         "doc_id": pa.array(ids[drow]),
                         "pos": pa.array(pos.astype(np.int64))})

    def per_hash_bucket(g: pd.DataFrame) -> pa.Table:
        tot = g.groupby("h")["h"].transform("size").to_numpy(np.int64)
        dup = g[tot > 1]
        d = dup["doc_id"].to_numpy(np.int64)
        return pa.table({
            "dpart": pa.array(d % npart),
            "doc_id": pa.array(d),
            "pos": pa.array(dup["pos"].to_numpy(np.int64)),
            "text": pa.nulls(len(d), pa.string()),
            "is_doc": pa.array(np.zeros(len(d), dtype=bool))})

    def doc_side(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        n = t.num_rows
        return pa.table({
            "dpart": pc.cast(pc.bit_wise_and(d, npart - 1), pa.int64()),
            "doc_id": d,
            "pos": pa.array(np.full(n, -1, np.int64)),
            "text": t["text"],
            "is_doc": pa.array(np.ones(n, dtype=bool))})

    def per_doc_bucket(g: pd.DataFrame) -> pa.Table:
        docs = g[g["is_doc"]]
        marks = g[~g["is_doc"]]
        doc_ids = docs["doc_id"].to_numpy(np.int64)
        text_arr = pa.array(docs["text"].astype(object).to_numpy(),
                            pa.string())
        split = pc.split_pattern(text_arr, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_tokens = np.diff(offsets)
        covered = np.zeros(len(flat), dtype=bool)
        if len(marks):
            order = np.argsort(doc_ids, kind="mergesort")
            ridx = order[np.searchsorted(doc_ids[order],
                                         marks["doc_id"].to_numpy(np.int64))]
            base = offsets[:-1][ridx] + marks["pos"].to_numpy(np.int64)
            covered[(base[:, None]
                     + np.arange(k, dtype=np.int64)).reshape(-1)] = True
        kept = ~covered
        kept_counts = np.add.reduceat(
            kept.astype(np.int64), offsets[:-1]) if len(flat) \
            else np.zeros(len(doc_ids), np.int64)
        new_off = np.zeros(len(doc_ids) + 1, np.int64)
        np.cumsum(kept_counts, out=new_off[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(pa.array(kept)))
        clean = pc.binary_join(lst, " ")
        return pa.table({"doc_id": pa.array(doc_ids),
                         "n_tokens": pa.array(n_tokens),
                         "n_kept": pa.array(kept_counts),
                         "clean_text": pc.fill_null(clean, "")})

    dup_marks = (_docs(sf_dir)
                 .map_batches(shingle_positions, batch_format="pyarrow",
                              batch_size=4096)
                 .groupby("bpart").map_groups(per_hash_bucket,
                                              batch_format="pandas"))
    docs = _docs(sf_dir).map_batches(doc_side, batch_format="pyarrow")
    return docs.union(dup_marks) \
        .groupby("dpart").map_groups(per_doc_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram novelty: first-occurrence attribution in corpus order
# ---------------------------------------------------------------------------


def ngram_novelty(sf_dir: str, k: int = 5, hash_mode: str = "fast"):
    """Per-document n-gram NOVELTY in corpus order: for each document,
    the fraction of its distinct k-token shingles whose global first
    occurrence (minimum ``doc_id`` over the whole corpus) is this
    document.  This is the marginal-new-content curve an incremental
    crawl pipeline watches — how much a slice adds beyond everything
    ingested before it — the first-occurrence dual of ``dup_span_stats``
    (which counts multiplicity, not attribution).  Reference parity:
    pg-walstream has no corpus ops; this extends the training-data
    surface of SURVEY §2.12.

    Output: (doc_id, n_distinct, n_novel, novelty_q), novelty_q =
    floor(n_novel / n_distinct * 10000) basis points.  Docs with < k
    tokens emit no row (mirrored by the SQL oracle).

    Scale shape: the text never shuffles.  Each doc is one row, so a
    batch-local distinct over (shingle_hash, doc_id) is globally
    distinct; the map stage ships ONE int64 posting per distinct pair.
    Then two coarse reductions: by hash bucket (min doc per shingle +
    per-doc novel/total partials, all vectorized np.lexsort/reduceat)
    and by doc bucket (final sums).  hash_mode='md5' is the SQL-bridge
    mode pinned by the driver query; 'fast' is the xxhash path.
    """
    npart = coarse_npart()

    def postings(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        L = len(flat)
        empty = pa.table({"bpart": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64())})
        if L < k:
            return empty
        joined = pc.binary_join_element_wise(
            *[flat.slice(j, L - k + 1) for j in range(k)], " ")
        n_tokens = np.diff(offsets)
        doc_pos = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            n_tokens)
        ok = doc_pos[: L - k + 1] == doc_pos[k - 1:]
        if not ok.any():
            return empty
        h = content_hash60(joined, hash_mode)[ok]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        d = ids[doc_pos[: L - k + 1][ok]]
        uniq = np.unique(np.stack([h, d], axis=1), axis=0)
        return pa.table({"bpart": pa.array(uniq[:, 0] % npart),
                         "h": pa.array(uniq[:, 0]),
                         "doc_id": pa.array(uniq[:, 1])})

    def per_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy(np.int64)
        d = g["doc_id"].to_numpy(np.int64)
        # min doc per shingle, broadcast back to every posting of that
        # shingle — all sort + reduceat, no Python per group
        order = np.lexsort((d, h))
        hs, ds = h[order], d[order]
        starts = np.flatnonzero(
            np.concatenate([[True], hs[1:] != hs[:-1]]))
        first = ds[starts]                    # min doc (d is sort minor)
        reps = np.diff(np.append(starts, len(hs)))
        novel = (ds == np.repeat(first, reps)).astype(np.int64)
        part = pd.DataFrame({"doc_id": ds, "nd": 1, "novel": novel}) \
            .groupby("doc_id", as_index=False).sum()
        part["dpart"] = part["doc_id"] % npart
        return part

    def per_doc_bucket(g: pd.DataFrame) -> pa.Table:
        a = g.groupby("doc_id", as_index=False)[["nd", "novel"]].sum()
        nd = a["nd"].to_numpy(np.int64)
        nv = a["novel"].to_numpy(np.int64)
        q = np.floor(nv * 10000.0 / nd.astype(np.float64)).astype(np.int64)
        return pa.table({"doc_id": pa.array(a["doc_id"].to_numpy(np.int64)),
                         "n_distinct": pa.array(nd),
                         "n_novel": pa.array(nv),
                         "novelty_q": pa.array(q)})

    return (_docs(sf_dir)
            .map_batches(postings, batch_format="pyarrow",
                         batch_size=4096)
            .groupby("bpart").map_groups(per_hash_bucket,
                                         batch_format="pandas")
            .groupby("dpart").map_groups(per_doc_bucket,
                                         batch_format="pandas"))


# ---------------------------------------------------------------------------
# cross-source n-gram contamination matrix
# ---------------------------------------------------------------------------


def source_ngram_overlap(sf_dir: str, k: int = 3, hash_mode: str = "fast"):
    """Cross-source n-gram contamination matrix: for every ordered pair
    of sources (a, b), the number of distinct k-token shingles they share
    and that intersection as a fraction of a's distinct-shingle set.  The
    between-slice generalization of ``decontaminate`` (benchmark-vs-corpus)
    — a mixture audit answering "which crawl sources are near-copies of
    which" before source-weighted mixing.

    Output: (src_a, src_b, n_inter, overlap_q) for every ordered pair that
    shares at least one shingle, diagonal included (n_inter there = |S_a|,
    overlap_q = 10000); overlap_q = floor(n_inter / |S_a| * 10000).

    Scale shape: text never shuffles.  A tiny groupby first collects the
    distinct source names (codes are their sorted rank); the map stage
    ships ONE (shingle_hash, src_code) int posting per batch-distinct
    pair; one hash-bucket reduction dedupes globally (a hash lands in
    exactly one bucket), then emits SPARSE ordered co-occurrence pairs
    per shingle (a source appears at most once per shingle group, so
    group sizes are <= |sources| and the per-bucket output is the
    observed-pair count matrix, never the dense S^2 grid); a final
    (a, b) groupby sums bucket partials — bounded by observed pairs.
    Assumes source cardinality is mixture-audit-granular (<= thousands),
    not per-URL.
    """
    npart = coarse_npart()
    src_rows = _docs(sf_dir, columns=("source",)) \
        .groupby("source").count().take_all()
    names = sorted(r["source"] for r in src_rows)
    code = {s: i for i, s in enumerate(names)}

    def postings(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        L = len(flat)
        empty = pa.table({"bpart": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64()),
                          "src": pa.array([], pa.int64())})
        if L < k:
            return empty
        joined = pc.binary_join_element_wise(
            *[flat.slice(j, L - k + 1) for j in range(k)], " ")
        n_tokens = np.diff(offsets)
        doc_pos = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            n_tokens)
        ok = doc_pos[: L - k + 1] == doc_pos[k - 1:]
        if not ok.any():
            return empty
        h = content_hash60(joined, hash_mode)[ok]
        codes = np.fromiter((code[s] for s in t["source"].to_pylist()),
                            dtype=np.int64, count=t.num_rows)
        s = codes[doc_pos[: L - k + 1][ok]]
        uniq = np.unique(np.stack([h, s], axis=1), axis=0)
        return pa.table({"bpart": pa.array(uniq[:, 0] % npart),
                         "h": pa.array(uniq[:, 0]),
                         "src": pa.array(uniq[:, 1])})

    def per_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["h", "src"])   # global: h lives here only
        g = g.sort_values(["h", "src"], kind="mergesort")
        h = g["h"].to_numpy(np.int64)
        s = g["src"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
        cnt = np.diff(np.append(starts, len(h)))
        # ordered all-pairs per shingle group (diagonal included): the
        # posting at i emits one row per member of its group
        rep = np.repeat(cnt, cnt)             # emission block per posting
        a = np.repeat(s, rep)
        csum = np.cumsum(rep)
        off = np.arange(int(csum[-1]) if len(csum) else 0,
                        dtype=np.int64) - np.repeat(csum - rep, rep)
        b = s[np.repeat(np.repeat(starts, cnt), rep) + off]
        part = pd.DataFrame({"a": a, "b": b, "cnt": 1}) \
            .groupby(["a", "b"], as_index=False).sum()
        return part

    parts = (_docs(sf_dir, columns=("doc_id", "text", "source"))
             .map_batches(postings, batch_format="pyarrow",
                          batch_size=4096)
             .groupby("bpart").map_groups(per_hash_bucket,
                                          batch_format="pandas")
             .to_pandas())     # bounded: npart x observed source pairs
    cols = ["src_a", "src_b", "n_inter", "overlap_q"]
    if len(parts) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=object if c[0] == "s"
                                          else np.int64) for c in cols})
    pdf = parts.groupby(["a", "b"], as_index=False)["cnt"].sum()
    cnt = pdf["cnt"].to_numpy(np.int64)
    a = pdf["a"].to_numpy(np.int64)
    b = pdf["b"].to_numpy(np.int64)
    diag = {int(x): int(c) for x, y, c in zip(a, b, cnt) if x == y}
    sz = np.fromiter((diag[int(x)] for x in a), dtype=np.int64,
                     count=len(a))
    q = np.floor(cnt * 10000.0 / sz.astype(np.float64)).astype(np.int64)
    name_arr = np.asarray(names, dtype=object)
    return pd.DataFrame({"src_a": name_arr[a], "src_b": name_arr[b],
                         "n_inter": cnt, "overlap_q": q})


# ---------------------------------------------------------------------------
# PageRank over the near-dup pair graph (duplicate-hub scoring)
# ---------------------------------------------------------------------------


class _PrShard:
    """One PageRank graph shard (Pregel-style vertex-cut by ``node % K``).

    Holds the bucket's out-edges compacted to local integer indices —
    built ONCE from a single edge shuffle; per superstep it emits
    per-destination-bucket contribution sums that are already reduced
    locally (``np.bincount`` over compacted dst ids), so the cross-actor
    exchange per round is at most K x |distinct dst per (src-bucket,
    dst-bucket) cell| floats — never |edges| rows, and never a Ray Data
    all-to-all.  Memory per actor: |E|/K x ~12 bytes of int32/float64
    index arrays (the 100 TB sizing knob is K ~= cluster cores).
    """

    def __init__(self, k: int):
        self.k = k
        self.nodes = np.zeros(0, np.int64)       # owned nodes, sorted
        self.deg = np.zeros(0, np.int64)
        self.rank = np.zeros(0, np.float64)
        self._src_idx = []                       # per dst-bucket: local src
        self._dst_u = []                         # per dst-bucket: uniq dsts
        self._dst_inv = []                       # per dst-bucket: compact id
        self._buf_src: list = []                 # pre-finalize push buffer
        self._buf_dst: list = []
        self._seen_parts: set = set()

    def load_part(self, src: np.ndarray, dst: np.ndarray,
                  part_key: bytes | None = None) -> None:
        """Buffer one pushed edge slice (streaming-router style: pushers
        partition each batch by ``src % k`` and send slices straight to
        the owning shard — no Dataset all-to-all sort).  ``part_key`` is
        a content digest of the source batch: a Ray task retry
        (at-least-once execution) re-sending the same slice is dropped
        instead of double-loading its edges."""
        if part_key is not None:
            if part_key in self._seen_parts:
                return
            self._seen_parts.add(part_key)
        self._buf_src.append(src)
        self._buf_dst.append(dst)

    def load(self, src: np.ndarray, dst: np.ndarray) -> int:
        self.load_part(src, dst)
        return self.finalize()

    def finalize(self) -> int:
        """Compact the buffered edges (src % k == bucket) into local
        index arrays.  Symmetrized input guarantees every dst also
        appears as a src in its own bucket, so ownership is total."""
        src = np.concatenate(self._buf_src) if self._buf_src \
            else np.zeros(0, np.int64)
        dst = np.concatenate(self._buf_dst) if self._buf_dst \
            else np.zeros(0, np.int64)
        self._buf_src, self._buf_dst = [], []
        self.nodes, src_idx = np.unique(src, return_inverse=True)
        self.deg = np.bincount(src_idx, minlength=len(self.nodes)) \
            .astype(np.int64)
        db = dst % self.k
        order = np.argsort(db, kind="stable")
        dst_s, src_s = dst[order], src_idx[order]
        bounds = np.searchsorted(db[order], np.arange(self.k + 1))
        self._src_idx, self._dst_u, self._dst_inv = [], [], []
        for t in range(self.k):
            sl = slice(bounds[t], bounds[t + 1])
            u, inv = np.unique(dst_s[sl], return_inverse=True)
            self._src_idx.append(src_s[sl].astype(np.int32))
            self._dst_u.append(u)
            self._dst_inv.append(inv.astype(np.int32))
        return len(self.nodes)

    def init_rank(self, r0: float) -> None:
        self.rank = np.full(len(self.nodes), r0, np.float64)
        self.base_vec: Optional[np.ndarray] = None

    def smallest_nodes(self, m: int) -> np.ndarray:
        """This shard's m smallest owned node ids (nodes are sorted)."""
        return self.nodes[:m]

    def init_personal(self, seed_ids: np.ndarray, damping: float) -> None:
        """Personalized teleport: restart mass concentrated on the seed
        set instead of uniform — rank_v = (1-d)*p_v + d*sum, with
        p_v = 1/|S| on seeds, 0 elsewhere."""
        p = np.isin(self.nodes, seed_ids).astype(np.float64) \
            / max(len(seed_ids), 1)
        self.base_vec = (1.0 - damping) * p
        self.rank = p.copy()

    def scatter(self):
        """One superstep's outgoing half: per dst-bucket pre-aggregated
        contribution sums.  Called with num_returns=k so each receiving
        bucket fetches only its own slice."""
        w = self.rank / np.maximum(self.deg, 1)
        out = []
        for t in range(self.k):
            sums = np.bincount(self._dst_inv[t],
                               weights=w[self._src_idx[t]],
                               minlength=len(self._dst_u[t]))
            out.append((self._dst_u[t], sums))
        return tuple(out) if self.k > 1 else out[0]

    def gather(self, base: float, damping: float, *parts) -> None:
        """Reduce the k incoming pre-summed parts (fixed sender order ->
        deterministic float summation) into the new rank vector."""
        s = np.zeros(len(self.nodes), np.float64)
        for u, part in parts:
            if len(u):
                s[np.searchsorted(self.nodes, u)] += part
        base_term = self.base_vec if getattr(self, "base_vec", None) \
            is not None else base
        self.rank = base_term + damping * s

    def ranks_table(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "rank": pa.array(self.rank, pa.float64())})


def _sym_edges(pairs):
    """Symmetrize an undirected pair Dataset into directed (src, dst)."""

    def sym(t: pa.Table) -> pa.Table:
        a = t["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    return pairs.map_batches(sym, batch_format="pyarrow").materialize()


def _graph_shard_count(n_edges: int) -> int:
    """~one shard actor per 1M directed edges (~12 MB of compacted
    int32/float64 index arrays), capped at cluster CPUs — on a real
    cluster K grows with the node count via cluster_resources.  The
    previous 64k-edge divisor over-sharded mid-size graphs: per-round
    cost has a k^2 scatter-part term plus k actor spawns, and an A/B on
    the 1M-node/4M-pair bench graph measured 10-superstep PageRank at
    2.12 s with k=8 vs 3.61 s with k=32 (kcore flat within noise)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(ncpu, n_edges // 1_000_000 + 2))


def _finish_graph_shards(actors, method: str):
    """Pull the result table refs, make sure they are committed to the
    object store, then KILL the shard actors before handing the refs to
    Ray Data.  Without the kill every graph run leaks k actors whose
    fractional-CPU reservations starve later pipelines in the same
    session (kcore after pagerank ran 3x slower from exactly this).
    Returned objects live in plasma independent of the producing actor;
    the documented recovery unit is the whole computation, so losing
    lineage is already the contract."""
    import ray
    import ray.data as rd

    refs = [getattr(a, method).remote() for a in actors]
    ray.wait(refs, num_returns=len(refs))
    for a in actors:
        ray.kill(a)
    return rd.from_arrow_refs(refs)


def _load_graph_shards(edges, actors, k: int) -> int:
    """Partition the edge stream into the K shard actors by direct
    pushes (streaming-router style): each map task slices its batch by
    ``src % k`` and sends the slices straight to the owning actors, then
    a finalize() per actor compacts.  No Dataset all-to-all sort — the
    exchange IS the route — and shard actors reserve fractional CPUs so
    the pushing map tasks are never starved by the pool reservation.
    Returns the global node count."""
    import ray

    def push(t: pa.Table) -> pa.Table:
        import hashlib

        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        # content digest of the whole batch: a retried push task resends
        # byte-identical slices, which the shard drops idempotently
        bkey = hashlib.blake2b(
            np.ascontiguousarray(s).tobytes()
            + np.ascontiguousarray(d).tobytes(),
            digest_size=16).digest()
        b = s % k
        order = np.argsort(b, kind="stable")
        ss, dd, bb = s[order], d[order], b[order]
        bounds = np.searchsorted(bb, np.arange(k + 1))
        refs = []
        for i in range(k):
            sl = slice(bounds[i], bounds[i + 1])
            if sl.stop > sl.start:
                refs.append(actors[i].load_part.remote(
                    np.ascontiguousarray(ss[sl]),
                    np.ascontiguousarray(dd[sl]),
                    part_key=bkey + i.to_bytes(4, "little")))
        ray.get(refs)                   # acked before the task returns
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    edges.map_batches(push, batch_format="pyarrow",
                      batch_size=1 << 20).materialize()
    return sum(ray.get([a.finalize.remote() for a in actors]))


def pagerank(pairs, damping: float = 0.85, iters: int = 10,
             npart: Optional[int] = None):
    """Distributed PageRank over an undirected pair Dataset
    ``(vec_a, vec_b)`` -> rank Dataset ``(node, rank)``.  Ranks sum to 1;
    high-rank nodes are the graph's duplicate hubs (documents near-dup
    to many others — the "template page" signal a dedup policy
    prioritizes for removal).

    Architecture (Pregel-style actor pool — the brief's "raw actors only
    where the Dataset API can't express it" case: an iterative algorithm
    over SHARED MUTABLE graph state):
      1. ONE Dataset shuffle partitions the symmetrized edge list by
         ``src % K`` into K ``_PrShard`` actors, each compacting its
         adjacency to int32 index arrays (degree is local: all of a
         node's out-edges live in its own bucket).
      2. Each superstep is scatter (per-actor ``np.bincount`` -> K
         pre-aggregated ``(dst_nodes, sums)`` slices via
         ``num_returns=K``, fetched point-to-point by the owning
         bucket) + gather (deterministic fixed-order reduce, rank =
         (1-d)/N + d*sum).  Nothing static ever re-ships: the previous
         Dataset-loop design moved the edge list through an all-to-all
         every iteration; this moves only O(|nodes|) floats per round.
    Ranks come back as a Dataset via ``from_arrow_refs`` (one table per
    shard, no driver materialization).  Iterative and float-summed, so
    no SQL oracle: invariants (stochasticity, positivity, hub ordering)
    are pinned in tests.

    Failure contract (BSP restart semantics): shard state is per-round
    mutable, so an actor death mid-run loses its shard — the recovery
    unit is the whole computation (edges stay materialized in the
    object store; a re-run re-pushes and re-iterates from round 0).
    Graph jobs are seconds-to-minutes next to the replay tier, so
    restart-on-failure is the standard BSP choice over per-round
    checkpointing; a deployment needing mid-run recovery would snapshot
    ``(nodes, rank)`` per shard every R rounds — the same state_dict
    pattern the streaming aggregators implement.
    """
    import ray
    import ray.data as rd

    edges = _sym_edges(pairs)
    n_edges = edges.count()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
    if n_edges == 0:
        return rd.from_arrow(empty)
    k = npart or _graph_shard_count(n_edges)

    Shard = ray.remote(num_cpus=0.5)(_PrShard)
    actors = [Shard.remote(k) for _ in range(k)]
    n_nodes = _load_graph_shards(edges, actors, k)
    base = (1.0 - damping) / n_nodes
    ray.get([a.init_rank.remote(1.0 / n_nodes) for a in actors])

    for _ in range(iters):
        outs = [a.scatter.options(num_returns=k).remote() if k > 1
                else [a.scatter.remote()] for a in actors]
        ray.get([actors[b].gather.remote(
            base, damping, *[outs[a][b] for a in range(k)])
            for b in range(k)])

    return _finish_graph_shards(actors, "ranks_table")


PPR_SEEDS = 8        # personalized restart set: the m smallest graph nodes


def personalized_pagerank(pairs, damping: float = 0.85, iters: int = 10,
                          n_seeds: int = PPR_SEEDS,
                          npart: Optional[int] = None):
    """Personalized PageRank (random walk with restart) over an
    undirected pair Dataset — restart mass concentrated on a SEED set
    instead of uniform, so high-rank nodes are the graph neighborhood of
    the seeds.  The corpus-curation use: seed with known-bad/known-dup
    documents and expand to everything the near-dup graph connects to
    them (guilt-by-association sweep), far cheaper than re-scoring the
    corpus.

    The seed set is the ``n_seeds`` smallest node ids in the graph —
    deterministic and total (nonempty whenever the graph is), which is
    what makes the unrolled-SQL bridge possible.  Same Pregel shard
    engine as ``pagerank``: only the init vector and the per-node base
    term differ; per superstep only pre-aggregated bucket sums travel.
    """
    import ray
    import ray.data as rd

    edges = _sym_edges(pairs)
    n_edges = edges.count()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
    if n_edges == 0:
        return rd.from_arrow(empty)
    k = npart or _graph_shard_count(n_edges)

    Shard = ray.remote(num_cpus=0.5)(_PrShard)
    actors = [Shard.remote(k) for _ in range(k)]
    _load_graph_shards(edges, actors, k)
    mins = ray.get([a.smallest_nodes.remote(n_seeds) for a in actors])
    seed_ids = np.sort(np.concatenate(mins))[:n_seeds]
    ray.get([a.init_personal.remote(seed_ids, damping) for a in actors])

    for _ in range(iters):
        outs = [a.scatter.options(num_returns=k).remote() if k > 1
                else [a.scatter.remote()] for a in actors]
        ray.get([actors[b].gather.remote(
            0.0, damping, *[outs[a][b] for a in range(k)])
            for b in range(k)])

    return _finish_graph_shards(actors, "ranks_table")


def dedup_ppr_seeded(sf_dir: str, threshold: float = 0.35,
                     iters: int = 10):
    """Seed-expansion over the embedding near-dup graph: personalized
    PageRank from the smallest-id seed nodes, ranks as nano-unit ints
    (the deterministic reduced form the driver hash-checks).
    Output: (vec_id, rank_nano)."""
    from .similarity import embedding_near_dup

    pairs = embedding_near_dup(sf_dir, threshold=threshold) \
        .select_columns(["vec_a", "vec_b"])

    def quantize(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": t["node"],
            "rank_nano": pa.array(np.round(r * 1e9).astype(np.int64))})

    return personalized_pagerank(pairs, iters=iters).map_batches(
        quantize, batch_format="pyarrow")


def dedup_cluster_sizes(sf_dir: str, threshold: float = 0.35):
    """Duplicate-FAMILY size distribution: (cluster_size, n_clusters)
    over the connected components of the near-dup pair graph — the
    dedup-policy dashboard row (how much of the corpus sits in 2-dup
    pairs vs 50-dup template families decides keep-one vs drop-all).

    Scale shape: dedup_clusters' (node, cluster) output reduced twice —
    per-cluster size (one grouped count over int pairs) then the
    bounded size histogram; nothing touches text or embeddings again.
    """
    from ray.data.aggregate import Count

    labels = dedup_clusters(sf_dir, threshold=threshold) \
        .select_columns(["cluster_id"])
    sizes = labels.groupby("cluster_id").aggregate(
        Count(alias_name="cluster_size"))
    hist = sizes.groupby("cluster_size").aggregate(
        Count(alias_name="n_clusters"))
    return hist.map_batches(
        lambda t: pa.table({
            "cluster_size": pc.cast(t["cluster_size"], pa.int64()),
            "n_clusters": pc.cast(t["n_clusters"], pa.int64())}),
        batch_format="pyarrow")


def dedup_pagerank(sf_dir: str, threshold: float = 0.35,
                   iters: int = 10):
    """Duplicate-hub scoring: PageRank over the embedding near-dup pair
    graph (same pair source as dedup_clusters).  Output: (vec_id, rank)
    for every node in at least one near-dup pair, rank summing to 1 —
    iterative, so a rows-only driver check with invariants in tests.
    """
    from .similarity import embedding_near_dup

    pairs = embedding_near_dup(sf_dir, threshold=threshold) \
        .select_columns(["vec_a", "vec_b"])
    return pagerank(pairs, iters=iters).map_batches(
        lambda t: pa.table({"vec_id": t["node"], "rank": t["rank"]}),
        batch_format="pyarrow")


def dedup_triangles(sf_dir: str, threshold: float = 0.35):
    """Triangle counting over the near-dup pair graph — the local
    clustering signal that separates tight duplicate cliques from loose
    chains (a cluster where every pair matches is a stronger dup verdict
    than a transitive A~B~C chain; dedup_clusters merges both).

    Output: (vec_id, n_tri) — per node, the number of triangles it
    belongs to; nodes in no triangle emit no row.

    Algorithm (node-iterator on the ordered graph): pairs arrive as
    (vec_a < vec_b), so grouping by vec_a gives each node its
    GREATER-id adjacency; every triangle {a<b<c} is generated exactly
    once as a wedge (b, c) at its minimum node a and confirmed by one
    co-partitioned membership join against the edge set.

    Scale shape: two shuffles of integer triples — wedges + edges routed
    by ``hash(v, w) % NPART`` (union-tag co-partition, the same
    discipline as the anti/semi joins), then the bounded per-node count
    groupby.  Wedge fan-out is sum deg+^2 over the band-bucketed pair
    graph; at corpus scale the standard mitigation (orient edges by
    (degree, id) instead of raw id) drops in at the wedge stage without
    touching the joins.  Nothing materializes on the driver.
    """
    from .similarity import embedding_near_dup

    npart = coarse_npart()
    pairs = embedding_near_dup(sf_dir, threshold=threshold) \
        .select_columns(["vec_a", "vec_b"])

    def wedge_part(t: pa.Table) -> pa.Table:
        # edge rows, keyed by the (v, w) membership-join hash
        a = t["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (a * 1_000_003 + b) % npart
        return pa.table({"part": pa.array(part), "src": pa.array(
            np.full(len(a), -1, np.int64)), "v": pa.array(a),
            "w": pa.array(b), "abkt": pa.array(a % npart)})

    edges = pairs.map_batches(wedge_part, batch_format="pyarrow")

    def emit_wedges(g: pd.DataFrame) -> pa.Table:
        # all wedges of this vec_a bucket in one vectorized pass: sort by
        # (a, b); node at local offset k within its a-group pairs with
        # each of its k predecessors (pred < cur by the sort).  Returns
        # Arrow so the union with the edge dataset is block-type-uniform.
        g = g.sort_values(["v", "w"], kind="mergesort")
        a = g["v"].to_numpy(np.int64)
        b = g["w"].to_numpy(np.int64)
        empty = pa.table({"part": pa.array([], pa.int64()),
                          "src": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64())})
        if len(a) == 0:
            return empty
        new = np.concatenate([[True], a[1:] != a[:-1]])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(a)))
        local = np.arange(len(a), dtype=np.int64) - np.repeat(starts, cnt)
        total = int(local.sum())
        if total == 0:
            return empty
        w2 = np.repeat(b, local)                       # the greater leg
        csum = np.cumsum(local)
        off = np.arange(total, dtype=np.int64) - np.repeat(csum - local,
                                                           local)
        v2 = b[np.repeat(np.arange(len(a), dtype=np.int64) - local,
                         local) + off]                 # the lesser leg
        src = np.repeat(a, local)
        return pa.table({"part": pa.array((v2 * 1_000_003 + w2) % npart),
                         "src": pa.array(src), "v": pa.array(v2),
                         "w": pa.array(w2)})

    wedges = (edges.groupby("abkt")
              .map_groups(emit_wedges, batch_format="pandas"))

    def close_wedges(g: pd.DataFrame) -> pd.DataFrame:
        # union-tag membership join: src == -1 marks edge rows; the
        # (v, w) match is an exact two-column hash merge (the int key
        # used for ROUTING may collide at scale — harmless there, fatal
        # here)
        is_edge = g["src"].to_numpy(np.int64) == -1
        e = g.loc[is_edge, ["v", "w"]]
        wdg = g.loc[~is_edge, ["src", "v", "w"]]
        hit = wdg.merge(e, on=["v", "w"], how="inner")
        # one (node, 1) row per triangle corner
        nodes = np.concatenate([hit["src"].to_numpy(np.int64),
                                hit["v"].to_numpy(np.int64),
                                hit["w"].to_numpy(np.int64)])
        return pd.DataFrame({"node": nodes,
                             "nbkt": nodes % npart})

    corners = (edges.select_columns(["part", "src", "v", "w"]).union(
        wedges).groupby("part")
        .map_groups(close_wedges, batch_format="pandas"))

    def count_nodes(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("node").size().reset_index(name="n_tri")
        return pd.DataFrame({"vec_id": agg["node"].to_numpy(np.int64),
                             "n_tri": agg["n_tri"].to_numpy(np.int64)})

    return corners.groupby("nbkt").map_groups(count_nodes,
                                              batch_format="pandas")


def _lev_batch(a_texts: np.ndarray, b_texts: np.ndarray) -> np.ndarray:
    """Exact Levenshtein distance for a BATCH of string pairs in one
    vectorized DP: the row recurrence runs once per character of the
    longest left string, with every pair advanced simultaneously on
    (n_pairs, max_len_b) matrices.  The within-row insert dependency
    (dp[j] needs dp[j-1]) is closed in one kernel via the identity
    dp[j] = min_k<=j (tmp[k] + (j-k)) = j + running_min(tmp[k] - k),
    i.e. np.minimum.accumulate — no per-cell Python.  ~max_len python
    iterations per batch instead of n_pairs * max_len."""
    n = len(a_texts)
    la = np.array([len(s) for s in a_texts], np.int64)
    lb = np.array([len(s) for s in b_texts], np.int64)
    if n == 0:
        return np.array([], np.int64)
    mla, mlb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(mla, 1)), np.uint32)
    B = np.zeros((n, max(mlb, 1)), np.uint32)
    for i, s in enumerate(a_texts):
        if la[i]:
            A[i, : la[i]] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    for i, s in enumerate(b_texts):
        if lb[i]:
            B[i, : lb[i]] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    j = np.arange(mlb + 1, dtype=np.int32)
    prev = np.broadcast_to(j, (n, mlb + 1)).copy()
    res = np.where(la == 0, lb, -1).astype(np.int64)
    tmp = np.empty_like(prev)
    for i in range(1, mla + 1):
        ca = A[:, i - 1]
        cost = (B != ca[:, None]).astype(np.int32)
        tmp[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=tmp[:, 1:])
        dp = np.minimum.accumulate(tmp - j, axis=1) + j
        hit = la == i
        if hit.any():
            res[hit] = dp[hit, lb[hit]]
        prev = dp
    return res


def edit_distance_pairs(sf_dir: str, threshold: float = 0.95):
    """Exact edit-distance verification of near-dup candidates — the
    LSH-recall / exact-verify pattern: the cheap set-similarity stage
    (ngram_jaccard_pairs at a high threshold) proposes candidates, and
    this stage scores each with TRUE character-level Levenshtein
    distance, which set similarity cannot see (it ignores order and
    repetition).

    Output: (doc_a, doc_b, dist) — one row per candidate pair.

    Scale shape: candidates are (doc_a, doc_b) int pairs from the
    bucketed Jaccard pipeline (its df-cutoff + threshold bound the pair
    count).  Texts attach via TWO union-tag co-partitions (route by
    doc_a, merge text_a; re-route by doc_b, merge text_b) — each text
    ships through at most two shuffles and never broadcasts.  The DP
    kernel is batch-vectorized (_lev_batch): O(max_len) Python
    iterations per bucket regardless of pair count.
    """
    npart = coarse_npart()
    cand = ngram_jaccard_pairs(sf_dir, threshold=threshold)

    def cand_side(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "apart": pa.array(a % npart),
            "doc_a": pa.array(a),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "text": pa.nulls(len(a), pa.string()),
            "is_doc": pa.array(np.zeros(len(a), dtype=bool))})

    def doc_side_a(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        n = t.num_rows
        return pa.table({
            "apart": pc.cast(pc.bit_wise_and(d, npart - 1), pa.int64()),
            "doc_a": d,
            "doc_b": pa.array(np.full(n, -1, np.int64)),
            "text": t["text"],
            "is_doc": pa.array(np.ones(n, dtype=bool))})

    def attach_a(g: pd.DataFrame) -> pa.Table:
        docs = g[g["is_doc"]]
        pairs = g[~g["is_doc"]]
        m = pairs[["doc_a", "doc_b"]].merge(
            docs[["doc_a", "text"]], on="doc_a", how="inner")
        b = m["doc_b"].to_numpy(np.int64)
        return pa.table({
            "bpart": pa.array(b % npart),
            "doc_a": pa.array(m["doc_a"].to_numpy(np.int64)),
            "doc_b": pa.array(b),
            "text_a": pa.array(m["text"].astype(object).to_numpy(),
                               pa.string()),
            "text": pa.nulls(len(b), pa.string()),
            "is_doc": pa.array(np.zeros(len(b), dtype=bool))})

    def doc_side_b(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        n = t.num_rows
        return pa.table({
            "bpart": pc.cast(pc.bit_wise_and(d, npart - 1), pa.int64()),
            "doc_a": pa.array(np.full(n, -1, np.int64)),
            "doc_b": d,
            "text_a": pa.nulls(n, pa.string()),
            "text": t["text"],
            "is_doc": pa.array(np.ones(n, dtype=bool))})

    def score(g: pd.DataFrame) -> pa.Table:
        docs = g[g["is_doc"]]
        pairs = g[~g["is_doc"]]
        m = pairs[["doc_a", "doc_b", "text_a"]].merge(
            docs[["doc_b", "text"]], on="doc_b", how="inner")
        dist = _lev_batch(m["text_a"].astype(object).to_numpy(),
                          m["text"].astype(object).to_numpy())
        return pa.table({
            "doc_a": pa.array(m["doc_a"].to_numpy(np.int64)),
            "doc_b": pa.array(m["doc_b"].to_numpy(np.int64)),
            "dist": pa.array(dist)})

    docs_a = _docs(sf_dir).map_batches(doc_side_a, batch_format="pyarrow")
    with_a = (cand.map_batches(cand_side, batch_format="pyarrow")
              .union(docs_a)
              .groupby("apart").map_groups(attach_a,
                                           batch_format="pandas"))
    docs_b = _docs(sf_dir).map_batches(doc_side_b, batch_format="pyarrow")
    return (with_a.union(docs_b)
            .groupby("bpart").map_groups(score, batch_format="pandas"))


class _CoreShard:
    """One k-core graph shard (node-cut by ``node % K``), same ownership
    contract as _PrShard: symmetrized input means every owned node's
    edges live in this bucket, so degree (the h-index seed) is local.

    Per superstep each shard sends, for every dst bucket, the
    (dst_local_hint, src_value) pairs of its outgoing edges — O(|E|/K)
    int32/int64 arrays per actor pair, point-to-point via
    ``num_returns=K``, no Dataset shuffle and no driver relay — and
    computes the new value of each owned node as the H-INDEX of its
    received neighbor values (Lu et al. 2016: iterating value_i <-
    H({value_j : j in N(i)}) from value_i = degree_i converges to the
    exact coreness for every node; values are non-increasing, so
    convergence is a zero-changes fixpoint).

    DELTA SCATTER: round 0 ships every edge's seed value and the
    receiver caches the incoming values in a CSR layout keyed by owner;
    every later round ships ONLY the edge slots whose source value
    changed last round, and the receiver recomputes the h-index ONLY
    for owners that received a changed value (the fixpoint is monotone
    non-increasing, so an owner none of whose neighbors changed cannot
    change).  Late rounds — the long convergence tail — then move and
    recompute O(frontier) instead of O(|E|).
    """

    def __init__(self, k: int):
        self.k = k
        self.nodes = np.zeros(0, np.int64)
        self.deg = np.zeros(0, np.int64)
        self.val = np.zeros(0, np.int64)
        self._src_idx = []              # per dst bucket: local src index
        self._dst_u = []                # per dst bucket: unique dst ids
        self._dst_inv = []              # per dst bucket: compacted dst
        self._buf_src: list = []
        self._buf_dst: list = []
        self._seen_parts: set = set()
        self._changed = None            # owned nodes changed last round
        self._in_idx = None             # cache: owner idx per in-edge slot
        self._in_val = None             # cache: latest value per slot
        self._in_off = None             # sender -> slot-range offset
        self._csr_order = None          # in-edge slots sorted by owner
        self._csr_starts = None         # owner -> slot-range in csr_order

    load_part = _PrShard.load_part
    load = _PrShard.load

    def finalize(self) -> int:
        n = _PrShard.finalize(self)
        self.val = self.deg.copy()      # h-index seed = degree
        self._changed = np.ones(n, dtype=bool)    # round 0: all "changed"
        return n

    def scatter(self):
        """Outgoing half.  Round 0: per dst bucket (unique_dsts,
        dst_inv, src_values) — the full layout the receiver caches.
        Later rounds: (changed_slot_positions, new_values) per bucket,
        or None when nothing this bucket depends on changed."""
        out = []
        if self._in_idx is None:        # round 0: full layout
            for t in range(self.k):
                out.append((self._dst_u[t], self._dst_inv[t],
                            self.val[self._src_idx[t]]))
        else:
            for t in range(self.k):
                p = np.flatnonzero(self._changed[self._src_idx[t]])
                out.append((p.astype(np.int64),
                            self.val[self._src_idx[t][p]])
                           if len(p) else None)
        return tuple(out) if self.k > 1 else out[0]

    def gather(self, *parts) -> int:
        """Update the cached incoming values with the received deltas,
        h-index the touched owners, return the changed-node count (the
        global convergence counter is just the sum over shards)."""
        if not len(self.nodes):
            self._in_idx = np.zeros(0, np.int64)   # mark round-0 done
            return 0
        if self._in_idx is None:
            # round 0: build the incoming-edge cache + owner CSR
            idx_cat, val_cat, off = [], [], [0]
            for part in parts:
                u, inv, vals = part
                if len(u):
                    owned = np.searchsorted(self.nodes, u)
                    idx_cat.append(owned[inv].astype(np.int64))
                    val_cat.append(np.asarray(vals, np.int64))
                    off.append(off[-1] + len(vals))
                else:
                    off.append(off[-1])
            self._in_idx = np.concatenate(idx_cat) if idx_cat \
                else np.zeros(0, np.int64)
            self._in_val = np.concatenate(val_cat) if val_cat \
                else np.zeros(0, np.int64)
            self._in_off = np.asarray(off, np.int64)
            self._csr_order = np.argsort(self._in_idx, kind="stable")
            self._csr_starts = np.searchsorted(
                self._in_idx[self._csr_order],
                np.arange(len(self.nodes) + 1))
            aff = np.arange(len(self.nodes))
        else:
            touched = []
            for s, part in enumerate(parts):
                if part is None:
                    continue
                p, v = part
                slots = self._in_off[s] + p
                self._in_val[slots] = v
                touched.append(slots)
            if not touched:
                self._changed = np.zeros(len(self.nodes), bool)
                return 0
            aff = np.unique(self._in_idx[np.concatenate(touched)])
        # grouped h-index over the AFFECTED owners' incoming slots only:
        # gather each owner's CSR range, then the usual sort-desc prefix
        # count within groups
        cnt = self._csr_starts[aff + 1] - self._csr_starts[aff]
        total = int(cnt.sum())
        if total == 0:
            self._changed = np.zeros(len(self.nodes), bool)
            return 0
        grp = np.repeat(np.arange(len(aff)), cnt)
        base = np.repeat(self._csr_starts[aff], cnt)
        intra = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
        slots = self._csr_order[base + intra]
        vals = self._in_val[slots]
        order = np.lexsort((-vals, grp))
        grp_s, val_s = grp[order], vals[order]
        starts = np.searchsorted(grp_s, np.arange(len(aff)))
        pos = np.arange(total) - starts[grp_s]
        cond = val_s >= pos + 1
        h = np.bincount(grp_s, weights=cond,
                        minlength=len(aff)).astype(np.int64)
        new = np.minimum(self.val[aff], h)   # monotone non-increasing
        delta = new != self.val[aff]
        self.val[aff] = new
        self._changed = np.zeros(len(self.nodes), bool)
        self._changed[aff[delta]] = True
        return int(delta.sum())

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "coreness": pa.array(self.val, pa.int64())})


def kcore_decomposition(pairs, npart: Optional[int] = None,
                        max_rounds: int = 200):
    """Exact CORENESS per node over an undirected pair Dataset
    ``(vec_a, vec_b)`` -> ``(node, coreness)`` — the k-core number (max
    k such that the node survives iterated removal of degree<k nodes),
    the standard cohesion measure separating tight duplicate cliques
    from loose chains (a template family is a high-core blob; a
    transitive A~B~C chain is 1-core).

    Architecture: the Pregel shard pattern (see ``pagerank``) running
    the h-index fixpoint — adjacency loaded ONCE into K ``_CoreShard``
    actors via a single edge shuffle; each round moves O(|E|) small ints
    point-to-point and reduces a scalar changed-count; the driver loops
    until sum(changed) == 0 (exact fixpoint = coreness for every node).
    Iterative, so no SQL oracle; equality against brute-force peeling
    plus core-subgraph invariants are pinned in tests.
    """
    import ray
    import ray.data as rd

    edges = _sym_edges(pairs)
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "coreness": pa.array([],
                                                            pa.int64())}))
    k = npart or _graph_shard_count(n_edges)

    Shard = ray.remote(num_cpus=0.5)(_CoreShard)
    actors = [Shard.remote(k) for _ in range(k)]
    _load_graph_shards(edges, actors, k)

    for _ in range(max_rounds):
        outs = [a.scatter.options(num_returns=k).remote() if k > 1
                else [a.scatter.remote()] for a in actors]
        changed = sum(ray.get([actors[b].gather.remote(
            *[outs[a][b] for a in range(k)]) for b in range(k)]))
        if changed == 0:
            break

    return _finish_graph_shards(actors, "result")


def dedup_kcore(sf_dir: str, threshold: float = 0.35):
    """Coreness of every node in the embedding near-dup pair graph —
    (vec_id, coreness).  Same pair source as dedup_clusters /
    dedup_pagerank; rows-only driver check (iterative), brute-force
    peeling equality pinned in tests."""
    from .similarity import embedding_near_dup

    pairs = embedding_near_dup(sf_dir, threshold=threshold) \
        .select_columns(["vec_a", "vec_b"])
    return kcore_decomposition(pairs).map_batches(
        lambda t: pa.table({"vec_id": t["node"],
                            "coreness": t["coreness"]}),
        batch_format="pyarrow")


def _sorted_int_map(keys: np.ndarray, vals: np.ndarray):
    """(keys, vals) int64 pairs -> key-sorted arrays for vectorized
    searchsorted lookup (the broadcast-friendly form of a small dict)."""
    order = np.argsort(keys)
    return np.ascontiguousarray(keys[order]), \
        np.ascontiguousarray(vals[order])


def _map_or_identity(x: np.ndarray, keys: np.ndarray,
                     vals: np.ndarray) -> np.ndarray:
    """Vectorized ``map.get(v, v)`` over an int64 array: searchsorted
    against the sorted key array — no Python per-element loop, so a
    tiny remap applied to the FULL historical label set stays C-speed
    (the round-4 review's weak item #1)."""
    if len(keys) == 0:
        return x
    pos = np.minimum(np.searchsorted(keys, x), len(keys) - 1)
    hit = keys[pos] == x
    out = x.copy()
    out[hit] = vals[pos[hit]]
    return out


def incremental_cc(labels, new_pairs, npart: Optional[int] = None):
    """INCREMENTAL connected components: fold a NEW batch of undirected
    pairs into an existing (node, lbl) labeling — the daily-crawl path
    where yesterday's duplicate clusters absorb today's near-dup pairs
    WITHOUT re-running CC over the historical edge set.

    Algorithm (contraction): (1) one co-partitioned pass looks up the
    new pairs' endpoint labels (absent endpoints are fresh nodes
    labeling themselves); (2) each new pair CONTRACTS to an edge between
    component labels; (3) CC runs on the contracted graph — bounded by
    the new-pair count, orders of magnitude below the full graph;
    (4) the resulting (old_lbl -> merged min) remap broadcasts and
    rewrites the label set in one map, plus fresh-node rows.  Canonical
    min-labels survive: the merged component's new label is the min over
    member mins and fresh ids, which is the true min of the union.

    ``labels``: Dataset (node, lbl).  ``new_pairs``: Dataset
    (vec_a, vec_b).  Returns Dataset (node, lbl).
    """
    import ray
    import ray.data as rd

    np_ = coarse_npart() if npart is None else npart

    ends_tbl = new_pairs.map_batches(
        lambda t: pa.table({"node": np.unique(np.concatenate(
            [t["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64),
             t["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
             ]))}),
        batch_format="pyarrow")

    def tag(t: pa.Table, is_lbl: int) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64) \
            if is_lbl else n
        return pa.table({"part": pa.array(n % np_), "node": pa.array(n),
                         "lbl": pa.array(lbl),
                         "is_lbl": pa.array(
                             np.full(len(n), is_lbl, np.int8))})

    def endpoint_labels(g: pd.DataFrame) -> pd.DataFrame:
        # int64-exact searchsorted lookup end-to-end: a pandas
        # map/fillna pass routes through float64 and silently corrupts
        # node ids above 2^53
        lab = g[g["is_lbl"] == 1].drop_duplicates("node")
        want = g.loc[g["is_lbl"] == 0, "node"].drop_duplicates() \
            .to_numpy(np.int64)
        k, v = _sorted_int_map(lab["node"].to_numpy(np.int64),
                               lab["lbl"].to_numpy(np.int64))
        lbl = _map_or_identity(want, k, v)
        if len(k):
            # a node may legitimately carry its own id as label; only
            # nodes ABSENT from the label rows are fresh
            pos = np.minimum(np.searchsorted(k, want), len(k) - 1)
            fresh = k[pos] != want
        else:
            fresh = np.ones(len(want), bool)
        return pd.DataFrame({"node": want, "lbl": lbl, "fresh": fresh})

    end_lbls = (labels.map_batches(lambda t: tag(t, 1),
                                   batch_format="pyarrow")
                .union(ends_tbl.map_batches(lambda t: tag(t, 0),
                                            batch_format="pyarrow"))
                .groupby("part").map_groups(endpoint_labels,
                                            batch_format="pandas")
                .to_pandas())      # bounded by the new batch's endpoints
    if "node" not in end_lbls.columns:      # empty new batch: no-op fold
        return labels
    lookup_k, lookup_v = _sorted_int_map(
        end_lbls["node"].to_numpy(np.int64),
        end_lbls["lbl"].to_numpy(np.int64))
    lref = ray.put((lookup_k, lookup_v))

    def contract(t: pa.Table) -> pa.Table:
        lk, lv = ray.get(lref)
        a = t["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        la = _map_or_identity(a, lk, lv)
        lb = _map_or_identity(b, lk, lv)
        keep = la != lb
        lo = np.minimum(la, lb)[keep]
        hi = np.maximum(la, lb)[keep]
        return pa.table({"vec_a": pa.array(lo), "vec_b": pa.array(hi)})

    contracted = new_pairs.map_batches(contract,
                                       batch_format="pyarrow") \
        .materialize()
    if contracted.count():
        merged = connected_components(contracted).to_pandas()
        remap_k, remap_v = _sorted_int_map(
            merged["node"].to_numpy(np.int64),
            merged["lbl"].to_numpy(np.int64))
    else:
        # every new pair lands inside an existing component (or repeats
        # a fresh self-label): nothing merges, only fresh rows append
        remap_k = remap_v = np.empty(0, np.int64)
    rref = ray.put((remap_k, remap_v))

    def apply_remap(t: pa.Table) -> pa.Table:
        rk, rv = ray.get(rref)
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        l = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = _map_or_identity(l, rk, rv)
        return pa.table({"node": pa.array(n), "lbl": pa.array(out)})

    # fresh nodes: endpoints with NO matching label row (flagged in the
    # lookup pass — never a full-label-set materialization)
    fresh = end_lbls.loc[end_lbls["fresh"], "node"].to_numpy(np.int64)
    fresh_tbl = pa.table({
        "node": pa.array(fresh),
        "lbl": pa.array(_map_or_identity(
            _map_or_identity(fresh, lookup_k, lookup_v),
            remap_k, remap_v))})
    out = labels.map_batches(apply_remap, batch_format="pyarrow")
    if fresh_tbl.num_rows:
        out = out.union(rd.from_arrow(fresh_tbl))
    return out


def dedup_clusters_incremental(sf_dir: str, threshold: float = 0.35,
                               split_frac: float = 0.75):
    """Incremental duplicate-cluster maintenance, end to end: CC over
    the "historical" 3/4 of the near-dup pair graph, then the remaining
    pairs folded in via ``incremental_cc`` — the final labeling must
    equal from-scratch CC over the FULL graph (the driver oracle), which
    is exactly the invariant a daily-crawl cluster store relies on.
    Output: (vec_id, cluster_id)."""
    import pyarrow.parquet as pq_

    from .similarity import near_dup_pairs

    n = pq_.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    cut = int(n * split_frac)
    pairs = near_dup_pairs(sf_dir, threshold=threshold) \
        .select_columns(["vec_a", "vec_b"]).materialize()

    def half(keep_base: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.less(t["vec_b"], cut) if keep_base else \
                pc.greater_equal(t["vec_b"], cut)
            return t.filter(m)
        return f

    base = pairs.map_batches(half(True), batch_format="pyarrow")
    incr = pairs.map_batches(half(False), batch_format="pyarrow")
    labels = connected_components(base)
    out = incremental_cc(labels, incr)
    return out.map_batches(
        lambda t: pa.table({"vec_id": t["node"],
                            "cluster_id": t["lbl"]}),
        batch_format="pyarrow")


MINHASH_CAL_MAX_BUCKET = 2000    # band-bucket pair-explosion cap (mirrored
#                                  in the oracle HAVING clause, same role as
#                                  NGRAM_MAX_DF on the exact side)


def minhash_calibration(sf_dir: str):
    """Estimator CALIBRATION report for the MinHash near-dup stack: for
    every LSH candidate pair (docs sharing >= 1 of the 4x4 bands), the
    signature estimate (matching components / 16, basis points) is
    bucketed into deciles and compared with the exact df-bounded
    word-set Jaccard — the reliability diagram a pipeline owner reads
    before trusting a banded dedup threshold at a new corpus.

    Output: (est_bucket, n_pairs, mean_exact_bp), est_bucket =
    est_bp // 1000 (0..10).  All-integer, fully oracled.

    Scale shape: band rows carry the 16-int signature (512 B/doc) so
    the estimate is computed inside the bucket pass — no extra
    signature join; candidate pairs dedup + join the exact pair stats
    (shared _ngram_candidate_pairs machinery, the same token shuffle
    economics as ngram_jaccard_pairs) in ONE pair-hash co-partition;
    only the ~11 bucket rows reach the driver.  Degenerate band
    buckets are capped at MINHASH_CAL_MAX_BUCKET docs (oracle-
    mirrored), token-less docs emit no bands (they have no signature
    rows in the oracle either).
    """
    from ..functions.hashing import MINHASH_K

    npart = coarse_npart()

    class _SigBands:
        def __init__(self):
            self.hasher = worker_token_hasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            offsets, tok = tokenize_column(t["text"], self.hasher)
            nonempty = np.diff(offsets) > 0     # token-less docs: no bands
            sigs = doc_minhash(offsets, tok, self.hasher)[nonempty]
            keys = minhash_band_keys(sigs)
            doc_ids = t["doc_id"].to_numpy(
                zero_copy_only=False)[nonempty]
            return pa.table({
                "bucket": keys,
                "doc_id": pa.array(np.tile(doc_ids, MINHASH_BANDS),
                                   pa.int64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.tile(sigs, (MINHASH_BANDS, 1)).ravel(),
                             pa.int64()), MINHASH_K)})

    def add_bpart(t: pa.Table) -> pa.Table:
        bp = fast_hash64(t["bucket"]) % np.uint64(npart)
        return t.append_column("bpart", pa.array(bp.astype(np.int64)))

    def emit_est_pairs(g: pa.Table) -> pa.Table:
        """Per band bucket: every doc pair + its signature estimate."""
        order = pc.sort_indices(pa.table({"b": g["bucket"],
                                          "d": g["doc_id"]}),
                                sort_keys=[("b", "ascending"),
                                           ("d", "ascending")])
        g = g.take(order)
        bkt = g["bucket"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sig = np.asarray(g["sig"].combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)) \
            .reshape(-1, MINHASH_K)
        empty = pa.table({"part": pa.array([], pa.int64()),
                          "doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "est_bp": pa.array([], pa.int64())})
        if not len(ids):
            return empty
        bnd = np.empty(len(bkt), bool)
        bnd[0] = True
        bnd[1:] = bkt[1:] != bkt[:-1]
        starts = np.flatnonzero(bnd)
        cnt = np.diff(np.append(starts, len(bkt)))
        grp = np.cumsum(bnd) - 1
        keep = (cnt <= MINHASH_CAL_MAX_BUCKET)[grp]
        # drop duplicate (bucket, doc) rows (distinct pair semantics)
        dup = np.zeros(len(ids), bool)
        dup[1:] = (ids[1:] == ids[:-1]) & (bkt[1:] == bkt[:-1])
        keep &= ~dup
        ids, sig = ids[keep], sig[keep]
        bkt = bkt[keep]
        if not len(ids):
            return empty
        _, starts2 = np.unique(bkt, return_index=True)
        starts2 = np.sort(starts2)
        cnt2 = np.diff(np.append(starts2, len(ids)))
        local = np.arange(len(ids), dtype=np.int64) - \
            np.repeat(starts2, cnt2)
        csum = np.cumsum(local)
        total = int(csum[-1]) if len(csum) else 0
        if total == 0:
            return empty
        b_idx = np.repeat(np.arange(len(ids), dtype=np.int64), local)
        off = np.arange(total, dtype=np.int64) - \
            np.repeat(csum - local, local)
        a_idx = np.repeat(np.arange(len(ids), dtype=np.int64) - local,
                          local) + off
        doc_a, doc_b = ids[a_idx], ids[b_idx]
        est_bp = ((sig[a_idx] == sig[b_idx]).sum(axis=1)
                  * 10000) // MINHASH_K
        return pa.table({
            "part": pa.array((doc_a * 1_000_003 + doc_b) % npart),
            "doc_a": pa.array(doc_a), "doc_b": pa.array(doc_b),
            "est_bp": pa.array(est_bp.astype(np.int64))})

    est_pairs = (_docs(sf_dir).map_batches(as_tasks(_SigBands),
                                           batch_format="pyarrow",
                                           batch_size=4096)
                 .map_batches(add_bpart, batch_format="pyarrow")
                 .groupby("bpart").map_groups(emit_est_pairs,
                                              batch_format="pyarrow"))

    # exact side: per-pair (inter, sizes) over the df-bounded token
    # space, same machinery (and part formula) as ngram_jaccard_pairs
    cand = _ngram_candidate_pairs(sf_dir, NGRAM_MAX_DF, npart)

    def exact_part(g: pd.DataFrame) -> pa.Table:
        agg, inter, sa, sb = _pair_stats(g)
        da = agg["doc_a"].to_numpy(np.int64)
        db = agg["doc_b"].to_numpy(np.int64)
        # arrow out (the union peer emits arrow blocks)
        return pa.table({
            "part": pa.array((da * 1_000_003 + db) % npart),
            "doc_a": pa.array(da), "doc_b": pa.array(db),
            "est_bp": pa.array(np.full(len(da), -1, np.int64)),
            "exact_bp": pa.array((inter * 10000) // (sa + sb - inter))})

    exact = cand.groupby("part").map_groups(exact_part,
                                            batch_format="pandas")

    def tag_est(t: pa.Table) -> pa.Table:
        return t.append_column(
            "exact_bp", pa.array(np.full(t.num_rows, -1, np.int64)))

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        est = g[g["est_bp"] >= 0].drop_duplicates(["doc_a", "doc_b"])
        ex = g[g["est_bp"] < 0]
        m = est.merge(ex[["doc_a", "doc_b", "exact_bp"]],
                      on=["doc_a", "doc_b"], how="left",
                      suffixes=("_drop", ""))
        # candidate pairs with NO df-bounded shared token: exact 0
        exact_bp = m["exact_bp"].fillna(0).to_numpy(np.int64)
        bucket = m["est_bp"].to_numpy(np.int64) // 1000
        agg = pd.DataFrame({"est_bucket": bucket,
                            "n": 1, "s": exact_bp}) \
            .groupby("est_bucket", as_index=False).sum()
        return agg

    parts = est_pairs.map_batches(tag_est, batch_format="pyarrow") \
        .union(exact) \
        .groupby("part").map_groups(merge_part, batch_format="pandas") \
        .to_pandas()     # bounded: <= npart x 11 partial bucket rows
    if "est_bucket" not in parts.columns or not len(parts):
        return pa.table({"est_bucket": pa.array([], pa.int64()),
                         "n_pairs": pa.array([], pa.int64()),
                         "mean_exact_bp": pa.array([], pa.int64())})
    fin = parts.groupby("est_bucket", as_index=False).sum() \
        .sort_values("est_bucket")
    return pa.table({
        "est_bucket": pa.array(fin["est_bucket"].to_numpy(np.int64)),
        "n_pairs": pa.array(fin["n"].to_numpy(np.int64)),
        "mean_exact_bp": pa.array(
            fin["s"].to_numpy(np.int64) // fin["n"].to_numpy(np.int64))})


WINNOW_MIN_SHARED = 5            # pair flag: >= this many shared prints


def winnow_overlap_pairs(sf_dir: str,
                         min_shared: int = WINNOW_MIN_SHARED,
                         max_df: Optional[int] = NGRAM_MAX_DF,
                         hash_mode: str = "fast"):
    """LOCAL-overlap near-dup pairs (the MOSS detector): docs sharing
    at least ``min_shared`` winnowing fingerprint VALUES — catches a
    copied PASSAGE inside otherwise-different documents, which
    whole-doc signatures (MinHash/SimHash) dilute away and word-set
    Jaccard under-scores.  Output: (doc_a, doc_b, n_shared),
    doc_a < doc_b.

    Scale shape: winnowing is a zero-shuffle map emitting ~2/(w+1) of
    gram count; ONE (fp % NPART)-keyed shuffle of distinct (fp, doc)
    postings; per-bucket vectorized pair explode with the ``max_df``
    stop-fingerprint cutoff (a boilerplate print shared by df docs
    would emit df^2 pairs — the same frequency filter as the Jaccard
    pair source); coarse pair-hash combine.  md5 mode is the oracle
    bridge; production rides the rolling polynomial hash.
    """
    from .textops import winnow_fingerprints

    npart = coarse_npart()

    def post(t: pa.Table) -> pa.Table:
        # distinct (fp, doc) within the batch; global distinctness is
        # restored in the bucket pass (same fp+doc always same bucket)
        fp = t["fp"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        key = np.stack([fp, did])
        _, idx = np.unique(key, axis=1, return_index=True)
        fp, did = fp[idx], did[idx]
        return pa.table({"tpart": pa.array(fp % npart),
                         "fp": pa.array(fp), "doc_id": pa.array(did)})

    def emit(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["fp", "doc_id"], kind="mergesort") \
            .drop_duplicates(["fp", "doc_id"])
        fp = g["fp"].to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        empty = pa.table({"part": pa.array([], pa.int64()),
                          "doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        if not len(fp):
            return empty
        bnd = np.empty(len(fp), bool)
        bnd[0] = True
        bnd[1:] = fp[1:] != fp[:-1]
        starts = np.flatnonzero(bnd)
        cnt = np.diff(np.append(starts, len(fp)))
        if max_df is not None:
            keep = (cnt <= max_df)[np.cumsum(bnd) - 1]
            fp, ids = fp[keep], ids[keep]
            if not len(fp):
                return empty
            bnd = np.empty(len(fp), bool)
            bnd[0] = True
            bnd[1:] = fp[1:] != fp[:-1]
            starts = np.flatnonzero(bnd)
            cnt = np.diff(np.append(starts, len(fp)))
        local = np.arange(len(ids), dtype=np.int64) - \
            np.repeat(starts, cnt)
        csum = np.cumsum(local)
        total = int(csum[-1]) if len(csum) else 0
        if total == 0:
            return empty
        doc_b = np.repeat(ids, local)
        off = np.arange(total, dtype=np.int64) - \
            np.repeat(csum - local, local)
        a_idx = np.repeat(np.arange(len(ids), dtype=np.int64) - local,
                          local) + off
        doc_a = ids[a_idx]
        return pa.table({
            "part": pa.array((doc_a * 1_000_003 + doc_b) % npart),
            "doc_a": pa.array(doc_a), "doc_b": pa.array(doc_b)})

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["doc_a", "doc_b"], as_index=False).size()
        n = agg["size"].to_numpy(np.int64)
        keep = n >= min_shared
        return pd.DataFrame({"doc_a": agg["doc_a"].to_numpy()[keep],
                             "doc_b": agg["doc_b"].to_numpy()[keep],
                             "n_shared": n[keep]})

    return (winnow_fingerprints(sf_dir, hash_mode=hash_mode)
            .map_batches(post, batch_format="pyarrow")
            .groupby("tpart").map_groups(emit, batch_format="pandas")
            .groupby("part").map_groups(count_part,
                                        batch_format="pandas"))
