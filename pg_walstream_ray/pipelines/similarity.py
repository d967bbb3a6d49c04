"""Similarity search over the ``embeddings`` table (``list<float>`` column).

Operators:
  - ``ann_brute_topk``: exact cosine top-k per query — broadcast query
    matrix (``ray.put`` once, read per actor), numpy matmul per batch,
    per-batch partial top-k, tiny final reduce per query.  The baseline.
  - ``embedding_near_dup``: all pairs with cosine >= threshold — exact
    block-pair tasks over object-store corpus blocks (two blocks per
    task; no full-corpus materialization or broadcast anywhere).
  - ``ann_lsh_topk``: the scale path — seeded random-hyperplane LSH over
    multiple tables; only bucket-mates are scored.  Approximate (recall
    measured in tests vs the brute-force baseline), so no SQL oracle.

All exact variants compute in float64 over the float32 inputs — the same
promotion DuckDB's list_cosine_similarity uses — so results value-match the
oracle after round().
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.taskmode import as_tasks

DEFAULT_NQ = 8       # queries = vec_id < DEFAULT_NQ
DEFAULT_K = 10
LSH_BITS = 4         # hyperplanes per table (few bits: the synthetic
                     # embeddings are near-orthogonal, so recall needs
                     # coarse buckets; raise for clustered real data)
LSH_TABLES = 16
LSH_SEED = 20_240_817


def _emb(sf_dir: str, columns=("vec_id", "embedding")):
    from ..functions.scale import sized_read_parquet

    return sized_read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=list(columns))


def _batch_matrix(t: pa.Table) -> np.ndarray:
    """list<float> column -> [n, d] float64 matrix, zero-copy flatten."""
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    if n == 0:
        # an empty batch has no inferable width; use the list type's if
        # fixed, else 0 columns (callers skip empty matrices)
        d = col.type.list_size if pa.types.is_fixed_size_list(col.type) \
            else 0
        return np.zeros((0, d), np.float64)
    return flat.reshape(n, -1).astype(np.float64)


def _load_queries(sf_dir: str, nq: int) -> tuple:
    """(query_ids [q], unit query matrix [q, d]) — the broadcast small side."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    tab = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(columns=["vec_id", "embedding"],
                  filter=pads.field("vec_id") < nq)
    order = pc.sort_indices(tab["vec_id"])
    tab = tab.take(order)
    q = _batch_matrix(tab)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    return tab["vec_id"].to_numpy(zero_copy_only=False), qn


class BruteScore:
    """Actor: per batch, cosine of all rows against the broadcast query
    matrix; emits each batch's top-k candidates per query (partial top-k,
    so the final per-query reduce sees ~k * num_batches rows, not n)."""

    def __init__(self, queries_ref, k: int):
        import ray

        self.qids, self.q = ray.get(queries_ref)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _batch_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ self.q.T                       # [n, q]
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            s = sims[:, j]
            mask = vec_ids != qid                 # exclude self
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            k = min(self.k, len(idx))
            top = idx[np.argpartition(-s[idx], k - 1)[:k]]
            out_q.append(np.full(k, qid, dtype=np.int64))
            out_n.append(vec_ids[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"query_id": np.concatenate(out_q),
                         "neighbor_id": np.concatenate(out_n),
                         "sim": np.concatenate(out_s)})


def _final_topk(candidates, k: int):
    """groupby(query_id) -> rank-ordered top-k (sim desc, neighbor_id asc —
    the deterministic tie-break mirrored in the oracle's ROW_NUMBER)."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(),
            "neighbor_id": g["neighbor_id"].to_numpy(),
            "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            "cos_sim": g["sim"].to_numpy(),   # float; dropped in the oracled
                                              # driver query (rnk is exact)
        })

    return candidates.groupby("query_id").map_groups(topk,
                                                     batch_format="pandas")


def ann_brute_topk(sf_dir: str, nq: int = DEFAULT_NQ, k: int = DEFAULT_K,
                   concurrency: int = 4):
    """Exact cosine top-k for queries vec_id < nq.
    Output: (query_id, neighbor_id, rank, cos_sim)."""
    import ray

    queries_ref = ray.put(_load_queries(sf_dir, nq))
    cand = _emb(sf_dir).map_batches(
        as_tasks(BruteScore, queries_ref=queries_ref, k=k),
        batch_format="pyarrow", batch_size=4096)
    return _final_topk(cand, k)


# ---------------------------------------------------------------------------
# near-duplicate pairs by embedding cosine
# ---------------------------------------------------------------------------


NEAR_DUP_BLOCK_ROWS = 32_768   # two [B, d] float64 block matrices plus a
                               # chunked sims panel stay well under 1 GB/task

_PAIR_SCHEMA = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                          ("cos_sim", pa.float64())])


def _score_block_pair(ta: pa.Table, tb: pa.Table, threshold: float,
                      same: bool) -> pa.Table:
    """Exact cosine pairs >= threshold between two corpus blocks.

    Runs as a Ray task over two object-store block refs (zero-copy Arrow
    reads); the sims panel is computed in row chunks so the per-task peak
    is bounded regardless of block size.  ``same=True`` scores a block
    against itself (strict upper triangle via the id mask)."""
    ma = _batch_matrix(ta)
    if not ma.shape[0]:
        return _PAIR_SCHEMA.empty_table()
    ma /= np.linalg.norm(ma, axis=1, keepdims=True)
    ids_a = ta["vec_id"].to_numpy(zero_copy_only=False)
    if same:
        mb, ids_b = ma, ids_a
    else:
        mb = _batch_matrix(tb)
        if not mb.shape[0]:
            return _PAIR_SCHEMA.empty_table()
        mb /= np.linalg.norm(mb, axis=1, keepdims=True)
        ids_b = tb["vec_id"].to_numpy(zero_copy_only=False)
    step = max(1, (1 << 22) // max(1, len(ids_b)))   # <=32 MB sims chunk
    out_a, out_b, out_s = [], [], []
    for lo in range(0, len(ids_a), step):
        sims = ma[lo:lo + step] @ mb.T
        rows, cols = np.nonzero(sims >= threshold)
        a, b, s = ids_a[lo + rows], ids_b[cols], sims[rows, cols]
        keep = a < b if same else a != b
        a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
        out_a.append(a)
        out_b.append(b)
        out_s.append(s[keep])
    return pa.table({"vec_a": np.concatenate(out_a).astype(np.int64),
                     "vec_b": np.concatenate(out_b).astype(np.int64),
                     "cos_sim": np.concatenate(out_s)},
                    schema=_PAIR_SCHEMA)


def embedding_near_dup(sf_dir: str, threshold: float = 0.35,
                       block_rows: int = NEAR_DUP_BLOCK_ROWS):
    """All embedding pairs with cosine >= threshold (EXACT all-pairs).
    Output: (vec_a, vec_b, cos_sim) with vec_a < vec_b.

    Scale shape: the corpus is split into B object-store blocks of
    ``block_rows`` rows; every unordered block pair (i <= j) is scored by
    one Ray task fetching exactly two blocks — no driver materialization
    and no full-corpus broadcast anywhere (what a 100 TB cluster cannot
    afford).  Work is inherently O(N^2/2) flops because the operator is
    exact; beyond ~10^7 rows prefer the LSH/IVF bucketed candidates
    (``ann_lsh_topk`` machinery) or MinHash/SimHash band pairs as the
    near-dup pair source — the cross-block orientation here is the same.
    One pair appears exactly once: intra-block tasks take the strict
    upper triangle, inter-block tasks orient by (min, max) id, and blocks
    are disjoint so no pair spans two tasks twice."""
    import ray
    import ray.data as rd

    emb = _emb(sf_dir)
    n = emb.count()
    if not n:
        return rd.from_arrow(_PAIR_SCHEMA.empty_table())
    nblocks = max(2, -(-n // block_rows))   # >=2: the pair path is always
    refs = emb.repartition(nblocks).to_arrow_refs()     # exercised
    score = ray.remote(_score_block_pair)
    out = [score.remote(refs[i], refs[j] if j > i else None,
                        threshold, j == i)
           for i in range(len(refs)) for j in range(i, len(refs))]
    return rd.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# LSH-banded near-dup pairs (the scale path for the pair graph)
# ---------------------------------------------------------------------------

NEAR_DUP_LSH_TABLES = 16
NEAR_DUP_LSH_TARGET_BUCKET = 4096   # expected rows per bucket at auto bits
NEAR_DUP_EXACT_MAX_ROWS = 2_000_000  # above this, dedup_clusters routes to
                                     # the banded pair source by default


def _probe_dim(sf_dir: str) -> int:
    """Embedding width from the FIRST row of the first row group — a
    bounded driver-side metadata read, not a dataset pass."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    if not pf.metadata.num_rows:
        return 0
    col = pf.read_row_group(0, columns=["embedding"])["embedding"]
    return len(col[0])


def lsh_near_dup_pairs(sf_dir: str, threshold: float = 0.35,
                       bits: Optional[int] = None,
                       tables: int = NEAR_DUP_LSH_TABLES):
    """Near-dup pairs via sign-LSH banding: candidate pairs are generated
    only WITHIN buckets (sign-pattern over seeded hyperplanes, ``tables``
    independent tables), then verified with the EXACT chunked cosine
    scorer — so precision is exact (every emitted pair truly has cosine
    >= threshold) and only recall is approximate (a pair colliding in no
    table is missed; recall vs the exact scorer is pinned in tests).

    Output: (vec_a, vec_b, cos_sim) with vec_a < vec_b, each pair once.

    Scale shape (the 100 TB default for ``dedup_clusters``): ``bits``
    auto-scales with corpus size so the EXPECTED bucket is
    ~NEAR_DUP_LSH_TARGET_BUCKET rows, making total verify work
    O(n * bucket * tables) flops — linear in n, vs the exact scorer's
    O(n^2/2).  The shuffle moves (bucket, vec_id, embedding) rows; the
    cross-table dedupe moves int-triple pairs only.  A pathological
    bucket (mass-duplicated embeddings) degrades to quadratic in THAT
    duplicate set only, and the in-bucket scorer chunks its matmul so
    task memory stays bounded regardless."""
    import ray.data as rd

    emb = _emb(sf_dir)
    n = emb.count()
    if not n:
        return rd.from_arrow(_PAIR_SCHEMA.empty_table())
    d = _probe_dim(sf_dir)
    if bits is None:
        bits = max(4, int(np.ceil(np.log2(max(
            2.0, n / NEAR_DUP_LSH_TARGET_BUCKET)))))

    bucketed = emb.map_batches(
        as_tasks(LshBucketStage, d=d, bits=bits, tables=tables),
        batch_format="pyarrow", batch_size=4096)

    def score_bucket(g: pa.Table) -> pa.Table:
        return _score_block_pair(g, None, threshold, same=True)

    cand = bucketed.groupby("bucket").map_groups(score_bucket,
                                                batch_format="pyarrow")

    # one pair can collide in several tables -> dedupe on a coarse
    # pair-hash partition (pairs are wholly contained in their partition,
    # so per-group drop-dup is globally exact)
    from ..functions.scale import coarse_npart
    npart = coarse_npart()

    def add_part(t: pa.Table) -> pa.Table:
        a = t["vec_a"].to_numpy(zero_copy_only=False)
        b = t["vec_b"].to_numpy(zero_copy_only=False)
        part = (a * np.int64(1_000_003) + b) % npart
        return t.append_column("part", pa.array(part))

    def drop_dup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["vec_a", "vec_b"]) \
            .drop(columns=["part"])

    return cand.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(drop_dup, batch_format="pandas")


def near_dup_pairs(sf_dir: str, threshold: float = 0.35,
                   pair_source: str = "auto"):
    """Near-dup pair graph with scale-safe routing: the EXACT block-pair
    scorer under ``NEAR_DUP_EXACT_MAX_ROWS`` rows (oracle-bridgeable,
    O(n^2/2) flops), the LSH-banded generator above it (linear flops,
    recall-tested).  ``pair_source`` in {'auto', 'exact', 'lsh'} forces a
    path."""
    if pair_source == "auto":
        pair_source = ("exact" if _emb(sf_dir).count()
                       <= NEAR_DUP_EXACT_MAX_ROWS else "lsh")
    if pair_source == "exact":
        return embedding_near_dup(sf_dir, threshold=threshold)
    if pair_source == "lsh":
        return lsh_near_dup_pairs(sf_dir, threshold=threshold)
    raise ValueError(f"unknown pair_source: {pair_source!r}")


# ---------------------------------------------------------------------------
# LSH-bucketed approximate top-k (the scale path)
# ---------------------------------------------------------------------------


def _hyperplanes(d: int, bits: int, tables: int) -> np.ndarray:
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((tables, bits, d))


class LshBucketStage:
    """Actor: batch -> (table, bucket, vec_id, embedding) rows, one per LSH
    table — sign-pattern bucketing over seeded hyperplanes.  Parameters are
    ctor args (NOT module globals: workers import the module fresh, so a
    driver-side global tweak would silently desynchronize the bucketing)."""

    def __init__(self, d: int, bits: int, tables: int):
        self.bits, self.tables = bits, tables
        self.planes = _hyperplanes(d, bits, tables)
        self.weights = (1 << np.arange(bits)).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _batch_matrix(t)
        parts = []
        for ti in range(self.tables):
            signs = (m @ self.planes[ti].T) > 0    # [n, bits]
            bucket = signs.astype(np.int64) @ self.weights
            parts.append(pa.table({
                "bucket": pa.array(ti * (1 << self.bits) + bucket, pa.int64()),
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
            }))
        return pa.concat_tables(parts)


def _make_score_bucket(qbuckets: dict, qn_by_id: dict):
    """Shared LSH/IVF in-bucket scorer (Arrow group in, Arrow out).

    One matmul scores the whole bucket against ALL of the bucket's
    queries (the query matrix is tiny); the embedding column is read via
    the zero-copy list flatten — no per-row object conversion."""
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})

    def score_bucket(g: pa.Table) -> pa.Table:
        queries = qbuckets.get(int(g["bucket"][0].as_py()))
        if not queries:
            return empty
        m = _batch_matrix(g)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        qm = np.stack([qn_by_id[qid] for qid in queries])
        sims = m @ qm.T                             # [n, q]
        qcol = np.repeat(np.asarray(queries, np.int64), len(ids))
        ncol = np.tile(ids, len(queries))
        keep = ncol != qcol                         # exclude self
        return pa.table({"query_id": qcol[keep],
                         "neighbor_id": ncol[keep],
                         "sim": sims.T.ravel()[keep]})

    return score_bucket


def ann_lsh_topk(sf_dir: str, nq: int = DEFAULT_NQ, k: int = DEFAULT_K,
                 bits: int = LSH_BITS, tables: int = LSH_TABLES,
                 concurrency: int = 4):
    """Approximate top-k: score only vectors sharing an LSH bucket with the
    query in any of the ``tables`` tables.  Candidate generation is a
    bucket groupby (no all-pairs); recall vs ann_brute_topk is asserted in
    tests.  Recall/cost tradeoff: fewer ``bits`` -> bigger buckets -> more
    candidates scored -> higher recall.  Output: (query_id, neighbor_id,
    rnk, cos_sim)."""
    qids, q = _load_queries(sf_dir, nq)
    d = q.shape[1]
    planes = _hyperplanes(d, bits, tables)
    weights = (1 << np.arange(bits)).astype(np.int64)
    # query buckets per table (driver-side: nq x tables ints — tiny)
    qbuckets = {}
    for ti in range(tables):
        signs = (q @ planes[ti].T) > 0
        b = ti * (1 << bits) + signs.astype(np.int64) @ weights
        for qi, bb in zip(qids, b):
            qbuckets.setdefault(int(bb), []).append(int(qi))
    qn_by_id = {int(qid): q[i] for i, qid in enumerate(qids)}

    bucketed = _emb(sf_dir).map_batches(
        as_tasks(LshBucketStage, d=d, bits=bits, tables=tables),
        batch_format="pyarrow", batch_size=4096)

    cand = bucketed.groupby("bucket").map_groups(
        _make_score_bucket(qbuckets, qn_by_id), batch_format="pyarrow")

    # a neighbor can reach a query via several tables -> dedupe before rank
    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["query_id", "neighbor_id"])

    cand = cand.groupby("query_id").map_groups(dedupe, batch_format="pandas")
    return _final_topk(cand, k)


# ---------------------------------------------------------------------------
# IVF-bucketed approximate top-k (coarse k-means quantizer + nprobe)
# ---------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 6       # near-orthogonal synthetic vectors need wide probing;
                     # clustered real embeddings can drop this sharply
IVF_TRAIN_SAMPLE = 16_384
IVF_SEED = 20_240_818


def _sample_matrix(sf_dir: str, n: int = IVF_TRAIN_SAMPLE) -> np.ndarray:
    """Unit-normalized [<=n, d] training sample via a DISTRIBUTED
    Dataset pass: `read_parquet(...).limit(n)` only pulls the blocks the
    limit needs (streaming executor stops the read early), so the driver
    collects at most n vectors no matter the corpus size — the 100 TB
    scale path for quantizer/centroid bootstrap."""
    tab = _emb(sf_dir, columns=["embedding"]).limit(n) \
        .to_arrow_refs()
    import ray

    parts = [t for t in ray.get(tab) if t.num_rows]
    m = np.concatenate([_batch_matrix(t) for t in parts]) if parts \
        else np.empty((0, 0), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


def _train_centroids(m: np.ndarray, k: int, iters: int = 12,
                     seed: int = IVF_SEED) -> np.ndarray:
    """Seeded Lloyd's k-means on unit vectors (cosine == dot on the
    sphere). Deterministic; empty clusters re-seeded from the data."""
    rng = np.random.default_rng(seed)
    if len(m) == 0:                 # empty corpus: no centroids
        return np.zeros((0, m.shape[1] if m.ndim == 2 else 0), np.float64)
    cent = m[rng.choice(len(m), size=min(k, len(m)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / (np.linalg.norm(v) or 1.0)
            else:
                cent[c] = m[rng.integers(0, len(m))]
    return cent


class IvfBucketStage:
    """Actor: assign each vector to its nearest centroid (ONE bucket per
    vector — no multi-table dedupe needed, unlike LSH)."""

    def __init__(self, centroids_ref):
        import ray

        self.cent = ray.get(centroids_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or len(self.cent) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": t["vec_id"].slice(0, 0),
                             "embedding": t["embedding"].slice(0, 0)})
        m = _batch_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(m @ self.cent.T, axis=1).astype(np.int64)
        return pa.table({"bucket": pa.array(assign),
                         "vec_id": t["vec_id"],
                         "embedding": t["embedding"]})


def ann_ivf_topk(sf_dir: str, nq: int = DEFAULT_NQ, k: int = DEFAULT_K,
                 n_centroids: int = IVF_CENTROIDS, nprobe: int = IVF_NPROBE,
                 concurrency: int = 4):
    """IVF approximate top-k: a coarse seeded-k-means quantizer partitions
    the corpus into inverted lists; each query scores only its ``nprobe``
    nearest lists.  The quantizer trains on a bounded sample collected via
    a distributed limit pass (_sample_matrix); assignment + scoring are
    distributed.  Output: (query_id, neighbor_id, rnk, cos_sim); recall
    asserted in tests."""
    import ray

    sm = _sample_matrix(sf_dir)
    cent = _train_centroids(sm, n_centroids)
    cent_ref = ray.put(cent)

    qids, q = _load_queries(sf_dir, nq)
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]   # [nq, nprobe]
    qbuckets: dict = {}
    for qi, row in zip(qids, probes):
        for b in row:
            qbuckets.setdefault(int(b), []).append(int(qi))
    qn_by_id = {int(qid): q[i] for i, qid in enumerate(qids)}

    bucketed = _emb(sf_dir).map_batches(
        as_tasks(IvfBucketStage, centroids_ref=cent_ref),
        batch_format="pyarrow", batch_size=4096)

    cand = bucketed.groupby("bucket").map_groups(
        _make_score_bucket(qbuckets, qn_by_id), batch_format="pyarrow")
    return _final_topk(cand, k)


# ---------------------------------------------------------------------------
# Distributed k-means clustering (semantic bucketing / corpus balancing)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5


def _train_kmeans(sf_dir: str, k: int, iters: int,
                  init: np.ndarray | None = None,
                  reseed: bool = True) -> np.ndarray:
    """Distributed Lloyd's k-means over the embedding column (cosine
    geometry: unit vectors, spherical centroid update) — the semantic
    bucketing primitive behind cluster-balanced sampling and
    semantic dedup of training corpora.

    Output: (vec_id, cluster_id) final assignments.

    Scale shape: centroids initialize from a seeded driver-side sample
    (same bootstrap as the IVF quantizer); each Lloyd iteration is ONE
    streaming pass — map_batches reduces each batch to k partial rows
    (cluster, count, sum-vector as float64 bytes) against the broadcast
    centroids (``ray.put`` once per iteration), so only
    O(k x d x num_batches) floats leave the workers and the corpus is
    never shuffled or materialized.  The final labeling pass streams
    straight out.  Deterministic: seeded init, bounded iterations.
    Returns the trained centroid matrix (shared by embedding_kmeans and
    semantic_dedup).
    """
    import ray

    if init is not None:
        if len(init) == 0:
            return np.zeros((0, 0), np.float64)
        sm = init                   # re-seed pool == the provided init
        cent = init.copy()
        k = len(cent)
    else:
        sm = _sample_matrix(sf_dir)
        if len(sm) == 0:            # empty corpus: no centroids to train
            return np.zeros((0, 0), np.float64)
        rng = np.random.default_rng(IVF_SEED)
        cent = sm[rng.choice(len(sm), size=min(k, len(sm)),
                             replace=False)].copy()
        k = len(cent)
    d = cent.shape[1]

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)
            m = _batch_matrix(t)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((len(c), m.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "n": pa.array(counts),
                "vecsum": pa.array([row.tobytes() for row in sums],
                                   pa.binary()),
            })

        parts = _emb(sf_dir, columns=["embedding"]).map_batches(
            partial, batch_format="pyarrow", batch_size=8192).to_pandas()
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for cl, n, buf in zip(parts["cluster"], parts["n"],
                              parts["vecsum"]):
            sums[cl] += np.frombuffer(buf, dtype=np.float64)
            counts[cl] += n
        for c_i in range(k):
            if counts[c_i]:
                v = sums[c_i]
                cent[c_i] = v / (np.linalg.norm(v) or 1.0)
            elif reseed:                           # re-seed empty cluster
                cent[c_i] = sm[rng.integers(0, len(sm))]
            else:
                # SQL-bridge mode: an empty cluster has no deterministic
                # SQL analogue (the oracle simply keeps no centroid row).
                # Fail loudly rather than silently diverge.
                raise RuntimeError(
                    f"kmeans cluster {c_i} emptied with reseed disabled")

    return cent


def _assign_clusters(sf_dir: str, cent: np.ndarray):
    """Streaming final-assignment pass against broadcast centroids.
    Output: (vec_id, cluster_id); argmax ties break to the LOWEST
    cluster id (np.argmax first-max == the oracle's ROW_NUMBER order)."""
    import ray

    cent_ref = ray.put(cent)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        if t.num_rows == 0 or len(c) == 0:
            return pa.table({"vec_id": t["vec_id"].slice(0, 0),
                             "cluster_id": pa.array([], pa.int64())})
        m = _batch_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"],
                         "cluster_id": pa.array(assign)})

    return _emb(sf_dir).map_batches(label, batch_format="pyarrow",
                                    batch_size=8192)


def embedding_kmeans(sf_dir: str, k: int = KMEANS_K,
                     iters: int = KMEANS_ITERS):
    """Final k-means assignments (see _train_kmeans for the training
    scale shape).  Output: (vec_id, cluster_id)."""
    return _assign_clusters(sf_dir, _train_kmeans(sf_dir, k, iters))


def kmeans_assign_seeded(sf_dir: str, k: int = KMEANS_K, iters: int = 2):
    """SQL-bridge form of the distributed Lloyd loop: the SAME streaming
    partial-sum machinery as embedding_kmeans, but initialized from the
    k lowest-vec_id embeddings (normalized) instead of the seeded random
    sample, with empty-cluster re-seed disabled — every arithmetic step
    (assign -> spherical centroid update, `iters` times -> final assign)
    then has an exact unrolled-CTE mirror, so the driver hash-checks the
    full iterative computation, not just invariants.
    Output: (vec_id, cluster_id)."""
    cent = _train_kmeans(sf_dir, k, iters, init=_seeded_init(sf_dir, k),
                         reseed=False)
    return _assign_clusters(sf_dir, cent)


def semantic_dedup(sf_dir: str, threshold: float = 0.35,
                   k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                   seeded: bool = False):
    """SemDeDup-shaped semantic dedup (public recipe: k-means buckets the
    corpus, pairwise cosine is confined WITHIN each cluster, duplicates
    keep one representative): the scale answer to all-pairs near-dup —
    pairwise flops drop from O(n^2) to O(sum n_c^2), and each cluster
    prunes independently.

    Keeper rule (deterministic): ids ascending within a cluster; a vector
    is dropped iff cosine >= threshold against an already-KEPT lower-id
    vector, recording that keeper as ``dup_of``.

    Output: (vec_id, cluster_id, keep:int32, dup_of: nullable int64).

    Scale shape: ONE shuffle routes (vec_id, embedding) by the final
    cluster assignment (computed in the same map — no join with a labels
    table); the per-cluster pass is vectorized (one matmul row per
    candidate against the kept prefix).  k must scale with corpus size
    (target cluster cardinality, not cluster count, is the knob: at
    n=10^9 and ~10^4 vectors/cluster, k=10^5).  Known SemDeDup caveat,
    inherited deliberately: near-dups straddling a cluster boundary are
    not compared (recall trades against the O(n^2) wall).

    ``seeded=True`` initializes Lloyd from the k lowest-vec_id unit
    vectors with re-seed disabled (kmeans_assign_seeded's bridge
    parameterization) — then the FULL pipeline, greedy keeper rule
    included, has an exact recursive-CTE oracle (the driver's
    semantic_dedup_seeded entry).
    """
    import ray

    cent = _train_kmeans(sf_dir, k, iters,
                         init=_seeded_init(sf_dir, k) if seeded else None,
                         reseed=not seeded)
    cent_ref = ray.put(cent)

    def route(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        if t.num_rows == 0 or len(c) == 0:
            return pa.table({"vec_id": t["vec_id"].slice(0, 0),
                             "embedding": t["embedding"].slice(0, 0),
                             "cluster_id": pa.array([], pa.int64())})
        m = _batch_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"],
                         "embedding": t["embedding"],
                         "cluster_id": pa.array(assign)})

    def dedup_cluster(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g["vec_id"]))
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        m = _batch_matrix(g)            # zero-copy flatten, no row objects
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        n = len(ids)
        keep = np.ones(n, bool)
        dup_of = np.full(n, -1, np.int64)
        kept_rows: list = [0] if n else []
        # Chunked greedy: the rule is sequential by definition, but the
        # expensive part — each candidate vs the whole kept prefix — is
        # one [chunk, kept] matmul per chunk.  Only the chunk-internal
        # resolution (who keeps whom WITHIN the chunk) walks rows, and
        # each step is a vectorized mask over the chunk's own gram row.
        chunk = 512
        for lo in range(1, n, chunk):
            hi = min(lo + chunk, n)
            blk = m[lo:hi]
            pref = blk @ m[kept_rows].T >= threshold   # [b, |kept|]
            pref_hit = pref.any(axis=1)
            pref_first = np.argmax(pref, axis=1)
            gram = blk @ blk.T >= threshold            # [b, b]
            local_mask = np.zeros(hi - lo, bool)
            for r in range(hi - lo):
                if pref_hit[r]:
                    keep[lo + r] = False
                    dup_of[lo + r] = ids[kept_rows[int(pref_first[r])]]
                    continue
                cand = np.flatnonzero(gram[r, :r] & local_mask[:r])
                if len(cand):
                    keep[lo + r] = False
                    dup_of[lo + r] = ids[lo + int(cand[0])]
                else:
                    local_mask[r] = True
            kept_rows.extend((lo + np.flatnonzero(local_mask)).tolist())
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster_id": g["cluster_id"],
            "keep": pa.array(keep.astype(np.int32)),
            "dup_of": pa.array(
                np.ma.masked_array(dup_of, mask=dup_of < 0)),
        })

    return _emb(sf_dir).map_batches(route, batch_format="pyarrow",
                                    batch_size=8192) \
        .groupby("cluster_id").map_groups(dedup_cluster,
                                          batch_format="pyarrow",
                                          num_cpus=1)


def cluster_near_dup_flags(sf_dir: str, threshold: float = 0.35,
                           k: int = KMEANS_K, iters: int = 2):
    """SQL-bridge near-dup flagging over the SEEDED k-means buckets: a
    vector is a dup iff cosine >= threshold against ANY lower-id vector
    in the same cluster (the order-free variant of semantic_dedup's
    greedy keeper rule — greedy is sequential by definition; this rule
    joins, so the oracle can pin the whole clustered-dedup pipeline:
    Lloyd loop, routing AND flagging).  dup_of = the LOWEST qualifying
    lower id.  Output: (vec_id, cluster_id, dup:int32,
    dup_of: nullable int64).

    Scale shape: identical to semantic_dedup — ONE cluster-routed
    shuffle, per-cluster lower-triangle matmul (O(sum n_c^2) flops,
    k scales with corpus size)."""
    import ray

    init = _seeded_init(sf_dir, k)
    cent_ref = ray.put(_train_kmeans(sf_dir, k, iters,
                                     init=init, reseed=False))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        if t.num_rows == 0 or len(c) == 0:
            return pa.table({"vec_id": t["vec_id"].slice(0, 0),
                             "embedding": t["embedding"].slice(0, 0),
                             "cluster_id": pa.array([], pa.int64())})
        m = _batch_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table({"vec_id": t["vec_id"],
                         "embedding": t["embedding"],
                         "cluster_id": pa.array(
                             np.argmax(m @ c.T, axis=1).astype(np.int64))})

    def flag_cluster(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g["vec_id"]))
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        cl = g["cluster_id"].to_numpy(zero_copy_only=False)
        m = _batch_matrix(g)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        n = len(ids)
        hit = np.zeros(n, bool)
        first = np.full(n, -1, np.int64)
        chunk = 1024
        for lo in range(1, n, chunk):       # row 0 has no lower ids
            hi = min(lo + chunk, n)
            sims = m[lo:hi] @ m[:hi].T      # [b, hi]
            # strictly-lower-id mask within the chunk rows
            q = sims >= threshold
            cols = np.arange(hi)
            q &= cols[None, :] < np.arange(lo, hi)[:, None]
            h = q.any(axis=1)
            hit[lo:hi] = h
            f = q.argmax(axis=1)            # first True == lowest id
            first[lo:hi] = np.where(h, ids[f], -1)
        dup_of = pc.if_else(pa.array(hit), pa.array(first, pa.int64()),
                            pa.scalar(None, pa.int64()))
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster_id": pa.array(cl),
            "dup": pa.array(hit.astype(np.int32)),
            "dup_of": dup_of,
        })

    return _emb(sf_dir).map_batches(
        assign, batch_format="pyarrow", batch_size=8192) \
        .groupby("cluster_id") \
        .map_groups(flag_cluster, batch_format="pyarrow", num_cpus=1)


def _seeded_init(sf_dir: str, k: int) -> np.ndarray:
    """Normalized embeddings of the k lowest vec_ids — the deterministic
    SQL-mirrorable centroid init shared by the bridge queries."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", k)])
    t = t.sort_by("vec_id")
    init = _batch_matrix(t)
    if len(init):
        init = init / np.linalg.norm(init, axis=1, keepdims=True)
    return init


def cluster_balanced_sample(sf_dir: str, per_cluster: int = 40,
                            k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                            init_mode: str = "sample"):
    """Cluster-balanced corpus sampling: up to ``per_cluster`` vectors per
    k-means cluster, chosen deterministically (lowest vec_id first) — the
    diversity-preserving subsampling move (uniform sampling over a skewed
    corpus keeps the head; per-cluster quotas keep the tail modes).

    Output: (vec_id, cluster_id, rk) with rk = 1..per_cluster inside the
    cluster.

    Scale shape: centroids train once (_train_kmeans: streaming partial
    sums, corpus never shuffled); assignment is a zero-shuffle map; the
    quota is enforced with a per-batch top-N combiner + one small
    cluster-keyed reduction (ships <= per_cluster rows per cluster per
    block, same pattern as stratified_sample).

    ``init_mode='seeded'`` is the SQL-bridge form: first-k deterministic
    init + no re-seed + iters=2 (see kmeans_assign_seeded) — the driver
    hash-checks quota selection on top of the unrolled Lloyd loop.
    """
    import ray

    if init_mode == "seeded":
        cent = _train_kmeans(sf_dir, k, 2,
                             init=_seeded_init(sf_dir, k), reseed=False)
    else:
        cent = _train_kmeans(sf_dir, k, iters)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        if t.num_rows == 0 or len(c) == 0:
            return pa.table({"vec_id": t["vec_id"].slice(0, 0),
                             "cluster_id": pa.array([], pa.int64())})
        m = _batch_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster_id": pa.array(
                np.argmax(m @ c.T, axis=1).astype(np.int64))})

    def block_quota(t: pa.Table) -> pa.Table:
        # per-batch combiner: at most per_cluster lowest ids per cluster
        df = pd.DataFrame({"vec_id": t["vec_id"].to_numpy(
            zero_copy_only=False),
            "cluster_id": t["cluster_id"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["cluster_id", "vec_id"], kind="mergesort")
        df = df.groupby("cluster_id", sort=False).head(per_cluster)
        return pa.table({"vec_id": pa.array(df["vec_id"].to_numpy(np.int64)),
                         "cluster_id": pa.array(
                             df["cluster_id"].to_numpy(np.int64))})

    def final_quota(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cluster_id", "vec_id"], kind="mergesort")
        g = g.groupby("cluster_id", sort=False).head(per_cluster)
        rk = g.groupby("cluster_id", sort=False).cumcount() + 1
        return pa.table({"vec_id": pa.array(g["vec_id"].to_numpy(np.int64)),
                         "cluster_id": pa.array(
                             g["cluster_id"].to_numpy(np.int64)),
                         "rk": pa.array(rk.to_numpy(np.int64))})

    return (_emb(sf_dir).map_batches(assign, batch_format="pyarrow",
                                     batch_size=8192)
            .map_batches(block_quota, batch_format="pyarrow")
            .groupby("cluster_id").map_groups(final_quota,
                                              batch_format="pandas"))


# ---------------------------------------------------------------------------
# metadata-filtered exact ANN (hybrid search)
# ---------------------------------------------------------------------------


def ann_filtered_topk(sf_dir: str, lang: str = "en",
                      nq: int = DEFAULT_NQ, k: int = DEFAULT_K):
    """Hybrid (metadata-filtered) exact cosine top-k: neighbors are
    restricted to vectors whose ``documents`` row matches a predicate
    (``lang == lang``) — the filtered-vector-search shape every
    retrieval stack needs (filter pushdown BEFORE scoring, not post-hoc
    top-k re-filtering, which under-fills k).

    Scale shape: the eligibility set is NOT broadcast (documents is
    corpus-sized) — documents(doc_id) and embeddings co-partition ONCE
    on id; each bucket filters locally and scores only eligible rows
    against the broadcast query matrix, emitting per-bucket partial
    top-k.  Output: (query_id, neighbor_id, rnk) — rank-exact vs the
    SQL oracle.
    """
    import ray

    from ..functions.scale import coarse_npart, sized_read_parquet

    npart = coarse_npart()
    queries_ref = ray.put(_load_queries(sf_dir, nq))

    def doc_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["lang"], lang))
        did = pc.cast(f["doc_id"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(did, npart - 1), pa.int64()),
            "key": did,
            "embedding": pa.array([[]] * f.num_rows,
                                  pa.list_(pa.float32())),
            "is_doc": pa.array(np.ones(f.num_rows, bool)),
        })

    def emb_side(t: pa.Table) -> pa.Table:
        vid = pc.cast(t["vec_id"], pa.int64())
        emb = t["embedding"]
        if pa.types.is_fixed_size_list(emb.type):
            emb = pc.cast(emb, pa.list_(pa.float32()))
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(vid, npart - 1), pa.int64()),
            "key": vid,
            "embedding": emb,
            "is_doc": pa.array(np.zeros(t.num_rows, bool)),
        })

    docs = sized_read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang"]) \
        .map_batches(doc_side, batch_format="pyarrow")
    emb = _emb(sf_dir).map_batches(emb_side, batch_format="pyarrow")

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})

    def score_bucket(g: pa.Table) -> pa.Table:
        qids, q = ray.get(queries_ref)
        is_doc = g["is_doc"].to_numpy(zero_copy_only=False)
        keys = g["key"].to_numpy(zero_copy_only=False)
        eligible = np.sort(keys[is_doc])
        if not len(eligible):
            return empty
        e = g.filter(pa.array(~is_doc))
        vec_ids = keys[~is_doc]
        pos = np.searchsorted(eligible, vec_ids)
        posc = np.clip(pos, 0, len(eligible) - 1)
        hit = (pos < len(eligible)) & (eligible[posc] == vec_ids)
        e = e.filter(pa.array(hit))
        vec_ids = vec_ids[hit]
        if not e.num_rows:
            return empty
        m = _batch_matrix(e)            # zero-copy flatten, no row objects
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q.T                  # [n, q]
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids):
            s = sims[:, j]
            idx = np.flatnonzero(vec_ids != qid)
            if not len(idx):
                continue
            kk = min(k, len(idx))
            top = idx[np.argpartition(-s[idx], kk - 1)[:kk]]
            out_q.append(np.full(kk, qid, np.int64))
            out_n.append(vec_ids[top])
            out_s.append(s[top])
        if not out_q:
            return empty
        return pa.table({"query_id": np.concatenate(out_q),
                         "neighbor_id": np.concatenate(out_n),
                         "sim": np.concatenate(out_s)})

    cand = docs.union(emb).groupby("bucket").map_groups(
        score_bucket, batch_format="pyarrow", num_cpus=1)
    return _final_topk(cand, k)


# ---------------------------------------------------------------------------
# distributed PCA over the embedding column
# ---------------------------------------------------------------------------

PCA_COMPONENTS = 16


def _cov_stats(sf_dir: str):
    """Distributed second-moment pass shared by embedding_pca and the
    power-iteration bridge: one partial row (block_key, n, sum, X^T X)
    per block, O(d^2) floats each, summed on the driver in block_key
    order (deterministic reduction regardless of task completion order).
    Returns (n, mean[d], cov[d,d]) or None when n < 2."""

    def moments(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "block_key": pa.array([int(ids.min()) if len(ids) else -1],
                                  pa.int64()),
            "n": pa.array([m.shape[0]], pa.int64()),
            "sum": pa.array([m.sum(axis=0).tolist()],
                            pa.list_(pa.float64())),
            "ss": pa.array([(m.T @ m).ravel().tolist()],
                           pa.list_(pa.float64())),
        })

    parts = _emb(sf_dir).map_batches(
        moments, batch_format="pyarrow", batch_size=8192).to_pandas()
    if not len(parts) or int(parts["n"].sum()) < 2:
        return None
    parts = parts.sort_values("block_key")
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["sum"].to_numpy()), axis=0)
    d = s.shape[0]
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, cov


def pca_power_projection(sf_dir: str, iters: int = 3):
    """SQL-bridge form of the distributed PCA: the SAME second-moment
    machinery (_cov_stats), then `iters` power-iteration steps from the
    fixed start vector e_0 (w <- cov @ w / ||cov @ w||) instead of the
    driver eigendecomposition, and a streaming projection of every
    centered vector onto the resulting direction, published in micro
    units — every arithmetic step has an exact unrolled-CTE mirror, so
    the driver hash-checks the full spectral computation end to end.
    Output: (vec_id, proj_micro)."""
    import ray

    stats = _cov_stats(sf_dir)
    if stats is None:
        return _emb(sf_dir).map_batches(
            lambda t: pa.table({
                "vec_id": t["vec_id"],
                "proj_micro": pa.array([0] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")
    _, mean, cov = stats
    w = np.zeros(cov.shape[0], np.float64)
    w[0] = 1.0
    for _ in range(iters):
        u = cov @ w
        w = u / np.linalg.norm(u)
    proj_ref = ray.put((mean, w))

    def project(t: pa.Table, _ref=proj_ref) -> pa.Table:
        mu, wv = ray.get(_ref)
        m = _batch_matrix(t)
        y = (m - mu) @ wv
        return pa.table({
            "vec_id": t["vec_id"],
            "proj_micro": pa.array(np.round(y * 1e6).astype(np.int64)),
        })

    return _emb(sf_dir).map_batches(project, batch_format="pyarrow",
                                    batch_size=8192)


def embedding_pca(sf_dir: str, n_components: int = PCA_COMPONENTS):
    """Distributed PCA of the embedding column via mergeable second-moment
    partials — the covariance never sees more than O(d^2) floats per block.

    Pass 1 (zero shuffle): each batch emits ONE partial row
    ``(block_key, n, sum[d], ss[d*d])`` — count, column sums, and the
    X^T X Gram matrix.  Partials are O(d^2) floats per BLOCK regardless of
    rows (d=64 -> 32 KB), so the driver reduce is bounded by block count.
    The driver assembles cov = (SS - n * mean mean^T) / (n - 1), runs a
    d x d eigendecomposition (microseconds), fixes eigenvector signs
    deterministically (max-|.| element made positive), and broadcasts the
    (mean, components) pair.
    Pass 2 (zero shuffle): per-batch centered matmul projects every vector
    onto the top components.

    Partials are summed in block_key order (min vec_id per block) so the
    float reduction is deterministic across runs regardless of task
    completion order.

    Output: (vec_id, component list<float64> of length n_components).
    Iterative/spectral -> no SQL oracle; orthonormality, variance ordering
    and agreement with a single-node PCA are pinned in tests.
    """
    import ray

    stats = _cov_stats(sf_dir)
    if stats is None:
        return _emb(sf_dir).map_batches(
            lambda t: pa.table({
                "vec_id": t["vec_id"],
                "component": pa.array([[]] * t.num_rows,
                                      pa.list_(pa.float64()))}),
            batch_format="pyarrow")
    n, mean, cov = stats
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(-evals)[:n_components]
    comps = evecs[:, order]                     # [d, k]
    # deterministic sign: the max-|.| coordinate of each component positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    comps = comps * flip
    proj_ref = ray.put((mean, comps))

    def project(t: pa.Table, _ref=proj_ref) -> pa.Table:
        mu, w = ray.get(_ref)
        m = _batch_matrix(t)
        y = (m - mu) @ w
        return pa.table({
            "vec_id": t["vec_id"],
            "component": pa.array(list(y), pa.list_(pa.float64())),
        })

    return _emb(sf_dir).map_batches(project, batch_format="pyarrow",
                                    batch_size=8192)


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of sparse (BM25) + dense (cosine)
# ---------------------------------------------------------------------------

RRF_K0 = 60          # the standard RRF dampening constant
RRF_DEPTH = 50       # per-list depth fed into the fusion
RRF_TOPK = 20


def rrf_fusion(sf_dir: str, k: int = RRF_TOPK, depth: int = RRF_DEPTH):
    """Reciprocal-rank fusion of the BM25 sparse list and the dense cosine
    list for the corpus's canonical query (query vec_id=0, the fixed BM25
    term set) — the classic hybrid-retrieval combiner:

        rrf(doc) = sum over lists of  1_000_000 // (60 + rank_in_list)

    in exact integer micro-units, so the fused ordering is reproducible
    bit-for-bit against the SQL oracle (same discipline as bm25/perplexity).

    Scale shape: both input retrievals are already distributed and bounded
    (per-batch partial top-k; <= depth rows each reach the driver), so the
    fusion itself is an O(depth) driver merge — by construction, never a
    data-scale operation.  Output: (doc_id, rrf_micro, rnk) top-k.
    """
    from .textops import bm25_retrieval

    sparse = bm25_retrieval(sf_dir, k=depth).to_pandas()
    dense = ann_brute_topk(sf_dir, nq=1, k=depth).to_pandas()

    # empty corpus: an empty Dataset loses its schema -> treat a
    # column-less frame as an empty retrieval list
    if "score_micro" in sparse.columns:
        sparse = sparse.sort_values(["score_micro", "doc_id"],
                                    ascending=[False, True]).head(depth)
        rs = {int(r.doc_id): i + 1
              for i, r in enumerate(sparse.itertuples())}
    else:
        rs = {}
    if "rnk" in dense.columns:
        dense = dense.sort_values("rnk").head(depth)
        rd = {int(r.neighbor_id): int(r.rnk) for r in dense.itertuples()}
    else:
        rd = {}

    docs = sorted(set(rs) | set(rd))
    fused = [(doc,
              (1_000_000 // (RRF_K0 + rs[doc]) if doc in rs else 0)
              + (1_000_000 // (RRF_K0 + rd[doc]) if doc in rd else 0))
             for doc in docs]
    fused.sort(key=lambda x: (-x[1], x[0]))
    fused = fused[:k]
    return pa.table({
        "doc_id": pa.array([f[0] for f in fused], pa.int64()),
        "rrf_micro": pa.array([f[1] for f in fused], pa.int64()),
        "rnk": pa.array(list(range(1, len(fused) + 1)), pa.int64()),
    })


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the compressed-index scale path
# ---------------------------------------------------------------------------

PQ_M = 8            # subspaces (d=64 -> 8 dims each)
PQ_KS = 16          # codes per subspace (4-bit)
PQ_SEED = 40961
PQ_ADC_FACTOR = 4   # ADC candidate multiplier before exact re-rank


def _train_pq_codebooks(m: np.ndarray, n_sub: int = PQ_M, ks: int = PQ_KS,
                        iters: int = 10,
                        seed: int = PQ_SEED) -> np.ndarray:
    """Per-subspace seeded L2 k-means over a bounded unit-vector sample.
    Returns [n_sub, ks, d_sub] codebooks (deterministic)."""
    if len(m) == 0:
        return np.zeros((n_sub, ks, 0), np.float64)
    n, d = m.shape
    dsub = d // n_sub
    rng = np.random.default_rng(seed)
    books = np.zeros((n_sub, ks, dsub), np.float64)
    for s in range(n_sub):
        x = m[:, s * dsub:(s + 1) * dsub]
        cent = x[rng.choice(n, size=min(ks, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                mem = x[a == c]
                cent[c] = mem.mean(0) if len(mem) \
                    else x[rng.integers(0, n)]
        books[s, : len(cent)] = cent
    return books


class PqEncodeStage:
    """Actor: unit-normalize each vector and quantize every subvector to
    its nearest codebook entry — the batch emits (vec_id, codes) only,
    M bytes per vector instead of d floats (the object-store footprint
    win that makes billion-scale ANN fit)."""

    def __init__(self, books_ref):
        import ray

        self.books = ray.get(books_ref)        # [M, ks, dsub]

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _batch_matrix(t)
        if len(m) == 0:
            return pa.table({"vec_id": t["vec_id"].slice(0, 0),
                             "codes": pa.array([], pa.list_(pa.uint8()))})
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        n_sub, ks, dsub = self.books.shape
        codes = np.empty((len(m), n_sub), np.uint8)
        for s in range(n_sub):
            x = m[:, s * dsub:(s + 1) * dsub]
            # argmin ||x - c||^2 = argmax (x.c - ||c||^2/2)
            sc = x @ self.books[s].T \
                - 0.5 * (self.books[s] ** 2).sum(1)[None, :]
            codes[:, s] = np.argmax(sc, axis=1)
        return pa.table({
            "vec_id": t["vec_id"],
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), n_sub)})


class PqAdcScore:
    """Actor: asymmetric-distance (ADC) scoring — approx cosine of every
    coded vector against every query via per-subspace lookup tables,
    emitting each batch's top-k' candidates per query.  No float vectors
    move: the stage reads M uint8 codes per row and the [nq, M, ks] LUT
    broadcast."""

    def __init__(self, lut_ref, kprime: int):
        import ray

        self.qids, self.lut = ray.get(lut_ref)   # [nq], [nq, M, ks]
        self.kprime = kprime

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["codes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if n == 0:
            return empty
        codes = col.flatten().to_numpy(zero_copy_only=False) \
            .reshape(n, -1)                       # [n, M] uint8
        n_sub = codes.shape[1]
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        # approx[n, nq] = sum_m LUT[:, m, codes[:, m]]
        approx = np.zeros((n, len(self.qids)), np.float64)
        for s in range(n_sub):
            approx += self.lut[:, s, codes[:, s]].T
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            sc = approx[:, j]
            mask = vec_ids != qid
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            kk = min(self.kprime, len(idx))
            top = idx[np.argpartition(-sc[idx], kk - 1)[:kk]]
            out_q.append(np.full(kk, qid, dtype=np.int64))
            out_n.append(vec_ids[top])
            out_s.append(sc[top])
        if not out_q:
            return empty
        return pa.table({"query_id": np.concatenate(out_q),
                         "neighbor_id": np.concatenate(out_n),
                         "sim": np.concatenate(out_s)})


def ann_pq_topk(sf_dir: str, nq: int = DEFAULT_NQ, k: int = DEFAULT_K,
                n_sub: int = PQ_M, ks: int = PQ_KS,
                adc_factor: int = PQ_ADC_FACTOR, concurrency: int = 4):
    """Product-quantization ANN: bounded-sample codebook training ->
    distributed encode to M-byte codes -> ADC lookup-table scoring of
    the COMPRESSED index (no float vectors shuffle) -> exact cosine
    re-rank of the bounded ADC candidate set (nq * k * adc_factor ids).

    Output: (query_id, neighbor_id, rnk, cos_sim) — recall asserted in
    tests (approximate by design; no SQL oracle).

    Scale design: the float corpus is read twice (encode; re-rank
    filter) but only codes + candidate ids ever shuffle; LUTs and
    codebooks broadcast via ray.put.  The candidate id set is
    O(nq * k * adc_factor) — driver-bounded by construction.
    """
    import ray

    sm = _sample_matrix(sf_dir)
    books = _train_pq_codebooks(sm, n_sub, ks)
    qids, q = _load_queries(sf_dir, nq)
    dsub = q.shape[1] // n_sub if len(q) else 0
    lut = np.zeros((len(qids), n_sub, ks), np.float64)
    for s in range(n_sub):
        lut[:, s, :] = q[:, s * dsub:(s + 1) * dsub] @ books[s].T
    lut_ref = ray.put((qids, lut))
    books_ref = ray.put(books)

    codes = _emb(sf_dir).map_batches(
        as_tasks(PqEncodeStage, books_ref=books_ref),
        batch_format="pyarrow", batch_size=4096)
    adc = codes.map_batches(
        as_tasks(PqAdcScore, lut_ref=lut_ref, kprime=k * adc_factor),
        batch_format="pyarrow", batch_size=65536)

    def adc_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k * adc_factor)
        return g[["query_id", "neighbor_id"]]

    cand = (adc.groupby("query_id")
            .map_groups(adc_topk, batch_format="pandas")
            .take_all())                    # bounded: nq * k * adc_factor
    cand_ids = np.unique(np.array([r["neighbor_id"] for r in cand],
                                  np.int64))
    by_query: dict = {}
    for r in cand:
        by_query.setdefault(int(r["neighbor_id"]), []).append(
            int(r["query_id"]))
    qn_by_id = {int(qid): q[i] for i, qid in enumerate(qids)}
    cand_ref = ray.put((cand_ids, by_query, qn_by_id))

    class ExactRerank:
        def __init__(self):
            ids, byq, qn = ray.get(cand_ref)
            self.ids, self.byq, self.qn = ids, byq, qn

        def __call__(self, t: pa.Table) -> pa.Table:
            vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            keep = np.isin(vec_ids, self.ids)
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "neighbor_id": pa.array([], pa.int64()),
                              "sim": pa.array([], pa.float64())})
            if not keep.any():
                return empty
            sub = t.filter(pa.array(keep))
            m = _batch_matrix(sub)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sids = sub["vec_id"].to_numpy(zero_copy_only=False)
            out_q, out_n, out_s = [], [], []
            for i, vid in enumerate(sids):
                for qid in self.byq.get(int(vid), ()):
                    out_q.append(qid)
                    out_n.append(int(vid))
                    out_s.append(float(m[i] @ self.qn[qid]))
            if not out_q:
                return empty
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "sim": pa.array(out_s, pa.float64())})

    exact = _emb(sf_dir).map_batches(as_tasks(ExactRerank),
                                     batch_format="pyarrow",
                                     batch_size=4096)
    return _final_topk(exact, k)


MMR_LAMBDA = 0.7
MMR_POOL = 4          # candidate pool = MMR_POOL * k per query


def mmr_diverse_topk(sf_dir: str, nq: int = DEFAULT_NQ, k: int = DEFAULT_K,
                     lam: float = MMR_LAMBDA, pool: int = MMR_POOL):
    """Maximal-Marginal-Relevance diverse top-k retrieval: per query,
    greedily select k results maximizing

        lam * cos(q, d)  -  (1 - lam) * max_{s in selected} cos(d, s)

    — the standard redundancy-penalized retrieval used to keep near-dup
    documents from crowding a result list (and, in a training-data
    pipeline, to pick DIVERSE exemplars per centroid).  ``lam=1``
    degenerates to plain relevance top-k.

    Output: (query_id, neighbor_id, rnk, mmr_score).  Greedy + float, so
    rows-only driver check; invariants (first pick = relevance argmax,
    lam=1 == brute top-k set, determinism) are pinned in tests.

    Scale shape: candidate generation is the BruteScore pattern —
    broadcast unit query matrix, per-batch partial top-M (M = pool*k)
    with the candidate's UNIT VECTOR carried on the candidate row (a
    FixedSizeList column, [M x d] floats per batch — bounded); the
    greedy itself runs per query over the merged pool inside
    ``groupby(query_id).map_groups`` — at most M*n_batches rows pruned
    to M before the O(k*M) vectorized selection.  The corpus is scanned
    once; nothing quadratic in corpus size.
    """
    import ray

    queries_ref = ray.put(_load_queries(sf_dir, nq))
    m_pool = pool * k

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64()),
                      "unit": pa.array([], pa.list_(pa.float64()))})

    class PoolScore:
        def __init__(self, queries_ref, m):
            self.qids, self.q = ray.get(queries_ref)
            self.m = m

        def __call__(self, t: pa.Table) -> pa.Table:
            mtx = _batch_matrix(t)
            if not len(mtx):
                return empty
            mtx /= np.linalg.norm(mtx, axis=1, keepdims=True)
            sims = mtx @ self.q.T
            vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            out_q, out_n, out_s, out_v = [], [], [], []
            for j, qid in enumerate(self.qids):
                s = sims[:, j]
                idx = np.flatnonzero(vec_ids != qid)
                if not len(idx):
                    continue
                mm = min(self.m, len(idx))
                top = idx[np.argpartition(-s[idx], mm - 1)[:mm]]
                out_q.append(np.full(mm, qid, np.int64))
                out_n.append(vec_ids[top].astype(np.int64))
                out_s.append(s[top])
                out_v.append(mtx[top])
            if not out_q:
                return empty
            vecs = np.concatenate(out_v)
            unit = pa.ListArray.from_arrays(
                pa.array(np.arange(len(vecs) + 1, dtype=np.int32)
                         * vecs.shape[1]),
                pa.array(vecs.reshape(-1)))
            return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                             "neighbor_id": pa.array(np.concatenate(out_n)),
                             "sim": pa.array(np.concatenate(out_s)),
                             "unit": unit})

    def mmr_select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(m_pool)
        rel = g["sim"].to_numpy(np.float64)
        nid = g["neighbor_id"].to_numpy(np.int64)
        V = np.stack([np.asarray(v, np.float64)
                      for v in g["unit"].to_numpy()])
        n = len(nid)
        kk = min(k, n)
        chosen = np.zeros(kk, np.int64)
        scores = np.zeros(kk, np.float64)
        alive = np.ones(n, bool)
        chosen[0], scores[0] = 0, rel[0]       # argmax rel, id tie-broken
        alive[0] = False
        maxsim = V @ V[0]
        for r in range(1, kk):
            s = lam * rel - (1.0 - lam) * maxsim
            su = np.rint(s * 1e9).astype(np.int64)
            su[~alive] = np.iinfo(np.int64).min
            best_u = su.max()
            ties = np.flatnonzero(su == best_u)
            best = ties[np.argmin(nid[ties])]
            chosen[r], scores[r] = best, s[best]
            alive[best] = False
            maxsim = np.maximum(maxsim, V @ V[best])
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(np.int64)[chosen],
            "neighbor_id": nid[chosen],
            "rnk": np.arange(1, kk + 1, dtype=np.int64),
            "mmr_score": scores})

    cand = _emb(sf_dir).map_batches(
        as_tasks(PoolScore, queries_ref=queries_ref, m=m_pool),
        batch_format="pyarrow", batch_size=4096)
    return cand.groupby("query_id").map_groups(mmr_select,
                                               batch_format="pandas")


def ann_hard_negatives(sf_dir: str, nq: int = DEFAULT_NQ,
                       k: int = DEFAULT_K):
    """Contrastive HARD-NEGATIVE mining: for each query vector, the k
    nearest neighbors with a DIFFERENT label — the pairs a contrastive /
    metric-learning trainer wants most (similar embedding, wrong class).
    Rank-exact vs the SQL oracle (label inequality subsumes
    self-exclusion).  Output: (query_id, neighbor_id, rnk, cos_sim).

    Scale shape: identical to ann_brute_topk — queries (ids, labels,
    unit matrix) broadcast once; per-batch masked matmul + partial
    top-k; the corpus never shuffles."""
    import pyarrow.dataset as pads
    import ray

    tab = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(columns=["vec_id", "embedding", "label"],
                  filter=pads.field("vec_id") < nq)
    tab = tab.take(pc.sort_indices(tab["vec_id"]))
    qm = _batch_matrix(tab)
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})
    if not qm.shape[0]:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64())}))
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    qref = ray.put((tab["vec_id"].to_numpy(zero_copy_only=False),
                    tab["label"].to_numpy(zero_copy_only=False)
                    .astype(np.int64), qm))

    class _HardNeg:
        def __init__(self):
            self.qids, self.qlabels, self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _batch_matrix(t)
            if not m.shape[0]:
                return empty
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ self.q.T
            vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            labels = t["label"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(self.qids):
                idx = np.flatnonzero(labels != self.qlabels[j])
                if not len(idx):
                    continue
                s = sims[:, j]
                kk = min(k, len(idx))
                top = idx[np.argpartition(-s[idx], kk - 1)[:kk]]
                out_q.append(np.full(kk, qid, np.int64))
                out_n.append(vec_ids[top])
                out_s.append(s[top])
            if not out_q:
                return empty
            return pa.table({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "sim": np.concatenate(out_s)})

    cand = _emb(sf_dir, columns=("vec_id", "embedding", "label")) \
        .map_batches(as_tasks(_HardNeg), batch_format="pyarrow",
                     batch_size=4096)
    return _final_topk(cand, k)


RANGE_QUERY_THR = 0.35


def ann_range_query(sf_dir: str, nq: int = DEFAULT_NQ,
                    threshold: float = RANGE_QUERY_THR):
    """RANGE similarity search — the top-k API's dual: for each query
    vector, EVERY neighbor with cosine >= threshold (the radius-query
    shape dedup sweeps and recall audits use; k-free, so no rank
    tie-break is involved at all).  Output: (query_id, neighbor_id),
    self excluded; cosine floats never leave the workers.

    Scale shape: identical to ann_brute_topk — broadcast query matrix,
    per-batch masked matmul, but each batch emits its MATCHES instead
    of a local top-k; output size is the true result size."""
    import ray

    queries_ref = ray.put(_load_queries(sf_dir, nq))

    def scan(t: pa.Table) -> pa.Table:
        qids, q = ray.get(queries_ref)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64())})
        m = _batch_matrix(t)
        if not m.shape[0] or not len(qids):
            return empty
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q.T                        # [n, nq]
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        rows, cols = np.nonzero(sims >= threshold)
        keep = vec_ids[rows] != qids[cols]    # self excluded
        return pa.table({
            "query_id": pa.array(qids[cols][keep], pa.int64()),
            "neighbor_id": pa.array(vec_ids[rows][keep], pa.int64())})

    return _emb(sf_dir).map_batches(scan, batch_format="pyarrow",
                                    batch_size=4096)
