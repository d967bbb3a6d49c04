"""Round-5 fixes: exact two-sigma anomaly semantics (extra-k factor
removed), int64-exact incremental-CC label plumbing (no float round-trip
for node ids above 2^53), vectorized remap helper."""
import numpy as np
import pandas as pd
import pyarrow as pa


def test_expanding_two_sigma_matches_float_reference():
    """The all-integer flag test must equal the plain float 2-sigma
    test (|x - mean| > 2*sigma, population variance of PRIOR elements)
    on series where float arithmetic is exact."""
    from __ray_entry__ import expanding_two_sigma_flags

    rng = np.random.default_rng(5)
    for _ in range(20):
        n = rng.integers(0, 1000, size=int(rng.integers(0, 40)))
        got = expanding_two_sigma_flags(n)
        want = np.zeros(len(n), np.int64)
        for i in range(len(n)):
            if i >= 2:
                prior = n[:i].astype(float)
                var = prior.var()          # population variance
                if (n[i] - prior.mean()) ** 2 > 4 * var:
                    want[i] = 1
        assert (got == want).all(), (n.tolist(), got.tolist(),
                                     want.tolist())


def test_expanding_two_sigma_known_case():
    """Hand-checked: after priors [10, 10, 14] (mean 34/3, var 32/9),
    a 16-count window deviates by 14/3 > 2*sqrt(32/9)=~3.77 -> flag;
    a 15-count window deviates 11/3 < 3.77 -> no flag (index 2 flags in
    both series: priors [10, 10] have zero variance and 14 deviates).
    The pre-fix formula (extra factor k) passed dev^2 > 4*k*var*k^2,
    suppressing the k=3 flags here."""
    from __ray_entry__ import expanding_two_sigma_flags

    assert expanding_two_sigma_flags([10, 10, 14, 16]).tolist() \
        == [0, 0, 1, 1]
    assert expanding_two_sigma_flags([10, 10, 14, 15]).tolist() \
        == [0, 0, 1, 0]
    # constant priors: zero variance, any deviation flags
    assert expanding_two_sigma_flags([7, 7, 7, 8]).tolist() \
        == [0, 0, 0, 1]
    assert expanding_two_sigma_flags([7, 7, 7, 7]).tolist() \
        == [0, 0, 0, 0]


def test_map_or_identity_vectorized_lookup():
    from pg_walstream_ray.pipelines.dedup import (_map_or_identity,
                                                  _sorted_int_map)

    k, v = _sorted_int_map(np.array([5, 2, 9], np.int64),
                           np.array([50, 20, 90], np.int64))
    x = np.array([1, 2, 5, 7, 9, 10], np.int64)
    assert _map_or_identity(x, k, v).tolist() == [1, 20, 50, 7, 90, 10]
    # empty map is the identity
    e = np.empty(0, np.int64)
    assert _map_or_identity(x, e, e).tolist() == x.tolist()
    # input array is not mutated
    assert x.tolist() == [1, 2, 5, 7, 9, 10]


def test_bpe_load_part_idempotent_under_retry():
    """A retried push (same content digest) must not double-count word
    statistics — Ray tasks are at-least-once."""
    from pg_walstream_ray.pipelines.tokenizer import _KEY_SHIFT, _BpeShard

    sh = _BpeShard()
    sh.load_part(["ab", "cd"], np.array([2, 3], np.int64),
                 part_key=b"k1")
    sh.load_part(["ab", "cd"], np.array([2, 3], np.int64),
                 part_key=b"k1")                  # retry: dropped
    sh.load_part(["ef"], np.array([1], np.int64), part_key=b"k2")
    assert sh.finalize() == 3
    keys, sums = sh.pair_counts()
    want = {(ord("a") << _KEY_SHIFT) | ord("b"): 2,
            (ord("c") << _KEY_SHIFT) | ord("d"): 3,
            (ord("e") << _KEY_SHIFT) | ord("f"): 1}
    assert dict(zip(keys.tolist(), sums.tolist())) == want


def test_graph_shard_load_part_idempotent_under_retry():
    from pg_walstream_ray.pipelines.dedup import _CoreShard, _PrShard

    for cls in (_PrShard, _CoreShard):
        sh = cls(1)
        src = np.array([1, 2, 2], np.int64)
        dst = np.array([2, 1, 3], np.int64)
        sh.load_part(src, dst, part_key=b"x")
        sh.load_part(src, dst, part_key=b"x")      # retry: dropped
        sh.load_part(np.array([3], np.int64), np.array([2], np.int64),
                     part_key=b"y")
        assert sh.finalize() == 3
        assert sh.deg.tolist() == [1, 2, 1], cls.__name__


def test_chunk_explode_codepoint_exact_non_ascii():
    """Chunk geometry must be codepoint-based (the oracle's substr
    semantics) even for multibyte corpora, and every emitted chunk must
    be valid UTF-8 — the pre-fix byte slicing could split a codepoint."""
    from pg_walstream_ray.pipelines.textops import _chunk_explode_arrays

    docs = ["héllo wörld " * 7,           # 2-byte codepoints
            "ascii only text " * 9,
            "",                            # empty doc -> no chunks
            "日本語テキスト" * 25,            # 3-byte
            "mixed ascii → 𝄞 emoji 🎵 " * 6,  # 4-byte astral
            "x" * 5]
    chunk, stride = 20, 15
    doc_idx, sid, cst, cln, bodies = _chunk_explode_arrays(
        pa.array(docs, pa.string()), chunk, stride)
    got = list(zip(doc_idx.tolist(), sid.tolist(), cst.tolist(),
                   cln.tolist(), bodies.to_pylist()))
    want = []
    for d, s in enumerate(docs):
        n = len(s)                         # python len == codepoints
        i = 0
        while i * stride < n:
            body = s[i * stride:i * stride + chunk]
            want.append((d, i, i * stride, len(body), body))
            i += 1
    assert got == want
    for b in bodies.to_pylist():
        b.encode("utf-8").decode("utf-8")  # round-trips


def test_chunk_explode_ascii_fast_path_equal():
    """ASCII batches take the byte fast path; result must be identical
    to the codepoint reference."""
    from pg_walstream_ray.pipelines.textops import _chunk_explode_arrays

    docs = ["the quick brown fox " * 11, "a", "", "bb " * 40]
    doc_idx, sid, cst, cln, bodies = _chunk_explode_arrays(
        pa.array(docs, pa.string()), 200, 150)
    want = []
    for d, s in enumerate(docs):
        i = 0
        while i * 150 < len(s):
            want.append((d, i, i * 150, len(s[i * 150:i * 150 + 200]),
                         s[i * 150:i * 150 + 200]))
            i += 1
    assert list(zip(doc_idx.tolist(), sid.tolist(), cst.tolist(),
                    cln.tolist(), bodies.to_pylist())) == want


def test_incremental_cc_ids_above_2_53(ray_session):
    """Node ids above 2^53 must survive the label plumbing exactly —
    the pre-fix pandas map/fillna pass routed ids through float64 and
    silently corrupted them."""
    import ray

    from pg_walstream_ray.pipelines.dedup import (connected_components,
                                                  incremental_cc)

    B = 1 << 53
    # odd offsets around 2^53 are NOT representable in float64
    base = [(B + 1, B + 3), (B + 3, B + 5), (B + 11, B + 13)]
    incr = [(B + 5, B + 11), (B + 21, B + 23)]

    def pairs_ds(ps):
        return ray.data.from_arrow(pa.table({
            "vec_a": pa.array([a for a, _ in ps], pa.int64()),
            "vec_b": pa.array([b for _, b in ps], pa.int64())}))

    labels = connected_components(pairs_ds(base))
    out = incremental_cc(labels, pairs_ds(incr)).to_pandas() \
        .set_index("node")["lbl"]
    full = connected_components(pairs_ds(base + incr)).to_pandas() \
        .set_index("node")["lbl"]
    assert dict(out.sort_index()) == dict(full.sort_index())
    # every id reproduced bit-exactly
    assert set(out.index) == {a for p in base + incr for a in p}
    assert {out[n] for n in (B + 1, B + 3, B + 5, B + 11, B + 13)} \
        == {B + 1}
    assert {out[n] for n in (B + 21, B + 23)} == {B + 21}


def test_kcore_delta_scatter_random_graphs_multi_shard(ray_session):
    """Randomized equivalence: the delta-scatter h-index fixpoint on
    FORCED multi-shard layouts (npart=4, so cross-shard delta rounds
    really run) equals brute-force peeling, across graph shapes that
    stress the convergence tail (chains, cliques, random)."""
    import collections

    import ray.data as rd

    from pg_walstream_ray.pipelines.dedup import kcore_decomposition

    rng = np.random.default_rng(17)
    for trial in range(4):
        n = int(rng.integers(8, 60))
        m = int(rng.integers(n, 4 * n))
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a != b
        # unique undirected pairs — the engine contract (near-dup pair
        # sources emit each pair once; multi-edges would double-count
        # degrees in engine AND reference differently)
        uniq = {(min(x, y), max(x, y))
                for x, y in zip(a[keep].tolist(), b[keep].tolist())}
        # add a long chain to force many fixpoint rounds
        chain = np.arange(20) + n
        pairs = sorted(uniq) + \
            list(zip(chain[:-1].tolist(), chain[1:].tolist()))
        ds = rd.from_arrow(pa.table({
            "vec_a": pa.array([x for x, _ in pairs], pa.int64()),
            "vec_b": pa.array([y for _, y in pairs], pa.int64())}))
        got = kcore_decomposition(ds, npart=4).to_pandas() \
            .set_index("node")["coreness"].to_dict()
        adj = collections.defaultdict(set)
        for x, y in pairs:
            adj[x].add(y)
            adj[y].add(x)
        alive = {v: len(s) for v, s in adj.items()}
        core, k = {}, 0
        while alive:
            k = max(k, min(alive.values()))
            peel = [v for v, d in alive.items() if d <= k]
            while peel:
                v = peel.pop()
                if v not in alive:
                    continue
                core[v] = k
                del alive[v]
                for w in adj[v]:
                    if w in alive:
                        alive[w] -= 1
                        if alive[w] <= k:
                            peel.append(w)
        assert got == core, (trial, {x: (got.get(x), core.get(x))
                                     for x in core if got.get(x) != core[x]})


def test_connected_components_fast_path_equals_generic_and_brute(
        ray_session):
    """Random graphs: the tiny-graph in-memory CC fast path (npart=1),
    the generic iterative path (npart=4 forced), and a python
    union-find must all agree on min-labels."""
    import ray.data as rd

    from pg_walstream_ray.pipelines.dedup import connected_components

    rng = np.random.default_rng(29)
    for _ in range(4):
        n = int(rng.integers(5, 80))
        m = int(rng.integers(1, 3 * n))
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a != b
        if not keep.any():
            continue
        pairs = pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                          "vec_b": pa.array(b[keep], pa.int64())})
        fast = connected_components(rd.from_arrow(pairs), npart=1) \
            .to_pandas().set_index("node")["lbl"].to_dict()
        gen = connected_components(rd.from_arrow(pairs), npart=4) \
            .to_pandas().set_index("node")["lbl"].to_dict()
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a[keep].tolist(), b[keep].tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        brute = {x: find(x) for x in parent}
        assert fast == brute
        assert gen == brute


def test_audio_stats_strict_magic_and_determinism(ray_session):
    """The audio stage mirrors the image stage contract: strict mode
    raises on payloads without the synthetic magic (the honest real-
    codec seam), and stats are a pure function of doc_id."""
    import pytest

    from pg_walstream_ray.pipelines.multimodal import (AUDIO_HEADER_FMT,
                                                       AudioStatsStage,
                                                       audio_stats)

    sf = "/root/testdata/sf0.001"
    a = audio_stats(sf).to_pandas().sort_values("doc_id")
    b = audio_stats(sf).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    # hand-check doc 0: x[i] = (i*40503) % 65536 - 32768
    i = np.arange(256, dtype=np.int64)
    x = (i * 40503) % 65536 - 32768
    r0 = a[a["doc_id"] == 0].iloc[0]
    assert r0["n_samples"] == 256
    assert r0["peak"] == int(np.abs(x).max())
    assert r0["energy_q"] == int((x * x).sum()) // 256
    neg = x < 0
    assert r0["zero_crossings"] == int((neg[1:] != neg[:-1]).sum())

    bad = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "audio": pa.array([b"JUNKxxxxyyyy"], pa.binary())})
    with pytest.raises(NotImplementedError):
        AudioStatsStage()(bad)
    assert AudioStatsStage(strict=False)(bad).num_rows == 0


def test_ann_router_typed_and_envelope_paths_equivalent(ray_session,
                                                        tmp_path):
    """The live-ANN router's typed-direct fast path and its envelope
    fallback (registry=None) must route IDENTICAL slim rows: same
    routed count and the same final index answers."""
    import ray

    from pg_walstream_ray.pipelines import streaming as st
    from pg_walstream_ray.pipelines.cdc import (build_registry,
                                                discover_shards)
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    wal = str(tmp_path / "wal")
    spec = WalSpec(n_convs=40, turns_per_conv=5, n_shards=2, tx_rows=6)
    write_wal_lake(spec, wal, parallel=False)
    sp = discover_shards(wal)
    reg = build_registry(wal, sp)
    qids = np.arange(3, dtype=np.int64)
    qv = np.arange(3 * 16, dtype=np.int64).reshape(3, 16) % 5 - 2

    def run(registry):
        actor_cls = ray.remote(num_cpus=0.25)(st._AnnIndexActor)
        actors = [actor_cls.remote(16) for _ in range(3)]
        try:
            routed = sum(
                st._route_ann_shard([seg], actors, 3, 16,
                                    hash_mode="md5", registry=registry)
                for segs in sp for seg in segs)
            qref = ray.put((qids, np.ascontiguousarray(qv)))
            parts = ray.get([a.query.remote(qref, 5) for a in actors])
        finally:
            for a in actors:
                ray.kill(a)
        return routed, st._ann_merge_topk(parts, 5).to_pandas()

    routed_t, top_t = run(reg)
    routed_e, top_e = run(None)
    assert routed_t == routed_e > 0
    pd.testing.assert_frame_equal(top_t, top_e)


def test_winnow_fingerprints_guarantee_and_determinism(ray_session,
                                                       tmp_path):
    """Winnowing contracts (fast rolling-hash mode): (a) every window
    of w grams contains a selected position; (b) two docs sharing a
    substring of length >= k + w - 1 share at least one fingerprint
    VALUE; (c) deterministic; (d) short docs emit nothing."""
    import pyarrow.parquet as pq_

    from pg_walstream_ray.pipelines.textops import (WINNOW_K, WINNOW_W,
                                                    winnow_fingerprints)

    shared = "the same boilerplate passage appears verbatim here"
    docs = ["alpha " * 3 + shared + " tail one",
            "completely different beginning text " + shared,
            "short",                      # < k + w - 1: no window
            "x" * (WINNOW_K + WINNOW_W - 2)]   # one char short
    d = str(tmp_path / "sf")
    import os
    os.makedirs(d)
    pq_.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}),
        os.path.join(d, "documents.parquet"))
    a = winnow_fingerprints(d).to_pandas()
    b = winnow_fingerprints(d).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["doc_id", "pos"]).reset_index(drop=True),
        b.sort_values(["doc_id", "pos"]).reset_index(drop=True))
    assert set(a["doc_id"]) == {0, 1}     # short docs emit nothing
    # coverage: every window start j has a selected pos in [j, j+w-1]
    for did, s in ((0, docs[0]), (1, docs[1])):
        g = len(s) - WINNOW_K + 1
        sel = np.sort(a[a["doc_id"] == did]["pos"].to_numpy())
        for j in range(g - WINNOW_W + 1):
            lo = np.searchsorted(sel, j)
            assert lo < len(sel) and sel[lo] <= j + WINNOW_W - 1, (did, j)
    # shared-substring guarantee: >= 1 common fingerprint value
    f0 = set(a[a["doc_id"] == 0]["fp"])
    f1 = set(a[a["doc_id"] == 1]["fp"])
    assert f0 & f1


def test_winnow_selection_matches_brute_reference(ray_session, tmp_path):
    """Randomized: engine winnowing positions == a brute per-window
    rightmost-min reference, fast AND md5 hash modes."""
    import os

    import pyarrow.parquet as pq_

    from pg_walstream_ray.pipelines.textops import (WINNOW_K, WINNOW_W,
                                                    winnow_fingerprints)

    rng = np.random.default_rng(41)
    alpha = np.array(list("abcde "))
    docs = ["".join(rng.choice(alpha, size=int(rng.integers(
        WINNOW_K + WINNOW_W - 1, 80)))) for _ in range(12)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq_.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}),
        os.path.join(d, "documents.parquet"))

    import hashlib

    def brute(s, hasher):
        g = len(s) - WINNOW_K + 1
        hv = [hasher(s[i:i + WINNOW_K]) for i in range(g)]
        sel = set()
        for j in range(g - WINNOW_W + 1):
            win = hv[j:j + WINNOW_W]
            m = min(win)
            # rightmost position attaining the min
            sel.add(j + max(i for i, v in enumerate(win) if v == m))
        return {(p, hv[p]) for p in sel}

    B, P = 1_000_003, (1 << 31) - 1

    def roll(gram):
        h = 0
        for ch in gram:
            h = (h * B + ord(ch)) % P
        return h

    def md5h(gram):
        return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)

    for mode, hasher in (("fast", roll), ("md5", md5h)):
        out = winnow_fingerprints(d, hash_mode=mode).to_pandas()
        for did, s in enumerate(docs):
            got = {(int(r.pos), int(r.fp))
                   for r in out[out["doc_id"] == did].itertuples()}
            assert got == brute(s, hasher), (mode, did, s)
