"""Round-4 surfaces: distributed registry pre-scan (no-sidecar fallback),
LSH-banded near-dup pair source + scale-safe dedup_clusters routing."""
import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from .helpers import make_wal

SF = "/root/testdata/sf0.001"


def test_build_registry_no_sidecar_fans_out(ray_session):
    """A missing-sidecar multi-shard WAL must build its registry through
    Ray tasks with NO driver-side frame decode: the driver module's
    decoder symbol is replaced with a bomb, which only the driver process
    sees (workers re-import the real module), so build_registry succeeds
    iff every frame decode ran off-driver."""
    from pg_walstream_ray.pipelines import cdc as cdcmod
    from pg_walstream_ray.sources import walgen

    spec = walgen.WalSpec(n_convs=40, turns_per_conv=6, n_shards=3,
                          schema_change_at_frac=0.5, seed=7)
    wal = make_wal(spec)
    shards = cdcmod.discover_shards(wal)

    expected = cdcmod.build_registry(wal, shards)          # sidecar path
    for sc in glob.glob(os.path.join(wal, "shard=*", "relations.json")):
        os.remove(sc)

    class _DriverDecodeBomb:
        def __init__(self, *a, **k):
            raise AssertionError("driver-side frame decode in "
                                 "build_registry fallback")

    orig = cdcmod.PgOutputDecoder
    cdcmod.PgOutputDecoder = _DriverDecodeBomb
    try:
        reg = cdcmod.build_registry(wal, shards)
    finally:
        cdcmod.PgOutputDecoder = orig

    assert reg._versions.keys() == expected._versions.keys()
    for key, rv in expected._versions.items():
        got = reg._versions[key]
        assert got.columns == rv.columns
        assert got.name == rv.name
        assert got.replica_identity == rv.replica_identity
    # the evolved WAL really exercises multi-version state
    assert any(ver > 1 for (_, ver) in reg._versions)


def test_scan_shard_relations_empty_segments(ray_session):
    """A shard whose segments carry no Relation message (e.g. keepalives
    only) contributes nothing, without erroring."""
    import pyarrow.parquet as pq
    import tempfile

    from pg_walstream_ray.pipelines.cdc import _scan_shard_relations
    from pg_walstream_ray.wire.frames import encode_keepalive

    d = tempfile.mkdtemp(prefix="pgwr_emptyshard_")
    p = os.path.join(d, "wal-000.parquet")
    pq.write_table(
        pa.table({"frame": pa.array([encode_keepalive(1000, 0, False)],
                                    pa.binary())}), p)
    assert _scan_shard_relations([p]) == []


# ---------------------------------------------------------------------------
# LSH-banded near-dup pair source (scale-safe dedup_clusters default)
# ---------------------------------------------------------------------------


def _pair_index(ds) -> dict:
    df = ds.to_pandas()
    return {(int(a), int(b)): float(s)
            for a, b, s in zip(df["vec_a"], df["vec_b"], df["cos_sim"])}


def test_lsh_near_dup_pairs_recall_and_exact_precision(ray_session):
    """Banded pairs vs the exact scorer on the sf0.001 embeddings (an
    ADVERSARIAL corpus for LSH: near-orthogonal vectors, all true pairs
    at cosine 0.35-0.48).  Precision must be exact (in-bucket verify is
    the exact scorer) and each pair emitted once; recall >= 0.9 at
    tables=24."""
    from pg_walstream_ray.pipelines.similarity import (embedding_near_dup,
                                                       lsh_near_dup_pairs)

    exact = _pair_index(embedding_near_dup(SF, threshold=0.35))
    assert len(exact) > 100                      # fixture has real pairs

    got_df = lsh_near_dup_pairs(SF, threshold=0.35, tables=24).to_pandas()
    got = {(int(a), int(b)): float(s)
           for a, b, s in zip(got_df["vec_a"], got_df["vec_b"],
                              got_df["cos_sim"])}
    assert len(got) == len(got_df)               # no duplicate pairs
    for pair, sim in got.items():
        assert pair in exact                     # exact precision
        assert abs(sim - exact[pair]) < 1e-9     # same scorer, same value
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.9, recall


def test_dedup_clusters_lsh_path_invariants(ray_session):
    """dedup_clusters over the banded pair source: valid cluster
    structure (cluster_id = min member, exactly one keep per cluster,
    sizes consistent) and node set == exact-path node set at >= 90%
    Jaccard (recall loss only ever drops whole isolated pairs)."""
    from pg_walstream_ray.pipelines.dedup import dedup_clusters

    lsh = dedup_clusters(SF, pair_source="lsh").to_pandas()
    exact = dedup_clusters(SF, pair_source="exact").to_pandas()

    g = lsh.groupby("cluster_id")
    assert (g["vec_id"].min() == g["vec_id"].min().index).all()
    assert (g["keep"].sum() == 1).all()
    sizes = g.size()
    assert (lsh.set_index("vec_id")["cluster_size"]
            == lsh.set_index("vec_id")["cluster_id"].map(sizes)).all()

    a, b = set(lsh["vec_id"]), set(exact["vec_id"])
    assert len(a & b) / len(a | b) >= 0.9


# ---------------------------------------------------------------------------
# round-4 SQL bridges for previously rows-only approximate ops
# ---------------------------------------------------------------------------


def test_ann_pq_rerank_exact_equals_brute(ray_session):
    """With re-rank depth covering the corpus (k*adc_factor=640 >= 500),
    the PQ pipeline's output must be rank-identical to brute force — the
    property that lets the driver pin it to the brute SQL oracle."""
    from pg_walstream_ray.pipelines.similarity import (ann_brute_topk,
                                                       ann_pq_topk)

    cols = ["query_id", "neighbor_id", "rnk"]
    brute = ann_brute_topk(SF).to_pandas()[cols] \
        .sort_values(cols, ignore_index=True)
    pq_full = ann_pq_topk(SF, adc_factor=64).to_pandas()[cols] \
        .sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(pq_full, brute)


def test_ann_full_coverage_variants_equal_brute(ray_session):
    """Coverage-parameterized IVF (nprobe = all lists) and LSH (bits=0,
    one bucket per table) must be rank-identical to brute force — true
    REGARDLESS of quantizer training or hyperplane draw, which is what
    makes them driver-oracle-able."""
    from pg_walstream_ray.pipelines import similarity as sim

    cols = ["query_id", "neighbor_id", "rnk"]
    brute = sim.ann_brute_topk(SF).to_pandas()[cols] \
        .sort_values(cols, ignore_index=True)
    ivf = sim.ann_ivf_topk(SF, nprobe=sim.IVF_CENTROIDS).to_pandas()[cols] \
        .sort_values(cols, ignore_index=True)
    lsh = sim.ann_lsh_topk(SF, bits=0, tables=2).to_pandas()[cols] \
        .sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(ivf, brute)
    pd.testing.assert_frame_equal(lsh, brute)


def test_dedup_kcore_matches_unrolled_hindex_sql(ray_session):
    """Pregel coreness == the 16-step unrolled integer h-index oracle
    (fixtures converge in <= 9 steps; pure ints, no float risk)."""
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["dedup_kcore"](SF).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(E.oracle_sql()["dedup_kcore"]).df() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_mmr_diverse_topk_matches_unrolled_greedy_sql(ray_session):
    """The nano-quantized greedy == the 10-step unrolled CTE greedy."""
    import duckdb

    import __ray_entry__ as E

    cols = ["query_id", "neighbor_id", "rnk"]
    mine = E.queries()["mmr_diverse_topk"](SF).to_pandas()[cols] \
        .sort_values(cols, ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(E.oracle_sql()["mmr_diverse_topk"]).df()[cols] \
        .sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_dedup_pagerank_ranks_matches_unrolled_sql(ray_session):
    """Nano-quantized Pregel ranks == the 10-step unrolled power-iteration
    oracle (the driver bridge for the iterative graph computation)."""
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["dedup_pagerank_ranks"](SF).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(E.oracle_sql()["dedup_pagerank_ranks"]).df() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
    # ranks are a probability vector in nano-units
    assert abs(mine["rank_nano"].sum() - 1_000_000_000) < 1000


# ---------------------------------------------------------------------------
# continuous tailing: phased WAL + live follow consumers
# ---------------------------------------------------------------------------


def test_phased_wal_replays_to_same_lake_as_standard(ray_session):
    """Fully-appended phased WAL == standard upsert WAL: same final lake
    (identical logical rows/xids/LSNs, only the segment layout differs)."""
    import hashlib
    import tempfile

    from pg_walstream_ray.lake import snapshot_table
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.events_cdc import (
        build_wal_from_events, build_wal_from_events_phased)

    key = hashlib.sha1(f"{os.path.abspath(SF)}|upsert|2"
                       .encode()).hexdigest()[:12]
    std_wal = os.path.join("/tmp/pgwr_cdc", f"wal-upsert-{key}")
    build_wal_from_events(SF, "upsert", std_wal, n_shards=2)
    phased_wal = tempfile.mkdtemp(prefix="pgwr_phased_")
    append, st = build_wal_from_events_phased(SF, phased_wal, n_shards=2)
    assert st["phase1_dml"] > 0 and st["phase2_dml"] > 0
    append()

    def snap(wal):
        lk = tempfile.mkdtemp(prefix="pgwr_lake_ph_")
        try:
            run_cdc(wal, lk, num_partitions=4)
            df = snapshot_table(lk).to_pandas()
            return df.sort_values(["conv_id", "turn_idx"]) \
                .reset_index(drop=True)[sorted(df.columns)]
        finally:
            import shutil
            shutil.rmtree(lk, ignore_errors=True)

    pd.testing.assert_frame_equal(snap(phased_wal), snap(std_wal))


def test_follow_stream_windows_across_live_appends(ray_session):
    """The sharded follow consumer fed phase 1, with phase 2 appended
    while it polls, must produce exactly the one-shot batch windows and
    must have consumed >= 2 data polls (state advanced across polls)."""
    import tempfile
    import threading
    import time

    from pg_walstream_ray.pipelines.streaming import (follow_stream_windows,
                                                      stream_windows)
    from pg_walstream_ray.sources.events_cdc import (
        build_wal_from_events_phased)

    wal = tempfile.mkdtemp(prefix="pgwr_follow_")
    append, st = build_wal_from_events_phased(SF, wal, n_shards=2)
    phase1_routed = threading.Event()
    appended = threading.Event()

    def later():
        assert phase1_routed.wait(timeout=120)
        append()
        appended.set()

    t = threading.Thread(target=later)
    t.start()
    res = follow_stream_windows(
        wal, 4096, n_sources=2, n_actors=3, poll_interval_s=0.05,
        stop=appended.is_set,
        on_poll=lambda _p, _n: phase1_routed.set())
    t.join()
    assert res.data_polls >= 2
    assert res.late_dropped == 0
    batch = stream_windows(wal, 4096, n_sources=2, n_actors=3)
    pd.testing.assert_frame_equal(res.result_table().to_pandas(),
                                  batch.result_table().to_pandas())


def test_cdc_follow_live_query_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as E

    res = E.queries()["cdc_follow_live"](SF)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    mine = df[sorted(df.columns)].sort_values(
        list(sorted(df.columns))).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    odf = con.execute(E.oracle_sql()["cdc_follow_live"]).df()
    oracle = odf[sorted(odf.columns)].sort_values(
        list(sorted(odf.columns))).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_follow_windows_actor_death_raises_then_rerun_succeeds(
        ray_session, monkeypatch):
    """Failure contract of the follow consumer (same BSP restart
    semantics as the graph shards): an aggregator actor process dying
    mid-follow surfaces as an error — never a silent partial result —
    and a fresh run over the same WAL produces the exact batch windows."""
    import tempfile

    import ray
    from pg_walstream_ray.pipelines import streaming as st
    from pg_walstream_ray.sources.events_cdc import (
        build_wal_from_events_phased)

    wal = tempfile.mkdtemp(prefix="pgwr_followfault_")
    append, _ = build_wal_from_events_phased(SF, wal, n_shards=2)
    append()
    flag = os.path.join(tempfile.mkdtemp(prefix="flag_"), "crashed")

    class CrashingAgg(st._AggActor):
        def ingest(self, *a, **k):
            try:
                fd = os.open(flag, os.O_CREAT | os.O_EXCL)
                os.close(fd)
                os._exit(1)              # hard kill, no cleanup
            except FileExistsError:
                pass
            return super().ingest(*a, **k)

    monkeypatch.setattr(st, "_AggActor", CrashingAgg)
    with pytest.raises(ray.exceptions.RayError):
        st.follow_stream_windows(wal, 4096, n_sources=2, n_actors=2,
                                 poll_interval_s=0.05, max_idle_polls=2)
    monkeypatch.undo()

    res = st.follow_stream_windows(wal, 4096, n_sources=2, n_actors=2,
                                   poll_interval_s=0.05, max_idle_polls=2)
    batch = st.stream_windows(wal, 4096, n_sources=2, n_actors=2)
    pd.testing.assert_frame_equal(res.result_table().to_pandas(),
                                  batch.result_table().to_pandas())


def test_near_dup_pairs_auto_routes_by_corpus_size(ray_session, monkeypatch):
    """Above NEAR_DUP_EXACT_MAX_ROWS the default pair source must be the
    banded generator (VERDICT r3 #1: no O(N^2)-flop stage in the default
    lineage at large N)."""
    from pg_walstream_ray.pipelines import similarity as sim

    calls = []
    monkeypatch.setattr(
        sim, "lsh_near_dup_pairs",
        lambda *a, **k: calls.append("lsh") or sim.embedding_near_dup(SF))
    monkeypatch.setattr(sim, "NEAR_DUP_EXACT_MAX_ROWS", 10)
    sim.near_dup_pairs(SF)                       # 500 rows > 10 -> lsh
    assert calls == ["lsh"]
    monkeypatch.setattr(sim, "NEAR_DUP_EXACT_MAX_ROWS", 2_000_000)
    out = sim.near_dup_pairs(SF)                 # 500 rows -> exact path
    assert calls == ["lsh"]
    assert {"vec_a", "vec_b", "cos_sim"} <= set(out.schema().names)


# ---------------------------------------------------------------------------
# feature-hashing vectorizer + hashed-embedding retrieval
# ---------------------------------------------------------------------------


def test_hash_embed_matches_sql_oracle(ray_session):
    """Integer-exact hashing-trick vectors == the md5-nibble SQL mirror."""
    import duckdb

    import __ray_entry__ as E

    cols = ["doc_id", "dim", "weight"]
    mine = E.queries()["hash_embed"](SF).to_pandas()[cols] \
        .sort_values(cols, ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(E.oracle_sql()["hash_embed"]).df()[cols] \
        .sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
    # signed sums are bounded by per-(doc,dim) occurrence counts
    assert (mine["weight"].abs() <= mine.groupby("doc_id")["weight"]
            .transform("size") * 64).all()


def test_hash_embed_topk_matches_sql_and_brute(ray_session):
    """Retrieval ranks/scores == oracle AND == a local dense brute force."""
    import duckdb

    import __ray_entry__ as E
    from pg_walstream_ray.pipelines.textops import (HASH_EMBED_D,
                                                    HASH_EMBED_K,
                                                    HASH_EMBED_NQ,
                                                    HashEmbedStage)

    cols = ["query_id", "neighbor_id", "rnk", "dot"]
    mine = E.queries()["hash_embed_topk"](SF).to_pandas()[cols] \
        .sort_values(["query_id", "rnk"], ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(E.oracle_sql()["hash_embed_topk"]).df()[cols] \
        .sort_values(["query_id", "rnk"], ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)

    # independent local brute force over the dense vectors
    full = pa.parquet.read_table(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    ids, vecs, _ = HashEmbedStage(d=HASH_EMBED_D).dense(full)
    for qid in range(HASH_EMBED_NQ):
        q = vecs[ids == qid][0]
        dots = vecs @ q
        keep = ids != qid
        order = np.lexsort((ids[keep], -dots[keep]))[:HASH_EMBED_K]
        expect = list(zip(ids[keep][order], dots[keep][order]))
        got = mine[mine["query_id"] == qid].sort_values("rnk")
        assert list(zip(got["neighbor_id"], got["dot"])) == expect


# ---------------------------------------------------------------------------
# unrolled-SQL bridges for the iterative embedding ops (kmeans / PCA)
# ---------------------------------------------------------------------------


def test_kmeans_seeded_matches_unrolled_lloyd_sql(ray_session):
    """The distributed Lloyd loop (deterministic first-k init, no
    re-seed) == the 2-iteration unrolled-CTE oracle, assignment for
    assignment."""
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["kmeans_assign_seeded"](SF).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(E.oracle_sql()["kmeans_assign_seeded"]).df() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
    assert mine["cluster_id"].between(0, 7).all()
    assert mine["cluster_id"].nunique() > 1      # clusters actually split


def test_pca_power_projection_matches_unrolled_sql(ray_session):
    """Second-moment pass + 3 power-iteration steps + centered projection
    == the unrolled oracle, micro-unit for micro-unit."""
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["pca_power_projection"](SF).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(E.oracle_sql()["pca_power_projection"]).df() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
    # centered projection: mean ~ 0 in micro units, non-degenerate spread
    assert abs(mine["proj_micro"].mean()) < 1000
    assert mine["proj_micro"].std() > 1000


def test_cluster_near_dup_flags_matches_sql_and_semantics(ray_session):
    """Seeded-Lloyd buckets + order-free near-dup flag == the composed
    oracle; dup_of always a lower id in the same cluster."""
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["cluster_near_dup_flags"](SF).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(E.oracle_sql()["cluster_near_dup_flags"]).df() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
    dups = mine[mine["dup"] == 1]
    assert (dups["dup_of"] < dups["vec_id"]).all()
    by_cluster = mine.set_index("vec_id")["cluster_id"]
    assert (dups["dup_of"].map(by_cluster).to_numpy()
            == dups["cluster_id"].to_numpy()).all()


def test_balanced_sample_seeded_matches_sql(ray_session):
    """Per-cluster quota over the seeded assignment == oracle; quota and
    rank contiguity hold."""
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["balanced_sample_seeded"](SF).to_pandas() \
        .sort_values(["cluster_id", "rk"], ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(E.oracle_sql()["balanced_sample_seeded"]).df() \
        .sort_values(["cluster_id", "rk"], ignore_index=True)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
    assert mine.groupby("cluster_id")["rk"].max().le(40).all()
    assert (mine.groupby("cluster_id")["rk"].apply(
        lambda s: (s.sort_values().to_numpy()
                   == np.arange(1, len(s) + 1)).all())).all()


def test_ann_index_actor_lww_delete_reinsert():
    """Live-ANN index shard: LWW by LSN — a delete removes the key, a
    later re-insert resurrects it with the NEW vector; compaction keeps
    state bounded and never changes answers (idempotent/associative)."""
    from pg_walstream_ray.pipelines.streaming import _AnnIndexActor

    d = 4

    def slim(rows):
        convs, turns, lsns, dels, vecs = zip(*rows)
        flat = np.concatenate([np.asarray(v, np.int64) for v in vecs])
        return pa.table({
            "conv": pa.array(convs, pa.string()),
            "turn": pa.array(turns, pa.int32()),
            "lsn": pa.array(lsns, pa.int64()),
            "is_del": pa.array(dels, pa.bool_()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.int64()), d)})

    a = _AnnIndexActor(d, compact_rows=4)
    a.ingest(slim([("c1", 0, 10, False, [1, 0, 0, 0]),
                   ("c2", 0, 11, False, [0, 2, 0, 0])]))
    a.ingest(slim([("c1", 0, 20, True, [0, 0, 0, 0]),      # delete c1
                   ("c3", 1, 12, False, [0, 0, 3, 0])]))
    a.ingest(slim([("c1", 0, 30, False, [5, 5, 0, 0])]))   # re-insert c1
    qids = np.array([7], np.int64)
    qv = np.array([[1, 1, 1, 1]], np.int64)
    out = a.query((qids, qv), k=10).to_pandas()
    got = {(r.conv_id, r.turn_idx): r.dot for r in out.itertuples()}
    assert got == {("c1", 0): 10, ("c2", 0): 2, ("c3", 1): 3}
    # compaction collapsed the log to live keys only
    assert len(a.log) == 1 and a.log[0].num_rows == 3

    # out-of-order late arrival below the winning LSN must lose
    a.ingest(slim([("c1", 0, 25, True, [0, 0, 0, 0])]))    # stale delete
    out2 = a.query((qids, qv), k=10).to_pandas()
    assert {(r.conv_id, r.turn_idx): r.dot
            for r in out2.itertuples()}[("c1", 0)] == 10


def test_ann_index_actor_empty_and_all_deleted():
    from pg_walstream_ray.pipelines.streaming import _AnnIndexActor

    a = _AnnIndexActor(4)
    qids = np.array([0], np.int64)
    qv = np.zeros((1, 4), np.int64)
    assert a.query((qids, qv), 5).num_rows == 0
    a.ingest(pa.table({
        "conv": pa.array(["x"], pa.string()),
        "turn": pa.array([0], pa.int32()),
        "lsn": pa.array([1], pa.int64()),
        "is_del": pa.array([True], pa.bool_()),
        "vec": pa.FixedSizeListArray.from_arrays(
            pa.array([0, 0, 0, 0], pa.int64()), 4)}))
    assert a.query((qids, qv), 5).num_rows == 0


def _ref_bpe(word_cnts, k):
    """Plain single-process reference BPE with the engine's contract:
    overlap-counted pair stats, winner (count desc, l asc, r asc),
    str.replace application, placeholder chars 0xE000+i."""
    words = dict(word_cnts)
    merges = []
    txt = {}
    for i in range(k):
        counts = {}
        for w, c in words.items():
            for j in range(len(w) - 1):
                counts[(w[j], w[j + 1])] = counts.get(
                    (w[j], w[j + 1]), 0) + c
        if not counts:
            break
        n = max(counts.values())
        l, r = min(p for p, c in counts.items() if c == n)
        ph = chr(0xE000 + i)
        words = {w.replace(l + r, ph): c for w, c in words.items()}
        lt = txt.get(l, l)
        rt = txt.get(r, r)
        txt[ph] = lt + rt
        merges.append((i + 1, lt, rt, lt + rt, n))
    return merges


def test_bpe_train_matches_reference_with_overlaps(ray_session):
    """Sharded BPE == single-process reference on a corpus engineered to
    hit the a==b run-parity case ('aaaa' -> leftmost non-overlapping) and
    placeholder-adjacent merges in later rounds."""
    import ray

    from pg_walstream_ray.pipelines.tokenizer import train_bpe

    wc = [("aaaa", 7), ("aaab", 5), ("banana", 4), ("bandana", 3),
          ("aa", 11), ("nan", 2), ("abab", 6)]
    ds = ray.data.from_arrow(pa.table({
        "word": pa.array([w for w, _ in wc], pa.string()),
        "cnt": pa.array([c for _, c in wc], pa.int64())}))
    got = train_bpe(ds, n_merges=6, n_shards=3).to_pandas()
    want = pd.DataFrame(_ref_bpe(wc, 6),
                        columns=["rnk", "left", "right", "pair", "n"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_train_empty_corpus(ray_session):
    import ray

    from pg_walstream_ray.pipelines.tokenizer import train_bpe

    ds = ray.data.from_arrow(pa.table({
        "word": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64())}))
    out = train_bpe(ds, n_merges=4)
    assert out.num_rows == 0
    assert out.column_names == ["rnk", "left", "right", "pair", "n"]


def test_zorder_bucket_locality():
    """Every Morton bucket (top 8 interleaved bits) covers at most a
    16 x 16 rectangle of the (user %% 256, day %% 256) grid — the
    property that lets a two-column range predicate prune buckets by
    min/max stats alone."""
    from pg_walstream_ray.pipelines.analytics import _morton16

    ub, db = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    ub, db = ub.ravel().astype(np.int64), db.ravel().astype(np.int64)
    z = _morton16(ub, db) >> 8
    assert z.min() == 0 and z.max() == 255
    for arr in (ub, db):
        spans = (np.array([arr[z == b].max() - arr[z == b].min()
                           for b in range(256)]))
        assert (spans <= 15).all()
    # every bucket holds exactly 256 cells (bijection on the grid)
    assert (np.bincount(z, minlength=256) == 256).all()


def test_personalized_pagerank_seed_locality(ray_session):
    """PPR invariants on a planted two-component graph: restart mass
    stays in the seed component (the other component's ranks are exactly
    0), seeds rank positive, and total mass is <= 1 and concentrated
    near the seeds."""
    import ray

    from pg_walstream_ray.pipelines.dedup import personalized_pagerank

    # component A: path 0-1-2-3-4 (seeds live here: smallest ids)
    # component B: clique 100-101-102 (no seed -> rank must be 0)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4),
             (100, 101), (101, 102), (100, 102)]
    ds = ray.data.from_arrow(pa.table({
        "vec_a": pa.array([a for a, _ in pairs], pa.int64()),
        "vec_b": pa.array([b for _, b in pairs], pa.int64())}))
    out = personalized_pagerank(ds, n_seeds=3, iters=20).to_pandas() \
        .set_index("node")["rank"]
    assert set(out.index) == {0, 1, 2, 3, 4, 100, 101, 102}
    assert (out.loc[[100, 101, 102]] == 0.0).all()
    assert (out.loc[[0, 1, 2]] > 0).all()          # the 3 seeds
    assert out.loc[[0, 1, 2, 3, 4]].sum() <= 1.0 + 1e-9
    # restart pull: seed 1 (center of the seed set) outranks the far
    # non-seed tail node 4
    assert out.loc[1] > out.loc[4]


def test_zorder_pruned_scan_reads_fraction(ray_session):
    """The Z-ordered layout answers the fixed two-column range query
    reading only the candidate Morton buckets — a strict subset of the
    written buckets at sf0.01 — and returns exactly the raw-table WHERE
    result."""
    import os

    import duckdb

    from pg_walstream_ray.pipelines.analytics import (ZORDER_Q_DAY,
                                                      ZORDER_Q_USER,
                                                      _morton16,
                                                      _zorder_layout,
                                                      zorder_pruned_scan)

    sf = "/root/testdata/sf0.01"
    out = _zorder_layout(sf)
    total = len([x for x in os.listdir(out) if x.startswith("zb=")])
    ulo, uhi = ZORDER_Q_USER
    dlo, dhi = ZORDER_Q_DAY
    ubs = np.arange(ulo, uhi + 1) % 256
    dbs = np.arange(dlo, dhi + 1) % 256
    uu, dd = np.meshgrid(np.unique(ubs), np.unique(dbs), indexing="ij")
    cand = np.unique(_morton16(uu.ravel().astype(np.int64),
                               dd.ravel().astype(np.int64)) >> 8)
    read = len([b for b in cand
                if os.path.isdir(os.path.join(out, f"zb={b}"))])
    assert total >= 20            # enough buckets for pruning to mean much
    assert read <= max(2, total // 5)   # reads a small fraction
    got = zorder_pruned_scan(sf).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    want = duckdb.sql(f"""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(user_id AS BIGINT) AS user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
        FROM '{sf}/events.parquet'
        WHERE user_id BETWEEN {ulo} AND {uhi}
          AND epoch_us(ts) // 86400000000 BETWEEN {dlo} AND {dhi}
        ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_secondary_index_partition_incremental(ray_session, tmp_path):
    """refresh_index recomputes ONLY epoch-advanced partitions after a
    second change window, and index lookups equal a snapshot filter for
    every distinct indexed value."""
    from pg_walstream_ray.lake import (index_lookup, refresh_index,
                                       snapshot_table)
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import (WalSpec,
                                                 shard_logical_changes,
                                                 write_wal_lake)

    wal = str(tmp_path / "wal"); lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    spec = WalSpec(n_convs=40, turns_per_conv=5, n_shards=2, tx_rows=5,
                   update_frac=0.0, delete_frac=0.0)
    write_wal_lake(spec, wal, parallel=False)
    lsns = np.concatenate([
        shard_logical_changes(spec, s)["lsn"].to_numpy(
            zero_copy_only=False) for s in range(2)])
    mid = int(np.quantile(lsns, 0.85))
    run_cdc(wal, lake, num_partitions=32, stop_at_lsn=mid)
    r1 = refresh_index(lake, idx, column="tool")
    assert r1["refreshed"] == r1["partitions"] > 0
    assert refresh_index(lake, idx, column="tool")["refreshed"] == 0
    run_cdc(wal, lake, num_partitions=32)
    r3 = refresh_index(lake, idx, column="tool")
    assert 0 < r3["refreshed"] < r3["partitions"]

    snap = snapshot_table(lake).to_pandas()
    tools = sorted(snap["tool"].dropna().unique())
    assert tools
    for tool in tools:
        got = index_lookup(idx, "tool", tool).to_pandas() \
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        want = snap.loc[snap["tool"] == tool,
                        ["conv_id", "turn_idx", "tool"]] \
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        got["turn_idx"] = got["turn_idx"].astype(want["turn_idx"].dtype)
        pd.testing.assert_frame_equal(got, want)


def test_ann_index_checkpoint_restore_equivalence():
    """Checkpoint mid-stream + restore on a fresh shard + replay the
    tail == the uninterrupted run (LWW idempotence), including deletes
    arriving after the checkpoint."""
    from pg_walstream_ray.pipelines.streaming import _AnnIndexActor

    d = 4

    def slim(rows):
        convs, turns, lsns, dels, vecs = zip(*rows)
        flat = np.concatenate([np.asarray(v, np.int64) for v in vecs])
        return pa.table({
            "conv": pa.array(convs, pa.string()),
            "turn": pa.array(turns, pa.int32()),
            "lsn": pa.array(lsns, pa.int64()),
            "is_del": pa.array(dels, pa.bool_()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.int64()), d)})

    head = [("c1", 0, 10, False, [1, 0, 0, 0]),
            ("c2", 0, 11, False, [0, 2, 0, 0]),
            ("c3", 0, 12, False, [0, 0, 3, 0])]
    tail = [("c2", 0, 20, True, [0, 0, 0, 0]),      # delete post-ckpt
            ("c4", 1, 21, False, [4, 4, 0, 0]),
            ("c1", 0, 22, False, [9, 0, 0, 0])]     # update post-ckpt

    a = _AnnIndexActor(d)
    a.ingest(slim(head))
    ckpt = a.state_dict()
    a.ingest(slim(tail))

    b = _AnnIndexActor(d)
    b.load_state(ckpt)
    b.ingest(slim(tail))

    qp = (np.array([1], np.int64), np.ones((1, d), np.int64))
    ta = a.query(qp, 10).to_pandas()
    tb = b.query(qp, 10).to_pandas()
    pd.testing.assert_frame_equal(ta, tb)
    got = {(r.conv_id, r.turn_idx): r.dot for r in tb.itertuples()}
    assert got == {("c1", 0): 9, ("c3", 0): 3, ("c4", 1): 8}


def test_ann_index_actor_death_raises_then_rerun_succeeds(
        ray_session, monkeypatch):
    """Failure contract of the live ANN tier (BSP restart semantics): an
    index shard dying mid-replay surfaces as an error, and a fresh run
    over the same WAL produces the exact top-k."""
    import tempfile

    import ray
    from pg_walstream_ray.pipelines import streaming as st
    from pg_walstream_ray.sources.events_cdc import build_wal_from_events

    wal = os.path.join(tempfile.mkdtemp(prefix="pgwr_annfault_"), "wal")
    build_wal_from_events(SF, "upsert_delete", wal, n_shards=2)
    qids = np.arange(2, dtype=np.int64)
    qv = np.ones((2, 16), np.int64)
    want = st.stream_ann_index(wal, qids, qv, k=5, n_actors=2)
    flag = os.path.join(tempfile.mkdtemp(prefix="flag_"), "crashed")

    class CrashingShard(st._AnnIndexActor):
        def ingest(self, *a, **k):
            try:
                fd = os.open(flag, os.O_CREAT | os.O_EXCL)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
            return super().ingest(*a, **k)

    monkeypatch.setattr(st, "_AnnIndexActor", CrashingShard)
    with pytest.raises(ray.exceptions.RayError):
        st.stream_ann_index(wal, qids, qv, k=5, n_actors=2)
    monkeypatch.undo()
    got = st.stream_ann_index(wal, qids, qv, k=5, n_actors=2)
    assert got.equals(want)


def test_ann_index_order_and_chunking_independent():
    """LWW by LSN makes index state independent of arrival order and
    batch chunking: any permutation, any chunking, same answers."""
    from pg_walstream_ray.pipelines.streaming import _AnnIndexActor

    d = 4
    rng = np.random.default_rng(11)
    rows = []
    lsn = 1
    for i in range(200):
        conv = f"c{rng.integers(0, 25)}"
        turn = int(rng.integers(0, 4))
        is_del = bool(rng.integers(0, 5) == 0)
        vec = rng.integers(-2, 3, size=d)
        rows.append((conv, turn, lsn, is_del,
                     np.zeros(d, np.int64) if is_del else vec))
        lsn += 1

    def slim(rs):
        convs, turns, lsns, dels, vecs = zip(*rs)
        flat = np.concatenate([np.asarray(v, np.int64) for v in vecs])
        return pa.table({
            "conv": pa.array(convs, pa.string()),
            "turn": pa.array(turns, pa.int32()),
            "lsn": pa.array(lsns, pa.int64()),
            "is_del": pa.array(dels, pa.bool_()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.int64()), d)})

    qp = (np.array([0], np.int64),
          rng.integers(-3, 4, size=(1, d)).astype(np.int64))

    def run(order, chunks, compact_rows):
        a = _AnnIndexActor(d, compact_rows=compact_rows)
        rs = [rows[i] for i in order]
        bounds = np.linspace(0, len(rs), chunks + 1).astype(int)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi > lo:
                a.ingest(slim(rs[lo:hi]))
        return a.query(qp, 10).to_pandas()

    base = run(np.arange(len(rows)), 1, 65536)
    for seed, chunks, cr in ((1, 7, 16), (2, 3, 65536), (3, 40, 8)):
        perm = np.random.default_rng(seed).permutation(len(rows))
        got = run(perm, chunks, cr)
        pd.testing.assert_frame_equal(got, base)


def test_export_jsonl_resumable(ray_session, tmp_path):
    """JSONL export skips finished shards on re-run and rebuilds only
    deleted ones — the epoch-manifest resume contract.  The reported
    row total stays the TRUE snapshot size on every run (skipped shards
    contribute their recorded counts, not 0)."""
    from pg_walstream_ray.lake import export_snapshot_jsonl
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    wal = str(tmp_path / "wal"); lake = str(tmp_path / "lake")
    out = str(tmp_path / "jsonl")
    spec = WalSpec(n_convs=24, turns_per_conv=4, n_shards=2, tx_rows=6)
    write_wal_lake(spec, wal, parallel=False)
    run_cdc(wal, lake, num_partitions=6)
    r1 = export_snapshot_jsonl(lake, out)
    assert r1["rows"] > 0 and r1["exported"] > 0
    parts = sorted(p for p in os.listdir(out) if p.endswith(".jsonl"))
    mt = {p: os.path.getmtime(os.path.join(out, p)) for p in parts}
    r2 = export_snapshot_jsonl(lake, out)       # full skip
    assert r2["rows"] == r1["rows"] and r2["exported"] == 0
    assert all(os.path.getmtime(os.path.join(out, p)) == mt[p]
               for p in parts)
    victim = parts[0]
    os.remove(os.path.join(out, victim))
    r3 = export_snapshot_jsonl(lake, out)       # rebuilds only the victim
    assert os.path.exists(os.path.join(out, victim))
    assert all(os.path.getmtime(os.path.join(out, p)) == mt[p]
               for p in parts[1:])
    assert r3["rows"] == r1["rows"] and r3["exported"] == 1


def test_export_jsonl_stale_shard_reexported(ray_session, tmp_path):
    """A shard exported from an OLDER lake state must be re-exported
    when its source partition's manifest epoch changes — the pre-fix
    file-exists check silently kept stale data under a fresh _DONE."""
    import glob

    from pg_walstream_ray.lake import export_snapshot_jsonl
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    lake = str(tmp_path / "lake"); out = str(tmp_path / "jsonl")
    wal1 = str(tmp_path / "wal1"); wal2 = str(tmp_path / "wal2")
    write_wal_lake(WalSpec(n_convs=12, turns_per_conv=4, n_shards=2,
                           tx_rows=6), wal1, parallel=False)
    run_cdc(wal1, lake, num_partitions=4)
    r1 = export_snapshot_jsonl(lake, out)
    # second change window: MORE convs -> every partition's epoch bumps
    write_wal_lake(WalSpec(n_convs=24, turns_per_conv=4, n_shards=2,
                           tx_rows=6), wal2, parallel=False)
    run_cdc(wal2, lake, num_partitions=4)
    r2 = export_snapshot_jsonl(lake, out)
    assert r2["exported"] > 0                  # stale shards rewritten
    assert r2["rows"] > r1["rows"]
    # the export now reflects the post-window snapshot exactly
    n_lines = sum(sum(1 for _ in open(p))
                  for p in glob.glob(os.path.join(out, "*.jsonl")))
    assert n_lines == r2["rows"]


def test_clone_survives_source_compaction(ray_session, tmp_path):
    """Copy-on-write isolation both ways: compacting (rewriting) the
    SOURCE after a shallow clone must not disturb the clone — hardlinks
    keep the clone's fragment bytes alive after the source unlinks its
    names — and vice versa."""
    from pg_walstream_ray.lake import (clone_lake, compact_lake,
                                       snapshot_table)
    from pg_walstream_ray.pipelines.cdc import run_cdc
    from pg_walstream_ray.sources.walgen import WalSpec, write_wal_lake

    wal = str(tmp_path / "wal"); src = str(tmp_path / "src")
    dst = str(tmp_path / "clone")
    spec = WalSpec(n_convs=30, turns_per_conv=4, n_shards=2, tx_rows=6,
                   update_frac=0.4, delete_frac=0.1)
    write_wal_lake(spec, wal, parallel=False)
    run_cdc(wal, src, num_partitions=6)
    clone_lake(src, dst)
    before = snapshot_table(dst)
    compact_lake(src)                      # source rewrites + unlinks
    after = snapshot_table(dst)
    assert before.equals(after)
    # and the source still equals its own pre-compaction state
    assert snapshot_table(src).equals(before)


def test_incremental_cc_merges_and_fresh_nodes(ray_session):
    """Planted incremental-CC scenarios: a new pair bridging two old
    components relabels BOTH to the global min; fresh-node chains attach
    and stand alone; untouched components keep their labels."""
    import ray

    from pg_walstream_ray.pipelines.dedup import (connected_components,
                                                  incremental_cc)

    def pairs_ds(ps):
        return ray.data.from_arrow(pa.table({
            "vec_a": pa.array([a for a, _ in ps], pa.int64()),
            "vec_b": pa.array([b for _, b in ps], pa.int64())}))

    # base: components {1,2,3}, {10,11}, {20,21} (untouched)
    base = [(1, 2), (2, 3), (10, 11), (20, 21)]
    labels = connected_components(pairs_ds(base))
    # incr: bridge 3-10 (merge), fresh chain 30-31-32, fresh 40 attached
    # to old 20's component
    incr = [(3, 10), (30, 31), (31, 32), (20, 40)]
    out = incremental_cc(labels, pairs_ds(incr)).to_pandas() \
        .set_index("node")["lbl"]
    assert {out[n] for n in (1, 2, 3, 10, 11)} == {1}
    assert {out[n] for n in (30, 31, 32)} == {30}
    assert {out[n] for n in (20, 21, 40)} == {20}
    # must equal from-scratch CC on the union
    full = connected_components(pairs_ds(base + incr)).to_pandas() \
        .set_index("node")["lbl"]
    assert dict(out.sort_index()) == dict(full.sort_index())


def test_bpe_random_wordsets_match_reference(ray_session):
    """Randomized property check: sharded BPE == the single-process
    reference on arbitrary word/count sets (letter runs force the
    run-parity path; random counts force count-vs-codepoint
    tie-breaks)."""
    import ray

    from pg_walstream_ray.pipelines.tokenizer import train_bpe

    rng = np.random.default_rng(23)
    for trial in range(5):
        n_words = int(rng.integers(3, 30))
        words = []
        for _ in range(n_words):
            ln = int(rng.integers(1, 9))
            words.append("".join(
                rng.choice(list("abcde"), size=ln)))
        wc = [(w, int(rng.integers(1, 9)))
              for w in dict.fromkeys(words)]
        ds = ray.data.from_arrow(pa.table({
            "word": pa.array([w for w, _ in wc], pa.string()),
            "cnt": pa.array([c for _, c in wc], pa.int64())}))
        k = int(rng.integers(1, 7))
        got = train_bpe(ds, n_merges=k, n_shards=2).to_pandas()
        want = pd.DataFrame(
            _ref_bpe(wc, k),
            columns=["rnk", "left", "right", "pair", "n"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False), \
            (trial, wc)


def test_incremental_cc_random_graphs(ray_session):
    """Randomized property check: for random pair sets and random
    base/increment splits, the incremental fold equals from-scratch CC
    over the union."""
    import ray

    from pg_walstream_ray.pipelines.dedup import (connected_components,
                                                  incremental_cc)

    def pairs_ds(ps):
        return ray.data.from_arrow(pa.table({
            "vec_a": pa.array([a for a, _ in ps], pa.int64()),
            "vec_b": pa.array([b for _, b in ps], pa.int64())}))

    rng = np.random.default_rng(37)
    for trial in range(4):
        n_nodes = int(rng.integers(8, 60))
        n_pairs = int(rng.integers(4, 80))
        ps = set()
        while len(ps) < n_pairs:
            a, b = rng.integers(0, n_nodes, size=2)
            if a != b:
                ps.add((int(min(a, b)), int(max(a, b))))
        ps = sorted(ps)
        cut = int(rng.integers(0, len(ps)))
        base, incr = ps[:cut], ps[cut:]
        if not incr:
            continue
        labels = connected_components(pairs_ds(base)) if base else \
            ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "lbl": pa.array([], pa.int64())}))
        got = incremental_cc(labels, pairs_ds(incr)).to_pandas() \
            .sort_values("node", ignore_index=True)
        want = connected_components(pairs_ds(ps)).to_pandas() \
            .sort_values("node", ignore_index=True)
        pd.testing.assert_frame_equal(got, want), (trial, ps, cut)
