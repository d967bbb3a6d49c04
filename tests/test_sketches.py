"""HLL sketch accuracy + mergeability (no SQL oracle — approximate by
design; accuracy is pinned here against exact counts instead)."""

import numpy as np
import pytest

from pg_walstream_ray.pipelines.sketches import (HLL_M, approx_user_days,
                                                 hll_estimate, hll_fold,
                                                 md5_hash64)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_estimate_within_error(n):
    vals = [f"key-{i}" for i in range(n)]
    regs = hll_fold(md5_hash64(vals), np.zeros(HLL_M, dtype=np.int8))
    est = hll_estimate(regs)
    assert abs(est - n) / n < 0.05, (est, n)


def test_hll_merge_equals_single_pass():
    a = [f"a-{i}" for i in range(10_000)]
    b = [f"a-{i}" for i in range(5_000, 15_000)]     # overlapping
    ra = hll_fold(md5_hash64(a), np.zeros(HLL_M, dtype=np.int8))
    rb = hll_fold(md5_hash64(b), np.zeros(HLL_M, dtype=np.int8))
    merged = np.maximum(ra, rb)
    single = hll_fold(md5_hash64(sorted(set(a) | set(b))),
                      np.zeros(HLL_M, dtype=np.int8))
    assert np.array_equal(merged, single)      # max-merge is exact on regs


def test_hll_deterministic():
    vals = [f"x{i}" for i in range(1000)]
    r1 = hll_fold(md5_hash64(vals), np.zeros(HLL_M, dtype=np.int8))
    r2 = hll_fold(md5_hash64(list(reversed(vals))),
                  np.zeros(HLL_M, dtype=np.int8))
    assert np.array_equal(r1, r2)              # order-insensitive


@pytest.mark.usefixtures("ray_session")
def test_approx_user_days_vs_exact():
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = int(approx_user_days(sf)["n_approx"].iloc[0])
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT (user_id, date_trunc('day', ts))) "
        f"FROM '{sf}/events.parquet'").fetchone()[0]
    assert abs(got - exact) / exact < 0.05, (got, exact)


# ---------------------------------------------------------------------------
# t-digest approximate quantiles
# ---------------------------------------------------------------------------


def test_tdigest_rank_error_bounded():
    from pg_walstream_ray.pipelines.sketches import (tdigest_build,
                                                     tdigest_merge,
                                                     tdigest_quantile)

    rng = np.random.default_rng(7)
    data = np.concatenate([rng.lognormal(3, 1, 40_000),
                           rng.normal(100, 5, 20_000)])
    # build from 8 disjoint shards, merged — the distributed shape
    parts = [tdigest_build(c, np.ones_like(c))
             for c in np.array_split(data, 8)]
    m, w = tdigest_merge(parts)
    assert len(m) <= 512          # compressed
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = tdigest_quantile(m, w, q)
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.02, (q, rank, est)


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_vs_exact():
    import duckdb

    from pg_walstream_ray.pipelines.sketches import approx_quantiles

    sf = "/root/testdata/sf0.001"
    got = approx_quantiles(sf).set_index("l_returnflag")
    exact = duckdb.sql(f"""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.9) AS p90,
               quantile_cont(l_extendedprice, 0.99) AS p99
        FROM '{sf}/lineitem.parquet' GROUP BY l_returnflag
    """).df().set_index("l_returnflag")
    for flag in exact.index:
        for col in ("p50", "p90", "p99"):
            g, e = got.loc[flag, col], exact.loc[flag, col]
            assert abs(g - e) / max(abs(e), 1e-9) < 0.05, (flag, col, g, e)


# ---------------------------------------------------------------------------
# count-min heavy hitters
# ---------------------------------------------------------------------------


def test_cms_never_underestimates():
    from pg_walstream_ray.pipelines.sketches import (CMS_D, CMS_W, cms_fold,
                                                     cms_estimate)
    from pg_walstream_ray.functions.hashing import fast_hash64

    rng = np.random.default_rng(11)
    keys = [f"k{i}" for i in range(5000)]
    counts = rng.integers(1, 50, len(keys)).astype(np.int64)
    h = fast_hash64(keys)
    table = cms_fold(h, counts, np.zeros((CMS_D, CMS_W), np.int64))
    est = cms_estimate(h, table)
    assert (est >= counts).all()
    # with 4x16384 counters and ~125k total weight, overestimate is tiny
    assert (est - counts).mean() < 2.0


@pytest.mark.usefixtures("ray_session")
def test_approx_heavy_hitters_vs_exact():
    import duckdb

    from pg_walstream_ray.pipelines.sketches import approx_heavy_hitters

    sf = "/root/testdata/sf0.001"
    got = approx_heavy_hitters(sf, k=20)
    exact = duckdb.sql(f"""
        SELECT token FROM (
          SELECT unnest(string_split(text, ' ')) AS token
          FROM '{sf}/documents.parquet')
        WHERE token <> '' GROUP BY token
        ORDER BY COUNT(*) DESC, token ASC LIMIT 20
    """).df()["token"].tolist()
    overlap = len(set(got["token"]) & set(exact))
    assert overlap >= 18, (overlap, got["token"].tolist(), exact)


@pytest.mark.usefixtures("ray_session")
def test_approx_group_distinct_vs_exact():
    import duckdb

    from pg_walstream_ray.pipelines.sketches import approx_group_distinct

    sf = "/root/testdata/sf0.01"
    got = approx_group_distinct(sf).to_pandas() \
        .set_index("event_type")["n_approx"]
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        f"'{sf}/events.parquet' GROUP BY event_type").df() \
        .set_index("event_type")["n"]
    assert set(got.index) == set(exact.index)
    for ty in exact.index:
        err = abs(int(got[ty]) - int(exact[ty])) / max(1, int(exact[ty]))
        assert err < 0.05, (ty, int(got[ty]), int(exact[ty]))


@pytest.mark.usefixtures("ray_session")
def test_approx_group_distinct_deterministic():
    from pg_walstream_ray.pipelines.sketches import approx_group_distinct

    sf = "/root/testdata/sf0.001"
    a = approx_group_distinct(sf).to_pandas().sort_values("event_type") \
        .reset_index(drop=True)
    b = approx_group_distinct(sf).to_pandas().sort_values("event_type") \
        .reset_index(drop=True)
    assert a.equals(b)
