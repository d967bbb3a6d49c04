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
