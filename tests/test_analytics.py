"""Numerical correctness of the option-analytics cores (no SQL oracle
exists for IV/greeks — these tests are the correctness gate)."""

import numpy as np

from financedatabase_spark.functions.analytics import (
    binomial_iv,
    binomial_price,
    bs_greeks,
    bs_iv,
    bs_price,
    norm_cdf,
)


def test_norm_cdf_accuracy():
    # spot-check against known N(x) values
    for x, want in [(0.0, 0.5), (1.0, 0.8413447), (-1.0, 0.1586553), (1.96, 0.9750021)]:
        assert abs(norm_cdf(np.array([x]))[0] - want) < 2e-7


def test_bs_put_call_parity():
    rng = np.random.default_rng(7)
    n = 500
    s = np.full(n, 100.0)
    k = rng.uniform(60, 140, n)
    t = rng.uniform(0.05, 2.0, n)
    r, q = np.full(n, 0.05), np.full(n, 0.01)
    sigma = rng.uniform(0.1, 0.8, n)
    call = bs_price(s, k, t, r, q, sigma, np.ones(n, bool))
    put = bs_price(s, k, t, r, q, sigma, np.zeros(n, bool))
    parity = call - put - (s * np.exp(-q * t) - k * np.exp(-r * t))
    assert np.abs(parity).max() < 1e-6


def test_bs_iv_roundtrip():
    rng = np.random.default_rng(11)
    n = 1000
    s = np.full(n, 100.0)
    k = rng.uniform(70, 130, n)
    t = rng.uniform(0.05, 1.5, n)
    r, q = np.full(n, 0.05), np.full(n, 0.01)
    sigma = rng.uniform(0.08, 1.2, n)
    is_call = rng.integers(0, 2, n).astype(bool)
    price = bs_price(s, k, t, r, q, sigma, is_call)
    iv = bs_iv(price, s, k, t, r, q, is_call)
    ok = iv > 0
    assert ok.mean() > 0.99  # essentially all solvable
    # sub-resolution prices (deep-OTM, vega≈0) are numerically
    # vol-unidentifiable from the price — excluded, like any solver would
    identifiable = ok & (price > 1e-6)
    assert np.abs(iv[identifiable] - sigma[identifiable]).max() < 1e-4


def test_bs_iv_unsolvable_returns_zero():
    s = np.array([100.0]); k = np.array([100.0]); t = np.array([0.5])
    r = np.array([0.05]); q = np.array([0.0])
    below_intrinsic = np.array([0.0])
    assert bs_iv(below_intrinsic, s, k, t, r, q, np.array([True]))[0] == 0.0


def test_binomial_converges_to_bs_for_european_region():
    # deep OTM short-dated American call on non-dividend stock ≈ European
    n = 50
    s = np.full(n, 100.0)
    k = np.linspace(90, 110, n)
    t = np.full(n, 0.5)
    r, q = np.full(n, 0.03), np.full(n, 0.0)
    sigma = np.full(n, 0.25)
    is_call = np.ones(n, bool)
    bp = binomial_price(s, k, t, r, q, sigma, is_call, steps=256)
    eu = bs_price(s, k, t, r, q, sigma, is_call)
    assert np.abs(bp - eu).max() < 0.05  # CRR O(1/N) convergence


def test_binomial_iv_roundtrip():
    n = 40
    s = np.full(n, 100.0)
    k = np.linspace(85, 115, n)
    t = np.full(n, 0.4)
    r, q = np.full(n, 0.05), np.full(n, 0.02)
    sigma = np.linspace(0.15, 0.6, n)
    is_call = np.array([i % 2 == 0 for i in range(n)])
    price = binomial_price(s, k, t, r, q, sigma, is_call, steps=64)
    iv = binomial_iv(price, s, k, t, r, q, is_call, steps=64)
    assert np.abs(iv - sigma).max() < 1e-3


def test_greeks_sanity():
    n = 100
    s = np.full(n, 100.0)
    k = np.linspace(80, 120, n)
    t = np.full(n, 0.5)
    r, q = np.full(n, 0.05), np.full(n, 0.01)
    sigma = np.full(n, 0.3)
    g_call = bs_greeks(s, k, t, r, q, sigma, np.ones(n, bool))
    g_put = bs_greeks(s, k, t, r, q, sigma, np.zeros(n, bool))
    assert ((g_call["delta"] >= 0) & (g_call["delta"] <= 1)).all()
    assert ((g_put["delta"] >= -1) & (g_put["delta"] <= 0)).all()
    # delta parity: call_delta - put_delta = exp(-qt)
    assert np.abs(g_call["delta"] - g_put["delta"] - np.exp(-q * t)).max() < 1e-9
    assert (g_call["gamma"] > 0).all() and (g_call["vega"] > 0).all()
    np.testing.assert_allclose(g_call["dollar_delta"], g_call["delta"] * s)
    # finite-difference vega check
    eps = 1e-5
    fd_vega = (
        bs_price(s, k, t, r, q, sigma + eps, np.ones(n, bool))
        - bs_price(s, k, t, r, q, sigma - eps, np.ones(n, bool))
    ) / (2 * eps)
    np.testing.assert_allclose(g_call["vega"], fd_vega, rtol=1e-4)


def test_spark_iv_query(spark, sf_dir):
    from financedatabase_spark.plans.registry import QUERIES

    pdf = QUERIES["implied_vol_bs"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    solvable = pdf[pdf.bs_iv > 0]
    assert len(solvable) / len(pdf) > 0.95
    assert (solvable.bs_iv - solvable.true_sigma).abs().max() < 1e-4


def test_spark_risk_pipeline(spark, sf_dir):
    from financedatabase_spark.plans.registry import QUERIES

    pdf = QUERIES["risk_pipeline"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["bs_iv"].notna().all()
    assert (pdf["open_interest"] >= 0).all()
