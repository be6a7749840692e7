"""Option-analytics UDFs — SURVEY.md §2.9 U1–U5.

The reference computes implied vol and greeks ROW-WISE with
``df.apply(..., axis=1)`` calling an external closed-source `trade` package
(Organizers.py:127-271) — the classic pandas anti-pattern and the prime
pandas-UDF target. Here the math is reimplemented from public formulas
(Black-Scholes 1973; Cox-Ross-Rubinstein 1979 binomial tree) as pure-numpy
array functions, wrapped in Arrow-batched pandas UDFs:

- rows never cross the Python boundary one at a time (batch ~10k rows),
- the numpy cores are Spark-free and unit-testable,
- greeks return one STRUCT column expanded with ``select("g.*")``
  (J6 column-wise concat without a join).

Scale: a pandas UDF stage is embarrassingly parallel — no shuffle — so the
IV/greeks pipeline costs one Python-worker pass per partition regardless of
cluster size. Normal CDF uses the Abramowitz-Stegun 7.1.26 erf rational
approximation (|err| < 1.5e-7), well inside the IV solver's 1e-6 tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# numpy cores (no Spark imports needed)
# ---------------------------------------------------------------------------


def _erf(x: np.ndarray) -> np.ndarray:
    """Abramowitz & Stegun 7.1.26 rational approximation of erf."""
    sign = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-x * x))


def norm_cdf(x: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + _erf(np.asarray(x, dtype=np.float64) / np.sqrt(2.0)))


def norm_pdf(x: np.ndarray) -> np.ndarray:
    return np.exp(-0.5 * np.square(x)) / np.sqrt(2.0 * np.pi)


def bs_price(
    s: np.ndarray,
    k: np.ndarray,
    t: np.ndarray,
    r: np.ndarray,
    q: np.ndarray,
    sigma: np.ndarray,
    is_call: np.ndarray,
) -> np.ndarray:
    """European Black-Scholes price with continuous dividend yield q."""
    s, k, t, r, q, sigma = (np.asarray(a, dtype=np.float64) for a in (s, k, t, r, q, sigma))
    t = np.maximum(t, 1e-12)
    sigma = np.maximum(sigma, 1e-12)
    vol_sqrt = sigma * np.sqrt(t)
    d1 = (np.log(s / k) + (r - q + 0.5 * sigma**2) * t) / vol_sqrt
    d2 = d1 - vol_sqrt
    call = s * np.exp(-q * t) * norm_cdf(d1) - k * np.exp(-r * t) * norm_cdf(d2)
    put = k * np.exp(-r * t) * norm_cdf(-d2) - s * np.exp(-q * t) * norm_cdf(-d1)
    return np.where(is_call, call, put)


def bs_vega(s, k, t, r, q, sigma) -> np.ndarray:
    s, k, t, r, q, sigma = (np.asarray(a, dtype=np.float64) for a in (s, k, t, r, q, sigma))
    t = np.maximum(t, 1e-12)
    d1 = (np.log(s / k) + (r - q + 0.5 * sigma**2) * t) / (sigma * np.sqrt(t))
    return s * np.exp(-q * t) * norm_pdf(d1) * np.sqrt(t)


def bs_iv(
    price: np.ndarray,
    s: np.ndarray,
    k: np.ndarray,
    t: np.ndarray,
    r: np.ndarray,
    q: np.ndarray,
    is_call: np.ndarray,
    tol: float = 1e-6,
    max_newton: int = 20,
    max_bisect: int = 60,
) -> np.ndarray:
    """U1 — Black-Scholes implied vol: vectorized Newton with bisection
    fallback; 0.0 where no vol reproduces the price (reference returns 0
    and later re-resolves, Organizers.py:172-185)."""
    price, s, k, t, r, q = (np.asarray(a, dtype=np.float64) for a in (price, s, k, t, r, q))
    is_call = np.asarray(is_call, dtype=bool)
    intrinsic_lo = bs_price(s, k, t, r, q, np.full_like(s, 1e-9), is_call)
    upper = bs_price(s, k, t, r, q, np.full_like(s, 5.0), is_call)
    solvable = (price > intrinsic_lo + 1e-12) & (price < upper - 1e-12) & (t > 0)

    # Brenner-Subrahmanyam seed, clipped into the bracket
    sigma = np.clip(np.sqrt(2.0 * np.pi / np.maximum(t, 1e-12)) * price / s, 0.05, 3.0)
    for _ in range(max_newton):
        diff = bs_price(s, k, t, r, q, sigma, is_call) - price
        vega = bs_vega(s, k, t, r, q, sigma)
        step = np.where(vega > 1e-12, diff / np.maximum(vega, 1e-12), 0.0)
        sigma = np.clip(sigma - step, 1e-9, 5.0)
    converged = np.abs(bs_price(s, k, t, r, q, sigma, is_call) - price) < tol

    # bisection for the stubborn rows
    need = solvable & ~converged
    if need.any():
        lo = np.full_like(s, 1e-9)
        hi = np.full_like(s, 5.0)
        for _ in range(max_bisect):
            mid = 0.5 * (lo + hi)
            too_high = bs_price(s, k, t, r, q, mid, is_call) > price
            hi = np.where(too_high, mid, hi)
            lo = np.where(too_high, lo, mid)
        sigma = np.where(need, 0.5 * (lo + hi), sigma)
    return np.where(solvable, sigma, 0.0)


def binomial_price(
    s: np.ndarray,
    k: np.ndarray,
    t: np.ndarray,
    r: np.ndarray,
    q: np.ndarray,
    sigma: np.ndarray,
    is_call: np.ndarray,
    steps: int = 64,
    american: bool = True,
) -> np.ndarray:
    """U2 — Cox-Ross-Rubinstein binomial price, vectorized across rows
    (one (rows, steps+1) lattice rolled backward)."""
    s, k, t, r, q, sigma = (np.asarray(a, dtype=np.float64) for a in (s, k, t, r, q, sigma))
    is_call = np.asarray(is_call, dtype=bool)
    t = np.maximum(t, 1e-12)
    sigma = np.maximum(sigma, 1e-9)
    dt = t / steps
    u = np.exp(sigma * np.sqrt(dt))
    d = 1.0 / u
    disc = np.exp(-r * dt)
    p = np.clip((np.exp((r - q) * dt) - d) / (u - d), 0.0, 1.0)

    j = np.arange(steps + 1)[None, :]  # node index at maturity
    st = s[:, None] * u[:, None] ** (2 * j - steps)
    sign = np.where(is_call, 1.0, -1.0)[:, None]
    vals = np.maximum(sign * (st - k[:, None]), 0.0)
    for step in range(steps - 1, -1, -1):
        vals = disc[:, None] * (p[:, None] * vals[:, 1 : step + 2] + (1 - p[:, None]) * vals[:, : step + 1])
        if american:
            jj = np.arange(step + 1)[None, :]
            st = s[:, None] * u[:, None] ** (2 * jj - step)
            vals = np.maximum(vals, sign * (st - k[:, None]))
    return vals[:, 0]


def binomial_iv(
    price, s, k, t, r, q, is_call, steps: int = 64, iters: int = 40
) -> np.ndarray:
    """U2 — binomial implied vol via vectorized bisection."""
    price, s, k, t, r, q = (np.asarray(a, dtype=np.float64) for a in (price, s, k, t, r, q))
    is_call = np.asarray(is_call, dtype=bool)
    lo = np.full_like(s, 1e-6)
    hi = np.full_like(s, 5.0)
    p_lo = binomial_price(s, k, t, r, q, lo, is_call, steps)
    p_hi = binomial_price(s, k, t, r, q, hi, is_call, steps)
    solvable = (price > p_lo) & (price < p_hi) & (t > 0)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        too_high = binomial_price(s, k, t, r, q, mid, is_call, steps) > price
        hi = np.where(too_high, mid, hi)
        lo = np.where(too_high, lo, mid)
    return np.where(solvable, 0.5 * (lo + hi), 0.0)


def bs_greeks(
    s, k, t, r, q, sigma, is_call
) -> dict[str, np.ndarray]:
    """U3 — closed-form BS greeks (+ Dollar_Delta = Delta * S,
    Organizers.py:158). Theta/vega/rho in per-1.0 units."""
    s, k, t, r, q, sigma = (np.asarray(a, dtype=np.float64) for a in (s, k, t, r, q, sigma))
    is_call = np.asarray(is_call, dtype=bool)
    t = np.maximum(t, 1e-12)
    sigma = np.maximum(sigma, 1e-12)
    sq = np.sqrt(t)
    d1 = (np.log(s / k) + (r - q + 0.5 * sigma**2) * t) / (sigma * sq)
    d2 = d1 - sigma * sq
    pdf = norm_pdf(d1)
    delta = np.where(is_call, np.exp(-q * t) * norm_cdf(d1), -np.exp(-q * t) * norm_cdf(-d1))
    gamma = np.exp(-q * t) * pdf / (s * sigma * sq)
    vega = s * np.exp(-q * t) * pdf * sq
    theta_call = (
        -s * np.exp(-q * t) * pdf * sigma / (2 * sq)
        - r * k * np.exp(-r * t) * norm_cdf(d2)
        + q * s * np.exp(-q * t) * norm_cdf(d1)
    )
    theta_put = (
        -s * np.exp(-q * t) * pdf * sigma / (2 * sq)
        + r * k * np.exp(-r * t) * norm_cdf(-d2)
        - q * s * np.exp(-q * t) * norm_cdf(-d1)
    )
    theta = np.where(is_call, theta_call, theta_put)
    rho = np.where(
        is_call, k * t * np.exp(-r * t) * norm_cdf(d2), -k * t * np.exp(-r * t) * norm_cdf(-d2)
    )
    return {
        "delta": delta,
        "gamma": gamma,
        "vega": vega,
        "theta": theta,
        "rho": rho,
        "dollar_delta": delta * s,
    }


# ---------------------------------------------------------------------------
# pandas UDF wrappers (Arrow-batched)
# ---------------------------------------------------------------------------

GREEKS_SCHEMA = T.StructType(
    [
        T.StructField(n, T.DoubleType())
        for n in ("delta", "gamma", "vega", "theta", "rho", "dollar_delta")
    ]
)


@F.pandas_udf(T.DoubleType())
def bs_price_udf(
    s: pd.Series, k: pd.Series, t: pd.Series, r: pd.Series,
    q: pd.Series, sigma: pd.Series, is_call: pd.Series,
) -> pd.Series:
    return pd.Series(bs_price(s, k, t, r, q, sigma, is_call.astype(bool)))


@F.pandas_udf(T.DoubleType())
def bs_iv_udf(
    price: pd.Series, s: pd.Series, k: pd.Series, t: pd.Series,
    r: pd.Series, q: pd.Series, is_call: pd.Series,
) -> pd.Series:
    return pd.Series(bs_iv(price, s, k, t, r, q, is_call.astype(bool)))


@F.pandas_udf(T.DoubleType())
def binomial_iv_udf(
    price: pd.Series, s: pd.Series, k: pd.Series, t: pd.Series,
    r: pd.Series, q: pd.Series, is_call: pd.Series,
) -> pd.Series:
    return pd.Series(binomial_iv(price, s, k, t, r, q, is_call.astype(bool)))


@F.pandas_udf(GREEKS_SCHEMA)
def bs_greeks_udf(
    s: pd.Series, k: pd.Series, t: pd.Series, r: pd.Series,
    q: pd.Series, sigma: pd.Series, is_call: pd.Series,
) -> pd.DataFrame:
    return pd.DataFrame(bs_greeks(s, k, t, r, q, sigma, is_call.astype(bool)))


def resolve_missing_vol(df, iv_col: str, fallback_price_col: str, s, k, t, r, q, is_call):
    """U4 — rows whose IV solved to 0 are re-derived from a fallback price
    (reference: resolve_missing_vol, Organizers.py:172-185). Implemented as
    a conditional recompute + `when` merge — no second pass over good rows'
    Python workers because the UDF input is the same batch."""
    fallback = bs_iv_udf(
        F.col(fallback_price_col), F.col(s), F.col(k), F.col(t), F.col(r), F.col(q), F.col(is_call)
    )
    return df.withColumn(
        iv_col, F.when(F.col(iv_col) <= 0.0, fallback).otherwise(F.col(iv_col))
    )
