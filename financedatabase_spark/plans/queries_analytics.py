"""Option-analytics pipeline queries (SURVEY.md §2.9 U1–U5, §3.3).

The solvers are fixed-iteration (Newton 20 + bisection 60; CRR lattice +
bisection 40), so they ARE reproducible in DuckDB SQL: oracles_analytics
generates CTE chains mirroring the numpy code op-for-op, and both sides
quantize outputs to 6 decimals (engine exp/log differ at the ULP level).
Numerical correctness is additionally asserted in tests/test_analytics.py
by round-trip (price a known sigma, recover it) and put-call parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.functions.analytics import (
    bs_greeks_udf,
    bs_iv_udf,
    binomial_iv_udf,
    resolve_missing_vol,
)
from financedatabase_spark.plans.oracles_analytics import (
    greeks_oracle,
    implied_vol_binomial_oracle,
    implied_vol_bs_oracle,
    risk_pipeline_oracle,
)
from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table


# Module-level pandas-UDF singletons (a per-call @pandas_udf re-pickles
# and re-registers the function on every plan build; the UDF object's
# _judf memo only helps if the object survives across builds).
# steps=32 keeps the DuckDB oracle's recursive-CTE lattice tractable;
# the engine default (steps=64) stays covered by tests/test_analytics.py.
import pandas as _pd  # noqa: E402
from pyspark.sql import types as _T  # noqa: E402

from financedatabase_spark.functions.analytics import (  # noqa: E402
    binomial_iv,
    binomial_price,
)


@F.pandas_udf(_T.DoubleType())
def _binomial32_price_udf(s, k, t, r, q, sigma, is_call):
    return _pd.Series(binomial_price(s, k, t, r, q, sigma, is_call.astype(bool), steps=32))


@F.pandas_udf(_T.DoubleType())
def _binomial32_iv_udf(price, s, k, t, r, q, is_call):
    return _pd.Series(binomial_iv(price, s, k, t, r, q, is_call.astype(bool), steps=32, iters=40))


def _q6(c):
    """6-decimal quantizer used on BOTH engines: floor(x*1e6 + 0.5)/1e6 is
    float-op-identical in Spark and DuckDB, unlike each engine's round().
    Needed because numpy's SIMD exp/log differ from libm at the ULP level,
    which would break the driver's full-precision value-hash."""
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def synthetic_option_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize option rows from `part`: deterministic spot/strike/tenor
    so tests can recover the known true sigma."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lit(100.0).alias("underlier_price"),
        (80.0 + (F.col("p_partkey") % 41)).alias("strike"),
        ((F.col("p_size") % 24 + 1) * 30 / 365.0).alias("tenor_years"),
        F.lit(0.05).alias("rf_rate"),
        F.lit(0.01).alias("div_yield"),
        (F.col("p_partkey") % 2 == 0).alias("is_call"),
        (0.15 + 0.35 * (F.col("p_partkey") % 10) / 10.0).alias("true_sigma"),
    )


@register("implied_vol_bs", oracle=implied_vol_bs_oracle())
def implied_vol_bs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — vectorized Black-Scholes IV (reference: BS_IV row-wise apply,
    Organizers.py:127-135). Price is generated inside the same plan with a
    known sigma; the UDF recovers it. Module-level UDF singletons: a
    per-call `@pandas_udf` re-cloudpickles and re-registers the function
    on every plan build (bench counts build time)."""
    from financedatabase_spark.functions.analytics import bs_price_udf

    rows = synthetic_option_rows(spark, sf_dir)
    priced = rows.withColumn(
        "price",
        bs_price_udf("underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "true_sigma", "is_call"),
    )
    return priced.withColumn(
        "bs_iv",
        bs_iv_udf("price", "underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "is_call"),
    ).select(
        "p_partkey", _q6("price").alias("price"), "true_sigma", _q6("bs_iv").alias("bs_iv")
    )


@register("greeks", oracle=greeks_oracle())
def greeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — BS greeks struct expanded to columns + Dollar_Delta
    (reference: Calculate.greeks multi-column expand, Organizers.py:148-159).
    Struct-returning pandas UDF + `select(g.*)` = the reference's axis=1
    concat (J6) without a join."""
    rows = synthetic_option_rows(spark, sf_dir)
    g = bs_greeks_udf(
        "underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "true_sigma", "is_call"
    )
    return rows.withColumn("g", g).select(
        "p_partkey", "is_call", "true_sigma",
        *[_q6(f"g.{n}").alias(n) for n in ("delta", "gamma", "vega", "theta", "rho", "dollar_delta")],
    )


@register("implied_vol_binomial", oracle=implied_vol_binomial_oracle())
def implied_vol_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — binomial (CRR, American) IV via vectorized bisection
    (reference: Binomial_IV, Organizers.py:138-147). Sampled 1-in-4 to
    keep the lattice work proportionate in the test harness."""
    rows = synthetic_option_rows(spark, sf_dir).filter(F.col("p_partkey") % 4 == 0)
    priced = rows.withColumn(
        "price",
        _binomial32_price_udf("underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "true_sigma", "is_call"),
    )
    return priced.withColumn(
        "binomial_iv",
        _binomial32_iv_udf("price", "underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "is_call"),
    ).select(
        "p_partkey", _q6("price").alias("price"), "true_sigma",
        _q6("binomial_iv").alias("binomial_iv"),
    )


@register("risk_pipeline", oracle=risk_pipeline_oracle())
def risk_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 — the Organizers ETL shape end-to-end: synthesize option rows,
    as-of-style enrichment columns, IV + greeks UDFs, zero-IV fallback
    re-resolution (U4), open-interest left join (J2), inf/NaN scrub (F14).
    """
    from financedatabase_spark.functions.analytics import bs_price_udf
    from financedatabase_spark.functions.columns import scrub_inf_nan

    rows = synthetic_option_rows(spark, sf_dir)
    priced = rows.withColumn(
        "close",
        bs_price_udf("underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "true_sigma", "is_call"),
    ).withColumn("midpoint", F.col("close") * 1.0005)
    with_iv = priced.withColumn(
        "bs_iv",
        bs_iv_udf("close", "underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "is_call"),
    )
    resolved = resolve_missing_vol(
        with_iv, "bs_iv", "midpoint",
        "underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "is_call",
    )
    g = bs_greeks_udf(
        "underlier_price", "strike", "tenor_years", "rf_rate", "div_yield", "bs_iv", "is_call"
    )
    enriched = resolved.withColumn("g", g).select("p_partkey", "close", "bs_iv", "g.*")
    oi = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_partkey") % 997).cast("long").alias("open_interest")
    )
    joined = enriched.join(oi, "p_partkey", "left")
    return joined.select(
        "p_partkey",
        *[_q6(scrub_inf_nan(c)).alias(c)
          for c in ("close", "bs_iv", "delta", "gamma", "vega", "dollar_delta")],
        F.coalesce("open_interest", F.lit(0)).alias("open_interest"),
    )
