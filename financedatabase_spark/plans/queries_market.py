"""Market-microstructure analytics over the events tick stream: VWAP /
TWAP execution benchmarks, running-peak drawdown, and realized
volatility — the portfolio-analytics layer a user of the reference's
Organizers + utils stack computes downstream of the bar pipeline
(reference: dbase Organizers expose OHLCV frames; these are the standard
aggregations run on top of them, expressed Spark-first).

Bit-exactness strategy (same as queries_groups): double sums go through
DECIMAL so partition summation order can't change the result; all other
arithmetic is IEEE-exact (compare/max/sub/div/sqrt on identical
operands), so Spark and DuckDB land on the same bits.

Scale shape: every query is one shuffle on its grouping key (the window
and the aggregate share the (symbol) / (symbol, day) hash partitioning);
no joins, no Python, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table

#: Lossless carrier for 2-decimal prices up to ~1e19 before overflow.
_DEC = "decimal(30,10)"


@register(
    "vwap_daily",
    oracle="""
    WITH t AS (
      SELECT event_type AS symbol, CAST(ts AS DATE) AS trade_date,
             CAST(floor(value * 1e6 + 0.5e0) AS BIGINT) AS price_u,
             (event_id % 7 + 1)::BIGINT AS volume
      FROM events
    )
    SELECT symbol, trade_date,
           CAST(CAST(sum(price_u * volume) AS BIGINT) AS DOUBLE) / 1e6
             / CAST(sum(volume) AS DOUBLE) AS vwap,
           CAST(CAST(sum(price_u) AS BIGINT) AS DOUBLE) / 1e6
             / CAST(count(*) AS DOUBLE) AS twap,
           sum(volume)::BIGINT AS total_volume,
           count(*)::BIGINT AS n_ticks
    FROM t GROUP BY 1, 2
    """,
)
def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily VWAP/TWAP per symbol — the standard execution benchmark pair
    (volume synthesized from event_id as in `volume_bars_activity`).
    One hash aggregate on (symbol, day): partial map-side sums, one
    shuffle, no window. Exact integer micro-price units make the sums
    order-independent AND engine-portable (a double→DECIMAL cast is not:
    see realized_volatility); the final double divisions see identical
    operands on both engines."""
    ev = load_table(spark, sf_dir, "events")
    price_u = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    volume = (F.col("event_id") % 7 + 1).cast("long")
    t = ev.select(
        F.col("event_type").alias("symbol"),
        F.to_date("ts").alias("trade_date"),
        price_u.alias("price_u"),
        volume.alias("volume"),
    )
    return t.groupBy("symbol", "trade_date").agg(
        (
            F.sum(F.col("price_u") * F.col("volume")).cast("double") / F.lit(1e6)
            / F.sum("volume").cast("double")
        ).alias("vwap"),
        (
            F.sum("price_u").cast("double") / F.lit(1e6)
            / F.count("*").cast("double")
        ).alias("twap"),
        F.sum("volume").cast("long").alias("total_volume"),
        F.count("*").alias("n_ticks"),
    )


@register(
    "max_drawdown",
    oracle="""
    WITH c AS (
      SELECT event_type AS symbol, value,
             max(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
      FROM events
    )
    SELECT symbol,
           max(CASE WHEN peak > 0 THEN (peak - value) / peak ELSE 0.0 END)
             AS max_drawdown,
           max(peak) AS peak_value,
           count(*)::BIGINT AS n_ticks
    FROM c GROUP BY 1
    """,
)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per symbol: running peak over the (ts, event_id)
    tick order, per-tick drawdown (peak - value) / peak, max per symbol.
    Every step is IEEE-exact (max picks an input; sub/div of identical
    doubles round identically), so no decimal detour is needed.

    Scale shape: the running-max window and the final aggregate share
    one hash partitioning on symbol — a single shuffle; the window is a
    rank-less running frame so it streams within each partition."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max("value").over(w)
    # The aggregate groups on the window's own partition key (renamed
    # only AFTER the agg), so both stages share one hashpartitioning —
    # a single shuffle end to end (gated in test_plan_quality).
    c = ev.select("event_type", "value", peak.alias("peak"))
    dd = F.when(F.col("peak") > 0, (F.col("peak") - F.col("value")) / F.col("peak")).otherwise(
        F.lit(0.0)
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.max(dd).alias("max_drawdown"),
            F.max("peak").alias("peak_value"),
            F.count("*").alias("n_ticks"),
        )
        .select(
            F.col("event_type").alias("symbol"),
            "max_drawdown",
            "peak_value",
            "n_ticks",
        )
    )


@register(
    "realized_volatility",
    oracle="""
    WITH r AS (
      SELECT event_type AS symbol, CAST(ts AS DATE) AS trade_date,
             CASE WHEN lag(value) OVER w > 0
                  THEN (value - lag(value) OVER w) / lag(value) OVER w
             END AS ret
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT symbol, trade_date,
           sqrt(CAST(CAST(sum(CAST(floor(ret * ret * 1e9 + 0.5e0) AS BIGINT))
                          AS BIGINT) AS DOUBLE) / 1e9)
             AS realized_vol,
           count(ret)::BIGINT AS n_returns
    FROM r GROUP BY 1, 2
    """,
)
def realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily realized volatility per symbol: simple tick-to-tick returns
    (guarded against the zero prices present in the data; the first tick
    of each symbol contributes no return), sum of squares per (symbol,
    day), square root. Returns and their squares are IEEE-exact double
    ops on identical operands; the cross-row SUM runs in exact integer
    1e-9 units — floor(ret²·1e9 + 0.5) is an integral double (< 2^53 for
    any sane ret²·n, documented bound sum(ret²) < 9.2e9 per symbol-day),
    so partition order can't perturb it, and bigint→double is correctly
    rounded by both engines. (A DECIMAL(38,15) cast of the raw double is
    NOT portable: Spark converts via the double's shortest decimal repr,
    DuckDB via its exact binary value — they round scale-15 differently
    on ~20% of real ret² values. The DuckDB side re-casts its sum —
    HUGEINT — back to BIGINT first: int128→double double-rounds past
    2^53, int64→double never does.)

    Scale shape: the lag window partitions on symbol, the aggregate on
    (symbol, day) — the day key is a refinement of the window key, so
    AQE keeps it to the window shuffle plus one local re-hash; no joins,
    no Python."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    ret = F.when(prev > 0, (F.col("value") - prev) / prev)
    # Group on (window key, day): hashpartitioning(event_type) already
    # clusters every (event_type, day) group, so the aggregate reuses
    # the window's shuffle — one exchange end to end (plan-gated).
    r = ev.select(
        "event_type", F.to_date("ts").alias("trade_date"), ret.alias("ret")
    )
    units = F.floor(F.col("ret") * F.col("ret") * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        r.groupBy("event_type", "trade_date")
        .agg(
            F.sqrt(F.sum(units).cast("double") / F.lit(1e9)).alias("realized_vol"),
            F.count("ret").alias("n_returns"),
        )
        .select(
            F.col("event_type").alias("symbol"),
            "trade_date",
            "realized_vol",
            "n_returns",
        )
    )


@register(
    "symbol_correlation",
    oracle="""
    WITH daily AS (
      SELECT event_type AS symbol, CAST(ts AS DATE) AS trade_date,
             CAST(CAST(sum(CAST(floor(value * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 1e6
               / CAST(count(*) AS DOUBLE) AS day_mean
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
             count(*)::BIGINT AS n,
             CAST(CAST(sum(CAST(floor(a.day_mean * 1e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9 AS sx,
             CAST(CAST(sum(CAST(floor(b.day_mean * 1e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9 AS sy,
             CAST(CAST(sum(CAST(floor(a.day_mean * b.day_mean * 1e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9 AS sxy,
             CAST(CAST(sum(CAST(floor(a.day_mean * a.day_mean * 1e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9 AS sxx,
             CAST(CAST(sum(CAST(floor(b.day_mean * b.day_mean * 1e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9 AS syy
      FROM daily a JOIN daily b
        ON a.trade_date = b.trade_date AND a.symbol < b.symbol
      GROUP BY 1, 2
    )
    SELECT symbol_a, symbol_b, n,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
                 AND CAST(n AS DOUBLE) * syy - sy * sy > 0
                THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
                ELSE NULL END AS corr_daily_mean
    FROM pairs
    """,
)
def symbol_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the symbols' daily mean values —
    the cross-sectional co-movement matrix (upper triangle). Built from
    explicit moment sums in exact integer units (floor(x·scale + 0.5) →
    bigint; see realized_volatility for why a double→DECIMAL cast is not
    engine-portable) rather than the engines' corr() aggregates, whose
    internal single-pass accumulations are not bit-portable across
    engines.

    Scale shape: pre-aggregate to (symbol, day) FIRST — the pairwise
    self-join runs on the tiny daily frame (days x symbols rows), never
    on ticks, so its cost is independent of tick count; the moment sums
    are one more hash aggregate on the (symbol, symbol) pair key."""
    ev = load_table(spark, sf_dir, "events")

    def units(c, scale: float = 1e9):
        return F.floor(c * F.lit(scale) + F.lit(0.5)).cast("long")

    daily = (
        ev.groupBy(
            F.col("event_type").alias("symbol"), F.to_date("ts").alias("trade_date")
        )
        .agg(
            (
                F.sum(units(F.col("value"), 1e6)).cast("double") / F.lit(1e6)
                / F.count("*").cast("double")
            ).alias("day_mean")
        )
    )
    a = daily.select(
        F.col("symbol").alias("symbol_a"),
        F.col("trade_date"),
        F.col("day_mean").alias("x"),
    )
    b = daily.select(
        F.col("symbol").alias("symbol_b"),
        F.col("trade_date"),
        F.col("day_mean").alias("y"),
    )
    usum = lambda c: F.sum(units(c)).cast("double") / F.lit(1e9)  # noqa: E731
    pairs = (
        a.join(b, ["trade_date"])
        .filter(F.col("symbol_a") < F.col("symbol_b"))
        .groupBy("symbol_a", "symbol_b")
        .agg(
            F.count("*").alias("n"),
            usum(F.col("x")).alias("sx"),
            usum(F.col("y")).alias("sy"),
            usum(F.col("x") * F.col("y")).alias("sxy"),
            usum(F.col("x") * F.col("x")).alias("sxx"),
            usum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    # Degenerate pairs (n=1, or a zero-variance leg — varx can even round
    # slightly negative since x and x² are quantized independently by the
    # floor(·*1e9 + 0.5) integer-unit accumulators) yield NULL, never
    # NaN/Inf or a sqrt-domain error: same guard in the oracle, mirroring
    # the peak>0 / prev>0 guards elsewhere.
    corr = F.when(
        (varx > F.lit(0.0)) & (vary > F.lit(0.0)),
        (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(varx) * F.sqrt(vary)),
    )
    return pairs.select(
        "symbol_a", "symbol_b", "n", corr.alias("corr_daily_mean")
    )
