"""Advanced relational coverage: semi/anti joins, rollup/cube grouping,
skew-safe aggregation (SURVEY §2.4 note: "grouping sets/cube/rollup …
Spark provides these free if we extend" — extended here, oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.operators.skew import salted_agg
from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table

# Money columns in the testdata carry exactly 2 decimals, so scale 2 is
# LOSSLESS — and it keeps the unscaled sum far below 2^53. At scale 8 the
# grand-total rollup row reaches ~1e18 unscaled, where DuckDB's
# decimal->double (int128 -> double, then divide) double-rounds and lands
# one ulp away from Java BigDecimal's correctly-rounded conversion — a
# bit-mismatch that only appears at sf0.1+ (caught by the sf0.1 parity
# sweep in r4).
_DEC = "decimal(30,2)"


@register(
    "semi_join_exists",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    """,
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): orders having at least one returned line.
    Semi joins never multiply rows — one shuffle on the key, early-out on
    first match."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )


@register(
    "anti_join_not_exists",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    )
    """,
)
def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): orders fully shipped before 1997."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1997-01-01")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base,
           count(*)::BIGINT AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping — subtotal hierarchy in one pass (Spark expands to
    grouping sets inside a single shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base"),
        F.count("*").alias("n"),
    )


@register(
    "cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping — all dimension combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty")
    )


@register(
    "salted_hot_key_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           count(*)::BIGINT AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: partial per (key, salt) then final
    per key — the explicit rewrite for pathological key skew that AQE's
    skew-join handling doesn't cover (it only splits joins). Result is
    identical to the direct groupBy; decimal sums keep it bit-exact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast(_DEC).alias("qty"), F.lit(1).alias("one")
    )
    out = salted_agg(li, ["l_returnflag"], {"qty": "sum", "one": "count"}, buckets=16)
    return out.select(
        "l_returnflag",
        F.col("qty").cast("double").alias("sum_qty"),
        F.col("one").cast("long").alias("n"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE) AS open_total,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE) AS filled_total,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE) AS partial_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — wide conditional aggregation (one shuffle; Spark's pivot
    compiles to the same CASE-per-value aggregate as the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)))
    )
    return piv.select(
        "o_orderpriority",
        F.col("O").cast("double").alias("open_total"),
        F.col("F").cast("double").alias("filled_total"),
        F.col("P").cast("double").alias("partial_total"),
    )


@register(
    "window_rank_lag",
    oracle="""
    SELECT user_id, ts, value,
           rank() OVER w AS rnk,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - coalesce(lag(value) OVER w, value) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows beyond the reference's surface (SURVEY §2.5 notes
    the reference never uses rank/lag/lead — free in Spark): per-user
    event ranking and tick-to-tick deltas in one window pass."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "ts",
        "value",
        F.rank().over(w).alias("rnk"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value"))).alias("delta"),
    )
