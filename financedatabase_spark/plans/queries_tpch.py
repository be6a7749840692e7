"""TPC-H-flavor headline queries — the bench workload.

These exercise the engine's bread and butter at scale: pushdown filters,
broadcast + shuffle joins, hash aggregation. Money sums are exact and
order-independent so results are bit-identical to the oracle regardless
of partition summation order, then cast to DOUBLE for output.

Exactness via INTEGER CENTS, not per-row decimals: the money columns
are 2-decimal values stored as doubles, so `round(x*100)` recovers the
exact cent count (the double sits within 5e-13 of x.xx, far inside the
half-cent rounding window). Long sums stay in whole-stage codegen's
integer fast path — measured 2x over per-row decimal casts + (38,12)
decimal multiplies at sf0.1 — and one exact decimal division at the end
reproduces the oracle's decimal-sum→double bits. Range: the scale-4
revenue units fit int64 up to ~9.2e14 dollars, LARGER than the
queries' own DECIMAL(18,4) output cap (~1e14), so the integer path
overflows no earlier than the declared result type itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table


def _cents(c: str) -> Column:
    """Exact integer cents of a 2-decimal money value stored as double."""
    return F.round(F.col(c) * 100).cast("long")


def _scaled_double(sum_col: Column, denom: int) -> Column:
    """Exact-integer sum → DOUBLE through an exact decimal division (a
    double divide would re-round and can land 1 ulp off the oracle's
    decimal→double conversion)."""
    return (sum_col.cast("decimal(38,0)") / denom).cast("double")


def _revenue_units(price_col: str, disc_col: str) -> Column:
    """price·(1−discount) in exact 1e-4 units: cents × (100 − cents)."""
    return _cents(price_col) * (100 - _cents(disc_col))


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — scan-side filter pushdown + hash aggregation;
    money sums as exact integer cents (see module docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _scaled_double(F.sum(_cents("l_quantity")), 100).alias("sum_qty"),
            _scaled_double(F.sum(_cents("l_extendedprice")), 100).alias("sum_base_price"),
            (F.sum(_revenue_units("l_extendedprice", "l_discount")).cast("decimal(38,0)") / 10000)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "revenue_forecast",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — pure pushdown-filter + single-row aggregate;
    price·discount in exact 1e-4 units (cents × cents)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        ).agg(
            (F.sum(_cents("l_extendedprice") * _cents("l_discount")).cast("decimal(38,0)") / 10000)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "segment_revenue",
    oracle="""
    SELECT c_mktsegment, n_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           count(DISTINCT o_orderkey)::BIGINT AS n_orders
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c_mktsegment, n_name
    """,
)
def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3/Q5 shape — star join: nation & customer broadcast, the
    orders⋈lineitem shuffle keys on orderkey; revenue in exact integer
    1e-4 units (long sums are associative, so the sum-of-per-order-sums
    is bit-identical to the flat sum; the final exact decimal division
    converts to the same double as the oracle's decimal path)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1996-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem")
    # Pre-aggregate lineitem to one row per orderkey BEFORE the join:
    # the map-side partial combine compresses 4 line items per order into
    # one shuffled row, the orders join then lands on the same orderkey
    # partitioning, and — because each surviving row IS a distinct order —
    # n_orders becomes a plain count(*), eliminating the second wide
    # shuffle a count(DISTINCT o_orderkey) re-aggregation would need over
    # the full joined fact.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(_revenue_units("l_extendedprice", "l_discount")).alias("_rev")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(
            (F.sum("_rev").cast("decimal(38,0)") / 10000)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(18,4))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-06-01'
      AND l_shipdate > TIMESTAMP '1996-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the unshipped-orders revenue top-10: segment-
    filtered customers broadcast into orders, orders⋈lineitem shuffles on
    the orderkey, per-order revenue in exact decimal, then a top-k that
    must compile to TakeOrderedAndProject (never a global sort).
    l_orderkey is unique per group, so the (revenue, date, key) ordering
    is a total order and LIMIT 10 is deterministic across engines."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1996-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1996-06-01"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (F.sum(_revenue_units("l_extendedprice", "l_discount")).cast("decimal(38,0)") / 10000)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )
