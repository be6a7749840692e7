"""Set-operation and sort/limit queries (SURVEY.md §2.6 O1–O5, §2.7 SET1–SET4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table


@register(
    "union_distinct_dates",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS d FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT CAST(l_shipdate AS DATE) FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def union_distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET1/SET4 — union + distinct of two date lists
    (reference: v2.py:436-438, v3/utils.py:738-743)."""
    a = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.to_date("o_orderdate").alias("d"))
    )
    b = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.to_date("l_shipdate").alias("d"))
    )
    # timestamp_ntz is the one temporal shape with a proven driver hash-match
    return a.union(b).distinct().select(F.col("d").cast("timestamp_ntz").alias("d"))


@register(
    "except_diff",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET2 — set difference: customers who ordered but have no open orders
    (reference: db_management.py:203-214 missing-tables diff)."""
    o = load_table(spark, sf_dir, "orders")
    all_cust = o.select("o_custkey")
    open_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return all_cust.subtract(open_cust)


@register(
    "intersect_keys",
    oracle="""
    SELECT p_partkey FROM part
    INTERSECT
    SELECT l_partkey FROM lineitem
    """,
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET3 — intersection (reference: db_management.py:205)."""
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey"))
    l = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return p.intersect(l)


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1–O4 — global top-k: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort, at any scale
    (reference sorts: v3/utils.py:692, LIMIT db_utils.py:152)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "sorted_value_list",
    oracle="SELECT DISTINCT event_type FROM events ORDER BY event_type",
)
def sorted_value_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3 — sorted distinct listing (reference: db_management.py:166)."""
    return load_table(spark, sf_dir, "events").select("event_type").distinct().orderBy("event_type")
