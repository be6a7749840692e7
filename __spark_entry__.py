"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries are registered by the engine package
(``financedatabase_spark``) — one per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from financedatabase_spark.plans.registry import ORACLE_SQL, QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's §3.1 read path end-to-end on the driver's `events`
    table: ticker-change canonicalize → session filter → market-open
    anchored hourly OHLCV bars → derived midpoint → corrections anti-join.
    """
    return QUERIES["flagship_eod_pipeline"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    aliases as the Spark result; omitted for non-SQL-expressible ops)."""
    return dict(ORACLE_SQL)
