"""Query registry — the driver-checked operator inventory.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle string over the same parquet tables. The driver hashes
both results order-insensitively with columns sorted by name, so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from financedatabase_spark.plans import (  # noqa: E402,F401
    queries_advanced,
    queries_analytics,
    queries_bars,
    queries_calendar_fallback,
    queries_documents,
    queries_groups,
    queries_joins,
    queries_lifecycle,
    queries_scalar,
    queries_setops_sorts,
    queries_streaming,
    queries_tpch,
)
