"""Vendor-data corrections framework — SURVEY.md §2.13 X5, §2.2 P13.

The reference patches known-bad vendor rows post-hoc with YAML-registered
Python functions (patches/main.py:9-114, patches/p1.py:32-101 removes an
AAPL split-artifact date from list_dates results, applied per-endpoint in
switcher.py:42-43).

Spark-first shape: corrections are DATA, not code — a quarantine dimension
(query_name, symbol, bad_date) anti-joined against results as the final
plan stage. Config stays declarative (a dict/table, like the reference's
setup.yaml); the anti-join broadcasts the tiny dimension so the cost is a
map-side hash probe at any scale.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.session import session_memo

#: Default quarantine entries, mirroring the reference's p1 patch shape:
#: (query_name, symbol, bad_date). The reference's only shipped patch
#: removes 2014-06-09 (AAPL 7:1 split artifact) from AAPL list_dates
#: (patches/p1.py:32-101).
DEFAULT_QUARANTINE: list[tuple[str, str, str]] = [
    ("list_dates", "AAPL", "2014-06-09"),
]

def quarantine_dim(
    spark: SparkSession,
    entries: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Memoized per live session — same rationale as alias.alias_dim
    (weakref session memo, evicted with the session)."""
    use = tuple(entries or DEFAULT_QUARANTINE)

    def build() -> DataFrame:
        rows = [(q, s, dt.date.fromisoformat(d)) for q, s, d in use]
        return spark.createDataFrame(
            rows, "query_name string, symbol string, bad_date date"
        )

    return session_memo(spark, ("quarantine_dim", use), build)


def apply_corrections(
    df: DataFrame,
    quarantine: DataFrame,
    query_name: str,
    symbol_col: str = "symbol",
    date_col: Column | str = "ts",
) -> DataFrame:
    """P13 — drop quarantined (symbol, date) rows for this query via a
    broadcast anti-join (reference behavior: patches/p1.py:66-101,
    symbol-specific and endpoint-specific)."""
    q = F.broadcast(
        quarantine.filter(F.col("query_name") == query_name).select("symbol", "bad_date")
    )
    d = F.to_date(F.col(date_col) if isinstance(date_col, str) else date_col)
    return df.join(
        q,
        (df[symbol_col] == q["symbol"]) & (d == q["bad_date"]),
        "left_anti",
    )
