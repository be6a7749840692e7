"""Market-calendar semantics (SURVEY.md §4 custom-semantics item 1).

The reference enforces the US equity session with pandas index tricks:
`enforce_bus_hours` keeps rows between MARKET_OPEN and MARKET_CLOSE
(reference: dbase/utils.py:39-49), and `bus_range` generates business days
minus a HOLIDAY_SET (dbase/utils.py:52-68, v3/utils.py:469-470).

Spark-first shape: the session filter is a pure column predicate (codegen'd,
pushdown-friendly); holidays are a tiny dimension broadcast-anti-joined, so
at 100 TB the holiday check costs one broadcast hash lookup per row and the
session filter prunes at the scan when data is time-partitioned.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.functions.columns import MARKET_CLOSE_MINUTES, MARKET_OPEN_MINUTES

#: Built-in NYSE full-day holidays (public exchange calendar), 2020-2026.
#: The reference ships a hardcoded HOLIDAY_SET the same way; callers can
#: pass their own dimension to any function below.
US_MARKET_HOLIDAYS: tuple[str, ...] = (
    "2020-01-01", "2020-01-20", "2020-02-17", "2020-04-10", "2020-05-25",
    "2020-07-03", "2020-09-07", "2020-11-26", "2020-12-25",
    "2021-01-01", "2021-01-18", "2021-02-15", "2021-04-02", "2021-05-31",
    "2021-07-05", "2021-09-06", "2021-11-25", "2021-12-24",
    "2022-01-17", "2022-02-21", "2022-04-15", "2022-05-30", "2022-06-20",
    "2022-07-04", "2022-09-05", "2022-11-24", "2022-12-26",
    "2023-01-02", "2023-01-16", "2023-02-20", "2023-04-07", "2023-05-29",
    "2023-06-19", "2023-07-04", "2023-09-04", "2023-11-23", "2023-12-25",
    "2024-01-01", "2024-01-15", "2024-02-19", "2024-03-29", "2024-05-27",
    "2024-06-19", "2024-07-04", "2024-09-02", "2024-11-28", "2024-12-25",
    "2025-01-01", "2025-01-20", "2025-02-17", "2025-04-18", "2025-05-26",
    "2025-06-19", "2025-07-04", "2025-09-01", "2025-11-27", "2025-12-25",
    "2026-01-01", "2026-01-19", "2026-02-16", "2026-04-03", "2026-05-25",
    "2026-06-19", "2026-07-03", "2026-09-07", "2026-11-26", "2026-12-25",
)


def session_minutes(ts: Column | str) -> Column:
    """Minutes-since-midnight of a timestamp."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.hour(c) * 60 + F.minute(c)


def in_business_hours(
    ts: Column | str,
    open_minutes: int = MARKET_OPEN_MINUTES,
    close_minutes: int = MARKET_CLOSE_MINUTES,
) -> Column:
    """P5 — predicate: time-of-day within [09:30, 16:00] inclusive.

    Reference: dbase/utils.py:39-49 `enforce_bus_hours`
    (`indexer_between_time(MARKET_OPEN, MARKET_CLOSE)` — inclusive bounds).
    """
    m = session_minutes(ts)
    return (m >= open_minutes) & (m <= close_minutes)


def enforce_business_hours(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Keep only in-session rows (applied after resampling in the reference,
    v2.py:765, utils.py:392-399)."""
    return df.filter(in_business_hours(ts_col))


def holiday_dim(spark: SparkSession, holidays: tuple[str, ...] = US_MARKET_HOLIDAYS) -> DataFrame:
    """Holiday dimension table — one `holiday_date` column (memoized
    VALUES LocalRelation: broadcasts with no Python->JVM job)."""
    from financedatabase_spark.session import session_memo, values_dim

    def build() -> DataFrame:
        rows = [(dt.date.fromisoformat(d),) for d in holidays]
        return values_dim(spark, rows, "holiday_date date")

    return session_memo(spark, ("holiday_dim", tuple(holidays)), build)


def is_weekday(d: Column | str) -> Column:
    """Mon-Fri predicate. Spark dayofweek: 1=Sunday … 7=Saturday."""
    c = F.col(d) if isinstance(d, str) else d
    return ~F.dayofweek(c).isin(1, 7)


def filter_business_days(
    df: DataFrame,
    ts_col: str = "ts",
    holidays: DataFrame | None = None,
) -> DataFrame:
    """P6 — drop weekends and holiday dates.

    Reference: dbase/utils.py:52-68 `bus_range` (freq='1b' minus
    HOLIDAY_SET). The holiday dim is broadcast — an anti-join against a
    ~100-row table is a map-side hash probe, no shuffle, at any scale.
    """
    out = df.filter(is_weekday(ts_col))
    if holidays is None:
        holidays = holiday_dim(df.sparkSession)
    return out.join(
        F.broadcast(holidays),
        F.to_date(F.col(ts_col)) == F.col("holiday_date"),
        "left_anti",
    )


def business_day_range(
    spark: SparkSession,
    start: str,
    end: str,
    holidays: DataFrame | None = None,
) -> DataFrame:
    """S4's date fan-out as a DataFrame: every business day in [start, end].

    Reference: v3/utils.py:469-489 builds this list on the driver and runs
    one HTTP request per date in a thread pool; here it's a distributed
    single-column frame (`sequence` + explode) usable as a join scaffold.
    """
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date")
    )
    days = days.filter(is_weekday("date"))
    if holidays is None:
        holidays = holiday_dim(spark)
    return days.join(F.broadcast(holidays), days.date == holidays.holiday_date, "left_anti")
