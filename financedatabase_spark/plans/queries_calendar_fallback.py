"""Calendar-frequency resamples, source-fallback branch, fan-out scan
(SURVEY.md A1 d/w/b frequencies, X4, S4, S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.operators import calendar as cal
from financedatabase_spark.operators.resample import (
    anchored_label,
    resample,
    resample_calendar,
)
from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.paginated import read_paginated
from financedatabase_spark.sources.readers import load_table

_HOLIDAY_LITERALS = ", ".join(f"DATE '{d}'" for d in cal.US_MARKET_HOLIDAYS)


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").alias("open"),
        F.col("value").alias("high"),
        F.col("value").alias("low"),
        F.col("value").alias("close"),
        F.lit(1).cast("long").alias("volume"),
    )


_DAILY_CTE = """
    SELECT event_type,
           time_bucket(INTERVAL '1 day', ts, TIMESTAMP '1970-01-01') AS ts,
           first(value ORDER BY event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY event_id) AS close,
           count(*)::BIGINT AS volume
    FROM events
    GROUP BY 1, 2
"""


def bars_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 daily frequency with zero-filled gaps (pandas `resample('1d')`
    emits every calendar day; reference fillna(0), utils.py:387-399)."""
    return resample(
        _ticks(spark, sf_dir), "1d", ts_col="ts", key_cols=["event_type"],
        order_cols=["event_id"], fill_gaps=True,
    )


def bars_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 weekly frequency — 7-day tumbling windows, epoch-aligned in both
    engines (DuckDB's default origin is 2000-01-03, so the oracle pins
    1970-01-01 explicitly)."""
    return resample(
        _ticks(spark, sf_dir), "1w", ts_col="ts", key_cols=["event_type"],
        order_cols=["event_id"], fill_gaps=False,
    )


@register(
    "bars_business_daily",
    oracle=f"""
    SELECT event_type,
           time_bucket(INTERVAL '1 day', ts, TIMESTAMP '1970-01-01') AS ts,
           first(value ORDER BY event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY event_id) AS close,
           count(*)::BIGINT AS volume
    FROM events
    WHERE isodow(ts) <= 5 AND CAST(ts AS DATE) NOT IN ({_HOLIDAY_LITERALS})
    GROUP BY 1, 2
    """,
)
def bars_business_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 'B' (business-day) frequency alias: session-day filter before the
    daily aggregation (reference freq aliases utils.py:349-357 + holiday
    set dbase/utils.py:52-68)."""
    ticks = cal.filter_business_days(_ticks(spark, sf_dir), "ts")
    return resample(
        ticks, "1b", ts_col="ts", key_cols=["event_type"],
        order_cols=["event_id"], fill_gaps=False,
    )


@register(
    "eod_with_quote_fallback",
    oracle=f"""
    WITH eod AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 day', ts, TIMESTAMP '1970-01-01') AS ts,
             first(value ORDER BY event_id) AS open,
             max(value) AS high,
             min(value) AS low,
             last(value ORDER BY event_id) AS close,
             count(*)::BIGINT AS volume
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    quotes AS (
      SELECT 'purchase' AS event_type,
             time_bucket(INTERVAL '1 day', ts, TIMESTAMP '1970-01-01') AS ts,
             last(value ORDER BY event_id) AS q_close
      FROM events
      GROUP BY 2
    )
    SELECT * FROM eod
    UNION ALL
    SELECT q.event_type, q.ts, q.q_close AS open, q.q_close AS high,
           q.q_close AS low, q.q_close AS close, NULL::BIGINT AS volume
    FROM quotes q
    WHERE NOT EXISTS (SELECT 1 FROM eod e WHERE e.ts = q.ts)
    """,
)
def eod_with_quote_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — quote→EOD fallback branch: days missing from the primary EOD
    source are synthesized from 1d-resampled quotes with Volume=NULL
    (reference: v2.py:239-335 ThetaDataParseError fallback; quote-derived
    EOD has NaN volume, v2.py:333-335). Declarative coalesce-of-sources:
    primary ∪ (reshaped fallback anti-join primary)."""
    eod = resample(
        _ticks(spark, sf_dir).filter(F.col("event_type") == "purchase"),
        "1d", ts_col="ts", key_cols=["event_type"], order_cols=["event_id"],
        fill_gaps=False,
    )
    quotes = resample(
        load_table(spark, sf_dir, "events").select(
            "ts", "event_id", F.col("value").alias("q_close")
        ),
        "1d", ts_col="ts", key_cols=[], order_cols=["event_id"],
        agg_overrides={"q_close": "last"}, fill_gaps=False,
    ).withColumn("event_type", F.lit("purchase"))
    fallback = quotes.join(eod.select("ts"), "ts", "left_anti").select(
        "event_type",
        "ts",
        F.col("q_close").alias("open"),
        F.col("q_close").alias("high"),
        F.col("q_close").alias("low"),
        F.col("q_close").alias("close"),
        F.lit(None).cast("long").alias("volume"),
    )
    return eod.unionByName(fallback)


@register(
    "business_day_scan",
    oracle=f"""
    WITH days AS (
      SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL '1 day'))::DATE AS date
    ),
    bus AS (
      SELECT date FROM days
      WHERE isodow(date) <= 5 AND date NOT IN ({_HOLIDAY_LITERALS})
    ),
    counts AS (
      SELECT CAST(ts AS DATE) AS date, count(*)::BIGINT AS n_events
      FROM events GROUP BY 1
    )
    SELECT b.date, coalesce(c.n_events, 0) AS n_events
    FROM bus b LEFT JOIN counts c ON b.date = c.date
    """,
)
def business_day_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/P6 — the reference's per-business-day thread-pool fan-out
    (v3/utils.py:444-503) as a date-dimension scaffold: business days of
    the window left-joined with per-day results; executor parallelism
    replaces the thread pool."""
    days = cal.business_day_range(spark, "2024-01-01", "2024-01-31")
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(F.count("*").alias("n_events"))
    )
    return days.join(counts, "date", "left").select(
        F.col("date").cast("timestamp_ntz").alias("date"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


#: Deterministic fake pages for the S6 contract-listing source (stands in
#: for the Alpaca next_page_token API; shape = FIXTURES.md T7).
_FAKE_PAGES = {
    None: ([{"symbol": "AAPL", "strike": 180.0 + i, "right": "C"} for i in range(4)], "p1"),
    "p1": ([{"symbol": "AAPL", "strike": 190.0 + i, "right": "P"} for i in range(4)], "p2"),
    "p2": ([{"symbol": "MSFT", "strike": 400.0 + i, "right": "C"} for i in range(3)], None),
}


@register(
    "paginated_contracts",
    oracle="""
    SELECT 'AAPL' AS symbol, 180.0 + i AS strike, 'C' AS right_ FROM generate_series(0, 3) AS t(i)
    UNION ALL
    SELECT 'AAPL', 190.0 + i, 'P' FROM generate_series(0, 3) AS t(i)
    UNION ALL
    SELECT 'MSFT', 400.0 + i, 'C' FROM generate_series(0, 2) AS t(i)
    """,
)
def paginated_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — next-page-token REST scan drained into a DataFrame
    (reference: Alpaca get_option_contracts_all, Alpaca.py:553-583). The
    fetcher here is a deterministic fake standing in for HTTP."""
    df = read_paginated(
        spark,
        lambda token: _FAKE_PAGES[token],
        "symbol string, strike double, right string",
    )
    return df.select("symbol", "strike", F.col("right").alias("right_"))


@register(
    "rest_datasource_scan",
    oracle="""
    SELECT p_partkey, p_brand, p_size, p_type
    FROM part
    WHERE p_brand IN ('Brand#13', 'Brand#42') AND p_size >= 25
    """,
)
def rest_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 as a planned scan — the Python DataSourceV2
    (sources/restds.py) with real ``pushFilters`` pushdown, replacing
    the reference's driver-side pagination loop (Alpaca.py:486-517).
    The IN predicate on the partition axis (p_brand) prunes the key
    partitions before any fetch — 2 of 25 brand partitions survive
    planning; the p_size range predicate is returned unsupported and
    re-applied by Spark above the scan."""
    from financedatabase_spark.sources.restds import FORMAT_NAME, register_rest_catalog

    register_rest_catalog(spark)
    catalog = (
        spark.read.format(FORMAT_NAME)
        .option("path", f"{sf_dir}/part.parquet")
        .option("partition_col", "p_brand")
        .load()
    )
    return catalog.filter(
        F.col("p_brand").isin("Brand#13", "Brand#42") & (F.col("p_size") >= 25)
    ).select("p_partkey", "p_brand", "p_size", "p_type")


def bars_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 calendar-month frequency (reference freq aliases BME/BQE/BYS,
    utils.py:349-357). Months are variable-length, so the bucket is
    `date_trunc('month')` in the groupBy rather than a fixed-duration
    `window()` — same single-shuffle HashAggregate plan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("month", F.col("ts")).cast("timestamp_ntz").alias("ts"),
        )
        .agg(
            F.min_by("value", F.col("event_id")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("event_id")).alias("close"),
            F.count("*").alias("volume"),
        )
    )


@register(
    "bars_calendar_grains",
    oracle=f"""
    WITH bars AS ({_DAILY_CTE}),
    spans AS (SELECT event_type, min(ts) AS lo, max(ts) AS hi FROM bars GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL '1 day')) AS ts FROM spans),
    daily AS (
      SELECT '1d' AS grain, g.event_type, g.ts,
             coalesce(b.open, 0) AS open, coalesce(b.high, 0) AS high,
             coalesce(b.low, 0) AS low, coalesce(b.close, 0) AS close,
             coalesce(b.volume, 0) AS volume
      FROM grid g LEFT JOIN bars b ON g.event_type = b.event_type AND g.ts = b.ts
    ),
    weekly AS (
      SELECT '1w' AS grain, event_type,
             time_bucket(INTERVAL '7 days', ts, TIMESTAMP '1970-01-01') AS ts,
             first(value ORDER BY event_id) AS open,
             max(value) AS high,
             min(value) AS low,
             last(value ORDER BY event_id) AS close,
             count(*)::BIGINT AS volume
      FROM events
      GROUP BY 2, 3
    ),
    monthly AS (
      SELECT '1mo' AS grain, event_type,
             date_trunc('month', ts) AS ts,
             first(value ORDER BY event_id) AS open,
             max(value) AS high,
             min(value) AS low,
             last(value ORDER BY event_id) AS close,
             count(*)::BIGINT AS volume
      FROM events
      GROUP BY 2, 3
    )
    SELECT * FROM daily UNION ALL SELECT * FROM weekly UNION ALL SELECT * FROM monthly
    """,
)
def bars_calendar_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 calendar frequencies in one driver row: daily with zero-filled
    gaps, epoch-aligned weekly, and variable-length calendar months
    (reference freq aliases utils.py:349-357, fillna utils.py:387-399).
    Each grain is its own single-shuffle aggregate; the union is
    shuffle-free (consolidated from the r1 bars_daily / bars_weekly /
    bars_monthly registrations to fit the driver's 50-query check budget).
    """
    daily = bars_daily(spark, sf_dir).select(F.lit("1d").alias("grain"), "*")
    weekly = bars_weekly(spark, sf_dir).select(F.lit("1w").alias("grain"), "*")
    monthly = bars_monthly(spark, sf_dir).select(F.lit("1mo").alias("grain"), "*")
    return daily.unionByName(weekly).unionByName(monthly)


def _sql_lwd(e: str) -> str:
    """DuckDB CASE for the last Mon-Fri day on-or-before date expr ``e``."""
    return (
        f"CASE WHEN isodow({e}) = 6 THEN {e} - 1 "
        f"WHEN isodow({e}) = 7 THEN {e} - 2 ELSE {e} END"
    )


def _sql_fwd(e: str) -> str:
    """DuckDB CASE for the first Mon-Fri day on-or-after date expr ``e``."""
    return (
        f"CASE WHEN isodow({e}) = 6 THEN {e} + 2 "
        f"WHEN isodow({e}) = 7 THEN {e} + 1 ELSE {e} END"
    )


_ANCHORED_BAR_SELECT = """
  SELECT '{grain}' AS grain, event_type, CAST({lab} AS TIMESTAMP) AS ts,
         first(value ORDER BY event_id) AS open,
         max(value) AS high,
         min(value) AS low,
         last(value ORDER BY event_id) AS close,
         count(*)::BIGINT AS volume
  FROM lab GROUP BY 2, 3
"""


@register(
    "bars_anchored_grains",
    oracle=f"""
    WITH base AS (
      SELECT event_type, event_id, value, CAST(ts AS DATE) AS d FROM events
    ),
    pre AS (
      SELECT event_type, event_id, value, d,
             last_day(d) AS me1,
             last_day(CAST(d + INTERVAL 1 MONTH AS DATE)) AS me2,
             last_day(CAST(date_trunc('quarter', d) + INTERVAL 2 MONTH AS DATE)) AS qe1,
             last_day(CAST(date_trunc('quarter', d) + INTERVAL 5 MONTH AS DATE)) AS qe2,
             CAST(date_trunc('year', d) AS DATE) AS ys1,
             CAST(date_trunc('year', d) - INTERVAL 12 MONTH AS DATE) AS ys0
      FROM base
    ),
    lab AS (
      SELECT event_type, event_id, value,
             d + CAST((5 - isodow(d) + 7) % 7 AS INTEGER) AS wfri,
             CASE WHEN d > {_sql_lwd('me1')} THEN {_sql_lwd('me2')}
                  ELSE {_sql_lwd('me1')} END AS bme,
             CASE WHEN d > {_sql_lwd('qe1')} THEN {_sql_lwd('qe2')}
                  ELSE {_sql_lwd('qe1')} END AS bqe,
             CASE WHEN d < {_sql_fwd('ys1')} THEN {_sql_fwd('ys0')}
                  ELSE {_sql_fwd('ys1')} END AS bys
      FROM pre
    )
    {_ANCHORED_BAR_SELECT.format(grain='w-fri', lab='wfri')}
    UNION ALL {_ANCHORED_BAR_SELECT.format(grain='bme', lab='bme')}
    UNION ALL {_ANCHORED_BAR_SELECT.format(grain='bqe', lab='bqe')}
    UNION ALL {_ANCHORED_BAR_SELECT.format(grain='bys', lab='bys')}
    """,
)
def bars_anchored_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 anchored calendar frequencies — the reference's remaining pandas
    freq aliases W-FRI / BME / BQE / BYS (TIMEFRAME_MAP, utils.py:349-357):
    Friday-anchored weeks, business month/quarter ends (closed-right with
    the pandas roll into the next bin past the anchor), business year
    start (closed-left). Labels are pure built-in date arithmetic
    (operators/resample.anchored_label, pandas-verified); each grain is
    one single-shuffle HashAggregate and the union adds no shuffle."""
    ticks = _ticks(spark, sf_dir)
    parts = [
        resample_calendar(
            ticks,
            anchored_label(F.col("ts"), g),
            ts_col="ts",
            key_cols=["event_type"],
            order_cols=["event_id"],
        ).select(F.lit(g).alias("grain"), "*")
        for g in ("w-fri", "bme", "bqe", "bys")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
