"""Flagship resample queries (SURVEY.md §2.4 A1/A2, §3.1 read path).

The driver's `events` table stands in for the reference's tick/quote
time-series (FIXTURES.md mapping): `value` is the traded price, bars are
derived per `event_type` (the contract key) exactly like the reference's
`resample` (utils.py:303-399).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.operators.resample import resample
from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table


def _event_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").alias("open"),
        F.col("value").alias("high"),
        F.col("value").alias("low"),
        F.col("value").alias("close"),
        F.lit(1).cast("long").alias("volume"),
    )


_BARS_CTE = """
    SELECT event_type,
           time_bucket(INTERVAL '5 minutes', ts) AS ts,
           first(value ORDER BY event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY event_id) AS close,
           count(*)::BIGINT AS volume
    FROM events
    GROUP BY 1, 2
"""


@register(
    "bars_5m",
    oracle=f"SELECT * FROM ({_BARS_CTE})",
)
def bars_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — keyed 5-minute OHLCV bars, no gap fill.

    One shuffle on (event_type, bucket); first/last are min_by/max_by with a
    deterministic arrival-order (event_id) tie-break.
    """
    return resample(
        _event_ticks(spark, sf_dir),
        "5m",
        ts_col="ts",
        key_cols=["event_type"],
        order_cols=["event_id"],
        fill_gaps=False,
    )


@register(
    "bars_5m_gapfill",
    oracle=f"""
    WITH bars AS ({_BARS_CTE}),
    spans AS (SELECT event_type, min(ts) AS lo, max(ts) AS hi FROM bars GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL '5 minutes')) AS ts
      FROM spans
    )
    SELECT g.event_type, g.ts,
           coalesce(b.open, 0)   AS open,
           coalesce(b.high, 0)   AS high,
           coalesce(b.low, 0)    AS low,
           coalesce(b.close, 0)  AS close,
           coalesce(b.volume, 0) AS volume
    FROM grid g LEFT JOIN bars b ON g.event_type = b.event_type AND g.ts = b.ts
    """,
)
def bars_5m_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 with reference gap semantics: every bucket in each key's span is
    emitted and empty buckets are zero-filled (utils.py:387-399)."""
    return resample(
        _event_ticks(spark, sf_dir),
        "5m",
        ts_col="ts",
        key_cols=["event_type"],
        order_cols=["event_id"],
        fill_gaps=True,
    )


@register(
    "bars_1h_anchored",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '2000-01-03 09:30:00') AS ts,
           first(value ORDER BY event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY event_id) AS close,
           count(*)::BIGINT AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def bars_1h_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 origin anchoring — hourly buckets aligned to the 09:30 market open
    (reference: utils.py:396 ``origin=MARKET_OPEN_TIME``), so buckets run
    09:30-10:30, 10:30-11:30, … instead of top-of-hour."""
    return resample(
        _event_ticks(spark, sf_dir),
        "1h",
        ts_col="ts",
        key_cols=["event_type"],
        order_cols=["event_id"],
        fill_gaps=False,
    )


@register(
    "flagship_eod_pipeline",
    oracle="""
    WITH aliases(current_symbol, old_symbol, change_date) AS (
      VALUES ('click', 'view', DATE '2024-01-15')
    ),
    canon AS (
      SELECT e.event_id, e.ts,
             coalesce(a.current_symbol, e.event_type) AS symbol,
             e.value
      FROM events e
      LEFT JOIN aliases a
        ON e.event_type = a.old_symbol AND CAST(e.ts AS DATE) < a.change_date
    ),
    sess AS (
      SELECT * FROM canon
      WHERE (hour(ts) * 60 + minute(ts)) BETWEEN 570 AND 960
        AND isodow(ts) <= 5
    ),
    bars AS (
      SELECT symbol,
             time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '2000-01-03 09:30:00') AS ts,
             first(value ORDER BY event_id) AS open,
             max(value) AS high,
             min(value) AS low,
             last(value ORDER BY event_id) AS close,
             count(*)::BIGINT AS volume,
             (first(value ORDER BY event_id) + last(value ORDER BY event_id)) / 2 AS midpoint
      FROM sess
      GROUP BY 1, 2
    ),
    quarantine(symbol, bad_date) AS (VALUES ('click', DATE '2024-01-22'))
    SELECT b.* FROM bars b
    WHERE NOT EXISTS (
      SELECT 1 FROM quarantine q
      WHERE b.symbol = q.symbol AND CAST(b.ts AS DATE) = q.bad_date
    )
    """,
)
def flagship_eod_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.1 end-to-end: scan → ticker-change canonicalize (X1) →
    session filter (P5/P6 weekday part) → market-open-anchored hourly bars
    (A1) → derived midpoint (F1) → corrections anti-join (X5). One lazy
    plan; Catalyst fuses the scalar stages into the scan and the whole
    thing costs one shuffle on (symbol, bucket) plus two broadcast dims."""
    from financedatabase_spark.operators.alias import alias_dim, canonicalize_symbols
    from financedatabase_spark.operators.calendar import in_business_hours, is_weekday
    from financedatabase_spark.operators.corrections import apply_corrections, quarantine_dim

    # selectExpr over per-column Column ops: one py4j round-trip per
    # projection instead of ~16 — the driver-side plan build is a
    # measurable slice of this query's wall time (SCALE.md r7 floor notes)
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id", "ts", "event_type AS symbol", "value"
    )
    canon = canonicalize_symbols(
        ev, alias_dim(spark, [("click", "view", "2024-01-15")]), "symbol", "ts"
    )
    sess = canon.filter(in_business_hours("ts") & is_weekday("ts"))
    ticks = sess.selectExpr(
        "symbol", "ts", "event_id",
        "value AS open", "value AS high", "value AS low", "value AS close",
        "CAST(1 AS BIGINT) AS volume",
    )
    bars = resample(
        ticks, "1h", ts_col="ts", key_cols=["symbol"], order_cols=["event_id"],
        fill_gaps=False,
    ).selectExpr("*", "(open + close) / 2 AS midpoint")
    q = quarantine_dim(spark, [("flagship", "click", "2024-01-22")])
    return apply_corrections(bars, q, "flagship", symbol_col="symbol", date_col="ts")


@register(
    "volume_bars_activity",
    oracle="""
    WITH t AS (
      SELECT event_type, ts, event_id, value AS price,
             (event_id % 7 + 1)::BIGINT AS volume
      FROM events
    ),
    c AS (
      SELECT *,
             sum(volume) OVER (PARTITION BY event_type ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT event_type,
           CAST(floor((cum - volume) / 200.0) AS BIGINT) AS bar_idx,
           min(ts) AS bar_start, max(ts) AS bar_end,
           first(price ORDER BY event_id) AS open,
           max(price) AS high, min(price) AS low,
           last(price ORDER BY event_id) AS close,
           sum(volume)::BIGINT AS volume,
           count(*)::BIGINT AS n_ticks
    FROM c GROUP BY 1, 2
    """,
)
def volume_bars_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume bars over the events stream: activity-clock bars closing
    every 200 units of (synthetic) volume — the data-driven boundary
    variant of the A1/A2 resample family (operators/resample.volume_bars).
    One window prefix-sum plus one aggregate, sharing a single hash
    partitioning on the key."""
    from financedatabase_spark.operators.resample import volume_bars

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").alias("price"),
        (F.col("event_id") % 7 + 1).cast("long").alias("volume"),
    )
    return volume_bars(
        ev, 200.0, ["event_type"], price_col="price", order_col="event_id"
    )


@register(
    "dollar_bars_activity",
    oracle="""
    WITH t AS (
      SELECT event_type, ts, event_id, value AS price,
             CAST(CAST(value AS DECIMAL(18,4))
                  * ((event_id % 7 + 1)::BIGINT) AS DECIMAL(18,4)) AS dollars
      FROM events
    ),
    c AS (
      SELECT *,
             sum(dollars) OVER (PARTITION BY event_type ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    b AS (
      SELECT *,
             CAST(floor(CAST(cum - dollars AS DOUBLE) / 20000.0) AS BIGINT)
               AS bar_idx
      FROM c
    )
    SELECT event_type, bar_idx,
           min(ts) AS bar_start, max(ts) AS bar_end,
           first(price ORDER BY event_id) AS open,
           max(price) AS high, min(price) AS low,
           last(price ORDER BY event_id) AS close,
           CAST(CAST(sum(dollars) AS DECIMAL(18,4)) AS DOUBLE) AS dollar_value,
           count(*)::BIGINT AS n_ticks
    FROM b GROUP BY 1, 2
    """,
)
def dollar_bars_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dollar bars over the events stream: bars close every 20k units of
    traded value (price x synthetic size) — López de Prado's value-clock
    variant of `volume_bars_activity` (operators/resample.dollar_bars).

    Cross-engine determinism: per-tick dollars are quantized into
    DECIMAL(18,4) (events.value carries 2 decimals, so the product with
    an integer size is exact), making the running prefix-sum and the
    per-bar total exact on both engines; only the final already-exact
    decimal is cast to DOUBLE via the int64-backed DECIMAL(18,4) hop.
    """
    from financedatabase_spark.operators.resample import dollar_bars

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").alias("price"),
        (F.col("event_id") % 7 + 1).cast("long").alias("size"),
    ).withColumn(
        "dollars_q",
        (F.col("price").cast("decimal(18,4)") * F.col("size")).cast("decimal(18,4)"),
    )
    bars = dollar_bars(
        ev, 20000.0, ["event_type"],
        price_col="price", order_col="event_id", dollars_col="dollars_q",
    )
    return bars.select(
        "event_type", "bar_idx", "bar_start", "bar_end",
        "open", "high", "low", "close",
        F.col("dollar_value").cast("decimal(18,4)").cast("double").alias("dollar_value"),
        "n_ticks",
    )


@register(
    "unpivot_ohlc_long",
    oracle=f"""
    WITH bars AS ({_BARS_CTE})
    SELECT event_type, ts, 'open' AS metric, open AS value FROM bars
    UNION ALL SELECT event_type, ts, 'high', high FROM bars
    UNION ALL SELECT event_type, ts, 'low', low FROM bars
    UNION ALL SELECT event_type, ts, 'close', close FROM bars
    """,
)
def unpivot_ohlc_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape (pandas melt, the reference's formatting-layer
    idiom): OHLC bars unpivoted to (key, ts, metric, value) tidy rows via
    the native UNPIVOT operator — a zero-shuffle expand of the bar agg
    (4 output rows per bar, no join, no window)."""
    bars = resample(
        _event_ticks(spark, sf_dir), "5m", ts_col="ts",
        key_cols=["event_type"], order_cols=["event_id"], fill_gaps=False,
    )
    return bars.unpivot(
        ["event_type", "ts"], ["open", "high", "low", "close"], "metric", "value"
    )
