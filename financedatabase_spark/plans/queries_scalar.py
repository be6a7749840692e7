"""Scalar expression queries (SURVEY.md §2.8 F1–F14, §2.2 P4–P6, P11).

Each query exercises one cluster of the scalar library over the driver
tables, with an exact DuckDB oracle. All expressions are native Columns —
`.explain` shows a single WholeStageCodegen over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.functions import columns as C
from financedatabase_spark.operators import calendar as cal
from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table

_HOLIDAY_LITERALS = ", ".join(f"DATE '{d}'" for d in cal.US_MARKET_HOLIDAYS)


@register(
    "quote_metrics",
    oracle="""
    SELECT event_id,
           value AS bid,
           value + 0.25 AS ask,
           k AS bid_size,
           k % 3 AS ask_size,
           (value + (value + 0.25)) / 2 AS midpoint,
           CASE WHEN (k + (k % 3)) <> 0
                THEN (value * k + (value + 0.25) * (k % 3)) / (k + (k % 3))
           END AS weighted_midpoint
    FROM (
      SELECT event_id, value,
             CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k
      FROM events
    )
    """,
)
def quote_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — midpoint + weighted midpoint, including the 0/0 → null
    branch (reference: v2.py:889-896, v3/utils.py:351-357)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("bid"),
        (F.col("value") + 0.25).alias("ask"),
        F.regexp_extract("props", r"([0-9]+)", 1).cast("long").alias("bid_size"),
        (F.regexp_extract("props", r"([0-9]+)", 1).cast("long") % 3).alias("ask_size"),
    )
    return ev.select(
        "event_id",
        "bid",
        "ask",
        "bid_size",
        "ask_size",
        C.midpoint("bid", "ask").alias("midpoint"),
        C.weighted_midpoint("bid", "ask", "bid_size", "ask_size").alias("weighted_midpoint"),
    )


@register(
    "strike_codec",
    oracle="""
    SELECT p_partkey,
           round((p_partkey * 125) / 1000.0, 3) AS strike,
           CAST(round(round((p_partkey * 125) / 1000.0, 3) * 1000.0, 0) AS BIGINT) AS wire
    FROM part
    """,
)
def strike_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — wire ×1000 int ↔ display strike round-trip
    (reference: v2.py:567, :649-650, v3/utils.py:339-340)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_partkey") * 125).alias("wire_in")
    )
    out = p.select(
        "p_partkey",
        C.strike_from_wire("wire_in").alias("strike"),
    )
    return out.withColumn("wire", C.strike_to_wire("strike"))


def option_tick_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F11 — compact option-tick codec round-trip
    (reference: utils.py:512-545; right normalization v3/utils.py:334-336).
    Components are synthesized from `part`, encoded to `AAPL20241220C180`
    form, then parsed back with regexp_extract."""
    base = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_replace(F.upper("p_brand"), "[^A-Z]", "").alias("symbol"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("p_size")).alias("expiration"),
        F.when(F.col("p_size") % 2 == 0, F.lit("call")).otherwise(F.lit("put")).alias("right_in"),
        F.col("p_retailprice").alias("strike"),
    )
    built = base.select(
        "p_partkey",
        C.option_tick("symbol", "expiration", "right_in", "strike").alias("tick"),
    )
    parsed = C.parse_option_tick("tick")
    return built.select(
        "p_partkey",
        "tick",
        parsed.getField("symbol").alias("parsed_symbol"),
        parsed.getField("expiration").alias("parsed_expiration"),
        parsed.getField("right").alias("parsed_right"),
        parsed.getField("strike").alias("parsed_strike"),
    )


def occ_symbol_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 OCC 21-char variant round-trip (reference: Alpaca.py:246-310)."""
    base = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_replace(F.upper("p_brand"), "[^A-Z]", "").alias("symbol"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("p_size")).alias("expiration"),
        F.when(F.col("p_size") % 2 == 0, F.lit("C")).otherwise(F.lit("P")).alias("right"),
        F.round("p_retailprice", 2).alias("strike"),
    )
    built = base.select(
        "p_partkey", C.occ_option_symbol("symbol", "expiration", "right", "strike").alias("occ")
    )
    parsed = C.parse_occ_option_symbol("occ")
    return built.select(
        "p_partkey",
        "occ",
        parsed.getField("symbol").alias("parsed_symbol"),
        parsed.getField("expiration").alias("parsed_expiration"),
        parsed.getField("right").alias("parsed_right"),
        parsed.getField("strike").alias("parsed_strike"),
    )


@register(
    "time_of_day_codecs",
    oracle="""
    SELECT event_id,
           (hour(ts) * 3600000 + minute(ts) * 60000 + second(ts) * 1000) AS ms,
           printf('%02d:%02d:%02d',
                  ((hour(ts) * 3600000 + minute(ts) * 60000 + second(ts) * 1000) // 1000) // 3600,
                  (((hour(ts) * 3600000 + minute(ts) * 60000 + second(ts) * 1000) // 1000) % 3600) // 60,
                  ((hour(ts) * 3600000 + minute(ts) * 60000 + second(ts) * 1000) // 1000) % 60
           ) AS time_str,
           (hour(ts) * 3600000 + minute(ts) * 60000 + second(ts) * 1000) AS ms_roundtrip
    FROM events
    """,
)
def time_of_day_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 — ms-of-day ↔ HH:MM:SS round-trip
    (reference: v2.py:2002-2019, utils.py:260-275)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", C.ms_of_day("ts").alias("ms")
    )
    out = ev.withColumn("time_str", C.ms_of_day_to_time_str("ms"))
    return out.withColumn("ms_roundtrip", C.time_str_to_ms_of_day("time_str"))


@register(
    "eod_timestamps",
    oracle="""
    SELECT event_id,
           date_trunc('day', ts) AS day_ts,
           date_trunc('day', ts) + INTERVAL 16 HOURS AS eod_ts,
           strftime(ts, '%Y-%m-%d') AS date_style1,
           strftime(ts, '%Y%m%d') AS date_style2,
           CAST(strftime(ts, '%Y%m%d') AS INTEGER) AS wire_date,
           strptime(strftime(ts, '%Y%m%d'), '%Y%m%d')::DATE AS date_from_wire
    FROM events
    """,
)
def eod_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8/F9/F13 — midnight truncation, EOD 16:00 shift, date
    normalization styles and wire-int date codec
    (reference: dbase/utils.py:7-36, utils.py:443-454, v2.py:826-830)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    out = ev.select(
        "event_id",
        C.default_timestamp("ts").cast("timestamp_ntz").alias("day_ts"),
        C.add_eod_timestamp(C.default_timestamp("ts")).cast("timestamp_ntz").alias("eod_ts"),
        C.normalize_date_format("ts", style=1).alias("date_style1"),
        C.normalize_date_format("ts", style=2).alias("date_style2"),
        C.date_to_wire_int("ts").alias("wire_date"),
    )
    # temporal outputs standardize on timestamp_ntz (the only shape with a
    # proven driver hash-match; DuckDB DATE arrives as a midnight Timestamp)
    return out.withColumn(
        "date_from_wire", C.wire_int_to_date("wire_date").cast("timestamp_ntz")
    )


@register(
    "scrub_inf_nan",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN isinf(raw) OR isnan(raw) OR raw IS NULL THEN 0.0 ELSE raw END AS scrubbed
    FROM (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_discount = 0 THEN 'infinity'::DOUBLE
                  WHEN l_tax = 0 THEN 'nan'::DOUBLE
                  ELSE l_extendedprice / l_discount END AS raw
      FROM lineitem
    )
    """,
)
def scrub_inf_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — ±inf/NaN/null → 0 scrub before persistence
    (reference: Organizers.py:288-292)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") == 0, F.lit(float("inf")))
        .when(F.col("l_tax") == 0, F.lit(float("nan")))
        .otherwise(F.col("l_extendedprice") / F.col("l_discount"))
        .alias("raw"),
    )
    return li.select(
        "l_orderkey", "l_linenumber", C.scrub_inf_nan("raw").alias("scrubbed")
    )


@register(
    "session_filter",
    oracle=f"""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE (hour(ts) * 60 + minute(ts)) BETWEEN 570 AND 960
      AND isodow(ts) <= 5
      AND CAST(ts AS DATE) NOT IN ({_HOLIDAY_LITERALS})
    """,
)
def session_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6 — business-hours + weekday + holiday-dimension filters
    (reference: dbase/utils.py:39-68). The holiday check is a broadcast
    anti-join against the ~70-row dimension — map-side only."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    return cal.filter_business_days(cal.enforce_business_hours(ev, "ts"), "ts")


@register(
    "date_range_isin_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND l_returnflag IN ('A', 'R')
      AND l_quantity IS NOT NULL
    """,
)
def date_range_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P11/P10 — date-range predicate + isin membership + NA drop
    (reference: v2.py:358-362, Organizers.py:74-75, SQLHelpers.py:909).
    All three reach the parquet scan as pushed filters."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag", "l_quantity"
    )
    return (
        li.filter(F.col("l_shipdate").between("1996-01-01", "1997-12-31"))
        .filter(F.col("l_returnflag").isin("A", "R"))
        .na.drop(subset=["l_quantity"])
    )


@register(
    "bootstrap_ohlc",
    oracle="""
    SELECT event_id,
           coalesce(CASE WHEN value > 150 THEN NULL ELSE value END, (value + (value + 0.5)) / 2) AS open,
           coalesce(CASE WHEN value < 50  THEN NULL ELSE value END, (value + (value + 0.5)) / 2) AS close,
           (value + (value + 0.5)) / 2 AS midpoint
    FROM events
    """,
)
def bootstrap_ohlc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — bootstrap missing OHLC columns from the quote midpoint
    (reference: utils.py:278-300 `bootstrap_ohlc`: any null open/close
    takes the row's midpoint)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") > 150, None).otherwise(F.col("value")).alias("open_raw"),
        F.when(F.col("value") < 50, None).otherwise(F.col("value")).alias("close_raw"),
        C.midpoint(F.col("value"), F.col("value") + 0.5).alias("midpoint"),
    )
    return ev.select(
        "event_id",
        *C.bootstrap_ohlc_cols({"open": "open_raw", "close": "close_raw"}, "midpoint"),
        "midpoint",
    )


@register(
    "normalize_market_frame",
    oracle="""
    SELECT event_id,
           ts,
           'EVT' AS root,
           CASE WHEN (event_id % 200000) + 150000 > 10000
                THEN round(((event_id % 200000) + 150000) / 1000.0, 3)
                ELSE round(((event_id % 200000) + 150000) * 1.0, 3) END AS strike,
           CASE WHEN event_id % 2 = 0 THEN 'C' ELSE 'P' END AS right,
           value AS bid,
           value + 0.5 AS ask,
           (value + (value + 0.5)) / 2 AS midpoint
    FROM events
    """,
)
def normalize_market_frame_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 step 5 — the reference's `_new_dataframe_formatting`
    (v3/utils.py:284-397) as one declarative pass: required-column check,
    lowercase, noise-column drop, symbol→root, right normalization, strike
    wire→display, midpoint derivation."""
    from financedatabase_spark.operators.normalize import normalize_market_frame

    raw = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").alias("TIMESTAMP"),
        F.lit("EVT").alias("Symbol"),
        ((F.col("event_id") % 200000) + 150000).alias("STRIKE"),
        F.when(F.col("event_id") % 2 == 0, "call").otherwise("put").alias("Right"),
        F.col("value").alias("BID"),
        (F.col("value") + 0.5).alias("ASK"),
        F.lit("X").alias("Bid_Exchange"),  # noise → dropped
        F.lit(7).alias("Condition"),       # noise → dropped
    )
    return normalize_market_frame(raw, ts_col="TIMESTAMP", is_bulk=True)


@register(
    "option_symbol_codecs",
    oracle="""
    WITH base AS (
      SELECT p_partkey,
             regexp_replace(upper(p_brand), '[^A-Z]', '', 'g') AS symbol,
             DATE '2024-01-01' + p_size AS expiration,
             p_size % 2 = 0 AS is_call,
             p_retailprice AS strike
      FROM part
    ),
    tick AS (
      SELECT 'tick' AS codec, p_partkey,
             symbol || strftime(expiration, '%Y%m%d')
                    || CASE WHEN is_call THEN 'C' ELSE 'P' END
                    || regexp_replace(printf('%.3f', strike), '\\.?0+$', '') AS encoded,
             symbol AS parsed_symbol,
             expiration AS parsed_expiration,
             CASE WHEN is_call THEN 'C' ELSE 'P' END AS parsed_right,
             CAST(regexp_replace(printf('%.3f', strike), '\\.?0+$', '') AS DOUBLE) AS parsed_strike
      FROM base
    ),
    occ AS (
      SELECT 'occ' AS codec, p_partkey,
             rpad(symbol, 6, ' ') || strftime(expiration, '%y%m%d')
               || CASE WHEN is_call THEN 'C' ELSE 'P' END
               || lpad(CAST(CAST(round(round(strike, 2) * 1000, 0) AS BIGINT) AS VARCHAR), 8, '0') AS encoded,
             symbol AS parsed_symbol,
             expiration AS parsed_expiration,
             CASE WHEN is_call THEN 'C' ELSE 'P' END AS parsed_right,
             CAST(round(round(strike, 2) * 1000, 0) AS BIGINT) / 1000.0 AS parsed_strike
      FROM base
    )
    SELECT * FROM tick UNION ALL SELECT * FROM occ
    """,
)
def option_symbol_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F11 in one driver row — both option-symbol codecs round-tripped:
    the compact `AAPL20241220C180` tick form (reference: utils.py:512-545,
    right normalization v3/utils.py:334-336) and the padded 21-char OCC
    form (reference: Alpaca.py:246-310). Encode and parse are pure column
    expressions fused into the scan; the union is shuffle-free.
    (Consolidated from the r1 option_tick_roundtrip / occ_symbol_roundtrip
    registrations to fit the driver's 50-query check budget.)"""
    tick = option_tick_roundtrip(spark, sf_dir).select(
        F.lit("tick").alias("codec"),
        "p_partkey",
        F.col("tick").alias("encoded"),
        "parsed_symbol",
        F.col("parsed_expiration").cast("timestamp_ntz").alias("parsed_expiration"),
        "parsed_right", "parsed_strike",
    )
    occ = occ_symbol_roundtrip(spark, sf_dir).select(
        F.lit("occ").alias("codec"),
        "p_partkey",
        F.col("occ").alias("encoded"),
        "parsed_symbol",
        F.col("parsed_expiration").cast("timestamp_ntz").alias("parsed_expiration"),
        "parsed_right", "parsed_strike",
    )
    return tick.unionByName(occ)


@register(
    "json_payload_codec",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.k') AS k_map,
           json_extract_string(
             to_json(struct_pack(event_id := event_id, event_type := event_type)),
             '$.event_type') AS roundtrip_type,
           CAST(json_extract(
             json_extract_string(
               to_json(struct_pack(data := props, status := 'ok')), '$.data'),
             '$.k') AS BIGINT) AS envelope_k
    FROM events
    """,
)
def json_payload_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload surface (SURVEY.md §1.3; functions/json.py): typed
    `from_json`, schemaless map<string,string> (the reference's
    json→dict, SQLHelpers.py:73), path extraction, `to_json` write
    round-trip, and the proxy envelope wrap/unwrap (v2.py:444-452) where
    the payload rides as an escaped JSON string. All native codegen'd
    expressions — one scan, zero shuffle."""
    from financedatabase_spark.functions import json as J

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    env = J.wrap_envelope("props", status=F.lit("ok"))
    return ev.select(
        "event_id",
        J.extract_path("props", "$.k").cast("long").alias("k_path"),
        J.parse_payload("props", "k long")["k"].alias("k_typed"),
        J.payload_map("props")["k"].alias("k_map"),
        J.extract_path(
            J.render_payload(event_id=F.col("event_id"), event_type=F.col("event_type")),
            "$.event_type",
        ).alias("roundtrip_type"),
        J.extract_path(J.unwrap_envelope(env)["data"], "$.k")
        .cast("long")
        .alias("envelope_k"),
    )
