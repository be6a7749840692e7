"""Alias-splice, corrections, DML-rewrite and registry queries
(SURVEY.md §2.10 M1–M4, §2.13 X1/X5, §2.3 J7, §2.1 S8/S9).

The tiny dimensions (ticker aliases, quarantine, registry) are built
inline with `createDataFrame` so the DuckDB oracle reproduces them as CTE
literals (FIXTURES.md mapping note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.operators.alias import alias_dim, canonicalize_symbols
from financedatabase_spark.operators.corrections import apply_corrections, quarantine_dim
from financedatabase_spark.operators.io_sinks import (
    delete_rewrite,
    filter_for_save,
    insert_ignore,
    update_rewrite,
)
from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table

#: event_type plays the ticker symbol on the driver's events table:
#: 'view' was renamed to 'click' on 2024-01-15 (META/FB-shaped fixture T8).
_CHANGES = [("click", "view", "2024-01-15")]


@register(
    "ticker_alias_canonicalize",
    oracle="""
    WITH aliases(current_symbol, old_symbol, change_date) AS (
      VALUES ('click', 'view', DATE '2024-01-15')
    )
    SELECT event_id, ts,
           coalesce(a.current_symbol, e.event_type) AS symbol,
           value
    FROM events e
    LEFT JOIN aliases a
      ON e.event_type = a.old_symbol AND CAST(e.ts AS DATE) < a.change_date
    """,
)
def ticker_alias_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — SCD alias relabel: pre-change rows of the old symbol take the
    current symbol via one broadcast join (reference:
    v3/utils.py:618-699)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.col("event_type").alias("symbol"), "value"
    )
    return canonicalize_symbols(ev, alias_dim(spark, _CHANGES), "symbol", "ts")


@register(
    "spliced_symbol_history",
    oracle="""
    WITH aliases(current_symbol, old_symbol, change_date) AS (
      VALUES ('click', 'view', DATE '2024-01-15')
    ), canon AS (
      SELECT event_id, ts,
             coalesce(a.current_symbol, e.event_type) AS symbol,
             value
      FROM events e
      LEFT JOIN aliases a
        ON e.event_type = a.old_symbol AND CAST(e.ts AS DATE) < a.change_date
    )
    SELECT event_id, ts, symbol, value FROM canon WHERE symbol = 'click'
    """,
)
def spliced_symbol_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 'historical' mode — one symbol's full spliced history: the
    union-of-filtered-scans plan the reference builds imperatively
    (v3/utils.py:560-615)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.col("event_type").alias("symbol"), "value"
    )
    canon = canonicalize_symbols(ev, alias_dim(spark, _CHANGES), "symbol", "ts")
    return canon.filter(F.col("symbol") == "click")


@register(
    "corrections_antijoin",
    oracle="""
    WITH quarantine(query_name, symbol, bad_date) AS (
      VALUES ('events_history', 'error', DATE '2024-01-10'),
             ('events_history', 'purchase', DATE '2024-01-20')
    )
    SELECT event_id, ts, event_type, value
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM quarantine q
      WHERE q.query_name = 'events_history'
        AND e.event_type = q.symbol
        AND CAST(e.ts AS DATE) = q.bad_date
    )
    """,
)
def corrections_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5/P13 — quarantine-dimension anti-join: config-driven removal of
    known-bad vendor rows (reference: patches/p1.py:32-101)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    q = quarantine_dim(
        spark,
        [
            ("events_history", "error", "2024-01-10"),
            ("events_history", "purchase", "2024-01-20"),
        ],
    )
    return apply_corrections(ev, q, "events_history", symbol_col="event_type", date_col="ts")


@register(
    "insert_ignore",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
    ), incoming AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT * FROM target
    UNION ALL
    SELECT * FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = i.o_orderkey)
    """,
)
def insert_ignore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/M-upsert — INSERT IGNORE as PK anti-join + union: overlapping
    incoming rows are discarded, target rows keep their values
    (reference: SQLHelpers.py:651-686 temp-table INSERT IGNORE)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    target = o.filter(F.col("o_orderkey") % 3 == 0)
    incoming = o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    return insert_ignore(target, incoming, ["o_orderkey"])


@register(
    "batch_update",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
           o_orderpriority
    FROM orders
    """,
)
def batch_update_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — UPDATE … SET … WHERE eq/IN preds as a declarative rewrite
    (reference: dynamic_batch_update, SQLHelpers.py:689-776)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    out, _pred = update_rewrite(
        o,
        {"o_orderstatus": "O", "o_orderpriority": ["1-URGENT", "2-HIGH"]},
        {"o_orderstatus": "P", "o_totalprice": F.col("o_totalprice") * 1.1},
    )
    return out


@register(
    "delete_where",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_orderpriority IN ('5-LOW', '4-NOT SPECIFIED'))
    """,
)
def delete_where_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — DELETE WHERE as inverted filter
    (reference: delete_from_table, SQLHelpers.py:251-358)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    out, _pred = delete_rewrite(
        o, {"o_orderstatus": "F", "o_orderpriority": ["5-LOW", "4-NOT SPECIFIED"]}
    )
    return out


@register(
    "filtered_save",
    oracle="""
    SELECT DISTINCT user_id, event_type, value
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
    """,
)
def filtered_save_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 — pre-save hygiene: lowercase names, dropna, drop duplicates
    (reference: DatabaseAdapter.__filter_data, SQLHelpers.py:894-924)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("USER_ID"),  # exercise the lowercase pass
        F.col("event_type").alias("Event_Type"),
        "value",
    )
    return filter_for_save(ev)


@register(
    "registry_lookup",
    oracle="""
    WITH registry(database_name, base_name, environment, is_active) AS (
      VALUES ('portfolio_data_dev',  'portfolio_data', 'dev',  TRUE),
             ('portfolio_data_uat',  'portfolio_data', 'uat',  TRUE),
             ('vol_surface_dev',     'vol_surface',    'dev',  TRUE),
             ('vol_surface_old_dev', 'vol_surface',    'dev',  FALSE)
    )
    SELECT r.base_name, r.environment, r.database_name
    FROM registry r
    WHERE r.is_active
    """,
)
def registry_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/C1 — environment registry resolution as a broadcast lookup table
    (reference: master_config.database_configs, db_utils.py:140-164)."""
    registry = spark.createDataFrame(
        [
            ("portfolio_data_dev", "portfolio_data", "dev", True),
            ("portfolio_data_uat", "portfolio_data", "uat", True),
            ("vol_surface_dev", "vol_surface", "dev", True),
            ("vol_surface_old_dev", "vol_surface", "dev", False),
        ],
        "database_name string, base_name string, environment string, is_active boolean",
    )
    return registry.filter(F.col("is_active")).select(
        "base_name", "environment", "database_name"
    )


@register(
    "scd2_user_state",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR event_type IS DISTINCT FROM lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS new_run
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    r AS (
      SELECT user_id, ts, event_type,
             sum(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run
      FROM m
    ),
    c AS (
      SELECT user_id, run, event_type, min(ts) AS valid_from
      FROM r GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           run::BIGINT AS version,
           lead(valid_from) OVER w2 IS NULL AS is_current
    FROM c
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, run)
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the raw event log
    (operators/alias.scd2_build): per-user event_type state history with
    valid_from/valid_to intervals, version numbers, and the is_current
    flag — the general form of the reference's hand-rolled ticker-change
    alias table (v3/utils.py:560-615), and the point-in-time-join side
    of every as-of enrichment. Two window passes over one shuffle on
    user_id."""
    from financedatabase_spark.operators.alias import scd2_build

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return scd2_build(
        ev, ["user_id"], "ts", ["event_type"], order_cols=["event_id"]
    )
