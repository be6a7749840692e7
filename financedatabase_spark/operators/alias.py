"""Ticker-change (corporate action) alias splicing — SURVEY.md §2.13 X1/X2.

The reference wraps every endpoint in `_with_ticker_change_handling`
(v3/utils.py:618-749; v2 variant v2.py:338-438): a query for META over a
range spanning the FB→META change date is split into per-symbol segments,
fetched separately, relabeled, unioned, sorted, and keep-last-deduped.

Spark-first shape: the alias map is an SCD-style dimension
(current_symbol, old_symbol, change_date — FIXTURES.md T8). Splicing is a
broadcast join + relabel, one pass over the fact table, no driver-side
branching. At 100 TB the alias dim is a few hundred rows — broadcast hash
join, zero shuffle of the facts.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.operators.dedup import dedup_keep_last
from financedatabase_spark.session import session_memo, values_dim


def alias_dim(
    spark: SparkSession,
    changes: list[tuple[str, str, str]],
) -> DataFrame:
    """Build the ticker-change dimension from (current, old, change_date)
    tuples (reference: TICK_CHANGE_ALIAS, v3/utils.py:526).

    Tiny literal dimensions are rebuilt on every pipeline run in the
    reference (per-request Python lists); here the (session, rows) pair
    is memoized (per-session, see session.session_memo) and built as a
    VALUES LocalRelation (session.values_dim) — broadcasting it costs no
    Python->JVM job, unlike a createDataFrame RDD-backed frame."""

    def build() -> DataFrame:
        rows = [(c, o, dt.date.fromisoformat(d)) for c, o, d in changes]
        return values_dim(
            spark, rows, "current_symbol string, old_symbol string, change_date date"
        )

    return session_memo(spark, ("alias_dim", tuple(changes)), build)


#: literal dims at or under this row count fold into expressions instead
#: of a broadcast join (each BroadcastExchange is a separate job — a
#: fixed scheduling cost that dominates small-query wall time and buys
#: nothing: Catalyst codegens the CASE chain into the scan stage)
LITERAL_FOLD_MAX = 64


def canonicalize_symbols(
    df: DataFrame,
    aliases: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Relabel pre-change old-symbol rows to the current symbol.

    Equivalent to the reference's historical splice (X1 'historical' mode):
    rows of the old symbol before the change date become the current symbol;
    everything else passes through. A SMALL literal alias dim (built by
    `alias_dim`/`session.values_dim`) folds into a CASE chain codegen'd
    straight into the scan stage — no BroadcastExchange, no extra job;
    larger or non-literal dims take the broadcast left join (at 100 TB
    the alias dim is a few hundred rows — still a broadcast, but a real
    table deserves a real join)."""
    rows = getattr(aliases, "_literal_rows", None)
    if (
        rows is not None
        and len(rows) <= LITERAL_FOLD_MAX
        and aliases.columns == ["current_symbol", "old_symbol", "change_date"]
    ):
        relabel = None
        for cur, old, chg in rows:
            cond = (F.col(symbol_col) == F.lit(old)) & (
                F.to_date(F.col(ts_col)) < F.lit(chg)
            )
            relabel = (
                F.when(cond, F.lit(cur))
                if relabel is None
                else relabel.when(cond, F.lit(cur))
            )
        if relabel is None:  # empty dim: nothing to relabel
            return df
        return df.withColumn(symbol_col, relabel.otherwise(F.col(symbol_col)))
    a = F.broadcast(aliases)
    joined = df.join(
        a,
        (df[symbol_col] == a["old_symbol"]) & (F.to_date(df[ts_col]) < a["change_date"]),
        "left",
    )
    return joined.withColumn(
        symbol_col, F.coalesce(a["current_symbol"], df[symbol_col])
    ).drop("current_symbol", "old_symbol", "change_date")


def spliced_history(
    df: DataFrame,
    aliases: DataFrame,
    symbol: str,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """X1 — full history for ``symbol`` across its ticker changes: union of
    the relabeled old-symbol segment and the current-symbol segment, then
    keep-last dedup on the timestamp key (reference: v3/utils.py:618-699).

    The plan is a union of two filtered scans — with a date/symbol
    partitioned table, both prune at the source.
    """
    canon = canonicalize_symbols(df, aliases, symbol_col, ts_col)
    hist = canon.filter(F.col(symbol_col) == symbol)
    key_cols = key_cols or [symbol_col, ts_col]
    if order_cols is None:
        return hist
    return dedup_keep_last(hist, key_cols, order_cols)


def symbol_on_date(
    aliases: DataFrame,
    symbol: str,
    on_date: str,
) -> DataFrame:
    """X1 'at-time' mode — which physical symbol carried this listing on a
    date (reference: v3/utils.py:506-535 per-date symbol pick). Returns a
    1-row frame; the caller substitutes it into the scan predicate."""
    a = aliases.filter(F.col("current_symbol") == symbol)
    return a.select(
        F.when(F.lit(on_date).cast("date") < F.col("change_date"), F.col("old_symbol"))
        .otherwise(F.col("current_symbol"))
        .alias("symbol")
    )


def scd2_build(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change/event log:
    one row per (key, consecutive run of unchanged attributes) with
    ``valid_from`` / ``valid_to`` / ``version`` / ``is_current``.

    This is the general form of what the reference hand-rolls for ticker
    changes (v3/utils.py:560-615 splits ranges at change dates): given
    the raw change log, the SCD2 dimension IS the alias table — a
    point-in-time join against (valid_from <= ts < valid_to) answers
    "what was this key's state at t" for any attribute set.

    Shape: two window passes over one shuffle on key — lag() marks run
    starts (any attribute differing from the previous row), a running
    sum turns marks into run ids, the run groupBy collapses, and lead()
    closes each interval with the next run's start (NULL = current).
    Ties in ``ts_col`` break by ``order_cols`` (default: the key's event
    order is required to be unique per (key, ts); pass e.g. an event id).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        # eqNullSafe = IS NOT DISTINCT FROM: a transition to/from NULL is a
        # run boundary, not a NULL-comparison that silently continues the run
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    marked = df.select(
        *key_cols,
        ts_col,
        *(order_cols or []),
        *attr_cols,
        F.when(F.lag(F.col(ts_col)).over(w).isNull() | changed, 1)
        .otherwise(0)
        .alias("_new_run"),
    )
    runs = marked.withColumn(
        "_run", F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    collapsed = runs.groupBy(*key_cols, "_run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from")
    )
    # version breaks valid_from ties (two runs can share a timestamp when
    # the state flips within one tick)
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col("valid_from").asc(), F.col("_run").asc()
    )
    return collapsed.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("_run").cast("long").alias("version"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )
