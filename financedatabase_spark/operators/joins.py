"""Join operators (SURVEY.md §2.3 J1–J7).

The reference's joins are pandas merges and silent index alignment; here
each is an explicit DataFrame join Catalyst can reorder/broadcast:

- J1 `bar_fill_join` — quote skeleton (complete timestamp grid) left-joins
  sparse trade OHLC (reference: v2.py:724-738).
- J2 `enrich_left_join` — open-interest style enrichment (Organizers.py:274-279).
- J3 `asof_join` — pandas index-alignment enrichment (Organizers.py:83-110)
  done as a true as-of: implemented with a union + forward-fill window, ONE
  shuffle on (by, ts), no range-explosion. This is the classic distributed
  as-of shape — it scales to arbitrarily large right sides, unlike a
  broadcast range join.
- J4 `union_splice` — ticker-change / chunk splice: unionByName → keep-last
  dedup (v2.py:399, v3/utils.py:685-699).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financedatabase_spark.operators.dedup import dedup_keep_last


def bar_fill_join(
    grid: DataFrame,
    sparse: DataFrame,
    on: list[str],
    broadcast_sparse: bool = False,
) -> DataFrame:
    """J1 — complete-grid frame left-joins sparse bars so non-traded buckets
    survive with null OHLC (reference: v2.py:724-738 quote⟕ohlc on
    ['Date','time']). Broadcast the sparse side when it's a single
    contract's day (small); at bulk scale both sides shuffle on `on`,
    which is the partitioning the surrounding pipeline already uses."""
    right = F.broadcast(sparse) if broadcast_sparse else sparse
    return grid.join(right, on, "left")


def enrich_left_join(base: DataFrame, dim: DataFrame, on: list[str] | str) -> DataFrame:
    """J2 — left-join enrichment columns (open interest onto option rows,
    Organizers.py:274-279)."""
    return base.join(dim, on, "left")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """J3 — backward as-of join: each left row takes the latest right row
    with ``right.on <= left.on`` (per ``by`` key).

    The reference gets this implicitly from pandas index alignment after
    resampling/ffilling the right series onto the left grid
    (Organizers.py:83-110, :101). Spark-first implementation: tag and union
    both sides, forward-fill the right value columns over an
    (by, on)-ordered window, keep left rows. One shuffle, no collect, no
    row-multiplication on duplicate timestamps (the LAST right row at a
    tied timestamp wins, like a ffilled series).

    ``tolerance`` (e.g. ``'2 days'``) nulls matches older than the bound,
    like pandas merge_asof's tolerance.
    """
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c != on and c not in by]
    left_cols = [c for c in left.columns if c != on and c not in by]

    lhs = left.select(
        *by,
        on,
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols],
    )
    rhs = right.select(
        *by,
        on,
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c) for c in value_cols],
    )
    # right rows sort before left rows at a tied timestamp → `<=` semantics
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = lhs.unionByName(rhs).select(
        *by,
        on,
        "_is_left",
        *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        *(
            [F.last(F.when(F.col("_is_left") == 0, F.col(on)), ignorenulls=True).over(w).alias("_src_ts")]
            if tolerance
            else []
        ),
    )
    out = filled.filter(F.col("_is_left") == 1).drop("_is_left")
    if tolerance:
        within = F.col("_src_ts") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *by,
            on,
            *left_cols,
            *[F.when(within, F.col(c)).alias(c) for c in value_cols],
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Point-in-interval (range) join without a cartesian: every point
    row whose ``ts`` falls in ``[start, end]`` (inclusive) of an
    interval row pairs with it.

    Spark has no native range-join optimization — a raw
    ``ON ts BETWEEN start AND end`` plans as a nested-loop over
    points × intervals. The scale shape is time bucketing: points map
    to the ONE bucket containing their ts, intervals explode to every
    bucket they overlap, and the join becomes a bucket equi-join (hash,
    AQE/skew-eligible) with the exact BETWEEN predicate applied to the
    co-bucketed candidates. Each matching pair is produced exactly once
    — a point lives in exactly one bucket — so there is no post-dedup.
    Shuffle volume: points once, plus intervals × their bucket span;
    pick ``bucket_seconds`` near the typical interval length so the
    explode factor stays ~2.
    """
    usec = int(bucket_seconds) * 1_000_000

    def b(col: str):
        return F.floor(F.expr(f"unix_micros(cast({col} as timestamp))") / usec)

    p = points.withColumn("_bkt", b(ts_col))
    iv = intervals.withColumn(
        "_bkt", F.explode(F.sequence(b(start_col), b(end_col)))
    )
    return p.join(iv, "_bkt").filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    ).drop("_bkt")


def union_splice(
    frames: list[DataFrame],
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """J4 — splice per-segment frames (ticker change / range chunks):
    union → keep-last dedup on the key (reference: v2.py:399 concat +
    sort + dedup keep-last; v3/utils.py:685-699). Later frames in the list
    win ties via an appended segment ordinal, matching pandas positional
    keep='last' across concatenated frames."""
    tagged = [f.withColumn("_segment", F.lit(i)) for i, f in enumerate(frames)]
    out = tagged[0]
    for f in tagged[1:]:
        out = out.unionByName(f)
    return dedup_keep_last(out, key_cols, [*order_cols, "_segment"]).drop("_segment")
