"""Time-bucket resampling — the reference's core aggregate (SURVEY.md §2.4 A1/A2).

Reference semantics (dbase/DataAPI/ThetaData/utils.py:303-440 `resample` +
`_handle_multi_index_resample`, duplicate impl v2.py:1844-1954):

- per-column agg dict: open→first, high→max, low→min, close→last,
  volume→sum, bid/ask/midpoint/size columns→last, unknown columns→ffill
  (caller can override any of these, utils.py:317-320);
- hour buckets anchored at the 09:30 market open (utils.py:396
  ``origin=MARKET_OPEN_TIME``);
- pandas emits EVERY bucket in the span (empty ones too); gaps are
  forward-filled then ``fillna(0)`` (utils.py:392, :399) — zeros, not
  nulls, in the output;
- the keyed variant resamples each key group independently
  (utils.py:402-440).

Spark-first shape: one `groupBy(keys, window(ts, …))` aggregation (a single
shuffle on (keys, bucket)); first/last are `min_by`/`max_by` over an explicit
order column — pandas' positional keep-first/-last made deterministic
(SURVEY.md §4 custom item 3). Empty buckets don't exist in Spark's window
agg, so a **grid scaffold** is generated per key with `sequence()` + explode
(distributed, sized by time-span/interval, never collected) and left-joined;
forward fill is `last(..., ignorenulls)` over an unbounded-preceding window.

Scale note: the scaffold join keys on (key, bucket) — the same partitioning
the aggregation just produced, so AQE plans it shuffle-light; the ffill
window partitions by key, which is exactly how a 100 TB multi-contract table
would already be laid out.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financedatabase_spark.functions.columns import MARKET_OPEN_MINUTES
from financedatabase_spark.operators.calendar import enforce_business_hours

#: F10 — interval-string units → seconds (reference: utils.py:457-509,
#: `identify_length` :231-257). 'b' (business day) aliases 'd' + a
#: business-day filter applied by the caller.
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800, "b": 86400}

#: Default per-column aggregation (reference: utils.py:303-346).
DEFAULT_AGG = {
    "open": "first",
    "high": "max",
    "low": "min",
    "close": "last",
    "volume": "sum",
    "count": "sum",
    "bid": "last",
    "ask": "last",
    "bid_size": "last",
    "ask_size": "last",
    "midpoint": "last",
    "weighted_midpoint": "last",
}


def parse_interval(interval: str) -> tuple[int, str]:
    """F10 — ``'5m'`` → ``(5, 'm')`` (reference: utils.py:457-461)."""
    m = re.fullmatch(r"(\d+)\s*([smhdwb])", interval.strip().lower())
    if not m:
        raise ValueError(f"unparseable interval {interval!r}")
    return int(m.group(1)), m.group(2)


def interval_seconds(interval: str) -> int:
    n, unit = parse_interval(interval)
    return n * _UNIT_SECONDS[unit]


def _duration_string(interval: str) -> str:
    return f"{interval_seconds(interval)} seconds"


def _origin_start_time(interval: str, origin_minutes: int | None) -> str | None:
    """Bucket-alignment offset: market-open anchoring for sub-day buckets.

    Reference anchors intraday buckets at 09:30 (utils.py:396). Spark's
    `window` aligns buckets to epoch + startTime, so the equivalent offset
    is ``origin mod interval``.
    """
    if origin_minutes is None:
        return None
    secs = interval_seconds(interval)
    if secs >= 86400:
        return None  # daily+ buckets stay midnight-aligned, like pandas
    offset = (origin_minutes * 60) % secs
    return f"{offset} seconds" if offset else None


def _agg_expr(col: str, how: str, order: F.Column) -> F.Column:
    if how == "first":
        return F.min_by(col, order).alias(col)
    if how in ("last", "ffill"):  # ffill = last-in-bucket, then gap-fill later
        return F.max_by(col, order).alias(col)
    if how == "max":
        return F.max(col).alias(col)
    if how == "min":
        return F.min(col).alias(col)
    if how == "sum":
        return F.sum(col).alias(col)
    if how in ("mean", "avg"):
        return F.avg(col).alias(col)
    if how == "count":
        return F.count(col).alias(col)
    raise ValueError(f"unsupported agg {how!r} for column {col!r}")


def _agg_plan(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    agg_overrides: dict[str, str] | None,
    order_cols: list[str],
) -> tuple[dict[str, str], Column]:
    """Shared agg-dict resolution for the fixed-window and calendar
    resamplers: reference defaults + ffill for unknown columns + caller
    overrides (U6), and the first/last ordering column."""
    value_cols = [
        c
        for c in df.columns
        if c != ts_col
        and c not in key_cols
        and (c not in order_cols or (agg_overrides and c in agg_overrides))
    ]
    agg_spec = dict(DEFAULT_AGG)
    for c in value_cols:
        agg_spec.setdefault(c, "ffill")
    if agg_overrides:
        agg_spec.update(agg_overrides)
    agg_spec = {c: how for c, how in agg_spec.items() if c in value_cols}
    # single order column stays a primitive → HashAggregate-compatible
    # min_by/max_by buffers; a struct ordering forces SortAggregate
    order = (
        F.col(order_cols[0])
        if len(order_cols) == 1
        else F.struct(*[F.col(c) for c in order_cols])
    )
    return agg_spec, order


def resample(
    df: DataFrame,
    interval: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    agg_overrides: dict[str, str] | None = None,
    order_cols: list[str] | None = None,
    origin_minutes: int | None = MARKET_OPEN_MINUTES,
    fill_gaps: bool = True,
    fill_value: float = 0.0,
    business_hours: bool = False,
) -> DataFrame:
    """A1/A2 — OHLCV time-bucket aggregation with reference gap semantics.

    Returns one row per (key, bucket) with ``ts_col`` = bucket start.
    ``order_cols`` break first/last ties deterministically (defaults to the
    timestamp alone — pass an arrival-sequence column to reproduce pandas
    keep-last exactly, SURVEY.md §4 item 3). ``agg_overrides`` is the
    caller-supplied agg dict (U6, utils.py:317-320); unknown value columns
    default to ffill like the reference.
    """
    key_cols = key_cols or []
    if order_cols is None:
        order_cols = [ts_col]
    # order-only columns (tie-breakers) are consumed by min_by/max_by but
    # not emitted, unless the caller aggregates them explicitly
    agg_spec, order = _agg_plan(df, ts_col, key_cols, agg_overrides, order_cols)

    dur = _duration_string(interval)
    start_time = _origin_start_time(interval, origin_minutes)
    win = F.window(F.col(ts_col), dur, dur, start_time) if start_time else F.window(F.col(ts_col), dur)

    aggs = [_agg_expr(c, how, order) for c, how in agg_spec.items()]
    bucketed = (
        df.groupBy(*key_cols, win.alias("_w"))
        .agg(*aggs)
        .select(*key_cols, F.col("_w.start").alias(ts_col), *agg_spec.keys())
    )

    if fill_gaps:
        bucketed = _fill_bucket_gaps(
            bucketed, interval, ts_col, key_cols, agg_spec, fill_value
        )
    if business_hours:
        bucketed = enforce_business_hours(bucketed, ts_col)
    return bucketed


def _fill_bucket_gaps(
    bucketed: DataFrame,
    interval: str,
    ts_col: str,
    key_cols: list[str],
    agg_spec: dict[str, str],
    fill_value: float,
) -> DataFrame:
    """Grid scaffold + ffill + fillna(0) (reference: utils.py:387-399).

    Per key every bucket in [min_bucket, max_bucket] is emitted; empty
    buckets take nulls, then 'ffill' columns forward-fill over the time
    order and every aggregated column takes ``fill_value`` for remaining
    nulls, matching pandas' trailing ``fillna(0)``.

    r15 shape (guide §2.4): the gap rows are derived from the AGGREGATE
    itself — a `lag` window over the tiny bar table assigns each bar the
    grid slots ``(prev_bucket, bucket]`` (the first bar per key emits just
    itself), exploded in-row; a slot equal to the bar's own bucket carries
    the bar's values, earlier slots are nulls. The union over bars covers
    [min, max] exactly once, so the output is identical to the previous
    grid-scaffold + left-join formulation — but with ONE scan of the input
    instead of two (the old `sequence(min, max)` grid re-planned the whole
    upstream aggregation because the join's null-key filter broke subtree
    reuse) and no join at all: plan 2 scans + 2 exchanges + broadcast join
    → 1 scan + the agg exchange + one bar-table-sized window exchange.
    """
    secs = interval_seconds(interval)
    step = F.expr(f"INTERVAL {secs} SECONDS")
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    lagged = bucketed.withColumn("_fg_prev", F.lag(ts_col).over(w))
    slots = F.sequence(
        F.coalesce(F.col("_fg_prev") + step, F.col(ts_col)), F.col(ts_col), step
    )
    exploded = lagged.select(
        *key_cols,
        F.col(ts_col).alias("_fg_bar"),
        *agg_spec.keys(),
        F.explode(slots).alias("_fg_slot"),
    )
    is_bar = F.col("_fg_slot") == F.col("_fg_bar")
    # The grid-scaffold formulation LEFT-JOINED on the key columns, and a
    # NULL key never matches a join key (the DuckDB oracle shares this
    # semantic): a NULL-key group kept its grid rows but NONE of its bar
    # values. Reproduce that exactly by masking values for NULL keys.
    for k in key_cols:
        is_bar = is_bar & F.col(k).isNotNull()
    joined = exploded.select(
        *key_cols,
        F.col("_fg_slot").alias(ts_col),
        *[F.when(is_bar, F.col(c)).alias(c) for c in agg_spec],
    )

    ffill_cols = [c for c, how in agg_spec.items() if how == "ffill"]
    if ffill_cols:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        joined = joined.select(
            *key_cols,
            ts_col,
            *[
                F.last(c, ignorenulls=True).over(w).alias(c) if c in ffill_cols else F.col(c)
                for c in agg_spec
            ],
        )
    numeric = [
        c
        for c, t in joined.dtypes
        if c in agg_spec and t in ("double", "float", "bigint", "int", "smallint", "tinyint", "long")
    ]
    return joined.na.fill(fill_value, subset=numeric)


#: Anchored calendar grains — the reference's pandas freq aliases
#: `W-FRI` / `BME` / `BQE` / `BYS` (TIMEFRAME_MAP, utils.py:349-357).
ANCHORED_GRAINS = ("w-fri", "bme", "bqe", "bys")


def _last_weekday(d: Column) -> Column:
    """Last Mon-Fri day on-or-before ``d`` (pandas BusinessMonthEnd
    weekday roll; Spark dayofweek: 1=Sun .. 7=Sat)."""
    dow = F.dayofweek(d)
    return (
        F.when(dow == 7, F.date_sub(d, 1))
        .when(dow == 1, F.date_sub(d, 2))
        .otherwise(d)
    )


def _first_weekday(d: Column) -> Column:
    """First Mon-Fri day on-or-after ``d``."""
    dow = F.dayofweek(d)
    return (
        F.when(dow == 7, F.date_add(d, 2))
        .when(dow == 1, F.date_add(d, 1))
        .otherwise(d)
    )


def anchored_label(ts: Column, grain: str) -> Column:
    """Bucket label for a pandas anchored-calendar frequency — the
    reference's weekly/monthly/quarterly/yearly aliases (utils.py:349-357):

    - ``w-fri``  — week ending Friday; label = the Friday on-or-after the
      date (pandas W-FRI, closed/label right);
    - ``bme``  — business month end; label = last weekday of the month,
      dates after it roll into next month's bin (closed right);
    - ``bqe``  — business quarter end, same roll rule;
    - ``bys``  — business year START; label = first weekday of the year,
      dates before it belong to the PREVIOUS year's bin (pandas 'S'
      frequencies are closed/label left).

    Pure date arithmetic on built-ins — codegen'd, no UDF, no shuffle;
    label semantics verified cell-by-cell against pandas ``Grouper``.
    Labels are midnight timestamps like pandas' resample labels."""
    d = F.to_date(ts)
    g = grain.lower()
    if g == "w-fri":
        lab = F.next_day(F.date_sub(d, 1), "Fri")  # Friday on-or-after d
    elif g == "bme":
        cur = _last_weekday(F.last_day(d))
        nxt = _last_weekday(F.last_day(F.add_months(d, 1)))
        lab = F.when(d > cur, nxt).otherwise(cur)
    elif g == "bqe":
        qstart = F.trunc(d, "quarter")
        cur = _last_weekday(F.last_day(F.add_months(qstart, 2)))
        nxt = _last_weekday(F.last_day(F.add_months(qstart, 5)))
        lab = F.when(d > cur, nxt).otherwise(cur)
    elif g == "bys":
        ystart = F.trunc(d, "year")
        cur = _first_weekday(ystart)
        prev = _first_weekday(F.add_months(ystart, -12))
        lab = F.when(d < cur, prev).otherwise(cur)
    else:
        raise ValueError(f"unknown anchored grain {grain!r}; one of {ANCHORED_GRAINS}")
    return lab.cast("timestamp_ntz")


def resample_calendar(
    df: DataFrame,
    label: Column,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    agg_overrides: dict[str, str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """A1 for variable-length calendar buckets (anchored weeks, business
    month/quarter/year ends): the bucket is a date EXPRESSION in the
    groupBy, not a fixed-duration ``window()`` — same per-column agg dict
    and the same single-shuffle two-phase HashAggregate plan as
    `resample`. ``label`` is typically `anchored_label(col, grain)`."""
    key_cols = key_cols or []
    if order_cols is None:
        order_cols = [ts_col]
    agg_spec, order = _agg_plan(df, ts_col, key_cols, agg_overrides, order_cols)
    aggs = [_agg_expr(c, how, order) for c, how in agg_spec.items()]
    return (
        df.groupBy(*key_cols, label.alias(ts_col))
        .agg(*aggs)
        .select(*key_cols, ts_col, *agg_spec.keys())
    )


def volume_bars(
    df: DataFrame,
    per_bar_volume: float,
    key_cols: list[str],
    ts_col: str = "ts",
    price_col: str = "price",
    vol_col: str = "volume",
    order_col: str | None = None,
    hierarchical: bool = False,
) -> DataFrame:
    """Volume bars — buckets close when cumulative volume crosses a
    threshold, the classic activity-clock alternative to time bars
    (López de Prado 2018 §2.3.1.2; extends the reference's fixed-interval
    resample family, utils.py:349-399, to data-driven bar boundaries).

    A tick joins bar k when its PRE-tick cumulative volume lies in
    [k·V, (k+1)·V). That is one running-sum window per key plus one
    aggregation — fully native, single shuffle on the key (the window and
    the groupBy share the hash partitioning), no UDF: bar assignment
    looks sequential but `sum() over (rows unbounded preceding)` is
    exactly the distributed prefix-sum Spark already has.

    The window puts one KEY in one task; for unbounded per-key
    histories pass ``hierarchical=True`` to compute the same pre-tick
    cumulative with the two-level scan (`prefix.attach_running_total_
    before`) — bounded tasks, identical bars for integral/decimal
    volume columns (float window sums would reassociate).

    ``order_col`` breaks timestamp ties deterministically (defaults to
    ``ts_col`` alone). OHLC open/close use min_by/max_by on the order
    column — single-column primitive orderings keep HashAggregate (struct
    orderings would force SortAggregate).
    """
    order = order_col or ts_col
    if hierarchical:
        from financedatabase_spark.operators.prefix import attach_running_total_before

        with_bar = attach_running_total_before(df, vol_col, key_cols, order).select(
            *df.columns,
            F.floor(F.col("_before") / F.lit(per_bar_volume)).cast("long").alias("bar_idx"),
        )
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = F.sum(vol_col).over(w)
        with_bar = df.withColumn(
            "bar_idx", F.floor((cum - F.col(vol_col)) / F.lit(per_bar_volume)).cast("long")
        )
    return (
        with_bar.groupBy(*key_cols, "bar_idx")
        .agg(
            F.min(ts_col).alias("bar_start"),
            F.max(ts_col).alias("bar_end"),
            F.min_by(price_col, F.col(order)).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, F.col(order)).alias("close"),
            F.sum(vol_col).alias("volume"),
            F.count("*").cast("long").alias("n_ticks"),
        )
    )


def dollar_bars(
    df: DataFrame,
    per_bar_dollars: float,
    key_cols: list[str],
    ts_col: str = "ts",
    price_col: str = "price",
    size_col: str = "volume",
    order_col: str | None = None,
    dollars_col: str | None = None,
) -> DataFrame:
    """Dollar bars — the volume-bar clock driven by traded VALUE
    (price x size) instead of share count (Lopez de Prado 2018
    §2.3.1.3): more uniform information content when prices trend. Same
    single-shuffle prefix-sum plan as `volume_bars`.

    ``dollars_col`` overrides the default ``price x size`` product with a
    caller-supplied per-tick value column — e.g. a DECIMAL-quantized
    product when the running sum must be exact (float window sums are
    engine-dependent: Spark accumulates sequentially, DuckDB uses a
    segment tree)."""
    if dollars_col is None:
        df = df.withColumn("_dollars", F.col(price_col) * F.col(size_col))
        dollars_col = "_dollars"
    out = volume_bars(
        df, per_bar_dollars, key_cols, ts_col, price_col, dollars_col, order_col
    )
    return out.withColumnRenamed("volume", "dollar_value")
