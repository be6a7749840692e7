"""Exponential smoothing — the sequential-recursion primitive.

EWMA (``y_1 = x_1``, ``y_t = a*x_t + (1-a)*y_{t-1}``, pandas
``ewm(adjust=False)``) is the textbook example of an operator a window
function cannot express: the closed-form weight ``(1-a)^(t-i)``
underflows/overflows for long series, so the robust formulation is the
recursion itself. Spark-first shape: per-key ``collect_list`` sorted by
the order column, then a Catalyst higher-order ``aggregate`` fold —
entirely JVM-side, no UDF, one shuffle on the key.

Scale contract: one key's series folds inside one task (same constraint
as any sequential recursion); keys themselves distribute freely. At
100 TB with bounded per-key history (the finance norm: one symbol's
ticks) this holds; unbounded per-key series would need chunked
carry-forward (fold each chunk, thread the boundary accumulator).

The fold's float operand order is deterministic (same sequence, same
constants), which makes it bit-reproducible across engines — DuckDB's
``list_reduce`` implements the identical left fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sorted_vals(order_col: str, value_col: str):
    arr = F.array_sort(F.collect_list(F.struct(F.col(order_col), F.col(value_col))))
    return F.transform(arr, lambda s: s.getField(value_col).cast("double"))


def ewma_last(
    df: DataFrame,
    alpha: float,
    key_cols: list[str],
    order_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-key EWMA level after the last observation: (key..., ewma_value,
    n). One shuffle; the fold is a Catalyst ``aggregate`` over the
    order-sorted series."""
    a = float(alpha)
    vals = _sorted_vals(order_col, value_col)
    return df.groupBy(*key_cols).agg(
        vals.alias("_vals"), F.count("*").cast("long").alias("n")
    ).select(
        *key_cols,
        F.expr(
            f"aggregate(slice(_vals, 2, size(_vals) - 1), _vals[0], "
            f"(acc, x) -> {a} * x + {1.0 - a} * acc)"
        ).alias("ewma_value"),
        "n",
    )


def ewma_series(
    df: DataFrame,
    alpha: float,
    key_cols: list[str],
    order_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-row EWMA series: every input row with its smoothed value —
    the scanl form of the fold (array accumulator carrying (level,
    outputs)), re-exploded against the sorted order keys. Same
    single-shuffle plan; output size equals input size."""
    a = float(alpha)
    arr = F.array_sort(F.collect_list(F.struct(F.col(order_col), F.col(value_col))))
    grouped = df.groupBy(*key_cols).agg(arr.alias("_pairs"))
    # scanl: fold to struct(level, outs); emit outs zipped back to order keys
    scan = (
        f"aggregate(slice(_vals, 2, size(_vals) - 1), "
        f"struct(_vals[0] as level, array(_vals[0]) as outs), "
        f"(acc, x) -> struct({a} * x + {1.0 - a} * acc.level as level, "
        f"array_append(acc.outs, {a} * x + {1.0 - a} * acc.level) as outs), "
        f"acc -> acc.outs)"
    )
    exploded = (
        grouped.withColumn(
            "_vals", F.transform(F.col("_pairs"), lambda s: s.getField(value_col).cast("double"))
        )
        .withColumn("_ords", F.transform(F.col("_pairs"), lambda s: s.getField(order_col)))
        .withColumn("_ewma", F.expr(scan))
        .select(
            *key_cols,
            F.posexplode(F.arrays_zip(F.col("_ords"), F.col("_ewma"))).alias("_i", "_z"),
        )
    )
    return exploded.select(
        *key_cols,
        F.col("_z._ords").alias(order_col),
        F.col("_z._ewma").alias("ewma_value"),
    )
