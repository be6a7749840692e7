"""Skew mitigation — salting for hot keys (README scale rule).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.get_spark`) handles most skew at runtime. Salting is
the explicit fallback for pathological keys (one symbol carrying half the
ticks) and for aggregations, which AQE skew-handling does not cover:

- `salted_agg`: two-phase aggregate — first on (key, salt), then on key.
  Turns one hot reducer into `salt_buckets` parallel ones. Works for any
  algebraic aggregate (sum/count/min/max).
- `salted_join`: replicate the small side per salt value, salt the big
  side's key — the classic broadcast-incompatible skew-join rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from a stable row hash (not rand():
    deterministic plans re-execute identically on task retry)."""
    h = F.abs(F.xxhash64(*[F.col(c) for c in df.columns]))
    return df.withColumn(salt_col, (h % buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial per (key, salt), final per
    key. ``aggs`` maps column → 'sum'|'count'|'min'|'max'."""
    partial_exprs = []
    final_exprs = []
    for col, how in aggs.items():
        if how == "sum":
            partial_exprs.append(F.sum(col).alias(col))
            final_exprs.append(F.sum(col).alias(col))
        elif how == "count":
            partial_exprs.append(F.count(col).alias(col))
            final_exprs.append(F.sum(col).alias(col))
        elif how == "min":
            partial_exprs.append(F.min(col).alias(col))
            final_exprs.append(F.min(col).alias(col))
        elif how == "max":
            partial_exprs.append(F.max(col).alias(col))
            final_exprs.append(F.max(col).alias(col))
        else:
            raise ValueError(f"non-algebraic agg {how!r} cannot be salted")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-join rewrite: salt the big side, replicate the small side per
    salt value, join on (key, salt). Use when the small side is too large
    to broadcast and the key distribution is pathological."""
    big_s = with_salt(big, buckets)
    salts = big.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(salts)
    out = big_s.join(small_r, [on, "_salt"], how)
    return out.drop("_salt")
