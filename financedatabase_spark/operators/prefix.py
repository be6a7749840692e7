"""Hierarchical (two-level) per-key running totals with bounded tasks.

``sum() over (partition by key order by ord rows unbounded preceding)``
is Spark's distributed prefix sum, but the window puts EACH KEY in one
task — at 100 TB the dominant key (one symbol's ticks, one language's
docs) sorts and scans inside a single executor thread. The classic
fix is the two-level scan:

1. range-partition on (key..., ord) so every task holds a contiguous
   slice of the global order,
2. compute slice-local running totals map-side (Arrow ``mapInPandas``,
   vectorized cumsum — no shuffle),
3. prefix-sum the per-(slice, key) totals — a frame with one row per
   (task, key) pair, tiny at any scale — and broadcast it back as each
   slice's starting offset.

``global_before = slice_offset + local_before`` is bit-identical to
the monolithic window for integral (and decimal) value columns at any
partition layout; FLOAT sums reassociate across slice boundaries (same
caveat as any parallel float reduction). Every task is bounded by
slice size, never key size. The totals branch reuses the range
exchange (ReusedExchange), so the data shuffles once.

First extracted from `sampling.token_shard_packing` (r4); now the
shared engine for packing and the activity-bar clocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def attach_running_total_before(
    df: DataFrame,
    value_col: Column | str,
    key_cols: list[str] | None,
    order_col: str,
) -> DataFrame:
    """Return ``df`` with an appended ``_before`` column — the per-key
    running total of the value column over ``order_col`` EXCLUDING the
    current row. Equivalent to ``sum(val) over (partition by key order
    by ord) - val`` with bounded tasks. All input columns pass through.

    Safe for ANY column set: the slice-totals branch aggregates the
    mapInPandas output (a pruning barrier), so both consumers share one
    canonically identical range exchange (ReusedExchange, plan-gated)
    — payload columns cannot diverge the subtrees. A Column expression
    passed as ``value_col`` is materialized as ``_val`` first."""
    keys = list(key_cols or [])
    if isinstance(value_col, str):
        vname, based, drop_val = value_col, df, ()
    else:
        vname, based, drop_val = "_val", df.withColumn("_val", value_col), ("_val",)
    staged = (
        based.repartitionByRange(*keys, order_col)
        .sortWithinPartitions(*keys, order_col)
        .withColumn("_p", F.spark_partition_id())
    )
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in staged.schema.fields
    )
    before_t = dict(staged.dtypes)[vname]

    def _local_prefix(batches):
        import pandas as pd  # noqa: F401

        carry = None  # keys + _carry frame, or a scalar when unkeyed
        run0 = 0
        for pdf in batches:
            dt = pdf[vname].dtype
            if keys:
                before = pdf.groupby(keys, sort=False)[vname].cumsum() - pdf[vname]
                pdf = pdf.assign(_before=before)
                if carry is not None:
                    pdf = pdf.merge(carry, on=keys, how="left")
                    # fillna promotes int64 -> float64; cast back so an
                    # integral running total never rounds through floats
                    pdf["_before"] = pdf["_before"] + pdf.pop("_carry").fillna(0).astype(dt)
                sums = (
                    pdf.groupby(keys, sort=False, as_index=False)[vname]
                    .sum()
                    .rename(columns={vname: "_new"})
                )
                if carry is None:
                    carry = sums.rename(columns={"_new": "_carry"})
                else:
                    carry = carry.merge(sums, on=keys, how="outer")
                    carry["_carry"] = (
                        carry["_carry"].fillna(0) + carry["_new"].fillna(0)
                    ).astype(dt)
                    carry = carry.drop(columns="_new")
            else:
                before = pdf[vname].cumsum() - pdf[vname] + run0
                pdf = pdf.assign(_before=before)
                run0 += pdf[vname].sum()
            yield pdf

    local = staged.mapInPandas(_local_prefix, f"{out_fields}, _before {before_t}")

    # Slice totals aggregate over LOCAL's output, not `staged`: Catalyst
    # cannot prune columns through the opaque Python map, so both
    # consumers sit on canonically IDENTICAL subtrees and the range
    # exchange is provably reused (one execution, one set of `_p`
    # boundaries). Aggregating `staged` directly let column pruning
    # diverge the two subtrees whenever the frame carried payload
    # columns the totals side didn't reference — no reuse, TWO range
    # executions with independently SAMPLED boundaries (RangePartitioner
    # can even emit different partition COUNTS per run), and the inner
    # `_p` join then silently dropped or misplaced rows at scale.
    # Known cost: the two consumers above the ReusedExchange each run
    # the Python prefix map, so the Arrow-serialized scan executes
    # TWICE per query. MEASURED at 50x (r13, shuffled_shard_packing,
    # interleaved best-of-3 with the cache cleared per run): reused
    # 10.3 s, persist(MEMORY_AND_DISK) 10.2 s, localCheckpoint 9.7 s —
    # a <=10% spread, inside this host's documented noise band. Kept
    # as-is: localCheckpoint truncates lineage (an executor loss on a
    # real cluster fails the job instead of recomputing) and persist
    # leaks cache entries across queries via logical-plan matching;
    # neither buys enough to pay for that at 100 TB, where the reused
    # shuffle files are the only extra storage this design needs.
    totals = local.groupBy("_p", *keys).agg(F.sum(vname).alias("_ptot"))
    w_off = (
        (Window.partitionBy(*keys) if keys else Window.partitionBy())
        .orderBy("_p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_p", *keys,
        F.coalesce(F.sum("_ptot").over(w_off), F.lit(0)).cast(before_t).alias("_offset"),
    )
    return (
        local.join(F.broadcast(offsets), ["_p", *keys])
        .withColumn("_before", (F.col("_offset") + F.col("_before")).cast(before_t))
        .drop("_p", "_offset", *drop_val)
    )
