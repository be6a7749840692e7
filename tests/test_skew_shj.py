"""Skew evidence for the r15 `preferSortMergeJoin=false` default (r16,
verdict item 6): AQE's skew-join splitting must still engage when the
planner picks ShuffledHashJoin. The thresholds are lowered ONLY inside
this test so a few-MB fixture crosses them — the mechanism under test
(OptimizeSkewedJoin on ShuffledHashJoinExec) is version- not size-
dependent, and the session default keeps Spark's production thresholds.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keys = [
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "false"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {}
    for k, v in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_shuffled_hash_join_skew_split_engages(spark, skew_conf):
    """One hot key owning ~95% of the big side: the executed adaptive plan
    must (a) pick ShuffledHashJoin under the session's
    preferSortMergeJoin=false default, and (b) split the skewed partition
    via AQEShuffleRead (isSkew markers / more partitions than the static
    shuffle produced)."""
    big = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("v"),
    )
    small = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    joined = big.join(small, "k")
    # collect() (not count()) so THIS frame's QueryExecution is the one
    # that ran and carries the final adaptive plan
    assert len(joined.collect()) == 190_250
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # AQE converted the initial SortMergeJoin to a shuffled-hash join
    # (maxShuffledHashJoinLocalMapThreshold) AND split the hot-key
    # partition: the skew-handled build prints ShuffledHashJoin(skew=true)
    # over an "AQEShuffleRead skewed" on the big side
    assert "ShuffledHashJoin(skew=true)" in plan, plan[:4000]
    assert "AQEShuffleRead skewed" in plan, plan[:4000]
