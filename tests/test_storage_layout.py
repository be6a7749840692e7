"""Storage-layout behaviors that carry the 100 TB story: date-partitioned
writes with partition pruning, bucketed co-located joins, and dynamic
partition overwrite."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from financedatabase_spark.operators.io_sinks import ParquetTable
from financedatabase_spark.sources.readers import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    t = ParquetTable(spark, str(tmp_path / "events_by_date"), partition_by=["date"])
    t.write(events, mode="overwrite")

    one_day = t.read().filter(F.col("date") == "2024-01-05")
    p = _plan(one_day)
    # the date filter must prune partitions at planning time, not scan+filter
    assert "PartitionFilters" in p
    pf = [l for l in p.splitlines() if "PartitionFilters" in l][0]
    assert "2024-01-05" in pf or "date" in pf
    assert one_day.count() > 0


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        events = load_table(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
        t = ParquetTable(spark, str(tmp_path / "ev_dyn"), partition_by=["date"])
        t.write(events, mode="overwrite")
        total_before = t.read().count()
        one_day = t.read().filter(F.col("date") == "2024-01-05")
        n_day = one_day.count()
        # rewrite ONLY that partition with doubled values
        patched = one_day.withColumn("value", F.col("value") * 2).localCheckpoint()
        t.write(patched, mode="overwrite")
        after = t.read()
        assert after.count() == total_before  # other partitions untouched
        assert after.filter(F.col("date") == "2024-01-05").count() == n_day
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_b")
    try:
        # disable auto-broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = _plan(joined)
        # bucketed co-located join: no Exchange on either side
        assert "Exchange" not in p, p
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
