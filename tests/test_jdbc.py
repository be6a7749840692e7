"""JDBC scan/sink smoke (S5/S7) over embedded Derby — the same DataSource
V1 JDBC relation a production MySQL/Postgres URL exercises, skipped
cleanly when no driver class is loadable."""

import pytest
from pyspark.sql import functions as F

from financedatabase_spark.sources.jdbc import (
    jdbc_available,
    read_jdbc_table,
    write_jdbc_table,
)


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not jdbc_available(spark):
        pytest.skip("no JDBC driver available in this environment")
    return f"jdbc:derby:{tmp_path}/smokedb;create=true"


def test_jdbc_roundtrip_and_partitioned_scan(spark, derby_url):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), (F.col("id") * 1.5).alias("val")
    )
    write_jdbc_table(df, derby_url, "events_smoke", mode="overwrite")

    back = read_jdbc_table(spark, derby_url, "events_smoke")
    assert back.count() == 100
    assert {c.lower() for c in back.columns} == {"id", "grp", "val"}

    # distributed scan: bounds slice the table into range-predicated reads
    sliced = read_jdbc_table(
        spark, derby_url, "events_smoke",
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert sliced.rdd.getNumPartitions() == 4
    assert sliced.agg(F.sum("id")).collect()[0][0] == sum(range(100))

    # append mode lands new rows without touching existing ones
    write_jdbc_table(df.filter(F.col("id") < 5), derby_url, "events_smoke", mode="append")
    assert read_jdbc_table(spark, derby_url, "events_smoke").count() == 105


def test_partition_bounds_validated(spark):
    from financedatabase_spark.sources.jdbc import read_jdbc_table

    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        read_jdbc_table(spark, "jdbc:derby:memory:x", "t", partition_column="id")
