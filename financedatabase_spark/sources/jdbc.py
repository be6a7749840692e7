"""JDBC table scan and sink — the reference's MySQL surface (S5/S7).

The reference reads with ``pd.read_sql`` over SQLAlchemy
(dbase/database/SQLHelpers.py:408-414) and writes with ``to_sql``
(SQLHelpers.py:361-367). Spark-first those are ``spark.read.jdbc`` /
``df.write.jdbc`` — the scan distributes via ``partitionColumn`` +
``numPartitions`` bounds (each executor reads one key-range slice, the
relational analog of the reference's 300-day range chunker) and the write
batches inserts per partition.

Driver availability is environment-dependent; `jdbc_available` probes the
JVM for the named driver class so callers/tests can skip cleanly. The
sandbox ships Derby (Spark's Hive-metastore dependency), whose embedded
driver makes a real in-process JDBC round-trip testable with zero
network — the same code path (DataSource V1 JDBC relation) a production
MySQL/Postgres URL exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Embedded Derby — present in every stock Spark distribution.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def jdbc_available(spark: SparkSession, driver: str = DERBY_DRIVER) -> bool:
    """True when the JVM can load the JDBC driver class."""
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S5 — distributed JDBC scan. With partition bounds, Spark issues one
    range-predicated query per partition (pushdown-capable: filters and
    projections travel into the generated SQL)."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    ).option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JVM as the literal "None" and die
            # in a bound parse deep inside the JDBC relation — fail here
            raise ValueError(
                "partition_column requires explicit lower_bound and upper_bound "
                "(Spark's JDBC range partitioner has no bound discovery)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str = DERBY_DRIVER,
) -> None:
    """S7 — JDBC sink; ``mode`` maps the reference's ``if_exists`` flag
    exactly as the parquet sink does (SQLHelpers.py:361-367)."""
    df.write.format("jdbc").option("url", url).option("dbtable", table).option(
        "driver", driver
    ).mode(mode).save()
