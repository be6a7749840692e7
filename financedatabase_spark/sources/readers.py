"""Parquet scan layer.

The reference's scans are HTTP CSV fetches parsed with pandas
(reference: dbase/DataAPI/ThetaData/utils.py:599-691 `_fetch_data`,
v2.py:876-880) plus `pd.read_sql` over MySQL
(dbase/database/SQLHelpers.py:408-414). In this engine the scan is a
declarative `spark.read.parquet` — Catalyst pushes predicates and prunes
columns into the file scan, and the file splits themselves are the unit of
parallelism (the reference hand-rolls that with 300-day range chunking,
utils.py:583-596, and a per-date thread pool, v3/utils.py:444-503; on Spark
both collapse into ordinary partitioned reads).

At 100 TB the same call reads a date/symbol-partitioned table and partition
pruning replaces the reference's chunker. Nothing here is driver-side: no
collect, no pandas materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Driver-supplied synthetic tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table: lazy parquet read, pushdown-capable.

    `events.ts` is TIMESTAMP(NANOS) on disk, which the Spark parquet reader
    rejects; with `spark.sql.legacy.parquet.nanosAsLong` it arrives as
    nanos-since-epoch and is converted to a microsecond timestamp here
    (truncation — the same thing DuckDB's micro-precision TIMESTAMP does,
    so oracle comparisons agree).

    The conf is set at runtime here (it is a runtime-settable SQL conf) so the
    read works under ANY caller-provided SparkSession, not just the one built
    by `session.get_session()`.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # TIMESTAMP(NANOS, isAdjustedToUTC=false) is a WITHOUT-TIME-ZONE
            # type, so surface it as timestamp_ntz — also the type every
            # other temporal column in the testdata arrives as (orders.
            # o_orderdate etc.), and the shape DuckDB's TIMESTAMP pairs
            # with cleanly. (The LTZ->NTZ cast is wall-clock-preserving
            # here: this container and the driver both run UTC.)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` plans against them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
