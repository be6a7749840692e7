"""SparkSession factory with engine defaults.

The reference keeps a per-(pid, database) SQLAlchemy engine cache
(reference: dbase/database/SQLHelpers.py:100-144); in Spark the session
singleton plays that role. Defaults are chosen for the local[N] test
harness but the same settings are what we'd ship to a real cluster:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
shuffle partitions sized to cores, Arrow enabled for the pandas-UDF path,
and a fixed UTC session timezone so the reference's timezone-naive market
timestamps round-trip unchanged (SURVEY.md §7.4 risk 3).
"""

from __future__ import annotations

import os
from typing import Callable, Hashable

from pyspark.sql import DataFrame, SparkSession


def _is_active(spark: SparkSession) -> bool:
    try:
        return spark.sparkContext._jsc is not None
    except Exception:
        return False


def session_memo(
    spark: SparkSession, key: Hashable, build: Callable[[], DataFrame]
) -> DataFrame:
    """Memoize ``build()`` per (live session, key). The cache lives ON
    the session object itself, so its lifetime is exactly the session
    object's: no module-level registry to pin frames after the caller
    drops the session. (A weak-keyed side table cannot give that
    guarantee here — the cached DataFrames strongly reference their
    session, so a weak key would never be collectible while its value
    lives; an attribute makes that loop an ordinary gc-collectable
    cycle.) A stopped session's cached frames are unusable — on a
    stopped session the memo is bypassed and cleared (the caller's
    build against a stopped session fails loudly, which is the right
    error surface)."""
    if not _is_active(spark):
        spark.__dict__.pop("_fdspark_memo", None)
        return build()
    cache = spark.__dict__.setdefault("_fdspark_memo", {})
    if key not in cache:
        cache[key] = build()
    return cache[key]


def values_dim(spark: SparkSession, rows, columns_sql: str) -> DataFrame:
    """Tiny literal dimension as a VALUES LocalRelation.

    `spark.createDataFrame(list)` yields a Python-RDD-backed frame
    (`Scan ExistingRDD`): every broadcast of it runs a separate
    Python→JVM job (applySchemaToPythonRDD) — measured as a fixed
    per-query stage cost in the flagship pipeline. A VALUES relation
    lives in the driver as a LocalRelation: broadcasts materialize with
    NO job, and Catalyst constant-folds/prunes it like any literal.

    ``columns_sql`` is "name type, name type, ..."; every value is cast
    to its declared type. Parameterized/nested types (``decimal(10,2)``,
    ``array<int>``, ``struct<...>``) are supported — the column list is
    split on top-level commas only. Supported value types: str, int,
    float (NaN/±Inf rendered as typed casts), bool, datetime.date/
    datetime (rendered as typed SQL literals), list/tuple (rendered as
    array(...)), None.
    """
    import datetime as _dt
    import math as _math

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, _dt.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, _dt.date):
            return f"DATE '{v.isoformat()}'"
        if isinstance(v, float) and not _math.isfinite(v):
            if _math.isnan(v):
                return "CAST('NaN' AS DOUBLE)"
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "array(" + ", ".join(lit(x) for x in v) + ")"
        s = str(v)
        if "'" in s or "\\" in s:
            # Quote/backslash escaping differs between the default
            # C-style parser and spark.sql.parser.escapedStringLiterals
            # (Hive-compat) mode — and legacy mode has NO quote escape
            # at all. A hex binary literal parses identically in both.
            return f"CAST(X'{s.encode('utf-8').hex()}' AS STRING)"
        return f"'{s}'"

    def split_top_level(spec: str) -> list[str]:
        parts, depth, start = [], 0, 0
        for i, ch in enumerate(spec):
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(spec[start:i])
                start = i + 1
        parts.append(spec[start:])
        return [p for p in (p.strip() for p in parts) if p]

    cols = [c.split(None, 1) for c in split_top_level(columns_sql)]
    if not rows:
        casts = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        df = spark.sql(f"SELECT {casts} WHERE FALSE")
        df._literal_rows = []
        return df
    vals = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    names = ", ".join(n for n, _ in cols)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    df = spark.sql(f"SELECT {casts} FROM (VALUES {vals}) AS t({names})")
    # inline-fold hint: operators that receive a SMALL literal dim can
    # compile it into CASE/filter expressions instead of a broadcast
    # join, dropping the BroadcastExchange job entirely (the flagship
    # pipeline's residual stages are exactly these tiny broadcasts)
    df._literal_rows = [tuple(r) for r in rows]
    return df


def get_spark(app_name: str = "financedatabase_spark", cpus: int | None = None) -> SparkSession:
    """Build (or return) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the master/size come from spark-submit; every .config here is
    still correct at 1000 executors.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Split small files down to ~cores scan partitions: staging tables
        # compress to a few MB, and the default byte-based planner gives
        # such files ONE split, serializing CPU-heavy scan work (regex
        # tokenize, hashing) onto one core — measured 24-42% off the heavy
        # sf0.1 queries with these two. Harmless at cluster scale:
        # minPartitionNum is a suggested MINIMUM (maxPartitionBytes still
        # caps splits at 128 MB), and a 64 KB open cost only packs more
        # small files per task.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.files.openCostInBytes", "65536")
        # driver testdata stores events.ts as TIMESTAMP(NANOS); read as long
        # and convert in the source layer (readers.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # r15: let the planner pick shuffled-hash over sort-merge when the
        # build side fits (guide §3.1/§9) — drops the per-partition sorts
        # on the composite pipelines' doc-id equi-joins (measured -6..-10%
        # on curation/minhash/simhash at sf0.1, plan: SortMergeJoin →
        # ShuffledHashJoin). Scale-safe: the AQE threshold bounds the
        # build-side partition that may be hash-built (OOM guard), and
        # both knobs are env-overridable for cluster tuning.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_THRESHOLD", "64m"),
        )
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed joins, env catalogs) land outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/financedatabase_spark_warehouse"),
        )
    )
    # NOTE: do NOT set spark.driver.memory here — in this container a large
    # explicit heap makes identical jobs degrade 10-15× over a session
    # (measured: 1s → 16s by run 5 with 8g; stable ~1s on the default).
    # Set SPARK_GRAFT_DRIVER_MEM only if a workload genuinely OOMs.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
