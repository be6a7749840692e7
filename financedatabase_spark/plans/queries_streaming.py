"""Structured Streaming registered queries (SURVEY.md §2.12 R1–R4).

These run a REAL streaming query (file source → availableNow trigger →
memory sink) and return the sink as a DataFrame, so the driver's
correctness harness exercises the streaming engine itself. Rows-only
(no SQL oracle — streaming semantics aren't DuckDB-expressible); the
stream==batch equivalence is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from financedatabase_spark.sources.readers import load_table
from financedatabase_spark.streaming.snapshots import latest_state_stream, streaming_bars
from financedatabase_spark.plans.registry import register


def _staged_stream(spark: SparkSession, sf_dir: str):
    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    stage = tempfile.mkdtemp(prefix="fdb_stream_")
    batch.write.mode("overwrite").parquet(stage)
    return spark.readStream.schema(batch.schema).parquet(stage)


def _run(spark: SparkSession, sdf, mode: str) -> DataFrame:
    name = f"q_{uuid.uuid4().hex[:10]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


@register("streaming_bars_incremental")
def streaming_bars_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 — incremental OHLCV bars over a genuine streaming query
    (watermark + tumbling window, availableNow drain). Append mode emits
    each bar exactly once when its window closes."""
    sdf = streaming_bars(
        _staged_stream(spark, sf_dir), "1h", key_cols=["event_type"],
        ts_col="ts", price_col="value", origin_minutes=None,
    )
    return _run(spark, sdf, "append")


@register("streaming_latest_state")
def streaming_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 — live snapshot view: per-user latest state maintained by the
    streaming engine (complete mode), the reference's polling snapshot
    endpoints replaced by one continuous query (v2.py:456-524)."""
    sdf = latest_state_stream(
        _staged_stream(spark, sf_dir), ["user_id"], "ts", ["event_type", "value"]
    )
    return _run(spark, sdf, "complete")


@register("streaming_sessions")
def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator — gap sessionization over the live
    streaming engine (applyInPandasWithState, event-time timeouts):
    sessions close either when a later event proves the gap or when the
    watermark passes end+gap. stream==batch equivalence vs the built-in
    session_window is pinned in tests/test_streaming.py."""
    from financedatabase_spark.streaming.sessions import sessionize_stream

    batch = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    stage = tempfile.mkdtemp(prefix="fdb_stream_")
    batch.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(batch.schema).parquet(stage)
    sdf = sessionize_stream(stream, 120.0, ["event_type"], "ts", "value")
    return _run(spark, sdf, "append")
