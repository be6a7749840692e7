"""Streaming REST poller (sources/rest_stream.py): offset bookkeeping,
page partitioning, rate limiting, exactly-once delivery into the sink."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from financedatabase_spark.sources.rest_stream import (
    STREAM_FORMAT_NAME,
    RestStreamReader,
    register_rest_stream,
)


@pytest.fixture(scope="module")
def stream_endpoint(tmp_path_factory):
    path = os.path.join(tmp_path_factory.mktemp("reststream"), "feed.parquet")
    n = 537
    pq.write_table(
        pa.table(
            {
                "seq": list(range(1, n + 1)),
                "symbol": [f"S{i % 7}" for i in range(n)],
                "px": [100.0 + i * 0.25 for i in range(n)],
            }
        ),
        path,
    )
    return path, n


def _reader(path, **opts):
    from pyspark.sql.pandas.types import from_arrow_schema

    schema = from_arrow_schema(pq.read_schema(path))
    return RestStreamReader(schema, {"path": path, "cursor_col": "seq", **opts})


def test_offsets_and_partition_planning(stream_endpoint):
    path, n = stream_endpoint
    r = _reader(path, page_rows="100")
    assert r.initialOffset() == {"cursor": -1}
    assert r.latestOffset() == {"cursor": n}  # endpoint high-water mark
    parts = r.partitions({"cursor": -1}, {"cursor": n})
    assert [p.lo for p in parts][0] == -1 and parts[-1].hi == n
    assert len(parts) == 6  # ceil(538 / 100) pages
    # page reads tile the cursor space exactly once
    total = sum(b.num_rows for p in parts for b in r.read(p))
    assert total == n


def test_rate_limit_caps_admitted_backlog(stream_endpoint):
    path, n = stream_endpoint
    r = _reader(path, rows_per_batch="200")
    # fresh reader (post-restart): unknown committed point -> no cap
    assert r.latestOffset() == {"cursor": n}
    r.commit({"cursor": 0})
    assert r.latestOffset() == {"cursor": 200}
    r.commit({"cursor": 200})
    assert r.latestOffset() == {"cursor": 400}
    r.commit({"cursor": 400})
    assert r.latestOffset() == {"cursor": n}  # backlog drained


def test_stream_delivers_each_row_exactly_once(spark, stream_endpoint):
    path, n = stream_endpoint
    register_rest_stream(spark)
    sdf = (
        spark.readStream.format(STREAM_FORMAT_NAME)
        .option("path", path)
        .option("cursor_col", "seq")
        .option("page_rows", "64")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("rest_stream_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT seq) AS d FROM rest_stream_sink").first()
    assert (got.n, got.d) == (n, n)
    top = spark.sql(
        "SELECT seq, symbol, px FROM rest_stream_sink ORDER BY seq LIMIT 1"
    ).first()
    assert (top.seq, top.symbol, top.px) == (1, "S0", 100.0)


def test_streaming_bars_over_rest_stream(spark, tmp_path):
    """Integration: the polled REST feed drives the engine's windowed
    OHLCV aggregation and the streamed result equals the batch bars on
    the same data — the R2/R4 'today leg' built on the new source."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    path = str(tmp_path / "ticks.parquet")
    base = dt.datetime(2024, 3, 4, 9, 30)
    n = 600
    pq.write_table(
        pa.table(
            {
                "seq": list(range(1, n + 1)),
                "ts": [base + dt.timedelta(seconds=13 * i) for i in range(n)],
                "symbol": [f"S{i % 3}" for i in range(n)],
                "px": [100.0 + (i % 37) * 0.5 for i in range(n)],
            }
        ),
        path,
    )
    register_rest_stream(spark)
    sdf = (
        spark.readStream.format(STREAM_FORMAT_NAME)
        .option("path", path)
        .option("cursor_col", "seq")
        .option("page_rows", "128")
        .load()
    )
    bars = sdf.groupBy("symbol", F.window("ts", "5 minutes").alias("w")).agg(
        F.min_by("px", "seq").alias("open"),
        F.max("px").alias("high"),
        F.min("px").alias("low"),
        F.max_by("px", "seq").alias("close"),
        F.count("*").alias("volume"),
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("rest_stream_bars")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.symbol, r.w.start, r.open, r.high, r.low, r.close, r.volume)
        for r in spark.sql("SELECT * FROM rest_stream_bars").collect()
    }
    batch = spark.read.parquet(path)
    want = {
        (r.symbol, r.w.start, r.open, r.high, r.low, r.close, r.volume)
        for r in batch.groupBy("symbol", F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.min_by("px", "seq").alias("open"),
            F.max("px").alias("high"),
            F.min("px").alias("low"),
            F.max_by("px", "seq").alias("close"),
            F.count("*").alias("volume"),
        )
        .collect()
    }
    assert got == want and len(want) > 10


def test_cursor_regression_and_reread_are_idempotent(stream_endpoint, tmp_path):
    """Failure injection at the reader level: (1) a retried partition
    re-reads its exact cursor range (no more, no fewer rows); (2) an
    endpoint whose high-water mark REGRESSES below the committed cursor
    (vendor rewind / replica lag) yields an empty admissible range, not
    duplicates or a crash; (3) when the endpoint recovers past the
    committed point, only genuinely-new cursor values are admitted."""
    path, n = stream_endpoint
    r = _reader(path, page_rows="100")

    # (1) retry: the same partition read twice returns identical rows
    [p0, *_] = r.partitions({"cursor": -1}, {"cursor": n})
    rows_a = [b.to_pydict() for b in r.read(p0)]
    rows_b = [b.to_pydict() for b in r.read(p0)]
    # page (-1, 99]: seq starts at 1, so 99 rows — and identical on retry
    assert rows_a == rows_b and sum(len(d["seq"]) for d in rows_a) == 99

    # (2) regression: endpoint rewinds to 50 rows after committing 100
    short = os.path.join(tmp_path, "short.parquet")
    full_tbl = pq.read_table(path)
    pq.write_table(full_tbl.slice(0, 50), short)
    r2 = _reader(short, page_rows="100")
    r2.commit({"cursor": 100})
    end = r2.latestOffset()
    assert end == {"cursor": 50}  # honest high-water mark
    parts = r2.partitions({"cursor": 100}, end)
    assert [b for p in parts for b in r2.read(p)] == []  # nothing re-served

    # (3) recovery: endpoint grows to 120 rows; only (100, 120] admitted
    grown = os.path.join(tmp_path, "grown.parquet")
    pq.write_table(full_tbl.slice(0, 120), grown)
    r3 = _reader(grown, page_rows="100")
    parts = r3.partitions({"cursor": 100}, r3.latestOffset())
    seqs = [s for p in parts for b in r3.read(p) for s in b.column("seq").to_pylist()]
    assert seqs == list(range(101, 121))


def test_reserved_rows_dedup_exactly_once_in_sink(spark, tmp_path):
    """Failure injection end-to-end: an at-least-once endpoint re-serves
    already-delivered business rows under NEW cursor values (the vendor
    retry that a cursor-range filter cannot exclude). The advertised
    recovery path — watermark dedup on the business key between source
    and sink — must land each business row exactly once."""
    import datetime as dt

    import pyarrow as pa

    from financedatabase_spark.streaming.snapshots import dedup_stream

    base = dt.datetime(2024, 3, 4, 9, 30)
    path = str(tmp_path / "feed.parquet")
    # 80 originals + 20 re-served duplicates (same symbol+ts+px, new seq)
    # + 20 genuinely new rows
    orig = {
        "seq": list(range(1, 81)),
        "ts": [base + dt.timedelta(seconds=i) for i in range(80)],
        "symbol": [f"S{i % 5}" for i in range(80)],
        "px": [100.0 + i for i in range(80)],
    }
    reserved = {
        "seq": list(range(81, 101)),
        "ts": orig["ts"][30:50],
        "symbol": orig["symbol"][30:50],
        "px": orig["px"][30:50],
    }
    fresh = {
        "seq": list(range(101, 121)),
        "ts": [base + dt.timedelta(seconds=80 + i) for i in range(20)],
        "symbol": [f"S{i % 5}" for i in range(20)],
        "px": [500.0 + i for i in range(20)],
    }
    merged = {
        k: orig[k] + reserved[k] + fresh[k] for k in ("seq", "ts", "symbol", "px")
    }
    pq.write_table(pa.table(merged), path)

    register_rest_stream(spark)
    sdf = (
        spark.readStream.format(STREAM_FORMAT_NAME)
        .option("path", path)
        .option("cursor_col", "seq")
        .option("page_rows", "32")
        .load()
    )
    deduped = dedup_stream(sdf.drop("seq"), ["symbol"], "ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("rest_stream_dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.sql(
        "SELECT symbol, ts, px FROM rest_stream_dedup_sink"
    ).toPandas()
    assert len(got) == 100  # 80 originals + 20 fresh, re-served landed 0x
    assert got.duplicated(["symbol", "ts"]).sum() == 0
    assert sorted(got.px[got.px >= 500.0]) == [500.0 + i for i in range(20)]
