"""Streaming REST poller as a Python DataSourceStreamReader.

The reference's incremental "today" path polls the API on a schedule and
appends what arrived since the last call (reference ThetaData v2.py
pagination + the R2 history∪today routing; R6 scheduling). Structured
Streaming already owns that loop — offsets, retries, exactly-once
bookkeeping — so the idiomatic Spark shape is a streaming SOURCE, not a
scheduler:

- the offset is the REST cursor (here: the max value of a monotone
  sequence column the endpoint has published),
- ``latestOffset`` polls availability (driver, metadata-only),
- ``partitions(start, end)`` splits the new cursor range into page-sized
  ``InputPartition``s fetched ON EXECUTORS in parallel,
- ``read(partition)`` pulls one page as Arrow batches,
- checkpointing replays any failed batch from its recorded offsets —
  exactly-once into the sink without hand-rolled state.

``rows_per_batch`` caps how much of the backlog one micro-batch admits
(rate limiting / backfill pacing). The transport is the same pluggable
parquet "endpoint" as `restds` (no network here); a live HTTP pager
drops in behind `read`/`_available` without touching the offset logic.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

STREAM_FORMAT_NAME = "rest_stream"


class _CursorRange(InputPartition):
    def __init__(self, lo, hi):  # half-open (lo, hi] over the cursor column
        self.lo = lo
        self.hi = hi

    def __repr__(self) -> str:
        return f"_CursorRange({self.lo}, {self.hi})"


class RestStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options) -> None:
        self.schema = schema
        self.path = options["path"]
        self.cursor = options.get("cursor_col", "seq")
        self.page_rows = int(options.get("page_rows", "10000"))
        self.rows_per_batch = int(options.get("rows_per_batch", "0"))  # 0 = all

    # -- offset bookkeeping ------------------------------------------
    def initialOffset(self) -> dict:
        return {"cursor": -1}

    def _available(self) -> int:
        """Poll the endpoint's high-water mark (the 'what exists now'
        call — metadata-only on the driver)."""
        import pyarrow.compute as pc

        from financedatabase_spark.sources.restds import _open_endpoint

        col = _open_endpoint(self.path).to_table(columns=[self.cursor])
        if col.num_rows == 0:
            return -1
        return pc.max(col.column(self.cursor)).as_py()

    def latestOffset(self) -> dict:
        hi = self._available()
        if self.rows_per_batch and self._committed >= 0:
            # admit a bounded slice of the backlog per micro-batch
            # (cursor values must be dense for this cap to meter rows);
            # right after a restart _committed is unknown (-1) and the
            # batch is left uncapped rather than guessed
            hi = min(hi, self._committed + self.rows_per_batch)
        return {"cursor": hi}

    @property
    def _committed(self) -> int:
        return getattr(self, "_last_end", -1)

    def commit(self, end: dict) -> None:
        self._last_end = end["cursor"]

    # -- planning + execution ----------------------------------------
    def partitions(self, start: dict, end: dict):
        lo, hi = start["cursor"], end["cursor"]
        if hi <= lo:
            return [_CursorRange(lo, lo)]
        parts = []
        a = lo
        while a < hi:
            b = min(a + self.page_rows, hi)
            parts.append(_CursorRange(a, b))
            a = b
        return parts

    def read(self, partition: _CursorRange):  # executor-side page fetch
        if partition.hi <= partition.lo:
            return iter(())
        import pyarrow.dataset as pads

        from financedatabase_spark.sources.restds import _open_endpoint

        field = pads.field(self.cursor)
        scanner = _open_endpoint(self.path).scanner(
            columns=[f.name for f in self.schema.fields],
            filter=(field > partition.lo) & (field <= partition.hi),
        )
        return iter(scanner.to_batches())


class RestStreamDataSource(DataSource):
    """``spark.readStream.format("rest_stream").option("path", ...)
    .option("cursor_col", seq).load()``"""

    @classmethod
    def name(cls) -> str:
        return STREAM_FORMAT_NAME

    def schema(self) -> StructType:
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.read_schema(self.options["path"]))

    def streamReader(self, schema: StructType) -> RestStreamReader:
        return RestStreamReader(schema, self.options)


def register_rest_stream(spark) -> None:
    """Idempotently register the streaming format with a session."""
    if not getattr(spark, "_rest_stream_registered", False):
        spark.dataSource.register(RestStreamDataSource)
        spark._rest_stream_registered = True
