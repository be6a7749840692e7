"""Gap-based sessionization — a custom stateful streaming operator with
event-time timeouts (`applyInPandasWithState` + ``EventTimeTimeout``).

A session is a maximal run of same-key events with no gap larger than
``gap_seconds`` between consecutive timestamps. The built-in
``F.session_window`` covers the batch case; the streaming operator here
exercises the arbitrary-state surface the way a production custom
operator would:

- **Group state** holds the key's one open session (start, end, count,
  sum) — constant bytes per key regardless of stream length.
- **Event-time timeout** closes a session when the watermark passes
  ``session_end + gap`` — the "no more events can extend it" proof.
  Every batch that extends the session re-arms the timeout.
- **In-batch gap proof**: a later same-key event more than ``gap`` after
  the open session's end closes it immediately. This is what lets a
  bounded replay (file source, availableNow) emit all but each key's
  final session even though the final watermark never advances past it.

(The same logic ports verbatim to Spark 4.x `transformWithStateInPandas`
— ValueState + `registerTimer` — but that API's Python worker needs the
protobuf package, which this environment does not ship; the v1 state API
has no such dependency.)

Batches are assumed to arrive in event-time order per key (the same
contract as ``forward_fill_stream``); late data within the watermark is
tolerated up to session granularity. State per key is O(1); the operator
shuffles once per micro-batch on the grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financedatabase_spark.streaming.snapshots import _watermarkable


def sessionize_stream(
    stream: DataFrame,
    gap_seconds: float,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming gap sessionization: (key..., session_start, session_end,
    n_events, sum_value), one output row per closed session."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = _watermarkable(stream, ts_col)
    in_fields = {f.name: f.dataType for f in stream.schema.fields}
    out_schema = T.StructType(
        [T.StructField(k, in_fields[k]) for k in key_cols]
        + [
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    gap_us = int(gap_seconds * 1_000_000)

    def _frame(key, sessions):
        return pd.DataFrame(
            {
                **{k: [key[i]] * len(sessions) for i, k in enumerate(key_cols)},
                "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
                "session_end": pd.to_datetime([s[1] for s in sessions], unit="us"),
                "n_events": pd.array([s[2] for s in sessions], dtype="int64"),
                "sum_value": pd.array([s[3] for s in sessions], dtype="float64"),
            }
        )

    def sessionize(key, pdfs, state):
        if state.hasTimedOut:
            # watermark passed end+gap: the open session can no longer grow
            if state.exists:
                closed = state.get
                state.remove()
                yield _frame(key, [closed])
            return
        cur = state.get if state.exists else None
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")
            for t, v in zip(ts_us, pdf[value_col].astype("float64")):
                t, v = int(t), float(v)
                if cur is None:
                    cur = (t, t, 1, v)
                elif t - cur[1] <= gap_us:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
                else:  # gap proven by a later event — close immediately
                    closed.append(cur)
                    cur = (t, t, 1, v)
        if cur is not None:
            state.update(cur)
            # re-arm: fire once the watermark passes end+gap (must be
            # strictly ahead of the current watermark to be accepted)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[1] // 1000 + gap_us // 1000, wm_ms + 1))
        if closed:
            yield _frame(key, closed)

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            sessionize,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    df: DataFrame,
    gap_seconds: float,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin via the built-in session window — same output contract
    (session_end is the LAST EVENT's timestamp, not window end)."""
    gap = f"{int(gap_seconds)} seconds"
    return (
        df.groupBy(*key_cols, F.session_window(ts_col, gap).alias("_w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_col).cast("double").alias("sum_value"),
        )
        .drop("_w")
    )
