"""Paginated REST-style source — SURVEY.md §2.1 S6.

The reference walks Alpaca's `next_page_token` loop on the driver
(Alpaca.py:486-517, :553-583) and concatenates pages. Here the same
contract is a generator → `createDataFrame` bridge: fine for control-plane
data (contract listings, chain snapshots — thousands of rows). For a
data-plane source at scale the pattern inverts: materialize the page-token
space as a DataFrame and fetch per-partition with `mapInPandas` (see
`fan_out_fetch`), so executors do the I/O and the driver never holds rows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_paginated(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    schema: str,
    max_pages: int = 10_000,
) -> DataFrame:
    """Drain a next-page-token API into a DataFrame.

    ``fetch_page(token) -> (rows, next_token)``; stops at next_token=None.
    Driver-side by design — this is the reference's S6 exactly; the row
    volume is bounded by the API's pagination, not the dataset.
    """
    rows: list[dict] = []
    token: str | None = None
    for _ in range(max_pages):
        page, token = fetch_page(token)
        rows.extend(page)
        if token is None:
            break
    return spark.createDataFrame(rows, schema)


def fan_out_fetch(
    keys: DataFrame,
    fetch_fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """S4 — per-key parallel fetch: the reference's thread-pool-per-date
    scan (`_multi_threaded_range_fetch`, v3/utils.py:444-503) as a
    `mapInPandas` stage over a key/date DataFrame. Each executor batch
    calls ``fetch_fn(keys_batch) -> rows``; parallelism is the partition
    count, retries are Spark task retries (R5)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fetch_fn(pdf)
            if len(out):
                yield out

    return keys.mapInPandas(run, schema)
