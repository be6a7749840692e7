"""Python DataSourceV2 REST catalog (sources/restds.py): planning-time
filter pushdown semantics and end-to-end read correctness."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNotNull,
    LessThanOrEqual,
    StringStartsWith,
)

from financedatabase_spark.sources.restds import (
    FORMAT_NAME,
    RestCatalogDataSource,
    RestCatalogReader,
    register_rest_catalog,
)


@pytest.fixture(scope="module")
def endpoint(tmp_path_factory):
    """A small catalog parquet with a NULL partition key present."""
    path = os.path.join(tmp_path_factory.mktemp("restds"), "contracts.parquet")
    tbl = pa.table(
        {
            "symbol": ["AAPL"] * 3 + ["MSFT"] * 2 + ["NVDA"] * 2 + [None],
            "strike": [180.0, 185.0, 190.0, 400.0, 410.0, 900.0, 950.0, 1.0],
            "right": ["C", "P", "C", "C", "P", "C", "P", "C"],
        }
    )
    pq.write_table(tbl, path)
    return path


def _reader(endpoint, **opts):
    from pyspark.sql.pandas.types import from_arrow_schema

    schema = from_arrow_schema(pq.read_schema(endpoint))
    options = {"path": endpoint, "partition_col": "symbol", **opts}
    return RestCatalogReader(schema, options)


def test_pushdown_accepts_axis_filters_and_returns_rest(endpoint):
    r = _reader(endpoint)
    unsupported = list(
        r.pushFilters(
            [
                In(("symbol",), ("AAPL", "NVDA")),
                GreaterThan(("strike",), 100.0),  # not the axis -> back to Spark
                StringStartsWith(("symbol",), "A"),  # type not planned -> back
                IsNotNull(("right",)),
            ]
        )
    )
    assert {type(f).__name__ for f in unsupported} == {
        "GreaterThan",
        "StringStartsWith",
        "IsNotNull",
    }
    # planning prunes to exactly the two surviving keys, null gone
    assert [p.value for p in r.partitions()] == ["AAPL", "NVDA"]


def test_pushdown_range_on_axis_prunes(endpoint):
    r = _reader(endpoint)
    assert list(r.pushFilters([LessThanOrEqual(("symbol",), "MSFT"), EqualTo(("symbol",), "MSFT")])) == []
    assert [p.value for p in r.partitions()] == ["MSFT"]


def test_no_filters_keeps_null_partition(endpoint):
    r = _reader(endpoint)
    vals = [p.value for p in r.partitions()]
    assert vals == ["AAPL", "MSFT", "NVDA", None]


def test_end_to_end_matches_parquet_scan(spark, endpoint):
    register_rest_catalog(spark)
    ds = (
        spark.read.format(FORMAT_NAME)
        .option("path", endpoint)
        .option("partition_col", "symbol")
        .load()
    )
    # unfiltered read must surface ALL rows, including the null-key one
    want = spark.read.parquet(endpoint)
    key = lambda t: tuple(map(repr, t))
    assert sorted(map(tuple, ds.collect()), key=key) == sorted(map(tuple, want.collect()), key=key)

    # mixed pushdown: axis IN (pruned at planning) + non-axis range (Spark-side)
    got = ds.filter(F.col("symbol").isin("AAPL", "MSFT") & (F.col("strike") > 185.0))
    wnt = want.filter(F.col("symbol").isin("AAPL", "MSFT") & (F.col("strike") > 185.0))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, wnt.collect()))

    # null-safe semantics: IS NULL on the axis is NOT accepted by the
    # source (comparison filters only), so Spark applies it — and the
    # null partition carries the row
    got_null = ds.filter(F.col("symbol").isNull()).collect()
    assert len(got_null) == 1 and got_null[0]["strike"] == 1.0


def test_source_schema_is_arrow_derived(endpoint):
    class _Opts(dict):
        pass

    src = RestCatalogDataSource(_Opts(path=endpoint))
    names = [f.name for f in src.schema().fields]
    assert names == ["symbol", "strike", "right"]
