"""Driver-mimicking parity gate: every registered query with an oracle must
match DuckDB on the same parquet tables (row count + schema + values)."""

import pytest

from financedatabase_spark.plans.registry import ORACLE_SQL, QUERIES
from tests.conftest import run_parity


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, duck, sf_dir, name):
    # exact (bit-level) comparison — see assert_frames_match
    run_parity(spark, duck, sf_dir, name, rtol=0.0)


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        # every query must at least run; rows may legitimately be 0 for
        # anti-join style checks, so only evaluate the plan
        df.limit(1).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
