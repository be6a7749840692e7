import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")

# The oracle suite is SHAPED AROUND DuckDB-1.0 semantics documented in
# plans/oracles_analytics.py: the list_reduce struct-accumulator batch
# bug (workaround: branchless folds / recursive-CTE levels), per-
# reference CTE inlining (workaround: AS MATERIALIZED), and lambda
# captured-subtree re-evaluation. A different DuckDB would silently
# change what the oracles compute — fail loudly instead.
if not duckdb.__version__.startswith("1.0."):
    raise RuntimeError(
        f"oracle suite is calibrated for DuckDB 1.0.x, found "
        f"{duckdb.__version__}; re-audit the workarounds documented in "
        "financedatabase_spark/plans/oracles_analytics.py before bumping"
    )
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from financedatabase_spark.session import get_spark

    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{TESTDATA}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver compare: columns sorted by name, rows order-insensitive."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            col = pdf[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            # unify precision (Spark→ns, DuckDB→us): with NaT present the
            # pandas comparator falls back to raw int64 views, where a
            # unit mismatch is a spurious x1000 diff
            pdf[c] = col.astype("datetime64[us]")
        elif pd.api.types.is_object_dtype(pdf[c]):
            import datetime as _dt

            nonnull = pdf[c].dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], _dt.date):
                pdf[c] = pd.to_datetime(pdf[c])
            else:
                pdf[c] = pdf[c].astype(str)
    sort_cols = list(pdf.columns)
    return pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol=0.0, atol=0.0):
    """Default is EXACT float equality — the engine guarantees bit-identical
    results vs the oracle (decimal sums, fixed fold orders, int64-decimal
    casts); pass a tolerance only for queries documented as approximate."""
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"schema mismatch: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            np.testing.assert_allclose(
                av.astype(float).to_numpy(),
                bv.astype(float).to_numpy(),
                rtol=rtol,
                atol=atol,
                equal_nan=True,
                err_msg=f"column {c}",
            )
        else:
            pd.testing.assert_series_equal(
                av, bv, check_dtype=False, check_names=False, obj=f"column {c}"
            )


def run_parity(spark, duck, sf_dir, name: str, rtol=1e-9):
    """Run one registered query against its DuckDB oracle."""
    from financedatabase_spark.plans.registry import ORACLE_SQL, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(ORACLE_SQL[name]).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, rtol=rtol)
    return spark_pdf
