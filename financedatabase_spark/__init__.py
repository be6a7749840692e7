"""financedatabase_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference single-node finance platform (Zino-ctrlZ/FinanceDatabase, studied
read-only at /root/reference), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst does pushdown/pruning/join choice)
- window aggregation for time-bucket resampling
- broadcast dimension joins for calendars / ticker aliases / corrections
- vectorized pandas UDFs only for genuinely non-relational math (IV, greeks)
- anti-join / overwrite rewrites for the reference's SQL DML semantics
- Structured Streaming for the reference's polling-snapshot realtime paths

Layout (SURVEY.md §7):
    sources/    scans, table registry, environment catalog
    functions/  scalar column expressions + pandas-UDF analytics
    operators/  resample, joins, dedup, calendar, alias splice, corrections,
                DML rewrites, text/dedup/similarity pipeline ops
    plans/      multi-step plan builders (ETL pipelines)
    streaming/  latest-state snapshot + streaming bar views
"""

from financedatabase_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
