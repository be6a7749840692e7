"""End-to-end §3.3 write pipeline: risk analytics → filtered save →
insert-ignore persistence. The reference's guarantee is idempotency
(INSERT IGNORE on the PK, SQLHelpers.py:651-686): re-running the same ETL
must not duplicate rows; new rows must append."""

from pyspark.sql import functions as F

from financedatabase_spark.operators.io_sinks import ParquetTable, insert_ignore
from financedatabase_spark.plans.registry import QUERIES


def _persist_once(spark, table: ParquetTable, batch_df, pk):
    if table.exists():
        target = table.read()
        merged = insert_ignore(target, batch_df, pk)
        new_rows = merged.count() - target.count()
        table.rewrite(merged)
        return new_rows
    table.write(batch_df, mode="overwrite")
    return batch_df.count()


def test_risk_pipeline_idempotent_persistence(spark, sf_dir, tmp_path):
    out = QUERIES["risk_pipeline"](spark, sf_dir).localCheckpoint()
    n = out.count()
    table = ParquetTable(spark, str(tmp_path / "option_risks"))

    assert _persist_once(spark, table, out, ["p_partkey"]) == n
    # replay the identical batch → zero new rows, count unchanged
    assert _persist_once(spark, table, out, ["p_partkey"]) == 0
    assert table.read().count() == n

    # a batch with half old / half new keys appends only the new half
    shifted = out.withColumn(
        "p_partkey",
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_partkey") + 1_000_000).otherwise(
            F.col("p_partkey")
        ),
    ).localCheckpoint()
    n_new = shifted.filter(F.col("p_partkey") >= 1_000_000).count()
    assert _persist_once(spark, table, shifted, ["p_partkey"]) == n_new
    assert table.read().count() == n + n_new
    # target rows kept their original values (insert-IGNORE, not upsert)
    assert table.read().filter(F.col("p_partkey") < 1_000_000).count() == n
