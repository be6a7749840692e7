"""Engine error taxonomy — the reference's typed exceptions re-scoped.

The reference defines a vendor-error hierarchy (dbase/DataAPI/
ThetaExceptions.py): MissingColumnError for schema violations (:5-8) and
transient-vs-permanent HTTP classes driving its retry decorator
(:95-139). In this engine, transient-error retry is Spark's task-retry
machinery (R5 — spark.task.maxFailures); what remains engine-level is
schema validation at plan-construction time, which fails FAST on the
driver instead of mid-job on an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class EngineError(Exception):
    """Base class for financedatabase_spark errors."""


class MissingColumnError(EngineError):
    """A required column is absent (reference: ThetaExceptions.py:5-8,
    raised by the normalization pass v3/utils.py:292-295)."""

    def __init__(self, missing: list[str], present: list[str]):
        self.missing = missing
        super().__init__(
            f"required column(s) {missing} not in frame (has {present})"
        )


def require_columns(df: DataFrame, *cols: str) -> DataFrame:
    """Validate schema at plan time; returns the frame for chaining."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise MissingColumnError(missing, df.columns)
    return df
