"""Market-frame normalization — the reference's `_new_dataframe_formatting`
(dbase/DataAPI/ThetaData/v3/utils.py:284-397) as one declarative pass:

1. required-column check (`timestamp` → MissingColumnError, :292-295)
2. lowercase names, `timestamp` → engine ts column (:298-299)
3. drop exchange/condition noise columns (:302-331)
4. `symbol` → `root` rename (:347-348)
5. right normalization upper-first-char (:334-336)
6. strike wire→display ÷1000 round 3 (:339-340)
7. derive midpoint / weighted_midpoint (:351-357)
8. single-contract queries drop identity columns (`is_bulk` flag, :302-331)
9. legacy output shape: capitalize names, Bid→CloseBid (:388-391),
   EOD midnight→16:00 shift (dbase/utils.py:7-22)

Everything is a Column expression — Catalyst fuses the whole pass into
the scan projection; the LoC the reference spends on imperative pandas
mutation becomes one `select`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financedatabase_spark.errors import require_columns
from financedatabase_spark.functions import columns as C

#: Vendor noise columns dropped on sight (reference list v3/utils.py:302-331).
NOISE_COLUMNS = (
    "bid_exchange",
    "ask_exchange",
    "bid_condition",
    "ask_condition",
    "condition",
    "exchange",
    "date",
    "ms_of_day",
    "ms_of_day2",
)

IDENTITY_COLUMNS = ("root", "strike", "expiration", "right")


def normalize_market_frame(
    df: DataFrame,
    ts_col: str = "timestamp",
    is_bulk: bool = True,
    legacy_names: bool = False,
    eod: bool = False,
) -> DataFrame:
    """Impose the engine's standard market-data shape on a raw vendor frame."""
    require_columns(df, ts_col)
    # lowercase + drop noise
    cols = []
    seen = set()
    for name in df.columns:
        low = name.lower()
        if low in NOISE_COLUMNS or low in seen:
            continue
        seen.add(low)
        cols.append(F.col(name).alias(low))
    out = df.select(*cols).withColumnRenamed(ts_col.lower(), "ts")
    if "symbol" in out.columns and "root" not in out.columns:
        out = out.withColumnRenamed("symbol", "root")
    if "right" in out.columns:
        out = out.withColumn("right", C.normalize_right("right"))
    if "strike" in out.columns:
        # wire form (×1000 int) normalizes to display; already-display
        # strikes (small doubles) pass through unchanged
        out = out.withColumn(
            "strike",
            F.when(F.col("strike") > 10000, C.strike_from_wire("strike")).otherwise(
                F.round(F.col("strike").cast("double"), 3)
            ),
        )
    if "bid" in out.columns and "ask" in out.columns:
        out = out.withColumn("midpoint", C.midpoint("bid", "ask"))
        if "bid_size" in out.columns and "ask_size" in out.columns:
            out = out.withColumn(
                "weighted_midpoint",
                C.weighted_midpoint("bid", "ask", "bid_size", "ask_size"),
            )
    if not is_bulk:
        out = out.drop(*[c for c in IDENTITY_COLUMNS if c in out.columns])
    if eod:
        out = out.withColumn("ts", C.add_eod_timestamp("ts"))
    if legacy_names:
        renames = {"bid": "CloseBid", "ask": "CloseAsk"}
        for name in out.columns:
            out = out.withColumnRenamed(
                name, renames.get(name, name[:1].upper() + name[1:])
            )
    return out
