"""Reference-compatible public API surface.

The reference's public package exports 13 retrieval calls plus utilities
(dbase/DataAPI/ThetaData/__init__.py:40-66). This module re-exposes that
surface over the engine: an `OptionsMarket` bound to a bulk options-ticks
table (the lakehouse replaces the ThetaData HTTP terminal as the source)
with the SAME call names and filter semantics, each returning a lazy
DataFrame instead of a pandas frame.

The v2/v3 switcher (switcher.py:29-43) disappears by design — one
implementation, one schema (SURVEY.md §2.13 X3). Every call composes the
engine's operators: ticker-change splicing (X1), session calendar (P5/P6),
resampling (A1), keep-last dedup (P8), corrections (X5), quote→EOD
fallback (X4).

Expected ticks schema (FIXTURES.md T5/T6 bulk shape):
    root string, expiration date, strike double, right string('C'/'P'),
    ts timestamp, bid double, ask double, bid_size long, ask_size long
    [, volume long, seq long]
Open interest (T4 + identity): root, expiration, strike, right, ts,
    open_interest long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.errors import require_columns
from financedatabase_spark.functions import columns as C
from financedatabase_spark.operators.alias import canonicalize_symbols
from financedatabase_spark.operators.calendar import enforce_business_hours
from financedatabase_spark.operators.corrections import apply_corrections
from financedatabase_spark.operators.dedup import dedup_keep_last
from financedatabase_spark.operators.joins import bar_fill_join
from financedatabase_spark.operators.resample import resample

IDENTITY = ["root", "expiration", "strike", "right"]


class OptionsMarket:
    """The reference's retrieval surface over a ticks/OI table pair."""

    def __init__(
        self,
        ticks: DataFrame,
        open_interest: DataFrame | None = None,
        aliases: DataFrame | None = None,
        quarantine: DataFrame | None = None,
    ):
        require_columns(ticks, "root", "ts", "bid", "ask")
        if aliases is not None:
            ticks = canonicalize_symbols(ticks, aliases, "root", "ts")
            if open_interest is not None:
                open_interest = canonicalize_symbols(open_interest, aliases, "root", "ts")
        self.ticks = ticks
        self.oi = open_interest
        self.quarantine = quarantine

    # -- predicates ---------------------------------------------------------

    def _contract(
        self,
        df: DataFrame,
        symbol: str,
        exp: str | None = None,
        right: str | None = None,
        strike: float | None = None,
        start_date: str | None = None,
        end_date: str | None = None,
    ) -> DataFrame:
        """The reference's query params (F18 `_build_params`,
        v3/utils.py:400-441) as pushdown-able predicates; wildcards by
        omission (strike='*' / right='both' ⇒ None here)."""
        out = df.filter(F.col("root") == symbol)
        if exp is not None:
            out = out.filter(F.col("expiration") == F.lit(exp).cast("date"))
        if right is not None:
            out = out.filter(F.col("right") == C.normalize_right(F.lit(right)))
        if strike is not None:
            out = out.filter(F.col("strike") == float(strike))
        if start_date is not None:
            out = out.filter(F.col("ts") >= F.lit(start_date).cast("timestamp"))
        if end_date is not None:
            # inclusive calendar-day upper bound, like the reference's
            # YYYYMMDD end param
            out = out.filter(
                F.to_date("ts") <= F.lit(end_date).cast("date")
            )
        return out

    def _quotes(self, symbol, exp, right, strike, start_date, end_date) -> DataFrame:
        q = self._contract(self.ticks, symbol, exp, right, strike, start_date, end_date)
        return q.withColumn("midpoint", C.midpoint("bid", "ask")).withColumn(
            "weighted_midpoint",
            C.weighted_midpoint("bid", "ask", "bid_size", "ask_size"),
        )

    def _order_cols(self) -> list[str]:
        return ["seq"] if "seq" in self.ticks.columns else ["ts"]

    # -- historical retrieval ----------------------------------------------

    def retrieve_quote(
        self, symbol, exp=None, right=None, strike=None,
        start_date=None, end_date=None, interval: str | None = None,
    ) -> DataFrame:
        """Quote history, optionally resampled to bars of `interval`
        (reference: switcher.retrieve_quote)."""
        q = self._quotes(symbol, exp, right, strike, start_date, end_date)
        if interval is None:
            return q
        from financedatabase_spark.operators.resample import interval_seconds

        return resample(
            q.select(*IDENTITY, "ts", *self._order_cols()[0:1],
                     "bid", "ask", "bid_size", "ask_size", "midpoint", "weighted_midpoint"),
            interval,
            ts_col="ts",
            key_cols=IDENTITY,
            order_cols=self._order_cols(),
            business_hours=interval_seconds(interval) < 86400,
        )

    def retrieve_ohlc(
        self, symbol, exp=None, right=None, strike=None,
        start_date=None, end_date=None, interval: str = "5m",
    ) -> DataFrame:
        """Intraday OHLC bars: quote grid drives a left bar-fill join of
        trade-derived OHLC (reference: v2.py:703-765 J1 + resample), with
        OHLC bootstrapped from the midpoint where no trades printed (F12).
        """
        q = self._quotes(symbol, exp, right, strike, start_date, end_date)
        ticks = q.select(
            *IDENTITY, "ts", *self._order_cols()[0:1],
            F.col("midpoint").alias("open"),
            F.col("midpoint").alias("high"),
            F.col("midpoint").alias("low"),
            F.col("midpoint").alias("close"),
            (F.col("volume") if "volume" in q.columns else F.lit(1)).cast("long").alias("volume"),
            "bid", "ask", "midpoint",
        )
        from financedatabase_spark.operators.resample import interval_seconds

        # the session filter applies to intraday bars only — daily+ buckets
        # start at midnight and would be filtered out (the reference likewise
        # enforces hours on intraday paths, v2.py:765, not EOD)
        return resample(
            ticks, interval, ts_col="ts", key_cols=IDENTITY,
            order_cols=self._order_cols(),
            business_hours=interval_seconds(interval) < 86400,
        )

    def retrieve_eod_ohlc(
        self, symbol, exp=None, right=None, strike=None,
        start_date=None, end_date=None,
    ) -> DataFrame:
        """EOD bars stamped at the 16:00 close (reference:
        switcher.retrieve_eod_ohlc → §3.1; EOD shift dbase/utils.py:7-22),
        corrections applied as the final stage (X5)."""
        daily = self.retrieve_ohlc(
            symbol, exp, right, strike, start_date, end_date, interval="1d"
        ).withColumn("ts", C.add_eod_timestamp("ts"))
        if self.quarantine is not None:
            daily = apply_corrections(
                daily, self.quarantine, "retrieve_eod_ohlc", symbol_col="root", date_col="ts"
            )
        return daily

    def retrieve_bulk_eod(self, symbol, exp=None, start_date=None, end_date=None) -> DataFrame:
        """Whole-chain EOD (reference: retrieve_bulk_eod, renames at
        Organizers.py:58-66 applied by callers)."""
        return self.retrieve_eod_ohlc(symbol, exp, None, None, start_date, end_date)

    def retrieve_openInterest(
        self, symbol, exp=None, right=None, strike=None, start_date=None, end_date=None
    ) -> DataFrame:
        if self.oi is None:
            raise ValueError("no open-interest table bound")
        return self._contract(self.oi, symbol, exp, right, strike, start_date, end_date)

    def retrieve_bulk_open_interest(self, symbol, exp=None, start_date=None, end_date=None) -> DataFrame:
        return self.retrieve_openInterest(symbol, exp, None, None, start_date, end_date)

    # -- realtime snapshots (R1) -------------------------------------------

    def retrieve_quote_rt(self, symbol, exp=None, right=None, strike=None) -> DataFrame:
        """Latest quote per contract (reference polls v2.py:456-524; here a
        keep-last view over the same table a stream would maintain)."""
        q = self._quotes(symbol, exp, right, strike, None, None)
        return dedup_keep_last(q, IDENTITY, ["ts", *self._order_cols()])

    def retrieve_bulk_quote_rt(self, symbol) -> DataFrame:
        return self.retrieve_quote_rt(symbol)

    def retrieve_chain_bulk(self, symbol, at_time: str | None = None) -> DataFrame:
        """Chain snapshot at a moment (reference: retrieve_chain_bulk):
        last quote at-or-before `at_time` per contract."""
        q = self._quotes(symbol, None, None, None, None, None)
        if at_time is not None:
            q = q.filter(F.col("ts") <= F.lit(at_time).cast("timestamp"))
        return dedup_keep_last(q, IDENTITY, ["ts", *self._order_cols()])

    # -- listings (SET1/O2) -------------------------------------------------

    def list_contracts(self, symbol, start_date: str | None = None) -> DataFrame:
        """Distinct contracts trading on/after a date (reference:
        list_contracts, v3/endpoints.py:303-379)."""
        t = self._contract(self.ticks, symbol, start_date=start_date)
        return t.select(*IDENTITY).distinct()

    def list_dates(self, symbol, exp=None, right=None, strike=None) -> DataFrame:
        """Distinct trade dates for a contract, sorted (reference:
        list_dates + SET1 union-distinct across ticker changes — the alias
        canonicalization in __init__ already merged old-symbol history)."""
        t = self._contract(self.ticks, symbol, exp, right, strike)
        return t.select(F.to_date("ts").alias("date")).distinct().orderBy("date")

    # -- X4 fallback --------------------------------------------------------

    def quote_to_eod_patch(self, symbol, exp=None, right=None, strike=None,
                           start_date=None, end_date=None) -> DataFrame:
        """Quote-derived EOD rows (Volume=NULL) for days missing from the
        trade-derived EOD — the reference's ThetaDataParseError fallback
        (v2.py:239-335; quote-EOD has NaN volume, v2.py:333-335)."""
        eod = self.retrieve_eod_ohlc(symbol, exp, right, strike, start_date, end_date)
        quotes_daily = resample(
            self._quotes(symbol, exp, right, strike, start_date, end_date).select(
                *IDENTITY, "ts", *self._order_cols()[0:1], "midpoint"
            ),
            "1d", ts_col="ts", key_cols=IDENTITY, order_cols=self._order_cols(),
            agg_overrides={"midpoint": "last"}, fill_gaps=False,
        ).withColumn("ts", C.add_eod_timestamp("ts"))
        fallback = quotes_daily.join(
            eod.select(*IDENTITY, "ts"), [*IDENTITY, "ts"], "left_anti"
        ).select(
            *IDENTITY, "ts",
            F.col("midpoint").alias("open"), F.col("midpoint").alias("high"),
            F.col("midpoint").alias("low"), F.col("midpoint").alias("close"),
            F.lit(None).cast("long").alias("volume"),
        )
        return eod.select(*IDENTITY, "ts", "open", "high", "low", "close", "volume").unionByName(
            fallback
        )


# utility re-exports matching the reference's `from .utils import …` block
from financedatabase_spark.functions.columns import (  # noqa: E402
    add_eod_timestamp,
    bootstrap_ohlc_cols as bootstrap_ohlc,
    time_str_to_ms_of_day as convert_time_to_miliseconds,
)
from financedatabase_spark.operators.calendar import (  # noqa: E402
    enforce_business_hours as enforce_bus_hours,
)
from financedatabase_spark.operators.resample import (  # noqa: E402
    parse_interval,
    resample,
)


def extract_numeric_value(timeframe_str: str) -> tuple[str, int]:
    """Split ``'5m'`` into ``('m', 5)`` — unit first, count second, matching
    the reference's return order (ThetaData/utils.py:457-461). The engine's
    `parse_interval` (F10) does the parsing; this is the exact-surface
    wrapper."""
    n, unit = parse_interval(timeframe_str)
    return unit, n


def identify_length(string: str, integer: int, rt: bool = False) -> int:
    """Timeframe length in minutes (``rt=True``) or trading periods
    (``rt=False``) — reference: ThetaData/utils.py:231-263."""
    values = (
        {"m": 1, "h": 60, "d": 60 * 24, "w": 60 * 24 * 7}
        if rt
        else {"d": 1, "w": 5, "m": 30, "y": 252, "q": 91}
    )
    if string not in values:
        raise ValueError(f"Available timeframes are {list(values)}, received {string!r}")
    return values[string] * integer


def is_retrieval_successful(response) -> bool:
    """True when a retrieval returned data rather than an error message
    (reference: is_theta_data_retrieval_successful,
    ThetaData/utils.py:227-228 — error paths return strings)."""
    return not isinstance(response, str)


#: Reference-spelled alias (ThetaData/__init__.py:61).
is_theta_data_retrieval_successful = is_retrieval_successful

__all__ = [
    "OptionsMarket",
    "resample",
    "bootstrap_ohlc",
    "convert_time_to_miliseconds",
    "extract_numeric_value",
    "identify_length",
    "is_retrieval_successful",
    "is_theta_data_retrieval_successful",
    "enforce_bus_hours",
    "add_eod_timestamp",
]
