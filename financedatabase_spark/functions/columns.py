"""Scalar column-expression library (SURVEY.md §2.8 F1–F14).

Every function here returns a native Spark `Column` — no Python UDFs —
so each stays inside WholeStageCodegen and costs the same as a built-in.
Each docstring cites the reference behavior it reproduces
(file:line under /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Market session constants (reference: dbase/utils.py:39-49; US equity session)
# ---------------------------------------------------------------------------
MARKET_OPEN_MINUTES = 9 * 60 + 30  # 09:30
MARKET_CLOSE_MINUTES = 16 * 60  # 16:00


def midpoint(bid: Column | str, ask: Column | str) -> Column:
    """F1 — quote midpoint ``(bid + ask) / 2``.

    Reference: dbase/DataAPI/ThetaData/v2.py:889, v3/utils.py:351-352.
    """
    return (F.col(bid) + F.col(ask)) / F.lit(2.0) if isinstance(bid, str) else (bid + ask) / F.lit(2.0)


def weighted_midpoint(
    bid: Column | str,
    ask: Column | str,
    bid_size: Column | str,
    ask_size: Column | str,
) -> Column:
    """F2 — size-weighted midpoint ``(bid*bid_size + ask*ask_size) / (bid_size+ask_size)``.

    The reference writes this two algebraically-identical ways
    (v2.py:890-896 vs v3/utils.py:355-357); implemented once here.
    Returns null when both sizes are 0 (0/0), matching pandas NaN.
    """
    b, a = F.col(bid) if isinstance(bid, str) else bid, F.col(ask) if isinstance(ask, str) else ask
    bs = F.col(bid_size) if isinstance(bid_size, str) else bid_size
    as_ = F.col(ask_size) if isinstance(ask_size, str) else ask_size
    denom = bs + as_
    return F.when(denom != 0, (b * bs + a * as_) / denom)


def strike_from_wire(wire: Column | str) -> Column:
    """F3 — wire strike (int, ×1000) → display strike, rounded to 3dp.

    Reference: v2.py:567 (÷1000), v3/utils.py:339-340 (round 3).
    """
    c = F.col(wire) if isinstance(wire, str) else wire
    return F.round(c / F.lit(1000.0), 3)


def strike_to_wire(strike: Column | str) -> Column:
    """F3 inverse — display strike → wire int ×1000 (v2.py:649-650)."""
    c = F.col(strike) if isinstance(strike, str) else strike
    return F.round(c * F.lit(1000.0), 0).cast("long")


def normalize_right(right: Column | str) -> Column:
    """F4 — option right → first char uppercased ('call' → 'C').

    Reference: v3/utils.py:334-336 (`x.upper()[0]`).
    """
    c = F.col(right) if isinstance(right, str) else right
    return F.upper(F.substring(c, 1, 1))


def ms_of_day_to_time_str(ms: Column | str) -> Column:
    """F5 — milliseconds-of-day int → ``HH:MM:SS`` string.

    Reference: v2.py:2002-2009 `convert_milliseconds`, utils.py:260-266.
    """
    c = (F.col(ms) if isinstance(ms, str) else ms).cast("long")
    secs = (c / F.lit(1000)).cast("long")
    return F.concat_ws(
        ":",
        F.lpad((secs / 3600).cast("long").cast("string"), 2, "0"),
        F.lpad(((secs % 3600) / 60).cast("long").cast("string"), 2, "0"),
        F.lpad((secs % 60).cast("string"), 2, "0"),
    )


def time_str_to_ms_of_day(t: Column | str) -> Column:
    """F6 — ``HH:MM[:SS]`` string → milliseconds-of-day int.

    Reference: v2.py:2013-2019 `convert_time_to_miliseconds`, utils.py:269-275.
    """
    c = F.col(t) if isinstance(t, str) else t
    parts = F.split(c, ":")
    h = parts.getItem(0).cast("long")
    m = parts.getItem(1).cast("long")
    s = F.coalesce(parts.getItem(2).cast("long"), F.lit(0))
    return ((h * 3600 + m * 60 + s) * 1000).cast("long")


def ms_of_day(ts: Column | str) -> Column:
    """Milliseconds-of-day of a timestamp (the reference's ``Ms_of_day``
    column, v2.py:701)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (
        (F.hour(c) * 3600_000 + F.minute(c) * 60_000 + F.second(c) * 1000).cast("long")
    )


def normalize_date_format(d: Column | str, style: int = 1) -> Column:
    """F7 — any date-ish value → ``YYYY-MM-DD`` (style 1) or ``YYYYMMDD`` (style 2).

    Reference: utils.py:443-454 `normalize_date_format`.
    """
    c = F.col(d) if isinstance(d, str) else d
    s = c.cast("string")
    # regex-guarded branches: ANSI mode (Spark 4 default) errors on a failed
    # to_date instead of returning null, so each format only parses when the
    # string's shape matches
    as_date = (
        F.when(s.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.to_date(s, "yyyy-MM-dd"))
        .when(s.rlike(r"^\d{8}$"), F.to_date(s, "yyyyMMdd"))
        .when(s.rlike(r"^\d{2}/\d{2}/\d{4}$"), F.to_date(s, "MM/dd/yyyy"))
        .otherwise(F.to_date(c))
    )
    return F.date_format(as_date, "yyyy-MM-dd" if style == 1 else "yyyyMMdd")


def date_to_wire_int(d: Column | str) -> Column:
    """F13 — date → int YYYYMMDD for the wire (v2.py:826-830)."""
    c = F.col(d) if isinstance(d, str) else d
    return F.date_format(c, "yyyyMMdd").cast("int")


def wire_int_to_date(i: Column | str) -> Column:
    """F13 inverse — int YYYYMMDD → date."""
    c = F.col(i) if isinstance(i, str) else i
    return F.to_date(c.cast("string"), "yyyyMMdd")


def add_eod_timestamp(ts: Column | str, close_hour: int = 16) -> Column:
    """F8 — midnight-stamped EOD rows shifted to the market close hour.

    Reference: dbase/utils.py:7-22 `add_eod_timestamp` (if all times are
    00:00, shift to 16:00). Implemented row-wise: midnight rows shift,
    others pass through — callers that need the all-rows-midnight guard
    check it with an aggregate first.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    is_midnight = (F.hour(c) == 0) & (F.minute(c) == 0) & (F.second(c) == 0)
    return F.when(is_midnight, c + F.expr(f"INTERVAL {close_hour} HOURS")).otherwise(c)


def default_timestamp(ts: Column | str) -> Column:
    """F9 — truncate timestamps to midnight (dbase/utils.py:25-36)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_trunc("day", c)


def option_tick(
    symbol: Column | str,
    expiration: Column | str,
    right: Column | str,
    strike: Column | str,
) -> Column:
    """F11 — compact option ticker ``AAPL20241220C180`` from components.

    Reference: utils.py:512-545 `parse_option_tick` round-trip. Strike is
    rendered without trailing zeros (180.0 → '180', 180.5 → '180.5'),
    matching Python str() of a trimmed float.
    """
    sym = F.col(symbol) if isinstance(symbol, str) else symbol
    exp = F.col(expiration) if isinstance(expiration, str) else expiration
    r = F.col(right) if isinstance(right, str) else right
    k = F.col(strike) if isinstance(strike, str) else strike
    strike_str = F.regexp_replace(
        F.regexp_replace(F.format_number(k.cast("double"), 3), ",", ""),
        r"\.?0+$",
        "",
    )
    return F.concat(sym, F.date_format(exp, "yyyyMMdd"), normalize_right(r), strike_str)


def parse_option_tick(tick: Column | str) -> Column:
    """F11 inverse — ``AAPL20241220C180`` → struct(symbol, expiration, right, strike).

    Reference: utils.py:512-545.
    """
    c = F.col(tick) if isinstance(tick, str) else tick
    pat = r"^([A-Z]+)(\d{8})([CP])([0-9.]+)$"
    return F.struct(
        F.regexp_extract(c, pat, 1).alias("symbol"),
        F.to_date(F.regexp_extract(c, pat, 2), "yyyyMMdd").alias("expiration"),
        F.regexp_extract(c, pat, 3).alias("right"),
        F.regexp_extract(c, pat, 4).cast("double").alias("strike"),
    )


def occ_option_symbol(
    symbol: Column | str,
    expiration: Column | str,
    right: Column | str,
    strike: Column | str,
) -> Column:
    """F11 (OCC 21-char variant) — ``AAPL  241220C00180000``.

    Root padded to 6, YYMMDD, right, strike ×1000 zero-padded to 8.
    Reference: dbase/DataAPI/Alpaca.py:246-273.
    """
    sym = F.col(symbol) if isinstance(symbol, str) else symbol
    exp = F.col(expiration) if isinstance(expiration, str) else expiration
    r = F.col(right) if isinstance(right, str) else right
    k = F.col(strike) if isinstance(strike, str) else strike
    return F.concat(
        F.rpad(sym, 6, " "),
        F.date_format(exp, "yyMMdd"),
        normalize_right(r),
        F.lpad(strike_to_wire(k).cast("string"), 8, "0"),
    )


def parse_occ_option_symbol(occ: Column | str) -> Column:
    """OCC 21-char symbol → struct (Alpaca.py:276-310)."""
    c = F.col(occ) if isinstance(occ, str) else occ
    return F.struct(
        F.trim(F.substring(c, 1, 6)).alias("symbol"),
        F.to_date(F.substring(c, 7, 6), "yyMMdd").alias("expiration"),
        F.substring(c, 13, 1).alias("right"),
        (F.substring(c, 14, 8).cast("long") / 1000.0).alias("strike"),
    )


def bootstrap_ohlc_cols(prefix_cols: dict[str, Column | str], midpoint_col: Column | str) -> list[Column]:
    """F12 — coalesce missing OHLC columns from the midpoint.

    Reference: utils.py:278-300 / v2.py:1303-1330 `bootstrap_ohlc`: any of
    open/high/low/close that is null takes the row's midpoint.
    Returns aliased Columns ready for `select`.
    """
    mid = F.col(midpoint_col) if isinstance(midpoint_col, str) else midpoint_col
    out = []
    for name, col in prefix_cols.items():
        c = F.col(col) if isinstance(col, str) else col
        out.append(F.coalesce(c, mid).alias(name))
    return out


def scrub_inf_nan(col: Column | str, fill: float = 0.0) -> Column:
    """F14 — replace ±inf and NaN/null with ``fill`` before persistence.

    Reference: Organizers.py:288-292 (`replace([inf,-inf],0)` + `fillna(0)`).
    """
    c = F.col(col) if isinstance(col, str) else col
    bad = F.isnan(c) | c.isNull() | (c == float("inf")) | (c == float("-inf"))
    return F.when(bad, F.lit(fill)).otherwise(c)


def year_fraction(start: Column | str, end: Column | str, basis: float = 365.0) -> Column:
    """U5 — year fraction between two dates (Organizers.py:131 call site)."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.datediff(e, s) / F.lit(basis)
