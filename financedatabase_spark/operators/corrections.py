"""Vendor-data corrections framework — SURVEY.md §2.13 X5, §2.2 P13.

The reference patches known-bad vendor rows post-hoc with YAML-registered
Python functions (patches/main.py:9-114, patches/p1.py:32-101 removes an
AAPL split-artifact date from list_dates results, applied per-endpoint in
switcher.py:42-43).

Spark-first shape: corrections are DATA, not code — a quarantine dimension
(query_name, symbol, bad_date) anti-joined against results as the final
plan stage. Config stays declarative (a dict/table, like the reference's
setup.yaml); the anti-join broadcasts the tiny dimension so the cost is a
map-side hash probe at any scale.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from financedatabase_spark.session import session_memo, values_dim

#: Default quarantine entries, mirroring the reference's p1 patch shape:
#: (query_name, symbol, bad_date). The reference's only shipped patch
#: removes 2014-06-09 (AAPL 7:1 split artifact) from AAPL list_dates
#: (patches/p1.py:32-101).
DEFAULT_QUARANTINE: list[tuple[str, str, str]] = [
    ("list_dates", "AAPL", "2014-06-09"),
]

def quarantine_dim(
    spark: SparkSession,
    entries: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Memoized per live session — same rationale as alias.alias_dim
    (session memo, evicted with the session; VALUES LocalRelation so
    broadcasting costs no Python->JVM job)."""
    use = tuple(entries or DEFAULT_QUARANTINE)

    def build() -> DataFrame:
        rows = [(q, s, dt.date.fromisoformat(d)) for q, s, d in use]
        return values_dim(
            spark, rows, "query_name string, symbol string, bad_date date"
        )

    return session_memo(spark, ("quarantine_dim", use), build)


def load_quarantine_config(path: str) -> list[tuple[str, str, str]]:
    """File-driven corrections config — the declarative counterpart of
    the reference's patch registry (patches/setup.yaml loaded by
    patches/main.py:95-114 ``setup()``, entries certified by
    ``certify_function_signature`` main.py:68-93 before registration).

    Accepts YAML (PyYAML available) or JSON with the reference's shape,
    data-first:

    .. code-block:: yaml

        patches:
          - query_name: list_dates   # reference: func_name
            symbol: AAPL
            bad_date: 2014-06-09
            enabled: true            # optional, default true
            description: ...         # optional, ignored

    Each entry is CERTIFIED before it registers (the reference raises
    ValueError on an uncertified patch function; we raise on a
    malformed entry): required keys present, ``bad_date`` ISO-parses,
    values are strings. Entries with ``enabled: false`` are skipped —
    the per-query targeting the reference gets from ``func_name``.
    Returns (query_name, symbol, bad_date) tuples for `quarantine_dim`.
    """
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        import json

        config = json.loads(text)
    else:
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover - baked into the env
            raise ImportError(
                "PyYAML is required for YAML corrections configs; "
                "use a .json file instead"
            ) from exc
        config = yaml.safe_load(text)
    if not isinstance(config, dict) or not isinstance(config.get("patches"), list):
        raise ValueError(f"{path}: expected a mapping with a 'patches' list")
    entries: list[tuple[str, str, str]] = []
    for i, patch in enumerate(config["patches"]):
        where = f"{path}: patches[{i}]"
        if not isinstance(patch, dict):
            raise ValueError(f"{where}: expected a mapping")
        missing = [k for k in ("query_name", "symbol", "bad_date") if k not in patch]
        if missing:
            raise ValueError(f"{where}: missing required key(s) {missing}")
        q, s, d = patch["query_name"], patch["symbol"], patch["bad_date"]
        if not (isinstance(q, str) and q and isinstance(s, str) and s):
            raise ValueError(f"{where}: query_name and symbol must be non-empty strings")
        # YAML parses "2014-06-09 00:00:00" to datetime (a dt.date
        # subclass) — take its date part, not the full isoformat.
        if isinstance(d, dt.datetime):
            d = d.date().isoformat()
        elif isinstance(d, dt.date):
            d = d.isoformat()
        else:
            d = str(d)
        try:
            dt.date.fromisoformat(d)
        except ValueError as exc:
            raise ValueError(f"{where}: bad_date {d!r} is not an ISO date") from exc
        if patch.get("enabled", True):
            entries.append((q, s, d))
    return entries


def apply_corrections(
    df: DataFrame,
    quarantine: DataFrame,
    query_name: str,
    symbol_col: str = "symbol",
    date_col: Column | str = "ts",
) -> DataFrame:
    """P13 — drop quarantined (symbol, date) rows for this query via a
    broadcast anti-join (reference behavior: patches/p1.py:66-101,
    symbol-specific and endpoint-specific)."""
    q = F.broadcast(
        quarantine.filter(F.col("query_name") == query_name).select("symbol", "bad_date")
    )
    d = F.to_date(F.col(date_col) if isinstance(date_col, str) else date_col)
    return df.join(
        q,
        (df[symbol_col] == q["symbol"]) & (d == q["bad_date"]),
        "left_anti",
    )
