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
    symbol-specific and endpoint-specific). A SMALL literal quarantine
    dim folds into a NOT filter codegen'd into the surrounding stage —
    no BroadcastExchange job (anti-join null semantics preserved: a
    NULL symbol/date never matches, so the row is KEPT)."""
    from financedatabase_spark.operators.alias import LITERAL_FOLD_MAX

    d = F.to_date(F.col(date_col) if isinstance(date_col, str) else date_col)
    rows = getattr(quarantine, "_literal_rows", None)
    if (
        rows is not None
        and len(rows) <= LITERAL_FOLD_MAX
        and quarantine.columns == ["query_name", "symbol", "bad_date"]
    ):
        drop = None
        for qn, sym, bad in rows:
            if qn != query_name:
                continue
            cond = (F.col(symbol_col) == F.lit(sym)) & (d == F.lit(bad))
            drop = cond if drop is None else (drop | cond)
        if drop is None:  # no entries for this query
            return df
        return df.filter(~F.coalesce(drop, F.lit(False)))
    q = F.broadcast(
        quarantine.filter(F.col("query_name") == query_name).select("symbol", "bad_date")
    )
    return df.join(
        q,
        (df[symbol_col] == q["symbol"]) & (d == q["bad_date"]),
        "left_anti",
    )


# --- domain / URL blocklist filtering (C4-style curation stage) -------------
#
# Same data-not-code shape as the quarantine dim above, applied to a URL
# column instead of (symbol, date): a blocklist of registrable domains
# quarantines every document whose URL host equals a blocked domain OR sits
# under it ("spamfarm.example" also blocks "cdn.spamfarm.example") — the
# suffix-match semantics of C4/CCNet per-domain filtering.

#: Default blocked registrable domains — overridable the same way
#: `quarantine_dim` entries are.
DEFAULT_DOMAIN_BLOCKLIST: list[str] = [
    "spamfarm.example",
]

#: host extraction: scheme, optional userinfo@, then everything up to the
#: first of [:/?#]. RE2∩Java common subset so the DuckDB oracle can use the
#: identical pattern.
_HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def domain_blocklist_dim(
    spark: SparkSession, domains: list[str] | None = None
) -> DataFrame:
    """Blocked-domain dimension (single `domain` column), memoized per
    session like `quarantine_dim` — a VALUES LocalRelation so broadcasting
    it costs no job."""
    use = tuple(d.lower().strip(".") for d in (domains or DEFAULT_DOMAIN_BLOCKLIST))

    def build() -> DataFrame:
        return values_dim(spark, [(d,) for d in use], "domain string")

    return session_memo(spark, ("domain_blocklist_dim", use), build)


def registrable_host(url: Column | str) -> Column:
    """Lower-cased host of a URL: scheme and userinfo stripped, cut at the
    first port/path/query/fragment delimiter. No www-stripping — suffix
    matching in `filter_blocked_domains` subsumes it."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(F.lower(u), _HOST_PATTERN, 1)


def host_suffix_chain(host: Column) -> Column:
    """Dot-suffix chain of a host: 'cdn.a.example' ->
    ['cdn.a.example', 'a.example', 'example']. Bounded by label count
    (~5 in practice), so exploding it is O(1) per row."""
    parts = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts) - i + 1), "."),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
) -> DataFrame:
    """Drop rows whose URL host is a blocked domain or any subdomain of
    one. Pass ``host_col`` to reuse an already-extracted host column.

    Scale shape: the decision depends only on the host string, so the
    (wide) corpus rows never explode — distinct hosts (tiny vs. the
    corpus; partial-agg combines map-side) explode into their bounded
    dot-suffix chains and semi-join the BROADCAST blocklist; the
    resulting blocked-host set (≤ distinct hosts under blocked apexes)
    broadcasts back for a map-side anti-join, so the corpus itself never
    shuffles. If the blocked-host set ever outgrows the broadcast
    threshold, drop the second hint and let AQE pick the join.
    """
    host = F.col(host_col) if host_col else registrable_host(F.col(url_col))
    with_host = df.withColumn("_host", host)
    hosts = with_host.select("_host").distinct()
    blocked_hosts = (
        hosts.select("_host", F.explode(host_suffix_chain(F.col("_host"))).alias("_dsuf"))
        .join(F.broadcast(blocklist), F.col("_dsuf") == blocklist["domain"], "left_semi")
        .select("_host")
    )
    return (
        with_host.join(F.broadcast(blocked_hosts), "_host", "left_anti")
        .drop("_host")
    )
