"""Query registry — the driver-checked operator inventory.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle string over the same parquet tables. The driver hashes
both results order-insensitively with columns sorted by name, so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its oracle) to the registry.

    Each registered build runs inside a `session.build_scope`: operators
    that materialize intermediates (`session.barrier`) register their
    checkpoint handles there, and REBUILDING the same query releases the
    previous build's blocks up front — deterministic checkpoint lifecycle
    instead of waiting on three garbage collectors (see session.py)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        from financedatabase_spark.session import build_scope

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            with build_scope(spark, name):
                return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from financedatabase_spark.plans import (  # noqa: E402,F401
    queries_advanced,
    queries_analytics,
    queries_bars,
    queries_bpe,
    queries_calendar_fallback,
    queries_documents,
    queries_groups,
    queries_joins,
    queries_lifecycle,
    queries_market,
    queries_scalar,
    queries_setops_sorts,
    queries_streaming,
    queries_tpch,
)

# ---------------------------------------------------------------------------
# Registration order: the driver checks the FIRST 50 registered queries per
# round. Queries with no hash-green driver row yet come first (round 4: the
# three streaming queries, which gained full SQL oracles this round); the
# rest follow ordered by the ROUND of their newest green row, oldest first,
# so every round's budget re-verifies the stalest evidence. The green sets
# are derived from the CORRECTNESS_r*.json files at import time when
# present; the literals below are the fallback (and are asserted in sync by
# tests/test_registry_parity.py). Since r13, green evidence is also gated
# on the ORACLE_HASHES.json ledger (tools/update_oracle_hashes.py): a green
# row earned under an OLDER oracle/fixture than the current one no longer
# counts, so changed queries rotate back to the front immediately.
# ---------------------------------------------------------------------------

# Green in CORRECTNESS_r01.json (22) — still valid evidence on file.
_R1_GREEN = [
    "semi_join_exists", "anti_join_not_exists", "rollup_revenue", "cube_revenue",
    "salted_hot_key_agg", "pivot_status_by_priority", "paginated_contracts",
    "doc_stats", "lang_id", "doc_fingerprint", "exact_dedup", "ngram_jaccard_dups",
    "minhash_lsh_dups", "simhash_near_dups", "embedding_cosine_topk",
    "embedding_ivf_topk", "embedding_near_dups", "multimodal_payload_stats",
    "ivf_build_assign", "count_guard", "distinct_values", "enrich_left_join",
]
# Green in CORRECTNESS_r02.json (50/50 hash-match).
_R2_GREEN = [
    "window_rank_lag", "implied_vol_bs", "greeks", "implied_vol_binomial",
    "risk_pipeline", "bars_5m", "bars_5m_gapfill", "bars_1h_anchored",
    "flagship_eod_pipeline", "bars_business_daily", "eod_with_quote_fallback",
    "business_day_scan", "bars_calendar_grains", "multimodal_decode_features",
    "group_mean_transform", "argmin_per_group", "forward_fill",
    "table_diagnostics", "bar_fill_join", "asof_enrichment",
    "ticker_change_splice", "dedup_keep_first_last", "dedup_full_row",
    "latest_snapshot", "ticker_alias_canonicalize", "spliced_symbol_history",
    "corrections_antijoin", "insert_ignore", "batch_update", "delete_where",
    "filtered_save", "registry_lookup", "quote_metrics", "strike_codec",
    "time_of_day_codecs", "eod_timestamps", "scrub_inf_nan", "session_filter",
    "date_range_isin_filter", "bootstrap_ohlc", "normalize_market_frame",
    "option_symbol_codecs", "union_distinct_dates", "except_diff",
    "intersect_keys", "topk_orders", "sorted_value_list", "pricing_summary",
    "revenue_forecast", "segment_revenue",
]
def _green_by_round(max_files: int = 8) -> dict[str, int]:
    """name -> newest round with a hash-green driver row, from the
    NEWEST ``max_files`` CORRECTNESS_r*.json files when present, else
    the literal fallback. Reading every file is O(rounds) import-time
    work that grows forever; the driver verifies ~50 queries per round,
    so with ~150 registered every query's newest green row sits within
    the last 3-4 rounds — 8 files is 2x headroom, and a query whose
    only green row is OLDER than the window deliberately maps to 0
    (never-verified), sorting it to the front of the driver's budget
    exactly as rotation wants."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rounds: dict[int, str] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds[int(m.group(1))] = path
    newest: dict[str, int] = {}
    for rnd in sorted(rounds)[-max_files:]:
        try:
            with open(rounds[rnd]) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                newest[name] = max(newest.get(name, 0), rnd)
    if not newest:  # fallback: the literal snapshots
        newest = {n: 1 for n in _R1_GREEN}
        newest.update({n: 2 for n in _R2_GREEN})
    return newest


def oracle_fingerprint(name: str) -> str:
    """sha256 of the query's verification surface: the oracle SQL when
    one exists (the fixture formulas live in it — any fixture-mix or
    semantics change shows up here), else the query callable's source
    (rows-only queries have no oracle, so the source is the only
    change signal)."""
    import hashlib
    import inspect

    src = ORACLE_SQL.get(name)
    if src is None:
        src = inspect.getsource(QUERIES[name])
    return hashlib.sha256(src.encode()).hexdigest()


def _load_hash_snapshot() -> dict[str, dict]:
    """ORACLE_HASHES.json: name -> {"hash": fingerprint, "since": round}
    meaning 'this query's current oracle has been in effect since
    <round>'. Refreshed by tools/update_oracle_hashes.py whenever an
    oracle changes; missing file -> empty (everything sorts as
    never-verified, the safe direction)."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        with open(os.path.join(root, "ORACLE_HASHES.json")) as f:
            return json.load(f).get("hashes", {})
    except (OSError, ValueError):
        return {}


def _effective_green(
    green: dict[str, int],
    snapshot: dict[str, dict],
    fingerprints: dict[str, str],
) -> dict[str, int]:
    """Drop green evidence that predates the query's CURRENT oracle: a
    name whose snapshot hash differs from its live fingerprint (oracle
    edited after the last snapshot refresh), or whose newest green row
    is older than the round the current oracle took effect, counts as
    never-verified and sorts to the front of the driver's budget —
    closing the r12 gap where a fixture change after a green row was
    indistinguishable from stable verification."""
    out: dict[str, int] = {}
    for name, rnd in green.items():
        entry = snapshot.get(name)
        if not entry or entry.get("hash") != fingerprints.get(name):
            continue
        if rnd < int(entry.get("since", 1)):
            continue
        out[name] = rnd
    return out


_GREEN_ROUND = _effective_green(
    _green_by_round(),
    _load_hash_snapshot(),
    {n: oracle_fingerprint(n) for n in QUERIES},
)
_ordered = sorted(QUERIES, key=lambda n: _GREEN_ROUND.get(n, 0))
QUERIES = {n: QUERIES[n] for n in _ordered}
ORACLE_SQL = {n: ORACLE_SQL[n] for n in _ordered if n in ORACLE_SQL}
