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
    """Decorator: add a query (and its oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from financedatabase_spark.plans import (  # noqa: E402,F401
    queries_advanced,
    queries_analytics,
    queries_bars,
    queries_calendar_fallback,
    queries_documents,
    queries_groups,
    queries_joins,
    queries_lifecycle,
    queries_scalar,
    queries_setops_sorts,
    queries_streaming,
    queries_tpch,
)

# ---------------------------------------------------------------------------
# Registration order: the driver checks the FIRST 50 registered queries per
# round. Queries that already hold a passing driver row (r1 or r2 CORRECTNESS
# file) are deferred to the back so each round's check budget lands entirely
# on queries with no driver verdict yet — new r3 queries and the 14 that were
# registered after r2's budget filled. The three streaming twins are rows-only
# checks (no SQL oracle) whose semantics are pinned by stream==batch pytest,
# so they spend budget last among the unverified.
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
_VERIFIED = set(_R1_GREEN) | set(_R2_GREEN)
# Rows-only streaming twins: check last among the unverified.
_STREAMING_LAST = [
    "streaming_bars_incremental", "streaming_latest_state", "streaming_sessions",
]

_ordered = (
    [n for n in QUERIES if n not in _VERIFIED and n not in _STREAMING_LAST]
    + [n for n in _STREAMING_LAST if n in QUERIES]
    + [n for n in QUERIES if n in _VERIFIED]
)
QUERIES = {n: QUERIES[n] for n in _ordered}
ORACLE_SQL = {n: ORACLE_SQL[n] for n in _ordered if n in ORACLE_SQL}
