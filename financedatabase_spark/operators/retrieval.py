"""Sparse keyword retrieval — BM25 over the documents table.

Complements the dense side (`similarity`: cosine/IVF ANN) with the
classic lexical ranking, so the engine covers both halves of hybrid
search. Spark-first shape: the query's terms are FIXED AND FEW, so
nothing resembling an inverted index is materialized — corpus
statistics (N, total doc length, per-term document frequencies) come
from ONE aggregate pass with conditional sums, broadcast back as
literals, and scoring is a pure map-side expression over one more scan:
per-term term frequencies via ``filter(words, w -> w = term)``, the
BM25 sum, then a rounded-score top-k that compiles to
TakeOrderedAndProject (no global sort). Two scans, zero shuffles, no
index build — exactly what a 100 TB ad-hoc keyword probe should cost.
(A standing search SERVICE would precompute postings instead; that is a
different workload, not this operator.)
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financedatabase_spark.operators.text import normalized_text


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Spärck Jones; the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf form). Scores are rounded
    before ranking so float ties break identically across engines; rank
    ties break on ``id_col``. Docs matching no term are excluded.

    Output: (id, score, rank).
    """
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    terms = [t.lower() for t in query_terms]
    # stage the word array once: the one-expression form re-splits the
    # text per reference (~2 per term + stats) — see the staging note in
    # operators/text.py. The alias is multi-referenced so CollapseProject
    # keeps it materialized.
    staged = df.select(F.col(id_col), F.split(normalized_text(text_col), " ").alias("_w"))
    words = F.col("_w")
    stats_row = staged.agg(
        F.count("*").alias("n"),
        F.sum(F.size(words)).alias("dl_sum"),
        *[
            F.sum(F.array_contains(words, t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).first()
    n_docs = stats_row["n"]
    if not n_docs:  # empty corpus: defined empty result, not None-math
        return df.select(
            F.col(id_col),
            F.lit(0.0).alias("score"),
            F.lit(0).cast("long").alias("rank"),
        ).limit(0)
    avgdl = stats_row["dl_sum"] / n_docs
    idf = [
        math.log(1.0 + (n_docs - stats_row[f"df_{i}"] + 0.5) / (stats_row[f"df_{i}"] + 0.5))
        for i in range(len(terms))
    ]

    # Candidate pruning WITHOUT re-splitting: a `score > 0` filter would
    # be pushed below the staged word projection, re-expanding the full
    # split/filter tree per term inside one per-row Filter (plan-gated).
    # Instead (a) a SUBSTRING-superset regex on the raw text — cheap,
    # pushes to the scan, prunes the corpus before any splitting — and
    # (b) the exact `score > 0` applied AFTER the top-k limit: positives
    # sort above zero-score rows, so the retained positives are
    # identical to filtering first.
    superset = F.lower(F.col(text_col)).rlike("|".join(re.escape(t) for t in terms))
    cands = df.filter(superset).select(
        F.col(id_col), F.split(normalized_text(text_col), " ").alias("_w")
    )
    # per-term counts + doc length as their own staged projection, each
    # referenced twice downstream (tf in numerator and saturation)
    def _is_term(term: str):
        # closure factory: a `t=t` default would change the lambda's
        # arity and PySpark would bind it as (element, index)
        return lambda w: w == F.lit(term)

    tf_frame = cands.select(
        F.col(id_col),
        F.size("_w").cast("double").alias("_dl"),
        *[
            F.size(F.filter(F.col("_w"), _is_term(t))).cast("double").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    norm = k1 * (1.0 - b + b * F.col("_dl") / F.lit(avgdl))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}")
        part = F.lit(idf[i]) * tf * (k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    scored = tf_frame.select(F.col(id_col), F.round(score, round_digits).alias("score"))
    # limit-then-rank: the rank window runs over k rows, not the corpus
    rank = F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
        .filter(F.col("score") > 0)
        .withColumn("rank", rank.cast("long"))
    )


def rrf_fuse(
    lists: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher) of N ranked
    lists: rrf_score(d) = Σ_lists 1/(k_rrf + rank_list(d)), the standard
    hybrid-search combiner for a lexical (BM25) and a dense (ANN) list —
    rank-based, so the two incomparable score scales never mix.

    Inputs are top-k lists (k rows each), so every stage here is
    trivially small: one union, one tiny groupBy, and a final
    TakeOrderedAndProject — no global sort, no assumption that the
    corpus itself fits anywhere. Scores are rounded before ranking so
    float ties break identically across engines; ties break on
    ``id_col``. Output: (id, rrf_score, n_lists, rank).
    """
    if not lists:
        raise ValueError("rrf_fuse requires at least one ranked list")
    tagged = None
    for df in lists:
        part = df.select(F.col(id_col), F.col(rank_col).cast("long").alias("_r"))
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_r"))), round_digits
        ).alias("rrf_score"),
        F.count("*").cast("long").alias("n_lists"),
    )
    rank = F.row_number().over(Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()))
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(int(k))
        .withColumn("rank", rank.cast("long"))
    )
