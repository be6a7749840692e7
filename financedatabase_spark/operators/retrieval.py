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
    words = F.split(normalized_text(text_col), " ")
    stats_row = df.agg(
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

    dl = F.size(words).cast("double")
    norm = k1 * (1.0 - b + b * dl / F.lit(avgdl))

    def term_count(term: str):
        return F.size(F.filter(words, lambda w: w == F.lit(term))).cast("double")

    score = None
    for i, t in enumerate(terms):
        tf = term_count(t)
        part = F.lit(idf[i]) * tf * (k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    scored = df.select(
        F.col(id_col), F.round(score, round_digits).alias("score")
    ).filter(F.col("score") > 0)
    # limit-then-rank: the rank window runs over k rows, not the corpus
    rank = F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
        .withColumn("rank", rank.cast("long"))
    )
