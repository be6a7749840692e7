"""Embedding similarity search over an `array<float>` column.

- **Brute-force cosine top-k** — the correctness baseline: query set ×
  corpus join, dot product as a sequential left-fold (`aggregate` over
  `zip_with`) so the summation order — and therefore the IEEE result —
  is identical to the oracle's list_reduce.
- **IVF top-k** — the scale path: a coarse quantizer (here the `label`
  cluster id; in production k-means centroids) restricts each probe to
  its cell, turning the O(N·Q) cross join into a partition-pruned
  equi-join. Same shape as FAISS IVF-Flat, expressed relationally.
- **Embedding near-dup pairs** — cosine ≥ τ within cells: the
  embedding-space analog of MinHash dedup.

At 100 TB the corpus side is hash-partitioned by cell id; probes broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _spread(df: DataFrame) -> DataFrame:
    """Repartition the corpus side before O(Q·N) scoring — a single-file
    source arrives as one partition and would serialize the whole scan."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Brute-force top-k: every query scores the whole corpus.

    Scores are rounded (default 1e-6) before ranking so float ties break
    identically across engines; rank ties break on corpus_id."""
    q = queries.select(F.col(query_id), _vec(vec_col).alias("_qv"))
    c = _spread(corpus).select(F.col(corpus_id), _vec(vec_col).alias("_cv"))
    scored = q.crossJoin(c).select(
        query_id,
        corpus_id,
        cosine(F.col("_qv"), F.col("_cv")).alias("_raw"),
    )
    score = F.round(F.col("_raw"), round_digits) if round_digits else F.col("_raw")
    scored = scored.select(query_id, corpus_id, score.alias("score"))
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    round_digits: int | None = 6,
) -> DataFrame:
    """IVF-style ANN: probe only the query's cell (coarse-quantizer
    bucket). Equi-join on the cell id — Catalyst turns the cross join into
    a hash join, and a cell-partitioned corpus table prunes at the scan."""
    q = queries.select(F.col(query_id), F.col(cell_col).alias("_cell"), _vec(vec_col).alias("_qv"))
    c = _spread(corpus).select(F.col(corpus_id), F.col(cell_col).alias("_ccell"), _vec(vec_col).alias("_cv"))
    scored = q.join(c, F.col("_cell") == F.col("_ccell")).select(
        query_id,
        corpus_id,
        cosine(F.col("_qv"), F.col("_cv")).alias("_raw"),
    )
    score = F.round(F.col("_raw"), round_digits) if round_digits else F.col("_raw")
    scored = scored.select(query_id, corpus_id, score.alias("score"))
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.95,
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by cell id so the
    pair join is within-cell only (the LSH/IVF blocking trick applied to
    dedup)."""
    v = _spread(df).select(F.col(id_col), F.col(cell_col).alias("_cell"), _vec(vec_col).alias("_v"))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b,
        (F.col("a._cell") == F.col("b._cell")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id1"),
        F.col(f"b.{id_col}").alias("id2"),
        cosine(F.col("a._v"), F.col("b._v")).alias("_raw"),
    )
    score = F.round(F.col("_raw"), round_digits) if round_digits else F.col("_raw")
    return pairs.select("id1", "id2", score.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
