"""Deterministic sampling for corpus curation.

Training-data pipelines need samples that are (a) reproducible across
runs and engines — re-running the pipeline must select the SAME rows, or
downstream shards/dedup/eval splits churn — and (b) stratified, because
corpus mixing is specified per language/source ("keep 30% of English,
all of Chinese"). Seeded RNG sampling (``df.sample``) gives neither
across engines: it depends on partition layout and the engine's RNG.

The portable primitive is hash-bucket selection: a row is kept iff a hex
prefix of ``md5(key)`` falls below a threshold encoding the fraction.
md5 of the same UTF-8 string is identical everywhere, and comparing
equal-length lowercase hex strings lexicographically is monotone in the
encoded value, so no engine-specific hex→int conversion is needed. At
100 TB this is a map-side filter — no shuffle, no state, pushes down to
the scan as a deterministic predicate.

Spark's own ``sampleBy`` offers per-stratum fractions but is seeded-RNG
(partition-layout dependent); this module is its reproducible twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financedatabase_spark.session import barrier

#: hex digits of the md5 prefix used as the selection bucket: 8 digits
#: = 32 bits, granularity 2^-32 — fraction resolution far below any
#: practical sampling spec.
_WIDTH = 8


def hash_bucket_hex(key: Column | str, width: int = _WIDTH) -> Column:
    """Deterministic uniform selection bucket: the first ``width`` hex
    chars of md5(key) — lowercase, fixed length, portable."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, width)


def fraction_threshold_hex(fraction: float, width: int = _WIDTH) -> str:
    """Hex threshold T such that P[bucket < T] == fraction (up to
    16^-width). fraction 1.0 maps to 'g...' which is above every hex
    digit, keeping all rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction == 1.0:
        return "g" * width  # lexicographically above every hex bucket
    return format(int(fraction * 16**width), f"0{width}x")


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by hash bucket
    of ``key_col``. Pure map-side filter — pushes to the scan."""
    return df.filter(
        hash_bucket_hex(key_col) < F.lit(fraction_threshold_hex(fraction))
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — the reproducible twin of
    ``DataFrame.sampleBy``. Strata absent from ``fractions`` are dropped
    (sampleBy semantics). The fraction spec joins in as a broadcast dim
    so the plan stays a map-side filter regardless of corpus size."""
    spark = df.sparkSession
    spec = spark.createDataFrame(
        [(s, fraction_threshold_hex(p)) for s, p in fractions.items()],
        f"{stratum_col} string, _thr string",
    )
    return (
        df.join(F.broadcast(spec), stratum_col)
        .filter(hash_bucket_hex(key_col) < F.col("_thr"))
        .drop("_thr")
    )


def fixed_size_sample(
    df: DataFrame,
    n: int,
    stratum_col: str,
    key_col: str = "doc_id",
    local_prefilter: bool = True,
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, chosen by hash
    order — a deterministic reservoir: the selection is stable under
    row-order and partitioning changes, and appending new rows evicts
    only rows whose hash rank falls out of the top n.

    **Two-phase top-n.** A bare ``row_number() over (partition by
    stratum)`` sorts an entire stratum in ONE task — at 100 TB the
    dominant language is one stratum and one executor sorts it. Phase 1
    therefore pre-filters map-side (Arrow-batched ``mapInPandas``, no
    shuffle): each input partition keeps only its n hash-smallest rows
    per stratum, a superset of the global top-n by construction. Phase 2
    runs the exact global window over the survivors — at most
    n x input-partitions rows per stratum, so no task ever sorts more
    than that regardless of stratum skew. The result is bit-identical to
    the single-window form for ANY partition layout (the pre-filter only
    discards rows that provably cannot rank in the global top n).
    ``local_prefilter=False`` keeps the old single-window plan (used by
    the equivalence property test)."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("_bucket").asc(), F.col(key_col).asc()
    )
    staged = df.withColumn("_bucket", hash_bucket_hex(key_col))

    if local_prefilter:
        schema = staged.schema
        s_name, k_name = stratum_col, key_col

        def _local_topn(batches):
            import pandas as pd

            best: dict = {}
            for pdf in batches:
                for s, g in pdf.groupby(s_name, sort=False, dropna=False):
                    cur = pd.concat([best[s], g]) if s in best else g
                    # na_position='first' mirrors Spark's ASC NULLS FIRST:
                    # a null hash bucket (null key) ranks ahead of every
                    # hex bucket in the exact window, so the prefilter
                    # must keep those rows too
                    best[s] = cur.sort_values(
                        ["_bucket", k_name], kind="mergesort", na_position="first"
                    ).head(n)
            if best:
                yield pd.concat(list(best.values()), ignore_index=True)

        staged = staged.mapInPandas(_local_topn, schema)

    return (
        staged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn", "_bucket")
    )


def token_shard_packing(
    df: DataFrame,
    tokens_col: Column | str,
    budget: int,
    order_col: str = "doc_id",
    key_cols: list[str] | None = None,
    hierarchical: bool = True,
    return_rows: bool = False,
) -> DataFrame:
    """Sequence-packing shard assignment — the data-loader layout step of
    a training pipeline: stream docs in a deterministic order, cut a new
    shard whenever the running token total would pass ``budget``
    (shard boundaries at ``floor(cum_before / budget)``, the same
    prefix-sum-bucket trick as activity bars). Output one row per shard:
    (key..., shard_idx, n_docs, n_tokens, first/last doc).

    **Hierarchical prefix sum.** Exact packing needs each row's GLOBAL
    (per-stratum) running total — but a window over ``partition by
    stratum`` computes it in one task per stratum (and with no keys, ONE
    task for the whole corpus). The scalable form is the classic
    two-level scan: range-partition on (keys..., order) so each task
    holds a contiguous slice; compute slice-local running totals
    map-side (Arrow ``mapInPandas``, vectorized cumsum, no shuffle);
    prefix-sum the per-(slice, key) totals — a frame with one row per
    (task, stratum), tiny at any corpus size — and broadcast it back as
    each slice's starting offset. global_before = slice_offset +
    local_before, bit-identical to the monolithic window for any
    partition layout, with every task bounded by slice size rather than
    stratum size. The totals branch reuses the range exchange
    (ReusedExchange), so the corpus shuffles once.

    ``hierarchical=False`` keeps the monolithic single-window form (the
    equivalence baseline used by tests). ``return_rows=True`` returns the
    per-row assignment (key..., order, n_tokens, shard_idx) instead of
    the shard summary — the frame `io_sinks.export_jsonl_shards` routes
    to disk."""
    key_cols = key_cols or []
    # token counts are integral by definition; cast ONCE here so both
    # the window and the hierarchical path sum identical values (a
    # fractional token estimate would otherwise floor on one path only)
    t = (F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col).cast("long")

    if not hierarchical:
        w = (
            Window.partitionBy(*key_cols).orderBy(order_col)
            if key_cols
            else Window.partitionBy().orderBy(order_col)
        )
        cum = F.sum(t).over(w.rowsBetween(Window.unboundedPreceding, 0))
        staged = df.select(
            *key_cols,
            F.col(order_col),
            t.alias("_tok"),
            F.floor((cum - t) / F.lit(float(budget))).cast("long").alias("shard_idx"),
        )
        if return_rows:
            return staged.withColumnRenamed("_tok", "n_tokens")
        return _shard_agg(staged, key_cols, order_col)

    keys = list(key_cols)
    from financedatabase_spark.operators.prefix import attach_running_total_before

    pre = attach_running_total_before(
        df.select(*keys, F.col(order_col), t.alias("_tok")),
        "_tok", keys, order_col,
    )
    assigned = pre.select(
        *keys,
        F.col(order_col),
        "_tok",
        F.floor(F.col("_before") / F.lit(float(budget))).cast("long").alias("shard_idx"),
    )
    if return_rows:
        return assigned.withColumnRenamed("_tok", "n_tokens")
    return _shard_agg(assigned, keys, order_col)


def _shard_agg(staged: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    return staged.groupBy(*key_cols, "shard_idx").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_tok").cast("long").alias("n_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )


def corpus_mixture(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    token_col: str = "n_chars",
    key_col: str = "doc_id",
) -> DataFrame:
    """Source-weighted corpus mixing to a token budget — the data-mixing
    step of a training pipeline ("50% web, 30% wiki, 20% code"): each
    source's acceptance rate is ``min(1, weight·budget / available)``,
    then rows are selected by the same deterministic md5-bucket
    predicate as `stratified_sample`, so re-runs (and engines) pick the
    SAME documents. Sources absent from ``weights`` are dropped.

    The availability aggregate collects ONE ROW PER SOURCE (the only
    driver-side step — sources number dozens, not rows); the sampling
    itself stays a broadcast-dim map-side filter at any corpus size.
    Oversubscribed weights (weight·budget > available) clamp to keeping
    the whole source — the standard epochs>1 upsampling decision is
    left to the loader."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.sum(token_col).alias("_tot")).collect()
    }
    fractions = {
        s: min(1.0, (weights[s] * token_budget) / float(totals[s]))
        for s in weights
        if s in totals and totals[s] > 0
    }
    return stratified_sample(df, fractions, stratum_col=source_col, key_col=key_col)


def deterministic_shuffle(
    df: DataFrame,
    seed: int,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    hierarchical: bool = True,
) -> DataFrame:
    """Reproducible global shuffle with explicit positions — the
    example-order step of a training pipeline: every row gets a dense
    0-based ``pos_col`` in md5(seed‖id) order, so the data-loader reads
    the SAME permutation on every run, engine, and partitioning (and a
    different one per seed). The sort key appends the zero-padded id so
    ordering is total even under (astronomically unlikely) digest ties.

    PRECONDITION: ``id_col`` values are UNIQUE. The lpad tie-break only
    totalizes the order across DISTINCT ids; duplicate rows share a sort
    key, so the hierarchical path (range-frame prefix sum — tied rows
    get the same ``_before``) and ``hierarchical=False`` (row_number
    breaks the tie arbitrarily) would diverge, and ``pos_col`` would
    stop being a dense permutation. Dedup or add a disambiguating id
    first; uniqueness is not enforced here (checking costs a full
    groupBy of the corpus).

    Scale shape: a global row_number would funnel the corpus through
    ONE task; the default hierarchical form reuses the two-level scan
    from `token_shard_packing` (range-partition on the shuffle key,
    slice-local cumcounts map-side, tiny per-slice offset frame
    broadcast back) — positions bit-identical to the monolithic window
    for any partition layout, every task bounded by slice size.
    ``hierarchical=False`` keeps the single-window equivalence baseline.
    Feed ``pos_col`` to `token_shard_packing(order_col=...)` to pack
    shards in shuffled order."""
    key = F.concat_ws(
        "|",
        F.md5(F.concat_ws("|", F.lit(str(int(seed))), F.col(id_col).cast("string"))),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),
    )
    with_key = df.withColumn("_skey", key)
    if not hierarchical:
        w = Window.orderBy(F.col("_skey").asc())
        return with_key.withColumn(
            pos_col, (F.row_number().over(w) - 1).cast("long")
        ).drop("_skey")
    from financedatabase_spark.operators.prefix import attach_running_total_before

    pre = attach_running_total_before(
        with_key.withColumn("_one", F.lit(1).cast("long")), "_one", None, "_skey"
    )
    return pre.withColumn(pos_col, F.col("_before").cast("long")).drop(
        "_one", "_before", "_skey"
    )


def dataset_split(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's md5 bucket
    falls into one of the cumulative-fraction intervals, so the SAME row
    lands in the SAME split on every run, engine, and partitioning — the
    property that keeps eval sets uncontaminated when the corpus is
    re-processed. Fractions must sum to 1. Pure map-side expression (a
    CASE over the hash bucket), zero shuffle at any scale."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket_hex(key_col)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = bucket < F.lit(fraction_threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def dsir_importance_weights(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-bigram features are under the
    TARGET distribution (rows matching ``target_filter``) than under
    the RAW corpus, in log space. Resampling the corpus with
    probabilities proportional to exp(weight) shifts it toward the
    target domain — the standard pretraining-mixture move when the
    target set is too small to train on alone.

    Features: bigrams hashed into ``n_buckets`` buckets via the engine-
    portable 28-bit md5 prefix (same primitive as the MinHash oracle).
    Distributions are add-1 smoothed over buckets:
    p_f = (c_target(f) + 1) / (N_target + B). Per doc:
    log_weight = sum_f n_f(doc) * (log10 p_f - log10 q_f).

    Output: (id_col, n_feats, log_weight), one row per doc with >= 1
    bigram; rounded for cross-engine sum-order stability.

    Scale shape: one projection stages word arrays; the guarded bigram
    transform explodes to (doc, bucket) rows; ONE shuffle counts
    per-doc-bucket; the global target/raw bucket tables are ≤ B rows —
    aggregated map-side then broadcast back; one shuffle on doc id for
    the final sum. The target table never needs to fit in memory —
    only its B-row histogram does.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from financedatabase_spark.operators.text import normalized_text

    staged = df.select(
        F.col(id_col),
        target_filter.alias("_is_target"),
        F.split(normalized_text(text_col), " ").alias("_w"),
    )
    feats = (
        staged.select(
            id_col,
            "_is_target",
            F.explode_outer(
                F.expr(
                    "CASE WHEN size(_w) >= 2 THEN "
                    "transform(sequence(1, size(_w) - 1), "
                    "i -> cast(conv(substring(md5(concat(element_at(_w, i), ' ', "
                    "element_at(_w, i + 1))), 1, 7), 16, 10) as bigint) "
                    f"% {int(n_buckets)}) "
                    "ELSE array() END"
                )
            ).alias("bucket"),
        )
        .filter(F.col("bucket").isNotNull())
    )
    # one corpus pass: (doc, bucket) counts, materialized once because
    # the global histograms AND the score join both read it
    per_doc = barrier(
        feats.groupBy(id_col, "_is_target", "bucket")
        .agg(F.count("*").alias("_nf"))
    )
    # global histograms are BOUNDED (≤ n_buckets rows): fold to driver
    # literals so the score plan joins a LocalRelation, not the subtree
    hist = (
        per_doc.groupBy("bucket")
        .agg(
            F.sum("_nf").alias("_cq"),
            F.sum(F.when(F.col("_is_target"), F.col("_nf")).otherwise(F.lit(0))).alias("_cp"),
        )
        .collect()
    )
    n_raw = sum(r["_cq"] for r in hist)
    n_tgt = sum(r["_cp"] for r in hist)
    b = float(n_buckets)
    from financedatabase_spark.session import values_dim

    dim = values_dim(
        df.sparkSession,
        [(r["bucket"], r["_cq"], r["_cp"]) for r in hist],
        "bucket bigint, _cq bigint, _cp bigint",
    )
    scored = per_doc.join(F.broadcast(dim), "bucket").select(
        id_col,
        "_nf",
        (
            F.log10((F.col("_cp") + F.lit(1)) / F.lit(n_tgt + b))
            - F.log10((F.col("_cq") + F.lit(1)) / F.lit(n_raw + b))
        ).alias("_lw"),
    )
    return scored.groupBy(id_col).agg(
        F.sum("_nf").alias("n_feats"),
        F.round(F.sum(F.col("_nf") * F.col("_lw")), round_digits).alias("log_weight"),
    )
