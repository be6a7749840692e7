"""Mergeable sketches: count-min, HyperLogLog, Bloom filter.

Count-min (Cormode & Muthukrishnan 2005) is the 100 TB primitive for
approximate frequency: a d x w counter grid
where each item increments one bucket per hash row and a point estimate
is the MIN over its d buckets — never an underestimate, overestimates
bounded by N/w per row. At corpus scale the sketch (d*w counters) is
millions of times smaller than the exact vocabulary, mergeable across
partitions/streams by plain addition, and exactly what a heavy-hitters
pass consults before paying for exact counts.

Spark-first shape: the counters are built VOCAB-first — one shuffle
counts tokens exactly per partition-reduced (token, c) pairs, then the
DISTINCT tokens are hashed d ways and the counters aggregate their
counts (d * |vocab| intermediate rows, NOT d * corpus occurrences).
The finished sketch is <= d*w rows — broadcastable anywhere.

Hashes use the engine-portable 28-bit md5 prefix (same primitive as
MinHash/DSIR), so a SQL oracle rebuilds the identical grid.

Reference parity: no counterpart (the reference has no sketch/aggregate
layer); brief's "novel sketch" custom-operator surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def portable_hash28(expr: str, salt: str = "") -> str:
    """SQL fragment: the 28-bit md5-prefix hash of an expression,
    optionally salted — the ONE engine-portable hash primitive every
    sketch here derives from (the DuckDB oracle twins are _v28_of /
    _cms_bucket_sql / _bloom_pos_sql in plans/queries_documents.py;
    change them in lockstep)."""
    inner = f"concat('{salt}', {expr})" if salt else expr
    return f"cast(conv(substring(md5({inner}), 1, 7), 16, 10) as bigint)"


def _bucket(col, row: int, width: int):
    """h_row(token) = 28-bit md5 prefix of 'row:token', mod width."""
    return F.expr(f"({portable_hash28(col, f'{row}:')}) % {width}")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact (token, c) table — the input both the sketch build and the
    heavy-hitter verification share. One shuffle on token."""
    from financedatabase_spark.operators.text import normalized_text

    toks = (
        df.select(F.explode_outer(F.split(normalized_text(text_col), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    return toks.groupBy("token").agg(F.count("*").alias("c"))


def cms_build(counts: DataFrame, depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the d x w counter grid from an exact (token, c) table:
    explode each DISTINCT token to its d (row, bucket) cells, sum c per
    cell. Output: (row, bucket, counter), <= depth*width rows."""
    cells = counts.select(
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket("token", i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_cell"),
    ).select("c", "_cell.row", "_cell.bucket")
    return cells.groupBy("row", "bucket").agg(F.sum("c").alias("counter"))


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-estimate candidate tokens against a built sketch: min over
    the d bucket counters (0 when a bucket is empty — token never seen).
    The sketch side broadcasts (<= d*w rows). Output: (token, cms_est)."""
    probes = candidates.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket("token", i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_cell"),
    ).select("token", "_cell.row", "_cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("cms_est"))
    )


#: HLL geometry: m=64 buckets (b=6 bits of the 28-bit portable hash),
#: 22-bit remainder for the leading-zero rank; alpha_64 per the paper.
HLL_M = 64
HLL_ALPHA = 0.709


def hll_registers(df: DataFrame, key_cols: list[str], item_col: str) -> DataFrame:
    """HyperLogLog registers per key group (Flajolet et al. 2007): hash
    each item with the portable 28-bit md5 prefix, split into a 6-bit
    bucket and 22-bit remainder, and keep max(rho) per (key, bucket)
    where rho = leading zeros in the remainder + 1. All integer math —
    bit length via bin() string length, identical in Spark and the SQL
    oracle (no float log2 at bucket boundaries). Registers are
    mergeable by MAX across partitions, streams, or days.
    Output: (*key_cols, bucket, r)."""
    h = portable_hash28(item_col)
    w = f"({h} % {1 << 22})"
    rho = f"CASE WHEN {w} = 0 THEN 23 ELSE 23 - length(bin({w})) END"
    return (
        df.select(*key_cols, F.expr(f"{h} div {1 << 22}").alias("bucket"), F.expr(rho).alias("_rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("_rho").alias("r"))
    )


def hll_estimate(registers: DataFrame, key_cols: list[str]) -> DataFrame:
    """Raw HLL cardinality estimate from registers: alpha * m^2 /
    sum(2^-M_j) with empty buckets contributing 2^0. Every term is a
    dyadic rational >= 2^-23 and there are only m of them, so the double
    sum is EXACT and the estimate engine-portable bit-for-bit. The
    paper's small/large-range corrections use ln() — deliberately left
    out (a boundary ulp would break cross-engine parity); callers get
    the raw estimate plus the zero-bucket count to apply any correction
    policy downstream.
    Output: (*key_cols, hll_est, zero_buckets)."""
    per_key = registers.groupBy(*key_cols).agg(
        # 2^-r via an integer shift, not pow(): exact by construction
        F.sum(F.expr("1.0D / shiftleft(1L, cast(r AS INT))")).alias("_s"),
        F.count("*").alias("_nb"),
    )
    m = HLL_M
    return per_key.select(
        *key_cols,
        F.round(
            F.lit(HLL_ALPHA * m * m) / (F.col("_s") + (F.lit(m) - F.col("_nb"))),
            6,
        ).alias("hll_est"),
        (F.lit(m) - F.col("_nb")).cast("long").alias("zero_buckets"),
    )


#: Bloom geometry: m bits packed into m/32 words; k md5-prefix hashes.
BLOOM_M = 65536
BLOOM_K = 3


def bloom_build(
    keys: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Build a Bloom filter as a REAL packed bitmap: each key sets k bit
    positions (portable md5-prefix hashes mod m); positions aggregate
    into 32-bit words via bit_or (32, not 64: bit 63 of a signed BIGINT
    overflows DuckDB's checked shift, so 32-bit packing keeps the oracle
    portable). Output: (word_idx, bits) — m/32 longs
    regardless of key count, broadcastable anywhere and mergeable across
    partitions/shards by another bit_or. The classic join pre-filter at
    100 TB: probe cheaply map-side, pay the exact join only for
    'maybe' rows (false positives possible, false negatives never)."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.expr(f"({portable_hash28(key_col, f'{i}:')}) % {m}")
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr("pos div 32").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 32 AS INT))").alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_might_contain(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe a packed Bloom bitmap: a key 'might' be present iff ALL k
    of its bit positions are set. APPENDS `might_contain` to the probe
    frame — row multiplicity and every probe column (groupable or not)
    are preserved, because the check is k broadcast left joins of the
    (m/32)-word bitmap, one per hash, never an explode + re-group. A
    missing word means those bits are zero. Raises ValueError if the probe
    frame already uses one of the reserved internal column names."""
    reserved = {"might_contain"} | {
        f"_{p}{i}" for i in range(k) for p in ("p", "w", "bits")
    }
    clash = reserved & set(probes.columns)
    if clash:
        raise ValueError(
            f"probe frame columns collide with bloom_might_contain internals: {sorted(clash)}"
        )
    out = probes
    might = F.lit(True)
    for i in range(k):
        out = out.withColumn(f"_p{i}", F.expr(f"({portable_hash28(key_col, f'{i}:')}) % {m}"))
        words = bloom.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}")
        )
        out = out.join(
            F.broadcast(words), F.expr(f"_p{i} div 32") == F.col(f"_w{i}"), "left"
        )
        might = might & (
            F.coalesce(F.col(f"_bits{i}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(1L, cast(_p{i} % 32 AS INT))")
            )
            != 0
        )
    return out.withColumn("might_contain", might).select(
        *probes.columns, "might_contain"
    )
