"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID, quality
scoring, token counting, and document fingerprinting over a `documents`
table — all as native column expressions (codegen'd, shuffle-free per-row
work), so a 100 TB corpus pays one scan.

Design constraint: every derived value must be reproducible in ANSI SQL so
the DuckDB oracle can verify it — hashes use md5 (identical across
engines), bit math uses div/mod instead of engine-specific shifts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financedatabase_spark.session import barrier

#: Marker stopwords per language for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|for|with)\b",
    "es": r"\b(el|la|los|las|de|que|y|en)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit)\b",
    "fr": r"\b(le|la|les|et|de|est|pour|dans)\b",
}

#: CJK codepoint class — presence dominates the latin heuristics.
CJK_PATTERN = r"[一-鿿]"

#: BPE-ish token regex: letter runs, digit runs, single punctuation marks.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

EN_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by)\b"

#: Word lists backing the regex alternations above — `doc_stats` fuses
#: every marker/stopword count into ONE regexp_extract_all pass over
#: their union (the \b guards make whole-word matching order-independent,
#: so per-set counts fall out of array membership afterwards).
_STOPWORD_SET = "the a an and or of to in is it for on with as at by".split()
_LANG_SETS: dict[str, list[str]] = {
    "en": "the and of to in is for with".split(),
    "es": "el la los las de que y en".split(),
    "de": "der die das und ist nicht mit".split(),
    "fr": "le la les et de est pour dans".split(),
}
_UNION_WORDS = sorted({w for s in (_STOPWORD_SET, *_LANG_SETS.values()) for w in s})
_UNION_PATTERN = r"\b(" + "|".join(_UNION_WORDS) + r")\b"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    t = F.trim(_c(text))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token count via the sub-word regex."""
    return F.regexp_count(_c(text), F.lit(BPE_TOKEN_PATTERN)).cast("long")


def char_class_ratio(text: Column | str, pattern: str) -> Column:
    """Fraction of characters matching a class (punct ratio, digit ratio…)."""
    t = _c(text)
    n = F.length(t)
    return F.when(n > 0, F.regexp_count(t, F.lit(pattern)) / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords_pattern: str = EN_STOPWORDS) -> Column:
    """Stopword hits per whitespace token."""
    t = _c(text)
    hits = F.regexp_count(F.lower(t), F.lit(stopwords_pattern))
    toks = ws_token_count(t)
    return F.when(toks > 0, hits / toks).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite document quality in [0,1]: length saturation, low
    punctuation, healthy stopword density, low digit share — the standard
    heuristic mix used by web-corpus quality filters."""
    t = _c(text)
    length_term = F.least(ws_token_count(t) / F.lit(64.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(
        char_class_ratio(t, r"[^\w\s]") * 4.0, F.lit(1.0)
    )
    stop_term = F.least(stopword_ratio(t) * 4.0, F.lit(1.0))
    digit_term = F.lit(1.0) - F.least(char_class_ratio(t, r"[0-9]") * 4.0, F.lit(1.0))
    return (
        0.25 * length_term + 0.25 * punct_term + 0.25 * stop_term + 0.25 * digit_term
    )


def lang_id(text: Column | str) -> Column:
    """Language-ID heuristic: CJK presence wins, else the latin language
    with the most marker-stopword hits (priority order breaks ties),
    'und' when nothing matches."""
    t = F.lower(_c(text))
    cjk = F.regexp_count(t, F.lit(CJK_PATTERN))
    hits = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    expr = F.when(cjk > 0, F.lit("zh"))
    langs = list(LANG_MARKERS)
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other != lang and langs.index(other) < langs.index(lang):
                cond = cond & (hits[lang] > hits[other])
            elif other != lang:
                cond = cond & (hits[lang] >= hits[other])
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def normalized_text(text: Column | str) -> Column:
    """Canonical form for hashing: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def doc_hash(text: Column | str) -> Column:
    """Whole-document content hash over the normalized text (md5 so the
    SQL oracle reproduces it byte-for-byte)."""
    return F.md5(normalized_text(text))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles as an array — the unit set for Jaccard,
    MinHash, and winnowing fingerprints."""
    words = F.split(normalized_text(text), " ")
    n = F.size(words)
    # guard: Spark's sequence(1, stop) goes DESCENDING when stop < 1
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.expr("array()").cast("array<int>")
    )
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(k)]
    )
    return F.array_distinct(F.transform(idx, shingle))


def fingerprint_columns(text: Column | str, k: int = 3) -> list[Column]:
    """Winnowing-style fingerprint: total shingles + extremal shingle
    hashes (min-wise sketch of the shingle set). Column-API convenience
    — for corpus scans use `with_fingerprint` (staged gram source, same
    values; see the staging note below)."""
    sh = word_shingles(text, k)
    hashes = F.transform(sh, lambda s: F.md5(s))
    return [
        doc_hash(text).alias("content_hash"),
        F.size(sh).cast("long").alias("n_shingles"),
        F.array_min(hashes).alias("min_shingle_hash"),
        F.array_max(hashes).alias("max_shingle_hash"),
    ]


def with_fingerprint(df: DataFrame, text_col: Column | str, k: int = 3) -> DataFrame:
    """Append `fingerprint_columns`' four outputs — staged form
    (identical values, corpus-scan cost)."""
    sh = with_word_ngrams(df, text_col, k, "_fpc_sh", distinct=True)
    hashed = sh.withColumn("_fpc_h", F.transform("_fpc_sh", lambda s: F.md5(s)))
    return hashed.select(
        *[F.col(c) for c in df.columns],
        doc_hash(text_col).alias("content_hash"),
        F.size("_fpc_sh").cast("long").alias("n_shingles"),
        F.array_min("_fpc_h").alias("min_shingle_hash"),
        F.array_max("_fpc_h").alias("max_shingle_hash"),
    )


def word_ngrams(text: Column | str, n: int) -> Column:
    """ALL k-word n-grams (with multiplicity, unlike `word_shingles`) —
    the occurrence list repetition metrics count over."""
    words = F.split(normalized_text(text), " ")
    sz = F.size(words)
    idx = F.when(sz >= n, F.sequence(F.lit(1), sz - (n - 1))).otherwise(
        F.expr("array()").cast("array<int>")
    )
    gram = lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)])  # noqa: E731
    return F.transform(idx, gram)


# ---------------------------------------------------------------------------
# Staged (DataFrame-level) gram builders — the scale path.
#
# The Column-API builders (`word_shingles` / `word_ngrams` /
# `winnow_fingerprint_set`) embed the `split(normalized_text(...))` word
# array INSIDE their HOF lambdas. Catalyst evaluates a lambda body's
# non-lambda subtrees PER ELEMENT, so a one-expression gram column
# re-splits the whole document once per gram per referenced word —
# O(m²·k) character work per doc. Measured on 200-word docs this is
# ~1700x slower than staging (67 s vs 0.04 s for 5k docs' winnow scan).
#
# The staged builders materialize words/grams/hashes as aliased columns
# across separate Projects. CollapseProject leaves them materialized
# because each alias is referenced more than once and is not cheap
# (plan-gated: tests/test_plan_quality.py asserts the optimized plan
# contains exactly one `split` per staged gram source). Prefer these for
# every corpus-scale scan; the Column API remains for short-text
# convenience and oracle-parity snippets.
# ---------------------------------------------------------------------------


def with_word_ngrams(
    df: DataFrame,
    text_col: Column | str,
    n: int,
    out_col: str,
    distinct: bool = False,
) -> DataFrame:
    """Append the n-word gram array of ``text_col`` as ``out_col`` —
    staged so the split/gram trees evaluate once per row (see the
    staging note above). ``distinct=True`` gives `word_shingles`
    semantics (the unit set for Jaccard/MinHash), default keeps
    multiplicity (`word_ngrams` semantics)."""
    wc = f"_{out_col}_words"
    words = df.withColumn(wc, F.split(normalized_text(text_col), " "))
    sz = F.size(wc)
    idx = F.when(sz >= n, F.sequence(F.lit(1), sz - (n - 1))).otherwise(
        F.expr("array()").cast("array<int>")
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col(wc), i + j) for j in range(n)]
    )
    grams = F.transform(idx, gram)
    if distinct:
        grams = F.array_distinct(grams)
    return words.withColumn(out_col, grams).drop(wc)


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: Column | str,
    out_col: str = "fingerprints",
    k: int = 3,
    w: int = 4,
    hash_mode: str = "md5",
) -> DataFrame:
    """Append the winnowing fingerprint set of ``text_col`` as
    ``out_col`` — the staged form of `winnow_fingerprint_set` (identical
    values, corpus-scan cost). See that function for the algorithm and
    ``hash_mode`` contract."""
    hc = f"_{out_col}_h"
    g = with_word_ngrams(df, text_col, k, f"_{out_col}_grams")
    if hash_mode == "md5":
        hfn = F.md5
    elif hash_mode == "xxhash64":
        hfn = lambda x: F.xxhash64(x)  # noqa: E731
    else:
        raise ValueError(f"hash_mode must be 'md5' or 'xxhash64', got {hash_mode!r}")
    h = g.withColumn(hc, F.transform(F.col(f"_{out_col}_grams"), hfn)).drop(
        f"_{out_col}_grams"
    )
    m = F.size(hc)
    length = m - (w - 1)
    acc = F.slice(hc, 1, length)
    for off in range(1, w):
        acc = F.zip_with(acc, F.slice(hc, 1 + off, length), lambda a, b: F.least(a, b))
    wins = F.when(m >= w, acc).otherwise(F.col(hc))
    return h.withColumn(out_col, F.array_sort(F.array_distinct(wins))).drop(hc)


def ngram_repetition_columns(text: Column | str, n: int) -> list[Column]:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1, as reproduced by open pipelines like RedPajama/Dolma):

    - ``dup{n}_frac`` — fraction of n-gram characters contained in
      n-grams that occur more than once in the document,
    - ``top{n}_frac`` — fraction covered by the single most repeated
      n-gram (occurrences × length).

    Both are computed WITHIN the row — sort the gram list and fold runs
    of equal neighbors with one higher-order ``aggregate`` — so a
    100 TB corpus pays one scan, zero shuffle, no UDF. Definitions
    match the SQL-oracle formulation exactly: with c(g) the per-doc
    count of gram g and L(g) its character length,
    ``dup = Σ_{c(g)≥2} c(g)·L(g)``, ``top = max_g c(g)·L(g)``,
    ``tot = Σ_g c(g)·L(g)``; fractions are dup/tot and top/tot.

    Column-API convenience — for corpus scans use `with_ngram_repetition`
    (staged gram source, same values; see the staging note above).
    """
    return _repetition_cols_from_sorted_grams(F.array_sort(word_ngrams(text, n)), n)


def with_ngram_repetition(
    df: DataFrame, text_col: Column | str, ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Append ``dup{n}_frac``/``top{n}_frac`` for each n in ``ns`` —
    the staged form of `ngram_repetition_columns` (identical values,
    corpus-scan cost)."""
    out = df
    for n in ns:
        out = with_word_ngrams(out, text_col, n, f"_rep{n}")
    keep = [F.col(c) for c in df.columns]
    reps = []
    for n in ns:
        reps.extend(
            _repetition_cols_from_sorted_grams(F.array_sort(F.col(f"_rep{n}")), n)
        )
    return out.select(*keep, *reps)


def _repetition_cols_from_sorted_grams(grams: Column, n: int) -> list[Column]:
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(1).alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("tot"),
    )

    def merge(acc, x):
        same = x.eqNullSafe(acc.getField("prev"))
        run = F.when(same, acc.getField("run") + 1).otherwise(F.lit(1))
        ln = F.length(x).cast("long")
        # a gram's 2nd occurrence retro-credits the 1st (2·len), later
        # occurrences add len each — totals Σ c(g)·L(g) over c(g) ≥ 2
        dup_add = F.when(
            same, F.when(acc.getField("run") == 1, 2 * ln).otherwise(ln)
        ).otherwise(F.lit(0).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc.getField("dup") + dup_add).alias("dup"),
            F.greatest(acc.getField("top"), run.cast("long") * ln).alias("top"),
            (acc.getField("tot") + ln).alias("tot"),
        )

    st = F.aggregate(grams, init, merge)
    dup, top, tot = (st.getField(f) for f in ("dup", "top", "tot"))
    return [
        (dup.cast("double") / tot).alias(f"dup{n}_frac"),
        (top.cast("double") / tot).alias(f"top{n}_frac"),
    ]


def winnow_fingerprint_set(
    text: Column | str, k: int = 3, w: int = 4, hash_mode: str = "md5"
) -> Column:
    """Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
    MOSS algorithm): hash every k-gram, slide a window of ``w`` hashes,
    keep each window's minimum — guaranteeing any shared run of
    ``w + k - 1`` words between two documents shares a fingerprint.
    The set is distinct + sorted; docs shorter than one window keep all
    their hashes. Entirely in-row: one scan, zero shuffle.

    ``hash_mode``:

    - ``"md5"`` (default) — 32-char hex strings, lexicographic min.
      Engine-agnostic (DuckDB computes identical hashes), so this is
      the oracle-parity baseline. Cost: the w−1 `least()` passes below
      compare 32-byte strings, all interpreted.
    - ``"xxhash64"`` — BIGINT fingerprints; min over longs is one
      primitive compare per element, ~an order of magnitude cheaper
      per document (measured in ``tools/bench_winnow.py``). THE SCALE
      PATH: at corpus scale the k-gram hash + sliding min dominates the
      scan stage, so a 100 TB run should always pass ``"xxhash64"``.
      Which k-grams become window minima differs between hash modes,
      but the winnowing guarantee (every shared ``w + k - 1``-word run
      shares a fingerprint) holds under ANY hash, so downstream overlap
      detection flags the same pairs (property-tested).
    """
    grams = word_ngrams(text, k)
    if hash_mode == "md5":
        hashes = F.transform(grams, F.md5)
    elif hash_mode == "xxhash64":
        hashes = F.transform(grams, lambda g: F.xxhash64(g))
    else:
        raise ValueError(f"hash_mode must be 'md5' or 'xxhash64', got {hash_mode!r}")
    m = F.size(hashes)
    # sliding-window min as an element-wise least() over w shifted
    # copies — O(m·w) scalar comparisons with NO per-window array
    # slicing (a transform(i -> array_min(slice(h, i, w))) copies the
    # window per position and is ~100x slower interpreted)
    length = m - (w - 1)
    acc = F.slice(hashes, 1, length)
    for off in range(1, w):
        acc = F.zip_with(acc, F.slice(hashes, 1 + off, length), lambda a, b: F.least(a, b))
    wins = F.when(m >= w, acc).otherwise(hashes)
    return F.array_sort(F.array_distinct(wins))


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 5,
    max_doc_freq: int = 64,
    hash_mode: str = "md5",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    the plagiarism/near-copy detector that catches SHARED PASSAGES
    (contiguous runs), which whole-document MinHash dilutes away.

    Scale shape: fingerprints explode to a posting list and pair up via
    an equi-join on the fingerprint — the LSH-bucket trick — but
    fingerprints with document frequency above ``max_doc_freq`` are
    DROPPED first (boilerplate n-grams carry no pairing signal, the idf
    argument), so no posting list can go quadratic. One shuffle for the
    doc-frequency filter, one for the pair count.

    ``hash_mode="md5"`` is the oracle-parity baseline;
    ``"xxhash64"`` is the scale path (BIGINT fingerprints: primitive
    sliding-min compares AND 8-byte instead of 32-byte shuffle keys) —
    see `winnow_fingerprint_set`. Exact per-pair shared counts differ
    between modes (different grams become window minima); which PAIRS
    clear ``min_shared`` is property-tested to agree on well-separated
    corpora."""
    staged = with_winnow_fingerprints(
        df.select(F.col(id_col), _c(text_col).alias("_wtxt")),
        "_wtxt", "_wfps", k, w, hash_mode,
    ).drop("_wtxt")
    # checkpoint BEFORE the explode: a non-outer Generate makes Catalyst
    # infer a size(fingerprints) > 0 filter and push it below the staged
    # projections, re-inlining the whole gram tree into one per-row
    # Filter (the O(m²·k) pathology again — measured 9 s for 500 docs).
    # The barrier keeps the inferred filter on the materialized array.
    # Postings also feed 3 plan branches, so materializing once pays
    # regardless.
    fps = barrier(staged).select(
        F.col(id_col), F.explode(F.col("_wfps")).alias("fp")
    )
    rare = fps.groupBy("fp").agg(F.count("*").alias("_df")).filter(
        F.col("_df") <= max_doc_freq
    )
    kept = fps.join(rare.select("fp"), "fp")
    a = kept.select(F.col(id_col).alias("doc1"), "fp")
    b = kept.select(F.col(id_col).alias("doc2"), "fp")
    return (
        a.join(b, ["fp"])
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").cast("long").alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document statistics table.

    Bit-identical to composing the public helpers column-by-column, but
    ~2.5x cheaper: the one-expression form pays a separate Java-regex
    alternation pass per language marker set plus one for stopwords (the
    dominant cost — measured 0.65s of 1.13s at sf0.1), while here ALL
    marker/stopword occurrences come from ONE `regexp_extract_all` over
    the union pattern, with per-set counts as array-membership filters
    over the staged match array. Shared counts (tokens, char classes)
    are staged as aliased columns so nothing is computed twice."""
    t = _c(text_col)
    langs = list(_LANG_SETS)
    staged = df.select(
        id_col,
        F.length(t).cast("long").alias("_n"),
        ws_token_count(t).alias("_wt"),
        bpe_token_count(t).alias("_bpe"),
        F.regexp_count(t, F.lit(r"[^\w\s]")).alias("_pc"),
        F.regexp_count(t, F.lit(r"[0-9]")).alias("_dc"),
        F.regexp_extract_all(F.lower(t), F.lit(_UNION_PATTERN), 1).alias("_mk"),
        F.regexp_count(F.lower(t), F.lit(CJK_PATTERN)).alias("_cjk"),
    )

    # marker-set counts as SQL strings in one selectExpr — per-set Python
    # HOF lambdas cost several Py4J roundtrips each and dominated this
    # query's measured plan-build time (bench counts build)
    def hits(words: list[str]) -> str:
        # escape quotes so a future marker word like "don't" renders as a
        # valid SQL literal instead of a parse error
        in_list = ", ".join("'{}'".format(w.replace("'", "''")) for w in words)
        return f"size(filter(_mk, w -> w IN ({in_list})))"

    counted = staged.selectExpr(
        id_col,
        "_n",
        "_wt",
        "_bpe",
        "_pc",
        "_dc",
        "_cjk",
        f"{hits(_STOPWORD_SET)} AS _stop",
        *[f"{hits(_LANG_SETS[lang])} AS _h_{lang}" for lang in langs],
    )

    n, wt = F.col("_n"), F.col("_wt")
    punct_ratio = F.when(n > 0, F.col("_pc") / n).otherwise(F.lit(0.0))
    digit_ratio = F.when(n > 0, F.col("_dc") / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(wt > 0, F.col("_stop") / wt).otherwise(F.lit(0.0))
    quality = (
        0.25 * F.least(wt / F.lit(64.0), F.lit(1.0))
        + 0.25 * (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0)))
        + 0.25 * F.least(stop_ratio * 4.0, F.lit(1.0))
        + 0.25 * (F.lit(1.0) - F.least(digit_ratio * 4.0, F.lit(1.0)))
    )
    # same tie-break chain as lang_id: earlier languages win ties
    # (one CASE string: the O(langs²) Column-API condition chain was a
    # measurable slice of plan build)
    arms = []
    for lang in langs:
        cond = [f"_h_{lang} > 0"]
        for other in langs:
            if other != lang and langs.index(other) < langs.index(lang):
                cond.append(f"_h_{lang} > _h_{other}")
            elif other != lang:
                cond.append(f"_h_{lang} >= _h_{other}")
        arms.append(f"WHEN {' AND '.join(cond)} THEN '{lang}'")
    lang_case = f"CASE WHEN _cjk > 0 THEN 'zh' {' '.join(arms)} ELSE 'und' END"
    return counted.select(
        id_col,
        F.col("_n").alias("n_chars"),
        F.col("_wt").alias("n_tokens_ws"),
        F.col("_bpe").alias("n_tokens_bpe"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
        F.expr(lang_case).alias("lang_guess"),
    )


#: PII patterns — the RE2 ∩ Java common subset (no lookaround, no
#: backrefs), so Spark's regexp_* and the DuckDB oracle match the same
#: spans byte-for-byte. Applied in list order; each hit is replaced by
#: its [TAG].
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("PHONE", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("IPV4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
]


def pii_redact(text: Column | str) -> Column:
    """Privacy-scrub stage: replace every PII span with its [TAG] marker.

    Native `regexp_replace` chain — codegen'd per-row work, no shuffle, a
    100 TB corpus pays one scan. (Order matters: emails first so the
    phone/IP digit patterns never see an address's local part.)"""
    out = _c(text)
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def pii_counts(text: Column | str) -> list[Column]:
    """Per-category PII hit counts (audit columns for the scrub report).

    Counts are taken category-by-category on the PROGRESSIVELY redacted
    text, mirroring the replace chain — an email's digits can never be
    double-counted as a phone number."""
    cols: list[Column] = []
    cur = _c(text)
    for tag, pat in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{tag.lower()}"))
        cur = F.regexp_replace(cur, pat, f"[{tag}]")
    return cols


def with_document_chunks(
    df: DataFrame,
    text_col: Column | str,
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Context-window chunking (RAG / pretraining prep): split each
    document into whitespace-token chunks of ``max_tokens`` with
    ``overlap`` tokens of left context, emitting one row per chunk with
    ``chunk_idx`` (0-based), ``chunk_text``, and ``chunk_tokens``.

    Chunk i covers tokens ``[1 + i·(max_tokens - overlap),
    … + max_tokens - 1]`` of the normalized token sequence; the last
    chunk may be shorter. Starts stop once a chunk reaches the document
    end (cap ``n - max_tokens + stride``), so no trailing chunk made
    solely of already-covered overlap tokens is emitted — a duplicate
    overlap-only tail would double-index text in RAG stores.
    Deterministic and engine-portable (the SQL oracle reproduces it
    with range + list_slice).

    Scale shape: staged words (one split per row — see the staging note
    above), starts/slices as in-row array ops, then explode_outer + a
    null filter (a non-outer explode would re-inline the chunk tree into
    an inferred size() filter). One scan, zero shuffle.
    """
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens ({max_tokens})"
        )
    stride = max_tokens - overlap
    wc = "_chk_words"
    words = df.withColumn(wc, F.split(normalized_text(text_col), " "))
    n = F.size(wc)
    starts = F.sequence(
        F.lit(1), F.greatest(n - max_tokens + stride, F.lit(1)), F.lit(stride)
    )
    chunk = lambda s: F.struct(  # noqa: E731
        ((s - 1) / stride).cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice(F.col(wc), s, max_tokens)).alias("chunk_text"),
        F.least(n - s + 1, F.lit(max_tokens)).cast("long").alias("chunk_tokens"),
    )
    chunked = words.withColumn("_chk", F.transform(starts, chunk)).drop(wc)
    return (
        chunked.withColumn("_c", F.explode_outer("_chk"))
        .filter(F.col("_c").isNotNull())
        .select(
            *[c for c in df.columns],
            F.col("_c.chunk_idx").alias("chunk_idx"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.chunk_tokens").alias("chunk_tokens"),
        )
    )


#: Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
#: ... Gopher", Table A1 quality-filter heuristics). The stop-word list
#: is the paper's; thresholds are parameters with the published
#: defaults.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher quality-filter rule bundle: the published heuristics as
    per-rule flags plus the overall keep/drop verdict, one row per doc.

    Rules (Rae et al. 2021 Table A1): word count in [50, 100k]; mean
    word length in [3, 10]; symbol-to-word ratio ('#' or '...') <= 0.1;
    >= 80% of words contain an alphabetic character; >= 2 distinct
    stop words present. (The paper's line-level bullet/ellipsis rules
    are omitted: this corpus is single-line by construction, so they
    are vacuously true and would pad the output.)

    Scale shape: one projection over the scan — every rule is a
    whole-stage-codegen array expression on the split word array, no
    shuffle, no UDF. Filters compose downstream as `WHERE pass`.

    Reference parity: no counterpart (reference has no text pipeline);
    brief's LLM-curation surface.
    """
    t = _c(text_col)
    extra = list(keep_cols or [])
    staged = df.select(
        id_col,
        *extra,
        F.split(normalized_text(t), " ").alias("_w"),
        F.regexp_count(t, F.lit(r"#|\.\.\.")).alias("_sym"),
    )
    n = F.size(F.col("_w"))
    staged = staged.select(
        id_col,
        *extra,
        n.cast("long").alias("n_words"),
        F.expr("aggregate(_w, 0L, (a, x) -> a + length(x))").alias("_len_sum"),
        F.expr("size(filter(_w, x -> x rlike '[A-Za-z]'))").alias("_alpha"),
        sum(
            (F.array_contains(F.col("_w"), w).cast("int") for w in GOPHER_STOPWORDS),
            F.lit(0),
        ).alias("stopword_hits"),
        F.col("_sym"),
    )
    nw = F.col("n_words")
    mean_wl = F.when(nw > 0, F.col("_len_sum") / nw).otherwise(F.lit(0.0))
    sym_ratio = F.when(nw > 0, F.col("_sym") / nw).otherwise(F.lit(0.0))
    alpha_ratio = F.when(nw > 0, F.col("_alpha") / nw).otherwise(F.lit(0.0))
    out = staged.select(
        id_col,
        *extra,
        "n_words",
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        F.col("stopword_hits").cast("long").alias("stopword_hits"),
        nw.between(min_words, max_words).alias("ok_n_words"),
        mean_wl.between(min_mean_word_len, max_mean_word_len).alias("ok_word_len"),
        (sym_ratio <= max_symbol_ratio).alias("ok_symbols"),
        (alpha_ratio >= min_alpha_word_ratio).alias("ok_alpha"),
        (F.col("stopword_hits") >= min_stopword_hits).alias("ok_stopwords"),
    )
    return out.withColumn(
        "pass",
        F.col("ok_n_words")
        & F.col("ok_word_len")
        & F.col("ok_symbols")
        & F.col("ok_alpha")
        & F.col("ok_stopwords"),
    )
