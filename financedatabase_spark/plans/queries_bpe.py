"""BPE tokenizer-training queries (LLM-pipeline vocabulary learning).

The oracle reproduces the trainer round-for-round in pure SQL: each
round is a CTE pair (weighted pair counts -> arg-max pair) and the next
round's vocab applies the merge with the same double-space `replace`
trick the engine uses (operators/bpe.py module docstring proves the
one-pass canonical-greedy property). Scalar subqueries feed the learned
pair into the replace, so the whole chain is one self-contained
statement DuckDB evaluates without any driver loop. CTEs are
MATERIALIZED per the repo's DuckDB-1.0 convention (each wf/p CTE is
referenced multiple times; inlining would re-run earlier rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from financedatabase_spark.plans.registry import register
from financedatabase_spark.sources.readers import load_table

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

#: merge rounds for the registered queries — enough to learn multi-char
#: units (round 6 merges the round-1 output "er" with </w>) while keeping
#: the oracle chain readable.
N_MERGES = 6


def _bpe_rounds_sql(n: int) -> str:
    """CTE chain wf0 -> p1 -> wf1 -> ... -> p{n} (1-based rounds)."""
    parts = [
        f"""
    words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents
    ),
    wf0 AS MATERIALIZED (
      SELECT w, count(*)::BIGINT AS freq,
             regexp_replace(w, '(.)', '\\1  ', 'g') || '</w>' AS seq
      FROM words WHERE w <> '' GROUP BY w
    )"""
    ]
    for r in range(1, n + 1):
        prev = f"wf{r - 1}"
        parts.append(f"""
    pc{r} AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(generate_series(1, len(sp) - 1),
                      i -> sp[i] || ' ' || sp[i + 1])) AS pair
        FROM (SELECT freq, string_split(seq, '  ') AS sp FROM {prev})
      ) GROUP BY pair
    ),
    p{r} AS MATERIALIZED (
      SELECT pair, cnt,
             string_split(pair, ' ')[1] AS l,
             string_split(pair, ' ')[2] AS r,
             replace(pair, ' ', '') AS m
      FROM pc{r} ORDER BY cnt DESC, pair ASC LIMIT 1
    ),
    wf{r} AS MATERIALIZED (
      -- coalesce to a can't-match sentinel (chr(1) never appears in a
      -- symbol) so an empty p{{r}} (merges ran dry) passes seq through
      -- unchanged instead of NULL-cascading through later rounds — this
      -- mirrors the engine's graceful break out of the merge loop.
      SELECT w, freq,
             trim(replace(' ' || seq || ' ',
                          ' ' || coalesce((SELECT l FROM p{r}), chr(1)) || '  '
                              || coalesce((SELECT r FROM p{r}), chr(1)) || ' ',
                          ' ' || coalesce((SELECT m FROM p{r}), chr(1)) || ' ')) AS seq
      FROM {prev}
    )""")
    return ",".join(parts)


_RULES_SELECT = "\n    UNION ALL ".join(
    f"SELECT {r}::BIGINT AS round, l AS left_sym, r AS right_sym,"
    f" m AS merged, cnt AS pair_count FROM p{r}"
    for r in range(1, N_MERGES + 1)
)


@register(
    "bpe_train_merges",
    oracle=f"""
    WITH {_bpe_rounds_sql(N_MERGES)}
    {_RULES_SELECT}
    """,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn N_MERGES BPE merge rules from the documents corpus — the
    vocabulary-training stage of an LLM pipeline. Corpus scanned once
    into a checkpointed (word, freq) table; each round is one vocab-sized
    aggregate + a single-row collect + a map-side canonical-greedy merge
    (operators/bpe.py). Runs the BATCHED trainer (bpe_train_batched —
    provably token-identical to canonical greedy BPE, the production
    path) against the sequential one-merge-per-round SQL oracle, so the
    correctness gate covers the batching logic itself. Deterministic:
    ties break (count DESC, pair ASC) under binary collation in both
    engines."""
    from financedatabase_spark.operators.bpe import bpe_train_batched

    rules, _ = bpe_train_batched(
        load_table(spark, sf_dir, "documents"), merges=N_MERGES, batch_cap=3
    )
    return rules


@register(
    "bpe_tokenize_counts",
    oracle=f"""
    WITH {_bpe_rounds_sql(N_MERGES)},
    tok AS MATERIALIZED (
      SELECT w, len(string_split(seq, '  '))::BIGINT AS _ntok FROM wf{N_MERGES}
    ),
    doc_words AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w FROM documents
    )
    SELECT doc_id,
           CAST(sum(coalesce(t._ntok, length(d.w) + 1)) AS BIGINT) AS n_tokens,
           count(*)::BIGINT AS n_words
    FROM (SELECT doc_id, w FROM doc_words WHERE w <> '') d
    LEFT JOIN tok t USING (w)
    GROUP BY doc_id
    """,
)
def bpe_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the trained BPE merges: every
    word resolves through the trained vocab's final symbol sequence
    (unseen words fall back to chars + EOW). One explode + one
    broadcastable vocab join — the corpus side never shuffles."""
    from financedatabase_spark.operators.bpe import bpe_train_batched, tokenize_with

    docs = load_table(spark, sf_dir, "documents")
    _, vocab = bpe_train_batched(docs, merges=N_MERGES, batch_cap=3)
    return tokenize_with(docs, vocab)
