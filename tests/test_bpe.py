"""BPE trainer gates: canonical-greedy equivalence against a pure-Python
reference (including the consecutive-run edge the one-pass replace trick
must get right), tie-break determinism, and the tokenizer fallback."""

import re

import pytest


def _ref_bpe(texts, merges):
    """Canonical greedy BPE on a word-frequency table (left-to-right
    disjoint merges, ties count DESC then pair ASC)."""
    import collections

    wf = collections.Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                wf[w] += 1
    seqs = {w: list(w) + ["</w>"] for w in wf}
    rules = []
    for rnd in range(1, merges + 1):
        pc = collections.Counter()
        for w, f in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))[0]
        rules.append((rnd, a, b, a + b, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return rules, seqs


@pytest.fixture()
def bpe_corpus(spark):
    # 'aaaa'/'aaa' force consecutive-run merges: canonical greedy turns
    # "a a a a" into "aa aa" (disjoint, left-to-right) — the case a naive
    # single-space replace gets wrong.
    texts = [
        "aaaa aaa aaaa banana bandana",
        "aaa aaaa banana banana low lower lowest",
        "low low lower newest newest newest widest",
    ]
    return texts, spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def test_bpe_matches_canonical_reference(bpe_corpus):
    from financedatabase_spark.operators.bpe import bpe_train

    texts, df = bpe_corpus
    ref_rules, ref_seqs = _ref_bpe(texts, merges=8)
    rules, vocab = bpe_train(df, merges=8)
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in rules.orderBy("round").collect()
    ]
    assert got == ref_rules
    got_seqs = {
        r.w: r.seq.split("  ") for r in vocab.collect()
    }
    assert got_seqs == ref_seqs


def test_bpe_run_merge_is_canonical(spark):
    # the distilled one-pass property: "a a a a a" -> "aa aa a"
    from financedatabase_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(0, "aaaaa")], "doc_id int, text string")
    rules, vocab = bpe_train(df, merges=1)
    row = rules.collect()[0]
    assert (row.left_sym, row.right_sym, row.pair_count) == ("a", "a", 4)
    assert vocab.collect()[0].seq.split("  ") == ["aa", "aa", "a", "</w>"]


def test_bpe_fully_merged_word_does_not_crash(spark):
    # 'ab ab ab ab': merge 1 -> 'ab', merge 2 -> 'ab</w>' — the word's
    # seq collapses to ONE symbol. Spark's sequence(1, 0) is the
    # descending [1, 0] (not empty), so an unguarded pair transform hits
    # element_at(sp, 0) and aborts round 3. The guard must let merges run
    # dry gracefully instead.
    from financedatabase_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(0, "ab ab ab ab")], "doc_id int, text string")
    ref_rules, ref_seqs = _ref_bpe(["ab ab ab ab"], merges=5)
    rules, vocab = bpe_train(df, merges=5)
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in rules.orderBy("round").collect()
    ]
    assert got == ref_rules  # runs dry after 2 merges, no crash
    assert {r.w: r.seq.split("  ") for r in vocab.collect()} == ref_seqs


def test_bpe_tokenize_fallback_for_unseen_words(spark):
    from financedatabase_spark.operators.bpe import bpe_train, tokenize_with

    train = spark.createDataFrame([(0, "hello hello world")], "doc_id int, text string")
    _, vocab = bpe_train(train, merges=2)
    probe = spark.createDataFrame([(7, "hello unseen")], "doc_id int, text string")
    out = {r.doc_id: (r.n_tokens, r.n_words) for r in tokenize_with(probe, vocab).collect()}
    # 'hello' resolves through the trained vocab (5 chars + eow - 2 merges
    # = 4 symbols); 'unseen' falls back to len+1 = 7
    assert out[7] == (4 + 7, 2)


def test_bpe_train_is_deterministic(bpe_corpus, spark):
    from financedatabase_spark.operators.bpe import bpe_train

    _, df = bpe_corpus
    a, _ = bpe_train(df, merges=5)
    b, _ = bpe_train(df.repartition(7), merges=5)
    assert [tuple(r) for r in a.orderBy("round").collect()] == [
        tuple(r) for r in b.orderBy("round").collect()
    ]


def test_bpe_batched_matches_canonical(bpe_corpus):
    """The batched trainer must be token-identical to canonical greedy
    BPE — rules AND final vocab — while actually batching (multiple
    merges per round) and crossing a checkpoint boundary."""
    from financedatabase_spark.operators.bpe import bpe_train_batched

    texts, df = bpe_corpus
    ref_rules, ref_seqs = _ref_bpe(texts, merges=40)
    rules, vocab = bpe_train_batched(
        df, merges=40, batch_cap=8, topk=64, checkpoint_every=2
    )
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in rules.orderBy("round").collect()
    ]
    assert got == ref_rules
    assert {r.w: r.seq.split("  ") for r in vocab.collect()} == ref_seqs


def test_bpe_batched_matches_canonical_random_corpus(spark):
    """Adversarial check on a seeded random corpus: overlapping pairs,
    ties, within-word runs. Every learned rule and final sequence must
    match the pure-Python canonical trainer."""
    import random

    rng = random.Random(20260815)
    vocab = ["spark", "data", "aaa", "abab", "banana", "ledger", "qqx",
             "merge", "row", "aa", "bb", "ab", "ba", "rollup", "scan"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    from financedatabase_spark.operators.bpe import bpe_train_batched

    ref_rules, ref_seqs = _ref_bpe(texts, merges=60)
    rules, vocab_df = bpe_train_batched(
        df, merges=60, batch_cap=16, topk=64, checkpoint_every=3
    )
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in rules.orderBy("round").collect()
    ]
    assert got == ref_rules
    assert {r.w: r.seq.split("  ") for r in vocab_df.collect()} == ref_seqs


@pytest.mark.heavy
def test_bpe_batched_large_merge_space(spark):
    """The regime the batched trainer exists for: a high-entropy corpus
    whose merge space exceeds 1024. Gates — merges=1024 completes, the
    aggregation-round count amortizes (rounds <= merges/8), and the
    learned rules are PREFIX-IDENTICAL to the canonical pure-Python
    trainer on the first 256 (batching must not reorder greedy BPE)."""
    import random

    from financedatabase_spark.operators.bpe import bpe_train_batched

    rng = random.Random(20260815)
    # ~2400 distinct high-entropy words over a 94-symbol alphabet (latin +
    # digits + greek + cyrillic, all lowercase-stable): merge space well
    # beyond 1024, and wide enough that symbol-disjoint batches can form —
    # a 26-letter alphabet makes every top pair share symbols, which
    # degenerates batching to ~2 merges/round by construction
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz0123456789"
        + "αβγδεζηθικλμνξοπρστυφχψω"
        + "абвгдежзийклмнопрстуфхцчшщыэюя"
    )
    # sorted() so the word list is independent of PYTHONHASHSEED (set
    # iteration order over strings is hash-randomized); the seeded rng
    # then makes the corpus fully deterministic run-to-run
    words = sorted({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 12)))
        for _ in range(2600)
    })
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(5, 20)))
        for _ in range(1600)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    stats: dict = {}
    rules, _ = bpe_train_batched(
        df, merges=1024, batch_cap=64, topk=512, checkpoint_every=8, stats=stats
    )
    got = [
        (r.left_sym, r.right_sym, r.merged)
        for r in rules.orderBy("round").collect()
    ]
    assert stats["merges_learned"] == 1024, stats  # space NOT exhausted early
    assert stats["rounds"] <= 1024 // 8, stats     # batching actually amortizes

    ref_rules, _ = _ref_bpe(texts, merges=256)
    want = [(l, r, m) for _, l, r, m, _ in ref_rules]
    assert got[:256] == want                        # greedy order preserved
