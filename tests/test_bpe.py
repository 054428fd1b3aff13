"""BPE tokenizer training (ops/bpe): merge-table correctness vs an
independent naive reference implementation, the hand-worked Sennrich
example, encode/learn replay equivalence, the Spark roundtrip invariant,
and the corpus n-gram heavy-hitters op."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.bpe import (EOW, bpe_decode, bpe_encode, bpe_learn,
                                   encode_word, learn_from_histogram)
from polaris_spark.ops.text import top_ngrams
from polaris_spark.synth import make_transcripts


# ------------------------------------------------ naive reference (no
# incremental bookkeeping: recount every pair each iteration)

def _naive_learn(hist, n_merges, min_count=2):
    words = {i: list(w) + [EOW] for i, (w, _) in enumerate(hist)}
    counts = {i: c for i, (_, c) in enumerate(hist)}
    merges = []
    for _ in range(n_merges):
        pc = Counter()  # full recount each iteration: one per adjacency slot
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += counts[i]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_count:
            break
        merges.append(best)
        a, b = best
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def _naive_encode(word, merges):
    syms = list(word) + [EOW]
    for a, b in merges:  # replay the full sequence in learned order
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def test_sennrich_toy_merges():
    """The classic corpus from the paper, with our separate-EOW variant:
    hand-derived expected sequence (ties break to the lexicographically
    smallest pair)."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = learn_from_histogram(hist, 6)
    assert m == [("e", "s"), ("es", "t"), ("est", EOW),
                 ("l", "o"), ("lo", "w"), ("e", "w")]
    ranks = {p: i for i, p in enumerate(m)}
    assert encode_word("lowest", ranks) == ["low", "est" + EOW]
    assert encode_word("newest", ranks) == ["n", "ew", "est" + EOW]


def test_learn_matches_naive_reference():
    """Incremental learn == naive full-recount learn on random histograms
    (both determinism and the bookkeeping's correctness)."""
    rng = random.Random(7)
    alpha = "abcdef"
    for trial in range(8):
        vocab = {"".join(rng.choice(alpha)
                         for _ in range(rng.randint(1, 8))): rng.randint(1, 40)
                 for _ in range(rng.randint(5, 60))}
        hist = sorted(vocab.items())
        n_merges = rng.randint(1, 30)
        assert learn_from_histogram(hist, n_merges) == \
            _naive_learn(hist, n_merges), f"trial {trial}"


def test_encode_rank_greedy_equals_replay():
    """Lowest-rank-first greedy encode == replaying the merge list in
    order — for merges learned from random histograms and words both in
    and OUT of the training vocabulary."""
    rng = random.Random(11)
    alpha = "abcd"
    for _ in range(6):
        hist = sorted({"".join(rng.choice(alpha)
                               for _ in range(rng.randint(1, 7))):
                       rng.randint(1, 20)
                       for _ in range(30)}.items())
        merges = learn_from_histogram(hist, 25, min_count=1)
        ranks = {p: i for i, p in enumerate(merges)}
        for _ in range(40):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            assert encode_word(w, ranks) == _naive_encode(w, merges), w


def test_repeated_pair_within_word():
    """'aaaa' exercises overlapping-pair handling: (a,a) counts per
    non-overlapping slot convention must agree between learn paths and the
    merge must fuse left-to-right."""
    hist = [("aaaa", 3), ("aa", 2)]
    m = learn_from_histogram(hist, 3, min_count=1)
    assert m == _naive_learn(hist, 3, min_count=1)
    ranks = {p: i for i, p in enumerate(m)}
    assert "".join(encode_word("aaaa", ranks)) == "aaaa" + EOW


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_transcripts(n_turns=400, seed=21)
    return spark.createDataFrame(pdf).select("conv_id", "turn_idx", "text")


def test_spark_roundtrip_and_cap_log(spark, corpus):
    """decode(encode(text)) == whitespace-normalized text for EVERY row;
    the histogram cap is logged, never silent."""
    from polaris_spark.ops import bpe as bpe_mod

    merges = bpe_learn(spark, corpus, n_merges=80, max_words=500)
    log = bpe_mod._INPUT_ROWS_LOG["bpe_learn"]
    assert log["capped_to"] <= 500 and log["distinct_words"] >= log["capped_to"]
    enc = bpe_encode(corpus, merges)
    dec = bpe_decode(enc)
    norm = F.concat_ws(" ", F.filter(F.split(F.col("text"), r"\s+"),
                                     lambda x: x != F.lit("")))
    assert dec.where(F.col("decoded") != norm).count() == 0
    # distributed encode == driver encode_word per word
    ranks = {(r["left"], r["right"]): r["rank"] for r in merges.collect()}
    rows = enc.orderBy("conv_id", "turn_idx").head(20)
    for r in rows:
        want = [t for w in r["text"].split() for t in encode_word(w, ranks)]
        assert r["bpe"] == want


def test_empty_and_whitespace_only_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one")], "id long, text string")
    merges = bpe_learn(spark, df, n_merges=5, min_count=1)
    dec = bpe_decode(bpe_encode(df, merges))
    got = {r["id"]: r["decoded"] for r in dec.collect()}
    assert got == {1: "", 2: "", 3: "one"}


def test_top_ngrams_hand_fixture(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "  a  b "), (3, "x"), (4, "b c a")],
        "id long, text string")
    got = [(r["ngram"], r["n_occur"])
           for r in top_ngrams(df, n=2, k=3).collect()]
    assert got == [("a b", 3), ("b c", 2), ("c a", 2)]


def test_bpe_ids_roundtrip(spark, corpus):
    """ids: base-then-merges vocab layout, ids→tokens→text roundtrip,
    dup-output-string merges share one id, OOV chars map to -1."""
    from polaris_spark.ops.bpe import (bpe_decode_ids, bpe_encode_ids,
                                       bpe_vocab)

    merges = bpe_learn(spark, corpus, n_merges=60)
    vocab = bpe_vocab(spark, corpus, merges)
    vrows = vocab.collect()
    ids = [r["token_id"] for r in vrows]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    toks = {r["token"]: r["token_id"] for r in vrows}
    assert EOW in toks
    # base chars come before every merged (multi-char) token
    base_max = max(i for t, i in toks.items() if len(t) == 1)
    merged_min = min((i for t, i in toks.items()
                      if len(t.replace(EOW, "")) > 1), default=base_max + 1)
    assert base_max < merged_min
    enc = bpe_encode_ids(corpus, merges, vocab)
    dec = bpe_decode_ids(enc, vocab)
    norm = F.concat_ws(" ", F.filter(F.split(F.col("text"), r"\s+"),
                                     lambda x: x != F.lit("")))
    assert dec.where(F.col("decoded") != norm).count() == 0
    # OOV char (never in the training corpus) -> -1
    oov = spark.createDataFrame([(1, "bézier")], "id long, text string")
    row = bpe_encode_ids(oov, merges, vocab).first()
    assert -1 in row["bpe_ids"]


def test_unicode_whitespace_matches_spark_split_spec(spark):
    """Regression (review finding): the kernel's word split must equal
    Spark's Java-\\s ASCII set — a NBSP is NOT a separator, so
    'a\\u00a0b' is ONE word on both sides and the roundtrip stays exact."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "x y"), (3, "tab\tsplit")],
        "id long, text string")
    merges = bpe_learn(spark, df, n_merges=10, min_count=1)
    dec = bpe_decode(bpe_encode(df, merges))
    norm = F.concat_ws(" ", F.filter(F.split(F.col("text"), r"\s+"),
                                     lambda x: x != F.lit("")))
    assert dec.where(F.col("decoded") != norm).count() == 0
    # histogram and kernel agree the NBSP word is one token
    words = {r["word"] for r in
             __import__("polaris_spark.ops.bpe", fromlist=["x"])
             .word_histogram(df).collect()}
    assert "a b" in words and "x y" in words
    assert {"tab", "split", "c"} <= words
