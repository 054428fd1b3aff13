"""BPE tokenizer training + encoding (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") over a document corpus — the
tokenizer-TRAINING step of an LLM data pipeline, complementing the
vocab-indexed word-level ``token_ids`` op (ops/analytics) and the BPE-ish
regex counting in ops/text.

Spec (classic Sennrich):
- words: whitespace tokens (``\\s+`` split, empties dropped — the shared
  ``_ws_tokens`` spec of ops/text, so histograms cross-check in DuckDB).
- a word starts as its unicode characters plus a separate end-of-word
  symbol ``EOW`` (Sennrich's ``</w>``; see the EOW constant); each merge step fuses the adjacent symbol pair with the
  highest corpus frequency (weighted by word count) into one symbol.
  Deterministic tie-break: lexicographically smallest (left, right) pair.
  Merging stops after ``n_merges`` steps or when no pair reaches
  ``min_count``.
- encoding a word replays the learned merges in rank order (equivalent to
  the classic lowest-rank-pair-first greedy loop); decoding concatenates
  the subword units and splits on ``EOW`` — so
  ``decode(encode(text)) == ' '.join(ws_tokens(text))`` is an exact
  roundtrip invariant for any corpus and any merge table (gated as
  ``bpe_roundtrip``).

Scale design (100 TB):
- ``bpe_learn`` runs ONE corpus-proportional aggregation (the word
  histogram groupBy — map-side partial agg, one shuffle keyed by word),
  then the merge loop runs on the DRIVER over the top-``max_words``
  histogram rows. That is the standard industrial formulation: BPE
  statistics are a function of the word HISTOGRAM, not the corpus, and the
  histogram is vocabulary-bounded. The cap is a real recall dial at open
  vocabularies, so it is never silent: the op logs how many distinct words
  the cap dropped and what corpus mass they carried.
- ``bpe_encode`` broadcasts the merge ranks (a dict of ≤ n_merges entries)
  and runs an Arrow-batched ``mapInPandas`` with a per-batch word memo:
  each DISTINCT word in a batch is encoded once, so kernel cost tracks
  distinct words, not token volume (agent transcripts repeat tool names
  and identifiers heavily). Zero shuffle — a pure map over the corpus.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

# The kernel-side mirror of the shared whitespace-token spec
# (ops/text._ws_tokens_col, Spark `split(col, '\\s+')`): Java's \s is the
# ASCII set [ \t\n\x0b\f\r] ONLY — Python's str.split()/re-\s are
# Unicode-aware and would split on NBSP etc., silently breaking the exact
# decode∘encode == normalized-text invariant on corpora with Unicode
# whitespace. Every Python-side split in this module MUST use this regex.
_WS_RE = re.compile("[ \t\n\x0b\f\r]+")


def _ws_words(txt) -> list[str]:
    if not isinstance(txt, str):
        return []
    return [w for w in _WS_RE.split(txt) if w]

# End-of-word symbol, kept separate so decode is a split. Sennrich's paper
# uses '</w>'; we use a private-use codepoint so a corpus word that
# LITERALLY contains the sentinel string (markup, code) cannot corrupt the
# decode split — the documented precondition is merely "no U+E000 in the
# text", which no real corpus violates (private-use codepoints carry no
# assigned meaning).
EOW = ""

_INPUT_ROWS_LOG = {}  # op name -> {"distinct_words", "capped_to", "dropped_mass"}


def word_histogram(df, text_col: str = "text"):
    """(word, n) corpus word histogram — whitespace tokens per the shared
    ops/text spec (``_ws_tokens_col``). One shuffle (partial-agg groupBy
    on word)."""
    from .text import _ws_tokens_col

    return (df.select(F.explode(_ws_tokens_col(F.col(text_col))).alias("word"))
              .groupBy("word").agg(F.count("*").alias("n")))


def _pairs_of(syms: tuple) -> Counter:
    c: Counter = Counter()
    for a, b in zip(syms, syms[1:]):
        c[(a, b)] += 1
    return c


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    """Fuse every non-overlapping occurrence of ``pair`` left-to-right."""
    a, b = pair
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_from_histogram(hist: list[tuple[str, int]], n_merges: int,
                         min_count: int = 2) -> list[tuple[str, str]]:
    """The driver-side merge loop over a (word, count) histogram — exact
    classic BPE with incremental pair-count maintenance: each merge only
    re-counts the words that contain the merged pair.

    Deterministic: ties on pair frequency break to the lexicographically
    smallest (left, right). Stops early when the best pair's frequency
    falls below ``min_count``."""
    words: list[tuple] = []
    counts: list[int] = []
    for w, c in hist:
        words.append(tuple(w) + (EOW,))
        counts.append(int(c))
    pair_counts: Counter = Counter()
    pair_words: dict[tuple, set] = {}
    for wi, syms in enumerate(words):
        for p, k in _pairs_of(syms).items():
            pair_counts[p] += k * counts[wi]
            pair_words.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max by (count, lexicographically smallest pair)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_count:
            break
        merges.append(best)
        for wi in sorted(pair_words.get(best, ())):
            old = words[wi]
            new = _merge_word(old, best)
            words[wi] = new
            c = counts[wi]
            for p, k in _pairs_of(old).items():
                pair_counts[p] -= k * c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            for p, k in _pairs_of(new).items():
                pair_counts[p] += k * c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def bpe_learn(spark, df, text_col: str = "text", n_merges: int = 200,
              max_words: int = 65536, min_count: int = 2):
    """Learn a BPE merge table from a corpus. Returns a DataFrame
    (rank:int, left:string, right:string) ordered by rank.

    The histogram collect is capped at the top ``max_words`` words by
    (count desc, word asc); the cap is logged with the dropped corpus mass
    (never silent — see module docstring)."""
    hist_df = word_histogram(df, text_col).persist()
    try:
        agg = hist_df.agg(F.count("*").alias("v"),
                          F.sum("n").alias("m")).collect()[0]
        n_vocab, mass = int(agg["v"] or 0), int(agg["m"] or 0)
        top = (hist_df.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
                      .collect())
    finally:
        hist_df.unpersist()
    hist = [(r["word"], r["n"]) for r in top]
    kept_mass = sum(c for _, c in hist)
    _INPUT_ROWS_LOG["bpe_learn"] = {
        "distinct_words": n_vocab, "capped_to": len(hist),
        "dropped_mass_frac": 0.0 if not mass else round(1 - kept_mass / mass, 6),
    }
    merges = learn_from_histogram(hist, n_merges, min_count=min_count)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).orderBy("rank")


def encode_word(word: str, ranks: dict) -> list[str]:
    """Encode ONE word by replaying merges in rank order: repeatedly fuse
    the present pair with the lowest rank (all its occurrences at once,
    left-to-right) — the standard greedy BPE encoder, provably equal to
    replaying the full learned merge sequence restricted to this word."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = list(_merge_word(tuple(syms), best_pair))
    return syms


def bpe_encode(df, merges_df, text_col: str = "text", out_col: str = "bpe"):
    """Append ``out_col`` (array<string> of subword units) to every row.
    ``merges_df`` is ``bpe_learn``'s output (or any (rank,left,right)
    frame). Broadcast ranks + Arrow-batched mapInPandas with a per-batch
    distinct-word memo; zero shuffle."""
    ranks = {(r["left"], r["right"]): int(r["rank"])
             for r in merges_df.collect()}
    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    # fresh StructType: StructType.add mutates in place, and df.schema can
    # hand back the live object
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, ArrayType(StringType()))])
    cols = df.columns

    def enc_iter(batches):
        rk = b_ranks.value
        memo: dict[str, list[str]] = {}

        def enc(word):
            t = memo.get(word)
            if t is None:
                t = encode_word(word, rk)
                memo[word] = t
            return t

        for pdf in batches:
            pdf[out_col] = [
                [t for w in _ws_words(txt) for t in enc(w)]
                for txt in pdf[text_col]
            ]
            yield pdf[cols + [out_col]]

    return df.mapInPandas(enc_iter, schema)


def bpe_decode(df, tokens_col: str = "bpe", out_col: str = "decoded"):
    """Inverse of :func:`bpe_encode`: concatenate the subword units and
    split on ``EOW`` — JVM-side column expressions only (the decode is
    pure string algebra, no Python needed)."""
    joined = F.concat_ws("", F.col(tokens_col))
    words = F.filter(F.split(joined, EOW, -1), lambda x: x != F.lit(""))
    return df.withColumn(out_col, F.concat_ws(" ", words))


def bpe_vocab(spark, df, merges_df, text_col: str = "text"):
    """(token_id, token) vocabulary table: the corpus ALPHABET (distinct
    characters of the whitespace words, plus the EOW sentinel) takes the
    low ids in lexicographic order, then each merge's output string takes
    the next id in rank order — the standard base-then-merges id layout.
    Two merges can emit the same string (("ab","c") and ("a","bc") both
    make "abc"); the first rank keeps the id. Alphabet discovery is one
    distinct-character aggregate (alphabet-bounded output); everything
    else is driver-side over the ≤ n_merges merge rows."""
    from pyspark.sql import functions as F

    from .text import _ws_tokens_col

    toks = _ws_tokens_col(F.col(text_col))
    chars = (df.select(F.explode(F.split(F.concat_ws("", toks), "")).alias("c"))
               .where(F.col("c") != "").distinct().collect())
    vocab: dict[str, int] = {}
    for c in sorted(r["c"] for r in chars):
        vocab.setdefault(c, len(vocab))
    vocab.setdefault(EOW, len(vocab))
    for r in merges_df.orderBy("rank").collect():
        vocab.setdefault(r["left"] + r["right"], len(vocab))
    return spark.createDataFrame(
        sorted(((i, t) for t, i in vocab.items())),
        "token_id int, token string",
    )


def bpe_encode_ids(df, merges_df, vocab_df, text_col: str = "text",
                   out_col: str = "bpe_ids"):
    """Like :func:`bpe_encode` but emitting ``array<int>`` token ids via a
    broadcast vocab dict (characters unseen at vocab-build time map to -1,
    the documented OOV id). Same zero-shuffle Arrow map + per-batch
    distinct-word memo."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    ranks = {(r["left"], r["right"]): int(r["rank"])
             for r in merges_df.collect()}
    vocab = {r["token"]: int(r["token_id"]) for r in vocab_df.collect()}
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((ranks, vocab))
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, ArrayType(IntegerType()))])
    cols = df.columns

    def enc_iter(batches):
        rk, vb = b.value
        memo: dict[str, list[int]] = {}

        def enc(word):
            ids = memo.get(word)
            if ids is None:
                ids = [vb.get(t, -1) for t in encode_word(word, rk)]
                memo[word] = ids
            return ids

        for pdf in batches:
            pdf[out_col] = [
                [i for w in _ws_words(txt) for i in enc(w)]
                for txt in pdf[text_col]
            ]
            yield pdf[cols + [out_col]]

    return df.mapInPandas(enc_iter, schema)


def bpe_decode_ids(df, vocab_df, ids_col: str = "bpe_ids",
                   out_col: str = "decoded"):
    """Inverse of :func:`bpe_encode_ids`: ids → tokens via a JVM
    map_from_arrays literal + the string algebra of :func:`bpe_decode` —
    no Python. The map literal is an EXPRESSION of vocab size: ideal to
    ~10⁴ entries (typical subword vocabs are ≤ 10⁵ and still fine), but
    for an unusually huge vocab prefer posexplode + broadcast-join against
    ``vocab_df`` + collect_list re-assembly — same result, plan-friendly
    at any size."""
    from pyspark.sql import functions as F

    pairs = sorted((int(r["token_id"]), r["token"])
                   for r in vocab_df.collect())
    m = F.map_from_arrays(F.array(*[F.lit(i) for i, _ in pairs]),
                          F.array(*[F.lit(t) for _, t in pairs]))
    toks = F.transform(F.col(ids_col), lambda i: m[i])
    joined = F.concat_ws("", toks)
    words = F.filter(F.split(joined, EOW, -1), lambda x: x != F.lit(""))
    return df.withColumn(out_col, F.concat_ws(" ", words))
