"""Index build roundtrip + BM25 rank-identity vs the numpy oracle.

Mirrors the reference's storage-unit + end-to-end test strategy
(sourcedb/SourceDbTest.java:97-151, CodeSearchEndToEndTest.java:208-234):
tiny inline corpora with exact expected hit sets, plus the oracle
rank-identity bar from BASELINE.md.
"""

import os

import numpy as np
import pytest

from polaris_spark.index.build import IndexConfig, build_index, term_bucket_py
from polaris_spark.index.codec import decode_ints
from polaris_spark.oracle import BM25Oracle
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts
from polaris_spark.tokenizer import tokenize

# FIXTURES.md §3 mini corpus (reference-test analogs)
MINI = [
    (1, "hello"),
    (2, "world"),
    (3, "hello world"),
    (4, "/* search it */"),
    (5, "Hello"),
    (6, "A a;"),
    (7, "A a;"),
    (8, "A a;"),
]


@pytest.fixture(scope="module")
def mini_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini_idx"))
    docs = spark.createDataFrame(MINI, "doc_id long, text string")
    cfg = IndexConfig(n_buckets=8, n_shards=2, n_chunks=2)
    build_index(spark, docs, d, doc_id_col="doc_id", cfg=cfg)
    return d


def test_mini_dictionary_stats(spark, mini_index):
    """df/cf goldens — the use-count analog (CodeSearchEndToEndTest.java:224-234)."""
    dic = {r["term"]: (r["df"], r["cf"]) for r in
           spark.read.parquet(os.path.join(mini_index, "dictionary")).collect()}
    assert dic["hello"] == (2, 2)   # d1, d3 — NOT d5 (case-sensitive)
    assert dic["Hello"] == (1, 1)
    assert dic["A"] == (3, 3)       # df("A") = 3 golden
    assert dic["a"] == (3, 3)
    assert dic["world"] == (2, 2)


def test_mini_postings_roundtrip(spark, mini_index):
    """Posting lists decode to sorted doc ids with correct tf (the analog of
    the reference *DbTest write→read roundtrips)."""
    posts = spark.read.parquet(os.path.join(mini_index, "postings")).collect()
    seen = {}
    for r in posts:
        docs = decode_ints(bytes(r["doc_ids"]), delta=True)
        tfs = decode_ints(bytes(r["tfs"]))
        assert (np.diff(docs) > 0).all()  # strictly increasing within row
        assert len(docs) == r["df"] == len(tfs)
        assert int(tfs.sum()) == r["cf"]
        assert r["bucket"] == term_bucket_py(r["term"], 8)
        seen.setdefault(r["term"], []).extend(docs.tolist())
    assert sorted(seen["hello"]) == [1, 3]
    assert sorted(seen["A"]) == [6, 7, 8]
    assert sorted(seen["search"]) == [4]


def test_mini_query_goldens(spark, mini_index):
    eng = SearchEngine(spark, mini_index)
    # OR semantics: "hello" → {1,3} (mirrors SourceDbTest.java:134-151)
    hits = eng.search("hello", k=10)
    assert sorted(h["doc_id"] for h in hits) == [1, 3]
    # multi-term: d3 ranked first for "hello world"
    hits = eng.search("hello world", k=10)
    assert hits[0]["doc_id"] == 3
    assert sorted(h["doc_id"] for h in hits) == [1, 2, 3]
    # full-text comment match (CodeSearchEndToEndTest.java:208-221)
    hits = eng.search("search it", k=10)
    assert [h["doc_id"] for h in hits] == [4]
    # case-sensitivity: "hello" must NOT match d5
    assert 5 not in {h["doc_id"] for h in eng.search("hello", k=10)}
    # empty/punct-only query → empty result (SourceDbImpl.java:159-162)
    assert eng.search("!!! ;;;", k=10) == []
    # AND semantics = posting intersection
    hits = eng.search("hello world", k=10, mode="and")
    assert [h["doc_id"] for h in hits] == [3]
    # T6 limit-k probe (SURVEY §2.6: the reference's search(query, 2)
    # not-found/ambiguous existence test): k truncates, and the k=2
    # result is exactly the 2-prefix of the k=10 ranking
    top10 = [(h["doc_id"], h["score"]) for h in eng.search("hello world", k=10)]
    top2 = [(h["doc_id"], h["score"]) for h in eng.search("hello world", k=2)]
    assert len(top2) == 2 and top2 == top10[:2]
    assert len(eng.search("search it", k=2)) == 1  # fewer hits than k


def test_point_lookups(spark, mini_index):
    eng = SearchEngine(spark, mini_index)
    # listUsages analog: doc-sorted occurrence list for a term
    occ = eng.lookup_postings("A")
    assert [(o["doc_id"], o["tf"]) for o in occ] == [(6, 1), (7, 1), (8, 1)]
    # source/getFileHandle analog: doc_id → identity rows
    rows = eng.lookup_docs([1, 3]).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 3]
    # exact-term stats row
    trow = eng.lookup_term("hello").collect()
    assert sum(r["df"] for r in trow) == 2


def _rank_identity(engine_hits, oracle_hits):
    assert len(engine_hits) == len(oracle_hits)
    for eh, (doc, score) in zip(engine_hits, oracle_hits):
        assert eh["doc_id"] == doc
        assert eh["score"] == pytest.approx(score, rel=0, abs=0), (
            f"score mismatch doc {doc}: {eh['score']!r} vs {score!r}"
        )


QUERIES = [
    "hello", "hello world", "search it", "Hello", "A", "world hello A",
]


def test_mini_rank_identity_bit_exact(spark, mini_index):
    oracle = BM25Oracle(MINI)
    eng = SearchEngine(spark, mini_index)
    for q in QUERIES:
        _rank_identity(eng.search(q, k=10), oracle.search(q, k=10))


@pytest.fixture(scope="module")
def synth_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth_idx"))
    pdf = make_transcripts(n_turns=2000, seed=42)
    docs = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_buckets=32, n_shards=4, n_chunks=4)
    build_index(spark, docs, d, cfg=cfg)
    return d, pdf


def test_synth_rank_identity(spark, synth_index):
    """Engine top-10 (doc_id, score) bit-identical to oracle on a 2k-turn
    corpus across a realistic query mix (BASELINE.md correctness bar)."""
    from pyspark.sql import functions as F

    d, pdf = synth_index
    # oracle doc ids must equal the engine's xxhash64 ids
    ids = (
        spark.createDataFrame(pdf[["conv_id", "turn_idx"]])
        .select(F.xxhash64("conv_id", "turn_idx").alias("h"))
        .collect()
    )
    docs = [(r["h"], t) for r, t in zip(ids, pdf["text"])]
    assert len({d0 for d0, _ in docs}) == len(docs), "doc_id collision"
    oracle = BM25Oracle(docs)
    eng = SearchEngine(spark, d)

    vocab_qs = [
        "kari", "toneri",  # plain vocab words (may or may not exist)
        "karito saline",  # multi-term
        "web.search", "read_file",  # tool names
    ]
    # add real terms from the corpus: a hot one and a rare one
    by_df = sorted(oracle.df.items(), key=lambda kv: -kv[1])
    vocab_qs += [by_df[0][0], by_df[len(by_df) // 2][0], by_df[-1][0]]
    camel = [t for t in oracle.df if any(c.isupper() for c in t[1:])][:2]
    vocab_qs += camel
    for q in vocab_qs:
        _rank_identity(eng.search(q, k=10), oracle.search(q, k=10))
        # AND mode too
        _rank_identity(eng.search(q, k=10, mode="and"), oracle.search(q, k=10, mode="and"))


def test_synth_distributed_path_matches_driver_path(spark, synth_index):
    d, _ = synth_index
    eng = SearchEngine(spark, d)
    for q in ["kari", "web.search", "sa mu el"]:
        drv = eng.search(q, k=10)
        dist = [r.asDict() for r in eng.search_df(q, k=10).collect()]
        assert [(h["doc_id"], h["score"]) for h in drv] == [
            (h["doc_id"], h["score"]) for h in dist
        ]


def test_per_turn_invariant(spark, synth_index):
    """input_hint per-row invariant: reconstructed per-turn text under stable
    (conv_id, turn_idx) ordering equals input exactly."""
    d, pdf = synth_index
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(pdf)
    back = (
        docs.join(
            spark.read.parquet(os.path.join(d, "doc_map")),
            (docs.conv_id == F.col("conv_id")) if False else ["conv_id", "turn_idx"],
        )
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    src = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (back["text"].to_numpy() == src["text"].to_numpy()).all()
    assert len(back) == len(src)


def test_list_conversation(spark, synth_index):
    """listFiles analog: one conversation's turns, sorted by turn_idx
    (reference SourceDbImpl.java:70-77 directory children sorted by path)."""
    from polaris_spark.query.engine import SearchEngine

    d, pdf = synth_index
    eng = SearchEngine(spark, d)
    conv = pdf["conv_id"].iloc[0]
    got = eng.list_conversation(conv).collect()
    want = pdf[pdf["conv_id"] == conv].sort_values("turn_idx")
    assert [r["turn_idx"] for r in got] == list(want["turn_idx"])
    assert all(r["conv_id"] == conv for r in got)
    # unknown conversation → empty, no error
    assert eng.list_conversation("no_such_conv").count() == 0


def test_term_cache_serving_mode(spark, mini_index):
    """cache_terms LRU: identical results, negative caching, eviction."""
    from polaris_spark.query.engine import SearchEngine

    cold = SearchEngine(spark, mini_index)
    warm = SearchEngine(spark, mini_index, cache_terms=3)
    for q in ["hello world", "hello world", "A", "nosuchterm"]:
        assert warm.search(q, k=10) == cold.search(q, k=10)
    assert "nosuchterm" in warm._term_cache  # negative entry cached
    assert len(warm._term_cache) <= 3        # LRU capacity respected
    # second lookup of a cached query touches no new terms
    before = list(warm._term_cache)
    warm.search("A", k=10)
    assert set(warm._term_cache) == set(before)


def test_prohibit_operator(spark, mini_index):
    """Lucene-classic '-term' (prohibit): docs containing the negated term
    drop before scoring; driver and distributed paths agree."""
    eng = SearchEngine(spark, mini_index)
    # "hello" matches d1, d3; "-world" removes d3
    hits = eng.search("hello -world", k=10)
    assert [h["doc_id"] for h in hits] == [1]
    # exclusion-only query → empty (no positive terms)
    assert eng.search("-hello", k=10) == []
    # unknown excluded term → no-op
    assert [h["doc_id"] for h in eng.search("hello -zzz", k=10)] == [1, 3]
    # distributed parity
    a = eng.search("hello -world", k=10)
    b = [r.asDict() for r in eng.search_df("hello -world", k=10).collect()]
    assert [(x["doc_id"], x["score"]) for x in a] == [(x["doc_id"], x["score"]) for x in b]
    # exclusion changes membership but NOT surviving docs' scores
    full = {h["doc_id"]: h["score"] for h in eng.search("hello", k=10)}
    assert hits[0]["score"] == full[1]
