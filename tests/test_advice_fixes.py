"""Regression tests for the round-1 ADVICE findings.

1. Serving-mode term LRU must never drop query terms when a query's distinct
   terms exceed ``cache_terms`` (results are assembled before eviction).
2. JVM tokenizer build path (use_pandas_tokenizer=False) must handle
   zero-token docs (no NULL-term posting rows / array desync).
3. The phrase oracle SQL mirrors sub-token-at-parent-slot semantics (a
   camel/separator sub-token participates in phrase adjacency at its parent
   base token's slot), same as the engine.
4. ``search_phrase_df`` has the same 1-term fallback as ``search_phrase``.
5. ``stateful_sessionize`` extends session_start backwards for in-watermark
   late events older than the stored start.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "getUserAccountById returns the account data"),
    (2, "account data lives in the user table"),
    (3, "data data data and more account rows"),
    (4, "totally unrelated text"),
    (5, "getUserAccountById again with user data"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("advice_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return d


# ---------------------------------------------------------- 1. LRU parity

def test_lru_smaller_than_query_is_result_identical(spark, idx):
    cold = SearchEngine(spark, idx)
    tiny = SearchEngine(spark, idx, cache_terms=1)
    # 'getUserAccountById' alone parses to 6 terms (base + 5 sub-tokens) —
    # far more than cache_terms=1
    for q in ["getUserAccountById", "getUserAccountById account data",
              "user data account"]:
        want = cold.search(q, k=10)
        assert tiny.search(q, k=10) == want, q
        # second pass: mixed cache-hit/miss assembly must also be identical
        assert tiny.search(q, k=10) == want, q


def test_lru_exclusion_parity(spark, idx):
    cold = SearchEngine(spark, idx)
    tiny = SearchEngine(spark, idx, cache_terms=1)
    q = "data -getUserAccountById"  # exclusion terms also exceed the cache
    want = cold.search(q, k=10)
    assert {h["doc_id"] for h in want} == {2, 3}  # docs 1/5 excluded
    assert tiny.search(q, k=10) == want
    assert tiny.search(q, k=10) == want


def test_lru_and_mode_parity(spark, idx):
    cold = SearchEngine(spark, idx)
    tiny = SearchEngine(spark, idx, cache_terms=2)
    q = "user account data"
    want = cold.search(q, k=10, mode="and")
    assert want, "fixture must have an AND match"
    assert tiny.search(q, k=10, mode="and") == want


# ------------------------------------------- 2. JVM path zero-token docs

def test_jvm_tokenizer_zero_token_docs(spark, tmp_path_factory):
    rows = [(1, "real text here"), (2, ""), (3, ";;; !!!"), (4, None),
            (5, "more real text")]
    schema = "doc_id long, text string"
    d_jvm = str(tmp_path_factory.mktemp("jvm_idx"))
    d_py = str(tmp_path_factory.mktemp("py_idx"))
    docs = spark.createDataFrame(rows, schema)
    cfg = dict(n_buckets=4, n_shards=2, n_chunks=2)
    build_index(spark, docs, d_jvm, doc_id_col="doc_id",
                cfg=IndexConfig(**cfg, use_pandas_tokenizer=False))
    build_index(spark, docs, d_py, doc_id_col="doc_id",
                cfg=IndexConfig(**cfg, use_pandas_tokenizer=True))

    # doc_stats: every doc present, zero-token docs at dl=0, identical paths
    for d in (d_jvm, d_py):
        ds = {r["doc_id"]: r["dl"] for r in
              spark.read.parquet(os.path.join(d, "doc_stats")).collect()}
        assert set(ds) == {1, 2, 3, 4, 5}
        assert ds[2] == ds[3] == ds[4] == 0

    # dictionary and search results identical between the two paths
    dic = lambda d: sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(d, "dictionary")).collect()
    )
    assert dic(d_jvm) == dic(d_py)
    a = SearchEngine(spark, d_jvm).search("real text", k=10)
    b = SearchEngine(spark, d_py).search("real text", k=10)
    assert a == b and a


# ------------------------------------- 3. phrase oracle sub-token parity

PHRASE_DOCS = [
    (1, "the_big data.x starts with a separator sub-token adjacency"),
    (2, "big data plain adjacency"),
    (3, "bigData single token no adjacency"),
    (4, "theBig dataX camel sub-token adjacency"),
    (5, "data big wrong order"),
    (6, "foo_foo foo_bar duplicate-start multiplicity"),
]


def test_phrase_oracle_matches_engine_on_subtoken_fixture(spark, tmp_path_factory):
    from polaris_spark.gate import phrase_sql

    d = str(tmp_path_factory.mktemp("phrase_oracle_idx"))
    docs = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                positions=True))
    eng = SearchEngine(spark, d)

    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", PHRASE_DOCS)

    for phrase in ["big data", "foo foo", "foo bar"]:
        got = {(h["doc_id"], round(h["score"] * 10000), h["phrase_freq"])
               for h in eng.search_phrase(phrase, k=None)}
        want = {(r[0], r[1], r[2]) for r in
                con.execute(phrase_sql(phrase, table="fixture")).fetchall()}
        assert got == want, phrase

    # the load-bearing cases the old base-token-only oracle got wrong:
    ids = {h["doc_id"] for h in eng.search_phrase("big data", k=None)}
    assert 1 in ids   # sub-tokens big@0 (of the_big) + data@1 (of data.x)
    assert 4 not in ids  # camel subs are case-preserving: Big/Data ≠ big/data
    assert ids == {1, 2}
    # multiplicity: foo_foo emits foo@slot twice → pf counts both anchors
    pf = {h["doc_id"]: h["phrase_freq"]
          for h in eng.search_phrase("foo bar", k=None)}
    assert pf == {6: 2}


# --------------------------------------------- 4. 1-term phrase fallback

def test_search_phrase_df_single_term_fallback(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("phrase1_idx"))
    docs = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    # NON-positional index: driver path falls back to term search for a
    # 1-term phrase; the distributed path must do the same (not raise)
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    eng = SearchEngine(spark, d)
    a = eng.search_phrase("data", k=10)
    b = [r.asDict() for r in eng.search_phrase_df("data", k=10).collect()]
    assert [(x["doc_id"], x["score"], x["phrase_freq"]) for x in a] == [
        (x["doc_id"], x["score"], x["phrase_freq"]) for x in b
    ]
    assert a and a[0]["phrase_freq"] is None


# ------------------------------------- 5. sessionize late-event backstop

def test_sessionize_late_event_extends_session_start(spark, tmp_path):
    from tests.test_streaming_stateful import _rows, _run_stream, _write

    from polaris_spark.streaming import stateful_sessionize

    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    gap = 1800
    # batch 1: session starts at 10:00
    _write(spark, inp,
           _rows("A", "user", "2026-01-01 10:00:00", "2026-01-01 10:01:00"), "f1")
    _run_stream(stateful_sessionize, spark, inp, out, ckpt, gap_s=gap)
    # batch 2: LATE event older than the stored start (within watermark,
    # within gap of last=10:01) — must pull session_start back to 09:59:30
    _write(spark, inp, _rows("A", "user", "2026-01-01 09:59:30"), "f2")
    _run_stream(stateful_sessionize, spark, inp, out, ckpt, gap_s=gap)
    # batch 3: far-future event closes A's session in-stream
    _write(spark, inp, _rows("A", "user", "2026-01-01 13:00:00"), "f3")
    _run_stream(stateful_sessionize, spark, inp, out, ckpt, gap_s=gap)

    rows = spark.read.parquet(out).collect()
    sess = {(r["conv_id"], str(r["session_start"])): (str(r["session_end"]), r["n_turns"])
            for r in rows}
    assert sess[("A", "2026-01-01 09:59:30")] == ("2026-01-01 10:01:00", 3)
