"""Positional postings + exact phrase queries.

The reference's search path uses Lucene's classic MultiFieldQueryParser
(reference sourcedb/SourceDbImpl.java:131-137), which supports quoted
PhraseQuery over the analyzed token stream; positions come from
StandardTokenizer token order. Here: positions = base-token index, sub-tokens
at their parent's slot (Lucene position-increment-0 convention), postings
store per-occurrence positions delta+varint-encoded (positions=True builds).
"""

import math
import os

import numpy as np
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.codec import decode_positions, encode_ints
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize, tokenize_with_positions

DOCS = [
    (1, "big data systems make big data useful"),
    (2, "data big and small"),
    (3, "the big data revolution needs big compute"),
    (4, "BigData is one token here"),
    (5, "big little data"),
    (6, "totally unrelated text"),
]


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("phrase_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                positions=True))
    return SearchEngine(spark, d)


def test_tokenize_with_positions_spec():
    toks, pos = tokenize_with_positions("big BigData big_data")
    # base tokens at their slots, sub-tokens at the parent's slot
    assert toks == ["big", "BigData", "big_data", "Big", "Data", "big", "data"]
    assert pos == [0, 1, 2, 1, 1, 2, 2]
    assert toks == tokenize("big BigData big_data")  # same order as tokenize


def test_positions_codec_roundtrip():
    tfs = np.array([3, 1, 2], dtype=np.int64)
    flat = [[0, 4, 9], [7], [2, 2]]  # duplicate positions legal
    deltas = []
    for ps in flat:
        deltas.append(ps[0])
        deltas.extend(b - a for a, b in zip(ps, ps[1:]))
    buf = encode_ints(np.array(deltas, dtype=np.int64))
    out = decode_positions(buf, tfs)
    assert [list(p) for p in out] == flat


def test_lookup_positions(pidx):
    occ = {o["doc_id"]: o["positions"] for o in pidx.lookup_positions("big")}
    # doc 1: "big data systems make big data useful" → big at 0, 4
    assert occ[1] == [0, 4]
    assert occ[3] == [1, 5]
    assert occ[5] == [0]
    # doc 4 has only "BigData" whose sub-tokens are "Big"/"Data" — terms are
    # case-sensitive (reference analyzer has no LowerCaseFilter), so no "big"
    assert 4 not in occ
    occ_cap = {o["doc_id"]: o["positions"] for o in pidx.lookup_positions("Big")}
    assert occ_cap == {4: [0]}  # sub-token at its parent's slot


def test_phrase_golden(pidx):
    hits = pidx.search_phrase("big data", k=10)
    ids = [h["doc_id"] for h in hits]
    # docs 1 (pf=2), 3 (pf=1) match; 2 has "data big", 5 has "big little
    # data"; 4 is BigData whose sub-tokens share slot 0 (no adjacency)
    assert set(ids) == {1, 3}
    pf = {h["doc_id"]: h["phrase_freq"] for h in hits}
    assert pf == {1: 2, 3: 1}
    assert hits[0]["doc_id"] == 1  # higher phrase_freq → higher score


def test_phrase_score_formula(pidx):
    # score == (Σ idf) × impact(pf, dl) with the engine's documented BM25
    st = pidx.stats
    N, avgdl, k1, b = st["N"], st["avgdl"], st["k1"], st["b"]

    def idf(term):
        df = sum(1 for _, t in DOCS if term in tokenize(t))
        return math.log(1.0 + (N - df + 0.5) / (df + 0.5))

    dl1 = len(tokenize(DOCS[0][1]))
    pf = 2.0
    expect = (idf("big") + idf("data")) * (
        pf * (k1 + 1.0) / (pf + k1 * (1.0 - b + b * dl1 / avgdl))
    )
    got = {h["doc_id"]: h["score"] for h in pidx.search_phrase("big data")}
    assert got[1] == pytest.approx(expect, rel=1e-12)


def test_phrase_driver_vs_distributed(pidx):
    a = pidx.search_phrase("big data", k=10)
    b = [r.asDict() for r in pidx.search_phrase_df("big data", k=10).collect()]
    assert [(x["doc_id"], x["score"]) for x in a] == [
        (x["doc_id"], x["score"]) for x in b
    ]


def test_phrase_edge_cases(pidx):
    assert pidx.search_phrase("") == []
    assert pidx.search_phrase("zzz yyy") == []
    assert pidx.search_phrase("data useful") != []   # cross-check another pair
    assert pidx.search_phrase("useful data") == []   # order matters
    # three-term phrase
    three = pidx.search_phrase("big data systems")
    assert [h["doc_id"] for h in three] == [1]
    assert three[0]["phrase_freq"] == 1
    # single-term phrase falls back to term search (case-sensitive: doc 4's
    # "Data" sub-token does not match "data")
    one = pidx.search_phrase("data")
    assert {h["doc_id"] for h in one} == {1, 2, 3, 5}


def test_nonpositional_index_rejects_phrase(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nopos_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    eng = SearchEngine(spark, d)
    with pytest.raises(ValueError, match="positions"):
        eng.search_phrase("big data")
    # and regular search still works on the same index
    assert eng.search("big data", k=10)


def test_compaction_preserves_positions(spark, tmp_path_factory):
    """forceMerge(1) analog on a positional index must carry positions
    through the decode→re-encode cycle: phrase results identical, and an
    appended generation merges in too."""
    from polaris_spark.index.maintenance import append_index, compact_index

    d = str(tmp_path_factory.mktemp("phrase_compact_idx"))
    docs = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                positions=True))
    more = spark.createDataFrame(DOCS[4:], "doc_id long, text string")
    append_index(spark, more, d, doc_id_col="doc_id")
    eng = SearchEngine(spark, d)
    before = eng.search_phrase("big data", k=10)
    occ_before = eng.lookup_positions("big")
    compact_index(spark, d)
    eng2 = SearchEngine(spark, d)
    assert eng2.search_phrase("big data", k=10) == before
    assert eng2.lookup_positions("big") == occ_before
    # compacted layout: one generation
    import glob as _g
    assert sorted(os.path.basename(p) for p in _g.glob(os.path.join(d, "postings", "chunk=*"))) == ["chunk=0"]
