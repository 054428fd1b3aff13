"""SynonymQuery (Lucene blended-statistics synonym scoring) — reference
context: Lucene's QueryParser emits SynonymQuery when an analyzer stacks
terms at one position (SynonymFilter); the reference's analyzer has no
synonym stage, so this is the beyond-parity analyzer surface. Blend spec
per ``score_shard_synonym``: per-doc tf = Σ member tfs, docFreq = max
member df (GLOBAL — a member absent from one shard still shapes the
blend), one BM25 impact per token group.
"""
import math
from collections import Counter

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize

SYN = {"spark": ["stream"], "join": ["merge"]}
Q = "spark join"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path_factory.mktemp("synidx") / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2))
    return SearchEngine(spark, idx)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .select("doc_id", "text").toPandas())
    return {r.doc_id: list(tokenize(r.text)) for r in pdf.itertuples()}


def _ref(corpus, groups, mode="or", k1=1.2, b=0.75):
    N = len(corpus)
    dl = {d: len(t) for d, t in corpus.items()}
    avgdl = sum(dl.values()) / N
    tfs = {d: Counter(t) for d, t in corpus.items()}
    df = Counter()
    for d, c in tfs.items():
        for t in set(c):
            df[t] += 1
    out = {}
    for d in corpus:
        s, n = 0.0, 0
        for bse in sorted(groups):
            ts = groups[bse]
            tsum = sum(tfs[d].get(t, 0) for t in ts)
            if not tsum:
                continue
            dfb = max(df[t] for t in ts)
            w = math.log(1.0 + (N - dfb + 0.5) / (dfb + 0.5))
            s += w * (tsum * (k1 + 1.0)
                      / (tsum + k1 * (1.0 - b + b * dl[d] / avgdl)))
            n += 1
        if n and (mode == "or" or n == len(groups)):
            out[d] = (s, n)
    return out


def test_matches_oracle_both_paths(eng, corpus):
    drv = eng.search_synonyms(Q, SYN, k=15)
    dst = [r.asDict() for r in
           eng.search_synonyms_df(Q, SYN, k=15).collect()]
    assert [(r["doc_id"], r["score"]) for r in drv] \
        == [(r["doc_id"], r["score"]) for r in dst]
    ref = _ref(corpus, {"spark": ["spark", "stream"],
                        "join": ["join", "merge"]})
    top = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:15]
    assert [d for d, _ in top] == [r["doc_id"] for r in drv]
    for (d, (s, n)), r in zip(top, drv):
        assert abs(s - r["score"]) < 1e-9 and n == r["n_match"]


def test_blend_is_not_boolean_or(eng):
    """A doc matching several variants must NOT be score-inflated the way
    a flat OR of all variants is: tf-sum saturates one impact."""
    syn_hits = {r["doc_id"]: r["score"]
                for r in eng.search_synonyms(Q, SYN, k=None)}
    or_hits = {r["doc_id"]: r["score"]
               for r in eng.search("spark stream join merge", k=None)}
    assert set(syn_hits) == set(or_hits)  # same match set
    assert any(abs(syn_hits[d] - or_hits[d]) > 1e-9 for d in syn_hits)


def test_empty_synonyms_equal_flat_or_up_to_stats(eng):
    """With no synonyms each group is the bare term: identical match set
    to flat OR search (scores equal too — blend of one term = the term)."""
    a = eng.search_synonyms(Q, {}, k=None)
    bres = eng.search(Q, k=None)
    assert sorted((r["doc_id"], r["score"]) for r in a) \
        == sorted((r["doc_id"], r["score"]) for r in bres)


def test_and_mode_and_filter(eng):
    sa = eng.search_synonyms(Q, SYN, k=None, mode="and")
    so = eng.search_synonyms(Q, SYN, k=None)
    assert sa and len(sa) < len(so)
    assert all(r["n_match"] == 2 for r in sa)
    base = {r["doc_id"]: r["score"] for r in so}
    flt = [r.asDict() for r in
           eng.search_synonyms_df(Q, SYN, k=None,
                                  filter_query="scan").collect()]
    assert flt and all(base[r["doc_id"]] == r["score"] for r in flt)
    assert len(flt) < len(so)


def test_guards(eng):
    for bad in ['"a b"', "a AND b", "a -b", "f:x", "a*"]:
        with pytest.raises(ValueError):
            eng.search_synonyms(bad, {})
    with pytest.raises(ValueError, match="more than one"):
        eng.search_synonyms(Q, {"spark": ["merge"], "join": ["merge"]})
    # unknown synonym terms are harmless (df 0 never wins the blend)
    res = eng.search_synonyms(Q, {"spark": ["zzznope"]}, k=5)
    assert res == eng.search_synonyms(Q, {}, k=5)


def test_tombstones_hidden(spark, tmp_path):
    from polaris_spark.index.maintenance import delete_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2))
    e = SearchEngine(spark, idx)
    victims = [r["doc_id"] for r in e.search_synonyms(Q, SYN, k=3)]
    delete_docs(spark, idx, victims)
    e2 = SearchEngine(spark, idx)
    after = {r["doc_id"] for r in e2.search_synonyms(Q, SYN, k=None)}
    assert not (after & set(victims))
    assert after == {r["doc_id"] for r in
                     e2.search_synonyms_df(Q, SYN, k=None).collect()}


def test_explain_synonyms_bit_exact(eng):
    hits = eng.search_synonyms(Q, SYN, k=5)
    for h in hits:
        rows = eng.explain_synonyms(Q, SYN, h["doc_id"])
        assert len(rows) == h["n_match"]
        total = 0.0
        for r in rows:
            total += r["contribution"]
        assert total == h["score"]  # bit-exact
        for r in rows:
            assert r["contribution"] == r["idf"] * r["impact"]
