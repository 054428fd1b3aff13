"""Distributed prohibit-term exclusion (VERDICT r1 #1).

The '-term' operator must not collect excluded doc_ids onto the driver in
the distributed path: exclusion is a cogrouped per-shard (shard, doc_id)
frame decoded via mapInPandas. The driver/serving path keeps the low-latency
array route but falls over to the distributed path above
``exclude_driver_limit`` postings.
"""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize

# 'the' appears in most docs (df > hot_df_threshold=4 → salted/hot);
# 'rare' in a few
DOCS = [(i, f"the common filler number{i} "
            + ("rare gem data" if i % 7 == 0 else "plain data text"))
        for i in range(40)]


@pytest.fixture(scope="module")
def xidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("excl_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                hot_df_threshold=4))
    return d


def _expected_excluded(query_terms, exc_terms, k=None):
    """Brute-force oracle: docs matching any include term minus docs
    containing any excluded term."""
    hits = set()
    for did, text in DOCS:
        toks = set(tokenize(text))
        if toks & set(query_terms) and not (toks & set(exc_terms)):
            hits.add(did)
    return hits


def test_hot_term_excluded_distributed_no_driver_collect(spark, xidx):
    eng = SearchEngine(spark, xidx)
    # the excluded term 'the' has df=40 > hot_df_threshold=4 → salted
    salted = eng._candidates(["the"]).select("salted").distinct().collect()
    assert [r["salted"] for r in salted] == [True]

    # the distributed path must never touch the driver-side id union
    def boom(exc):
        raise AssertionError("driver-side _excluded_docs called on search_df path")

    eng._excluded_docs = boom
    # every doc contains 'the' → excluding the hot term empties the result
    got = {r["doc_id"] for r in eng.search_df("data -the", k=None).collect()}
    assert got == _expected_excluded(["data"], ["the"]) == set()
    # partial hot-ish exclusion: 'rare' docs drop, the rest stay
    got2 = {r["doc_id"] for r in eng.search_df("data -rare", k=None).collect()}
    assert got2 == _expected_excluded(["data"], ["rare"])
    assert got2 and all(i % 7 != 0 for i in got2)


def test_driver_fallover_above_limit(spark, xidx):
    eng = SearchEngine(spark, xidx)
    normal = eng.search("data -rare", k=10)
    eng2 = SearchEngine(spark, xidx)
    eng2.exclude_driver_limit = 0  # force the distributed fallover

    def boom(exc):
        raise AssertionError("array path used despite limit=0")

    eng2._excluded_docs = boom
    assert eng2.search("data -rare", k=10) == normal


def test_exclusion_parity_driver_vs_distributed(spark, xidx):
    eng = SearchEngine(spark, xidx)
    for q in ["data -rare", "rare common -gem", "data gem -number0"]:
        a = [(h["doc_id"], h["score"]) for h in eng.search(q, k=None)]
        b = [(r["doc_id"], r["score"])
             for r in eng.search_df(q, k=None).collect()]
        assert a == b, q


def test_exclusion_keeps_maxscore_exact(spark, xidx):
    """Pruned (k-limited) exclusion results must equal unpruned-head —
    exclusion happens before θ₀ derivation in both paths."""
    eng = SearchEngine(spark, xidx)
    full = eng.search("data common -rare", k=None)
    topk = eng.search("data common -rare", k=5)
    assert topk == full[:5]
    dtopk = [(r["doc_id"], r["score"])
             for r in eng.search_df("data common -rare", k=5).collect()]
    assert dtopk == [(h["doc_id"], h["score"]) for h in full[:5]]
