"""Classic-parser completeness leftovers (VERDICT r3 #9): ``*:*``
MatchAllDocsQuery and FuzzyQuery prefixLength."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "spark join merge"),
    (2, "spark join scan spark"),
    (3, "spark merge"),
    (4, "join merge scan"),
    (5, "spark sort"),
    (6, "merge sort scan"),
    (7, "totally unrelated words"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ma_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return d


def test_match_all_returns_every_live_doc(spark, idx):
    eng = SearchEngine(spark, idx)
    rows = eng.search("*:*", k=None)
    assert [r["doc_id"] for r in rows] == [d for d, _ in DOCS]
    assert all(r["score"] == 1.0 for r in rows)
    # k cap + doc_id order
    assert [r["doc_id"] for r in eng.search("*:*", k=3)] == [1, 2, 3]


def test_match_all_with_exclusion(spark, idx):
    eng = SearchEngine(spark, idx)
    got = [r["doc_id"] for r in eng.search("*:* -scan", k=None)]
    # docs containing 'scan': 2, 4, 6
    assert got == [1, 3, 5, 7]


def test_match_all_rejects_scoring_terms(spark, idx):
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.search_df("*:* spark", k=5)


def test_match_all_hides_tombstones(spark, idx, tmp_path):
    import shutil

    from polaris_spark.index.maintenance import delete_docs

    d2 = str(tmp_path / "ma_idx_del")
    shutil.copytree(idx, d2)
    delete_docs(spark, d2, [3, 5])
    eng = SearchEngine(spark, d2)
    assert [r["doc_id"] for r in eng.search("*:*", k=None)] == [1, 2, 4, 6, 7]


def test_match_all_search_after_pages(spark, idx):
    eng = SearchEngine(spark, idx)
    page1 = eng.search("*:*", k=3)
    cur = (page1[-1]["score"], page1[-1]["doc_id"])
    page2 = eng.search("*:*", k=3, after=cur)
    assert [r["doc_id"] for r in page2] == [4, 5, 6]


FUZZ_DOCS = [
    (1, "roam"),
    (2, "foam"),
    (3, "roams"),
    (4, "loam"),
    (5, "ram"),
]


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fz_idx"))
    docs = spark.createDataFrame(FUZZ_DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return d


def test_fuzzy_prefix_length_confines_expansion(spark, fidx):
    free = SearchEngine(spark, fidx)
    # Lucene default prefixLength=0: all 1-edit neighbors expand
    assert set(free._expand_fuzzy("roam", 1)) == {"roam", "foam", "roams",
                                                  "loam", "ram"}
    pl2 = SearchEngine(spark, fidx, fuzzy_prefix_length=2)
    # prefixLength=2: candidates must start with 'ro' exactly
    assert set(pl2._expand_fuzzy("roam", 1)) == {"roam", "roams"}
    # prefix-constrained expansion flows through a real search
    ids_free = {r["doc_id"] for r in free.search("roam~1", k=None)}
    ids_pl = {r["doc_id"] for r in pl2.search("roam~1", k=None)}
    assert ids_free == {1, 2, 3, 4, 5}
    assert ids_pl == {1, 3}


def test_match_all_collector_surfaces(spark, idx):
    """*:* flows through the shared match_df front half: search_count
    equals the live-doc count (IndexSearcher.count(MatchAllDocsQuery)),
    and the mixed serving path pages it without error."""
    eng = SearchEngine(spark, idx)
    assert eng.search_count("*:*") == len(DOCS)
    assert eng.search_count("*:* -scan") == 4
    mixed = eng.search_mixed("*:*", rank_from=0, rank_to=3, payload=False)
    assert [h["doc_id"] for h in mixed["hits"]] == [1, 2, 3]
    # parse helpers skip the marker instead of raising leading-wildcard
    assert eng.query_terms("*:* -scan") == []
