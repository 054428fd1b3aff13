"""Field-qualified PhraseQuery (classic ``f:"a b"`` / ``f:("a b")`` /
``f:"a b"~N`` / ``f:"a b"^B``): the build lays field tokens on fresh
consecutive position slots (index/build.py:163-173), so field-internal
adjacency runs through the one positions kernel. Driver and distributed
paths must agree hit-for-hit; a positions-less index still rejects."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "big data joins the spark party", "big data room"),
    (2, "data big reversed order here", "small room"),
    (3, "unrelated text entirely", "big data room"),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fp_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, title string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                positions=True, field_cols=("title",)))
    return SearchEngine(spark, d)


def _ids(hits):
    return [h["doc_id"] for h in hits]


def test_fielded_phrase_matches_field_positions_only(eng):
    # titles "big data room" (docs 1, 3) phrase-match; doc 2's TEXT has
    # both words (reversed) and its title has "room" — must NOT match
    hits = eng.search_mixed('title:"big data"', rank_to=5,
                            payload=False)["hits"]
    assert set(_ids(hits)) == {1, 3}
    # bare phrase stays text-scoped: doc 3's title alone must not match
    bare = eng.search_mixed('"big data"', rank_to=5, payload=False)["hits"]
    assert _ids(bare) == [1]
    # adjacency is real: a non-adjacent field pair misses exactly, and
    # the classic slop suffix recovers it
    assert eng.search_mixed('title:"big room"', rank_to=5,
                            payload=False)["hits"] == []
    slop = eng.search_mixed('title:"big room"~1', rank_to=5,
                            payload=False)["hits"]
    assert set(_ids(slop)) == {1, 3}


def test_field_group_boost_and_composition(eng):
    grp = eng.search_mixed('title:("big data")', rank_to=5,
                           payload=False)["hits"]
    fld = eng.search_mixed('title:"big data"', rank_to=5,
                           payload=False)["hits"]
    assert [(h["doc_id"], h["score"]) for h in grp] \
        == [(h["doc_id"], h["score"]) for h in fld]
    boosted = eng.search_mixed('title:"big data"^3', rank_to=5,
                               payload=False)["hits"]
    base = {h["doc_id"]: h["score"] for h in fld}
    for h in boosted:
        assert h["score"] == pytest.approx(3 * base[h["doc_id"]])
    both = eng.search_mixed('title:"big data" AND spark', rank_to=5,
                            payload=False)["hits"]
    assert _ids(both) == [1]


def test_driver_distributed_parity(eng):
    for q in ('title:"big data"', 'title:"data room"', 'title:"big room"~1',
              'title:"big data"^3', 'title:"big data" AND spark'):
        drv = [(h["doc_id"], round(h["score"], 9)) for h in
               eng.search_mixed(q, rank_to=5, payload=False)["hits"]]
        dist = [(r["doc_id"], round(r["score"], 9)) for r in
                eng.search_bool_df(q, k=5).collect()]
        assert drv == dist, q


def test_positions_less_index_still_rejects(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fp_nopos"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, title string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                field_cols=("title",)))
    eng = SearchEngine(spark, d)
    with pytest.raises(ValueError, match="positions"):
        eng.parse_bool('title:"big data"')


def test_batch_path_parity(eng):
    """search_many_df routes fielded phrases through the same tree
    kernels: per-query batch results bit-identical to the single path."""
    qs = ['title:"big data"', '"big data"']
    by_q = {}
    for r in eng.search_many_df(qs, k=5).collect():
        by_q.setdefault(r["query"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    for q in qs:
        single = [(r["doc_id"], round(r["score"], 9))
                  for r in eng.search_bool_df(q, k=5).collect()]
        assert sorted(by_q.get(q, []), key=lambda x: (-x[1], x[0])) \
            == single, q
