"""Document deletion (Lucene deleteDocuments/expungeDeletes analog — the
data-removal path a training corpus must honor).

Logical phase: tombstones filter EVERY search surface (flat OR/AND,
prohibit, boolean tree, phrase, batched multi-query, doc lookups, facets)
while BM25 stats stay pre-delete — so surviving docs keep their exact
pre-delete scores (Lucene's deleted-but-unmerged semantics) and top-k cuts
happen after the liveness filter (exactness).

Physical phase: compact_index applies tombstones; afterwards the index is
bit-identical to a fresh build without the deleted docs (stats included)
and the tombstone set is retired.
"""

import os

import pytest
from pyspark.sql import functions as F

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import compact_index, delete_docs
from polaris_spark.query.engine import SearchEngine

CFG = dict(n_buckets=8, n_shards=2, n_chunks=1, positions=True,
           attr_cols=("src",))  # 1 chunk: an 8-doc corpus can leave a chunk empty

DOCS = [
    (1, "a", "alpha beta gamma"),
    (2, "a", "alpha beta"),
    (3, "b", "alpha gamma delta"),
    (4, "b", "beta gamma"),
    (5, "c", "alpha beta gamma delta"),
    (6, "c", "delta epsilon"),
    (7, "a", "alpha beta epsilon"),
    (8, "b", "gamma delta epsilon"),
]
DELETED = [2, 5, 8]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, src string, text string")


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("del_idx"))
    build_index(spark, _mk(spark, DOCS), d, doc_id_col="doc_id",
                cfg=IndexConfig(**CFG))
    return d


@pytest.fixture(scope="module")
def deleted_idx(spark, idx, tmp_path_factory):
    import shutil

    d = str(tmp_path_factory.mktemp("del_idx2"))
    os.rmdir(d)
    shutil.copytree(idx, d)
    out = delete_docs(spark, d, DELETED)
    assert out["n_tombstones"] == len(DELETED)
    # idempotent: re-deleting the same ids is a no-op
    assert delete_docs(spark, d, DELETED)["n_tombstones"] == len(DELETED)
    return d


def _ids(hits):
    return [h["doc_id"] for h in hits]


def test_deletes_filter_every_search_surface(spark, idx, deleted_idx):
    pre = SearchEngine(spark, idx)
    post = SearchEngine(spark, deleted_idx)
    dset = set(DELETED)

    for q, mode in [("alpha beta", "or"), ("alpha gamma", "and"),
                    ("alpha -delta", "or")]:
        before = pre.search(q, k=None, mode=mode)
        after = post.search(q, k=None, mode=mode)
        # survivors keep their EXACT pre-delete scores (stale-stats
        # semantics); deleted docs vanish
        assert after == [h for h in before if h["doc_id"] not in dset], q
        # distributed path bit-identical
        ddf = [r.asDict() for r in
               post.search_df(q, k=None, mode=mode).collect()]
        assert ddf == after, q

    # top-k exactness: k results are the k-prefix of the filtered ranking
    full = [h for h in pre.search("alpha beta gamma", k=None)
            if h["doc_id"] not in dset]
    assert post.search("alpha beta gamma", k=2) == full[:2]

    # boolean tree (driver + distributed)
    bq = "alpha AND (beta OR delta)"
    bafter = post.search_bool(bq, k=None)
    assert set(_ids(bafter)) & dset == set()
    assert bafter == [h for h in pre.search_bool(bq, k=None)
                      if h["doc_id"] not in dset]
    assert [r.asDict() for r in post.search_bool_df(bq, k=None).collect()] \
        == bafter

    # phrase (driver + distributed)
    pafter = post.search_phrase("alpha beta", k=None)
    assert set(_ids(pafter)) & dset == set()
    assert pafter == [h for h in pre.search_phrase("alpha beta", k=None)
                      if h["doc_id"] not in dset]
    assert [r.asDict() for r in
            post.search_phrase_df("alpha beta", k=None).collect()] == pafter

    # batched multi-query: per-query bit-identity with the single paths
    qs = ["alpha beta", "alpha -delta", "alpha AND (beta OR delta)",
          '"alpha beta"']
    rows = post.search_many_df(qs, k=None).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query"], []).append(r.asDict())
    for q in qs[:2]:
        assert [(h["doc_id"], round(h["score"], 9))
                for h in sorted(by_q.get(q, []), key=lambda h: h["rank"])] \
            == [(h["doc_id"], round(h["score"], 9)) for h in post.search(q, k=None)], q
    assert [(h["doc_id"], round(h["score"], 9))
            for h in sorted(by_q.get(qs[2], []), key=lambda h: h["rank"])] \
        == [(h["doc_id"], round(h["score"], 9)) for h in post.search_bool(qs[2], k=None)]

    # lookups + facets hide tombstones
    assert _ids([r.asDict() for r in post.lookup_docs([1, 2, 5]).collect()]) \
        == [1]
    assert set(r["doc_id"] for r in post.list_by_attr("src", "c").collect()) \
        == {6}
    # 'alpha' matches {1,2,3,5,7}; deleted {2,5} drop → a:{1,7}, b:{3}
    fc = {r["facet"]: r["n"]
          for r in post.facet_counts("alpha", "src").collect()}
    assert fc == {"a": 2, "b": 1}


def test_compact_applies_deletes_physically(spark, deleted_idx, tmp_path):
    import shutil

    d = str(tmp_path / "applied")
    shutil.copytree(deleted_idx, d)
    m = compact_index(spark, d)
    assert m["purged_deletes"] == len(DELETED)
    assert not os.path.exists(os.path.join(d, "deletes"))

    d2 = str(tmp_path / "scratch")
    survivors = [r for r in DOCS if r[0] not in set(DELETED)]
    build_index(spark, _mk(spark, survivors), d2, doc_id_col="doc_id",
                cfg=IndexConfig(**CFG))
    eng, ref = SearchEngine(spark, d), SearchEngine(spark, d2)
    # POST-compact scores equal the fresh no-deleted build (stats recomputed)
    for q in ["alpha beta", "gamma delta", "epsilon"]:
        assert eng.search(q, k=None) == ref.search(q, k=None), q
    assert eng.stats["N"] == ref.stats["N"]
    assert abs(eng.stats["avgdl"] - ref.stats["avgdl"]) < 1e-12

    # update recipe: post-compact the tombstoned id can be re-added...
    from polaris_spark.index.maintenance import append_index

    m2 = append_index(spark, _mk(spark, [(2, "a", "alpha reborn")]), d,
                      doc_id_col="doc_id")
    assert m2["appended_docs"] == 1
    assert 2 in {h["doc_id"]
                 for h in SearchEngine(spark, d).search("reborn", k=None)}


def test_readd_of_tombstoned_id_rejected_before_compact(spark, deleted_idx):
    """Tombstones filter by doc_id, so a pre-compaction re-add would be
    hidden by its own tombstone — the collision check must reject it."""
    from polaris_spark.index.maintenance import append_index

    with pytest.raises(ValueError, match="already exist"):
        append_index(spark, _mk(spark, [(2, "a", "alpha reborn")]),
                     deleted_idx, doc_id_col="doc_id")


def test_doc_terms_hides_tombstones(spark, idx, deleted_idx):
    """The term-vectors surface (doc_terms) hides tombstoned docs like
    every other serving surface — tf/ rows still exist on disk, the
    liveness gate must blank them."""
    dead = DELETED[0]
    live_eng = SearchEngine(spark, idx)
    assert live_eng.doc_terms(dead).count() > 0
    del_eng = SearchEngine(spark, deleted_idx)
    assert del_eng.doc_terms(dead).count() == 0


def test_pinned_hides_tombstones(spark, idx, deleted_idx):
    """A tombstoned doc cannot be promoted: pinning a deleted id drops
    it (like an unknown id), surviving pinned ids keep their order, and
    the organic tail is tombstone-filtered like every search surface."""
    from polaris_spark.query.engine import SearchEngine

    live = SearchEngine(spark, idx)
    dele = SearchEngine(spark, deleted_idx)
    # pin a deleted doc (5), a live doc (3), and an unknown id
    got = dele.search_pinned("alpha beta", [5, 3, 999], k=8).collect()
    assert [r["doc_id"] for r in got if r["pinned"] == 1] == [3]
    assert all(r["doc_id"] not in (2, 5, 8) for r in got)
    # on the undeleted index the same pin list promotes 5 then 3
    got_live = live.search_pinned("alpha beta", [5, 3, 999], k=8).collect()
    assert [r["doc_id"] for r in got_live if r["pinned"] == 1] == [5, 3]
