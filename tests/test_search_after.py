"""searchAfter (Lucene IndexSearcher.searchAfter analog): keyset deep
pagination over the total (score desc, doc_id asc) order. Pages chained by
exact (score, doc_id) cursors must reconstruct the full ranking with no
gaps or repeats; driver and distributed paths must agree; MaxScore pruning
is disabled when a cursor is set so deep pages stay provably exact."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

Q = "stapipiter consta blecon"  # mid-frequency corpus terms, 100s of hits


@pytest.fixture(scope="module")
def seng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sa_idx"))
    docs = spark.createDataFrame(make_transcripts(n_turns=1500, seed=13))
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=16, n_shards=4, n_chunks=2))
    return SearchEngine(spark, d)


def _rows(df):
    return [(r["doc_id"], r["score"], r["n_match"]) for r in df.collect()]


def _hits(lst):
    return [(h["doc_id"], h["score"], h["n_match"]) for h in lst]


def test_pages_reconstruct_full_ranking(seng):
    """Chained 7-hit cursor pages == the one-shot full ranking, bit-exact,
    no gaps, no repeats, correct termination."""
    full = _rows(seng.search_df(Q, k=None))
    assert len(full) > 20
    paged, cursor = [], None
    for _ in range(len(full)):  # bounded loop; breaks on empty page
        page = _rows(seng.search_df(Q, k=7, after=cursor))
        if not page:
            break
        paged.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert paged == full


def test_driver_matches_distributed(seng):
    p1 = seng.search(Q, k=10)
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    assert _hits(seng.search(Q, k=10, after=cursor)) == \
        _rows(seng.search_df(Q, k=10, after=cursor))


def test_page2_equals_offset_slice(seng):
    full = _rows(seng.search_df(Q, k=None))
    cursor = (full[9][1], full[9][0])
    assert _rows(seng.search_df(Q, k=10, after=cursor)) == full[10:20]


def test_after_with_exclusion(seng):
    """Cursor paging composes with prohibit-term exclusion (the cogrouped
    distributed anti-set path)."""
    q = "stapipiter consta -blecon"
    full = _rows(seng.search_df(q, k=None))
    assert full
    cursor = (full[4][1], full[4][0])
    assert _rows(seng.search_df(q, k=5, after=cursor)) == full[5:10]


def test_search_mixed_cursor_roundtrip(seng):
    """search_mixed returns next_after; feeding it back serves exactly the
    following offset slice."""
    r1 = seng.search_mixed(Q, rank_from=0, rank_to=6, payload=False)
    assert r1["next_after"] == [r1["hits"][-1]["score"],
                                r1["hits"][-1]["doc_id"]]
    r2 = seng.search_mixed(Q, rank_from=0, rank_to=6, payload=False,
                           after=tuple(r1["next_after"]))
    off = seng.search_mixed(Q, rank_from=6, rank_to=12, payload=False)
    assert _hits(r2["hits"]) == _hits(off["hits"])


def test_search_mixed_rejects_non_flat(seng):
    with pytest.raises(ValueError):
        seng.search_mixed("stapipiter AND consta", after=(1.0, 0))
    with pytest.raises(ValueError):
        seng.search_mixed('"stapipiter consta"', after=(1.0, 0))
