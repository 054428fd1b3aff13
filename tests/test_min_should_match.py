"""minimumNumberShouldMatch (Lucene BooleanQuery.setMinimumNumberShouldMatch
analog): OR-mode search keeping only docs that match >= m distinct query
terms. m=1/None must be plain OR bit-identical; m=n_terms must equal AND
mode; driver and distributed paths must agree; MaxScore pruning is disabled
for m>1 so results stay provably exact (verified against the unpruned
full-scoring reference)."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

Q3 = "kari sato elor"  # three corpus terms with overlapping doc sets


@pytest.fixture(scope="module")
def meng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("msm_idx"))
    docs = spark.createDataFrame(make_transcripts(n_turns=1500, seed=13))
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=16, n_shards=4, n_chunks=2))
    return SearchEngine(spark, d)


def _rows(df):
    return [(r["doc_id"], r["score"], r["n_match"]) for r in df.collect()]


def _hits(lst):
    return [(h["doc_id"], h["score"], h["n_match"]) for h in lst]


def test_msm1_is_plain_or(meng):
    base = _rows(meng.search_df(Q3, k=None))
    assert _rows(meng.search_df(Q3, k=None, min_match=1)) == base
    assert _rows(meng.search_df(Q3, k=None, min_match=None)) == base


def test_msm_n_terms_is_and_mode(meng):
    n = len(meng.query_terms(Q3))
    assert n == 3
    assert _rows(meng.search_df(Q3, k=None, min_match=n)) == \
        _rows(meng.search_df(Q3, k=None, mode="and"))


def test_msm_filter_and_nesting(meng):
    sets = {}
    for m in (1, 2, 3):
        rows = _rows(meng.search_df(Q3, k=None, min_match=m))
        assert all(nm >= m for _d, _s, nm in rows), m
        sets[m] = {d for d, _s, _nm in rows}
    assert sets[3] <= sets[2] <= sets[1]
    assert sets[2] < sets[1]  # fixture corpus has single-term-only docs


def test_driver_matches_distributed(meng):
    for m in (2, 3):
        drv = _hits(meng.search(Q3, k=None, min_match=m))
        dist = _rows(meng.search_df(Q3, k=None, min_match=m))
        assert drv == dist, m


def test_topk_exact_no_pruning_gap(meng):
    """Top-10 with min_match=2 must equal the filtered-then-truncated
    unpruned full ranking — the case MaxScore pruning would get wrong if
    it stayed enabled (a pruned doc can rank top-k post-filter)."""
    full = _rows(meng.search_df(Q3, k=None, min_match=2))
    top = _rows(meng.search_df(Q3, k=10, min_match=2))
    assert top == full[:10]


def test_search_mixed_threads_min_match(meng):
    res = meng.search_mixed(Q3, rank_to=10, payload=False, min_match=2)
    assert _hits(res["hits"]) == _rows(meng.search_df(Q3, k=10, min_match=2))
