"""Field-collapsed search (Lucene grouping TopGroups / ES collapse analog),
parent-scoped search (ToParentBlockJoinQuery analog), and two-pass query
rescoring (QueryRescorer / ES rescore analog): group/parent/window ranking
semantics vs pure-Python references built from the flat match set,
full-parser routing through match_df, score-mode folds, and plan shape."""

import pytest
from pyspark.sql import functions as F

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "spark join merge", "s2"),
    (2, "spark join scan", "s1"),
    (3, "spark merge", "s3"),
    (4, "join merge scan", "s1"),
    (5, "spark sort", "s2"),
    (6, "merge sort scan", "s3"),
    (7, "spark join sort scan", "s1"),
    (8, "totally unrelated words", "s2"),
    (9, "spark spark join join merge", "s2"),
]
SRC = {d: s for d, _t, s in DOCS}
Q = "spark join"


@pytest.fixture(scope="module")
def ceng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("collapse_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("source",), positions=True))
    return SearchEngine(spark, d)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _flat(ceng, query=Q):
    """(doc_id, source, score, n_match) reference rows from the flat path."""
    return [(r["doc_id"], SRC[r["doc_id"]], r["score"], r["n_match"])
            for r in ceng.search_df(query, k=None).collect()]


def _ref_collapse(flat, k, per_group):
    """Pure-Python collapse: ≤per_group hits per source by (score desc,
    doc_id asc); groups ranked by their head under the same order."""
    groups = {}
    for d, s, sc, nm in sorted(flat, key=lambda t: (-t[2], t[0])):
        groups.setdefault(s, []).append((d, sc, nm))
    heads = sorted(groups.items(), key=lambda kv: (-kv[1][0][1], kv[1][0][0]))
    out = []
    for grank, (s, members) in enumerate(heads[:k], start=1):
        for hrank, (d, sc, nm) in enumerate(members[:per_group], start=1):
            out.append((grank, s, hrank, d, sc, nm))
    return out


def test_collapse_matches_reference(ceng):
    flat = _flat(ceng)
    got = _rows(ceng.search_collapse(Q, "source", k=10, per_group=2))
    assert got == _ref_collapse(flat, 10, 2)
    # per_group=1: one hit per group — the dedup-by-key search shape
    got1 = _rows(ceng.search_collapse(Q, "source", k=10, per_group=1))
    assert got1 == _ref_collapse(flat, 10, 1)
    assert len({r[1] for r in got1}) == len(got1)
    # k cuts GROUPS, not hits: k=2 keeps the two best groups whole
    got2 = _rows(ceng.search_collapse(Q, "source", k=2, per_group=2))
    assert got2 == [r for r in _ref_collapse(flat, 10, 2) if r[0] <= 2]


def test_collapse_routes_full_parser(ceng):
    """A boolean tree collapses too (match_df routing): member ids equal
    the tree match set restricted to the winning groups."""
    q = "spark AND (join OR merge) -scan"
    flat = [(r["doc_id"], SRC[r["doc_id"]], r["score"], r["n_match"])
            for r in ceng.search_bool_df(q, k=None).collect()]
    got = _rows(ceng.search_collapse(q, "source", k=10, per_group=3))
    assert got == _ref_collapse(flat, 10, 3)


def test_parent_score_modes(ceng):
    flat = _flat(ceng)
    by_src = {}
    for d, s, sc, _nm in flat:
        by_src.setdefault(s, []).append((d, sc))
    for mode, fold in [("max", max), ("total", sum),
                       ("avg", lambda v: sum(v) / len(v))]:
        want = []
        for s, ch in by_src.items():
            best = min(ch, key=lambda t: (-t[1], t[0]))[0]
            want.append((s, fold([sc for _d, sc in ch]), len(ch), best))
        want.sort(key=lambda t: (-t[1], t[0]))
        got = _rows(ceng.search_parent(Q, "source", k=10, score_mode=mode))
        assert [(g[0], g[2], g[3]) for g in got] == \
            [(w[0], w[2], w[3]) for w in want], mode
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-12), mode
    # none: matched parents with score 0.0, key-ordered
    got0 = _rows(ceng.search_parent(Q, "source", k=10, score_mode="none"))
    assert [g[0] for g in got0] == sorted(by_src)
    assert all(g[1] == 0.0 for g in got0)


def test_parent_k_cut_and_validation(ceng):
    full = _rows(ceng.search_parent(Q, "source", k=10))
    assert _rows(ceng.search_parent(Q, "source", k=2)) == full[:2]
    with pytest.raises(ValueError):
        ceng.search_parent(Q, "no_such_attr")
    with pytest.raises(ValueError):
        ceng.search_parent(Q, "source", score_mode="bogus")
    with pytest.raises(ValueError):
        ceng.search_collapse(Q, "doc_id")


def _ref_rescore(ceng, q, rq_scores, k, window, qw, rw):
    """Pure-Python two-pass reference: exact top-window of the flat
    query, combined = qw·first + rw·second (0 outside the rescore match
    set), re-sorted (combined desc, doc_id asc), top-k."""
    first = sorted(((r["doc_id"], r["score"], r["n_match"]) for r in
                    ceng.search_df(q, k=None).collect()),
                   key=lambda t: (-t[1], t[0]))[:window]
    out = [(d, qw * fs + rw * rq_scores.get(d, 0.0), fs,
            rq_scores.get(d, 0.0), nm) for d, fs, nm in first]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_rescore_matches_reference(ceng):
    """QueryRescorer semantics: window cut on the FIRST ranking, left-join
    second scores (absent → 0), weighted re-sort. The rescore query is a
    sloppy phrase — the canonical proximity-rerank use."""
    rq = '"spark join"~1'
    rq_scores = {r["doc_id"]: r["score"]
                 for r in ceng.search_phrase_df("spark join", k=None,
                                                slop=1).collect()}
    for window, k, qw, rw in [(3, 10, 1.0, 2.0), (50, 4, 0.5, 3.0),
                              (2, 2, 1.0, 1.0)]:
        got = _rows(ceng.rescore(Q, rq, k=k, window=window,
                                 query_weight=qw, rescore_weight=rw))
        want = _ref_rescore(ceng, Q, rq_scores, k, window, qw, rw)
        assert [(g[0], g[2], g[3], g[4]) for g in got] == \
            [(w[0], w[2], w[3], w[4]) for w in want], (window, k)
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-12)
    # a doc in the window that misses the rescore query keeps qw·first
    got = {r[0]: r for r in _rows(ceng.rescore(Q, rq, k=10, window=50))}
    misses = [d for d in got if d not in rq_scores]
    assert misses and all(got[d][1] == got[d][2] and got[d][3] == 0.0
                          for d in misses)


def test_parent_plan_is_partial_agg_take_ordered(ceng):
    """The parent fold is ONE hash aggregate with a map-side partial and a
    TakeOrderedAndProject cut — no window, no global sort."""
    plan = ceng.search_parent(Q, "source", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
