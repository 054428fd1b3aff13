"""Search aggregations (Lucene facets module / ES ``aggs`` analog):
stats / terms / histogram / range / date_histogram / cardinality /
percentiles over a query's FULL match set, checked against a pandas
reference on a hand-built corpus; approximate (sketch) forms vs exact;
attribute resolution (stored doc_map attr vs caller docs frame vs
missing); calendar date_histogram vs DuckDB date_trunc."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query import aggs
from polaris_spark.query.engine import SearchEngine

DOCS = [
    # (doc_id, text, source, n_chars)
    (1, "spark join merge", "s2", 17),
    (2, "spark join scan", "s1", 15),
    (3, "spark merge", "s3", 11),
    (4, "join merge scan", "s1", 15),
    (5, "spark sort", "s2", 10),
    (6, "merge sort scan", "s3", 15),
    (7, "spark join sort scan", "s1", 20),
    (8, "totally unrelated words", "s2", 23),
    (9, "spark spark join join merge", "s2", 27),
]
Q = "spark join"
MATCH = [1, 2, 3, 4, 5, 7, 9]  # docs containing spark or join
TS_BASE, TS_STEP = 1_700_000_000, 3_517


def _pdf():
    return pd.DataFrame(DOCS, columns=["doc_id", "text", "source", "n_chars"])


@pytest.fixture(scope="module")
def seng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aggs_idx"))
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, source string, n_chars long")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("source",), positions=True))
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def ndocs(spark):
    return spark.createDataFrame(
        [(d, n) for d, _t, _s, n in DOCS], "doc_id long, n_chars long")


def test_stats(seng, ndocs):
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    row = aggs.stats_agg(seng, Q, "n_chars", docs=ndocs).collect()[0]
    assert row["n"] == len(MATCH)
    assert row["min_v"] == float(m.n_chars.min())
    assert row["max_v"] == float(m.n_chars.max())
    assert row["sum_v"] == float(m.n_chars.sum())
    assert row["avg_v"] == pytest.approx(m.n_chars.sum() / len(MATCH))


def test_terms_with_metric_and_order(seng, ndocs):
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    want = (m.groupby("source")
             .agg(n=("doc_id", "size"), min_v=("n_chars", "min"),
                  max_v=("n_chars", "max"), sum_v=("n_chars", "sum"))
             .reset_index()
             .sort_values(["n", "source"], ascending=[False, True]))
    got = aggs.terms_agg(seng, Q, "source", metric_attr="n_chars",
                         docs=ndocs).collect()
    assert [(r["key"], r["n"]) for r in got] == \
        list(zip(want.source, want.n))
    for r, (_, w) in zip(got, want.iterrows()):
        assert (r["min_v"], r["max_v"], r["sum_v"]) == \
            (float(w.min_v), float(w.max_v), float(w.sum_v))
        assert r["avg_v"] == pytest.approx(w.sum_v / w.n)
    # size cut keeps the (n desc, key asc) head
    top1 = aggs.terms_agg(seng, Q, "source", size=1).collect()
    assert [(r["key"], r["n"]) for r in top1] == \
        [(want.source.iloc[0], want.n.iloc[0])]


def test_histogram_and_min_doc_count(seng, ndocs):
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    want = ((m.n_chars // 10) * 10).value_counts().sort_index()
    got = aggs.histogram_agg(seng, Q, "n_chars", interval=10.0,
                             docs=ndocs).collect()
    assert [(r["bucket"], r["n"]) for r in got] == \
        [(float(k), int(v)) for k, v in want.items()]
    got2 = aggs.histogram_agg(seng, Q, "n_chars", interval=10.0, docs=ndocs,
                              min_doc_count=2).collect()
    assert [(r["bucket"], r["n"]) for r in got2] == \
        [(float(k), int(v)) for k, v in want.items() if v >= 2]


def test_range_buckets(seng, ndocs):
    # edges [12, 16): buckets (-inf,12) [12,16) [16,inf)
    got = aggs.range_agg(seng, Q, "n_chars", edges=[12.0, 16.0],
                         docs=ndocs).collect()
    m = _pdf()[_pdf().doc_id.isin(MATCH)].n_chars
    want = [(0, None, 12.0, int((m < 12).sum())),
            (1, 12.0, 16.0, int(((m >= 12) & (m < 16)).sum())),
            (2, 16.0, None, int((m >= 16).sum()))]
    assert [(r["bucket_idx"], r["lo"], r["hi"], r["n"]) for r in got] == want


def test_date_histogram_fixed_and_calendar(spark, seng):
    ts = spark.createDataFrame(
        [(d, TS_BASE + d * TS_STEP) for d, *_ in DOCS],
        "doc_id long, epoch long"
    ).select("doc_id", F.timestamp_seconds("epoch").alias("ts"))
    got = aggs.date_histogram_agg(seng, Q, "ts", interval="6h",
                                  docs=ts).collect()
    w = 6 * 3600
    want = pd.Series([(TS_BASE + d * TS_STEP) // w * w
                      for d in MATCH]).value_counts().sort_index()
    assert [(r["bucket_epoch"], r["n"]) for r in got] == \
        [(int(k), int(v)) for k, v in want.items()]
    # calendar interval vs DuckDB date_trunc on the same epochs
    got_m = aggs.date_histogram_agg(seng, Q, "ts", interval="month",
                                    docs=ts).collect()
    con = duckdb.connect()
    want_m = con.execute(
        "SELECT date_trunc('month', to_timestamp(e)) AS b, count(*) AS n "
        "FROM (SELECT unnest(?::BIGINT[]) AS e) GROUP BY 1 ORDER BY 1",
        [[TS_BASE + d * TS_STEP for d in MATCH]],
    ).fetchall()
    assert [(r["bucket"], r["n"]) for r in got_m] == \
        [(b.replace(tzinfo=None), n) for b, n in want_m]
    with pytest.raises(ValueError):
        aggs.date_histogram_agg(seng, Q, "ts", interval="fortnight",
                                docs=ts)


def test_cardinality_exact_and_approx(seng):
    n = aggs.cardinality_agg(seng, Q, "source").collect()[0]["n_distinct"]
    assert n == 3
    approx = aggs.cardinality_agg(seng, Q, "source",
                                  exact=False).collect()[0]["n_distinct"]
    assert approx == 3  # HLL is exact at tiny cardinality
    # doc_id cardinality == match count without any join
    nd = aggs.cardinality_agg(seng, Q, "doc_id").collect()[0]["n_distinct"]
    assert nd == len(MATCH)


def test_percentiles_exact_matches_quantile_cont(seng, ndocs):
    qs = (0.25, 0.5, 0.75, 0.95)
    got = aggs.percentiles_agg(seng, Q, "n_chars", qs=qs,
                               docs=ndocs).collect()
    vals = sorted(_pdf()[_pdf().doc_id.isin(MATCH)].n_chars)
    con = duckdb.connect()
    want = con.execute(
        "SELECT unnest(quantile_cont(v::DOUBLE, ?::DOUBLE[])) "
        "FROM (SELECT unnest(?::BIGINT[]) AS v)", [list(qs), vals]
    ).fetchall()
    assert [r["q"] for r in got] == list(qs)
    for r, (w,) in zip(got, want):
        assert r["value"] == pytest.approx(w, abs=1e-9)
    # sketch form stays within coarse tolerance of exact
    apx = aggs.percentiles_agg(seng, Q, "n_chars", qs=qs, exact=False,
                               docs=ndocs).collect()
    for r, (w,) in zip(apx, want):
        assert abs(r["value"] - w) <= max(2.0, 0.2 * w)


def test_attr_resolution_and_errors(seng, ndocs):
    # stored doc_map attribute needs no docs frame
    assert aggs.cardinality_agg(seng, Q, "source").collect()[0][0] == 3
    with pytest.raises(ValueError, match="neither stored"):
        aggs.stats_agg(seng, Q, "nope").collect()
    with pytest.raises(ValueError, match="metric attribute"):
        aggs.terms_agg(seng, Q, "source", metric_attr="nope")
    with pytest.raises(ValueError, match="at least one edge"):
        aggs.range_agg(seng, Q, "n_chars", edges=[])


def test_full_parser_routing(seng, ndocs):
    """aggs run over match_df's routed surface: a boolean tree query and a
    quoted phrase aggregate over exactly their own match sets."""
    tree = aggs.cardinality_agg(seng, "spark AND (join OR merge) -scan",
                                "doc_id").collect()[0][0]
    want_tree = {d for d, t, _s, _n in DOCS
                 if "spark" in t and ("join" in t or "merge" in t)
                 and "scan" not in t}
    assert tree == len(want_tree)
    ph = aggs.cardinality_agg(seng, '"spark join"', "doc_id").collect()[0][0]
    want_ph = {d for d, t, _s, _n in DOCS if "spark join" in t}
    assert ph == len(want_ph)


def test_partial_aggregation_plan(seng, ndocs):
    """The groupBy folds map-side: the plan carries a partial_count before
    the exchange (HashAggregate partial → Exchange → HashAggregate final)."""
    plan = aggs.terms_agg(seng, Q, "source")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_count" in plan


def test_composite_pagination_walk(seng):
    """Walking size-2 pages with the after cursor reproduces the full
    (source, lang-less) bucket enumeration exactly — no skips, no dups."""
    full = aggs.composite_agg(seng, Q, ["source"], size=None).collect()
    want = [(r["source"], r["n"]) for r in full]
    got, after = [], None
    while True:
        page = aggs.composite_agg(seng, Q, ["source"], size=2,
                                  after=after).collect()
        if not page:
            break
        got += [(r["source"], r["n"]) for r in page]
        after = (page[-1]["source"],)
    assert got == want
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    assert dict(got) == m.groupby("source").size().to_dict()


def test_composite_multi_key_and_errors(seng, ndocs):
    """Two-source keys (one stored, one from a docs frame) order
    lexicographically and the cursor is exclusive on the full tuple."""
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    want = sorted((s, n, c) for (s, n), c in
                  m.groupby(["source", "n_chars"]).size().items())
    got = aggs.composite_agg(seng, Q, ["source", "n_chars"], size=None,
                             docs=ndocs).collect()
    assert [(r["source"], r["n_chars"], r["n"]) for r in got] == want
    cut = aggs.composite_agg(seng, Q, ["source", "n_chars"], size=None,
                             after=want[1][:2], docs=ndocs).collect()
    assert [(r["source"], r["n_chars"], r["n"]) for r in cut] == want[2:]
    with pytest.raises(ValueError, match="at least one source"):
        aggs.composite_agg(seng, Q, [])
    with pytest.raises(ValueError, match="after cursor"):
        aggs.composite_agg(seng, Q, ["source"], after=("a", "b"))
    with pytest.raises(ValueError, match="not available"):
        aggs.composite_agg(seng, Q, ["source", "nope"])


def test_composite_keyset_pushed_below_aggregate(seng):
    """The after predicate references only grouping columns, so Catalyst
    pushes it below the HashAggregate: the filter must NOT sit above any
    partial_count in the executed plan."""
    plan = aggs.composite_agg(seng, Q, ["source"], size=2,
                              after=("s1",))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_count" in plan
    first_agg = plan.index("partial_count")
    assert "s1" in plan[first_agg:]  # the cursor filter is below the agg


def test_filters_agg_semantics(seng):
    """Overlapping buckets count independently; a prohibit sub-query and
    an empty bucket both behave; order is name asc."""
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    got = aggs.filters_agg(seng, Q, {
        "a_scan": "scan",
        "b_no_merge": "spark -merge",
        "c_empty": "zzznope",
    }).collect()
    want_scan = int(m.text.str.contains("scan").sum())
    want_nm = int((m.text.str.contains("spark")
                   & ~m.text.str.contains("merge")).sum())
    assert [(r["name"], r["n"]) for r in got] == [
        ("a_scan", want_scan), ("b_no_merge", want_nm), ("c_empty", 0)]
    with pytest.raises(ValueError, match="at least one named filter"):
        aggs.filters_agg(seng, Q, {})


def test_top_hits_per_bucket(seng):
    """top_hits: per source bucket, the top-size hits in the ENGINE's
    exact hit order — each bucket's rank sequence must equal the slice
    of the global (score desc, doc_id asc) hit list restricted to that
    bucket; output ordered (key asc, rank asc); ranks dense from 1."""
    by_src = dict(_pdf()[["doc_id", "source"]].values)
    full = [(r["doc_id"], r["score"])
            for r in seng.search_df(Q, k=None)
            .orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    want = {}
    for did, sc in full:  # global order sliced per bucket = bucket order
        want.setdefault(by_src[did], []).append((did, sc))
    got = aggs.top_hits_agg(seng, Q, "source", size=2).collect()
    assert got == sorted(got, key=lambda r: (r["key"], r["rank"]))
    for key in {r["key"] for r in got}:
        rows = [r for r in got if r["key"] == key]
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert [(r["doc_id"], r["score"]) for r in rows] == want[key][:2]
    # every matching bucket is present (none has zero matches here)
    assert {r["key"] for r in got} == set(want)
    with pytest.raises(ValueError, match="non-id attribute"):
        aggs.top_hits_agg(seng, Q, "doc_id")


def test_top_hits_in_run_aggs(seng):
    out = aggs.run_aggs(seng, Q, {
        "best": {"type": "top_hits", "attr": "source", "size": 1}})
    want = [r.asDict() for r in
            aggs.top_hits_agg(seng, Q, "source", size=1).collect()]
    assert out["best"] == want
    assert all(r["rank"] == 1 for r in out["best"])


def test_weighted_avg(seng, ndocs):
    """Σ(v·w)/Σw with n_chars weighted by doc_id (hand-checkable)."""
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    row = aggs.weighted_avg_agg(seng, Q, "n_chars", "doc_id",
                                docs=ndocs).collect()[0]
    vw = float((m.n_chars * m.doc_id).sum())
    w = float(m.doc_id.sum())
    assert row["n"] == len(MATCH)
    assert row["vw_sum"] == vw and row["w_sum"] == w
    assert row["wavg"] == pytest.approx(vw / w)


def test_matrix_stats_pairs(seng, ndocs):
    """Population moments of (doc_id, n_chars) over the match set equal
    the numpy replay; corr NULL when a variance is zero."""
    import numpy as np

    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    got = aggs.matrix_stats_agg(seng, Q, ["doc_id", "n_chars"],
                                docs=ndocs).collect()
    assert len(got) == 1
    r = got[0]
    x, y = m.doc_id.to_numpy(float), m.n_chars.to_numpy(float)
    assert (r["attr_x"], r["attr_y"], r["n"]) == ("doc_id", "n_chars",
                                                  len(MATCH))
    assert r["mean_x"] == pytest.approx(x.mean(), abs=1e-6)
    assert r["var_y"] == pytest.approx(y.var(), abs=1e-6)
    assert r["cov"] == pytest.approx(((x * y).mean() - x.mean() * y.mean()),
                                     abs=1e-6)
    assert r["corr"] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-6)
    with pytest.raises(ValueError, match="at least two"):
        aggs.matrix_stats_agg(seng, Q, ["n_chars"])


def test_adjacency_matrix(seng):
    """Singles + pairwise intersections within the main match context;
    empty buckets omitted; name guard against the separator."""
    m = _pdf()[_pdf().doc_id.isin(MATCH)]
    got = {r["key"]: r["n"] for r in aggs.adjacency_matrix_agg(
        seng, Q, {"s": "scan", "m": "merge", "z": "zzznope"}).collect()}
    n_s = int(m.text.str.contains("scan").sum())
    n_m = int(m.text.str.contains("merge").sum())
    n_sm = int((m.text.str.contains("scan")
                & m.text.str.contains("merge")).sum())
    want = {"s": n_s, "m": n_m}
    if n_sm:
        want["m&s"] = n_sm
    assert got == want  # no 'z', no empty pairs
    with pytest.raises(ValueError, match="separator"):
        aggs.adjacency_matrix_agg(seng, Q, {"a&b": "scan"})


def test_sampler_top_scoring(seng):
    """The sample is the global top-shard_size by exact hit order: with
    shard_size ≥ |match| it degenerates to plain terms counts; with a
    small shard_size only the best hits' buckets count."""
    full = {r["key"]: r["n"]
            for r in aggs.terms_agg(seng, Q, "source").collect()}
    all_rows = {r["key"]: r["n"] for r in aggs.sampler_agg(
        seng, Q, "source", shard_size=100).collect()}
    assert all_rows == full
    by_src = dict(_pdf()[["doc_id", "source"]].values)
    top3 = [r["doc_id"] for r in seng.search_df(Q, k=3).collect()]
    want3 = {}
    for d in top3:
        want3[by_src[d]] = want3.get(by_src[d], 0) + 1
    got3 = {r["key"]: r["n"] for r in aggs.sampler_agg(
        seng, Q, "source", shard_size=3).collect()}
    assert got3 == want3


def test_new_aggs_in_run_aggs(seng, ndocs):
    out = aggs.run_aggs(seng, Q, {
        "wa": {"type": "weighted_avg", "attr": "n_chars",
               "weight_attr": "doc_id"},
        "mx": {"type": "matrix_stats", "attrs": ["doc_id", "n_chars"]},
        "adj": {"type": "adjacency_matrix",
                "filters": {"s": "scan", "m": "merge"}},
        "smp": {"type": "sampler", "attr": "source", "shard_size": 3},
    }, docs=ndocs)
    assert set(out) == {"wa", "mx", "adj", "smp"}
    assert out["wa"][0]["n"] == len(MATCH)
    assert out["mx"][0]["attr_x"] == "doc_id"
    assert all(r["n"] > 0 for r in out["adj"])
    assert sum(r["n"] for r in out["smp"]) == 3


def test_pinned_search(seng):
    """ES pinned query: list-order promotion, nonexistent id dropped,
    organic tail excludes pinned, pinned docs keep their organic score
    (NULL when they don't match), rank dense from 1."""
    org = [(r["doc_id"], r["score"])
           for r in seng.search_df(Q, k=None)
           .orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    org_scores = dict(org)
    got = seng.search_pinned(Q, [6, 999, 2], k=6).collect()
    # doc 6 ("merge sort scan") doesn't match "spark join" -> NULL score;
    # doc 999 doesn't exist -> dropped; doc 2 matches -> organic score
    assert [(r["doc_id"], r["pinned"]) for r in got[:2]] == [(6, 1), (2, 1)]
    assert got[0]["score"] is None
    assert got[1]["score"] == org_scores[2]
    tail = [r["doc_id"] for r in got[2:]]
    assert tail == [d for d, _ in org if d not in (6, 2)][:4]
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    assert all(r["pinned"] == 0 for r in got[2:])
    with pytest.raises(ValueError, match="at least one pinned id"):
        seng.search_pinned(Q, [], k=5)


def test_run_aggs_multi_request(spark, seng, ndocs):
    """The multi-agg executor returns each agg's rows keyed by name,
    identical to the standalone calls, and releases every persisted
    match set afterwards (no cached-RDD growth — serving hygiene)."""
    spec = {
        "by_source": {"type": "terms", "attr": "source"},
        "n_match": {"type": "cardinality", "attr": "doc_id"},
        "pages": {"type": "composite", "sources": ["source"], "size": 2,
                  "after": ["s1"]},
        "flt": {"type": "filters",
                "filters": {"scan": "scan", "none": "zzznope"}},
    }
    out = aggs.run_aggs(seng, Q, spec, docs=ndocs)
    n1 = spark.sparkContext._jsc.getPersistentRDDs().size()
    aggs.run_aggs(seng, "merge sort", spec, docs=ndocs)
    aggs.run_aggs(seng, "scan", spec, docs=ndocs)
    # the memo released its persists; only the engine's SINGLE scoped
    # candidate frame remains, so repeated requests add nothing
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= n1
    assert set(out) == {"by_source", "n_match", "pages", "flt"}
    want_terms = [r.asDict() for r in
                  aggs.terms_agg(seng, Q, "source").collect()]
    assert out["by_source"] == want_terms
    assert out["n_match"] == [{"n_distinct": len(MATCH)}]
    assert [r["source"] for r in out["pages"]] == ["s2", "s3"]
    assert {r["name"]: r["n"] for r in out["flt"]}["none"] == 0
    with pytest.raises(ValueError, match="unknown type"):
        aggs.run_aggs(seng, Q, {"x": {"type": "nope"}})


def test_pipeline_agg_hand_golden(spark):
    """pipeline_agg on a hand series: derivative NULL for the first
    bucket (the ES convention), running sum, trailing-3 moving average
    including the current bucket."""
    b = spark.createDataFrame(
        [(0.0, 4), (100.0, 6), (200.0, 2), (300.0, 8)],
        "bucket double, n long")
    rows = aggs.pipeline_agg(b, moving_avg=3).collect()
    got = [(r["bucket"], r["derivative"], r["cumulative"],
            round(r["moving_avg_3"], 9)) for r in rows]
    assert got == [
        (0.0, None, 4.0, 4.0),
        (100.0, 2.0, 10.0, 5.0),
        (200.0, -4.0, 12.0, 4.0),
        (300.0, 6.0, 20.0, round(16 / 3, 9)),
    ]
    with pytest.raises(ValueError, match="positive"):
        aggs.pipeline_agg(b, moving_avg=0)


def test_pipeline_in_run_aggs(spark, seng, ndocs):
    """A histogram spec with a pipelines block returns the derived
    columns, equal to composing the ops by hand; date_histogram orders
    on bucket_epoch."""
    spec = {"h": {"type": "histogram", "attr": "n_chars",
                  "interval": 10.0,
                  "pipelines": {"movingAvg": 2}}}
    out = aggs.run_aggs(seng, Q, spec, docs=ndocs)["h"]
    want = [r.asDict() for r in aggs.pipeline_agg(
        aggs.histogram_agg(seng, Q, "n_chars", 10.0, docs=ndocs),
        moving_avg=2).collect()]
    assert out == want
    assert {"derivative", "cumulative", "moving_avg_2"} <= set(out[0])

    ts = spark.createDataFrame(
        [(d, TS_BASE + d * TS_STEP) for d, _t, _s, _n in DOCS],
        "doc_id long, epoch long").select(
        "doc_id", F.timestamp_seconds("epoch").alias("ts"))
    spec2 = {"dh": {"type": "date_histogram", "attr": "ts",
                    "interval": "6h", "pipelines": {}}}
    spec3 = {"dh": {"type": "date_histogram", "attr": "ts",
                    "interval": "6h",
                    "pipelines": {"derivative": True,
                                  "cumulative": False}}}
    plain = aggs.run_aggs(seng, Q, spec2, docs=ts)["dh"]
    withp = aggs.run_aggs(seng, Q, spec3, docs=ts)["dh"]
    assert "derivative" not in plain[0]  # empty pipelines block = parent only
    assert "derivative" in withp[0] and "cumulative" not in withp[0]
    assert [r["bucket_epoch"] for r in withp] == \
        sorted(r["bucket_epoch"] for r in withp)
