"""rank_eval (ES _rank_eval analog): hand-computed metric goldens on a
tiny run, perfect-ranking invariants (ndcg=rr=1), unjudged-query /
no-relevant edge cases, tie-order invariance of nDCG, and the summary
fold. Pure-frame tests — the op evaluates any ranked source; the engine
integration is covered by the rank_eval driver gate."""

import math

import pytest

from polaris_spark.query.rankeval import rank_eval, rank_eval_summary


def _res(spark, rows):
    return spark.createDataFrame(rows, "query string, doc_id long, score double")


def _jud(spark, rows):
    return spark.createDataFrame(rows, "query string, doc_id long, grade int")


def _by_q(df):
    return {r["query"]: r.asDict() for r in df.collect()}


def test_hand_golden_metrics(spark):
    """Run q1: ranked docs [1,2,3] (by score), judgments 1->2, 3->1, 9->1
    (doc 9 not retrieved). k=3, threshold 1.

    precision = 2/3; recall = 2/3 (three relevant total);
    rr = 1 (first hit relevant);
    dcg  = (2^2-1)/log2(2) + 0 + (2^1-1)/log2(4) = 3 + 0.5 = 3.5
    idcg = 3/log2(2) + 1/log2(3) + 1/log2(4) = 3 + 1/log2(3) + 0.5
    """
    res = _res(spark, [("q1", 1, 9.0), ("q1", 2, 8.0), ("q1", 3, 7.0)])
    jud = _jud(spark, [("q1", 1, 2), ("q1", 3, 1), ("q1", 9, 1)])
    m = _by_q(rank_eval(res, jud, k=3))["q1"]
    assert m["n_ret"] == 3 and m["n_rel"] == 3
    assert m["precision_k"] == pytest.approx(2 / 3)
    assert m["recall_k"] == pytest.approx(2 / 3)
    assert m["rr"] == pytest.approx(1.0)
    idcg = 3.0 + 1.0 / math.log2(3.0) + 0.5
    assert m["ndcg_k"] == pytest.approx(3.5 / idcg)


def test_rank_cut_and_tie_order(spark):
    """k cuts the run by (score desc, doc_id asc): with equal scores the
    lower doc_id ranks first — doc 5 (relevant) at rank 3 is cut at k=2,
    so rr comes from nothing and metrics go to zero."""
    res = _res(spark, [("q", 5, 1.0), ("q", 4, 1.0), ("q", 3, 1.0)])
    jud = _jud(spark, [("q", 5, 1)])
    m2 = _by_q(rank_eval(res, jud, k=2))["q"]
    assert m2["n_ret"] == 2 and m2["rr"] == 0.0 and m2["ndcg_k"] == 0.0
    m3 = _by_q(rank_eval(res, jud, k=3))["q"]  # doc 5 is rank 3 (id desc last)
    assert m3["rr"] == pytest.approx(1 / 3)


def test_perfect_ranking_is_one(spark):
    """Retrieving exactly the judged docs in grade order gives
    precision = recall = rr = ndcg = 1."""
    res = _res(spark, [("q", 1, 3.0), ("q", 2, 2.0), ("q", 3, 1.0)])
    jud = _jud(spark, [("q", 1, 3), ("q", 2, 2), ("q", 3, 1)])
    m = _by_q(rank_eval(res, jud, k=3))["q"]
    for f in ("precision_k", "recall_k", "rr", "ndcg_k"):
        assert m[f] == pytest.approx(1.0), f


def test_unjudged_query_and_no_relevant(spark):
    """A query with no judgments (or none >= threshold) evaluates to all
    zeros — never NULL/NaN; judgments-only queries are not emitted."""
    res = _res(spark, [("q_run", 1, 2.0), ("q_run", 2, 1.0)])
    jud = _jud(spark, [("q_other", 1, 2)])
    out = _by_q(rank_eval(res, jud, k=5))
    assert set(out) == {"q_run"}
    m = out["q_run"]
    assert (m["precision_k"], m["recall_k"], m["rr"], m["ndcg_k"]) == \
        (0.0, 0.0, 0.0, 0.0)
    assert m["n_rel"] == 0


def test_grade_zero_judgment_is_irrelevant(spark):
    """Explicit grade-0 judgments count as judged-irrelevant: no gain, no
    relevance, and they don't inflate n_rel."""
    res = _res(spark, [("q", 1, 2.0), ("q", 2, 1.0)])
    jud = _jud(spark, [("q", 1, 0), ("q", 2, 1)])
    m = _by_q(rank_eval(res, jud, k=2))["q"]
    assert m["n_rel"] == 1 and m["rr"] == pytest.approx(0.5)
    # dcg = 1/log2(3); idcg = 1/log2(2) = 1
    assert m["ndcg_k"] == pytest.approx((1.0 / math.log2(3.0)) / 1.0)


def test_ndcg_tie_grade_order_invariant(spark):
    """Equal grades at swapped ideal positions leave idcg (hence ndcg)
    unchanged — the ideal sort's doc_id tiebreak is value-neutral."""
    res = _res(spark, [("q", 1, 2.0), ("q", 2, 1.0)])
    j1 = _jud(spark, [("q", 1, 1), ("q", 2, 1)])
    j2 = _jud(spark, [("q", 2, 1), ("q", 1, 1)])
    n1 = _by_q(rank_eval(res, j1, k=2))["q"]["ndcg_k"]
    n2 = _by_q(rank_eval(res, j2, k=2))["q"]["ndcg_k"]
    assert n1 == pytest.approx(n2) == pytest.approx(1.0)


def test_summary_means(spark):
    res = _res(spark, [("a", 1, 2.0), ("a", 2, 1.0), ("b", 7, 1.0)])
    jud = _jud(spark, [("a", 1, 1), ("b", 8, 1)])
    s = rank_eval_summary(rank_eval(res, jud, k=2)).collect()[0].asDict()
    assert s["n_queries"] == 2
    assert s["mrr"] == pytest.approx(0.5)          # (1 + 0) / 2
    assert s["precision_k"] == pytest.approx(0.25)  # (1/2 + 0) / 2
    assert s["recall_k"] == pytest.approx(0.5)      # (1 + 0) / 2


def test_rank_eval_endpoint(spark, tmp_path):
    """/api/rankEval serves the library metrics: an engine run over a
    built index, inline judgments, per-query rows + mean summary; an
    empty requests list 400s."""
    import json
    import urllib.error
    import urllib.request

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.query.engine import SearchEngine
    from polaris_spark.server import serve
    from polaris_spark.synth import make_transcripts

    d = str(tmp_path / "re_idx")
    pdf = make_transcripts(n_turns=300, seed=11)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1))
    eng = SearchEngine(spark, d)
    q = pdf["text"].iloc[0].split()[0]
    top = eng.search(q, k=3)
    assert top, "fixture term must match at least one doc"
    judg = [[top[0]["doc_id"], 2], [999999999, 1]]
    if len(top) > 1:  # one judged-but-unretrieved + one lower-graded hit
        judg.append([top[-1]["doc_id"], 1])
    n_judged = len(judg)

    srv, _t = serve(spark, d, port=0)
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{base}/api/rankEval",
            data=json.dumps({"requests": [{"query": q, "judgments": judg}],
                             "k": 5}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            got = json.loads(r.read())
        run = eng.search_many_df([q], k=None).select(
            "query", "doc_id", "score")
        jud = spark.createDataFrame(
            [(q, int(d_), int(g)) for d_, g in judg],
            "query string, doc_id long, grade int")
        want = rank_eval(run, jud, k=5).collect()[0].asDict()
        gq = got["queries"][0]
        for m in ("precision_k", "recall_k", "rr", "ndcg_k"):
            assert gq[m] == pytest.approx(want[m]), m
            assert got["summary"][m] == pytest.approx(want[m]), m
        assert gq["n_rel"] == n_judged  # unretrieved judged docs count
        assert got["summary"]["n_queries"] == 1

        # a zero-hit query must surface as explicit zeros and DRAG the
        # summary down, not silently vanish from the mean
        req2 = urllib.request.Request(
            f"{base}/api/rankEval",
            data=json.dumps({"requests": [
                {"query": q, "judgments": judg},
                {"query": "zzzznotaterm", "judgments": [[1, 1]]},
            ], "k": 5}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req2, timeout=120) as r:
            got2 = json.loads(r.read())
        assert got2["summary"]["n_queries"] == 2
        zero = next(r for r in got2["queries"]
                    if r["query"] == "zzzznotaterm")
        assert zero["n_ret"] == 0 and zero["n_rel"] == 1
        assert zero["ndcg_k"] == 0.0
        assert got2["summary"]["ndcg_k"] == \
            pytest.approx(got["summary"]["ndcg_k"] / 2)

        bad = urllib.request.Request(
            f"{base}/api/rankEval",
            data=json.dumps({"requests": []}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        srv.shutdown()


def test_k_must_be_positive(spark):
    res = _res(spark, [("q", 1, 1.0)])
    jud = _jud(spark, [("q", 1, 1)])
    with pytest.raises(ValueError, match="positive"):
        rank_eval(res, jud, k=0)
    with pytest.raises(ValueError, match="positive"):
        rank_eval(res, jud, k=None)


def test_pad_and_summary_helpers():
    """pad_zero_queries + mean_summary (shared by daemon + CLI): zero
    rows replay the max-grade collapse for n_rel, means never go NULL on
    empty input, and padded zeros drag the mean down."""
    from polaris_spark.query.rankeval import mean_summary, pad_zero_queries

    per = [{"query": "a", "n_ret": 5, "n_rel": 2, "precision_k": 0.4,
            "recall_k": 1.0, "rr": 1.0, "ndcg_k": 0.8}]
    jrows = [("a", 1, 2), ("b", 7, 1), ("b", 7, 2), ("b", 9, 0)]
    out = pad_zero_queries(per, ["a", "b"], jrows)
    assert len(out) == 2 and len(per) == 1  # input untouched
    zb = next(r for r in out if r["query"] == "b")
    assert zb["n_rel"] == 1 and zb["ndcg_k"] == 0.0  # max-collapse: doc 7
    s = mean_summary(out)
    assert s["n_queries"] == 2 and s["ndcg_k"] == pytest.approx(0.4)
    empty = mean_summary([])
    assert empty == {"precision_k": 0.0, "recall_k": 0.0, "rr": 0.0,
                     "ndcg_k": 0.0, "n_queries": 0}


def test_duplicate_judgments_collapse_to_max(spark):
    """Duplicate (query, doc_id) judgment rows must not multiply run rows
    through the join: they collapse to the max grade."""
    res = _res(spark, [("q", 5, 2.0), ("q", 6, 1.0)])
    jud = _jud(spark, [("q", 5, 1), ("q", 5, 2)])  # revised grade kept
    m = _by_q(rank_eval(res, jud, k=10))["q"]
    assert m["n_ret"] == 2          # not inflated to 3
    assert m["n_rel"] == 1          # one judged doc, not two
    assert m["precision_k"] == pytest.approx(0.5)
    # dcg = (2^2-1)/log2(2) = 3; idcg identical -> ndcg 1
    assert m["ndcg_k"] == pytest.approx(1.0)
