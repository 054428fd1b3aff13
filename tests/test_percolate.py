"""Percolator (Lucene Monitor / ES percolate analog): a doc matches a
registered query iff the SEARCH ENGINE would return it for that query —
verified by equivalence against the engine over the full classic surface,
plus routing correctness, registration-time validation, and the streaming
alerting loop."""

import os

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.ops.percolate import (compile_queries, match_doc,
                                         percolate, stream_percolate)
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "error parsing the file", "assistant", "read_file"),
    (2, "searching the web for error", "assistant", "web.search"),
    (3, "another web result", "tool", "web.search"),
    (4, "plain chat turn", "user", ""),
    (5, "parse error in web page", "user", "read_file"),
    (6, "the camelCaseToken appears here", "assistant", ""),
]
FIELDS = ("role", "tool")

QUERIES = {
    "q_or": "error web",
    "q_and": "error AND web",
    "q_not": "error -file",
    "q_tree": "web AND (error OR result) -chat",
    "q_msm": "(error web parse)~2",
    "q_prefix": "pars*",
    "q_wild": "p?rse",
    "q_fuzzy": "erro~1",
    "q_range": "[parse TO parsing]",
    "q_regexp": "/w.b/",
    "q_phrase": '"web for error"',
    "q_slop": '"error web"~3',
    "q_field": "role:user",
    "q_fgroup": "tool:(read_file OR web*)",
    "q_ffuzzy": "role:usr~1",
    "q_fphrase": 'tool:"web search"',
    "q_sub": "camel",  # sub-token of camelCaseToken
    "q_fstar": "role:*",  # known-field match-all prefix
    "q_alt_re": "/err|w.b/",  # alternation: engine rlike anchors per-branch
    "q_urange": "xx:[parse TO parsing]",  # unknown field → no postings
    "q_uregexp": "xx:/w.b/",  # unknown field → empty expansion
    "q_ufuzzy": "xx:erro~1",  # unknown field → bare-body fallback
}


@pytest.fixture(scope="module")
def peng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("perc_idx"))
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, role string, tool string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                positions=True, field_cols=FIELDS))
    return SearchEngine(spark, d)


def _engine_ids(eng, q):
    from polaris_spark.query.boolquery import has_operators
    from polaris_spark.query.engine import parse_phrase_query

    pq = parse_phrase_query(q)
    if pq is not None:
        return {h["doc_id"] for h in eng.search_phrase(pq[0], k=None,
                                                       slop=pq[1])}
    if has_operators(q):
        return {h["doc_id"] for h in eng.search_bool(q, k=None)}
    return {h["doc_id"] for h in eng.search(q, k=None)}


def test_percolate_equals_engine_per_query(spark, peng):
    """THE invariant: percolation of the fixture == the engine's match set
    for every registered query, across every leaf kind."""
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, role string, tool string")
    got = {}
    for r in percolate(docs, QUERIES, field_cols=FIELDS).collect():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, q in QUERIES.items():
        assert got.get(qid, set()) == _engine_ids(peng, q), (qid, q)


def test_routing_prefilter_is_lossless():
    """Token routing may only SKIP provably-unmatchable queries: for every
    doc, routed evaluation == brute-force evaluation of every query."""
    compiled = compile_queries(QUERIES)
    from polaris_spark.ops.percolate import _doc_ctx, _match_tree

    for _id, text, role, tool in DOCS:
        routed = match_doc(compiled, text, {"role": role, "tool": tool},
                           FIELDS)
        ctx = _doc_ctx(text, {"role": role, "tool": tool})
        brute = sorted(cq.qid for cq in compiled
                       if _match_tree(cq.root, ctx, FIELDS))
        assert routed == brute, text
    # term-only queries carry routing tokens; expansion queries are
    # always-evaluate
    by_id = {c.qid: c for c in compiled}
    assert by_id["q_or"].route_tokens and not by_id["q_or"].always
    assert by_id["q_prefix"].always and not by_id["q_prefix"].route_tokens


def test_registration_validation():
    with pytest.raises(ValueError):
        compile_queries({"bad": "*lead"})
    with pytest.raises(ValueError, match="empty"):
        compile_queries({"bad": "   "})
    with pytest.raises(ValueError):
        compile_queries({"bad": "a AND (b"})


def test_stream_percolate_alerts(spark, tmp_path):
    """Streaming alerting loop: landed docs produce exactly the batch
    percolation's (doc, query) alert rows; a re-run with the same
    checkpoint adds nothing (exactly-once)."""
    land = str(tmp_path / "landing")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)
    docs = spark.createDataFrame(
        [("c1", 0, "assistant", "error parsing the file", "t", None),
         ("c1", 1, "user", "plain chat", "", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    docs.coalesce(1).write.mode("overwrite").parquet(land)
    sch = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")
    reg = {"alert_err": "error", "alert_chat": "chat AND plain"}
    q = stream_percolate(spark, land, reg, out, ckpt, schema=sch)
    q.awaitTermination(120)
    rows = {(r["conv_id"], r["turn_idx"], r["query_id"])
            for r in spark.read.parquet(out).collect()}
    assert rows == {("c1", 0, "alert_err"), ("c1", 1, "alert_chat")}
    q2 = stream_percolate(spark, land, reg, out, ckpt, schema=sch)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2
