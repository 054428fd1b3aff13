"""End-to-end serving daemon test (VERDICT r1 #7): HTTP endpoints against a
built index must return exactly what the underlying engine returns."""

import json
import urllib.error
import urllib.request

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.server import serve
from polaris_spark.synth import make_transcripts


@pytest.fixture(scope="module")
def daemon(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("srv_idx"))
    pdf = make_transcripts(n_turns=400, seed=5)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("role", "tool"), store_text=True))
    srv, t = serve(spark, d, port=0, cache_terms=1024)
    host, port = srv.server_address
    yield f"http://{host}:{port}", d, pdf
    srv.shutdown()


def _post(base, method, body):
    req = urllib.request.Request(
        f"{base}/api/{method}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(daemon):
    base, _, _ = daemon
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_search_endpoint_matches_engine(spark, daemon):
    base, d, pdf = daemon
    q = pdf["text"].iloc[0].split()[0]  # a real corpus term
    got = _post(base, "search", {"query": q, "rankTo": 5})
    eng = SearchEngine(spark, d)
    want = eng.search(q, k=5)
    assert [(h["doc_id"], round(h["score"], 9)) for h in got["hits"]] == [
        (h["doc_id"], round(h["score"], 9)) for h in want
    ]
    assert got["count"] == len(want) and "latency_ms" in got
    # hits carry identity + snippet payload (reference Hit: jump target +
    # filename + summary, SourceDbImpl.java:147-157, SearchMixer.java:79-89)
    for h in got["hits"]:
        assert {"conv_id", "turn_idx", "role", "snippet"} <= set(h)
        assert "text" not in h  # full text stays behind /api/source
        assert eng.query_terms(q)[0] in h["snippet"]
    # payload:false returns the bare round-2 hit shape
    bare = _post(base, "search", {"query": q, "rankTo": 5, "payload": False})
    assert set(bare["hits"][0]) == {"doc_id", "score", "n_match"}


def test_search_min_should_match(spark, daemon):
    """minShouldMatch (BooleanQuery.setMinimumNumberShouldMatch): the
    served flat OR path filters to docs matching >= m distinct terms."""
    base, d, pdf = daemon
    toks = pdf["text"].iloc[0].split()
    q = f"{toks[0]} {toks[1]} {toks[2]}"
    eng = SearchEngine(spark, d)
    got = _post(base, "search",
                {"query": q, "rankTo": 8, "payload": False,
                 "minShouldMatch": 2})
    want = eng.search(q, k=8, min_match=2)
    assert [(h["doc_id"], round(h["score"], 9), h["n_match"])
            for h in got["hits"]] == \
        [(h["doc_id"], round(h["score"], 9), h["n_match"]) for h in want]
    assert all(h["n_match"] >= 2 for h in got["hits"])


def test_search_after_cursor(spark, daemon):
    """searchAfter (IndexSearcher.searchAfter): the served page is the next
    (rankTo - rankFrom) hits strictly after the cursor, and next_after
    chains to the following page."""
    base, d, pdf = daemon
    toks = pdf["text"].iloc[0].split()
    q = f"{toks[0]} {toks[1]}"
    eng = SearchEngine(spark, d)
    p1 = _post(base, "search", {"query": q, "rankTo": 5, "payload": False})
    assert p1["next_after"] == [p1["hits"][-1]["score"],
                                p1["hits"][-1]["doc_id"]]
    p2 = _post(base, "search",
               {"query": q, "rankTo": 5, "payload": False,
                "searchAfter": p1["next_after"]})
    want = eng.search(q, k=5, after=tuple(p1["next_after"]))
    assert [(h["doc_id"], round(h["score"], 9)) for h in p2["hits"]] == \
        [(h["doc_id"], round(h["score"], 9)) for h in want]
    # no overlap with page 1
    assert not ({h["doc_id"] for h in p1["hits"]}
                & {h["doc_id"] for h in p2["hits"]})


def test_count_endpoint(spark, daemon):
    """/api/count (TotalHitCountCollector analog) equals the engine's
    match-set size, flat and tree-routed."""
    base, d, pdf = daemon
    q = pdf["text"].iloc[0].split()[0]
    eng = SearchEngine(spark, d)
    got = _post(base, "count", {"query": q})
    assert got == {"query": q, "count": eng.search_count(q)}
    t2 = pdf["text"].iloc[1].split()[0]
    tree = f"{q} AND {t2}"
    assert _post(base, "count", {"query": tree})["count"] == \
        eng.search_count(tree)


def test_complete_and_usages_endpoints(spark, daemon):
    base, d, _ = daemon
    eng = SearchEngine(spark, d)
    comp = _post(base, "complete", {"query": "ka", "limit": 5})["completions"]
    want = [r.asDict() for r in eng.complete("ka", 5).collect()]
    assert comp == want
    if want:
        term = want[0]["term"]
        us = _post(base, "listUsages", {"term": term})["usages"]
        assert us == eng.lookup_postings(term)


def test_source_listfiles_getturn(spark, daemon):
    base, d, pdf = daemon
    eng = SearchEngine(spark, d)
    ids = [r["doc_id"] for r in eng.search(pdf["text"].iloc[0].split()[0], k=3)]
    src = _post(base, "source", {"docIds": ids})["docs"]
    assert [r["doc_id"] for r in src] == sorted(ids)

    conv = pdf["conv_id"].iloc[0]
    turns = _post(base, "listFiles", {"convId": conv})["turns"]
    assert [t["turn_idx"] for t in turns] == sorted(t["turn_idx"] for t in turns)
    assert len(turns) == int((pdf["conv_id"] == conv).sum())

    row = pdf.iloc[3]
    got = _post(base, "getTurn",
                {"convId": row["conv_id"], "turnIdx": int(row["turn_idx"])})
    assert len(got["docs"]) == 1 and got["docs"][0]["role"] == row["role"]


def test_error_paths(daemon):
    base, _, _ = daemon
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "noSuchMethod", {})
    assert e.value.code == 404
    req = urllib.request.Request(
        f"{base}/api/search", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # argument error (missing required field) → 400 with message
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "search", {})
    assert e.value.code == 400
    # unparseable classic query (leading wildcard) → 400, not 500
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "search", {"query": "*lead"})
    assert e.value.code == 400
    # operator-looking punctuation in pasted text must NOT error — it
    # degrades to the flat parser (stray paren treated as punctuation)
    ok = _post(base, "search", {"query": "ridash)"})
    assert "hits" in ok


def test_suggest_and_facets_endpoints(spark, daemon):
    """/api/suggest and /api/facets must return exactly the engine's
    suggest() / facet_counts() results."""
    base, d, pdf = daemon
    eng = SearchEngine(spark, d)
    # a plain lowercase corpus word (whitespace tokens can carry punctuation
    # or camel-case that whole-word-splits differently in the index vocab)
    term = next(w for line in pdf["text"] for w in line.split()
                if w.isalpha() and w.islower() and len(w) >= 6)
    probe = term[:-1] + ("x" if term[-1] != "x" else "y")  # 1-edit misspelling
    got = _post(base, "suggest", {"term": probe, "n": 10})["suggestions"]
    assert got == eng.suggest(probe, n=10, max_edits=2)
    assert any(s["term"] == term for s in got)

    q = " ".join(pdf["text"].iloc[1].split()[:2])
    got = _post(base, "facets", {"query": q, "attr": "role"})["facets"]
    want = {(r["facet"], r["n"])
            for r in eng.facet_counts(q, "role").collect()}
    assert {(f["facet"], f["n"]) for f in got} == want and want
    # sorted n desc for display
    assert [f["n"] for f in got] == sorted((f["n"] for f in got), reverse=True)
    # unknown attr → 400 (ValueError mapping)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "facets", {"query": q, "attr": "nope"})
    assert e.value.code == 400


def test_collapse_and_parents_endpoints(spark, daemon):
    """/api/collapse and /api/parents must return exactly the engine's
    search_collapse() / search_parent() rows."""
    base, d, pdf = daemon
    eng = SearchEngine(spark, d)
    q = " ".join(pdf["text"].iloc[1].split()[:2])

    got = _post(base, "collapse",
                {"query": q, "attr": "role", "k": 3, "perGroup": 2})
    want = [r.asDict() for r in
            eng.search_collapse(q, "role", k=3, per_group=2).collect()]
    assert got["groups"] == json.loads(json.dumps(want)) and want
    assert all(g["hit_rank"] <= 2 for g in got["groups"])

    got = _post(base, "parents",
                {"query": q, "attr": "role", "scoreMode": "total"})
    want = [r.asDict() for r in
            eng.search_parent(q, "role", score_mode="total").collect()]
    assert got["parents"] == json.loads(json.dumps(want)) and want

    # bad scoreMode / unknown attr → 400 (ValueError mapping)
    for body in ({"query": q, "attr": "role", "scoreMode": "bogus"},
                 {"query": q, "attr": "nope"}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "parents", body)
        assert e.value.code == 400


def test_rescore_endpoint(spark, daemon):
    """/api/rescore must return exactly the engine's rescore() rows."""
    base, d, pdf = daemon
    eng = SearchEngine(spark, d)
    toks = pdf["text"].iloc[1].split()
    q, rq = f"{toks[0]} {toks[1]}", toks[0]
    got = _post(base, "rescore",
                {"query": q, "rescoreQuery": rq, "k": 5, "window": 8,
                 "rescoreWeight": 2.0})
    want = [r.asDict() for r in
            eng.rescore(q, rq, k=5, window=8, rescore_weight=2.0).collect()]
    assert got["hits"] == json.loads(json.dumps(want)) and want


def test_boosting_and_significant_endpoints(spark, daemon):
    """/api/boosting and /api/significantTerms must return exactly the
    engine's rows (demote-not-exclude semantics + JLH agg)."""
    base, d, pdf = daemon
    eng = SearchEngine(spark, d)
    from collections import Counter

    from polaris_spark.tokenizer import tokenize
    common = [t for t, _ in Counter(
        t for x in pdf["text"] for t in set(tokenize(x))).most_common(3)]
    q, neg = f"{common[0]} {common[1]}", common[2]
    got = _post(base, "boosting",
                {"query": q, "negative": neg, "negativeBoost": 0.3, "k": 8})
    want = eng.search_boosting(q, neg, negative_boost=0.3, k=8)
    assert got["hits"] == json.loads(json.dumps(want)) and want
    assert any(h["demoted"] for h in got["hits"]) or all(
        h["demoted"] == 0 for h in got["hits"])
    gst = _post(base, "significantTerms",
                {"query": q, "n": 8, "window": 20, "minDocCount": 2})
    wst = [r.asDict() for r in
           eng.significant_terms(q, n=8, window=20,
                                 min_doc_count=2).collect()]
    assert gst["terms"] == json.loads(json.dumps(wst)) and wst
    # /api/intervals on a positions-less index → a 400 guard (ValueError
    # surfaces as the parse-error RPC code), not a 500
    req2 = urllib.request.Request(
        f"{base}/api/intervals",
        data=json.dumps({"spec": {"ordered": [{"term": q.split()[0]},
                                              {"term": q.split()[0]}]},
                         "k": 3}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req2, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400 and b"positions" in e.read()
    gsp = _post(base, "suggestPhrase", {"query": q, "n": 3, "perTerm": 3})
    wsp = [r.asDict() for r in
           eng.suggest_phrase(q, n=3, per_term=3).collect()]
    assert gsp["suggestions"] == json.loads(json.dumps(wsp))
    # functionScore needs a STORED numeric attr on the serving path; the
    # transcripts index stores only (role, tool) → guard, not a 500
    req = urllib.request.Request(
        f"{base}/api/functionScore",
        data=json.dumps({"query": q, "attr": "n_chars"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_searchmany_endpoint_bit_identical(spark, daemon):
    """/api/searchMany scores the list as one job; per-query hits must be
    bit-identical to sequential /api/search (the search_many_df contract)."""
    base, d, pdf = daemon
    qs = [pdf["text"].iloc[0].split()[0],
          " ".join(pdf["text"].iloc[1].split()[:2]),
          "nonexistenttermxyz"]
    # duplicate query in the request must not double its hit list
    got = _post(base, "searchMany", {"queries": qs + [qs[0]], "k": 5})["results"]
    eng = SearchEngine(spark, d)
    for q in qs:
        want = [(h["doc_id"], round(h["score"], 9)) for h in eng.search(q, k=5)]
        assert [(h["doc_id"], round(h["score"], 9)) for h in got[q]] == want
    assert got["nonexistenttermxyz"] == []


def test_explain_and_mlt_endpoints(spark, daemon):
    base, d, pdf = daemon
    eng = SearchEngine(spark, d)
    q = pdf["text"].iloc[0].split()[0]
    top = eng.search(q, k=1)
    assert top
    exp = _post(base, "explain",
                {"query": q, "docId": top[0]["doc_id"]})["explanation"]
    assert exp == eng.explain(q, top[0]["doc_id"])
    assert sum(r["contribution"] for r in exp) == top[0]["score"]
    # mlt by docId uses the stored text and excludes the source doc
    src = int(spark.read.parquet(d + "/doc_map")
              .orderBy("doc_id").limit(1).collect()[0]["doc_id"])
    hits = _post(base, "mlt", {"docId": src, "k": 5})["hits"]
    want = eng.more_like_this(
        eng.lookup_docs([src]).collect()[0]["text"], k=5,
        exclude_doc_id=src)
    assert [(h["doc_id"], round(h["score"], 9)) for h in hits] == \
           [(h["doc_id"], round(h["score"], 9)) for h in want]
    assert src not in {h["doc_id"] for h in hits}


def test_layout_and_docterms_endpoints(spark, daemon):
    """listDirectory + findUsagesInFile analogs over the daemon: /api/layout
    children match the corpus role counts, /api/docTerms re-analyzes the
    stored text (store_text index) with the index tokenizer."""
    from collections import Counter

    from polaris_spark.tokenizer import tokenize

    base, d, pdf = daemon
    out = _post(base, "layout", {"levels": ["role", "tool"]})
    got = {c["child"]: c["n_docs"] for c in out["children"]}
    assert got == {k: int(v) for k, v in pdf.groupby("role").size().items()}
    assert {c["kind"] for c in out["children"]} == {"dir"}

    dm = spark.read.parquet(f"{d}/doc_map").orderBy("doc_id").limit(1).collect()[0]
    out = _post(base, "docTerms", {"docId": dm["doc_id"]})
    assert {t["term"]: t["tf"] for t in out["terms"]} \
        == dict(Counter(tokenize(dm["text"])))
    assert all(t["df"] >= 1 for t in out["terms"])


def test_reload_serves_appended_generation(spark, tmp_path_factory):
    """/api/reload (SearcherManager.maybeRefresh analog): a doc appended
    AFTER daemon start is invisible until reload (point-in-time engine),
    then searchable; n_docs before/after reflect the published state."""
    from polaris_spark.index.maintenance import append_index

    d = str(tmp_path_factory.mktemp("reload_idx"))
    docs = spark.createDataFrame(make_transcripts(n_turns=200, seed=9))
    build_index(spark, docs, d, cfg=IndexConfig(n_buckets=8, n_shards=2,
                                                n_chunks=2))
    srv, _t = serve(spark, d, port=0, cache_terms=64)
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        new = spark.createDataFrame(
            [("convnew-0001", 0, "user", "zzzreloadterm appears here",
              "", None)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp")
        append_index(spark, new, d)
        # pre-reload: the daemon's engine predates the append
        pre = _post(base, "search", {"query": "zzzreloadterm",
                                     "payload": False})
        assert pre["count"] == 0
        r = _post(base, "reload", {})
        assert r["reloaded"] and r["n_docs_after"] == r["n_docs_before"] + 1
        post = _post(base, "search", {"query": "zzzreloadterm",
                                      "payload": False})
        assert post["count"] == 1
    finally:
        srv.shutdown()


def test_explain_endpoint_routes_trees(spark, daemon):
    """/api/explain auto-routes: flat query → per-term decomposition,
    boolean tree → per-leaf explain_bool payload."""
    base, d, pdf = daemon
    eng = SearchEngine(spark, d)
    words = [w for line in pdf["text"] for w in line.split()
             if w.isalpha() and w.islower()]
    t1, t2 = words[0], next(w for w in words if w != words[0])
    q = f"{t1} AND {t2}"
    hits = eng.search_bool(q, k=1)
    if hits:
        got = _post(base, "explain", {"query": q,
                                      "docId": hits[0]["doc_id"]})
        exp = got["explanation"]
        assert exp["matched"] and exp["score"] == \
            pytest.approx(hits[0]["score"], rel=1e-12)
        assert {"leaf", "kind", "counts"} <= set(exp["leaves"][0])
    flat = _post(base, "explain",
                 {"query": t1, "docId": eng.search(t1, k=1)[0]["doc_id"]})
    assert isinstance(flat["explanation"], list)


def test_metrics_endpoint(daemon):
    """GET /metrics: per-method counts, error counts, latency p50/p99 —
    populated by the requests earlier tests issued against this daemon."""
    base, _, pdf = daemon
    q = pdf["text"].iloc[0].split()[0]
    _post(base, "count", {"query": q})
    _post(base, "search", {"query": q, "rankTo": 3, "payload": False})
    with pytest.raises(urllib.error.HTTPError):
        _post(base, "search", {"query": "*lead"})  # a counted error
    with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
        m = json.loads(r.read())["methods"]
    assert m["count"]["n"] >= 1 and m["count"]["p50_ms"] > 0
    assert m["search"]["n"] >= 2 and m["search"]["errors"] >= 1
    assert m["search"]["p99_ms"] >= m["search"]["p50_ms"]


def test_aggs_endpoint(spark, daemon):
    """/api/aggs: the ES multi-aggregation body over one shared match
    set — served rows identical to the library executor; bad specs 400."""
    from polaris_spark.query.aggs import run_aggs

    base, d, pdf = daemon
    q = pdf["text"].iloc[0].split()[0]
    spec = {
        "by_role": {"type": "terms", "attr": "role"},
        "n_docs": {"type": "cardinality", "attr": "doc_id"},
        "role_pages": {"type": "composite", "sources": ["role"],
                       "size": 1},
    }
    got = _post(base, "aggs", {"query": q, "aggs": spec})["aggregations"]
    want = run_aggs(SearchEngine(spark, d), q, spec)
    assert got == want
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "aggs", {"query": q})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "aggs", {"query": q, "aggs": {"x": {"type": "bogus"}}})
    assert e.value.code == 400


def test_search_classic_similarity(spark, daemon):
    """similarity:'classic' serves the reference's DefaultSimilarity
    ranking — identical to the engine's classic path."""
    base, d, pdf = daemon
    q = pdf["text"].iloc[0].split()[0]
    got = _post(base, "search", {"query": q, "rankTo": 5,
                                 "similarity": "classic"})
    want = SearchEngine(spark, d).search_classic_df(q, k=5).collect()
    assert [(h["doc_id"], round(h["score"], 9)) for h in got["hits"]] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]
    assert "latency_ms" in got


def test_search_pinned_param(spark, daemon):
    """/api/search {pinned: [...]}: promoted ids lead in list order,
    identical to the engine's search_pinned rows."""
    from collections import Counter

    base, d, pdf = daemon
    q = Counter(w for t in pdf["text"] for w in t.split()
                if w.isalnum()).most_common(1)[0][0]
    eng = SearchEngine(spark, d)
    org = [h["doc_id"] for h in eng.search(q, k=5)]
    assert len(org) >= 3
    pin = [org[2], org[0], 12345]  # reorder two real hits; unknown dropped
    want = [r.asDict() for r in
            eng.search_pinned(q, pin, k=5).collect()]
    got = _post(base, "search", {"query": q, "rankTo": 5, "pinned": pin})
    assert got["hits"] == want
    assert [h["doc_id"] for h in got["hits"][:2]] == pin[:2]
    assert got["hits"][0]["pinned"] == 1 and got["count"] == len(want)
    assert all(h["pinned"] == 0 for h in got["hits"][2:])


def test_search_pinned_rejects_classic(daemon):
    """pinned + similarity=classic must 400, not silently BM25-rank the
    organic tail (ADVICE r3); same for pinned + filter."""
    import urllib.error

    base, _d, _pdf = daemon
    for extra in ({"similarity": "classic"}, {"filter": "spark"}):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "search",
                  {"query": "spark", "rankTo": 3, "pinned": [1], **extra})
        assert ei.value.code == 400
