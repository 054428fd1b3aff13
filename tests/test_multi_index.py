"""Federated multi-index search (Lucene MultiReader / ES
dfs_query_then_fetch): global df/N/avgdl merge makes scores bit-equal to
one monolithic index; per-index prohibits; missing-term indices; doc_id
collisions disambiguated by index_id."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.query.multi import search_multi_df
from polaris_spark.synth import make_transcripts

CFG = IndexConfig(n_buckets=8, n_shards=2, n_chunks=2)


@pytest.fixture(scope="module")
def split(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("multi")
    pdf = make_transcripts(n_turns=800, seed=31)
    docs = spark.createDataFrame(pdf)
    d_all = str(base / "all")
    build_index(spark, docs, d_all, cfg=CFG)
    halves = []
    for h in (0, 1):
        d = str(base / f"h{h}")
        build_index(spark, docs.where(f"turn_idx % 2 = {h}"), d, cfg=CFG)
        halves.append(d)
    return d_all, halves, pdf


def _rows(df):
    return sorted((r["doc_id"], round(r["score"], 9), r["n_match"])
                  for r in df.collect())


def test_federated_equals_monolithic(spark, split):
    d_all, halves, pdf = split
    mono = SearchEngine(spark, d_all)
    toks = pdf["text"].iloc[0].split()[:2]
    for q, mode in [(f"{toks[0]} {toks[1]}", "or"),
                    (f"{toks[0]} {toks[1]}", "and"),
                    (f"{toks[0]}^2 {toks[1]} -the", "or")]:
        fed = search_multi_df(spark, halves, q, k=None, mode=mode) \
            .drop("index_id")
        assert _rows(fed) == _rows(mono.search_df(q, k=None, mode=mode)), \
            (q, mode)
    # top-k merge: exact global head
    fed10 = search_multi_df(spark, halves, toks[0], k=10).collect()
    mono10 = mono.search_df(toks[0], k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in fed10] == \
        [(r["doc_id"], round(r["score"], 9)) for r in mono10]


def test_term_absent_from_one_index(spark, tmp_path):
    """A term living in only ONE index still scores with the GLOBAL idf
    (merged df over both), matching the monolithic union index — the
    case local-stats merging (ES query_then_fetch) gets wrong."""
    import pandas as pd

    texts_a = ["spark join merge", "spark scan", "join sort",
               "merge sort scan", "spark join", "scan scan sort",
               "join join merge", "sort spark", "merge scan",
               "spark sort join"]
    texts_b = ["quorum spark", "quorum quorum join", "spark merge",
               "quorum sort", "join scan quorum", "merge quorum",
               "sort sort quorum", "spark spark quorum"]
    a = pd.DataFrame({"conv_id": ["a"] * len(texts_a),
                      "turn_idx": range(len(texts_a)),
                      "role": ["user"] * len(texts_a),
                      "tool": [""] * len(texts_a),
                      "ts": [float(i) for i in range(len(texts_a))],
                      "text": texts_a})
    b = pd.DataFrame({"conv_id": ["b"] * len(texts_b),
                      "turn_idx": range(len(texts_b)),
                      "role": ["user"] * len(texts_b),
                      "tool": [""] * len(texts_b),
                      "ts": [float(i) for i in range(len(texts_b))],
                      "text": texts_b})
    d_a, d_b = str(tmp_path / "ia"), str(tmp_path / "ib")
    d_all = str(tmp_path / "iu")
    build_index(spark, spark.createDataFrame(a), d_a, cfg=CFG)
    build_index(spark, spark.createDataFrame(b), d_b, cfg=CFG)
    build_index(spark, spark.createDataFrame(pd.concat([a, b])), d_all,
                cfg=CFG)
    mono = SearchEngine(spark, d_all)
    for q in ("quorum spark", "quorum"):  # 'quorum' exists only in b
        fed = search_multi_df(spark, [d_a, d_b], q, k=None) \
            .drop("index_id")
        assert _rows(fed) == _rows(mono.search_df(q, k=None)), q


def test_doc_id_collision_disambiguated(spark, tmp_path):
    """The same doc_id in two indices (no global uniqueness) yields two
    rows distinguished by index_id — Lucene's docBase contract."""
    pdf = make_transcripts(n_turns=100, seed=41)
    docs = spark.createDataFrame(pdf)
    dirs = []
    for i in (0, 1):
        d = str(tmp_path / f"dup{i}")
        build_index(spark, docs, d, cfg=CFG)
        dirs.append(d)
    q = pdf["text"].iloc[0].split()[0]
    out = search_multi_df(spark, dirs, q, k=None).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["index_id"])
    assert all(sorted(v) == [0, 1] for v in by_doc.values())
    with pytest.raises(ValueError, match="at least one index"):
        search_multi_df(spark, [], q)


def test_multisearch_endpoint(spark, split):
    """/api/multiSearch serves the federated hits with merged stats —
    identical to the library path; empty indexes list 400s."""
    import json
    import urllib.error
    import urllib.request

    from polaris_spark.server import serve

    d_all, halves, pdf = split
    srv, _t = serve(spark, d_all, port=0)
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        q = pdf["text"].iloc[0].split()[0]
        req = urllib.request.Request(
            f"{base}/api/multiSearch",
            data=json.dumps({"query": q, "indexes": halves, "k": 7}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            got = json.loads(r.read())["hits"]
        want = [r.asDict() for r in
                search_multi_df(spark, halves, q, k=7).collect()]
        assert [(h["index_id"], h["doc_id"], round(h["score"], 9))
                for h in got] == \
            [(w["index_id"], w["doc_id"], round(w["score"], 9))
             for w in want]
        bad = urllib.request.Request(
            f"{base}/api/multiSearch",
            data=json.dumps({"query": q, "indexes": []}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        srv.shutdown()
