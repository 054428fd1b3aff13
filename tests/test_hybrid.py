"""Hybrid RRF retrieval (ES 8 rrf retriever analog): hand-computed
fusion goldens on tiny frames, window-cut semantics, weights, the
pluggable vector leg (IVF output shape), and the engine-integrated
hybrid_search_df path against independently-computed leg ranks."""

import pytest

from polaris_spark.query.hybrid import hybrid_search_df, rrf_fuse


def _legs(spark, lex_rows, vec_rows):
    lex = spark.createDataFrame(lex_rows, "doc_id long, score double")
    vec = spark.createDataFrame(vec_rows, "vid long, sim double")
    return [(lex, "score", "doc_id"), (vec, "sim", "vid")]


def test_hand_golden_fusion(spark):
    """lex ranks: 1->1, 2->2; vec ranks: 2->1, 3->2 (rc=60):
    doc2 = 1/62 + 1/61 (both legs) beats doc1 = 1/61 and doc3 = 1/62."""
    legs = _legs(spark, [(1, 9.0), (2, 5.0)], [(2, 0.9), (3, 0.8)])
    rows = rrf_fuse(legs, k=10, rank_constant=60).collect()
    got = [(r["doc_id"], r["rank_leg0"], r["rank_leg1"],
            round(r["rrf"], 12)) for r in rows]
    assert got == [
        (2, 2, 1, round(1 / 62 + 1 / 61, 12)),
        (1, 1, 0, round(1 / 61, 12)),
        (3, 0, 2, round(1 / 62, 12)),
    ]


def test_window_cuts_each_leg(spark):
    """window=1 keeps only each leg's top-1: doc2's lex rank-2 row is
    cut, so it fuses from the vector leg alone."""
    legs = _legs(spark, [(1, 9.0), (2, 5.0)], [(2, 0.9), (3, 0.8)])
    rows = {r["doc_id"]: r for r in
            rrf_fuse(legs, k=10, rank_constant=60, window=1).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["rank_leg0"] == 0 and rows[2]["rank_leg1"] == 1
    assert rows[1]["rrf"] == pytest.approx(rows[2]["rrf"])  # both 1/61


def test_weights_shift_the_order(spark):
    """Up-weighting the vector leg flips a lex-only doc below a
    vec-only doc at equal ranks."""
    legs = _legs(spark, [(1, 9.0)], [(3, 0.9)])
    eq = rrf_fuse(legs, k=2).collect()
    assert [r["doc_id"] for r in eq] == [1, 3]  # tie -> doc_id asc
    up = rrf_fuse(legs, k=2, weights=[1.0, 2.0]).collect()
    assert [r["doc_id"] for r in up] == [3, 1]
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse(legs, weights=[1.0])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_tie_break_is_doc_id(spark):
    legs = _legs(spark, [(7, 1.0), (4, 1.0)], [])
    # equal scores: rank by (score desc, id asc) -> doc4 rank 1
    rows = rrf_fuse(legs, k=2).collect()
    assert [(r["doc_id"], r["rank_leg0"]) for r in rows] == [(4, 1), (7, 2)]


def test_hybrid_endpoint(spark, tmp_path):
    """/api/hybrid serves the library fusion bit-for-bit; a body without
    a query vector 400s."""
    import json
    import urllib.error
    import urllib.request

    import numpy as np

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.server import serve
    from polaris_spark.synth import make_transcripts

    d = str(tmp_path / "hsrv_idx")
    pdf = make_transcripts(n_turns=300, seed=17)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1))
    ids = sorted(r["doc_id"] for r in
                 spark.read.parquet(f"{d}/doc_map")
                 .select("doc_id").collect())
    rng = np.random.RandomState(3)
    emb_path = str(tmp_path / "hsrv_emb")
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.randn(6)]) for i in ids],
        "vec_id long, embedding array<float>")
    emb.write.parquet(emb_path)
    q = pdf["text"].iloc[0].split()[0]

    srv, _t = serve(spark, d, port=0)
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{base}/api/hybrid",
            data=json.dumps({"query": q, "embeddings": emb_path,
                             "queryVecId": int(ids[0]), "k": 7,
                             "window": 25}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            got = json.loads(r.read())["hits"]
        from polaris_spark.query.engine import SearchEngine
        qv = [float(x) for x in
              spark.read.parquet(emb_path)
              .where(f"vec_id = {int(ids[0])}").collect()[0]["embedding"]]
        want = hybrid_search_df(SearchEngine(spark, d), q,
                                spark.read.parquet(emb_path), qv,
                                k=7, window=25).collect()
        assert [(h["doc_id"], round(h["rrf"], 12)) for h in got] == \
            [(w["doc_id"], round(w["rrf"], 12)) for w in want]
        for body in ({"query": q, "embeddings": emb_path},
                     {"query": q, "embeddings": emb_path,
                      "queryVecId": 987654321}):  # missing vec / bad id
            bad = urllib.request.Request(
                f"{base}/api/hybrid", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(bad, timeout=30)
            assert e.value.code == 400
    finally:
        srv.shutdown()


def test_engine_hybrid_matches_manual_legs(spark, tmp_path):
    """hybrid_search_df over a real index + synthetic embeddings equals
    manually fusing search_df and cosine_topk ranks; a prebuilt vec_leg
    (the IVF plug point) gives the identical result."""
    import numpy as np
    from pyspark.sql import functions as F

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.ops.similarity import cosine_topk
    from polaris_spark.query.engine import SearchEngine
    from polaris_spark.synth import make_transcripts

    d = str(tmp_path / "hyb_idx")
    pdf = make_transcripts(n_turns=800, seed=31)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1))
    eng = SearchEngine(spark, d)
    w = pdf["text"].iloc[0].split()
    q = f"{w[0]} {w[2]}"

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{d}/doc_map").select("doc_id").collect()]
    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.randn(8)]) for i in sorted(ids)],
        "vec_id long, embedding array<float>")
    qv = [float(x) for x in rng.randn(8)]

    out = hybrid_search_df(eng, q, emb, qv, k=20, window=15).collect()
    assert out, "hybrid must return hits"

    lex_rank = {r["doc_id"]: i + 1 for i, r in enumerate(
        eng.search_df(q, k=15).orderBy(
            F.desc("score"), F.asc("doc_id")).collect())}
    vec_rank = {r["vec_id"]: i + 1 for i, r in enumerate(
        cosine_topk(emb, qv, k=15).collect())}
    for r in out:
        assert r["rank_leg0"] == lex_rank.get(r["doc_id"], 0)
        assert r["rank_leg1"] == vec_rank.get(r["doc_id"], 0)
        want = (1 / (60 + r["rank_leg0"]) if r["rank_leg0"] else 0) + \
               (1 / (60 + r["rank_leg1"]) if r["rank_leg1"] else 0)
        assert r["rrf"] == pytest.approx(want, abs=1e-15)

    plugged = hybrid_search_df(
        eng, q, None, None, k=20, window=15,
        vec_leg=cosine_topk(emb, qv, k=15)).collect()
    assert [(r["doc_id"], r["rrf"]) for r in plugged] == \
        [(r["doc_id"], r["rrf"]) for r in out]

    # filtered hybrid (ES filtered-kNN contract): every hit satisfies the
    # filter, both legs are PRE-filtered (the vector leg re-ranks within
    # the allowed set rather than post-dropping), and it equals fusing
    # manually pre-filtered legs
    fq = w[1]
    filt = hybrid_search_df(eng, q, emb, qv, k=20, window=15,
                            filter_query=fq).collect()
    assert filt, "filter term occurs in doc 0's text, must match"
    allowed = {r["doc_id"] for r in eng.match_df(fq).collect()}
    assert {r["doc_id"] for r in filt} <= allowed
    emb_f = emb.where(F.col("vec_id").isin([int(i) for i in allowed]))
    want_f = hybrid_search_df(eng, q, None, None, k=20, window=15,
                              vec_leg=cosine_topk(emb_f, qv, k=15),
                              filter_query=fq).collect()
    assert [(r["doc_id"], round(r["rrf"], 12)) for r in filt] == \
        [(r["doc_id"], round(r["rrf"], 12)) for r in want_f]

    # leg consistency under mode="and": the filter constrains BOTH legs
    # to the engine's FILTER-context doc set (the filter's OWN routing,
    # independent of the main query's mode) — every fused hit is in it
    fq2 = f"{w[1]} {w[3]}"  # multi-term filter: OR-context set
    filt_and = hybrid_search_df(eng, q, emb, qv, k=50, window=25,
                                mode="and", filter_query=fq2).collect()
    ctx = {r["doc_id"] for r in
           eng._filter_docs_df(fq2).select("doc_id").collect()}
    assert {r["doc_id"] for r in filt_and} <= ctx
    # and a vector-only hit outside the lexical AND set can still appear
    # (proves the vector leg used the FILTER set, not the AND match set)
    lex_and = {r["doc_id"] for r in
               eng.search_df(q, k=None, mode="and").collect()}
    assert any(r["doc_id"] not in lex_and for r in filt_and)


def test_maxsim_leg_plugs_into_hybrid(spark, tmp_path):
    """Late-interaction composition: a ColBERT MaxSim frame (doc-level
    scores from bags of token vectors) plugs into hybrid RRF as the
    vector leg — ranks on the leg follow the maxsim order, fused scores
    are the standard RRF fold of both legs."""
    import numpy as np
    from pyspark.sql import functions as F

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.ops.similarity import maxsim_topk
    from polaris_spark.query.engine import SearchEngine
    from polaris_spark.synth import make_transcripts

    d = str(tmp_path / "hyb_ms_idx")
    pdf = make_transcripts(n_turns=600, seed=13)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1))
    eng = SearchEngine(spark, d)
    w = pdf["text"].iloc[0].split()
    q = f"{w[0]} {w[1]}"

    ids = sorted(r["doc_id"] for r in
                 spark.read.parquet(f"{d}/doc_map")
                 .select("doc_id").collect())
    rng = np.random.RandomState(3)
    # 4 token vectors per doc, tagged with the doc's id
    tok = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.randn(8)])
         for i in ids for _ in range(4)],
        "doc_id long, embedding array<float>")
    qs = [[float(x) for x in rng.randn(8)] for _ in range(2)]

    leg = maxsim_topk(tok, qs, k=15).select(
        F.col("doc").alias("vec_id"), F.col("maxsim").alias("sim"))
    out = hybrid_search_df(eng, q, None, None, k=20, window=15,
                           vec_leg=leg).collect()
    assert out, "fused hits expected"
    ms_rank = {r["doc"]: i + 1 for i, r in enumerate(
        maxsim_topk(tok, qs, k=15).collect())}
    for r in out:
        assert r["rank_leg1"] == ms_rank.get(r["doc_id"], 0)
        want = (1 / (60 + r["rank_leg0"]) if r["rank_leg0"] else 0) + \
               (1 / (60 + r["rank_leg1"]) if r["rank_leg1"] else 0)
        assert r["rrf"] == pytest.approx(want, abs=1e-15)
