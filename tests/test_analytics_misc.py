"""Mixer endpoint, capped collect, turn-ordering analytics."""

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.ops.analytics import capped_collect, turn_ordering_check
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts


def test_search_mixed_endpoint(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello"), (3, "helicopter hello")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=4, n_shards=2, n_chunks=2))
    eng = SearchEngine(spark, d)
    res = eng.search_mixed("hel", rank_from=0, rank_to=10)
    assert res["count"] == 0  # 'hel' is not an indexed term (no hits)
    assert {c["term"] for c in res["completions"]} == {"hello", "helicopter"}
    assert res["latency_ms"] >= 0
    res2 = eng.search_mixed("hello", rank_from=1, rank_to=2)
    # count = hits retrieved (≤ rank_to), as in the reference (it searches
    # n=rankTo then counts the returned list)
    assert res2["count"] == 2 and len(res2["hits"]) == 1  # page [1,2)
    res3 = eng.search_mixed("hello", rank_from=0, rank_to=10)
    assert res3["count"] == 3


def test_capped_collect_logs_truncation(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(3)],
        "k string, v int",
    )
    capped, truncated = capped_collect(df, "k", "v", cap=5, out_col="vs")
    got = {r["k"]: (len(r["vs"]), r["n_total"]) for r in capped.collect()}
    assert got == {"a": (5, 10), "b": (3, 3)}
    trunc = {r["k"]: r["n_total"] for r in truncated.collect()}
    assert trunc == {"a": 10}  # truncation surfaced, never silent


def test_turn_ordering_check(spark):
    pdf = make_transcripts(n_turns=60, turns_per_conv=20, seed=2)
    out = {r["conv_id"]: r for r in turn_ordering_check(spark.createDataFrame(pdf)).collect()}
    assert all(r["n_turns"] == 20 for r in out.values())
    # roles cycle user/assistant/tool over the GLOBAL turn counter, so each
    # conversation's first role is ROLES[(conv_index*20) % 3]
    from polaris_spark.synth import ROLES

    for cid, r in out.items():
        conv = int(cid.split("-")[-1])
        assert r["first_role"] == ROLES[(conv * 20) % 3]
        assert r["last_role"] == ROLES[(conv * 20 + 19) % 3]


def test_search_with_payload_snippet(spark, tmp_path):
    """Payload join + per-hit ±(2,3)-line snippet (SearchMixer.getSummary
    analog) computed only for the k joined rows, JVM-side."""
    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.query.engine import SearchEngine

    rows = [
        (1, "line0\nline1\nneedle here\nline3\nline4\nline5\nline6"),
        (2, "needle on first line\nb\nc"),
        (3, "nothing to see"),
    ]
    d = str(tmp_path / "snip_idx")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=4, n_shards=2, n_chunks=2))
    eng = SearchEngine(spark, d)
    got = {r["doc_id"]: r["snippet"]
           for r in eng.search_with_payload("needle", k=5, docs=docs,
                                            snippet=True).collect()}
    assert set(got) == {1, 2}
    # doc 1: first match on line index 2 (1-based 3) → lines 1..6 window
    assert got[1] == "line0\nline1\nneedle here\nline3\nline4\nline5"
    assert got[2].startswith("needle on first line")
    import pytest as _p
    with _p.raises(ValueError, match="text column"):
        eng.search_with_payload("needle", k=5, snippet=True).collect()


def test_assemble_docs_transcript_rendering(spark):
    """assemble_docs over real transcript shape: turn order restored from
    a shuffled frame, role-tagged template, part counts; matches a
    pure-Python rendering."""
    from polaris_spark.ops.analytics import assemble_docs
    from polaris_spark.synth import make_transcripts

    pdf = make_transcripts(n_turns=300, seed=9)
    # shuffle rows so ordering must come from turn_idx, not input order
    docs = spark.createDataFrame(pdf.sample(frac=1.0, random_state=1))
    out = {r["conv_id"]: (r["assembled"], r["n_parts"])
           for r in assemble_docs(docs, "conv_id", "turn_idx",
                                  role_col="role").collect()}
    ref = {}
    for conv, g in pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        ref[conv] = ("\n\n".join(f"{r.role}: {r.text}"
                                 for r in g.itertuples()), len(g))
    assert out == ref and len(out) > 1


def test_assemble_docs_tie_break_and_sep(spark):
    from polaris_spark.ops.analytics import assemble_docs

    rows = [("k", 1, "b"), ("k", 1, "a"), ("k", 0, "z")]
    docs = spark.createDataFrame(rows, "key string, ord int, text string")
    r = assemble_docs(docs, "key", "ord", sep=" | ").collect()[0]
    # (order, text) struct sort: 0/z first, then the order-1 tie a<b
    assert r["assembled"] == "z | a | b" and r["n_parts"] == 3
