"""FILTER context (Lucene 4.3 FilteredQuery / Occur.FILTER) + DisMax
(DisjunctionMaxQuery, Solr/ES dismax) — reference behavior: the
reference's Lucene 4.3 ships both query types
(org.apache.lucene.search.FilteredQuery / DisjunctionMaxQuery); its
MultiFieldQueryParser sum-scoring (sourcedb/SourceDbImpl.java:135-139)
is exactly the cross-field inflation dismax exists to fix.

Covers: score invariance under filtering, driver/distributed identity,
filter routing (flat docIdSet vs match_df), dismax vs a pandas oracle,
per-field boosts, tie-breaker, AND mode, parser guards, tombstone
interplay, and the plan shape (inclusion rides the exclusion cogroup).
"""
import math
from collections import Counter

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize

Q = "spark join"
FIELDS = ("source", "lang")


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path_factory.mktemp("fidx") / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                field_cols=FIELDS, attr_cols=FIELDS))
    return SearchEngine(spark, idx)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .select("doc_id", "text", "source", "lang").toPandas())
    toks = {
        r.doc_id: list(tokenize(r.text))
        + [f"source:{t}" for t in tokenize(r.source)]
        + [f"lang:{t}" for t in tokenize(r.lang)]
        for r in pdf.itertuples()
    }
    langs = dict(zip(pdf["doc_id"], pdf["lang"]))
    return toks, langs


# ------------------------------------------------------------- filter

def test_filter_scores_invariant_and_docset(eng, corpus):
    _, langs = corpus
    base = {r["doc_id"]: r["score"] for r in eng.search(Q, k=None)}
    filt = eng.search(Q, k=None, filter_query="lang:en")
    assert filt and len(filt) < len(base)
    # constant-score: survivors keep their UNFILTERED score bit-exactly
    assert all(base[r["doc_id"]] == r["score"] for r in filt)
    assert all(langs[r["doc_id"]] == "en" for r in filt)
    # the filter actually removed non-en matches (not vacuous)
    assert any(langs[d] != "en" for d in base)


def test_filter_driver_distributed_identical(eng):
    drv = eng.search(Q, k=None, filter_query="lang:en lang:de")
    dst = [r.asDict() for r in
           eng.search_df(Q, k=None, filter_query="lang:en lang:de").collect()]
    assert sorted((r["doc_id"], r["score"]) for r in drv) \
        == sorted((r["doc_id"], r["score"]) for r in dst)


def test_filter_tree_and_phrase_routes(eng, corpus):
    _, langs = corpus
    # boolean-tree filter goes through match_df routing
    tree = eng.search(Q, k=None, filter_query="lang:en OR lang:de")
    assert tree and all(langs[r["doc_id"]] in ("en", "de") for r in tree)
    # OR-tree set == flat pure-OR docIdSet path over the same terms
    flat = eng.search(Q, k=None, filter_query="lang:en lang:de")
    assert sorted(r["doc_id"] for r in tree) == sorted(r["doc_id"] for r in flat)


def test_filter_empty_and_unknown(eng):
    assert eng.search(Q, k=5, filter_query="zzznope") == []
    # unparseable filter admits nothing (parser empty-query contract)
    assert eng.search(Q, k=5, filter_query="!!! ;;;") == []


def test_filter_with_prohibit_main(eng, corpus):
    _, langs = corpus
    res = eng.search("spark -join", k=None, filter_query="lang:en")
    base = {r["doc_id"]: r["score"] for r in eng.search("spark -join", k=None)}
    assert res and all(langs[r["doc_id"]] == "en" for r in res)
    assert all(base[r["doc_id"]] == r["score"] for r in res)


def test_filter_mixed_endpoint_flat_only(eng):
    out = eng.search_mixed(Q, rank_to=5, payload=False,
                           filter_query="lang:de")
    assert out["hits"] and all(isinstance(h["doc_id"], int)
                               for h in out["hits"])
    with pytest.raises(ValueError, match="flat queries only"):
        eng.search_mixed('"spark join"', rank_to=5,
                         filter_query="lang:de")
    with pytest.raises(ValueError, match="flat queries only"):
        eng.search_mixed("spark AND join", rank_to=5,
                         filter_query="lang:de")


def test_filter_plan_rides_exclusion_cogroup(eng):
    plan = eng.search_df(Q, k=5, filter_query="lang:en") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


# ------------------------------------------------------------- dismax

def _dismax_oracle(toks, bases, tie, fb, k1=1.2, b=0.75):
    N = len(toks)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / N
    tfs = {d: Counter(ts) for d, ts in toks.items()}
    df = Counter()
    for d, c in tfs.items():
        for t in set(c):
            df[t] += 1

    def contrib(t, d, f):
        tf = tfs[d].get(t, 0)
        if not tf:
            return None
        idf = math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
        return fb.get(f, 1.0) * idf * (
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl)))

    out = {}
    for d in toks:
        s, n = 0.0, 0
        for bse in sorted(bases):
            cs = [c for f, t in
                  [("text", bse), ("lang", f"lang:{bse}"),
                   ("source", f"source:{bse}")]
                  if (c := contrib(t, d, f)) is not None]
            if cs:
                n += 1
                s += max(cs) + tie * (sum(cs) - max(cs))
        if n:
            out[d] = (s, n)
    return out


def test_dismax_matches_oracle_and_paths(eng, corpus):
    toks, _ = corpus
    fb = {"text": 1.0, "source": 0.5}
    drv = eng.search_dismax(Q, k=12, tie=0.3, field_boosts=fb)
    dst = [r.asDict() for r in
           eng.search_dismax_df(Q, k=12, tie=0.3,
                                field_boosts=fb).collect()]
    assert [(r["doc_id"], r["score"]) for r in drv] \
        == [(r["doc_id"], r["score"]) for r in dst]
    ref = _dismax_oracle(toks, ["spark", "join"], 0.3, fb)
    top = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:12]
    assert [d for d, _ in top] == [r["doc_id"] for r in drv]
    for (d, (s, n)), r in zip(top, drv):
        assert abs(s - r["score"]) < 1e-9 and n == r["n_match"]


def test_dismax_tie_zero_is_pure_max(eng, corpus):
    toks, _ = corpus
    drv = eng.search_dismax(Q, k=None, tie=0.0)
    ref = _dismax_oracle(toks, ["spark", "join"], 0.0, {})
    assert len(drv) == len(ref)
    for r in drv:
        assert abs(ref[r["doc_id"]][0] - r["score"]) < 1e-9


def test_dismax_and_mode(eng):
    da = eng.search_dismax(Q, k=None, mode="and")
    do = eng.search_dismax(Q, k=None, mode="or")
    assert da and len(da) < len(do)
    assert all(r["n_match"] == 2 for r in da)


def test_dismax_filter_context(eng, corpus):
    _, langs = corpus
    base = {r["doc_id"]: r["score"]
            for r in eng.search_dismax(Q, k=None, tie=0.3)}
    res = [r.asDict() for r in
           eng.search_dismax_df(Q, k=None, tie=0.3,
                                filter_query="lang:de").collect()]
    assert res and all(langs[r["doc_id"]] == "de" for r in res)
    assert all(base[r["doc_id"]] == r["score"] for r in res)


def test_dismax_rejects_operator_syntax(eng):
    for bad in ['"spark join"', "spark AND join", "spark -join",
                "spa*", "lang:en", "spark~1", "spark^2"]:
        with pytest.raises(ValueError):
            eng.search_dismax(bad)


def test_dismax_tombstones_hidden(spark, tmp_path):
    from polaris_spark.index.maintenance import delete_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                field_cols=FIELDS, attr_cols=FIELDS))
    eng = SearchEngine(spark, idx)
    victims = [r["doc_id"] for r in eng.search_dismax(Q, k=3)]
    delete_docs(spark, idx, victims)
    eng2 = SearchEngine(spark, idx)
    after = {r["doc_id"] for r in eng2.search_dismax(Q, k=None)}
    assert not (after & set(victims))
    dd = {r["doc_id"] for r in
          eng2.search_dismax_df(Q, k=None).collect()}
    assert dd == after


def test_explain_dismax_bit_exact(eng):
    fb = {"text": 1.0, "source": 0.5}
    hits = eng.search_dismax(Q, k=5, tie=0.3, field_boosts=fb)
    for h in hits:
        rows = eng.explain_dismax(Q, h["doc_id"], tie=0.3, field_boosts=fb)
        assert len(rows) == h["n_match"]
        total = 0.0
        for r in rows:  # base-sorted sequential sum == the kernel's
            total += r["contribution"]
        assert total == h["score"]  # bit-exact
        for r in rows:
            assert r["max_contribution"] <= r["sum_contribution"] + 1e-15
