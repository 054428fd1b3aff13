"""BoostingQuery (Lucene queries BoostingQuery / ES ``boosting``) +
significant-terms aggregation (ES ``significant_terms`` under a sampler
scope) — reference context: the reference's Lucene 4.3 ships
BoostingQuery in lucene-queries, and its search mixer's bag-of-words
ranking (sourcedb/SourceDbImpl.java:131-163) is the foreground a
significance agg summarizes.

Covers: demotion is bit-exact (×b) and never excludes, the demoted flag
marks exactly the negative match set, the top-k cut happens AFTER
demotion (a demoted hit can fall out of / rise into the cut), driver ≡
distributed, JLH scores vs a pure-Python oracle over the same window,
the superset (fg% > bg%) and min_doc_count rules, and tf/-checkpoint vs
re-analysis foreground identity.
"""
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize

Q = "spark join"
NEG = "scan"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path_factory.mktemp("bidx") / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2))
    return SearchEngine(spark, idx)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .select("doc_id", "text").toPandas())
    return {r.doc_id: list(tokenize(r.text)) for r in pdf.itertuples()}


# ------------------------------------------------------------ boosting

def test_boosting_demotes_never_excludes(eng, corpus):
    base = {r["doc_id"]: r["score"] for r in eng.search(Q, k=None)}
    res = eng.search_boosting(Q, NEG, negative_boost=0.4, k=None)
    assert {r["doc_id"] for r in res} == set(base)  # same match set
    negset = {d for d, toks in corpus.items() if NEG in toks}
    assert any(r["demoted"] for r in res) and not all(
        r["demoted"] for r in res)
    for r in res:
        if r["doc_id"] in negset:
            assert r["demoted"] == 1
            assert r["score"] == base[r["doc_id"]] * 0.4  # bit-exact f64
        else:
            assert r["demoted"] == 0
            assert r["score"] == base[r["doc_id"]]


def test_boosting_cut_after_demotion(eng):
    plain = [r["doc_id"] for r in eng.search(Q, k=10)]
    # b=0 floors every demoted hit: any demoted doc in the plain top-10
    # must fall out (the corpus has >10 non-demoted matches)
    floored = eng.search_boosting(Q, NEG, negative_boost=0.0, k=10)
    dem = {r["doc_id"] for r in
           eng.search_boosting(Q, NEG, negative_boost=0.4, k=None)
           if r["demoted"]}
    assert any(d in dem for d in plain)  # the case is non-vacuous
    assert all(r["doc_id"] not in dem for r in floored)
    # b=1 is the identity
    same = eng.search_boosting(Q, NEG, negative_boost=1.0, k=10)
    assert [r["doc_id"] for r in same] == plain


def test_boosting_driver_distributed_identity(eng):
    drv = eng.search_boosting(Q, NEG, negative_boost=0.4, k=15)
    dst = [r.asDict() for r in
           eng.search_boosting_df(Q, NEG, negative_boost=0.4, k=15).collect()]
    assert drv == dst


# --------------------------------------------------- significant terms

def _py_jlh(eng, corpus, window, min_dc):
    hits = [r["doc_id"] for r in eng.search(Q, k=window)]
    fg_n = float(len(hits))
    fg = {}
    for d in hits:
        for t in set(corpus[d]):
            fg[t] = fg.get(t, 0) + 1
    n = float(eng.stats["N"])
    bg = {}
    for toks in corpus.values():
        for t in set(toks):
            bg[t] = bg.get(t, 0) + 1
    out = []
    for t, f in fg.items():
        if f < min_dc:
            continue
        fgp, bgp = f / fg_n, bg[t] / n
        score = (fgp - bgp) * (fgp / bgp)
        if score > 0:
            out.append((t, f, bg[t], score))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out


def test_significant_terms_vs_python_oracle(eng, corpus):
    want = _py_jlh(eng, corpus, window=50, min_dc=2)[:15]
    got = [(r["term"], r["fg_df"], r["bg_df"], r["score"])
           for r in eng.significant_terms(Q, n=15, window=50,
                                          min_doc_count=2).collect()]
    assert got == want  # bit-exact: integer-count inputs, same f64 ops


def test_significant_terms_superset_and_mindc(eng, corpus):
    rows = eng.significant_terms(Q, n=100, window=50,
                                 min_doc_count=3).collect()
    n = float(eng.stats["N"])
    hits = [r["doc_id"] for r in eng.search(Q, k=50)]
    for r in rows:
        assert r["fg_df"] >= 3
        assert r["fg_df"] / len(hits) > r["bg_df"] / n  # fg% > bg%
    # the query's own terms are over-represented by construction
    terms = {r["term"] for r in rows}
    assert "spark" in terms and "join" in terms


def test_significant_terms_tf_vs_reanalysis_identity(eng, spark):
    # the index keeps its tf/ checkpoint; forcing the docs= escape hatch
    # must re-derive the identical foreground (text-only index)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    via_tf = eng.significant_terms(Q, n=15, window=50).collect()
    import os
    assert os.path.isdir(os.path.join(eng.index_dir, "tf"))
    import polaris_spark.query.engine as E
    real = eng.fs.exists
    try:
        eng.fs.exists = lambda p, _r=real: (False if p.endswith("/tf")
                                            else _r(p))
        via_docs = eng.significant_terms(Q, n=15, window=50,
                                         docs=docs).collect()
    finally:
        eng.fs.exists = real
    assert via_tf == via_docs


def test_significant_terms_no_hits_empty(eng):
    assert eng.significant_terms("zzqqxx_nosuchterm", n=5).count() == 0


# ------------------------------------------------------ function score

def test_function_score_multiply_vs_manual(eng, spark):
    import math

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    nchars = {r["doc_id"]: r["n_chars"]
              for r in docs.select("doc_id", "n_chars").collect()}
    base = {r["doc_id"]: (r["score"], r["n_match"])
            for r in eng.search(Q, k=None)}
    rows = eng.search_function_score(Q, "n_chars", factor=0.01,
                                     modifier="log1p", k=None,
                                     docs=docs).collect()
    assert {r["doc_id"] for r in rows} == set(base)
    for r in rows:
        # JVM Math.log is ≤1 ulp of libm's — compare within 2 ulp; the
        # e4-rounded DuckDB gate covers cross-engine value identity
        assert math.isclose(r["fv"],
                            math.log(1.0 + nchars[r["doc_id"]] * 0.01),
                            rel_tol=1e-15, abs_tol=0.0)
        # the multiply itself is IEEE-exact against the engine's own fv
        assert r["score"] == base[r["doc_id"]][0] * r["fv"]
        assert r["n_match"] == base[r["doc_id"]][1]
    # reshape happens BEFORE the cut: top-k order follows reshaped score
    top = eng.search_function_score(Q, "n_chars", factor=0.01,
                                    modifier="log1p", k=5,
                                    docs=docs).collect()
    want = sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))[:5]
    assert [(r["doc_id"], r["score"]) for r in top] == \
        [(r["doc_id"], r["score"]) for r in want]


def test_function_score_sum_sqrt_and_guards(eng, spark):
    import math

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {r["doc_id"]: r["score"] for r in eng.search(Q, k=None)}
    nchars = {r["doc_id"]: r["n_chars"]
              for r in docs.select("doc_id", "n_chars").collect()}
    rows = eng.search_function_score(Q, "n_chars", factor=2.0,
                                     modifier="sqrt", boost_mode="sum",
                                     k=None, docs=docs).collect()
    for r in rows:
        assert r["score"] == base[r["doc_id"]] + math.sqrt(
            nchars[r["doc_id"]] * 2.0)
    import pytest as _pt
    with _pt.raises(ValueError):
        eng.search_function_score(Q, "n_chars", boost_mode="max", docs=docs)
    with _pt.raises(ValueError):
        eng.search_function_score(Q, "n_chars", modifier="log2p", docs=docs)
    with _pt.raises(ValueError):
        eng.search_function_score(Q, "nope", docs=docs)  # attr nowhere


def test_function_score_stored_attr_parity(spark, tmp_path_factory):
    """A numeric attr_col stored in doc_map must serve identically to the
    docs= escape hatch."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path_factory.mktemp("fsidx") / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                attr_cols=("n_chars",)))
    e2 = SearchEngine(spark, idx)
    via_dm = e2.search_function_score(Q, "n_chars", factor=0.01,
                                      modifier="log1p", k=10).collect()
    via_docs = e2.search_function_score(Q, "n_chars", factor=0.01,
                                        modifier="log1p", k=10,
                                        docs=docs).collect()
    assert via_dm == via_docs and via_dm


# -------------------------------------------------------- decay scoring

def test_decay_shapes_vs_manual(eng, spark):
    """gauss/exp/linear decay follow the ES contract: multiplier 1 inside
    offset, exactly `decay` at distance scale (+offset), monotone
    non-increasing in distance; exact algebra vs the engine's own fv."""
    import math

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    nchars = {r["doc_id"]: r["n_chars"]
              for r in docs.select("doc_id", "n_chars").collect()}
    base = {r["doc_id"]: r["score"] for r in eng.search(Q, k=None)}
    for shape in ("gauss", "exp", "linear"):
        rows = eng.search_decay(Q, "n_chars", origin=300.0, scale=150.0,
                                shape=shape, decay=0.5, offset=20.0,
                                k=None, docs=docs).collect()
        assert {r["doc_id"] for r in rows} == set(base)
        for r in rows:
            d = max(0.0, abs(nchars[r["doc_id"]] - 300.0) - 20.0)
            if shape == "gauss":
                want = math.exp(d * d * (math.log(0.5) / 150.0 ** 2))
            elif shape == "exp":
                want = math.exp(d * (math.log(0.5) / 150.0))
            else:
                want = max(0.0, 1.0 - d * (0.5 / 150.0))
            assert math.isclose(r["fv"], want, rel_tol=1e-15, abs_tol=0.0)
            assert r["score"] == base[r["doc_id"]] * r["fv"]
            assert 0.0 <= r["fv"] <= 1.0
        # ES contract points: d=0 -> 1; d=scale -> decay (checked on the
        # formula itself, independent of corpus values)
        at0 = {"gauss": math.exp(0.0), "exp": math.exp(0.0), "linear": 1.0}
        assert at0[shape] == 1.0
        if shape == "gauss":
            at_s = math.exp(150.0 ** 2 * (math.log(0.5) / 150.0 ** 2))
        elif shape == "exp":
            at_s = math.exp(150.0 * (math.log(0.5) / 150.0))
        else:
            at_s = 1.0 - 150.0 * (0.5 / 150.0)
        assert math.isclose(at_s, 0.5, rel_tol=1e-12)


def test_decay_guards(eng, spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import pytest as _pt
    with _pt.raises(ValueError):
        eng.search_decay(Q, "n_chars", 0.0, 100.0, shape="triangle",
                         docs=docs)
    with _pt.raises(ValueError):
        eng.search_decay(Q, "n_chars", 0.0, 100.0, decay=1.5, docs=docs)
    with _pt.raises(ValueError):
        eng.search_decay(Q, "n_chars", 0.0, -1.0, docs=docs)
    with _pt.raises(ValueError):
        eng.search_decay(Q, "nope", 0.0, 100.0, docs=docs)


def test_decay_null_attr_uses_missing(eng, spark):
    """A NULL attribute must multiply by `missing`, not by 1 (greatest()
    swallows NULLs — regression pin for the explicit CASE)."""
    from pyspark.sql import functions as F

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumn("n_chars",
                        F.when(F.col("doc_id") % 2 == 0, F.col("n_chars"))))
    base = {r["doc_id"]: r["score"] for r in eng.search(Q, k=None)}
    rows = eng.search_decay(Q, "n_chars", origin=300.0, scale=150.0,
                            missing=0.25, k=None, docs=docs).collect()
    nulled = [r for r in rows if r["doc_id"] % 2 == 1]
    assert nulled
    for r in nulled:
        assert r["fv"] == 0.25
        assert r["score"] == base[r["doc_id"]] * 0.25
