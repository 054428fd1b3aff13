"""Corpus bigram LM (CCNet perplexity-filter shape): hand-checked
probabilities, DuckDB oracle parity, pretrained-model reuse, and the
short-doc NULL contract."""

import math

import duckdb
import pytest

from polaris_spark.ops.text import duckdb_lm_sql, lm_score, train_bigram_lm

DOCS = [
    (1, "a b a"),       # bigrams (a,b), (b,a)
    (2, "b a"),         # bigram  (b,a)
    (3, "solo"),        # < 2 tokens → NULL score
    (4, ""),            # empty → NULL score
    (5, "A b"),         # lowercased: (a,b) — case folds into the counts
]
# corpus: c2(a,b)=2, c2(b,a)=2; c1(a)=2, c1(b)=2; V = {a, b, solo} = 3


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _nlp(*ps):
    return round(sum(-math.log(p) for p in ps) / len(ps) * 1e6)


def test_hand_checked_probabilities(spark, docs):
    out = {r["doc_id"]: (r["n_bigrams"], r["nlp_e6"])
           for r in lm_score(docs).collect()}
    p_ab = (2 + 1) / (2 + 3)
    p_ba = (2 + 1) / (2 + 3)
    assert out[1] == (2, _nlp(p_ab, p_ba))
    assert out[2] == (1, _nlp(p_ba))
    assert out[5] == (1, _nlp(p_ab))
    assert out[3] == (0, None) and out[4] == (0, None)


def test_oracle_parity(spark, docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    got = {(r["doc_id"], r["n_bigrams"], r["nlp_e6"])
           for r in lm_score(docs).collect()}
    want = set(map(tuple, con.execute(duckdb_lm_sql("fixture")).fetchall()))
    assert got == want


def test_pretrained_model_reuse(spark, docs):
    """Scoring a subset with the full-corpus model must equal the
    self-scored rows — the held-out-scoring shape (train once on the
    reference corpus, score any stream against it)."""
    model = train_bigram_lm(docs)
    subset = docs.where("doc_id IN (1, 2, 3)")
    got = {r["doc_id"]: (r["n_bigrams"], r["nlp_e6"])
           for r in lm_score(subset, model=model).collect()}
    full = {r["doc_id"]: (r["n_bigrams"], r["nlp_e6"])
            for r in lm_score(docs).collect()}
    assert got == {i: full[i] for i in (1, 2, 3)}


def test_unseen_bigrams_smoothed(spark, docs):
    """A doc with bigrams the model never saw still scores (add-one
    smoothing): p = 1/(c1+V) for unseen continuation, 1/V for unseen
    prefix."""
    model = train_bigram_lm(docs)
    new = spark.createDataFrame([(9, "a zzz b")], "doc_id long, text string")
    out = lm_score(new, model=model).collect()[0]
    # (a,zzz): (0+1)/(c1(a)=2+3); (zzz,b): (0+1)/(0+3)
    assert (out["n_bigrams"], out["nlp_e6"]) == (2, _nlp(1 / 5, 1 / 3))


def test_lm_feeds_percentile_bucketing(spark, docs):
    """score_col/ascending wire lm_score into the CCNet-style per-domain
    percentile filter: lowest-nlp (most fluent) docs are kept."""
    from pyspark.sql import functions as F

    from polaris_spark.ops.text import quality_percentile_filter

    scored = (docs.join(lm_score(docs), "doc_id")
              .where(F.col("nlp_e6").isNotNull())
              .withColumn("source", F.lit("all")))
    out = quality_percentile_filter(scored, keep_frac=0.5,
                                    score_col="nlp_e6", ascending=True)
    rows = {r["doc_id"]: (r["quality"], r["kept"]) for r in out.collect()}
    by_nlp = sorted(rows, key=lambda d: (rows[d][0], d))
    n_kept = sum(k for _q, k in rows.values())
    assert 0 < n_kept < len(rows)
    # kept set = the lowest-nlp prefix of the (nlp asc, doc_id asc) order
    assert [d for d in by_nlp if rows[d][1]] == by_nlp[:n_kept]
