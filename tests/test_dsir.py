"""DSIR importance weights (Xie et al. 2023): hand-checked math on a tiny
fixture, direction property (target-like docs up-weighted), oracle parity,
and composition with the percentile filter for the resampling step."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.text import dsir_logweights, duckdb_dsir_sql

# target-ish docs talk about cats; raw adds dog docs. Feature space =
# unigrams + bigrams of lowercased whitespace tokens.
DOCS = [
    (1, "cat sat", "t"),
    (2, "cat ran", "t"),
    (3, "dog ran", "r"),
    (4, "", "r"),
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, grp string")
    return df, df.where("grp = 't'")


def test_hand_computed_weights(spark, frames):
    """Recompute the exact spec in python (bucket collisions included via
    the same md5 bucketing) and compare logw_e6 bit-for-bit."""
    import hashlib

    raw, target = frames
    B = 10_000

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    def feats(text):
        t = text.lower().split()
        return [bucket(g) for g in t + [f"{a} {b}" for a, b in zip(t, t[1:])]]

    tb, rb = {}, {}
    for did, text, grp in DOCS:
        for b in feats(text):
            rb[b] = rb.get(b, 0) + 1
            if grp == "t":
                tb[b] = tb.get(b, 0) + 1
    tsum, rsum = sum(tb.values()), sum(rb.values())
    want = {}
    for did, text, _g in DOCS:
        fs = feats(text)
        lw = sum(
            math.log((tb.get(b, 0) + 1.0) / (tsum + B))
            - math.log((rb[b] + 1.0) / (rsum + B)) for b in fs)
        want[did] = (len(fs), round(lw * 1e6))
    got = {r["doc_id"]: (r["n_feats"], r["logw_e6"])
           for r in dsir_logweights(raw, target, buckets=B).collect()}
    assert got == want
    # direction: the pure-target docs outweigh the raw-only dog doc
    assert min(got[1][1], got[2][1]) > got[3][1]
    # featureless doc: weight 1 -> logw 0
    assert got[4] == (0, 0)


def test_oracle_parity_fixture(spark, frames):
    raw, target = frames
    got = sorted(tuple(r) for r in
                 dsir_logweights(raw, target).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fx (doc_id BIGINT, text VARCHAR, grp VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_dsir_sql("fx", "doc_id", "text",
                        target_where="grp = 't'")).fetchall())
    assert got == want


def test_resampling_composition(spark, frames):
    """The paper's selection step: top-weight resampling = the existing
    percentile filter over logw_e6 (score_col path)."""
    from polaris_spark.ops.text import quality_percentile_filter

    raw, target = frames
    w = dsir_logweights(raw, target)
    led = quality_percentile_filter(
        raw.join(w, "doc_id").withColumn("all", F.lit("all")),
        keep_frac=0.5, by="all", score_col="logw_e6")
    kept = {r["doc_id"] for r in led.where(F.col("kept") == 1).collect()}
    assert kept  # non-empty selection
    # every kept doc outweighs every cut doc
    scores = {r["doc_id"]: r["logw_e6"] for r in w.collect()}
    cut = set(scores) - kept
    assert min(scores[k] for k in kept) >= max(scores[c] for c in cut)


def test_gumbel_select_determinism_and_oracle(spark, frames):
    """Gumbel-top-k resampling: deterministic (same seed -> same set),
    exactly k kept, seed changes the set (on a corpus large enough to
    see it), oracle parity on the sf0.001 corpus."""
    from polaris_spark.ops.text import (dsir_gumbel_select,
                                        duckdb_dsir_gumbel_sql)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = dsir_logweights(docs, docs.where("lang = 'en'"))
    a = dsir_gumbel_select(w, k=50, seed=1).collect()
    assert sum(r["kept"] for r in a) == 50
    b = {r["doc_id"]: r["kept"] for r in
         dsir_gumbel_select(w, k=50, seed=1).collect()}
    assert all(b[r["doc_id"]] == r["kept"] for r in a)  # rerun-identical
    c = {r["doc_id"] for r in dsir_gumbel_select(w, k=50, seed=2).collect()
         if r["kept"]}
    assert c != {r["doc_id"] for r in a if r["kept"]}  # seed matters

    got = sorted(tuple(r) for r in
                 dsir_gumbel_select(w, k=50, seed=1).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(duckdb_dsir_gumbel_sql(
        k=50, seed=1)).fetchall())
    assert got == want
