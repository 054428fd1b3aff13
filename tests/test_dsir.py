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


def test_vocab_shift_properties_and_mirror(spark):
    """Drift monitor: identical corpora → JS exactly 0 per bucket;
    disjoint corpora → ΣJS near ln 2; counts conserve total gram mass;
    and the real-testdata split matches the DuckDB mirror row-for-row."""
    from polaris_spark.ops.text import duckdb_vocab_shift_sql, vocab_shift

    df = spark.createDataFrame(
        [(1, "cat sat here"), (2, "cat ran far")],
        "doc_id long, text string")
    same = vocab_shift(df, df, buckets=16).collect()
    assert len(same) == 16
    assert all(r["js_e9"] == 0 for r in same)
    assert all(r["p_a_e9"] == r["p_b_e9"] for r in same)

    a = spark.createDataFrame([(1, "aaa bbb aaa")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "ccc ddd eee")], "doc_id long, text string")
    dis = vocab_shift(a, b, buckets=16).collect()
    js_total = sum(r["js_e9"] for r in dis) / 1e9
    # smoothing keeps it well under ln 2 on tiny corpora (5 grams vs 16
    # buckets of add-one mass); require positive divergence + the bound
    assert 0.005 < js_total <= math.log(2) + 1e-9
    # gram-mass conservation: 'aaa bbb aaa' = 3 unigrams + 2 bigrams
    assert sum(r["c_a"] for r in dis) == 5
    assert sum(r["c_b"] for r in dis) == 5

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(map(tuple, vocab_shift(
        docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1"),
        buckets=64).collect()))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    exp = sorted(map(tuple, con.execute(
        duckdb_vocab_shift_sql(buckets=64)).fetchall()))
    assert got == exp
