"""Facet counts, spell-suggest, and deterministic corpus shuffle —
semantics + Spark↔DuckDB parity (the same SQL the driver gates hash).

- facet_counts: per-attribute-value counts over the FULL match set
  (Lucene facets analog), incl. prohibit-term queries.
- suggest_df: "did you mean" candidates ranked (dist, df desc, term);
  n-gram-table probe and dictionary-fallback paths must be identical.
- shuffle_rows: two-pass distributed global rank must equal the
  single-window row_number() oracle exactly, independent of input
  partitioning.
"""

import duckdb
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [
    # (doc_id, source, text) — 'query' df=3, 'quarry' df=2: both are 1 edit
    # from the misspelling 'querry', so suggest must tiebreak by df desc
    (1, "a", "query the user data"),
    (2, "a", "query data quarry"),
    (3, "b", "account data query"),
    (4, "b", "quarry stone"),
    (5, "c", "unrelated text entirely"),
    (6, "c", "user account"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("facet_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("source",)))
    return d


@pytest.fixture(scope="module")
def idx_nofuzzy(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("facet_idx_nf"))
    docs = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("source",), fuzzy=False))
    return d


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE fixture (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    c.executemany("INSERT INTO fixture VALUES (?, ?, ?)", DOCS)
    return c


# ------------------------------------------------------------------ facets

def test_facet_counts_semantics(spark, idx):
    eng = SearchEngine(spark, idx)
    # match set for 'data account' = {1,2,3} ∪ {3,6} = {1,2,3,6}
    got = {r["facet"]: r["n"]
           for r in eng.facet_counts("data account", "source").collect()}
    assert got == {"a": 2, "b": 1, "c": 1}


def test_facet_counts_with_exclusion(spark, idx):
    eng = SearchEngine(spark, idx)
    # 'data -quarry': {1,2,3} minus quarry-docs {2,4} = {1,3}
    got = {r["facet"]: r["n"]
           for r in eng.facet_counts("data -quarry", "source").collect()}
    assert got == {"a": 1, "b": 1}


def test_facet_oracle_parity(spark, idx, con):
    from polaris_spark.gate import facet_sql

    eng = SearchEngine(spark, idx)
    for q in ["data account", "data -quarry", "query", "nosuchterm"]:
        got = {(r["facet"], r["n"])
               for r in eng.facet_counts(q, "source").collect()}
        want = set(con.execute(facet_sql(q, "source", table="fixture"))
                   .fetchall())
        assert got == want, q


def test_facet_unknown_attr_raises(spark, idx):
    with pytest.raises(ValueError, match="not stored"):
        SearchEngine(spark, idx).facet_counts("data", "nope")


# ----------------------------------------------------------------- suggest

def test_suggest_ranking_and_exclusion(spark, idx):
    eng = SearchEngine(spark, idx)
    got = eng.suggest("querry", n=5, max_edits=2)
    # both are 1 edit away; 'query' (df 3) outranks 'quarry' (df 2)
    assert [s["term"] for s in got[:2]] == ["query", "quarry"]
    assert got[0] == {"term": "query", "dist": 1, "df": 3}
    # the input term itself is never suggested
    assert all(s["term"] != "querry" for s in got)
    # an exact vocab term suggests only OTHER nearby terms (never itself):
    # quarry → query is 2 edits (a→e substitute + one r deleted)
    near = eng.suggest("quarry", n=5, max_edits=2)
    assert {"term": "query", "dist": 2, "df": 3} in near
    assert all(s["term"] != "quarry" for s in near)


def test_suggest_gram_and_fallback_paths_identical(spark, idx, idx_nofuzzy):
    a = SearchEngine(spark, idx).suggest("querry", n=10, max_edits=2)
    b = SearchEngine(spark, idx_nofuzzy).suggest("querry", n=10, max_edits=2)
    assert a == b and a


def test_suggest_oracle_parity(spark, idx, con):
    from polaris_spark.gate import suggest_sql

    eng = SearchEngine(spark, idx)
    for term, me in [("querry", 2), ("quarry", 2), ("acount", 1), ("zzz", 1)]:
        got = [(s["term"], s["dist"], s["df"])
               for s in eng.suggest(term, n=5, max_edits=me)]
        want = con.execute(
            suggest_sql(term, 5, me, table="fixture")).fetchall()
        assert got == [tuple(w) for w in want], term


def test_suggest_phrase_ranking_scores_exclusion(spark, idx):
    """Whole-query correction: 'querry data' → 'query data' beats
    'quarry data' (cf 3 > 2 at equal edits); identity excluded; scores
    are exactly Σ ln(1+cf) − penalty×edits."""
    import math

    eng = SearchEngine(spark, idx)
    rows = eng.suggest_phrase("querry data", n=10, per_term=5,
                              max_edits=2).collect()
    assert rows
    sugs = [r["suggestion"] for r in rows]
    assert "querry data" not in sugs            # identity excluded
    assert sugs[0] == "query data"
    assert sugs.index("query data") < sugs.index("quarry data")
    cf = {"query": 3, "quarry": 2, "data": 3, "querry": 0}
    for r in rows:
        t1, t2 = r["suggestion"].split(" ")
        want = (math.log(1 + cf.get(t1, 0)) + math.log(1 + cf.get(t2, 0))
                - 1.0 * r["edits"])
        assert math.isclose(r["score"], want, rel_tol=1e-12), r
    # ranked by (score desc, suggestion asc)
    keys = [(-r["score"], r["suggestion"]) for r in rows]
    assert keys == sorted(keys)
    # a heavier edit penalty shifts scores down by exactly Δλ×edits
    rows5 = {r["suggestion"]: r["score"]
             for r in eng.suggest_phrase("querry data", n=10, per_term=5,
                                         max_edits=2,
                                         edit_penalty=5.0).collect()}
    for r in rows:
        assert math.isclose(rows5[r["suggestion"]],
                            r["score"] - 4.0 * r["edits"], rel_tol=1e-12)


def test_suggest_phrase_collate_and_caps(spark, idx):
    """collate=True keeps only suggestions with a conjunctive match:
    'quarry stone' matches doc 4; 'query stone' matches nothing."""
    eng = SearchEngine(spark, idx)
    col = [r["suggestion"] for r in
           eng.suggest_phrase("querry stone", n=5, per_term=5,
                              collate=True).collect()]
    assert "quarry stone" in col
    assert all(eng.search_count(s, mode="and") > 0 for s in col)
    assert "query stone" not in col
    # max_combos truncation stays deterministic and within bounds
    few = eng.suggest_phrase("querry data", n=10, per_term=5,
                             max_combos=4).collect()
    assert 0 < len(few) <= 10
    allr = {r["suggestion"]: (r["edits"], r["score"])
            for r in eng.suggest_phrase("querry data", n=100,
                                        per_term=5).collect()}
    for r in few:  # truncated output is a subset with identical scoring
        assert allr[r["suggestion"]] == (r["edits"], r["score"])
    # empty / no-token query → empty frame
    assert eng.suggest_phrase("!!! ;;;").count() == 0


def test_suggest_phrase_oracle_parity(spark, idx, con):
    from pyspark.sql import functions as F

    from polaris_spark.gate import suggest_phrase_sql

    eng = SearchEngine(spark, idx)
    got = [(r["suggestion"], r["edits"], r["score_e6"]) for r in
           eng.suggest_phrase("querry data", n=6, per_term=4, max_edits=2)
           .select("suggestion", "edits",
                   F.round(F.col("score") * 1000000).cast("long")
                   .alias("score_e6")).collect()]
    want = con.execute(suggest_phrase_sql(
        "querry", "data", n=6, per_term=4, max_edits=2,
        table="fixture")).fetchall()
    assert got == [tuple(w) for w in want] and got


# ------------------------------------------------------------ shuffle_rows

def test_shuffle_rows_contiguous_and_parity(spark):
    from polaris_spark.ops.mixing import duckdb_shuffle_sql, shuffle_rows

    n = 257
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = shuffle_rows(df, seed=5).collect()
    pos = sorted(r["shuffle_pos"] for r in out)
    assert pos == list(range(n))  # contiguous 0-based, no gaps/dups
    got = {(r["doc_id"], r["shuffle_key"], r["shuffle_pos"]) for r in out}

    con = duckdb.connect()
    con.execute("CREATE TABLE ids AS SELECT range AS doc_id FROM range(257)")
    want = set(con.execute(duckdb_shuffle_sql(seed=5, table="ids")).fetchall())
    assert got == want


def test_shuffle_rows_partitioning_invariant(spark):
    from polaris_spark.ops.mixing import shuffle_rows

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = {(r["doc_id"], r["shuffle_pos"])
         for r in shuffle_rows(df, seed=9).collect()}
    b = {(r["doc_id"], r["shuffle_pos"])
         for r in shuffle_rows(df.repartition(7), seed=9).collect()}
    c = {(r["doc_id"], r["shuffle_pos"])
         for r in shuffle_rows(df.coalesce(1), seed=9).collect()}
    assert a == b == c
