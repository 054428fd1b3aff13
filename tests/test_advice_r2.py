"""Regression tests for the round-2 ADVICE findings + the fuzzy n-gram table.

1. The serving term-LRU is safe under concurrent requests (the bookkeeping
   races the advisor flagged: evict-between-check-and-pop KeyError, corrupt
   LRU order) — hammer one engine from many threads, results stay identical.
2. HadoopFS.rename overwrites atomically via FileContext(OVERWRITE) on
   stores that bind one (exercised over file://) — destination present and
   swapped, no failure when it already exists.
3. The DuckDB oracle's exclusion clause sees expand_fields: a negated bare
   chunk on a fielded index excludes the field-expanded tokens in BOTH
   engines.
4. Bare wildcard/fuzzy terms never expand into 'field:token' index terms
   (Lucene confines multi-term expansion to one field); field-qualified
   prefixes still expand within their field.
5. fuzzy_ngrams/ expansion table: probe plan shows pushed gram/g1 filters,
   and the gram path returns exactly the same expansion set as the
   length-banded dictionary-scan fallback.
"""

import os
import threading

import duckdb
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

FDOCS = [
    (1, "alpha sat on the mat", "srcA", "en"),
    (2, "beta langen words here", "srcB", "de"),
    (3, "gamma alpha text", "srcA", "en"),
    (4, "plain satellite text", "srcC", "fr"),
]


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("advice2_fidx"))
    docs = spark.createDataFrame(FDOCS, "doc_id long, text string, source string, lang string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                field_cols=("source", "lang")))
    return d


# ------------------------------------------------- 1. concurrent LRU safety

def test_lru_concurrent_requests_safe(spark, fidx):
    eng = SearchEngine(spark, fidx, cache_terms=2)  # tiny → constant eviction
    want = {q: SearchEngine(spark, fidx).search(q, k=10)
            for q in ["alpha text", "beta words", "satellite alpha", "mat sat"]}
    errors: list = []

    def hammer(q):
        try:
            for _ in range(15):
                got = eng.search(q, k=10)
                assert got == want[q]
        except Exception as e:  # pragma: no cover - failure path
            errors.append((q, repr(e)))

    threads = [threading.Thread(target=hammer, args=(q,)) for q in want for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


# ----------------------------------------- 2. overwriting FileContext rename

def test_hadoopfs_rename_overwrites(spark, tmp_path):
    from polaris_spark.fs import HadoopFS, get_fs

    base = f"file://{tmp_path}"
    fs = get_fs(spark, base)
    assert isinstance(fs, HadoopFS)
    assert fs._fc is not None  # LocalFileSystem binds a FileContext
    fs.write_text_atomic(f"{base}/target.json", "v1")
    # second atomic write renames over the EXISTING target
    fs.write_text_atomic(f"{base}/target.json", "v2")
    assert fs.read_text(f"{base}/target.json") == "v2"
    # plain rename over an existing destination also overwrites
    fs.write_text_atomic(f"{base}/src.json", "v3")
    fs.rename(f"{base}/src.json", f"{base}/target.json")
    assert fs.read_text(f"{base}/target.json") == "v3"
    assert not fs.exists(f"{base}/src.json")


# ------------------------------- 3. oracle exclusion sees expand_fields

def test_exclusion_expand_fields_oracle_parity(spark, fidx):
    from polaris_spark.gate import bm25_scores_sql

    eng = SearchEngine(spark, fidx)
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR, source VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?, ?, ?)", FDOCS)
    # '-en' with expand_fields also excludes lang:en docs (1 and 3)
    q = "text -en"
    got = {(h["doc_id"], round(h["score"] * 10000))
           for h in eng.search(q, k=None, expand_fields=True)}
    assert {d for d, _ in got} == {4}
    want = set(con.execute(
        bm25_scores_sql(q, table="fixture", field_cols=("source", "lang"),
                        expand_fields=True)
    ).fetchall())
    assert got == want


# ------------------------- 4. bare expansion confined to unfielded terms

def test_bare_expansion_skips_field_terms(spark, fidx):
    from polaris_spark.gate import bm25_scores_sql

    eng = SearchEngine(spark, fidx)
    # bare 's*': text terms only (sat, satellite) — never source:srca etc.
    inc, _ = eng.parse_query("s*")
    assert inc and all(":" not in t for t in inc)
    assert set(inc) == {"sat", "satellite"}
    # field-qualified prefix expands within the field's term space
    # (case-preserving tokenizer: srcA → srcA + camel sub-token src)
    inc2, _ = eng.parse_query("source:src*")
    assert set(inc2) == {"source:src", "source:srcA", "source:srcB",
                         "source:srcC"}
    # bare fuzzy: 'langen'~1 is 1 edit from the INDEX term 'lang:en' but must
    # not expand into it (field term); it still matches the text token
    inc3, _ = eng.parse_query("langen~1")
    assert inc3 == ["langen"]
    # oracle parity on both
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR, source VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?, ?, ?)", FDOCS)
    for q in ["s*", "source:src*", "langen~1 alpha"]:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in eng.search(q, k=None)}
        want = set(con.execute(
            bm25_scores_sql(q, table="fixture", field_cols=("source", "lang"))
        ).fetchall())
        assert got == want, q


# --------------------------------------- 5. fuzzy n-gram expansion table

def test_fuzzy_gram_table_pushdown_and_parity(spark, tmp_path_factory):
    docs = [(i, t) for i, t in enumerate(
        ["spark sparse sparrow", "spark spark spam", "sprain spear sharp",
         "shark stark spork", "plain unrelated words"], start=1)]
    d = str(tmp_path_factory.mktemp("fuzzy_gram_idx"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    build_index(spark, df, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    assert os.path.exists(os.path.join(d, "fuzzy_ngrams"))
    eng = SearchEngine(spark, d)

    # plan evidence: the gram probe pushes gram IN (...) and prunes g1= dirs
    plan = eng._fuzzy_gram_candidates("spark", 1)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "gram" in plan
    assert "g1" in plan

    # gram path ≡ length-banded fallback, for every edit distance that takes
    # the gram path ((len-1) - 2*edits >= 1)
    for term, me in [("spark", 1), ("sparrow", 2), ("stark", 1)]:
        got = eng._expand_fuzzy(term, me)
        import shutil
        # fallback comparison: temporarily point at a copy without the table
        d2 = d + f"_nofz_{term}{me}"
        if not os.path.exists(d2):
            shutil.copytree(d, d2)
            shutil.rmtree(os.path.join(d2, "fuzzy_ngrams"))
        eng2 = SearchEngine(spark, d2)
        assert got == eng2._expand_fuzzy(term, me), (term, me)

    # short term / big edit distance: falls back internally, still correct
    inc, _, _ = eng.parse_query_boosts("spam~2")
    assert "spark" in inc and "spam" in inc
