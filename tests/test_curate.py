"""Curation pipeline (ops/curate.py): per-doc (keep, reason) ledger through
quality → langid → exact dedup → verified LSH near-dup removal, on a
hand-built fixture exercising every reason, plus DuckDB oracle parity and
stage-precedence semantics."""

import duckdb
import pytest

from polaris_spark.ops.curate import curate, duckdb_curate_sql

GOOD_EN = ("the quick brown fox jumps over the lazy dog and the cat is on "
           "the mat with a friend of the family")
NEAR_A = ("the small red car drives down the long road and the driver is "
          "happy with the trip to town")
NEAR_B = ("the small red car drives down the long road and the driver is "
          "happy with the trip to paris")
GERMAN = ("der die das und ist nicht ein eine mit von der die das und ist "
          "nicht ein eine mit von der die das und ist nicht ein eine mit "
          "von der die das und ist nicht ein eine mit von") * 3
JUNK = "@@@ ### !!! %%%"

DOCS = [
    (1, GOOD_EN),          # kept (min id of the {1, 4, 20} near-dup cluster)
    (2, JUNK),             # low_quality
    (3, GERMAN),           # good quality, predicted de → lang
    (4, GOOD_EN + " x"),   # near_dup (clusters with 1)
    (10, NEAR_A),          # kept (min id of the {10, 11} near-dup cluster)
    (11, NEAR_B),          # near_dup
    (20, GOOD_EN + " unique tail words here today friends"),  # near_dup of 1
    (21, GOOD_EN + " unique tail words here today friends"),  # exact_dup of 20
    (30, JUNK),            # low_quality — identical to 2 but NOT exact_dup
]


@pytest.fixture(scope="module")
def ledger(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = curate(docs).collect()
    return {r["doc_id"]: (r["keep"], r["reason"]) for r in rows}


def test_every_doc_dispositioned(ledger):
    assert set(ledger) == {d for d, _ in DOCS}
    assert all(k in (0, 1) for k, _ in ledger.values())


def test_reasons(ledger):
    assert ledger[2] == (0, "low_quality")
    assert ledger[30] == (0, "low_quality")  # precedence: never exact_dup
    assert ledger[3] == (0, "lang")
    # 21 is text-identical to 20: removed at the EXACT stage, so it never
    # reaches near-dup; 20 then falls into 1's cluster as its sole survivor
    assert ledger[21] == (0, "exact_dup")
    assert ledger[20] == (0, "near_dup")
    assert ledger[4] == (0, "near_dup")
    assert ledger[1] == (1, "kept")
    assert ledger[11] == (0, "near_dup")
    assert ledger[10] == (1, "kept")


def test_oracle_parity(spark, ledger):
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    want = {r[0]: (r[1], r[2])
            for r in con.execute(duckdb_curate_sql(table="fixture")).fetchall()}
    assert ledger == want


def test_sf_corpus_parity(spark):
    """Full sf0.001 corpus through both sides — the gate rehearsal."""
    import os

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in curate(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    want = {r[0]: (r[1], r[2])
            for r in con.execute(duckdb_curate_sql()).fetchall()}
    assert got == want
    assert len(got) == docs.count()


def test_gopher_stage_parity_and_precedence(spark):
    """Opt-in Gopher rule stage (reason 'gopher', after decontam / before
    the quality score): oracle parity on the fixture, and precedence —
    a doc failing BOTH gopher and quality reads 'gopher'."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in curate(docs, gopher=True, gopher_min_words=5).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    want = {r[0]: (r[1], r[2])
            for r in con.execute(duckdb_curate_sql(
                table="fixture", gopher=True,
                gopher_min_words=5)).fetchall()}
    assert got == want
    # JUNK fails the alpha-word rule (and quality): gopher wins precedence
    assert got[2] == (0, "gopher")
    # default (gopher=False) ledger is unchanged by the new parameter
    base = {r["doc_id"]: (r["keep"], r["reason"])
            for r in curate(docs).collect()}
    assert base[2] == (0, "low_quality")
