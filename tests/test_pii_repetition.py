"""PII scan/redaction and repetition quality signals: hand-checked
semantics plus DuckDB mirror parity on a PII-bearing corpus (the driver
gate corpus is PII-free, so the oracle parity for pii lives here)."""

import duckdb
import pytest

from polaris_spark.ops.text import (duckdb_pii_sql, duckdb_repetition_sql,
                                    pii_cols, repetition_cols)

DOCS = [
    (1, "contact me at jane.doe+x@example.org or admin@sub.host.net soon"),
    (2, "server at 10.0.255.3 and 192.168.1.77 responded"),
    (3, "call +1 555-123-4567 or 0800 123 456 78 now"),
    (4, "no pii here just words words words"),
    (5, "mixed: bob@x.io from 8.8.8.8 dialed 555-867-5309-001"),
    (6, ""),
    (7, "a b a b a b a b"),          # heavy 2-gram repetition
    (8, "x x x x x x x x x x"),      # one token dominates
    (9, "all distinct tokens in this sentence"),
    (10, "version 1.2.3.4 of lib"),  # looks like an IPv4 (documented)
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    return c


def test_pii_counts_and_redaction(spark, df):
    from pyspark.sql import functions as F

    rows = {r["doc_id"]: r for r in
            df.select("doc_id", *pii_cols(F.col("text"))).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (2, 0, 0)
    assert "<EMAIL>" in rows[1]["redacted"] and "@" not in rows[1]["redacted"]
    assert rows[2]["n_ipv4"] == 2 and "<IPV4>" in rows[2]["redacted"]
    assert rows[3]["n_phone"] == 2 and "<PHONE>" in rows[3]["redacted"]
    assert (rows[5]["n_email"], rows[5]["n_ipv4"], rows[5]["n_phone"]) == (1, 1, 1)
    assert (rows[4]["n_email"], rows[4]["n_ipv4"], rows[4]["n_phone"]) == (0, 0, 0)
    assert rows[4]["redacted"] == DOCS[3][1]
    assert rows[6]["redacted"] == ""
    # documented limitation: dotted version strings match the IPv4 shape
    assert rows[10]["n_ipv4"] == 1


def test_pii_duckdb_parity(spark, df, con):
    from pyspark.sql import functions as F

    got = sorted(tuple(r) for r in
                 df.select("doc_id", *pii_cols(F.col("text"))).collect())
    want = sorted(map(tuple, con.execute(
        f"SELECT doc_id, {duckdb_pii_sql('text')} FROM docs").fetchall()))
    assert got == want


def test_repetition_semantics(spark, df):
    from pyspark.sql import functions as F

    rows = {r["doc_id"]: r for r in
            df.select("doc_id", *repetition_cols(F.col("text"))).collect()}
    # 'a b a b a b a b': 7 bigrams, 2 distinct → dup frac 5/7
    assert abs(rows[7]["dup_ngram_frac"] - 5 / 7) < 1e-12
    assert abs(rows[7]["top_token_frac"] - 0.5) < 1e-12
    # single repeated token: 9 bigrams all equal → 8/9; top share 1.0
    assert abs(rows[8]["dup_ngram_frac"] - 8 / 9) < 1e-12
    assert rows[8]["top_token_frac"] == 1.0
    # all-distinct sentence: no repeats, top share 1/6
    assert rows[9]["dup_ngram_frac"] == 0.0
    assert abs(rows[9]["top_token_frac"] - 1 / 6) < 1e-12
    # empty doc reports zeros
    assert rows[6]["dup_ngram_frac"] == 0.0
    assert rows[6]["top_token_frac"] == 0.0


def test_repetition_duckdb_parity(spark, df, con):
    from pyspark.sql import functions as F

    got = sorted((r[0], round(r[1], 12), round(r[2], 12)) for r in
                 df.select("doc_id", *repetition_cols(F.col("text"))).collect())
    want = sorted((r[0], round(r[1], 12), round(r[2], 12)) for r in con.execute(
        f"SELECT doc_id, {duckdb_repetition_sql('text')} FROM docs").fetchall())
    assert got == want
