"""Tokenizer goldens (FIXTURES.md §2) + cross-implementation equality.

The spec mirrors the reference analyzer's effective behavior (Lucene 4.3
StandardTokenizer, no lowercase/stop filters — reference
indexing/analysis/SourceCodeAnalyzer.java:24-31) plus the mandated code-aware
sub-token extension (the reference's unfinished TODO, TypeDbAnalyzer.java:20).
"""

import duckdb
import pytest

from polaris_spark.tokenizer import duckdb_tokens_sql, tokenize, tokens_col, tokens_udf_col

GOLDENS = [
    ("Hello WORLD", ["Hello", "WORLD"]),  # case preserved
    ("getFileHandle", ["getFileHandle", "get", "File", "Handle"]),
    ("snake_case_name", ["snake_case_name", "snake", "case", "name"]),
    ("com.company.A", ["com.company.A", "com", "company", "A"]),
    ("f(x); y=2", ["f", "x", "y", "2"]),
    ("web.search", ["web.search", "web", "search"]),
    ("", []),
    ("   ", []),
    ("... ;;; !!!", []),
    ("don't", ["don't", "don", "t"]),
    ("HTTPServer2", ["HTTPServer2", "HTTP", "Server2"]),
    ("hello", ["hello"]),
    ("Hello", ["Hello"]),  # single part: no sub-tokens
    ("end.", ["end"]),  # trailing dot dropped
    # base tokens first, then sub-tokens (documented emission order)
    ("a.b.C foo_barBaz", ["a.b.C", "foo_barBaz", "a", "b", "C", "foo", "bar", "Baz"]),
    # per spec rule (b): ([A-Z]+)([A-Z][a-z]) backtracks to "I" + "Pv4"
    ("x86_64 IPv4", ["x86_64", "IPv4", "x86", "64", "I", "Pv4"]),
]

CORPUS = [t for t, _ in GOLDENS] + [
    "The quickBrown fox_jumps over Lazy.Dog 42 times; really!",
    "SELECT * FROM t WHERE a='b' AND camelCaseCol IS NOT NULL",
    "mixed 日本語 latin",  # non-ASCII splits (not in [A-Za-z0-9_])
    None,
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_python_goldens(text, expected):
    assert tokenize(text) == expected


def test_spark_native_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "i int, text string")
    rows = df.select("i", tokens_col("text").alias("toks")).orderBy("i").collect()
    for r, text in zip(rows, CORPUS):
        assert r["toks"] == tokenize(text), f"native mismatch on {text!r}"


def test_spark_pandas_udf_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "i int, text string")
    rows = df.select("i", tokens_udf_col("text").alias("toks")).orderBy("i").collect()
    for r, text in zip(rows, CORPUS):
        assert r["toks"] == tokenize(text), f"pandas-udf mismatch on {text!r}"


def test_duckdb_sql_matches_python():
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i INT, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(CORPUS)))
    rows = con.execute(
        f"SELECT i, {duckdb_tokens_sql('text')} AS toks FROM c ORDER BY i"
    ).fetchall()
    for (_, got), text in zip(rows, CORPUS):
        assert got == tokenize(text), f"duckdb mismatch on {text!r}"
