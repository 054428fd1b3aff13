"""Substring-level dedup (maximal duplicated token spans): island merging,
thresholds, short-doc exclusion, hash-keyed scale path identity, DuckDB
oracle parity (the dup_spans gate's SQL on the same frame)."""

import duckdb
import pytest

from polaris_spark.ops.dedup import duckdb_dup_spans_sql, duplicated_spans

# tokens are single letters; doc 1 and 2 share the run "a b c d e" (5
# tokens); doc 3 shares "c d e f" with both; doc 4 is unrelated; doc 5 is
# shorter than n; doc 6 repeats doc 1 exactly.
DOCS = [
    (1, "a b c d e f g h x1 y1 z1 w1"),
    (2, "q0 a b c d e f g h q1 q2 q3"),
    (3, "r0 r1 c d e f g h r2 r3 r4 r5"),
    (4, "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9 n0 n1"),
    (5, "a b c"),
    (6, "a b c d e f g h x1 y1 z1 w1"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in df.collect()
    )


def test_maximal_spans(spark, docs_df):
    got = _rows(duplicated_spans(docs_df, n=4, min_docs=2))
    # docs 1/6 are EXACT duplicates → every 4-gram is duplicated → the
    # whole doc is one span 1..12
    # doc 2: 'a b c d'..'e f g h' at pos 2..6 → span 2..9
    # doc 3: 'c d e f g h' → 4-gram starts 3..5 → span 3..8
    assert got == [
        (1, 1, 12, 12), (2, 2, 9, 8), (3, 3, 8, 6), (6, 1, 12, 12),
    ]


def test_min_docs_threshold(spark, docs_df):
    got = _rows(duplicated_spans(docs_df, n=4, min_docs=3))
    # only the 'c d e f g h' core is in ≥3 docs ('a b c d' etc. are in 2:
    # docs 1/6 count as 2 distinct docs + doc 2 = 3 for 'a b c d'... doc
    # 1 and 6 are distinct doc_ids, so 'a b c d' has 3 distinct docs too)
    # → doc 1/2/6 spans cover the full shared run, doc 3 the core.
    assert (3, 3, 8, 6) in got
    assert all(r[0] != 4 and r[0] != 5 for r in got)


def test_hash_keyed_scale_path_identical(spark, docs_df):
    a = _rows(duplicated_spans(docs_df, n=4, min_docs=2))
    b = _rows(duplicated_spans(docs_df, n=4, min_docs=2,
                               hash_shingles=True))
    assert a == b


def test_no_false_positives(spark, docs_df):
    got = _rows(duplicated_spans(docs_df, n=9, min_docs=2))
    # the longest shared run is 8 tokens — at n=9 nothing survives except
    # the exact-duplicate pair 1/6 (12 shared tokens)
    assert got == [(1, 1, 12, 12), (6, 1, 12, 12)]


def test_duckdb_oracle_parity(spark, docs_df):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    for n, md in ((4, 2), (4, 3), (5, 2), (9, 2)):
        want = sorted(map(tuple, con.execute(
            duckdb_dup_spans_sql("documents", "doc_id", "text",
                                 n=n, min_docs=md)).fetchall()))
        got = _rows(duplicated_spans(docs_df, n=n, min_docs=md))
        assert got == want, (n, md, got, want)


def test_strip_dup_spans_cut_and_passthrough(spark, docs_df):
    """ExactSubstr removal, default policy: duplicated spans cut
    token-wise with NO surviving copy (cheaper than Lee et al.'s keep-one,
    which is keep_one=True below), untouched docs pass through
    token-normalized, every input doc yields one row."""
    from polaris_spark.ops.dedup import strip_dup_spans

    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_cut"])
           for r in strip_dup_spans(docs_df, n=4, min_docs=2).collect()}
    assert set(got) == {d for d, _t in DOCS}
    # docs 1/6: entire text is one duplicated span -> fully cut
    assert got[1] == ("", 12, 12) and got[6] == ("", 12, 12)
    # doc 2: span 2..9 cut, tokens 1 and 10..12 survive
    assert got[2] == ("q0 q1 q2 q3", 12, 8)
    # doc 3: span 3..8 cut
    assert got[3] == ("r0 r1 r2 r3 r4 r5", 12, 6)
    # doc 4 untouched; doc 5 shorter than n -> untouched
    assert got[4] == (DOCS[3][1], 12, 0)
    assert got[5] == ("a b c", 3, 0)


def test_strip_dup_spans_oracle_parity(spark, docs_df):
    from polaris_spark.ops.dedup import (duckdb_strip_spans_sql,
                                         strip_dup_spans)

    got = sorted(tuple(r) for r in
                 strip_dup_spans(docs_df, n=4, min_docs=2).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_strip_spans_sql("fixture", "doc_id", "text",
                               n=4, min_docs=2)).fetchall())
    assert got == want


def test_keep_one_survivor_election(spark, docs_df):
    """Lee et al.'s exact policy (keep_one=True): every duplicated n-gram's
    lexicographically-first occurrence survives. Doc 1 holds the first
    occurrence of EVERY duplicated gram in this fixture (smallest doc_id
    containing each), so it survives untouched; its exact duplicate doc 6
    is fully cut; docs whose duplicated grams are all elected elsewhere
    (2, 3) are cut the same as the default policy."""
    from polaris_spark.ops.dedup import strip_dup_spans

    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_cut"])
           for r in strip_dup_spans(docs_df, n=4, min_docs=2,
                                    keep_one=True).collect()}
    assert got[1] == (DOCS[0][1], 12, 0)        # elected copy survives
    assert got[6] == ("", 12, 12)               # its duplicate is cut
    assert got[2] == ("q0 q1 q2 q3", 12, 8)
    assert got[3] == ("r0 r1 r2 r3 r4 r5", 12, 6)
    assert got[4] == (DOCS[3][1], 12, 0)
    assert got[5] == ("a b c", 3, 0)


def test_keep_one_hash_path_identical(spark, docs_df):
    a = _rows(duplicated_spans(docs_df, n=4, min_docs=2, keep_one=True))
    b = _rows(duplicated_spans(docs_df, n=4, min_docs=2, keep_one=True,
                               hash_shingles=True))
    assert a == b


def test_keep_one_oracle_parity(spark, docs_df):
    from polaris_spark.ops.dedup import (duckdb_strip_spans_sql,
                                         strip_dup_spans)

    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    for n, md in ((4, 2), (5, 2), (4, 3)):
        got = sorted(tuple(r) for r in
                     strip_dup_spans(docs_df, n=n, min_docs=md,
                                     keep_one=True).collect())
        want = sorted(tuple(r) for r in con.execute(
            duckdb_strip_spans_sql("fixture", "doc_id", "text",
                                   n=n, min_docs=md,
                                   keep_one=True)).fetchall())
        assert got == want, (n, md)
