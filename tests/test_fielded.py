"""Fielded (multi-field) search — the reference's MultiFieldQueryParser
analog: field values indexed as '<col>:<token>' terms in the same unified
token stream (one dl universe), query accepts Lucene-classic field:value
syntax (reference sourcedb/SourceDbImpl.java:131-137 parses over
{Project, Path, SourceText}; our fields: e.g. tool, role)."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize

DOCS = [
    (1, "error parsing the file", "assistant", "read_file"),
    (2, "searching the web for error", "assistant", "web.search"),
    (3, "another web result", "tool", "web.search"),
    (4, "plain chat turn", "user", ""),
]


@pytest.fixture(scope="module")
def feng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fielded_idx"))
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, role string, tool string"
    )
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                field_cols=("role", "tool")))
    return SearchEngine(spark, d)


def test_field_term_parsing(feng):
    assert feng.query_terms("tool:web.search") == [
        "tool:search", "tool:web", "tool:web.search"
    ]
    # unknown field prefix falls back to plain tokenization of the chunk
    assert feng.query_terms("bogus:x") == ["bogus", "x"]


def test_field_scoped_match(feng):
    hits = feng.search("tool:web.search", k=10)
    assert {h["doc_id"] for h in hits} == {2, 3}
    hits = feng.search("role:user", k=10)
    assert [h["doc_id"] for h in hits] == [4]


def test_mixed_query_ranks_both_fields(feng):
    # "error" matches docs 1,2 in text; tool:web.search matches 2,3 →
    # doc 2 matches both terms groups and must rank first
    hits = feng.search("error tool:web.search", k=10)
    assert hits[0]["doc_id"] == 2
    assert {h["doc_id"] for h in hits} == {1, 2, 3}


def test_dl_includes_field_tokens(feng):
    import os

    ds = {r["doc_id"]: r["dl"] for r in
          feng.spark.read.parquet(os.path.join(feng.index_dir, "doc_stats")).collect()}
    # doc 1: text 4 toks + role:assistant 1 + tool:read_file (base + 2 subs) 3
    expect1 = len(tokenize(DOCS[0][1])) + 1 + len(tokenize("read_file"))
    assert ds[1] == expect1
    # doc 4: empty tool contributes nothing
    assert ds[4] == len(tokenize(DOCS[3][1])) + 1


def test_distributed_parity(feng):
    a = feng.search("error tool:web.search", k=10)
    b = [r.asDict() for r in feng.search_df("error tool:web.search", k=10).collect()]
    assert [(x["doc_id"], x["score"]) for x in a] == [(x["doc_id"], x["score"]) for x in b]


def test_fielded_with_positions(spark, tmp_path_factory):
    """positions=True + field_cols compose: field tokens sit on fresh slots
    AFTER the text's base slots, so phrases never cross into field terms,
    while field:value and phrase queries both work on one index."""
    from polaris_spark.index.build import IndexConfig, build_index

    d = str(tmp_path_factory.mktemp("fieldpos_idx"))
    docs = spark.createDataFrame(
        [(1, "searching the web", "assistant", "web.search"),
         (2, "web searching again", "tool", "web.search")],
        "doc_id long, text string, role string, tool string",
    )
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                positions=True, field_cols=("role", "tool")))
    eng = SearchEngine(spark, d)
    # phrase over text works
    assert [h["doc_id"] for h in eng.search_phrase("searching the web")] == [1]
    # the text's trailing word is NOT phrase-adjacent to a field token
    assert eng.search_phrase("web assistant") == []
    # fielded term search works on the same index
    assert {h["doc_id"] for h in eng.search("tool:web.search", k=10)} == {1, 2}
    # field token positions exist, on slots after the text
    occ = {o["doc_id"]: o["positions"]
           for o in eng.lookup_positions("role:assistant")}
    assert occ[1] == [3]  # text has base slots 0..2


def test_expand_fields_multifield_or(feng):
    """expand_fields=True: bare tokens also rank via each field column (the
    reference's default multi-field OR, SourceDbImpl.java:42-46); driver and
    distributed paths agree; explicit field:value chunks never re-expand."""
    plain = {h["doc_id"]: h["score"] for h in feng.search("assistant", k=None)}
    multi = {h["doc_id"]: h["score"]
             for h in feng.search("assistant", k=None, expand_fields=True)}
    # 'assistant' appears only as a role VALUE → invisible bare, hit expanded
    assert not plain and set(multi) == {1, 2}
    dist = {r["doc_id"]: r["score"]
            for r in feng.search_df("assistant", k=None,
                                    expand_fields=True).collect()}
    assert multi == dist
    # a token present in BOTH text and a field scores both contributions
    t_only = {h["doc_id"]: h["score"] for h in feng.search("web", k=None)}
    both = {h["doc_id"]: h["score"]
            for h in feng.search("web", k=None, expand_fields=True)}
    assert set(t_only) <= set(both)
    assert all(both[d] >= t_only[d] for d in t_only)
    # parse semantics
    inc, _ = feng.parse_query("role:assistant", expand_fields=True)
    assert inc == ["role:assistant"]
    inc2, _ = feng.parse_query("assistant", expand_fields=True)
    assert set(inc2) == {"assistant", "role:assistant", "tool:assistant"}


# ----------------------------------------------- classic field groups f:(...)

def _bids(hits):
    return {h["doc_id"] for h in hits}


def test_field_group_semantics(feng):
    """Classic ``f:(a OR b)`` groups (MultiFieldQueryParser surface,
    reference SourceDbImpl.java:135-139): the field scopes every bare leaf
    inside the group; explicit inner fields win; unknown group fields fall
    back to bare resolution (same policy as unknown ``field:`` prefixes)."""
    assert _bids(feng.search_bool("tool:(web.search OR read_file)",
                                  k=None)) == {1, 2, 3}
    assert _bids(feng.search_bool("role:(user OR tool)", k=None)) == {3, 4}
    # explicit inner field wins over the group scope
    assert _bids(feng.search_bool("role:(user tool:web.search)",
                                  k=None)) == {2, 3, 4}
    # prefix / wildcard / range leaves inherit the scope
    assert _bids(feng.search_bool("tool:(web* OR zzz)", k=None)) == {2, 3}
    assert _bids(feng.search_bool("tool:(w?b)", k=None)) == {2, 3}
    assert _bids(feng.search_bool("role:([assistant TO tool])",
                                  k=None)) == {1, 2, 3}
    # unknown group field → leaves resolve bare
    assert _bids(feng.search_bool("bogus:(error)", k=None)) == {1, 2}
    # group composes with the boolean tree
    assert _bids(feng.search_bool("role:(assistant) AND error -tool:read_file",
                                  k=None)) == {2}
    # fuzzy inside a field group now scopes like every other leaf kind
    # (round-3 late: field-qualified fuzzy — was a documented rejection)
    assert _bids(feng.search_bool("tool:(web~1)", k=None)) == {2, 3}


def test_field_group_driver_distributed_parity(feng):
    for q in ["tool:(web.search OR read_file)",
              "role:(user tool:web.search)",
              "tool:(web* OR zzz) AND error",
              "role:([assistant TO tool]) -tool:read_file"]:
        a = [(h["doc_id"], h["score"], h["n_match"])
             for h in feng.search_bool(q, k=None)]
        b = [(r["doc_id"], r["score"], r["n_match"])
             for r in feng.search_bool_df(q, k=None).collect()]
        assert a == b, q


def test_field_group_oracle_parity(feng):
    import duckdb

    from polaris_spark.gate import bool_scores_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fixture (doc_id BIGINT, text VARCHAR, role VARCHAR, "
        "tool VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?, ?, ?)", DOCS)
    for q in ["tool:(web.search OR read_file)",
              "role:(user OR tool)",
              "role:(user tool:web.search)",
              "tool:(web* OR zzz)",
              "tool:(w?b)",
              "role:([assistant TO tool])",
              "bogus:(error)",
              "role:(assistant) AND error -tool:read_file"]:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in feng.search_bool(q, k=None)}
        want = set(con.execute(
            bool_scores_sql(q, table="fixture",
                            field_cols=("role", "tool"))).fetchall())
        assert got == want, q


def test_field_qualified_fuzzy(feng):
    """Classic ``field:term~N`` (Lucene ``title:roam~2``): the fuzzy head
    expands WITHIN the named field's term space; bare fuzzy never reaches
    field terms (ADVICE r2 #4 rule preserved); unknown fields degrade to a
    bare body expansion; field groups scope fuzzy leaves."""
    # role vocab: assistant, tool, user. 'rol:use~1' -> role:user
    assert feng._expand_fuzzy("role:use", 1) == ["role:user"]
    assert {h["doc_id"] for h in feng.search("role:use~1", k=None)} == {4}
    # bare fuzzy must NOT expand into field terms: 'use~1' has no bare
    # dictionary term within 1 edit ('user' IS a field token only here,
    # but 'user' never appears in text) -> no role:user leak
    assert all(not t.startswith("role:")
               for t in feng._expand_fuzzy("use", 1))
    # unknown field falls back to a bare body expansion
    assert feng._expand_fuzzy("bogus:erron", 1) == \
        feng._expand_fuzzy("erron", 1)
    # inside a boolean tree + field group scope
    got = {h["doc_id"] for h in feng.search_bool("role:(use~1) AND chat",
                                                 k=None)}
    assert got == {4}
    # driver == distributed == oracle
    import duckdb

    from polaris_spark.gate import bm25_scores_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE fx (doc_id BIGINT, text VARCHAR, "
                "role VARCHAR, tool VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?, ?, ?)", DOCS)
    for q in ["role:use~1 error", "tool:web.searh~1"]:
        a = [(h["doc_id"], round(h["score"] * 10000))
             for h in feng.search(q, k=None)]
        b = [(r["doc_id"], r["score_e4"])
             for r in feng.search_df(q, k=None).select(
                 "doc_id", (F_round_e4())).collect()]
        want = sorted(con.execute(bm25_scores_sql(
            q, table="fx", field_cols=("role", "tool"))).fetchall())
        assert sorted(a) == want, q
        assert sorted(b) == want, q


def F_round_e4():
    from pyspark.sql import functions as F

    return F.round(F.col("score") * 10000).cast("long").alias("score_e4")
