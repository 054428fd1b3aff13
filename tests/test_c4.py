"""C4 cleanup rules (Raffel et al. 2020 §2.2): hand-built fixtures hitting
each rule, golden expectations, and DuckDB mirror parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.text import c4_cols, duckdb_c4_sql

DOCS = [
    # 1: clean 3-sentence page, every line survives
    (1, "This is a fine first sentence here.\n"
        'And a "quoted" second one, also long enough!\n'
        "Is the third line a question with enough words?"),
    # 2: line-level cuts: no terminal punct / too short / javascript
    (2, "this line has plenty of words but no terminal punct\n"
        "Too short.\n"
        "Please enable JavaScript to view the comments powered by widgets.\n"
        "Only this very line survives the filter, with punctuation."),
    # 3: page-level discards: lorem ipsum and a code brace
    (3, "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed.\n"
        "function f() { return this long enough line of code here. }"),
    # 4: fewer than 3 sentences after cleaning -> fails the page rule
    (4, "Just one kept sentence that is long enough to survive."),
    # 5: empty page
    (5, ""),
]


@pytest.fixture(scope="module")
def c4(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = df.select("doc_id", *c4_cols(F.col("text"))).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_line_filter_and_page_rules(c4):
    # doc 1: all 3 lines kept, 4 terminators (., !, ?, and the , stays
    # out) -> actually '.', '!', '?' = 3 sentences -> pass
    assert c4[1]["c4_n_lines_kept"] == 3
    assert c4[1]["c4_n_sentences"] == 3
    assert c4[1]["c4_pass"] == 1
    # doc 2: only the final line survives (punct + >=5 words, no js)
    assert c4[2]["c4_n_lines_kept"] == 1
    assert c4[2]["c4_clean_text"].startswith("Only this very line")
    assert c4[2]["c4_pass"] == 0  # 1 sentence < 3
    # doc 3: lorem + brace discards fire regardless of line survival
    assert c4[3]["c4_has_lorem"] == 1 and c4[3]["c4_has_brace"] == 1
    assert c4[3]["c4_pass"] == 0
    # doc 4: clean but under the 3-sentence page rule
    assert c4[4]["c4_n_lines_kept"] == 1 and c4[4]["c4_pass"] == 0
    # doc 5: empty -> everything zero, fails
    assert c4[5]["c4_clean_text"] == "" and c4[5]["c4_pass"] == 0


def test_bad_words_rule(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", *c4_cols(F.col("text"), bad_words=("quoted",))).collect()}
    # the blocklist counts WORDS, so the "quoted" token (with quotes
    # attached) does not hit; a bare word does
    df2 = spark.createDataFrame([(9, "This has one banned word here ok.")],
                                "doc_id long, text string")
    hit = df2.select(*c4_cols(F.col("text"), bad_words=("banned",))).collect()[0]
    assert hit["c4_bad_word_hits"] == 1 and hit["c4_pass"] == 0
    assert rows[1]["c4_bad_word_hits"] == 0


def test_duckdb_parity(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 df.select("doc_id", *c4_cols(F.col("text"))).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fx (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(
        f"SELECT doc_id, {duckdb_c4_sql('text')} FROM fx").fetchall())
    assert got == want
    # and with a blocklist
    got2 = sorted(tuple(r) for r in df.select(
        "doc_id", *c4_cols(F.col("text"), bad_words=("banned", "Quoted"))
    ).collect())
    want2 = sorted(tuple(r) for r in con.execute(
        f"SELECT doc_id, "
        f"{duckdb_c4_sql('text', bad_words=('banned', 'Quoted'))} FROM fx"
    ).fetchall())
    assert got2 == want2
