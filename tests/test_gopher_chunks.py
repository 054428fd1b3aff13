"""Edge cases for the Gopher rule filter and context-window chunking.

Hand-computed goldens (not oracle-derived): bullet/ellipsis line ratios,
symbol counting, required-word hits, pass-flag threshold boundaries; chunk
arithmetic at exact-fit, one-over, short-doc and empty-doc boundaries.
"""

import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.text import chunk_windows, gopher_cols

GDOCS = [
    # 1: clean English prose, 12 words, all alpha, no symbols -> passes
    #    every rule except the paper's 50-word floor
    (1, "the quick brown fox jumps over the lazy dog to be seen"),
    # 2: bullet list — 3 of 4 lines start with a bullet (0.75)
    (2, "intro line\n- first item\n* second item\n• third item"),
    # 3: ellipsis-heavy — both lines end with '...' / '…' (ratio 1.0),
    #    and '...' also counts toward symbol_ratio (2 of them, 6 words)
    (3, "to be continued...\nand more…"),
    # 4: hash-heavy markdown — 4 '#' over 4 words -> symbol_ratio 1.0
    (4, "## header ## another"),
    # 5: numeric-only words -> frac_alpha_words 0
    (5, "123 456 789"),
    # 6: empty text
    (6, ""),
]


@pytest.fixture(scope="module")
def gdf(spark):
    df = spark.createDataFrame(GDOCS, "doc_id long, text string")
    rows = df.select("doc_id", *gopher_cols(F.col("text"), min_words=5)).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_word_and_stop_counts(gdf):
    assert gdf[1]["n_words"] == 12
    # 'the' (x2 -> counts once), 'to', 'be' present; 'of'/'and'/... absent
    assert gdf[1]["stop_hits"] == 3
    assert gdf[1]["frac_alpha_words"] == 1.0
    assert gdf[1]["symbol_ratio"] == 0.0
    assert gdf[1]["gopher_pass"] == 1


def test_bullet_ratio(gdf):
    assert gdf[2]["bullet_ratio"] == 0.75
    # 0.75 < 0.9 bullet bar; the bullet chars themselves are words too:
    # intro line - first item * second item • third item = 11 words
    assert gdf[2]["n_words"] == 11


def test_ellipsis(gdf):
    assert gdf[3]["ellipsis_line_ratio"] == 1.0  # both lines
    # one literal '...' over 5 words (to be continued... and more…);
    # the '…' is a single char, not three dots
    assert gdf[3]["symbol_ratio"] == round(1 / 5, 4)
    assert gdf[3]["gopher_pass"] == 0  # fails ellipsis rule (1.0 >= 0.3)


def test_symbols_and_alpha(gdf):
    assert gdf[4]["symbol_ratio"] == 1.0  # 4 hashes / 4 words
    assert gdf[4]["gopher_pass"] == 0
    assert gdf[5]["frac_alpha_words"] == 0.0
    assert gdf[5]["gopher_pass"] == 0


def test_empty_doc(gdf):
    assert gdf[6]["n_words"] == 0
    assert gdf[6]["mean_word_len"] == 0.0
    assert gdf[6]["gopher_pass"] == 0


CDOCS = [
    (1, " ".join(f"t{i}" for i in range(1, 11))),  # 10 tokens
    (2, " ".join(f"t{i}" for i in range(1, 12))),  # 11 tokens
    (3, "a b c"),                                   # 3 tokens  (<= size)
    (4, "solo"),                                    # 1 token
    (5, ""),                                        # dropped
]


@pytest.fixture(scope="module")
def cdf(spark):
    df = spark.createDataFrame(CDOCS, "doc_id long, text string")
    rows = chunk_windows(df, size=4, stride=3).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["n_tokens"], r["chunk_text"]))
    return {k: sorted(v) for k, v in out.items()}


def test_exact_cover(cdf):
    # 10 tokens, size 4, stride 3 -> starts 1,4,7; last chunk full
    assert cdf[1] == [
        (0, 1, 4, "t1 t2 t3 t4"),
        (1, 4, 4, "t4 t5 t6 t7"),
        (2, 7, 4, "t7 t8 t9 t10"),
    ]


def test_short_tail(cdf):
    # 11 tokens -> extra window of 2 tokens at start 10
    assert cdf[2][-1] == (3, 10, 2, "t10 t11")
    assert len(cdf[2]) == 4


def test_single_window_and_drop(cdf):
    assert cdf[3] == [(0, 1, 3, "a b c")]
    assert cdf[4] == [(0, 1, 1, "solo")]
    assert 5 not in cdf  # zero-token doc dropped


def test_every_token_covered(spark):
    df = spark.createDataFrame(CDOCS[:2], "doc_id long, text string")
    ch = chunk_windows(df, size=4, stride=3)
    covered = (ch.select("doc_id", F.explode(
        F.sequence("chunk_start", F.col("chunk_start") + F.col("n_tokens") - 1)
    ).alias("pos")).distinct().groupBy("doc_id").count().collect())
    got = {r["doc_id"]: r["count"] for r in covered}
    assert got == {1: 10, 2: 11}
