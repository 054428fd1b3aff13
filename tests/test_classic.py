"""Lucene ClassicSimilarity mode (the reference's DefaultSimilarity
ranking — it never calls setSimilarity): byte315 norm codec exactness,
engine scores vs an independent pure-Python reference (boost, prohibit,
AND coord, FILTER context), and the ranking-visible effect of the 8-bit
norm quantization vs BM25."""

import math

import numpy as np
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.classic import (
    NORM_DECODE,
    classic_weights,
    lucene_norm,
)
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "spark join merge"),
    (2, "spark join scan spark"),
    (3, "spark merge"),
    (4, "join merge scan"),
    (5, "spark sort"),
    (6, "merge sort scan"),
    (7, "spark join sort scan"),
    (8, "totally unrelated words"),
    (9, "spark join spark join spark join extra tokens here padding"),
]


@pytest.fixture(scope="module")
def ceng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("classic_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return SearchEngine(spark, d)


def test_byte315_known_values():
    # Lucene SmallFloat reference points: exact powers of two are
    # representable; everything else truncates toward zero
    got = lucene_norm(np.array([1, 4, 16, 64, 5, 9, 100]))
    assert list(got[:4]) == [1.0, 0.5, 0.25, 0.125]
    assert got[4] == 0.4375    # 1/sqrt(5)=0.4472.. -> 0.4375
    assert got[5] == 0.3125    # 1/3=0.3333.. -> 0.3125
    assert got[6] == 0.09375   # 0.1 -> 0.09375


def test_byte315_is_truncation_onto_decode_grid():
    """encode == 'largest decodable value <= float32 lengthNorm' for every
    doc length up to 10^6 — the exact property the DuckDB oracle mirror
    relies on (max(v) WHERE v <= f)."""
    dls = np.arange(1, 1_000_001)
    f = (1.0 / np.sqrt(dls.astype(np.float64))).astype(np.float32)
    tbl = np.sort(NORM_DECODE)
    want = tbl[np.searchsorted(tbl, f.astype(np.float64), side="right") - 1]
    assert np.array_equal(lucene_norm(dls), want)


def _ref_scores(query_terms, boosts=None, mode="or", prohibit=(),
                only=None):
    """Independent pure-Python ClassicSimilarity over DOCS."""
    texts = {d: t.split() for d, t in DOCS}
    N = len(DOCS)
    dfs = {t: sum(1 for toks in texts.values() if t in toks)
           for t in query_terms}
    dfs = {t: d for t, d in dfs.items() if d}
    w = classic_weights(dfs, N, boosts)
    out = {}
    for did, toks in texts.items():
        if any(p in toks for p in prohibit):
            continue
        if only is not None and did not in only:
            continue
        s, nm = 0.0, 0
        for t in sorted(w):
            tf = toks.count(t)
            if tf:
                s += w[t] * math.sqrt(tf) * float(
                    lucene_norm(np.array([len(toks)]))[0])
                nm += 1
        if nm and (mode != "and" or nm == len(query_terms)):
            out[did] = (s * nm / len(query_terms), nm)
    return out


def _got(df):
    return {r["doc_id"]: (r["score"], r["n_match"]) for r in df.collect()}


def test_classic_matches_reference_or(ceng):
    got = _got(ceng.search_classic_df("spark join", k=None))
    want = _ref_scores(["spark", "join"])
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == pytest.approx(want[d][0], abs=1e-12)
        assert got[d][1] == want[d][1]


def test_classic_boost_prohibit_and_mode(ceng):
    got = _got(ceng.search_classic_df("spark^2 join -scan", k=None))
    want = _ref_scores(["spark", "join"], boosts={"spark": 2.0},
                       prohibit=["scan"])
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == pytest.approx(want[d][0], abs=1e-12)
    got_and = _got(ceng.search_classic_df("spark join", k=None, mode="and"))
    want_and = _ref_scores(["spark", "join"], mode="and")
    assert set(got_and) == set(want_and)
    assert all(nm == 2 for _s, nm in got_and.values())


def test_classic_filter_context(ceng):
    """FILTER context restricts without touching scores (same contract as
    search_df): survivors carry their unfiltered classic scores."""
    unfiltered = _got(ceng.search_classic_df("spark join", k=None))
    flt = _got(ceng.search_classic_df("spark join", k=None,
                                      filter_query="merge"))
    merge_docs = {d for d, t in DOCS if "merge" in t.split()}
    assert set(flt) == set(unfiltered) & merge_docs
    for d in flt:
        assert flt[d] == unfiltered[d]


def test_norm_quantization_is_ranking_visible(ceng):
    """The 8-bit norm is SEMANTIC, not cosmetic: byte315 keeps only
    quarter-steps in [0.5, 1), so 1/sqrt(3)=0.577 and 1/sqrt(4)=0.5 both
    decode to 0.5 — docs 4/6 (dl=3) tie EXACTLY with docs 2/7 (dl=4) on a
    single-term query under classic scoring, while BM25's continuous
    length norm separates dl=3 from dl=4. A full-precision 'classic'
    would rank them apart too — replicating the quantization is what
    makes this the reference's ranking."""
    got = _got(ceng.search_classic_df("scan", k=None))
    # scan appears once each in docs 2(dl=4) 4(dl=3) 6(dl=3) 7(dl=4)
    assert lucene_norm(np.array([3]))[0] == lucene_norm(np.array([4]))[0]
    assert got[4][0] == got[6][0] == got[2][0] == got[7][0]
    bm = {r["doc_id"]: r["score"]
          for r in ceng.search_df("scan", k=None).collect()}
    assert bm[4] == bm[6] and bm[2] == bm[7]   # same dl ties under BM25
    assert bm[4] != bm[2]                      # but dl=3 beats dl=4
    # adjacent byte buckets DO separate: dl=4 (0.5) vs dl=5 (0.4375)
    assert lucene_norm(np.array([4]))[0] > lucene_norm(np.array([5]))[0]


def test_classic_top_k_order(ceng):
    full = ceng.search_classic_df("spark join", k=None).collect()
    want = sorted(full, key=lambda r: (-r["score"], r["doc_id"]))[:3]
    got = ceng.search_classic_df("spark join", k=3).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in want]
