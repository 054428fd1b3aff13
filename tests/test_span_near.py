"""SpanNearQuery (Lucene spans.SpanNearQuery analog) — reference context:
the span family is API-only in the reference's Lucene 4.3 (no classic-
parser syntax), used for proximity constraints the PhraseQuery can't
express (unordered windows, in-order-with-gaps). Spec per
``span_near_shard``: ordered = greedy strictly-increasing chain per
term-0 anchor; unordered = minimal window from every query-term position
row; match iff (width − n) ≤ slop; span_freq counts matching anchors.

Covers: pure-Python oracle identity on both modes, driver/distributed
identity, ordered≠unordered asymmetry, slop monotonicity, guards, and
the positions-index requirement.
"""
import math

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize_with_positions

TERMS3 = ["spark", "merge", "join"]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path_factory.mktemp("spidx") / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                positions=True))
    return SearchEngine(spark, idx)


@pytest.fixture(scope="module")
def positions(spark):
    pdf = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .select("doc_id", "text").toPandas())
    out = {}
    for r in pdf.itertuples():
        toks, pos = tokenize_with_positions(r.text)
        by_term: dict[str, list[int]] = {}
        for t, p in zip(toks, pos):
            by_term.setdefault(t, []).append(p)
        out[r.doc_id] = {t: sorted(ps) for t, ps in by_term.items()}
    return out


def _ref_span(positions, terms, slop, in_order):
    """Pure-python mirror of the kernel spec (anchor-count form)."""
    n = len(terms)
    hits = {}
    for d, by_term in positions.items():
        if any(t not in by_term for t in set(terms)):
            continue
        cnt = 0
        if in_order:
            for p in by_term[terms[0]]:
                q, ok = p, True
                for t in terms[1:]:
                    nxt = [x for x in by_term[t] if x > q]
                    if not nxt:
                        ok = False
                        break
                    q = min(nxt)
                if ok and (q - p + 1 - n) <= slop:
                    cnt += 1
        else:
            anchors = sorted(
                p for t in set(terms) for p in by_term[t])
            for p in anchors:
                ms = []
                for t in set(terms):
                    cand = [x for x in by_term[t] if x >= p]
                    if not cand:
                        ms = None
                        break
                    ms.append(min(cand))
                if ms is not None and (max(ms) - p + 1 - n) <= slop:
                    cnt += 1
        if cnt:
            hits[d] = cnt
    return hits


def test_unordered_matches_reference(eng, positions):
    got = {r["doc_id"]: r["span_freq"]
           for r in eng.span_near(TERMS3, slop=6, in_order=False, k=None)}
    ref = _ref_span(positions, TERMS3, 6, False)
    assert got == ref and got


def test_ordered_matches_reference(eng, positions):
    got = {r["doc_id"]: r["span_freq"]
           for r in eng.span_near(["spark", "join"], slop=4,
                                  in_order=True, k=None)}
    ref = _ref_span(positions, ["spark", "join"], 4, True)
    assert got == ref and got


def test_driver_distributed_identical(eng):
    for terms, ordered in [(TERMS3, False), (["spark", "join"], True)]:
        drv = eng.span_near(terms, slop=5, in_order=ordered, k=None)
        dst = [r.asDict() for r in
               eng.span_near_df(terms, slop=5, in_order=ordered,
                                k=None).collect()]
        assert sorted((r["doc_id"], r["score"], r["span_freq"])
                      for r in drv) \
            == sorted((r["doc_id"], r["score"], r["span_freq"])
                      for r in dst)


def test_ordered_subset_of_unordered(eng):
    o = {r["doc_id"] for r in
         eng.span_near(["spark", "join"], slop=3, in_order=True, k=None)}
    u = {r["doc_id"] for r in
         eng.span_near(["spark", "join"], slop=3, in_order=False, k=None)}
    # an in-order match is a window match at the same slop
    assert o and o <= u
    # and the direction matters: 'join ... spark' only counts unordered
    rev = {r["doc_id"] for r in
           eng.span_near(["join", "spark"], slop=3, in_order=True, k=None)}
    assert rev != o


def test_slop_monotone(eng):
    sizes = [len(eng.span_near(TERMS3, slop=s, in_order=False, k=None))
             for s in (0, 4, 8, 16)]
    assert sizes == sorted(sizes)


def test_score_shape(eng, positions):
    # score = (Σ idf) × impact(span_freq, dl) with the engine's BM25 stats
    res = eng.span_near(["spark", "join"], slop=4, in_order=True, k=5)
    N = eng.stats["N"]
    avgdl = eng.stats["avgdl"]
    k1, b = eng.stats["k1"], eng.stats["b"]
    df = {t: sum(1 for by in positions.values() if t in by)
          for t in ("spark", "join")}
    w = sum(math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
            for t in ("spark", "join"))
    for r in res:
        # dl in the engine is len(tokenize(text)) — every (token, slot)
        # entry counts, sub-tokens included
        dl = sum(len(ps) for ps in positions[r["doc_id"]].values())
        sf = r["span_freq"]
        imp = sf * (k1 + 1.0) / (sf + k1 * (1.0 - b + b * dl / avgdl))
        assert abs(r["score"] - w * imp) < 1e-9


def test_guards(eng):
    with pytest.raises(ValueError, match="at least two"):
        eng.span_near(["spark"])
    with pytest.raises(ValueError, match="distinct"):
        eng.span_near(["spark", "spark"], in_order=False)
    # ordered accepts duplicates (a ... a chains)
    assert isinstance(eng.span_near(["the", "the"], slop=8, in_order=True,
                                    k=3), list)
    # unknown term → empty, not an error
    assert eng.span_near(["spark", "zzznope"], slop=3) == []


def test_requires_positions(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "nopos")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                positions=False))
    e = SearchEngine(spark, idx)
    with pytest.raises(Exception, match="positions"):
        e.span_near(["spark", "join"], slop=2)
