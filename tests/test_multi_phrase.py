"""MultiPhraseQuery (per-slot term alternatives) — reference context:
Lucene's QueryParser builds MultiPhraseQuery when the analyzer stacks
several terms at one phrase position; the reference's classic parser
(sourcedb/SourceDbImpl.java:131-137) rides the same machinery. Spec per
``multi_phrase_shard``: slot occupancy = union of members' positions
(multiplicity kept at slot 0), exact chain / Σmin displacement, score =
all-members idf sum × impact(phrase_freq, dl), absent members = zero idf.
"""
import math
from collections import Counter

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.tokenizer import tokenize, tokenize_with_positions

SLOTS = ["spark", ["join", "merge"]]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path_factory.mktemp("mpidx") / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                positions=True))
    return SearchEngine(spark, idx)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .select("doc_id", "text").toPandas())
    pos_of, toks_all = {}, {}
    for r in pdf.itertuples():
        toks, pos = tokenize_with_positions(r.text)
        m: dict[str, list[int]] = {}
        for t, p in zip(toks, pos):
            m.setdefault(t, []).append(p)
        pos_of[r.doc_id] = {t: sorted(ps) for t, ps in m.items()}
        toks_all[r.doc_id] = list(tokenize(r.text))
    return pos_of, toks_all


def _ref(pos_of, toks_all, slots, k1=1.2, b=0.75):
    N = len(toks_all)
    dl = {d: len(t) for d, t in toks_all.items()}
    avgdl = sum(dl.values()) / N
    df = Counter()
    for by in pos_of.values():
        for t in by:
            df[t] += 1
    out = {}
    for d, by in pos_of.items():
        sp = []
        for ms in slots:
            u = sorted(p for t in ms for p in by.get(t, []))
            if not u:
                sp = None
                break
            sp.append(u)
        if sp is None:
            continue
        nxt = [set(s) for s in sp]
        live = [p for p in sp[0]
                if all((p + i) in nxt[i] for i in range(1, len(slots)))]
        if not live:
            continue
        pf = len(live)
        w = sum(math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
                for ms in slots for t in ms if df[t] > 0)
        out[d] = (w * (pf * (k1 + 1.0)
                       / (pf + k1 * (1.0 - b + b * dl[d] / avgdl))), pf)
    return out


def test_matches_oracle_both_paths(eng, corpus):
    pos_of, toks_all = corpus
    drv = eng.search_multi_phrase(SLOTS, k=None)
    dst = [r.asDict() for r in
           eng.search_multi_phrase_df(SLOTS, k=None).collect()]
    assert sorted((r["doc_id"], r["score"], r["phrase_freq"])
                  for r in drv) \
        == sorted((r["doc_id"], r["score"], r["phrase_freq"])
                  for r in dst)
    ref = _ref(pos_of, toks_all, [["spark"], ["join", "merge"]])
    got = {r["doc_id"]: (r["score"], r["phrase_freq"]) for r in drv}
    assert set(got) == set(ref)
    for d in got:
        assert abs(got[d][0] - ref[d][0]) < 1e-9 and got[d][1] == ref[d][1]


def test_union_of_single_phrases(eng):
    got = {r["doc_id"] for r in eng.search_multi_phrase(SLOTS, k=None)}
    a = {r["doc_id"] for r in eng.search_phrase("spark join", k=None)}
    m = {r["doc_id"] for r in eng.search_phrase("spark merge", k=None)}
    assert got == (a | m) and a and m


def test_slop_widens(eng):
    exact = {r["doc_id"] for r in eng.search_multi_phrase(SLOTS, k=None)}
    sloppy = {r["doc_id"] for r in
              eng.search_multi_phrase(SLOTS, k=None, slop=3)}
    assert exact <= sloppy and len(sloppy) > len(exact)


def test_absent_member_zero_idf(eng):
    """A typo alternative that matches nothing must not change scores."""
    a = eng.search_multi_phrase(SLOTS, k=None)
    bres = eng.search_multi_phrase(["spark", ["join", "merge", "zzz"]],
                                   k=None)
    assert sorted((r["doc_id"], r["score"]) for r in a) \
        == sorted((r["doc_id"], r["score"]) for r in bres)


def test_guards(eng):
    with pytest.raises(ValueError, match="at least two"):
        eng.search_multi_phrase(["spark"])
    with pytest.raises(ValueError, match="non-empty"):
        eng.search_multi_phrase(["spark", []])
    # a slot whose every member is unknown matches nothing
    assert eng.search_multi_phrase(["spark", ["zzznope"]], k=5) == []


# ------------------------------------------- match_phrase_prefix (ES)

def test_phrase_prefix_expansion_and_parity(spark, tmp_path_factory):
    """'"slow qu"' must equal a hand-built multi_phrase over the
    dictionary's qu-prefix expansion; driver ≡ distributed; empty
    expansion → no hits; single-token phrase rejected."""
    import pytest as _pt

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.query.engine import SearchEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path_factory.mktemp("ppidx") / "idx")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                positions=True))
    eng = SearchEngine(spark, d)
    exp = eng._expand_prefix("qu")
    assert exp  # the corpus has qu-terms ('query', ...)
    want = eng.search_multi_phrase(["slow", exp], k=None)
    drv = eng.search_phrase_prefix("slow qu", k=None)
    dst = [r.asDict() for r in
           eng.search_phrase_prefix_df("slow qu", k=None).collect()]
    key = lambda r: (-r["score"], r["doc_id"])
    assert sorted(drv, key=key) == sorted(want, key=key) and drv
    assert sorted(dst, key=key) == sorted(drv, key=key)
    # a full-token prefix also matches its own continuations
    full = eng.search_phrase_prefix("slow query", k=None)
    assert {r["doc_id"] for r in full} >= set()
    # no vocab term with the prefix → empty
    assert eng.search_phrase_prefix("slow zzqx", k=5) == []
    assert eng.search_phrase_prefix_df("slow zzqx", k=5).count() == 0
    with _pt.raises(ValueError, match="≥2 tokens"):
        eng.search_phrase_prefix("qu")
