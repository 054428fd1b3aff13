"""IntervalQuery (Lucene queries.intervals — ordered/unordered/or with
max_gaps, minimal-interval semantics) — post-4.3 Lucene's replacement
for spans, included for query-API completeness alongside span_near.

Covers: the minimal-interval evaluator against an independent
brute-force (full cartesian enumeration) reference over randomized
nested specs, hand-worked fixtures (containment drops, gaps filter,
or-flattening), driver ≡ distributed identity on a real positions
index, spec validation, the positions requirement, and tombstones.
"""
import itertools
import random

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import (SearchEngine, _ivl_eval,
                                        interval_terms)


def brute(spec, pos_of):
    """Independent reference: children evaluated bottom-up, parents by
    FULL cartesian enumeration of child minimal intervals, then the
    minimal-set reduction and gaps filter."""
    def minimal(ivs, mg=-1):
        best = {}
        for s, e, g in ivs:
            if (s, e) not in best or g < best[(s, e)]:
                best[(s, e)] = g
        items = [(s, e, g) for (s, e), g in best.items()]
        out = [x for x in items
               if not any(s2 >= x[0] and e2 <= x[1] and (s2, e2) != x[:2]
                          for s2, e2, _ in items)]
        out.sort()
        if mg >= 0:
            out = [x for x in out if x[2] <= mg]
        return out

    def ev(sp):
        if "term" in sp:
            return [(p, p, 0) for p in pos_of.get(sp["term"], ())]
        if "or" in sp:
            return minimal([iv for c in sp["or"] for iv in ev(c)])
        for kind, keep in (("containing", True), ("not_containing", False),
                           ("within", True), ("not_within", False)):
            if kind in sp:
                src, ref = ev(sp[kind][0]), ev(sp[kind][1])
                if kind.endswith("containing"):
                    rel = lambda s, e: any(s <= rs and re <= e
                                           for rs, re, _ in ref)
                else:
                    rel = lambda s, e: any(rs <= s and e <= re
                                           for rs, re, _ in ref)
                return [iv for iv in src if rel(iv[0], iv[1]) == keep]
        kind = "ordered" if "ordered" in sp else "unordered"
        kids = [ev(c) for c in sp[kind]]
        if any(not kv for kv in kids):
            return []
        out = []
        for combo in itertools.product(*kids):
            if kind == "ordered":
                if not all(combo[i + 1][0] > combo[i][1]
                           for i in range(len(combo) - 1)):
                    continue
                s, e = combo[0][0], combo[-1][1]
                g = sum(combo[i + 1][0] - combo[i][1] - 1
                        for i in range(len(combo) - 1))
            else:
                s = min(c[0] for c in combo)
                e = max(c[1] for c in combo)
                g = max(0, (e - s + 1) - sum(c[1] - c[0] + 1 for c in combo))
            out.append((s, e, g))
        return minimal(out, int(sp.get("max_gaps", -1)))
    return ev(spec)


def test_eval_hand_fixtures():
    pos = {"a": [0, 3], "b": [1, 5], "c": [4]}
    # ordered(a, b): chains (0,1) and (3,5); both minimal
    assert _ivl_eval({"ordered": [{"term": "a"}, {"term": "b"}]}, pos) == \
        [(0, 1, 0), (3, 5, 1)]
    # gaps filter drops (3,5) (one uncovered slot between 3 and 5)
    assert _ivl_eval({"ordered": [{"term": "a"}, {"term": "b"}],
                      "max_gaps": 0}, pos) == [(0, 1, 0)]
    # containment: a=[0,1], b=[2] → (1,2) only ((0,2) contains it)
    pos2 = {"a": [0, 1], "b": [2]}
    assert _ivl_eval({"ordered": [{"term": "a"}, {"term": "b"}]}, pos2) == \
        [(1, 2, 0)]
    # or flattens to minimal points (dedup)
    assert _ivl_eval({"or": [{"term": "a"}, {"term": "b"}]}, pos2) == \
        [(0, 0, 0), (1, 1, 0), (2, 2, 0)]
    # unordered window covers both, either order
    got = _ivl_eval({"unordered": [{"term": "b"}, {"term": "a"}]}, pos2)
    assert got == [(1, 2, 0)]  # (0,2) contains (1,2); anchor 2 lacks an a≥2
    # a child with no positions → no intervals for ordered/unordered
    assert _ivl_eval({"ordered": [{"term": "a"}, {"term": "z"}]}, pos2) == []
    # nested: ordered(a, or(b, c)) picks the nearer alternative per anchor
    pos3 = {"a": [0, 6], "b": [4], "c": [2, 7]}
    assert _ivl_eval({"ordered": [{"term": "a"},
                                  {"or": [{"term": "b"}, {"term": "c"}]}]},
                     pos3) == [(0, 2, 1), (6, 7, 0)]
    # containment filters (Intervals.containing / containedBy): the
    # ordered(a, b) intervals of pos are (0,1) and (3,5); only (3,5)
    # contains a 'c'@4, and neither lies within a single point
    ab = {"ordered": [{"term": "a"}, {"term": "b"}]}
    assert _ivl_eval({"containing": [ab, {"term": "c"}]}, pos) == \
        [(3, 5, 1)]
    assert _ivl_eval({"not_containing": [ab, {"term": "c"}]}, pos) == \
        [(0, 1, 0)]
    # within: c@4 lies within (3,5) but not (0,1)
    assert _ivl_eval({"within": [{"term": "c"}, ab]}, pos) == [(4, 4, 0)]
    assert _ivl_eval({"not_within": [{"term": "c"}, ab]}, pos) == []
    # empty reference: containing keeps nothing, not_containing everything
    assert _ivl_eval({"containing": [ab, {"term": "z"}]}, pos) == []
    assert _ivl_eval({"not_containing": [ab, {"term": "z"}]}, pos) == \
        [(0, 1, 0), (3, 5, 1)]


def test_eval_fuzz_vs_bruteforce():
    random.seed(11)
    vocab = list("abcde")

    def rspec(depth):
        if depth == 0 or random.random() < 0.4:
            return {"term": random.choice(vocab)}
        kind = random.choice(["ordered", "unordered", "or",
                              "containing", "not_containing",
                              "within", "not_within"])
        if kind in ("containing", "not_containing", "within", "not_within"):
            return {kind: [rspec(depth - 1), rspec(depth - 1)]}
        nk = random.randint(1 if kind == "or" else 2, 3)
        sp = {kind: [rspec(depth - 1) for _ in range(nk)]}
        if kind != "or" and random.random() < 0.5:
            sp["max_gaps"] = random.randint(0, 4)
        return sp

    for _ in range(400):
        pos_of = {}
        for t in vocab:
            n = random.randint(0, 4)
            if n:
                pos_of[t] = sorted(random.sample(range(12), n))
        spec = rspec(2)
        a = [(s, e) for s, e, _ in _ivl_eval(spec, pos_of)]
        b = [(s, e) for s, e, _ in brute(spec, pos_of)]
        assert a == b, (spec, pos_of)


def test_spec_validation():
    with pytest.raises(ValueError):
        interval_terms({"term": ""})
    with pytest.raises(ValueError):
        interval_terms({"ordered": [{"term": "a"}]})  # needs ≥2
    with pytest.raises(ValueError):
        interval_terms({"or": []})
    with pytest.raises(ValueError):
        interval_terms({"ordered": [{"term": "a"}, {"term": "b"}],
                        "max_gaps": "2"})
    with pytest.raises(ValueError):
        interval_terms({"term": "a", "or": [{"term": "b"}]})  # two kinds
    with pytest.raises(ValueError):
        interval_terms(["a"])
    assert interval_terms(
        {"ordered": [{"term": "b"},
                     {"or": [{"term": "a"}, {"term": "b"}]}]}) == ["a", "b"]


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d_pos = str(tmp_path_factory.mktemp("ivlidx") / "pos")
    build_index(spark, docs, d_pos, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                positions=True))
    d_plain = str(tmp_path_factory.mktemp("ivlidx") / "plain")
    build_index(spark, docs, d_plain, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return SearchEngine(spark, d_pos), SearchEngine(spark, d_plain)


SPECS = [
    {"ordered": [{"term": "spark"},
                 {"or": [{"term": "join"}, {"term": "merge"}]}],
     "max_gaps": 2},
    {"unordered": [{"term": "spark"},
                   {"ordered": [{"term": "slow"}, {"term": "query"}]}],
     "max_gaps": 5},
    {"or": [{"ordered": [{"term": "spark"}, {"term": "join"}]},
            {"term": "filter"}]},
    {"containing": [{"unordered": [{"term": "spark"}, {"term": "join"}],
                     "max_gaps": 8},
                    {"term": "a"}]},
    {"within": [{"term": "join"},
                {"unordered": [{"term": "spark"}, {"term": "query"}],
                 "max_gaps": 10}]},
]


def test_driver_distributed_identity(engines):
    eng, _ = engines
    for spec in SPECS:
        drv = eng.search_intervals(spec, k=None)
        dst = [r.asDict() for r in
               eng.search_intervals_df(spec, k=None).collect()]
        key = lambda r: (-r["score"], r["doc_id"])
        assert sorted(drv, key=key) == sorted(dst, key=key) and drv, spec


def test_intervals_vs_corpus_recomputation(engines, spark):
    """Engine results must equal a from-scratch recomputation over the
    raw text's token positions (index-independent reference)."""
    from polaris_spark.tokenizer import tokenize_with_positions

    eng, _ = engines
    pdf = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .select("doc_id", "text").toPandas())
    spec = SPECS[0]
    got = {r["doc_id"]: r["ivl_freq"]
           for r in eng.search_intervals(spec, k=None)}
    want = {}
    for r in pdf.itertuples():
        toks, tpos = tokenize_with_positions(r.text)
        pos_of = {}
        for t, p in zip(toks, tpos):
            pos_of.setdefault(t, []).append(p)
        ivls = brute(spec, {t: sorted(ps) for t, ps in pos_of.items()})
        if ivls:
            want[r.doc_id] = len(ivls)
    assert got == want and got


def test_positions_required_and_tombstones(engines, spark):
    eng, plain = engines
    with pytest.raises(ValueError, match="positions"):
        plain.search_intervals({"ordered": [{"term": "spark"},
                                            {"term": "join"}]}, k=5)
    # tombstoned docs vanish from interval results
    from polaris_spark.index.maintenance import delete_docs

    spec = SPECS[0]
    before = {r["doc_id"] for r in eng.search_intervals(spec, k=None)}
    victim = sorted(before)[0]
    delete_docs(eng.spark, eng.index_dir, [victim])
    try:
        eng2 = SearchEngine(eng.spark, eng.index_dir)
        after_drv = {r["doc_id"] for r in eng2.search_intervals(spec, k=None)}
        after_dst = {r["doc_id"] for r in
                     eng2.search_intervals_df(spec, k=None).collect()}
        assert after_drv == after_dst == before - {victim}
    finally:
        import os
        import shutil
        shutil.rmtree(os.path.join(eng.index_dir, "deletes"),
                      ignore_errors=True)
