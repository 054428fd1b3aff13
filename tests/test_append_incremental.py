"""Round-3 maintenance hardening:

1. append_index folds DELTAS: the pre-append dictionary / completion /
   fuzzy_ngrams files are left byte-identical on disk (only new files are
   added) — the structural proof that append cost is ∝ batch, not ∝ vocab.
2. gc_tf: compaction (gc=True default) removes the tf checkpoint once all
   chunk manifests are complete; results unchanged; a resumed build is a
   no-op; GC refuses while any chunk manifest is missing.
3. Serving cache hygiene: repeated search_df calls keep at most a bounded
   number of cached RDDs (the scoped-cache fix).
"""

import os

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import append_index, compact_index, gc_tf
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

CFG = dict(n_buckets=8, n_shards=2, n_chunks=2, hot_df_threshold=200)


def _file_map(root):
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(r, f)
            out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def test_append_is_delta_fold(spark, tmp_path):
    full = make_transcripts(n_turns=900, seed=5)
    first, second = full.iloc[:600], full.iloc[600:]
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(first), d, cfg=IndexConfig(**CFG))

    before = {t: _file_map(os.path.join(d, t))
              for t in ("dictionary", "completion", "fuzzy_ngrams")}
    append_index(spark, spark.createDataFrame(second), d)
    after = {t: _file_map(os.path.join(d, t))
             for t in ("dictionary", "completion", "fuzzy_ngrams")}
    for t in before:
        missing = set(before[t]) - set(after[t])
        assert not missing, f"{t}: append rewrote/removed {sorted(missing)[:3]}"
        changed = [f for f in before[t] if after[t][f] != before[t][f]]
        assert not changed, f"{t}: append modified {changed[:3]}"
        assert set(after[t]) - set(before[t]), f"{t}: no delta files written"

    # the folded views are exact: engine vs a from-scratch union build
    d2 = str(tmp_path / "idx_full")
    build_index(spark, spark.createDataFrame(full), d2, cfg=IndexConfig(**CFG))
    e1, e2 = SearchEngine(spark, d), SearchEngine(spark, d2)
    assert e1._expand_prefix("ka") == e2._expand_prefix("ka")
    assert e1._expand_fuzzy("kari", 1) == e2._expand_fuzzy("kari", 1)
    c1 = [tuple(r) for r in e1.complete("ka", 10).collect()]
    c2 = [tuple(r) for r in e2.complete("ka", 10).collect()]
    assert c1 == c2 and c1

    # compaction folds the deltas back to one row per term
    compact_index(spark, d)
    dic = spark.read.parquet(os.path.join(d, "dictionary"))
    assert dic.groupBy("term").count().where("count > 1").count() == 0
    e3 = SearchEngine(spark, d)
    assert [tuple(r) for r in e3.complete("ka", 10).collect()] == c1


def test_gc_tf_after_compaction(spark, tmp_path):
    full = make_transcripts(n_turns=500, seed=11)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(full), d, cfg=IndexConfig(**CFG))
    assert os.path.exists(os.path.join(d, "tf"))
    eng = SearchEngine(spark, d)
    want = eng.search("kari toneri", k=10)

    compact_index(spark, d)  # gc=True default
    assert not os.path.exists(os.path.join(d, "tf"))
    # results unchanged, resumed build is a manifest-gated no-op
    eng2 = SearchEngine(spark, d)
    assert eng2.search("kari toneri", k=10) == want
    m = build_index(spark, spark.createDataFrame(full), d,
                    cfg=IndexConfig(**CFG), resume=True)
    assert m["n_docs"] == 500
    assert not os.path.exists(os.path.join(d, "tf"))  # no stage re-ran
    # append after GC still works (fresh tf generation, delta fold)
    more = make_transcripts(n_turns=100, seed=12)
    more["conv_id"] = "g2_" + more["conv_id"]
    append_index(spark, spark.createDataFrame(more), d)
    eng3 = SearchEngine(spark, d)
    assert eng3.stats["N"] == 600


def test_gc_tf_refuses_on_missing_manifest(spark, tmp_path):
    full = make_transcripts(n_turns=300, seed=13)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(full), d, cfg=IndexConfig(**CFG))
    man = os.path.join(d, "manifest", "chunk_00001.json")
    os.rename(man, man + ".hidden")
    try:
        r = gc_tf(spark, d)
        assert r["deleted"] is False and r["missing_manifests"]
        assert os.path.exists(os.path.join(d, "tf"))
    finally:
        os.rename(man + ".hidden", man)
    r2 = gc_tf(spark, d)
    assert r2["deleted"] is True


def test_search_df_cache_is_scoped(spark, tmp_path):
    docs = [(i, f"common w{i % 7} filler") for i in range(50)]
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(docs, "doc_id long, text string"),
                d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=4, n_shards=2, n_chunks=2))
    eng = SearchEngine(spark, d)
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    for i in range(8):  # 8 distinct queries
        eng.search_df(f"common w{i % 7}", k=5).collect()
    grown = jsc.getPersistentRDDs().size() - base
    assert grown <= 1, f"cached RDDs grew by {grown} across 8 queries"
