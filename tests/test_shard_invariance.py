"""Config-invariance of the distributed path (VERDICT r1 #9): the same
corpus indexed at different (n_shards, n_buckets) must produce BIT-IDENTICAL
search_df results — guards the per-shard θ₀ derivation, unsalted fan-out
dedup, and bucket routing as cluster configs change at scale."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

QUERIES = [
    ("ka ri", "or"),
    ("kari sato", "or"),
    ("web.search", "or"),
    ("ka ri to", "and"),
    ("ka -ri", "or"),       # exclusion through the cogrouped path
    ("karitoNe staBle", "or"),
]


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    pdf = make_transcripts(n_turns=1500, seed=13)
    docs = spark.createDataFrame(pdf)
    cfgs = {
        "a": IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                         hot_df_threshold=64),
        "b": IndexConfig(n_buckets=32, n_shards=16, n_chunks=4,
                         hot_df_threshold=64),
    }
    dirs = {}
    for k, cfg in cfgs.items():
        d = str(tmp_path_factory.mktemp(f"shinv_{k}"))
        build_index(spark, docs, d, cfg=cfg)
        dirs[k] = d
    return dirs


def test_search_df_bit_identical_across_configs(spark, two_indexes):
    ea = SearchEngine(spark, two_indexes["a"])
    eb = SearchEngine(spark, two_indexes["b"])
    for q, mode in QUERIES:
        ra = [(r["doc_id"], r["score"], r["n_match"])
              for r in ea.search_df(q, k=None, mode=mode).collect()]
        rb = [(r["doc_id"], r["score"], r["n_match"])
              for r in eb.search_df(q, k=None, mode=mode).collect()]
        assert ra == rb, q
        # pruned top-k too (θ₀ is derived per shard — k-limited results
        # must still be exact under both shardings)
        ta = [(r["doc_id"], r["score"])
              for r in ea.search_df(q, k=7, mode=mode).collect()]
        tb = [(r["doc_id"], r["score"])
              for r in eb.search_df(q, k=7, mode=mode).collect()]
        assert ta == tb == [(d, s) for d, s, _ in ra[:7]], q


def test_driver_path_matches_distributed_across_configs(spark, two_indexes):
    for d in two_indexes.values():
        eng = SearchEngine(spark, d)
        for q, mode in QUERIES:
            drv = [(h["doc_id"], h["score"]) for h in eng.search(q, k=10, mode=mode)]
            dst = [(r["doc_id"], r["score"])
                   for r in eng.search_df(q, k=10, mode=mode).collect()]
            assert drv == dst, (q, d)
