"""Resume-from-manifest and hot-term skew fixtures (FIXTURES.md §5–6).

The reference has NO resumability (in-process id counter, SURVEY §4.2) and NO
skew handling; both are north-rule requirements here.
"""

import json
import os
import shutil

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.oracle import BM25Oracle
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts


def _dict_snapshot(spark, d):
    rows = spark.read.parquet(os.path.join(d, "dictionary")).collect()
    return sorted((r["term"], r["df"], r["cf"]) for r in rows)


def _postings_snapshot(spark, d):
    rows = spark.read.parquet(os.path.join(d, "postings")).collect()
    return sorted(
        (r["term"], r["shard"], bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["dls"]))
        for r in rows
    )


def test_resume_skips_completed_chunks_and_is_identical(spark, tmp_path):
    pdf = make_transcripts(n_turns=800, seed=7)
    docs = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_buckets=16, n_shards=2, n_chunks=4)

    # full uninterrupted build
    ref_dir = str(tmp_path / "ref")
    build_index(spark, docs, ref_dir, cfg=cfg)

    # interrupted build: wipe the outputs of the last two chunks + downstream
    cut_dir = str(tmp_path / "cut")
    build_index(spark, docs, cut_dir, cfg=cfg)
    man = os.path.join(cut_dir, "manifest")
    for c in (2, 3):
        os.remove(os.path.join(man, f"chunk_{c:05d}.json"))
        shutil.rmtree(os.path.join(cut_dir, "postings", f"chunk={c}"))
    os.remove(os.path.join(man, "dictionary.json"))

    # resume must rebuild ONLY chunks 2,3 (chunk 0,1 manifests untouched)
    m0 = json.load(open(os.path.join(man, "chunk_00000.json")))
    build_index(spark, docs, cut_dir, cfg=cfg, resume=True)
    m0b = json.load(open(os.path.join(man, "chunk_00000.json")))
    assert m0 == m0b, "completed chunk was recomputed"
    for c in range(4):
        assert os.path.exists(os.path.join(man, f"chunk_{c:05d}.json"))

    # resumed index logically identical to uninterrupted build
    assert _dict_snapshot(spark, cut_dir) == _dict_snapshot(spark, ref_dir)
    assert _postings_snapshot(spark, cut_dir) == _postings_snapshot(spark, ref_dir)


def test_manifest_lineage_fields(spark, tmp_path):
    docs = spark.createDataFrame(make_transcripts(n_turns=300, seed=3))
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    m = json.load(open(os.path.join(d, "manifest", "chunk_00000.json")))
    for field in ("seg_id", "term_range", "n_term_rows", "n_postings", "bytes", "wall_s"):
        assert field in m, field
    assert m["status"] == "complete"
    assert m["bytes"] > 0 and m["n_postings"] > 0


def test_skewed_hot_term(spark, tmp_path):
    """One term in ~30% of turns: shard salting must bound every group, and
    results must stay bit-identical to the oracle (no silent truncation)."""
    from pyspark.sql import functions as F

    pdf = make_transcripts(n_turns=2000, seed=11, hot_term="the", hot_frac=0.30)
    docs = spark.createDataFrame(pdf)
    d = str(tmp_path / "skew_idx")
    cfg = IndexConfig(n_buckets=16, n_shards=4, n_chunks=2, hot_df_threshold=100)
    build_index(spark, docs, d, cfg=cfg)

    posts = spark.read.parquet(os.path.join(d, "postings"))
    hot = posts.where(F.col("term") == "the").collect()
    # hot term is split across ALL shards; no single row holds every posting
    assert len(hot) == cfg.n_shards
    total = sum(r["df"] for r in hot)
    assert total >= 0.25 * 2000
    assert max(r["df"] for r in hot) <= 0.6 * total  # bounded groups

    ids = (
        spark.createDataFrame(pdf[["conv_id", "turn_idx"]])
        .select(F.xxhash64("conv_id", "turn_idx").alias("h"))
        .collect()
    )
    oracle = BM25Oracle([(r["h"], t) for r, t in zip(ids, pdf["text"])])
    eng = SearchEngine(spark, d)
    for q in ["the", "the kari", "web.search the"]:
        o = oracle.search(q, k=10)
        e = eng.search(q, k=10)
        assert [(h["doc_id"], h["score"]) for h in e] == o
        # distributed path must route salted + unsalted rows correctly too
        dist = [(r["doc_id"], r["score"]) for r in eng.search_df(q, k=10).collect()]
        assert dist == o


def test_maxscore_prune_is_exact(spark, tmp_path):
    """MaxScore pruning must return bit-identical top-k on a corpus where the
    hot term is non-essential (rare terms dominate the threshold)."""
    import pandas as pd

    from polaris_spark.query.engine import score_shard

    pdf = make_transcripts(n_turns=1500, seed=23, hot_term="the", hot_frac=0.35)
    docs = spark.createDataFrame(pdf)
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, cfg=IndexConfig(n_buckets=8, n_shards=2,
                                                n_chunks=2, hot_df_threshold=64))
    eng = SearchEngine(spark, d)
    for q in ["the kari", "the web.search ka", "the", "kari the toneri"]:
        terms = eng.query_terms(q)
        cand = eng._candidates(terms).toPandas()
        if cand.empty:
            continue
        idf = eng._idf_map(cand)
        args = (idf, eng.stats["avgdl"], eng.stats["k1"], eng.stats["b"], 10, "or",
                len(terms))
        exact = score_shard(cand, *args, prune=False)
        pruned = score_shard(cand, *args, prune=True)
        assert exact["doc_id"].tolist() == pruned["doc_id"].tolist()
        assert exact["score"].tolist() == pruned["score"].tolist()
