"""SemDeDup (cluster-scoped semantic dedup) properties.

- n_centroids=1 ≡ brute force: the drop set derived from
  embedding_neardup_pairs (a vector is dropped iff it has a smaller-id
  neighbor at cos ≥ τ) matches exactly, and dup_of is the MIN such
  neighbor.
- clustered path can only MISS cross-cluster pairs: its drop set is a
  subset of the brute-force one, its keep set a superset; the ledger
  always has one row per vector.
"""

import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.similarity import (embedding_neardup_pairs,
                                          kmeans_centroids, semantic_dedup)

SF = "/root/testdata/sf0.001"
TAU = 0.45


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def brute(spark, emb):
    # (vec_a < vec_b, cos >= TAU) exact pairs -> expected ledger
    pairs = embedding_neardup_pairs(emb, threshold=TAU).collect()
    dup_of = {}
    for r in pairs:
        a, b = r["vec_a"], r["vec_b"]  # a < b: b is the droppable side
        dup_of[b] = min(dup_of.get(b, a), a)
    return dup_of


def test_single_cluster_equals_brute_force(spark, emb, brute):
    led = semantic_dedup(emb, n_centroids=1, threshold=TAU).collect()
    assert len(led) == emb.count()
    got = {r["vec_id"]: (r["dup_of"], r["keep"]) for r in led}
    for vid, (dof, keep) in got.items():
        if vid in brute:
            assert (dof, keep) == (brute[vid], 0), vid
        else:
            assert (dof, keep) == (None, 1), vid


def test_clustered_drops_subset_of_brute(spark, emb, brute):
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=256)
    led = semantic_dedup(emb, centroids=cents, threshold=TAU)
    rows = led.collect()
    assert len(rows) == emb.count()  # one ledger row per vector
    dropped = {r["vec_id"] for r in rows if r["keep"] == 0}
    assert dropped <= set(brute)  # clustering only MISSES pairs
    # every drop's dup_of shares the dropper's cluster and is smaller
    cid = {r["vec_id"]: r["centroid_id"] for r in rows}
    for r in rows:
        if r["keep"] == 0:
            assert r["dup_of"] < r["vec_id"]
            assert cid[r["dup_of"]] == r["centroid_id"]


def test_keep_flag_consistent(spark, emb):
    led = semantic_dedup(emb, n_centroids=1, threshold=TAU)
    bad = led.where(
        (F.col("keep") == 1) & F.col("dup_of").isNotNull()
        | (F.col("keep") == 0) & F.col("dup_of").isNull()).count()
    assert bad == 0


def test_srp_hot_cluster_dial(spark, emb, brute):
    """srp_bits pre-chunks the pair join: the drop set can only shrink
    relative to the same clustering without SRP (subset), stays inside
    the brute-force set, keeps one ledger row per vector, and at a
    generous table count recovers most of the cluster-only drops."""
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=256)
    base = {r["vec_id"] for r in
            semantic_dedup(emb, centroids=cents, threshold=TAU).collect()
            if r["keep"] == 0}
    srp = semantic_dedup(emb, centroids=cents, threshold=TAU,
                         srp_bits=4, srp_tables=8).collect()
    assert len(srp) == emb.count()
    dropped = {r["vec_id"] for r in srp if r["keep"] == 0}
    assert dropped <= base <= set(brute) | base  # subset chain
    assert dropped <= set(brute)
    # recall at 8 tables x 4 bits on near-dup cosines: most drops survive
    assert len(dropped) >= len(base) * 0.5
    # determinism
    again = {r["vec_id"] for r in
             semantic_dedup(emb, centroids=cents, threshold=TAU,
                            srp_bits=4, srp_tables=8).collect()
             if r["keep"] == 0}
    assert again == dropped
