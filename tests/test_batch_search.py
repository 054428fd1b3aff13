"""Batched multi-query search (search_many_df): one distributed job scoring
a whole query set must return per-query results BIT-IDENTICAL to the
single-query distributed path (same candidate rows, same idf, same
term-ordered accumulation)."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

QUERIES = [
    "ka", "kari sato", "elor inda", "web.search",
    "conpre stable", "ka ri to",
    "sato^2 kari",          # clause boost
    "kari -sato",           # prohibit term (distributed anti-set)
    "nonexistenttermxyz",   # no hits
    "!!! ;;;",              # unparseable → absent from output
    "ka",                   # duplicate → deduped
]


@pytest.fixture(scope="module")
def beng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("batch_idx"))
    docs = spark.createDataFrame(make_transcripts(n_turns=1500, seed=13))
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=16, n_shards=4, n_chunks=2))
    return SearchEngine(spark, d)


def _rows(df):
    return [(r["doc_id"], r["score"], r["n_match"]) for r in df.collect()]


@pytest.mark.parametrize("mode,k", [("or", 10), ("or", None), ("and", 5)])
def test_batch_matches_per_query(beng, mode, k):
    got = beng.search_many_df(QUERIES, k=k, mode=mode).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query"], []).append(r)
    for q in set(QUERIES):
        want = _rows(beng.search_df(q, k=k, mode=mode))
        have = sorted(by_q.get(q, []), key=lambda r: r["rank"])
        assert [(r["doc_id"], r["score"], r["n_match"]) for r in have] == want, q
        # rank is 1..n in (score desc, doc_id asc) order — exactly the
        # per-query result order
        assert [r["rank"] for r in have] == list(range(1, len(have) + 1)), q


def test_batch_empty_and_dedup(beng):
    assert beng.search_many_df(["!!! ;;;"]).count() == 0
    two = beng.search_many_df(["ka", "ka"], k=3)
    assert two.count() == two.where("query = 'ka'").count() <= 3


def test_murmur3_matches_spark_hash(spark):
    """_pin_groups' routing depends on _murmur3_int32 being bit-identical
    to Spark's Murmur3Hash over one IntegerType column (what
    repartition(n, col) places rows with)."""
    from pyspark.sql import functions as F

    from polaris_spark.query.engine import _murmur3_int32

    vals = list(range(-64, 512)) + [2**31 - 1, -(2**31), 987654321]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    for r in df.select("x", F.hash("x").alias("h")).collect():
        assert r.h == _murmur3_int32(r.x), r.x


def test_pin_groups_one_group_per_partition(spark):
    """Exact routing: n kernel groups land in n distinct shuffle
    partitions, one group each — no empty-task/straggler skew (the
    repartition(n, keys) birthday-collision failure mode)."""
    from pyspark.sql import functions as F

    from polaris_spark.query.engine import SearchEngine, _route_tokens

    for n_shards, B in ((16, 1), (8, 4)):
        n = n_shards * B
        assert len(set(_route_tokens(n))) == n
        data = [(sh, qb) for sh in range(n_shards) for qb in range(B)
                for _ in range(3)]
        df = spark.createDataFrame(data, "shard int, qblock int")
        routed = SearchEngine._pin_groups(
            df, n, F.col("shard") * B + F.col("qblock"))
        chk = (routed.withColumn("pid", F.spark_partition_id())
               .groupBy("pid")
               .agg(F.countDistinct("shard", "qblock").alias("g"))
               .collect())
        assert len(chk) == n
        assert max(r.g for r in chk) == 1


# --------------------------- classic trees / phrases inside the batch job

TREE_QUERIES = [
    "kari AND (sato OR elor)",          # boolean tree
    "+kari sato^2 -web.search",         # +required / boost / prohibit tree
    '"kari sato"',                      # lone phrase (one-leaf tree here)
    '"kari sato"~2 AND stable',         # phrase-in-tree with slop
    r"kari\-sato elor",                 # escaped operator → tree route
    "ka ri to",                         # plain flat query in the same set
]


@pytest.fixture(scope="module")
def peng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("batch_pos_idx"))
    docs = spark.createDataFrame(make_transcripts(n_turns=1500, seed=13))
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=16, n_shards=4, n_chunks=2,
                                positions=True))
    return SearchEngine(spark, d)


def test_batch_tree_and_phrase_parity(peng):
    got = peng.search_many_df(TREE_QUERIES, k=None).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query"], []).append(r)
    for q in TREE_QUERIES[:-1]:
        want = _rows(peng.search_bool_df(q, k=None))
        have = sorted(by_q.get(q, []), key=lambda r: r["rank"])
        assert [(r["doc_id"], r["score"], r["n_match"]) for r in have] \
            == want, q
    # the flat query in the same set still matches the flat path
    q = TREE_QUERIES[-1]
    assert [(r["doc_id"], r["score"], r["n_match"])
            for r in sorted(by_q.get(q, []), key=lambda r: r["rank"])] \
        == _rows(peng.search_df(q, k=None)), q


def test_batch_phrase_degrades_without_positions(beng):
    """On a positionless index a quoted phrase can't tree-evaluate; the
    batch falls back to the flat parse — same degrade as serving."""
    got = beng.search_many_df(['"kari sato"'], k=None).collect()
    want = _rows(beng.search_df("kari sato", k=None))
    assert [(r["doc_id"], r["score"], r["n_match"])
            for r in sorted(got, key=lambda r: r["rank"])] == want
