"""reindex (ES _reindex-from-stored-source analog): rebuild an index
under a new configuration from its own doc_map. Identity properties:
resharding never changes results (the shard-invariance property across a
rebuild), positions=True enables phrases with results equal to a direct
positional build, tombstones are not carried (reindex ≡ fresh build over
live docs), and the guards (no stored text / unknown column) raise."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import delete_docs, reindex
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reidx_src"))
    pdf = make_transcripts(n_turns=1200, seed=23)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=16, n_shards=4, n_chunks=2,
                                store_text=True, attr_cols=("role",)))
    w = pdf["text"].iloc[0].split()
    q = f"{w[0]} {w[3]}"          # two real corpus terms (OR)
    pq = f'"{w[1]} {w[2]}"'       # an adjacent pair → guaranteed phrase hit
    return d, docs, q, pq


def _hits(eng, q, **kw):
    return [(h["doc_id"], round(h["score"], 9), h["n_match"])
            for h in eng.search(q, k=None, **kw)]


def test_reshard_identity(spark, src, tmp_path):
    """A reindex to different bucket/shard/chunk counts returns
    bit-identical search results — config invariance across the rebuild."""
    d, _docs, q, _pq = src
    dst = str(tmp_path / "resharded")
    out = reindex(spark, d, dst, n_buckets=32, n_shards=8, n_chunks=3)
    assert out["n_docs"] == 1200
    assert out["cfg"]["n_buckets"] == 32 and out["cfg"]["n_shards"] == 8
    got = _hits(SearchEngine(spark, dst), q)
    assert got and got == _hits(SearchEngine(spark, d), q)
    # source-only knobs survived the override (store_text, attr_cols):
    # the destination doc_map still carries the stored text + attribute
    dm2 = spark.read.parquet(f"{dst}/doc_map")
    assert {"role", "text", "conv_id", "turn_idx"} <= set(dm2.columns)


def test_enable_positions_matches_direct_build(spark, src, tmp_path):
    """positions=True via reindex unlocks phrase search, equal to a
    positional build straight from the corpus."""
    d, docs, _q, pq = src
    dst = str(tmp_path / "positional")
    reindex(spark, d, dst, positions=True)
    direct = str(tmp_path / "direct")
    build_index(spark, docs, direct,
                cfg=IndexConfig(n_buckets=16, n_shards=4, n_chunks=2,
                                store_text=True, attr_cols=("role",),
                                positions=True))
    got = _hits(SearchEngine(spark, dst), pq)
    want = _hits(SearchEngine(spark, direct), pq)
    assert got == want and len(got) > 0


def test_tombstones_not_carried(spark, src, tmp_path):
    """Deleted docs vanish from the destination and stats are recomputed:
    the reindexed index equals a fresh build over the live docs."""
    d, docs, q, _pq = src
    base = SearchEngine(spark, d)
    victims = [h["doc_id"] for h in base.search(q, k=3)]
    delete_docs(spark, d, victims)
    try:
        dst = str(tmp_path / "live_only")
        out = reindex(spark, d, dst)
        assert out["n_docs"] == 1200 - len(victims)
        fresh = str(tmp_path / "fresh")
        # identity cols derive the same doc_ids, so filter on the derived id
        import pyspark.sql.functions as F
        with_ids = docs.withColumn(
            "doc_id", F.xxhash64(F.col("conv_id"), F.col("turn_idx")))
        live = with_ids.where(~F.col("doc_id").isin(victims))
        build_index(spark, live, fresh, doc_id_col="doc_id",
                    cfg=IndexConfig(n_buckets=16, n_shards=4, n_chunks=2,
                                    store_text=True, attr_cols=("role",)))
        got = _hits(SearchEngine(spark, dst), q)
        assert got == _hits(SearchEngine(spark, fresh), q)
        assert not set(victims) & {g[0] for g in got}
    finally:
        # module-scoped source: restore tombstone-free state for other tests
        import shutil
        shutil.rmtree(f"{d}/deletes", ignore_errors=True)


def test_guards(spark, tmp_path):
    docs = spark.createDataFrame(make_transcripts(n_turns=200, seed=3))
    bare = str(tmp_path / "bare")
    build_index(spark, docs, bare,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1))
    with pytest.raises(ValueError, match="store_text"):
        reindex(spark, bare, str(tmp_path / "x1"))
    src_t = str(tmp_path / "src_t")
    build_index(spark, docs, src_t,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1,
                                store_text=True))
    with pytest.raises(ValueError, match="never stored"):
        reindex(spark, src_t, str(tmp_path / "x2"),
                attr_cols=("no_such_col",))
    with pytest.raises(ValueError, match="not both"):
        reindex(spark, src_t, str(tmp_path / "x3"),
                cfg=IndexConfig(), n_buckets=8)
    # an existing destination must refuse (a resumed build would keep the
    # OLD config's artifacts while reporting the new one), as must
    # reindexing onto the source itself
    dst_ok = str(tmp_path / "done_once")
    reindex(spark, src_t, dst_ok)
    with pytest.raises(ValueError, match="already exists"):
        reindex(spark, src_t, dst_ok, n_buckets=16)
    with pytest.raises(ValueError, match="differ from the source"):
        reindex(spark, src_t, src_t)
