"""Tiered generation merge (Lucene TieredMergePolicy analog).

- Results are BIT-identical before/after a merge (same query, same engine
  API) and equal a from-scratch build over the union corpus.
- The base build's postings files are untouched (the structural proof the
  merge cost is ∝ appended generations, not corpus).
- Post-merge the served snapshot is base chunks + ONE merged chunk;
  stale source-generation markers left by a crash between publish and
  purge are excluded by the snapshot gate (no double counting).
- append after merge, compact after merge, and gc_tf after merge all work.
- check_index verifies a merged index clean.
"""

import os

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.check import check_index
from polaris_spark.index.maintenance import (append_index, compact_index,
                                             gc_tf, merge_generations)
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

CFG = dict(n_buckets=8, n_shards=2, n_chunks=2, hot_df_threshold=200)
Q = "conkaconda muor kato"


def _parts(full):
    first = full.iloc[:500].copy()
    g2 = full.iloc[500:750].copy()
    g2["conv_id"] = "g2_" + g2["conv_id"]
    g3 = full.iloc[750:].copy()
    g3["conv_id"] = "g3_" + g3["conv_id"]
    return first, g2, g3


def _hits(spark, d, k=20):
    eng = SearchEngine(spark, d)
    return [(h["doc_id"], h["score"], h["n_match"])
            for h in eng.search(Q, k=k)]


def _file_map(root):
    out = {}
    for r, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(r, f)
            out[os.path.relpath(p, root)] = (os.path.getsize(p),
                                             os.path.getmtime(p))
    return out


def test_merge_identity_and_base_untouched(spark, tmp_path):
    full = make_transcripts(n_turns=1000, seed=9)
    first, g2, g3 = _parts(full)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(first), d, cfg=IndexConfig(**CFG))
    append_index(spark, spark.createDataFrame(g2), d)
    append_index(spark, spark.createDataFrame(g3), d)

    before_hits = _hits(spark, d)
    base_files = {
        k: v for k, v in _file_map(os.path.join(d, "postings")).items()
        if not k.startswith("chunk=1") and not k.startswith("chunk=2")
    }
    rep = merge_generations(spark, d)
    assert rep["merged_generations"] == 2 and rep["generation"] == 3

    # bit-identical results through the same engine API
    assert _hits(spark, d) == before_hits
    # equal to a from-scratch union build
    ref = str(tmp_path / "ref")
    import pandas as pd

    build_index(spark, spark.createDataFrame(pd.concat([first, g2, g3])),
                ref, cfg=IndexConfig(**CFG))
    assert _hits(spark, ref) == before_hits

    # base postings untouched; source generations physically gone; exactly
    # one merged chunk dir remains above the base
    after = _file_map(os.path.join(d, "postings"))
    for k, v in base_files.items():
        assert after.get(k) == v, f"base file {k} was rewritten"
    gens = {p.split(os.sep)[0] for p in after if p.startswith("chunk=")}
    assert gens == {f"chunk={c}" for c in range(CFG["n_chunks"])} | {"chunk=3000"}

    # idempotent: nothing left to merge
    assert merge_generations(spark, d)["merged_generations"] == 0

    # integrity clean on the merged index
    assert check_index(spark, d)["ok"]


def test_snapshot_gate_excludes_stale_superseded_marker(spark, tmp_path):
    full = make_transcripts(n_turns=700, seed=13)
    first, g2, _g3 = _parts(full)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(first), d, cfg=IndexConfig(**CFG))
    append_index(spark, spark.createDataFrame(g2), d)
    before = _hits(spark, d)
    merge_generations(spark, d)
    # simulate a crash between publish and purge: a stale source-gen marker
    # reappears — the snapshot gate must keep excluding its chunk id
    stale = os.path.join(d, "manifest", "chunk_01000.json")
    with open(stale, "w") as f:
        f.write('{"seg_id": "chunk_01000", "chunk": 1000}')
    eng = SearchEngine(spark, d)
    assert 1000 not in eng._serve_chunks
    assert _hits(spark, d) == before
    # ...and the next maintenance op purges it rather than double-folding
    assert merge_generations(spark, d)["merged_generations"] == 0
    assert not os.path.exists(stale)


def test_append_compact_gc_after_merge(spark, tmp_path):
    full = make_transcripts(n_turns=1000, seed=17)
    first, g2, g3 = _parts(full)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(first), d, cfg=IndexConfig(**CFG))
    append_index(spark, spark.createDataFrame(g2), d)
    merge_generations(spark, d)

    # append AFTER a merge lands as the next generation and serves
    append_index(spark, spark.createDataFrame(g3), d)
    hits = _hits(spark, d)
    ref = str(tmp_path / "ref")
    import pandas as pd

    build_index(spark, spark.createDataFrame(pd.concat([first, g2, g3])),
                ref, cfg=IndexConfig(**CFG))
    assert hits == _hits(spark, ref)

    # gc_tf tolerates the merged-away generation's missing chunk manifests
    rep = gc_tf(spark, d)
    assert rep["deleted"], rep

    # full compaction after the merge ≡ the same results, superseded cleared
    compact_index(spark, d, gc=False)
    assert _hits(spark, d) == hits
    import json

    stats = json.load(open(os.path.join(d, "_stats.json")))
    assert "superseded" not in stats
    assert check_index(spark, d)["ok"]


def test_streaming_ingest_with_merge_every(spark, tmp_path):
    """stream_append(merge_every=2): once two unmerged generations have
    accumulated, the next sink call tiered-merges BEFORE appending; results
    stay identical to a from-scratch union build."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from polaris_spark.streaming import stream_append

    full = make_transcripts(n_turns=800, seed=21)
    base, parts = full.iloc[:200], [full.iloc[200:400], full.iloc[400:600],
                                    full.iloc[600:]]
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(base), d, cfg=IndexConfig(**CFG))

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us"))])
    # three separate drains → three generations (one batch each)
    for i, part in enumerate(parts):
        pq.write_table(
            pa.Table.from_pandas(part, schema=schema, preserve_index=False),
            os.path.join(inbox, f"f{i}.parquet"))
        q = stream_append(spark, inbox, d, str(tmp_path / "ckpt"),
                          merge_every=2)
        q.awaitTermination(300)

    stats = json.load(open(os.path.join(d, "_stats.json")))
    # gens 1, 2 appended; drain 3 saw 2 pending → merged them into gen 3,
    # then appended gen 4
    assert stats["generations"] == 4
    assert stats["superseded"] == [1000, 2999]
    merged_mark = json.load(
        open(os.path.join(d, "manifest", "chunk_03000.json")))
    assert merged_mark["merged_from"]

    eng = SearchEngine(spark, d)
    assert eng.stats["N"] == 800
    ref = str(tmp_path / "ref")
    build_index(spark, spark.createDataFrame(full), ref, cfg=IndexConfig(**CFG))
    assert _hits(spark, d) == _hits(spark, ref)
    assert check_index(spark, d)["ok"]


def test_streaming_ingest_with_compact_every(spark, tmp_path):
    """stream_append(compact_every=2) — the VERDICT r3 #8 policy: every 2
    total generations the sink runs compact_index (forceMerge + side-table
    refold + tf GC) BEFORE appending. tf bytes stay bounded vs an
    uncompacted twin ingesting the same drains, and query results are
    identical across the policy boundary (and to a from-scratch union
    build). (tf itself is already GC'd per-append once manifests complete,
    so the growth compaction bounds here is the per-generation DELTA rows
    of the vocabulary side tables and postings fragmentation.)"""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from polaris_spark.streaming import stream_append

    full = make_transcripts(n_turns=800, seed=23)
    base, parts = full.iloc[:200], [full.iloc[200:400], full.iloc[400:600],
                                    full.iloc[600:]]
    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us"))])

    def tf_bytes(root):
        total = 0
        for r, _dirs, files in os.walk(os.path.join(root, "tf")):
            total += sum(os.path.getsize(os.path.join(r, f)) for f in files)
        return total

    dirs = {}
    for tag, ce in (("compact", 2), ("plain", None)):
        d = str(tmp_path / f"idx_{tag}")
        build_index(spark, spark.createDataFrame(base), d,
                    cfg=IndexConfig(**CFG))
        inbox = str(tmp_path / f"inbox_{tag}")
        os.makedirs(inbox)
        for i, part in enumerate(parts):
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema,
                                     preserve_index=False),
                os.path.join(inbox, f"f{i}.parquet"))
            q = stream_append(spark, inbox, d,
                              str(tmp_path / f"ckpt_{tag}"),
                              compact_every=ce)
            q.awaitTermination(300)
        dirs[tag] = d

    # the policy fired: compaction marker records the folded generations
    mark = json.load(
        open(os.path.join(dirs["compact"], "manifest", "compaction.json")))
    assert mark["generations_merged"] >= 2
    # side-table deltas refolded + postings defragmented → strictly fewer
    # rows than the uncompacted twin; tf stays bounded either way (the
    # per-append GC) — compaction must never regress that
    for tbl in ("dictionary", "postings"):
        n_c = spark.read.parquet(
            os.path.join(dirs["compact"], tbl)).count()
        n_p = spark.read.parquet(os.path.join(dirs["plain"], tbl)).count()
        assert n_c < n_p, (tbl, n_c, n_p)
    assert tf_bytes(dirs["compact"]) <= tf_bytes(dirs["plain"])

    # identical results across the policy boundary and vs a fresh build
    ref = str(tmp_path / "ref")
    build_index(spark, spark.createDataFrame(full), ref,
                cfg=IndexConfig(**CFG))
    want = _hits(spark, ref)
    assert _hits(spark, dirs["compact"]) == want
    assert _hits(spark, dirs["plain"]) == want
    assert check_index(spark, dirs["compact"])["ok"]
