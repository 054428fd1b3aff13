"""Point-in-time index snapshot (SnapshotDeletionPolicy/backup analog):
bit-identical serving from the copy, tolerance of in-flight append
garbage, point-in-time isolation from later appends, and file:// parity
(HadoopFS FileUtil copy path)."""

import json
import os

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import append_index, snapshot_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

CFG = IndexConfig(n_buckets=8, n_shards=2, n_chunks=2)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snap_src"))
    pdf = make_transcripts(n_turns=600, seed=13)
    build_index(spark, spark.createDataFrame(pdf), d, cfg=CFG)
    return d, pdf


def _top(spark, d, q="the", k=10):
    return [(h["doc_id"], h["score"]) for h in
            SearchEngine(spark, d).search(q, k=k)]


def test_snapshot_serves_identically(spark, built, tmp_path):
    d, pdf = built
    q = pdf["text"].iloc[0].split()[0]
    dest = str(tmp_path / "snap1")
    res = snapshot_index(spark, d, dest)
    assert res["n_docs"] == 600 and res["bytes"] > 0
    assert "postings" in res["entries"] and "manifest" in res["entries"]
    assert _top(spark, dest, q) == _top(spark, d, q)
    # the snapshot is itself snapshot-able (restore = the same copy op)
    dest2 = str(tmp_path / "snap2")
    snapshot_index(spark, dest, dest2)
    assert _top(spark, dest2, q) == _top(spark, d, q)


def test_snapshot_ignores_inflight_append_state(spark, built, tmp_path):
    """An unpublished generation riding along in the copy (the mid-copy /
    crashed-append state) is invisible: Spark task commits only ever leave
    (i) fully-committed VALID parquet in a visible chunk dir — excluded by
    the engine's generation-cap + manifest-marker partition predicate —
    or (ii) junk under `_temporary`, which parquet readers skip. The
    snapshot engine serves the pinned published state exactly."""
    import shutil

    d, pdf = built
    q = pdf["text"].iloc[0].split()[0]
    want = _top(spark, d, q)
    # realistic in-flight state: a phase marker, a COMMITTED valid-parquet
    # chunk of the unpublished generation (copy of chunk=0's files), and
    # uncommitted task junk under _temporary
    with open(os.path.join(d, "manifest", "gen_0001_tf.json"), "w") as f:
        json.dump({"phase": "tf", "in_flight": True}, f)
    shutil.copytree(os.path.join(d, "postings", "chunk=0"),
                    os.path.join(d, "postings", "chunk=1000"))
    tmpdir = os.path.join(d, "postings", "_temporary", "0")
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "part-torn"), "wb") as f:
        f.write(b"\x00garbage")
    dest = str(tmp_path / "snap_dirty")
    snapshot_index(spark, d, dest)
    assert _top(spark, dest, q) == want
    # ...and the DIRTY original still serves the published state too
    assert _top(spark, d, q) == want
    # cleanup so the module fixture stays usable
    os.remove(os.path.join(d, "manifest", "gen_0001_tf.json"))
    shutil.rmtree(os.path.join(d, "postings", "chunk=1000"))
    shutil.rmtree(os.path.join(d, "postings", "_temporary"))


def test_snapshot_is_point_in_time_vs_later_append(spark, tmp_path):
    d = str(tmp_path / "src")
    pdf = make_transcripts(n_turns=400, seed=21)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d, cfg=CFG)
    dest = str(tmp_path / "snap")
    snapshot_index(spark, d, dest)
    before = _top(spark, dest)
    # append a remapped batch to the ORIGINAL only
    extra = make_transcripts(n_turns=300, seed=22)
    extra["conv_id"] = extra["conv_id"] + "_b"
    append_index(spark, spark.createDataFrame(extra), d)
    assert SearchEngine(spark, d).stats["N"] == 700
    snap_eng = SearchEngine(spark, dest)
    assert snap_eng.stats["N"] == 400          # pinned state
    assert _top(spark, dest) == before          # unchanged by the append


def test_snapshot_over_file_uri(spark, built, tmp_path):
    """file:// routes through HadoopFS.copy_tree (FileUtil) end-to-end."""
    d, pdf = built
    q = pdf["text"].iloc[0].split()[0]
    dest = "file://" + str(tmp_path / "snap_h")
    res = snapshot_index(spark, "file://" + d, dest)
    assert res["n_docs"] == 600
    assert _top(spark, str(tmp_path / "snap_h"), q) == _top(spark, d, q)
