"""Serve-during-append snapshot gate: an engine constructed while a
build/append is mid-flight must serve EXACTLY the last published snapshot.

The engine serves a postings chunk only if its manifest marker is complete
AND its generation is ≤ the one _stats.json was computed over (append
chunk namespace = 1000×generation; the stats swap is the publish point —
the Lucene-commit-point analog). Simulated here by hand-planting the two
in-flight states a concurrent reader could list:

- a torn base chunk (dir present, NO manifest marker) — task commits land
  part files one at a time before the chunk manifest is written;
- a fully-committed next-generation chunk (dir + marker present) whose
  stats swap has not happened yet.
"""

import json
import os
import shutil

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [(i, f"alpha beta doc{i}") for i in range(1, 9)] + [
    (9, "alpha gamma"), (10, "beta gamma delta")]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "snap_idx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=4, n_shards=2, n_chunks=2))
    return d


def _results(spark, d):
    eng = SearchEngine(spark, d)
    return [(h["doc_id"], round(h["score"], 9), h["n_match"])
            for h in eng.search("alpha beta", k=None)]


def test_unmanifested_and_unpublished_chunks_invisible(spark, idx):
    want = _results(spark, idx)
    assert want

    post = os.path.join(idx, "postings")
    src = os.path.join(post, "chunk=0")
    # (a) torn base chunk: dir exists, no manifest marker
    shutil.copytree(src, os.path.join(post, "chunk=3"))
    # (b) committed-but-unpublished generation-1 chunk: dir AND marker
    #     exist, but stats still says generations=0. Copy EVERY base chunk
    #     in (part-file names are unique) so each query term's postings
    #     are duplicated — inclusion would visibly change scores.
    for c in ("chunk=0", "chunk=1"):
        shutil.copytree(os.path.join(post, c),
                        os.path.join(post, "chunk=1000"), dirs_exist_ok=True)
    with open(os.path.join(idx, "manifest", "chunk_01000.json"), "w") as f:
        json.dump({"name": "chunk_01000", "status": "complete"}, f)

    got = _results(spark, idx)
    assert got == want  # duplicate postings would change score/n_match

    # the stats swap PUBLISHES generation 1: the same engine construction
    # now serves chunk 1000 (results change — inclusion is not over-broad)
    sp = os.path.join(idx, "_stats.json")
    stats = json.load(open(sp))
    stats["generations"] = 1
    with open(sp, "w") as f:
        json.dump(stats, f)
    assert _results(spark, idx) != want

    # the torn chunk (no marker) stays invisible even after the swap
    eng = SearchEngine(spark, idx)
    assert 3 not in eng._serve_chunks and 1000 in eng._serve_chunks
