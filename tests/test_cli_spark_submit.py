"""spark-submit --py-files packaging smoke: the north rule's deployment
surface. Zips the package, builds a tiny index and queries it through
bin/spark-submit in subprocesses (fresh JVMs, no pytest session reuse)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_pkg(tmp) -> str:
    zp = os.path.join(tmp, "polaris_spark.zip")
    with zipfile.ZipFile(zp, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "polaris_spark")):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return zp


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_build_and_query(tmp_path):
    tmp = str(tmp_path)
    zp = _zip_pkg(tmp)

    # tiny input corpus
    from polaris_spark.synth import write_transcripts_parquet

    inp = os.path.join(tmp, "transcripts")
    write_transcripts_parquet(inp, 500, seed=5)
    idx = os.path.join(tmp, "idx")

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}

    def submit(*args):
        cmd = [SPARK_SUBMIT, "--master", "local[4]",
               "--conf", "spark.ui.enabled=false",
               "--conf", "spark.sql.shuffle.partitions=4",
               "--py-files", zp, os.path.join(REPO, "cli_shim.py"), *args]
        r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=600)
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout.strip().splitlines()[-1]

    out = json.loads(submit("build", "--input", inp, "--index", idx,
                            "--buckets", "8", "--shards", "2", "--chunks", "2"))
    assert out["n_docs"] == 500 and out["n_terms"] > 0

    hits = json.loads(submit("query", "--index", idx, "--query", "ka", "-k", "5"))
    assert isinstance(hits, list)

    comp = json.loads(submit("complete", "--index", idx, "--prefix", "ka", "-n", "5"))
    assert len(comp) <= 5

    # round-3 late query surfaces over spark-submit: boosting demotion +
    # significant-terms aggregation (function-score needs a stored numeric
    # attr — engine-tested in test_boosting_significant, driven manually)
    neg = json.loads(submit("query", "--index", idx, "--query", "ka",
                            "-k", "5", "--negative", "ka",
                            "--negative-boost", "0.5"))
    # negative == query -> every hit matched the negative: all demoted,
    # scores exactly halved vs the plain run (same deterministic top-5)
    assert [h["doc_id"] for h in neg] == [h["doc_id"] for h in hits]
    assert all(h["demoted"] == 1 for h in neg)
    assert [h["score"] for h in neg] == [h["score"] * 0.5 for h in hits]
    sig = json.loads(submit("sig-terms", "--index", idx, "--query", "ka",
                            "-n", "5", "--window", "20"))
    assert isinstance(sig, list) and all(
        {"term", "fg_df", "bg_df", "score"} <= set(r) for r in sig)

    # maintenance surface over spark-submit: append a second generation,
    # then compact — post-compact results must be bit-identical
    import pyarrow as pa
    import pyarrow.parquet as pq

    inp2 = os.path.join(tmp, "transcripts2")
    write_transcripts_parquet(inp2, 300, seed=9)
    # conv ids are positional (conv-00000000...), so a fresh corpus would
    # collide with generation 0's derived doc_ids — remap to a g2- prefix
    # (append_index rejects duplicate ids by design)
    pdf2 = pq.read_table(inp2).to_pandas()
    pdf2["conv_id"] = "g2-" + pdf2["conv_id"]
    inp2 = os.path.join(tmp, "transcripts2b.parquet")
    pq.write_table(pa.Table.from_pandas(pdf2, preserve_index=False), inp2)
    m = json.loads(submit("append", "--input", inp2, "--index", idx))
    assert m["appended_docs"] == 300
    hits_a = json.loads(submit("query", "--index", idx, "--query", "ka",
                               "-k", "10"))
    json.loads(submit("compact", "--index", idx))
    hits_c = json.loads(submit("query", "--index", idx, "--query", "ka",
                               "-k", "10"))
    assert hits_a == hits_c


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pipeline_ops(tmp_path):
    """chunk / semdedup / scrub --gopher over spark-submit, each checked
    against an independent DuckDB computation of the same spec."""
    import duckdb

    tmp = str(tmp_path)
    zp = _zip_pkg(tmp)
    docs = "/root/testdata/sf0.001/documents.parquet"
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}

    def submit(*args):
        cmd = [SPARK_SUBMIT, "--master", "local[4]",
               "--conf", "spark.ui.enabled=false",
               "--conf", "spark.sql.shuffle.partitions=4",
               "--py-files", zp, os.path.join(REPO, "cli_shim.py"), *args]
        r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=600)
        assert r.returncode == 0, r.stderr[-3000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out = submit("chunk", "--input", docs, "--output",
                 os.path.join(tmp, "chunks.parquet"),
                 "--size", "32", "--stride", "24")
    want = duckdb.sql(f"""
        SELECT sum(CASE WHEN n <= 32 THEN 1 ELSE 1 + (n - 32 + 23) // 24 END)
        FROM (SELECT len(list_filter(string_split_regex(text, '\\s+'),
                                     x -> x != '')) AS n FROM '{docs}')
        WHERE n > 0""").fetchone()[0]
    assert out["n_chunks"] == want

    out = submit("semdedup", "--input", emb, "--output",
                 os.path.join(tmp, "led.parquet"),
                 "--centroids", "1", "--threshold", "0.45")
    dot = ("list_sum(list_transform(list_zip(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[]), p -> p[1] * p[2]))")
    na = "sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)))"
    nb = "sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x)))"
    want = duckdb.sql(f"""
        SELECT count(DISTINCT a.vec_id)
        FROM '{emb}' a JOIN '{emb}' b ON a.vec_id > b.vec_id
        WHERE round({dot} / ({na} * {nb}), 6) >= 0.45""").fetchone()[0]
    assert out["n_dropped"] == want and out["n_vectors"] == 500

    out = submit("scrub", "--input", docs, "--output",
                 os.path.join(tmp, "scrubbed.parquet"),
                 "--gopher", "--gopher-min-words", "5")
    cols = duckdb.sql(
        f"SELECT * FROM '{os.path.join(tmp, 'scrubbed.parquet', '*.parquet')}'"
        " LIMIT 0"
    ).columns
    assert {"gopher_pass", "stop_hits", "bullet_ratio"} <= set(cols)
    assert out["n_docs"] == 500


def test_spark_submit_media(tmp_path):
    """`media` CLI: mixed real-codec payloads (GIF/PNG/BMP images,
    WAV/FLAC audio, opaque video blobs) through the Arrow feature
    kernel + real resizer over spark-submit; per-asset features must
    equal the local real-decoder kernels bit-for-bit."""
    import duckdb
    import numpy as np

    from polaris_spark.ops.flac import encode_flac
    from polaris_spark.ops.multimodal import (FEATURE_DIM, encode_bmp,
                                              encode_gif, encode_png,
                                              encode_wav, media_featurizer)

    tmp = str(tmp_path)
    zp = _zip_pkg(tmp)
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}

    rng = np.random.default_rng(17)
    rows, payloads = [], {}
    for i in range(9):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
            img = pal[rng.integers(0, 6, (12, 12))]
            data = [encode_gif, encode_png, encode_bmp][(i // 3) % 3](img)
        elif kind == "audio":
            t = np.arange(1200) / 8000
            s = np.sin(2 * np.pi * (250 + 50 * i) * t) * 0.4
            data = (encode_flac((s * 32767).astype(np.int16), 8000)
                    if (i // 3) % 2 else encode_wav(s, 8000))
        else:
            data = bytes(rng.integers(0, 256, 300, dtype=np.uint8))
        payloads[i] = bytes(data)
        rows.append((i, kind, payloads[i]))

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    apath = os.path.join(tmp, "assets.parquet")
    meta = [{"width": None, "height": None, "sample_rate": None,
             "duration_ms": None, "format": "x"}] * len(rows)
    tbl = pa.table({
        "asset_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows]),
        "data": pa.array([r[2] for r in rows], pa.binary()),
        "meta": pa.array(meta),
    })
    pq.write_table(tbl, apath)

    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--py-files", zp, os.path.join(REPO, "cli_shim.py"),
           "media", "--input", apath,
           "--output", os.path.join(tmp, "feats.parquet"),
           "--resize", "6x6"]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_assets"] == 9 and out["n_features"] == 9
    assert out["n_resized"] == 3

    got = duckdb.sql(
        f"SELECT asset_id, features FROM "
        f"'{os.path.join(tmp, 'feats.parquet', '*.parquet')}' ORDER BY 1"
    ).fetchall()
    for aid, feats in got:
        assert len(feats) == FEATURE_DIM
        assert list(feats) == media_featurizer(payloads[aid])
    thumbs = duckdb.sql(
        f"SELECT min(octet_length(resized)), max(octet_length(resized)) "
        f"FROM '{os.path.join(tmp, 'feats.parquet_resized', '*.parquet')}'"
    ).fetchone()
    assert thumbs == (36, 36)
