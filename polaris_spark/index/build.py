"""Distributed SPIMI-style inverted-index build.

Replaces the reference's single-threaded Lucene materialization (reference:
polaris-core/.../pipeline/IndexPipeline.java:607-673 — every record funneled
through one IndexWriter on the driver, the system's scaling ceiling) with a
fully distributed dataflow:

  stage 0  doc_map:   doc identity (deterministic ``xxhash64`` doc ids from
                      (conv_id, turn_idx) — the reference's non-resumable
                      in-process id counter, SimpleIdGenerator.java:5-12, is
                      explicitly replaced per SURVEY §4.2), collision-checked.
  stage 1  invert:    map-side per-document inversion (tokenize + tf count)
                      in ONE Arrow-vectorized pandas UDF → rows
                      (doc_id, dl, term, tf) — already aggregated per doc, so
                      the only wide exchange that follows moves distinct
                      (doc, term) pairs, not raw token occurrences. Written
                      partitioned by ``chunk`` (a term-bucket range) → the
                      resume checkpoint.
  stage 2  encode:    per chunk: groupBy(bucket, shard).applyInPandas — the
                      salted shuffle-merge. ``bucket = crc32(term) % B`` keys
                      the term dictionary; ``shard = pmod(doc_id, S)`` is the
                      doc-space salt that bounds every group: a term occurring
                      in 30% of ALL docs still lands in S bounded groups, so
                      no hot-term group can OOM a task (two-phase hot-term
                      handling by construction; polaris has no skew handling
                      at all — SURVEY §4.2). Kernel emits sorted,
                      delta+zigzag+varint posting lists with per-block
                      (last_doc, max_impact) metadata for block-max WAND.
  stage 3  merge:     global dictionary (term, df, cf) + doc_stats + _stats
                      aggregated from the segments (the analog of Lucene
                      ``commit(); forceMerge(1)`` — SourceDbWriterImpl.java:99-102
                      — except it stays distributed).

Resumability (north rule): chunks are independent jobs; each writes
``postings/chunk=<c>/`` atomically-enough (dir wiped on retry) and then a
manifest JSON with lineage (segment id, term range, doc/posting counts,
bytes, wall seconds). A re-run skips manifest-complete chunks.

Scale notes (100 TB / 10^12 turns): n_buckets ≈ thousands, n_shards ≈
#executors×4, n_chunks sized so one chunk ≈ a few TB of tf rows; stage 1 is
the only full-data shuffle and moves ~(distinct doc-term pairs) × ~20 bytes.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import zlib
from collections import Counter
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd

from .. import B as BM25_B
from .. import K1 as BM25_K1
from ..tokenizer import TOKENIZER_VERSION, tokenize, tokens_col
from .codec import BLOCK_SIZE, block_last, block_max_float, encode_ints

POSTINGS_SCHEMA = (
    "term string, bucket int, shard int, salted boolean, df bigint, cf bigint, "
    "doc_ids binary, tfs binary, dls binary, "
    "block_last array<bigint>, block_max array<double>"
)


@dataclass
class IndexConfig:
    """Sizing knobs. Defaults fit local[32]; the docstring of each field notes
    the 1000-executor / 10^12-doc setting."""

    n_buckets: int = 64      # term-hash buckets (≥ 4096 at full scale)
    n_shards: int = 8        # doc-space salt; bounds hot-term groups (≥ 4×executors at scale)
    n_chunks: int = 4        # resume granularity: independent encode jobs over bucket ranges
    hot_df_threshold: int = 4096  # df above which a term is doc-shard salted (freq-based salting)
    block: int = BLOCK_SIZE  # postings per block-max block
    k1: float = BM25_K1
    b: float = BM25_B
    use_pandas_tokenizer: bool = True  # Arrow UDF invert kernel (default); False = JVM tokens_col + groupBy


def term_bucket_py(term: str, n_buckets: int) -> int:
    """crc32-based term bucket — computable identically in Python (zlib),
    Spark (F.crc32) and DuckDB, so query-time partition pruning needs no JVM
    round-trip to hash a term."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _invert_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<dl:int, pairs:array<struct<term:string, tf:int>>>")
    def invert(texts: pd.Series) -> pd.DataFrame:
        dls: list[int] = []
        pairs: list[list[dict]] = []
        for t in texts:
            toks = tokenize(t)
            dls.append(len(toks))
            pairs.append([{"term": k, "tf": v} for k, v in Counter(toks).items()])
        return pd.DataFrame({"dl": dls, "pairs": pairs})

    return invert


def _tf_dataframe(docs, cfg: IndexConfig, text_col: str):
    """docs(doc_id, <text_col>) → (doc_id, dl, term, tf, bucket, chunk, shard).

    Map-side inversion: everything up to the checkpoint write is narrow.
    """
    from pyspark.sql import functions as F

    if cfg.use_pandas_tokenizer:
        inv = _invert_udf()
        tf = (
            docs.select("doc_id", inv(F.col(text_col)).alias("iv"))
            .select("doc_id", F.col("iv.dl").alias("dl"), F.explode_outer("iv.pairs").alias("p"))
            .select("doc_id", "dl", F.col("p.term").alias("term"), F.col("p.tf").alias("tf"))
        )
    else:
        toks = docs.select(
            "doc_id", tokens_col(F.col(text_col)).alias("toks")
        ).withColumn("dl", F.size("toks"))
        tf = (
            toks.select("doc_id", "dl", F.explode_outer("toks").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count("*").alias("tf"))
        )
    buckets_per_chunk = max(1, cfg.n_buckets // cfg.n_chunks)
    return (
        tf.where(F.col("term").isNotNull())
        .withColumn("bucket", (F.crc32(F.col("term").cast("binary")) % cfg.n_buckets).cast("int"))
        .withColumn("chunk", (F.col("bucket") / buckets_per_chunk).cast("int"))
    )


def _encode_kernel(cfg: IndexConfig, avgdl: float):
    """applyInPandas kernel: all (doc_id, dl, term, tf, salted) rows of one
    (bucket, shard) group → one encoded posting row per term.

    Fully vectorized: the whole group is delta/zigzag/varint-encoded as one
    stream (``varint_parts``) and per-term byte ranges are sliced out — no
    per-term re-encoding. Python touches each TERM once (slicing), never each
    posting."""
    k1, b, block = cfg.k1, cfg.b, cfg.block

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        from .codec import varint_parts, zigzag_encode

        bucket = int(pdf["bucket"].iloc[0])
        shard = int(pdf["shard"].iloc[0])
        terms = pdf["term"].to_numpy()
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        hot = pdf["is_hot"].to_numpy(dtype=bool)
        order = np.lexsort((docs, terms))
        terms, docs, tfs, dls, hot = (
            terms[order], docs[order], tfs[order], dls[order], hot[order]
        )
        starts = np.concatenate(([0], np.flatnonzero(terms[1:] != terms[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(terms)]))
        n_terms = len(starts)
        # per-run delta encode in one pass (reset at run starts)
        deltas = np.empty_like(docs)
        deltas[1:] = docs[1:] - docs[:-1]
        deltas[starts] = docs[starts]
        dbuf, dnb = varint_parts(zigzag_encode(deltas))
        tbuf, tnb = varint_parts(zigzag_encode(tfs))
        lbuf, lnb = varint_parts(zigzag_encode(dls))
        dof = np.concatenate(([0], np.cumsum(dnb)))
        tof = np.concatenate(([0], np.cumsum(tnb)))
        lof = np.concatenate(([0], np.cumsum(lnb)))
        dbytes, tbytes, lbytes = dbuf.tobytes(), tbuf.tobytes(), lbuf.tobytes()
        # idf-independent BM25 impact for block-max metadata (float64, same
        # expression as the scorer)
        impacts = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        cfs = np.add.reduceat(tfs, starts)
        c_doc, c_tf, c_dl, c_bl, c_bm = [], [], [], [], []
        for i in range(n_terms):
            s, e = starts[i], ends[i]
            c_doc.append(dbytes[dof[s]:dof[e]])
            c_tf.append(tbytes[tof[s]:tof[e]])
            c_dl.append(lbytes[lof[s]:lof[e]])
            if e - s <= block:
                c_bl.append([int(docs[e - 1])])
                c_bm.append([float(impacts[s:e].max())])
            else:
                c_bl.append(block_last(docs[s:e], block).tolist())
                c_bm.append(block_max_float(impacts[s:e], block).tolist())
        return pd.DataFrame(
            {
                "term": terms[starts],
                "bucket": bucket,
                "shard": shard,
                "salted": hot[starts],
                "df": (ends - starts).astype(np.int64),
                "cf": cfs.astype(np.int64),
                "doc_ids": c_doc,
                "tfs": c_tf,
                "dls": c_dl,
                "block_last": c_bl,
                "block_max": c_bm,
            }
        )

    return encode


def build_index(
    spark,
    docs,
    index_dir: str,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    doc_id_col: str | None = None,
    cfg: IndexConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume) the index for ``docs`` into ``index_dir``.

    ``docs`` must contain ``text_col`` plus either ``doc_id_col`` (pre-existing
    int64 ids, e.g. the documents table) or ``id_cols`` from which a
    deterministic ``xxhash64`` doc_id is derived.
    Returns build metrics (also persisted in ``_stats.json``).
    """
    from pyspark.sql import functions as F

    cfg = cfg or IndexConfig()
    t0 = time.time()
    stage_wall: dict[str, float] = {}
    _last = [t0]

    def _lap(name: str) -> None:
        now = time.time()
        stage_wall[name] = round(now - _last[0], 3)
        _last[0] = now

    os.makedirs(index_dir, exist_ok=True)
    man_dir = os.path.join(index_dir, "manifest")
    os.makedirs(man_dir, exist_ok=True)

    if doc_id_col is not None:
        docs = docs.withColumn("doc_id", F.col(doc_id_col).cast("long"))
        id_cols = tuple(c for c in id_cols if c in docs.columns) or (doc_id_col,)
    else:
        docs = docs.withColumn(
            "doc_id", F.xxhash64(*[F.col(c) for c in id_cols])
        )

    # under-partitioned input (e.g. a single parquet file) would serialize
    # the invert UDF onto one core — spread it first. At cluster scale the
    # source has >> parallelism splits and this branch never fires.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)

    # ---- stage 0: doc_map + id-collision check -------------------------
    doc_map_path = os.path.join(index_dir, "doc_map")
    if not (resume and _done(man_dir, "doc_map")):
        dm = docs.select("doc_id", *[c for c in id_cols if c != "doc_id"])
        dm.write.mode("overwrite").parquet(doc_map_path)
        row = (
            spark.read.parquet(doc_map_path)
            .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("nd"))
            .collect()[0]
        )
        n_docs, n_distinct = row["n"], row["nd"]
        if n_docs != n_distinct:
            raise ValueError(
                f"doc_id collision: {n_docs} docs, {n_distinct} distinct ids"
            )
        _mark(man_dir, "doc_map", {"n_docs": n_docs})
    n_docs = _read_mark(man_dir, "doc_map")["n_docs"]
    _lap("doc_map")

    # ---- stage 1: map-side inversion → tf checkpoint --------------------
    tf_path = os.path.join(index_dir, "tf")
    if not (resume and _done(man_dir, "tf")):
        tf = _tf_dataframe(docs, cfg, text_col)
        (
            tf.repartition(max(spark.sparkContext.defaultParallelism, cfg.n_chunks), "chunk", "bucket")
            .write.mode("overwrite")
            .partitionBy("chunk")
            .parquet(tf_path)
        )
        _mark(man_dir, "tf", {})
    _lap("tf_invert")

    # ---- doc_stats + global stats ---------------------------------------
    stats_path = os.path.join(index_dir, "_stats.json")
    doc_stats_path = os.path.join(index_dir, "doc_stats")
    if not (resume and _done(man_dir, "doc_stats")):
        tf_all = spark.read.parquet(tf_path)
        # every doc gets a dl row — zero-token docs too (N/avgdl must count them)
        dm = spark.read.parquet(doc_map_path).select("doc_id")
        dls = tf_all.select("doc_id", "dl").dropDuplicates(["doc_id"])
        dm.join(dls, "doc_id", "left").fillna(0, subset=["dl"]).write.mode(
            "overwrite"
        ).parquet(doc_stats_path)
        sum_dl = spark.read.parquet(doc_stats_path).agg(F.sum("dl")).collect()[0][0] or 0
        # N counts ALL docs (including zero-token docs absent from tf rows)
        avgdl = float(sum_dl) / n_docs if n_docs else 0.0
        stats = {
            "N": n_docs,
            "sum_dl": int(sum_dl),
            "avgdl": avgdl,
            "k1": cfg.k1,
            "b": cfg.b,
            "tokenizer_version": TOKENIZER_VERSION,
            **{k: v for k, v in asdict(cfg).items() if k not in ("k1", "b")},
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f, indent=1)
        _mark(man_dir, "doc_stats", {"sum_dl": int(sum_dl)})
    _lap("doc_stats")
    with open(stats_path) as f:
        stats = json.load(f)
    avgdl = stats["avgdl"]

    # ---- dictionary + hot-term sketch (one aggregation over tf) -----------
    # The dictionary (term, df, cf) is the "merge" fold of the two-phase
    # build; computing it from the tf checkpoint (rather than from encoded
    # segments) lets the SAME job drive the frequency-based salting decision:
    # terms with df > hot_df_threshold are doc-shard salted in stage 2, rare
    # terms keep ONE posting row (grouped by a term-hash pseudo-shard so
    # bucket content still spreads over all (bucket, shard) groups).
    dict_path = os.path.join(index_dir, "dictionary")
    if not (resume and _done(man_dir, "dictionary")):
        dic = (
            spark.read.parquet(tf_path)
            .groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .repartitionByRange(max(1, cfg.n_chunks), "term")
            .sortWithinPartitions("term")
        )
        dic.write.mode("overwrite").parquet(dict_path)
        _mark(man_dir, "dictionary",
              {"n_terms": spark.read.parquet(dict_path).count()})
    if not (resume and _done(man_dir, "hot_terms")):
        hot_rows = (
            spark.read.parquet(dict_path)
            .where(F.col("df") > cfg.hot_df_threshold)
            .select("term")
            .collect()
        )
        _mark(man_dir, "hot_terms", {"hot_terms": sorted(r["term"] for r in hot_rows)})
    hot_terms = _read_mark(man_dir, "hot_terms")["hot_terms"]
    _lap("dictionary_and_hot")

    # ---- stage 2: per-chunk encode (the resumable fan-out) ---------------
    post_root = os.path.join(index_dir, "postings")
    kernel = _encode_kernel(cfg, avgdl)
    for c in range(cfg.n_chunks):
        name = f"chunk_{c:05d}"
        if resume and _done(man_dir, name):
            continue
        tc = time.time()
        chunk_dir = os.path.join(post_root, f"chunk={c}")
        if os.path.exists(chunk_dir):
            shutil.rmtree(chunk_dir)  # wipe partial output from a dead run
        tf_c = spark.read.parquet(tf_path).where(F.col("chunk") == c)
        is_hot = (
            F.col("term").isin(hot_terms) if hot_terms else F.lit(False)
        )
        tf_c = tf_c.withColumn("is_hot", is_hot).withColumn(
            "shard",
            F.when(
                F.col("is_hot"), F.pmod(F.col("doc_id"), F.lit(cfg.n_shards))
            )
            .otherwise(F.crc32(F.col("term").cast("binary")) % cfg.n_shards)
            .cast("int"),
        )
        seg = tf_c.groupBy("bucket", "shard").applyInPandas(kernel, POSTINGS_SCHEMA)
        # re-key encoded rows by bucket before the partitioned write: one-ish
        # file per bucket dir (instead of every encode task spraying a file
        # into every bucket) — query-time footer reads stay O(buckets hit).
        # The shuffle moves already-compressed segment bytes, not postings.
        seg = seg.repartition(max(1, cfg.n_buckets // cfg.n_chunks), "bucket")
        seg.sortWithinPartitions("term", "shard").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(chunk_dir)
        out = spark.read.parquet(chunk_dir)
        agg = out.agg(
            F.count("*").alias("n_terms_rows"),
            F.sum("df").alias("n_postings"),
            F.min("term").alias("term_min"),
            F.max("term").alias("term_max"),
        ).collect()[0]
        _mark(
            man_dir,
            name,
            {
                "seg_id": name,
                "chunk": c,
                "term_range": [agg["term_min"], agg["term_max"]],
                "n_term_rows": agg["n_terms_rows"],
                "n_postings": int(agg["n_postings"] or 0),
                "bytes": _dir_bytes(chunk_dir),
                "wall_s": round(time.time() - tc, 3),
            },
        )

    _lap("encode_chunks")

    wall = time.time() - t0
    metrics = {
        "n_docs": n_docs,
        "n_terms": _read_mark(man_dir, "dictionary")["n_terms"],
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
        "index_bytes": _dir_bytes(post_root),
        "stage_wall": stage_wall,
    }
    with open(os.path.join(index_dir, "_build_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


# ------------------------------------------------------------- manifests

def _mark(man_dir: str, name: str, payload: dict) -> None:
    tmp = os.path.join(man_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump({"name": name, "status": "complete", **payload}, f)
    os.replace(tmp, os.path.join(man_dir, f"{name}.json"))


def _done(man_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(man_dir, f"{name}.json"))


def _read_mark(man_dir: str, name: str) -> dict:
    with open(os.path.join(man_dir, f"{name}.json")) as f:
        return json.load(f)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total
