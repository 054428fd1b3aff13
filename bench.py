#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec", "queries": {...},
"sf", plus informative extras (throughput, latency percentiles)}.

--scaling mode: runs the SAME index-build job on the SAME input at two
parallelism levels (local[8] vs local[32]) in fresh subprocesses and writes
BENCH/BASELINE.md with throughput at both plus scaling efficiency
(= (thr_32/thr_8)/4) — the sandbox proxy for the north rule's N→4N executor
criterion (no real cluster available here).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

QUERY_SET = [
    # FIXTURES §7 mix over the synthetic-transcripts vocab: hot/mid/rare
    # natural terms, camelCase identifiers, dotted/tool names, multi-term OR,
    # case variants, and one punctuation-only (empty) query.
    "ka", "ri", "toneri", "kari sato", "elor inda",
    "web.search", "read_file", "sql.query", "git.diff",
    "karitoNe", "staBle", "preCon",
    "ka ri to", "sa mu el or", "velopi shanter",
    "Kari", "KARI", "conpre",
    "nonexistenttermxyz", "!!! ;;;",
]


def make_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("polaris_spark_bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def transcripts_path(n_turns: int) -> str:
    """Deterministic shared input — identical bytes for every parallelism
    level (seed fixed; regenerated only if missing)."""
    os.makedirs(CACHE, exist_ok=True)
    p = os.path.join(CACHE, f"bench_transcripts_{n_turns}.parquet")
    if not os.path.exists(p):
        from polaris_spark.synth import write_transcripts_parquet

        write_transcripts_parquet(p, n_turns, seed=42)
    return p


def run_suite(cpus: int, sf_dir: str, n_turns: int) -> dict:
    from pyspark.sql import functions as F

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.query.engine import SearchEngine

    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    extras: dict = {}

    # ---- 1. index build over the sf documents table ----------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dd = os.path.join(CACHE, f"bench_docidx_{cpus}")
    shutil.rmtree(dd, ignore_errors=True)
    t0 = time.time()
    build_index(spark, docs, dd, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=32, n_shards=8, n_chunks=2))
    times["index_build_documents"] = round(time.time() - t0, 3)

    # ---- 2. index build over synthetic transcripts (throughput headline) --
    tp = transcripts_path(n_turns)
    td = os.path.join(CACHE, f"bench_tridx_{cpus}")
    shutil.rmtree(td, ignore_errors=True)
    tr = spark.read.parquet(tp)
    t0 = time.time()
    m = build_index(spark, tr, td,
                    cfg=IndexConfig(n_buckets=64, n_shards=max(8, cpus), n_chunks=2))
    times["index_build_transcripts"] = round(time.time() - t0, 3)
    extras["turns_per_sec"] = round(n_turns / times["index_build_transcripts"], 1)
    extras["n_turns"] = n_turns
    extras["index_bytes"] = m["index_bytes"]

    # ---- 3. query latency over the transcripts index ---------------------
    eng = SearchEngine(spark, td)
    lat = []
    for q in QUERY_SET:
        t0 = time.time()
        eng.search(q, k=10)
        lat.append(time.time() - t0)
    lat_sorted = sorted(lat)
    extras["query_p50_s"] = round(statistics.median(lat), 4)
    extras["query_p99_s"] = round(lat_sorted[max(0, int(len(lat) * 0.99) - 1)], 4)
    times["bm25_query_set"] = round(sum(lat), 3)

    # ---- 4. pipeline ops over sf tables -----------------------------------
    t0 = time.time()
    from polaris_spark.ops.dedup import lsh_candidate_pairs

    lsh_candidate_pairs(docs, k=8, bands=4).count()
    times["dedup_minhash_lsh"] = round(time.time() - t0, 3)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    from polaris_spark.ops.similarity import cosine_topk

    t0 = time.time()
    cosine_topk(emb, qv, k=10).collect()
    times["ann_cosine_top10"] = round(time.time() - t0, 3)

    from polaris_spark.ops.text import langid_col, quality_cols

    t0 = time.time()
    docs.select("doc_id", *quality_cols(F.col("text")),
                langid_col(F.col("text")).alias("lang")).count()
    times["text_quality_scan"] = round(time.time() - t0, 3)

    spark.stop()
    return {"times": times, **extras}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n-turns", type=int, default=0,
                    help="synthetic transcripts size (0 → derived from sf)")
    ap.add_argument("--scaling", action="store_true",
                    help="run local[8] vs local[32] scaling study")
    ap.add_argument("--internal-single", action="store_true")
    args = ap.parse_args()

    sf = 0.1
    base = os.path.basename(args.sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass
    n_turns = args.n_turns or max(20_000, int(2_000_000 * sf))

    if args.scaling:
        # the scaling criterion needs a compute-dominated job: at small inputs
        # fixed costs (job scheduling, py-worker startup, driver IO) swamp the
        # parallel fraction and MORE cores lose. 1M turns ≈ 45M postings keeps
        # every stage busy at 32 cores.
        n_turns = max(n_turns, 1_000_000)
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--internal-single",
                 "--cpus", str(cpus), "--sf-dir", args.sf_dir,
                 "--n-turns", str(n_turns)],
                capture_output=True, text=True, check=True,
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        thr8 = results[8]["turns_per_sec"]
        thr32 = results[32]["turns_per_sec"]
        wall8 = results[8]["queries"]["index_build_transcripts"]
        wall32 = results[32]["queries"]["index_build_transcripts"]
        eff = round((thr32 / thr8) / 4.0, 3)
        md = f"""# BENCH/BASELINE — scaling evidence (local[8] vs local[32] proxy for N→4N executors)

Same job (`build_index` over the deterministic synthetic transcripts corpus,
{n_turns} turns, seed 42, identical parquet input), identical code, two
parallelism levels:

| parallelism | build wall (s) | throughput (turns/s) |
|---|---|---|
| local[8]  | {wall8} | {thr8} |
| local[32] | {wall32} | {thr32} |

**Scaling efficiency (thr_32 / thr_8) / 4 = {eff}** (north-rule bar: ≥ 0.8).

Full per-suite timings:
```json
{json.dumps(results, indent=1)}
```
"""
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(md)
        print(json.dumps({"scaling_efficiency": eff,
                          "throughput_8": thr8, "throughput_32": thr32}))
        return

    res = run_suite(args.cpus, args.sf_dir, n_turns)
    total = round(sum(res["times"].values()), 3)
    out = {
        "metric": "headline suite wall (index build + BM25 query set + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": res["times"],
        "sf": sf,
        "cpus": args.cpus,
        "turns_per_sec": res["turns_per_sec"],
        "n_turns": res["n_turns"],
        "index_bytes": res["index_bytes"],
        "query_p50_s": res["query_p50_s"],
        "query_p99_s": res["query_p99_s"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
