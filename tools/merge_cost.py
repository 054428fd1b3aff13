"""Measure tiered-merge vs full-compaction cost on a big-base/small-append
index — the evidence for SCALE.md's claim that `merge_generations` is the
steady-state ingest-maintenance op (cost ∝ appended data) while
`compact_index` is corpus-proportional.

Run: python tools/merge_cost.py [--base-turns 1000000] [--append-turns 50000]
Prints one JSON line; paste the numbers into SCALE.md.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-turns", type=int, default=1_000_000)
    ap.add_argument("--append-turns", type=int, default=50_000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("merge_cost")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.index.maintenance import (append_index, compact_index,
                                                 merge_generations)
    from polaris_spark.query.engine import SearchEngine
    from polaris_spark.synth import write_transcripts_parquet

    scratch = os.environ.get("SPARK_GRAFT_SCRATCH") or tempfile.mkdtemp()
    root = os.path.join(scratch, "merge_cost")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    base_p = write_transcripts_parquet(
        os.path.join(root, "base"), args.base_turns, seed=42)
    base = spark.read.parquet(base_p)
    d = os.path.join(root, "idx")
    t0 = time.time()
    build_index(spark, base, d, cfg=IndexConfig())
    t_build = time.time() - t0

    from pyspark.sql import functions as F

    for i, seed in enumerate((7, 11)):
        bp = write_transcripts_parquet(
            os.path.join(root, f"b{i}"), args.append_turns, seed=seed)
        b = spark.read.parquet(bp).withColumn(
            "conv_id", F.concat(F.lit(f"g{i + 2}_"), F.col("conv_id")))
        append_index(spark, b, d)

    # snapshot for the compact leg BEFORE merging (same input state)
    d2 = os.path.join(root, "idx_compact")
    shutil.copytree(d, d2)

    q = "conkaconda muor kato"
    hits_before = [(h["doc_id"], h["score"])
                   for h in SearchEngine(spark, d).search(q, k=10)]

    t0 = time.time()
    rep_m = merge_generations(spark, d)
    t_merge = time.time() - t0
    t0 = time.time()
    rep_c = compact_index(spark, d2, gc=False)
    t_compact = time.time() - t0

    hits_m = [(h["doc_id"], h["score"])
              for h in SearchEngine(spark, d).search(q, k=10)]
    hits_c = [(h["doc_id"], h["score"])
              for h in SearchEngine(spark, d2).search(q, k=10)]
    assert hits_m == hits_before and hits_c == hits_before, "identity broken"

    print(json.dumps({
        "base_turns": args.base_turns,
        "append_turns_total": 2 * args.append_turns,
        "cpus": args.cpus,
        "build_wall_s": round(t_build, 2),
        "merge_wall_s": round(t_merge, 2),
        "compact_wall_s": round(t_compact, 2),
        "compact_over_merge": round(t_compact / t_merge, 2),
        "merged_generations": rep_m["merged_generations"],
        "identity": True,
    }))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
