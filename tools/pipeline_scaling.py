"""Two-parallelism scaling evidence for the training-pipeline operators
(the N→4N criterion applied to the curation surface, complementing the
build/query campaign in BENCH/BASELINE.md).

Paired design like bench --scaling: ONE shared synthetic corpus on disk,
then a fresh subprocess per parallelism level (local[2] → local[8],
back-to-back so host-steal drift is common-mode) timing each operator's
full-action wall. Prints one JSON line with per-op walls at both levels
and the (t_N / t_4N) / 4 efficiency; paste into BENCH/BASELINE.md.

Run: python tools/pipeline_scaling.py [--n-turns 600000] [--reps 1]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPS = ("gopher", "chunk", "strip_spans", "dsir", "lm_score")


def worker(cpus: int, corpus: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from polaris_spark.ops.dedup import strip_dup_spans
    from polaris_spark.ops.text import (chunk_windows, dsir_logweights,
                                        gopher_cols, lm_score)

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")  # FIXED across
        # levels: the campaign compares the SAME job at two parallelism
        # levels — a cpus-dependent partition count changes the job
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    docs = spark.read.parquet(corpus)
    docs.count()  # warmup: file listing + scan JIT outside the timings
    times = {}

    def consume(df):
        # .count() lets Catalyst PRUNE unreferenced projections — a
        # pure-column op timed with count() measures the scan, not the
        # op; hashing every output column to one scalar defeats that
        # (bit_xor fold — a sum of hashes overflows under ANSI mode)
        cols = ", ".join(f"`{c}`" for c in df.columns)
        df.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()

    t0 = time.time()
    consume(docs.select("doc_id", *gopher_cols(F.col("text"), min_words=5)))
    times["gopher"] = round(time.time() - t0, 3)

    t0 = time.time()
    consume(chunk_windows(docs, size=128, stride=96))
    times["chunk"] = round(time.time() - t0, 3)

    t0 = time.time()
    consume(strip_dup_spans(docs, n=8, min_docs=2, hash_shingles=True))
    times["strip_spans"] = round(time.time() - t0, 3)

    t0 = time.time()
    consume(dsir_logweights(docs, docs.where("role = 'user'")))
    times["dsir"] = round(time.time() - t0, 3)

    t0 = time.time()
    consume(lm_score(docs))
    times["lm_score"] = round(time.time() - t0, 3)

    spark.stop()
    print("WORKER_JSON:" + json.dumps(times))


def run_worker(cpus: int, corpus: str) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(cpus), "--corpus", corpus],
        capture_output=True, text=True, timeout=3600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("WORKER_JSON:")][-1]
    return json.loads(line[len("WORKER_JSON:"):])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-turns", type=int, default=3_000_000)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.corpus)
        return 0

    import pyarrow as pa
    import pyarrow.parquet as pq

    from polaris_spark.synth import make_transcripts

    tmp = tempfile.mkdtemp(prefix="pipe_scale_")
    corpus = os.path.join(tmp, "corpus.parquet")
    pdf = make_transcripts(n_turns=args.n_turns, seed=42)
    pdf["doc_id"] = range(len(pdf))
    # pyarrow straight to disk: no Spark (or driver heap) in the parent
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   corpus, row_group_size=200_000)

    reps = []
    for _ in range(args.reps):
        t2 = run_worker(2, corpus)
        t8 = run_worker(8, corpus)
        eff = {op: round(t2[op] / t8[op] / 4.0, 3) for op in OPS}
        reps.append({"local2": t2, "local8": t8, "efficiency": eff})
    best = max(reps, key=lambda r: min(r["efficiency"].values()))
    print(json.dumps({"n_turns": args.n_turns, "reps": reps,
                      "best_rep_efficiency": best["efficiency"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
