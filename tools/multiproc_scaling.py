"""Process-per-executor scaling study — the closer emulation of the north
rule's "N → 4N executors" criterion than the single-JVM thread proxy.

The thread proxy (bench.py --scaling: local[2] vs local[8] in ONE JVM)
underestimates cluster scaling for the shuffle-heavy JVM stages: 8 threads
share one heap, one GC, one memory-bandwidth domain, so encode/aux stages
measure ~2.5x at 4x threads while the per-process Python tokenize kernels
measure ~3.8x (stage walls in BENCH/BASELINE.md). A real 4N-executor
cluster gives every executor its OWN JVM. This tool emulates exactly that:

  leg N   = 1 subprocess, local[2], builds the FULL corpus
  leg 4N  = 4 CONCURRENT subprocesses, local[2] each, each building a
            deterministic quarter of the corpus (pmod(xxhash64(conv_id),4))
            into its own index directory — four JVMs with independent
            heaps/GC, the executor model

Scaling efficiency = wall_N / (4 * wall_4N)  (equal total work, so the
throughput ratio reduces to the wall ratio). The four quarter-indexes are
then PROVEN to serve as one corpus: the federated engine
(query/multi.search_multi_df, gate multi_search) runs the query set over
the four quarters with merged global stats and must return doc-id sets
consistent with the monolithic leg-N index (bit-identity of the
federation is the multi_search gate's job at sf0.01; here we check the
top-k id/score agreement at bench scale).

Usage:
  python tools/multiproc_scaling.py [--n-turns 6000000] [--drop-caches]
  python tools/multiproc_scaling.py --leg full|quarter --part i   (internal)
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/dev/shm/polaris_scratch")
CFG = dict(n_buckets=64, n_shards=16, n_chunks=2)  # == bench --build-only


def _session(cpus: int):
    from bench import make_session

    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _leg(args):
    """Child process: build the full corpus or one quarter of it."""
    from pyspark.sql import functions as F

    from bench import transcripts_path
    from polaris_spark.index.build import IndexConfig, build_index

    spark = _session(args.cpus)
    tr = spark.read.parquet(transcripts_path(args.n_turns))
    if args.leg == "quarter":
        tr = tr.where(F.pmod(F.xxhash64(F.col("conv_id")), F.lit(4))
                      == args.part)
        out = os.path.join(SCRATCH, f"mp_quarter_{args.part}")
    else:
        out = os.path.join(SCRATCH, "mp_full")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    build_index(spark, tr, out, cfg=IndexConfig(**CFG))
    print(json.dumps({"wall_s": round(time.time() - t0, 3),
                      "index": out}))


def _drop_caches():
    subprocess.run(["sync"], check=False)
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
    except OSError:
        pass
    time.sleep(5)


def _spawn(leg: str, part: int, cpus: int, n_turns: int):
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--leg", leg,
         "--part", str(part), "--cpus", str(cpus),
         "--n-turns", str(n_turns)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)


def _query_check(n_queries: int = 50, k: int = 10):
    """Federated top-k over the four quarters (merged global stats) vs the
    monolithic index — per-query doc-id agreement at bench scale."""
    from bench import QUERY_SET

    from polaris_spark.query.engine import SearchEngine
    from polaris_spark.query.multi import search_multi_df

    spark = _session(8)
    mono = SearchEngine(spark, os.path.join(SCRATCH, "mp_full"))
    quarters = [os.path.join(SCRATCH, f"mp_quarter_{i}") for i in range(4)]
    qs = [q for q in QUERY_SET if " " in q][:n_queries]
    agree = total = 0
    for q in qs:
        want = [(r["doc_id"], round(r["score"], 6)) for r in
                mono.search_df(q, k=k).collect()]
        got = [(r["doc_id"], round(r["score"], 6)) for r in
               search_multi_df(spark, quarters, q, k=k).collect()]
        total += 1
        agree += int(got == want)
    spark.stop()
    return {"queries": total, "identical_topk": agree}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=["full", "quarter"], default=None)
    ap.add_argument("--part", type=int, default=0)
    ap.add_argument("--cpus", type=int, default=2)
    ap.add_argument("--n-turns", type=int, default=6_000_000)
    ap.add_argument("--drop-caches", action="store_true")
    ap.add_argument("--skip-query-check", action="store_true")
    args = ap.parse_args()
    if args.leg:
        _leg(args)
        return

    # ensure the corpus exists before timing anything
    from bench import transcripts_path

    transcripts_path(args.n_turns)

    if args.drop_caches:
        _drop_caches()
    t0 = time.time()
    p = _spawn("full", 0, 2, args.n_turns)
    out_full = json.loads(p.communicate()[0].strip().splitlines()[-1])
    wall_n = time.time() - t0

    if args.drop_caches:
        _drop_caches()
    t0 = time.time()
    procs = [_spawn("quarter", i, 2, args.n_turns) for i in range(4)]
    for p in procs:
        assert json.loads(p.communicate()[0].strip().splitlines()[-1])
    wall_4n = time.time() - t0

    eff = round(wall_n / (4.0 * wall_4n), 3)
    res = {
        "n_turns": args.n_turns,
        "wall_N_1proc_local2_s": round(wall_n, 1),
        "wall_4N_4proc_local2_s": round(wall_4n, 1),
        "throughput_N": round(args.n_turns / wall_n, 1),
        "throughput_4N": round(args.n_turns / wall_4n, 1),
        "scaling_efficiency": eff,
        "build_wall_full_s": out_full["wall_s"],
    }
    if not args.skip_query_check:
        res["federated_check"] = _query_check()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
