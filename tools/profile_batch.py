"""Profile search_many_df scaling: build once (local[32]), then time the
batched query job at two parallelism levels against the SAME index, with a
phase breakdown (parse, candidate scan+idf, kernel job, rank stage) to find
the serial fraction behind the 0.568 batch-query efficiency."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")
N_TURNS = int(os.environ.get("PB_TURNS", "3000000"))


def make_session(cpus):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName(f"profile-batch-{cpus}")
        .getOrCreate()
    )


def ensure_corpus_and_index():
    from bench import transcripts_path
    from polaris_spark.index.build import IndexConfig, build_index

    idx = os.path.join(CACHE, f"profile_idx_{N_TURNS}")
    if os.path.exists(os.path.join(idx, "_stats.json")):
        return idx
    spark = make_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    tp = transcripts_path(N_TURNS)
    tr = spark.read.parquet(tp)
    t0 = time.time()
    build_index(spark, tr, idx,
                cfg=IndexConfig(n_buckets=64, n_shards=16, n_chunks=2))
    print(f"build at local[32]: {time.time()-t0:.1f}s", flush=True)
    spark.stop()
    return idx


def batch_queries():
    # PB_NTOK widens the token pool (more queries => the parallel kernel
    # dominates the fixed scan/idf costs, which is the regime the N->4N
    # efficiency criterion is about).
    n_tok = int(os.environ.get("PB_NTOK", "46"))
    from polaris_spark.synth import make_vocab
    vocab = make_vocab(5000, 42)
    head = min(n_tok * 20 // 46, 100)
    rest = n_tok - head
    toks = (vocab[:head] + vocab[100:100 + rest // 2]
            + vocab[1000:1000 + rest - rest // 2])
    return [f"{a} {b}" for i, a in enumerate(toks) for b in toks[i + 1:]]


def profile_leg(cpus, idx):
    from polaris_spark.query.engine import SearchEngine
    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    eng = SearchEngine(spark, idx)
    qs = batch_queries()
    eng.search_many_df(qs[:8], k=10).count()  # warm

    t0 = time.time()
    all_terms = sorted({t for q in qs for t in eng.parse_query_boosts(q)[0]})
    t_parse = time.time() - t0

    t0 = time.time()
    cand = eng._cache_scoped(eng._candidates(all_terms))
    n_cand = cand.count()
    t_scan = time.time() - t0

    t0 = time.time()
    idf = eng._idf_map(cand)
    t_idf = time.time() - t0

    t0 = time.time()
    n = eng.search_many_df(qs, k=10).count()
    t_full = time.time() - t0
    spark.stop()
    out = {"cpus": cpus, "parse_s": round(t_parse, 2),
           "scan_s": round(t_scan, 2), "idf_s": round(t_idf, 2),
           "full_s": round(t_full, 2), "n_cand": n_cand,
           "n_terms": len(all_terms), "rows": n,
           "qps": round(len(qs) / t_full, 1)}
    print(out, flush=True)
    return out


if __name__ == "__main__":
    idx = ensure_corpus_and_index()
    legs = [int(c) for c in (sys.argv[1:] or ["2", "8"])]
    res = [profile_leg(c, idx) for c in legs]
    if len(res) == 2:
        eff = (res[1]["qps"] / res[0]["qps"]) / (legs[1] / legs[0])
        print(f"efficiency {legs[0]}->{legs[1]}: {eff:.3f}", flush=True)
