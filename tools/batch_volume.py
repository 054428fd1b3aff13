"""Batch-query VOLUME study: whole-job scaling efficiency vs query count,
local[2] vs local[8], over the cached 3M-turn index (read-only, no build).
Run: python tools/batch_volume.py <cpus> <n_queries>  -> one JSON line."""
import sys, os, time, math, json
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
cpus, n_q = int(sys.argv[1]), int(sys.argv[2])
from bench import make_session
from polaris_spark.synth import make_vocab
from polaris_spark.query.engine import SearchEngine

idx = "/root/repo/.cache/profile_idx_3000000"
spark = make_session(cpus); spark.sparkContext.setLogLevel("ERROR")
eng = SearchEngine(spark, idx)
vocab = make_vocab(5000, 42)
toks = vocab[:150] + vocab[500:650] + vocab[1000:1100] + vocab[3000:3050]
qs = [f"{a} {b}" for i, a in enumerate(toks) for b in toks[i+1:]][:n_q]
eng.search_many_df(qs[:8], k=10).count()  # warm
best = math.inf
for _ in range(2):
    t0 = time.time(); eng.search_many_df(qs, k=10).count()
    best = min(best, time.time() - t0)
print(json.dumps({"cpus": cpus, "n_q": len(qs), "wall": round(best, 3),
                  "qps": round(len(qs)/best, 1)}))
spark.stop()
