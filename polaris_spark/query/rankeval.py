"""Ranking-quality evaluation — the Elasticsearch ``_rank_eval`` API
analog: given a RUN (per-query ranked results) and a JUDGMENTS table
(per-query graded relevance labels), compute the standard IR metrics
per query — precision@k, recall@k, reciprocal rank (MRR@k) and nDCG@k.

The reference serves ranked hits (SearchMixer.java:34-52) but has no
evaluation surface; every production search stack grows one (ES
``_rank_eval``, TREC ``trec_eval``) because it is how ranking changes
are regression-gated, and a training-data pipeline uses the same math
to validate retrieval quality of mined negatives / RAG indices. The
formulas are the public textbook ones (Järvelin & Kekäläinen 2002 for
DCG; ES rank_eval docs for the metric set).

Definitions (``rel`` = grade >= ``rel_threshold``; ranks are 1-based by
(score desc, doc_id asc), cut at ``k``):

- ``precision_k`` = relevant retrieved / retrieved      (ES rank_eval's
  precision: denominator is what WAS retrieved, <= k — an under-full
  result page is not penalized; that is recall's job)
- ``recall_k``    = relevant retrieved / total relevant for the query
  (0 when the query has no relevant docs — vacuous queries surface as
  zero, never as NULL/NaN)
- ``rr``          = 1 / rank of the first relevant hit, else 0
- ``dcg_k``       = sum((2^grade - 1) / log2(rank + 1))  (exponential
  gain, the ES default)
- ``ndcg_k``      = dcg_k / idcg_k where idcg_k replays the formula on
  the query's judgments sorted by grade desc, cut at k; 0 when no
  positive grade exists

100 TB shape: the run is at most |queries| x k rows after the rank cut
(a window over the per-query partitions of the RESULT set, never the
corpus); judgments tables are label sets (thousands of rows) and join
broadcast-small. Per-query folds are one partial-aggregated groupBy on
query — reduce moves |queries| rows. Nothing here touches the index:
results come from any ranked source (``search_many_df`` for the batched
offline-eval shape, a served log replay, a vector kNN run).

Determinism: metric arithmetic is pure double over <= k terms per
query; gates compare at 1e-6 rounding which double summation-order
noise (~1e-16) can never reach.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["rank_eval", "rank_eval_summary", "pad_zero_queries",
           "mean_summary"]


def _gain(col):
    """Exponential DCG gain: 2^grade - 1 (grade 0 contributes nothing)."""
    return F.pow(F.lit(2.0), col.cast("double")) - F.lit(1.0)


def _discount(rank_col):
    return F.log2(rank_col.cast("double") + F.lit(1.0))


def rank_eval(results, judgments, k: int = 10, rel_threshold: int = 1):
    """Per-query IR metrics for a run against graded judgments.

    ``results``: (query, doc_id, score) — one row per retrieved doc;
    ranks are assigned here by (score desc, doc_id asc) within each
    query, so callers pass raw scored output (ties resolve exactly like
    the engine's total order). ``judgments``: (query, doc_id, grade) —
    grade >= ``rel_threshold`` counts as relevant; docs absent from the
    judgments are grade 0 (the pooling convention); duplicate
    (query, doc_id) rows collapse to their max grade. ``k`` must be a
    positive int (use the run's own top-k for whole-run metrics).

    Returns one row per DISTINCT query in ``results``:
    (query, n_ret, n_rel, precision_k, recall_k, rr, ndcg_k) with the
    definitions in the module docstring. Queries present only in
    ``judgments`` are not emitted (no run rows to evaluate — ES behaves
    the same way).
    """
    if k is None or int(k) <= 0:
        raise ValueError(f"k must be a positive int, got {k}")
    # duplicate (query, doc_id) judgments would multiply run rows through
    # the left join (inflating n_ret/precision/DCG silently) — collapse
    # to the max grade, the usual revised-label convention
    j = (judgments.select(
            "query", "doc_id", F.col("grade").cast("int").alias("grade"))
         .groupBy("query", "doc_id").agg(F.max("grade").alias("grade")))

    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    run = (results.select("query", "doc_id", "score")
           .withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= F.lit(int(k))))

    hit = (run.join(j, ["query", "doc_id"], "left")
              .withColumn("grade", F.coalesce("grade", F.lit(0)))
              .withColumn("rel",
                          (F.col("grade") >= F.lit(int(rel_threshold)))
                          .cast("int")))
    per_q = hit.groupBy("query").agg(
        F.count("*").alias("n_ret"),
        F.sum("rel").alias("rel_ret"),
        # first relevant rank (NULL when none) -> reciprocal rank
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(_gain(F.col("grade")) / _discount(F.col("rank")))
         .alias("dcg_k"),
    )

    # Ideal DCG + total-relevant come from the judgments alone: replay the
    # gain formula on each query's grades sorted desc, cut at k.
    wj = Window.partitionBy("query").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc())
    ideal = (j.withColumn("irank", F.row_number().over(wj))
              .groupBy("query").agg(
                  F.sum(F.when(F.col("irank") <= F.lit(int(k)),
                               _gain(F.col("grade")) /
                               _discount(F.col("irank")))
                        .otherwise(F.lit(0.0))).alias("idcg_k"),
                  F.sum((F.col("grade") >= F.lit(int(rel_threshold)))
                        .cast("long")).alias("n_rel")))

    out = (per_q.join(ideal, "query", "left")
           .withColumn("idcg_k", F.coalesce("idcg_k", F.lit(0.0)))
           .withColumn("n_rel", F.coalesce("n_rel", F.lit(0))))
    return out.select(
        "query",
        F.col("n_ret").cast("long").alias("n_ret"),
        F.col("n_rel").cast("long").alias("n_rel"),
        (F.col("rel_ret") / F.col("n_ret")).alias("precision_k"),
        F.when(F.col("n_rel") > 0, F.col("rel_ret") / F.col("n_rel"))
         .otherwise(F.lit(0.0)).alias("recall_k"),
        F.when(F.col("first_rel").isNotNull(),
               F.lit(1.0) / F.col("first_rel"))
         .otherwise(F.lit(0.0)).alias("rr"),
        F.when(F.col("idcg_k") > 0, F.col("dcg_k") / F.col("idcg_k"))
         .otherwise(F.lit(0.0)).alias("ndcg_k"),
    )


def rank_eval_summary(per_query):
    """Mean of each metric over the evaluated queries (the single-number
    MRR / mean-nDCG@k a regression gate tracks). One row:
    (n_queries, precision_k, recall_k, mrr, ndcg_k)."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.avg("precision_k").alias("precision_k"),
        F.avg("recall_k").alias("recall_k"),
        F.avg("rr").alias("mrr"),
        F.avg("ndcg_k").alias("ndcg_k"),
    )


def pad_zero_queries(per: list, queries, judgment_rows,
                     rel_threshold: int = 1) -> list:
    """Driver-side convention shared by the daemon and the CLI: a query
    with NO run rows must surface as an explicit all-zero metric row
    (ES reports metric_score 0) so a regression that kills a query's
    recall drags the mean DOWN instead of silently vanishing from it.

    ``per``: collected rank_eval row dicts; ``queries``: the full
    requested query list; ``judgment_rows``: (query, doc_id, grade)
    triples — n_rel for a zero row replays rank_eval's max-grade
    collapse. Returns per + zero rows (input list untouched)."""
    best: dict = {}
    for q, d, g in judgment_rows:
        key = (q, d)
        best[key] = max(best.get(key, 0), int(g))
    out = list(per)
    seen = {r["query"] for r in out}
    for q in queries:
        if q in seen:
            continue
        seen.add(q)
        n_rel = sum(1 for (qq, _d), g in best.items()
                    if qq == q and g >= int(rel_threshold))
        out.append({"query": q, "n_ret": 0, "n_rel": n_rel,
                    "precision_k": 0.0, "recall_k": 0.0,
                    "rr": 0.0, "ndcg_k": 0.0})
    return out


def mean_summary(per: list) -> dict:
    """Python-side means over collected per-query rows (one job fewer
    than re-aggregating the frame; identical arithmetic). All-zero with
    n_queries=0 on an empty list — never NULL/None."""
    n = len(per)
    out = {m: (sum(r[m] for r in per) / n if n else 0.0)
           for m in ("precision_k", "recall_k", "rr", "ndcg_k")}
    out["n_queries"] = n
    return out
