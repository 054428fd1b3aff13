"""Hashed multinomial Naive Bayes text classifier — the trained
quality / domain classifier slot of an LLM curation stack (CCNet trains
a fastText model to keep "Wikipedia-like" CommonCrawl text, Wenzek et
al. 2020; GPT-3 filters with a trained quality classifier, Brown et al.
2020 App. A). Re-expressed Spark-first as CLOSED-FORM Naive Bayes, so
there is no gradient loop to schedule:

- **training is ONE aggregation pass**: explode tokens → hashed feature
  → ``groupBy(label, feature).count`` (partial-agg; the reduce moves at
  most |labels|·n_features rows — bounded by the model, NOT the corpus)
  plus a |labels|-row doc/token-total aggregate.
- **scoring is map-side + one bounded aggregate**: explode → broadcast
  join against the model (≤ |labels|·n_features rows ≈ 40 MB at 10
  labels × 2¹⁸ buckets — always broadcastable) → ``groupBy(doc, label)``
  partial-agg → argmax via ``max(struct(...))`` (no window, no second
  shuffle). Work is one linear scan of the corpus at ANY corpus size.

Feature hashing is cross-engine-exact so the DuckDB oracle replays
training AND inference bit-for-bit:
``feature = int(md5(token)[:15], 16) % n_features`` — Spark
``conv(substring(md5(tok),1,15),16,10)`` ≡ DuckDB
``('0x' || substring(md5(tok),1,15))::UBIGINT`` ≡ Python
``int(hashlib.md5(tok).hexdigest()[:15], 16)`` (15 hex digits < 2⁶⁰:
exact in BIGINT/conv, no overflow anywhere).

Model (Laplace smoothing ``alpha``, B = n_features):

    score(d, L) = ln(n_docs(L) / N)
                  + Σ_tok ln((cnt(L, feat(tok)) + α) / (tot(L) + α·B))

folded for the sparse join as
``Σ_present ln((cnt+α)/α) + n_tok·ln(α/(tot+α·B)) + ln prior`` so absent
(label, feature) pairs cost nothing. Prediction = argmax with the total
(score desc, label asc) tie order.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..tokenizer import tokens_col

__all__ = ["nb_train", "nb_score", "duckdb_nb_sql"]


def _feature_col(tok_col, n_features: int):
    return (F.conv(F.substring(F.md5(tok_col), 1, 15), 16, 10)
            .cast("long") % F.lit(int(n_features)))


def nb_train(docs, label_col: str, text_col: str = "text",
             n_features: int = 2 ** 18):
    """One-pass NB training. Returns ``(model, label_stats)``:
    ``model`` = (label, feature, cnt) — observed counts only (sparse);
    ``label_stats`` = (label, n_docs, n_tokens). Multinomial counting:
    every token OCCURRENCE is one count (tf matters, like fastText's
    bag-of-words input)."""
    lab = F.col(label_col).alias("label")
    tok = docs.select(lab, F.explode(tokens_col(text_col)).alias("tok"))
    model = (tok.select("label",
                        _feature_col(F.col("tok"), n_features)
                        .alias("feature"))
             .groupBy("label", "feature")
             .agg(F.count("*").cast("long").alias("cnt")))
    label_stats = (docs.select(lab, F.size(tokens_col(text_col)).alias("nt"))
                   .groupBy("label")
                   .agg(F.count("*").cast("long").alias("n_docs"),
                        F.sum("nt").cast("long").alias("n_tokens")))
    return model, label_stats


def nb_score(docs, model, label_stats, text_col: str = "text",
             id_col: str = "doc_id", n_features: int = 2 ** 18,
             alpha: float = 1.0, keep_scores: bool = False):
    """Classify every doc. Returns (doc_id, label, score) — the argmax
    row per doc under (score desc, label asc), or the FULL
    |docs| × |labels| score matrix when ``keep_scores`` (for thresholded
    keep/drop curation: filter on the positive class's score margin).

    ``label_stats`` is collected (|labels| rows) to build the per-label
    prior / default-contribution literals; the model itself stays
    distributed and is broadcast into the feature join."""
    import math

    B = int(n_features)
    a = float(alpha)
    stats = [(r["label"], int(r["n_docs"]), int(r["n_tokens"]))
             for r in label_stats.collect()]
    if not stats:
        raise ValueError("empty label_stats — train first")
    n_total = sum(nd for _, nd, _ in stats)
    # r = asc label rank; argmax tie-break (score desc, label asc) is
    # max(struct(score, -r)) — no window function
    labels = docs.sparkSession.createDataFrame(
        [(lab, math.log(nd / n_total), math.log(a / (nt + a * B)), -i)
         for i, (lab, nd, nt) in enumerate(sorted(stats))],
        "label string, logprior double, dflt double, neg_r int")
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(tokens_col(text_col)).alias("tok"))
    feats = toks.select("doc_id",
                        _feature_col(F.col("tok"), B).alias("feature"))
    # present-feature adjustments: ln((cnt+α)/α), summed per (doc, label)
    adj = (feats.join(F.broadcast(model), "feature")
           .groupBy("doc_id", "label")
           .agg(F.sum(F.log((F.col("cnt") + F.lit(a)) / F.lit(a)))
                .alias("adj")))
    dl = docs.select(F.col(id_col).alias("doc_id"),
                     F.size(tokens_col(text_col)).alias("n_tok"))
    scores = (dl.crossJoin(F.broadcast(labels))
              .join(adj, ["doc_id", "label"], "left")
              .select("doc_id", "label", "neg_r",
                      (F.coalesce(F.col("adj"), F.lit(0.0))
                       + F.col("n_tok") * F.col("dflt")
                       + F.col("logprior")).alias("score")))
    if keep_scores:
        return scores.select("doc_id", "label", "score")
    best = (scores.groupBy("doc_id")
            .agg(F.max(F.struct("score", "neg_r", "label")).alias("b"))
            .select("doc_id", F.col("b.label").alias("label"),
                    F.col("b.score").alias("score")))
    return best


def duckdb_nb_sql(label_col: str, text_col: str = "text",
                  id_col: str = "doc_id", n_features: int = 2 ** 18,
                  alpha: float = 1.0, table: str = "documents",
                  score_round: int = 4) -> str:
    """DuckDB replay of train-on-``table`` + score-``table`` (the gate
    shape): identical tokenization (``duckdb_tokens_sql``), identical
    md5 feature hash, identical fold. Returns
    (doc_id, label, score_e{score_round}) — per-doc argmax with the
    (score desc, label asc) tie order."""
    from ..tokenizer import duckdb_tokens_sql

    B = int(n_features)
    a = float(alpha)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {label_col} AS label,
         {duckdb_tokens_sql(text_col)} AS toks
  FROM {table}
),
tok AS (SELECT doc_id, label, unnest(toks) AS tok FROM d),
feat AS (
  SELECT doc_id, label,
         (('0x' || substring(md5(tok), 1, 15))::UBIGINT % {B})::BIGINT
           AS feature
  FROM tok
),
model AS (
  SELECT label, feature, count(*)::BIGINT AS cnt
  FROM feat GROUP BY 1, 2
),
ls AS (
  SELECT label, count(*)::BIGINT AS n_docs,
         sum(len(toks))::BIGINT AS n_tokens
  FROM d GROUP BY 1
),
labels AS (
  SELECT label,
         ln(n_docs::DOUBLE / (SELECT sum(n_docs) FROM ls)) AS logprior,
         ln({a!r} / (n_tokens + {a!r} * {B})) AS dflt
  FROM ls
),
adj AS (
  SELECT f.doc_id, m.label, sum(ln((m.cnt + {a!r}) / {a!r})) AS adj
  FROM feat f JOIN model m USING (feature)
  GROUP BY 1, 2
),
dl AS (SELECT doc_id, len(toks)::BIGINT AS n_tok FROM d),
scores AS (
  SELECT dl.doc_id, L.label,
         COALESCE(a.adj, 0.0) + dl.n_tok * L.dflt + L.logprior AS score
  FROM dl CROSS JOIN labels L
  LEFT JOIN adj a ON a.doc_id = dl.doc_id AND a.label = L.label
),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rn
  FROM scores
)
SELECT doc_id, label,
       CAST(round(score * {10 ** score_round}) AS BIGINT)
         AS score_e{score_round}
FROM ranked WHERE rn = 1"""
