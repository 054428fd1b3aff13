"""Dataset-card report — the one-page statistics sheet a training-data
team publishes with every corpus drop (docs/tokens/length spread/language
mix/dup rate/quality), assembled from this repo's already-gated signal
columns in TWO passes over the corpus:

1. ONE codegen projection carrying every signal column (fingerprint,
   langid, quality, token counts — all pure column expressions, zero
   Python) feeding ONE global aggregate: counts, token/char sums, mean
   quality, length percentiles, distinct-fingerprint count (the exact-dup
   rate). All partial-aggregated; ``exact=False`` swaps the two
   value-buffered aggregates for their sketch forms
   (``approx_count_distinct`` / ``percentile_approx`` — the 10^12-doc
   path, same discipline as cardinality/percentiles aggs).
2. One tiny groupBy for the language mix (≤ |languages| rows) and,
   when ``group_col`` is given, a per-source breakdown (≤ |sources| rows).

The output is a plain driver-sized dict — scalars plus the small maps —
ready to serialize as the dataset card. Correctness rides on the
underlying gated columns (fingerprint / langid / quality_score /
token_counts / dedup_exact all have DuckDB oracles); the tests here pin
the report's numbers to those ops' own outputs.
"""

from __future__ import annotations


def corpus_report(docs, text_col: str = "text", id_col: str = "doc_id",
                  group_col: str | None = None, exact: bool = True,
                  percentiles=(0.5, 0.9, 0.99)):
    from pyspark.sql import functions as F

    from .text import (
        fingerprint_col,
        langid_col,
        quality_cols,
        token_count_cols,
    )

    t = F.col(text_col)
    n_ws, n_terms = token_count_cols(t)
    proj = docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_col(t).alias("fp"),
        langid_col(t).alias("lang"),
        n_ws, n_terms,
        F.length(t).alias("n_chars"),
        *quality_cols(t),
    )
    qlist = [float(q) for q in percentiles]
    nd = (F.count_distinct(F.col("fp")) if exact
          else F.approx_count_distinct(F.col("fp")))
    pct = (F.percentile(F.col("n_ws_tokens").cast("double"), F.lit(qlist))
           if exact else
           F.percentile_approx(F.col("n_ws_tokens").cast("double"),
                               F.lit(qlist), F.lit(10000)))
    g = proj.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws_tokens").alias("n_ws_tokens"),
        F.sum("n_terms").alias("n_terms"),
        F.sum("n_chars").alias("n_chars"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
        pct.alias("len_pct"),
        nd.alias("n_distinct_fp"),
    ).collect()[0]
    langs = {r["lang"]: r["n"] for r in
             proj.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = {
        "n_docs": int(g["n_docs"]),
        "n_ws_tokens": int(g["n_ws_tokens"] or 0),
        "n_terms": int(g["n_terms"] or 0),
        "n_chars": int(g["n_chars"] or 0),
        "mean_quality": float(g["mean_quality"] or 0.0),
        "length_percentiles": {
            str(q): float(v) for q, v in zip(qlist, g["len_pct"] or [])},
        "n_distinct_fingerprints": int(g["n_distinct_fp"]),
        "exact_dup_rate": round(
            1.0 - g["n_distinct_fp"] / g["n_docs"], 6) if g["n_docs"] else 0.0,
        "languages": {k: int(v) for k, v in sorted(langs.items())},
        "exact": bool(exact),
    }
    if group_col is not None:
        from .text import _ws_tokens_col

        rows = (docs.groupBy(group_col)
                .agg(F.count("*").alias("n"),
                     F.sum(F.size(_ws_tokens_col(t))).alias("toks"))
                .collect())
        out["groups"] = {
            str(r[group_col]): {"n_docs": int(r["n"]),
                                "n_ws_tokens": int(r["toks"] or 0)}
            for r in rows}
    return out
