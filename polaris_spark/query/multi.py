"""Federated multi-index search — the Lucene ``MultiReader`` /
Elasticsearch ``dfs_query_then_fetch`` surface: one query over N index
directories (time-partitioned generations, per-tenant indices, a hot
index plus cold archives) with GLOBALLY-consistent scoring.

Semantics (exactly MultiReader's): corpus statistics merge FIRST —
``N = Σ Nᵢ``, ``avgdl = Σ sum_dlᵢ / N``, ``df(t) = Σ dfᵢ(t)`` — and
every index's kernels score against the MERGED stats, so a document's
score is bit-identical to what one monolithic index over the union
would produce (that identity IS the gate: two half-indices federated
== the full index, same DuckDB oracle). ES's default
``query_then_fetch`` scores each shard with LOCAL stats and merges
incomparable scores; this is the dfs_ (global) variant, the correct
one.

Spark shape: phase 1 (stats merge) is one tiny per-index
``groupBy(term).sum(df)`` over already-pruned candidate rows —
|query terms| rows each, driver-merged. Phase 2 runs each index's
UNCHANGED per-shard kernel exchange (:meth:`_flat_scored_df` with the
global idf map and an ``avgdl`` override) — indices score in parallel
as independent Spark jobs on one DAG (the union below makes them one
multi-child plan). Phase 3 is a union + ONE TakeOrderedAndProject over
≤ N·k rows. Nothing corpus-sized ever centralizes; adding an index adds
one pruned scan.

Doc identity: rows carry ``index_id`` (the position in ``dirs``) —
doc_ids need not be globally unique across indices (Lucene's docBase
equivalent); the total order is (score desc, doc_id asc, index_id asc) —
doc_id before index_id so equal-score docs rank exactly as the
monolithic engine ranks them.
"""
from __future__ import annotations

from .engine import _idf


def search_multi_df(spark, dirs: list[str], query: str,
                    k: int | None = 10, mode: str = "or",
                    expand_fields: bool = False):
    """Search every index in ``dirs`` under merged global stats. Returns
    (index_id, doc_id, score, n_match) — top-k overall by
    (score desc, doc_id asc, index_id asc); ``k=None`` returns the full
    federated match set. The flat parser surface applies (boosts,
    prohibits, ``field:``); each index's prohibit exclusion runs against
    its own postings (a doc lives in exactly one index)."""
    from pyspark.sql import functions as F

    from .engine import SearchEngine

    if not dirs:
        raise ValueError("search_multi_df needs at least one index dir")
    engines = [SearchEngine(spark, d) for d in dirs]
    terms0, _exc0, _b0 = engines[0].parse_query_boosts(query, expand_fields)
    if not terms0:
        return spark.createDataFrame(
            [], "index_id int, doc_id bigint, score double, n_match int")
    # NOTE: wildcard/fuzzy chunks expand against EACH index's dictionary;
    # for global consistency the union of expansions is used everywhere
    all_terms: set[str] = set()
    per_parsed = []
    for e in engines:
        t_i, exc_i, boosts_i = e.parse_query_boosts(query, expand_fields)
        per_parsed.append((t_i, exc_i, boosts_i))
        all_terms.update(t_i)
    terms_u = sorted(all_terms)
    # phase 1 — dfs: merged df per term + merged N / avgdl
    df_g: dict[str, int] = {}
    N_g, sumdl_g = 0, 0.0
    cands = []
    for e in engines:
        cand = e._cache_scoped(e._candidates(terms_u))
        cands.append(cand)
        for r in cand.groupBy("term").agg(F.sum("df").alias("df")).collect():
            df_g[r["term"]] = df_g.get(r["term"], 0) + int(r["df"])
        N_g += int(e.stats["N"])
        sumdl_g += float(e.stats["sum_dl"])
    if not df_g:
        return spark.createDataFrame(
            [], "index_id int, doc_id bigint, score double, n_match int")
    avgdl_g = sumdl_g / max(1, N_g)
    merged_boosts = {}
    for _t, _e, b in per_parsed:
        merged_boosts.update(b or {})
    idf_g = {t: _idf(N_g, d) * merged_boosts.get(t, 1.0)
             for t, d in df_g.items()}
    # phase 2+3 — per-index kernels with global stats, one union, one cut
    out = None
    nq = len(terms_u)
    for i, e in enumerate(engines):
        exc_i = per_parsed[i][1]
        part = (e._flat_scored_df(cands[i], idf_g, k, mode, nq,
                                  exc_terms=exc_i, avgdl=avgdl_g)
                .select(F.lit(i).cast("int").alias("index_id"),
                        "doc_id", "score", "n_match"))
        out = part if out is None else out.unionByName(part)
    # tie order (score desc, DOC_ID asc, index_id asc): equal-score docs
    # rank exactly as the monolithic engine ranks them (measured: the
    # old index_id-first order diverged from the monolithic top-k on
    # cross-index score ties at bench scale — same members, same scores,
    # swapped rows); index_id last keeps the order total when federated
    # indexes contain colliding doc_ids
    out = out.orderBy(F.desc("score"), F.asc("doc_id"), F.asc("index_id"))
    return out.limit(int(k)) if k is not None else out
