"""Hybrid lexical + vector retrieval with reciprocal-rank fusion — the
Elasticsearch 8 ``rrf`` retriever / OpenSearch hybrid-search surface: one
query runs BOTH the BM25 index and a kNN pass over an embedding column,
and the two rankings fuse by Cormack et al. 2009's reciprocal-rank
formula

    rrf(doc) = Σ_legs  weight_leg / (rank_constant + rank_leg(doc))

(a doc absent from a leg's top-``window`` contributes nothing for that
leg). RRF is THE production fusion default because it needs no score
calibration: BM25 scores and cosine similarities live on incomparable
scales, but ranks always compare — which is also why the fused score is
gate-stable (a pure function of small integer ranks).

The reference has exactly the two-stream mix shape this generalizes —
``SearchMixer.search`` concatenates a typedb stream and a sourcedb
stream and re-sorts (SearchMixer.java:34-61) — but mixes RAW scores from
two different Lucene scorers (incomparable, and with the ascending-sort
bug); RRF is the principled version of the same mixer, with the second
leg a vector kNN instead of a prefix index.

100 TB shape: each leg is its own already-scaled top-``window`` job (the
pruned-scan BM25 kernel; exact or IVF-pruned cosine), so fusion sees
2×window rows total — the Window ranks and the full-outer join run on
frames that fit one task whatever the corpus size. Use
``ivf_topk``/``ivf_topk_sq`` output as the vector leg at 10⁹+ vectors;
any (id, sim)-shaped frame plugs in via ``vec_leg``.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "hybrid_search_df"]


def _ranked(df, score_col: str, id_col: str, rank_name: str, window: int):
    """Top-``window`` rows ranked 1..window by (score desc, id asc). The
    input is a leg's result (≤ its own top-k), never a corpus frame —
    the unpartitioned Window is bounded by construction."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (df.withColumn(rank_name, F.row_number().over(w))
              .where(F.col(rank_name) <= F.lit(int(window)))
              .select(F.col(id_col).alias("doc_id"), rank_name))


def rrf_fuse(legs, k: int = 10, rank_constant: int = 60,
             weights=None, window: int = 100):
    """Fuse N ranked legs. ``legs``: list of (df, score_col, id_col) —
    each df one retrieval result. Returns top-``k``
    (doc_id, rrf, rank_leg0..N) by (rrf desc, doc_id asc); absent legs
    rank 0 and contribute 0.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    weights = list(weights) if weights is not None else [1.0] * len(legs)
    if len(weights) != len(legs):
        raise ValueError(f"{len(legs)} legs but {len(weights)} weights")
    fused = None
    names = []
    for i, (df, score_col, id_col) in enumerate(legs):
        name = f"rank_leg{i}"
        names.append(name)
        r = _ranked(df, score_col, id_col, name, window)
        fused = r if fused is None else fused.join(r, "doc_id", "full_outer")
    out = fused
    score = F.lit(0.0)
    for i, name in enumerate(names):
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
        score = score + F.when(
            F.col(name) > 0,
            F.lit(float(weights[i]))
            / (F.lit(int(rank_constant)) + F.col(name))).otherwise(F.lit(0.0))
    out = out.withColumn("rrf", score)
    out = out.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return out.select("doc_id", "rrf", *names).limit(int(k)) \
        if k is not None else out.select("doc_id", "rrf", *names)


def hybrid_search_df(engine, query: str, vectors, query_vec,
                     k: int = 10, window: int = 100, rank_constant: int = 60,
                     weights=(1.0, 1.0), mode: str = "or",
                     vec_id_col: str = "vec_id", vec_col: str = "embedding",
                     vec_leg=None, filter_query: str | None = None):
    """BM25 + cosine-kNN hybrid search over one doc-id space.

    ``vectors``: embedding frame whose ``vec_id_col`` shares the index's
    doc_id space (the transcripts/documents convention here); pass a
    prebuilt ``vec_leg`` (id, sim) frame instead — e.g. ``ivf_topk``
    output — to swap in the IVF/SQ scale path. Returns top-``k``
    (doc_id, rrf, rank_leg0, rank_leg1) where leg0 is lexical, leg1 is
    vector; both legs are cut at ``window`` before fusing (the ES
    rank_window_size contract: fusion only sees what either leg
    surfaced).

    ``filter_query`` (the ES filtered-kNN contract): a constant-score
    FILTER applied to BOTH legs pre-ranking — computed ONCE via the
    engine's own FILTER context (``_filter_docs_df``: the same routing
    ``search_df(filter_query=...)`` uses, so the two legs constrain to
    the IDENTICAL doc set regardless of the main query's ``mode``),
    materialized (localCheckpoint), then fed to the lexical kernel as
    the include set and to the vector leg as a semi-join BEFORE the
    top-``window`` cut — so the vector leg returns up to ``window``
    docs that all satisfy the filter (post-filtering a kNN result would
    silently under-fill it; ES pre-filters for the same reason). The
    materialized set is |filter match| ids — on a very broad filter at
    extreme scale prefer restricting the vectors frame upstream.
    """
    from ..ops.similarity import cosine_topk

    filter_docs = None
    if filter_query is not None:
        filter_docs = engine._filter_docs_df(filter_query) \
                            .localCheckpoint(eager=True)
        allowed = filter_docs.select("doc_id").distinct()
        if vectors is not None:
            vectors = vectors.join(
                allowed.withColumnRenamed("doc_id", vec_id_col),
                vec_id_col, "left_semi")
        if vec_leg is not None:
            vec_leg = vec_leg.join(
                allowed.withColumnRenamed("doc_id", vec_leg.columns[0]),
                vec_leg.columns[0], "left_semi")
    lex = engine.search_df(query, k=int(window), mode=mode,
                           filter_docs=filter_docs) \
                .select("doc_id", "score")
    if vec_leg is None:
        vec_leg = cosine_topk(vectors, query_vec, k=int(window),
                              vec_col=vec_col, id_col=vec_id_col)
    vec = vec_leg.select(F.col(vec_leg.columns[0]).alias("vid"),
                         F.col("sim"))
    return rrf_fuse([(lex, "score", "doc_id"), (vec, "sim", "vid")],
                    k=k, rank_constant=rank_constant, weights=weights,
                    window=window)
