"""End-to-end training-data curation: one operator composing the corpus
pipeline a large-scale LLM-data build runs over raw documents —

1. **quality filter** (:func:`..ops.text.quality_cols` score < ``min_quality``
   → removed, reason ``low_quality``),
2. **language filter** (predicted :func:`..ops.text.langid_col` not in
   ``langs`` → reason ``lang``),
3. **exact dedup** (md5 fingerprint; every group keeps its min doc_id,
   the rest → reason ``exact_dup``),
4. **near-dup removal** (MinHash→LSH banded candidates, verified by exact
   n-gram Jaccard ≥ ``threshold``, connected components; every cluster
   keeps its min doc_id, the rest → reason ``near_dup``),

returning a per-doc disposition ``(doc_id, keep, reason)`` over the FULL
input — an auditable curation ledger, not just the surviving subset.

Stage order is semantic, not cosmetic: dedup runs over the quality+lang
survivors only (a removed doc must never be the retained representative of
a dup group), and near-dup runs over exact-dedup survivors (exact dups
would otherwise re-enter as trivial jaccard-1.0 clusters). The DuckDB
mirror (:func:`duckdb_curate_sql`) composes the same stages as CTEs so the
whole pipeline is value-hash oracle-gated.

Scale: every stage is the already-bucketed operator it delegates to — the
quality/langid stage is pure column expressions, exact dedup one hash
aggregate, candidates come from the banded LSH bucket join (never
all-pairs), Jaccard is verified ONLY on candidate pairs (pair × shingle
joins bounded by candidate count), and components use the lineage-truncated
min-label loop. No collects, no driver loops; reason frames join back on
doc_id.
"""

from __future__ import annotations

from .dedup import (LSH_BANDS, MINHASH_K, N_SHINGLE, doc_shingles,
                    duckdb_minhash_sql, duckdb_shingles, lsh_candidate_pairs)
from .text import duckdb_langid_sql, duckdb_quality_sql, langid_col, quality_cols

REASONS = ("kept", "contaminated", "low_quality", "lang", "exact_dup",
           "near_dup")


def verified_neardup_pairs(docs, cand, text_col="text", id_col="doc_id",
                           threshold: float = 0.5, n: int = N_SHINGLE):
    """Exact n-gram Jaccard computed ONLY over LSH candidate pairs — the
    scale-honest verify step (intersections via pair×shingle joins bounded
    by the candidate count, never the all-pairs shingle self-join).
    Returns (doc_a, doc_b) with jaccard ≥ threshold (round-4, matching
    :func:`..ops.dedup.jaccard_pairs`)."""
    from pyspark.sql import functions as F

    sh = doc_shingles(docs, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("sz").alias("sz_b")), "doc_b")
        .where(F.round(F.col("inter")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4)
               >= threshold)
        .select("doc_a", "doc_b")
    )


def curate(docs, text_col="text", id_col="doc_id", min_quality: float = 0.55,
           langs: tuple = ("en",), k: int = MINHASH_K, bands: int = LSH_BANDS,
           threshold: float = 0.5, n: int = N_SHINGLE,
           bench=None, bench_text_col: str = "text", decontam_n: int = 13,
           gopher: bool = False, gopher_min_words: int = 50):
    """Per-doc curation ledger ``(doc_id, keep, reason)`` — see module doc.
    ``keep`` is int 0/1 (portable across oracle hash comparison).

    With ``bench`` set, benchmark decontamination (the 13-gram rule of
    :func:`..ops.dedup.decontaminate`) runs as stage 0 with the HIGHEST
    precedence (reason ``contaminated``): an eval-tainted doc must leave
    the corpus regardless of its quality, and must never survive as the
    retained representative of a dup group. Same broadcast bench-gram
    shape — a semi-join flag, no per-doc count needed here.

    With ``gopher=True`` the Gopher rule filter (:func:`..ops.text.
    gopher_cols`) runs after decontamination and before the quality score
    (reason ``gopher``) — the standard rule-based cut ahead of the
    model/score-based one, zero extra shuffle (pure columns on the same
    scan)."""
    from pyspark.sql import functions as F

    from .dedup import dup_clusters, shingles_col
    from .text import gopher_cols

    gcols = ((gopher_cols(F.col(text_col),
                          min_words=gopher_min_words)[-1],)
             if gopher else ())
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *quality_cols(F.col(text_col)),
        langid_col(F.col(text_col)).alias("lang"),
        *gcols,
    )
    if bench is not None:
        bg = (bench.select(F.explode(
                  shingles_col(F.col(bench_text_col), decontam_n))
                  .alias("shingle")).distinct())
        hit = (docs.select(F.col(id_col).alias("doc_id"), F.explode(
                   shingles_col(F.col(text_col), decontam_n))
                   .alias("shingle"))
               .join(F.broadcast(bg), "shingle")
               .select("doc_id").distinct()
               .withColumn("reason_dc", F.lit("contaminated")))
        base = base.join(hit, "doc_id", "left")
    else:
        base = base.withColumn("reason_dc", F.lit(None).cast("string"))
    rule_chain = (
        F.when(F.col("gopher_pass") == 0, F.lit("gopher")) if gopher
        else F.when(F.lit(False), F.lit("gopher")))
    base = base.withColumn(
        "reason0",
        F.coalesce(
            F.col("reason_dc"),
            rule_chain
            .when(F.col("quality") < min_quality, F.lit("low_quality"))
            .when(~F.col("lang").isin(*langs), F.lit("lang"))),
    )
    s1 = base.where(F.col("reason0").isNull()).select("doc_id", "text")

    fp = s1.select("doc_id", "text",
                   F.md5(F.col("text").cast("binary")).alias("fp"))
    keep_ids = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    # pin the exact-dedup frame ONCE (lineage truncation): fp2 feeds
    # three independent legs — the LSH candidate DAG, the Jaccard verify
    # joins, and the final reason join — each of which would otherwise
    # re-run the quality/langid scan + md5 shuffle from the source. One
    # materialization of (id, text, fp, keep_id), read three times; the
    # same persist-the-reused-frame rule the recipe applies to its
    # survivor set.
    fp2 = fp.join(keep_ids, "fp").withColumn(
        "reason1",
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("exact_dup"))) \
        .localCheckpoint()
    s2 = fp2.where(F.col("reason1").isNull()).select("doc_id", "text")

    cand = lsh_candidate_pairs(s2, k=k, bands=bands, n=n)
    edges = verified_neardup_pairs(s2, cand, threshold=threshold, n=n)
    clusters = dup_clusters(edges)
    r2 = (clusters.where(F.col("doc_id") != F.col("cluster_id"))
          .select("doc_id", F.lit("near_dup").alias("reason2")))

    out = (
        base.select("doc_id", "reason0")
        .join(fp2.select("doc_id", "reason1"), "doc_id", "left")
        .join(r2, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("reason0", "reason1", "reason2",
                       F.lit("kept")).alias("reason"),
        )
        .withColumn("keep", (F.col("reason") == "kept").cast("int"))
    )
    return out.select("doc_id", "keep", "reason")


def duckdb_curate_sql(table: str = "documents", min_quality: float = 0.55,
                      langs: tuple = ("en",), k: int = MINHASH_K,
                      bands: int = LSH_BANDS, threshold: float = 0.5,
                      n: int = N_SHINGLE, bench_where: str | None = None,
                      decontam_n: int = 13,
                      gopher: bool = False,
                      gopher_min_words: int = 50) -> str:
    """DuckDB mirror of :func:`curate` — the same stages as one
    recursive-CTE chain (components via transitive closure, like
    :func:`..ops.dedup.duckdb_dup_clusters_sql`). With ``bench_where``,
    the decontamination stage 0 mirrors ``curate(bench=...)`` using the
    bench slice ``SELECT ... FROM {table} WHERE {bench_where}``."""
    r = k // bands
    lang_list = ", ".join(f"'{L}'" for L in langs)
    dc_ctes, dc_case = "", ""
    if bench_where is not None:
        sh = duckdb_shingles("text", decontam_n)
        dc_ctes = f"""bg AS (
  SELECT DISTINCT unnest({sh}) AS shingle FROM {table} WHERE {bench_where}
),
dchit AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest({sh}) AS shingle FROM {table}
  ) WHERE shingle IN (SELECT shingle FROM bg)
),
"""
        dc_case = ("WHEN doc_id IN (SELECT doc_id FROM dchit) "
                   "THEN 'contaminated'\n              ")
    gop_col, gop_case = "", ""
    if gopher:
        from .text import duckdb_gopher_sql

        gop_col = f", {duckdb_gopher_sql('text', min_words=gopher_min_words)}"
        gop_case = "WHEN gopher_pass = 0 THEN 'gopher'\n              "
    return f"""
WITH RECURSIVE {dc_ctes}scored AS (
  SELECT doc_id, text, {duckdb_quality_sql('text')},
         {duckdb_langid_sql('text')} AS lang{gop_col}
  FROM {table}
),
r0 AS (
  SELECT doc_id, text,
         CASE {dc_case}{gop_case}WHEN quality < {min_quality} THEN 'low_quality'
              WHEN lang NOT IN ({lang_list}) THEN 'lang' END AS reason0
  FROM scored
),
s1 AS (SELECT doc_id, text FROM r0 WHERE reason0 IS NULL),
fp AS (SELECT doc_id, text, md5(text) AS fp FROM s1),
keep_ids AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY fp),
r1 AS (
  SELECT f.doc_id,
         CASE WHEN f.doc_id != k.keep_id THEN 'exact_dup' END AS reason1
  FROM fp f JOIN keep_ids k USING (fp)
),
s2 AS (
  SELECT f.doc_id, f.text FROM fp f JOIN keep_ids k USING (fp)
  WHERE f.doc_id = k.keep_id
),
mh AS ({duckdb_minhash_sql('s2', 'doc_id', 'text', k=k, n=n)}),
bandt AS (
  SELECT doc_id, (seed // {r})::INT AS band,
         md5(string_agg(seed::VARCHAR || ':' || minhash, '|'
             ORDER BY seed::VARCHAR || ':' || minhash)) AS band_hash
  FROM mh GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandt a JOIN bandt b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
sh2 AS (
  SELECT doc_id, unnest({duckdb_shingles('text', n)}) AS shingle FROM s2
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh2 a ON a.doc_id = c.doc_a
  JOIN sh2 b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE round(i.inter::DOUBLE / (sa.sz + sb.sz - i.inter), 4) >= {threshold}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT rc.src, e.dst FROM reach rc JOIN edges e ON rc.dst = e.src
),
clusters AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
),
r2 AS (
  SELECT doc_id, 'near_dup' AS reason2 FROM clusters
  WHERE doc_id != cluster_id
)
SELECT r0.doc_id,
       (coalesce(r0.reason0, r1.reason1, r2.reason2, 'kept') = 'kept')::INT
         AS keep,
       coalesce(r0.reason0, r1.reason1, r2.reason2, 'kept') AS reason
FROM r0
LEFT JOIN r1 USING (doc_id)
LEFT JOIN r2 USING (doc_id)"""
