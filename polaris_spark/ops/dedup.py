"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All hashing is md5-based so the SAME signatures are computable in Spark
(built-in ``md5``/``concat`` — JVM-side), DuckDB (oracle gate) and Python.
No engine-specific hash (xxhash64/hash) crosses an implementation boundary.

Scale notes: the candidate-pair generators are LSH-banded (MinHash) or
shingle-join based — at 10^12 docs the shingle join is the shuffle to watch;
band-bucket joins bound it to colliding buckets only. Exact dedup is a single
hash-aggregate. The verify step (exact Jaccard on candidates) touches only
candidate pairs.
"""

from __future__ import annotations

N_SHINGLE = 3        # word n-gram size
MINHASH_K = 16       # signature length
LSH_BANDS = 4        # bands of r = K/BANDS rows
SIMHASH_BITS = 16    # md5-hex nibbles used (16 nibbles = 64 bits via 4b/nibble)


def _ws_tokens(col):
    from pyspark.sql import functions as F

    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def shingles_col(text_col, n: int = N_SHINGLE):
    """Distinct word n-gram shingles of lowercased text (array<string>).
    Docs with fewer than n words yield their full token join (single shingle)
    so every non-empty doc has at least one shingle."""
    from pyspark.sql import functions as F

    toks = _ws_tokens(F.lower(text_col))
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k > 0, F.array_distinct(grams)).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def exact_dup_groups(docs, text_col="text", id_col="doc_id"):
    """(fingerprint, n_dups, min_doc_id) per identical-text group."""
    from pyspark.sql import functions as F

    fp = F.md5(F.col(text_col).cast("binary")).alias("fp")
    return (
        docs.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_doc_id"))
    )


def doc_shingles(docs, text_col="text", id_col="doc_id", n: int = N_SHINGLE):
    from pyspark.sql import functions as F

    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
    )


def jaccard_pairs(docs, text_col="text", id_col="doc_id", threshold=0.5, n=N_SHINGLE):
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    (shingle equi-join → pair intersection counts → set-size join). At scale,
    restrict with MinHash LSH candidates first; this operator is the exact
    verifier. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    from pyspark.sql import functions as F

    sh = doc_shingles(docs, text_col, id_col, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def minhash_signatures(docs, text_col="text", id_col="doc_id", k=MINHASH_K, n=N_SHINGLE):
    """(doc_id, seed, minhash) — minhash[i] = min over shingles of
    md5(i || '|' || shingle) (lexicographic min of hex strings; uniform)."""
    from pyspark.sql import functions as F

    sh = doc_shingles(docs, text_col, id_col, n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    return (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("shingle")).cast("binary")).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_band_table(docs, text_col="text", id_col="doc_id",
                   k=MINHASH_K, bands=LSH_BANDS, n=N_SHINGLE):
    """(doc_id, band, band_hash): each doc's LSH bucket keys —
    band_hash = md5 of the band's concatenated (seed:minhash) entries.
    Shared by the batch pair join (:func:`lsh_candidate_pairs`) and the
    incremental ingest state (:func:`lsh_ingest`)."""
    from pyspark.sql import functions as F

    r = k // bands
    sig = minhash_signatures(docs, text_col, id_col, k, n)
    return (
        sig.withColumn("band", F.floor(F.col("seed") / r).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("seed").cast("string"), F.col("minhash"))
        ))).cast("binary")).alias("band_hash"))
    )


def lsh_candidate_pairs(docs, text_col="text", id_col="doc_id",
                        k=MINHASH_K, bands=LSH_BANDS, n=N_SHINGLE):
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.
    band_hash = md5 of the band's concatenated minhashes; the bucket join is
    the only pair-producing operation (bounded by true collisions)."""
    from pyspark.sql import functions as F

    bandt = lsh_band_table(docs, text_col, id_col, k, bands, n)
    a, b = bandt.alias("a"), bandt.alias("b")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_ingest(spark, new_docs, state_dir: str, text_col="text",
               id_col="doc_id", k=MINHASH_K, bands=LSH_BANDS, n=N_SHINGLE):
    """Incremental near-dup ingest — the append/streaming-time face of
    MinHash+LSH dedup: flag each NEW doc that shares an LSH band bucket
    with a PRIOR doc, then append the batch's band table to the
    persistent state under ``state_dir``. Batch dedup
    (:func:`lsh_candidate_pairs`) rescans the corpus per run; a corpus
    that grows by appends needs exactly this instead: probe new docs
    against stored buckets, cost ∝ batch, state grows by
    |batch|×bands rows.

    Priority is FIRST-SEEN-WINS (the streaming dedup convention, Lee et
    al. 2022): a prior doc is (a) anything already in the state whose id
    is not in this batch, or (b) a lower-id doc of the same batch.
    ``dup_of`` = the minimum such prior id (deterministic). Consequences,
    both tested: ingesting a corpus in id-ordered chunks — any split —
    yields EXACTLY the single-batch flags (the batch path's min-partner
    fold over a<b candidate pairs); and a REPLAYED batch reproduces its
    original flags bit-for-bit (its own docs' earlier state rows, and its
    batch-mates', are excluded by the id filter), so a foreachBatch retry
    is safe — the duplicate state rows it appends collapse in the
    distinct+min fold and never change any later probe.

    Spark shape: band computation is the shared :func:`lsh_band_table`
    (map-side groupBy); the probe is one equi-join on (band, band_hash)
    against a band-partitioned parquet state — true-collision-bounded
    like the batch path, with directory-level pruning per band; flags are
    materialized (localCheckpoint) BEFORE the state append so the probe
    can never observe the batch's own freshly-written rows.
    Returns (doc_id, dup_of) for the flagged new docs.
    """
    import os

    from pyspark.sql import functions as F

    from ..fs import get_fs

    nb = lsh_band_table(new_docs, text_col, id_col, k, bands, n) \
        .localCheckpoint(eager=True)
    bands_path = os.path.join(state_dir, "bands")
    fs = get_fs(spark, state_dir)

    me = nb.select("band", "band_hash",
                   F.col("doc_id").alias("prior_id"))
    cand = nb.join(me, ["band", "band_hash"]) \
             .where(F.col("prior_id") < F.col("doc_id")) \
             .select("doc_id", "prior_id")
    if fs.exists(bands_path):
        state = spark.read.parquet(bands_path).select(
            "band", "band_hash", F.col("doc_id").alias("prior_id"))
        batch_ids = nb.select(F.col("doc_id").alias("prior_id")).distinct()
        prior = state.join(batch_ids, "prior_id", "left_anti")
        cand = cand.unionByName(
            nb.join(prior, ["band", "band_hash"])
              .select("doc_id", "prior_id"))
    flags = (cand.distinct()
             .groupBy("doc_id").agg(F.min("prior_id").alias("dup_of"))
             .localCheckpoint(eager=True))

    nb.write.mode("append").partitionBy("band").parquet(bands_path)
    nb.unpersist()
    return flags


def simhash_col(text_col, id_col_unused=None):
    """64-bit SimHash as a hex string, portable construction:
    bit j of term t = 1 iff first hex char of md5(j || '|' || t) >= '8';
    simhash bit j = 1 iff Σ_t tf(t) * (2*bit_j(t) - 1) > 0.
    Implemented over whitespace tokens (lowercased)."""
    from pyspark.sql import functions as F

    toks = _ws_tokens(F.lower(text_col))

    def _vote(j):
        jl = str(j)

        def step(acc, t):
            bit = F.substring(
                F.md5(F.concat_ws("|", F.lit(jl), t).cast("binary")), 1, 1
            ) >= F.lit("8")
            return acc + F.when(bit, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(toks, F.lit(0), step)

    bits = [F.when(_vote(j) > 0, F.lit(1)).otherwise(F.lit(0)) for j in range(SIMHASH_BITS)]
    # pack bits (MSB first) into a hex string, nibble by nibble
    nibbles = []
    for i in range(0, SIMHASH_BITS, 4):
        v = bits[i] * 8 + bits[i + 1] * 4 + bits[i + 2] * 2 + bits[i + 3]
        nibbles.append(F.lower(F.hex(v.cast("int"))))
    return F.concat(*nibbles)


def dup_clusters(pairs, max_iter: int = 25):
    """Connected components of a candidate-pair graph → (doc_id, cluster_id)
    with ``cluster_id = min(doc_id in component)``.

    Iterative min-label propagation: each round every node takes the minimum
    label among itself and its neighbors; converges in O(graph diameter)
    rounds (dup clusters are near-cliques from LSH banding, so diameter is
    tiny — typically ≤ 3 rounds). Each round is one join + one aggregation;
    the label frame is eagerly localCheckpoint'ed (lineage truncation — the
    loop's plan would otherwise double per round) and the loop exits when the
    (count, xor-of-row-hashes) signature repeats: labels are monotonically
    non-increasing, so an identical signature means no label changed.

    Scale notes: at 10^12-doc scale with adversarial long chains use
    :func:`dup_clusters_star` (large-star/small-star, provably O(log² n)
    rounds, same join/agg primitives); min-label propagation is the right
    trade for near-clique dup graphs (LSH banding produces those) and keeps
    every round a single shuffle. Both produce identical labels (tested on
    chain graphs where propagation needs many rounds).

    ``pairs``: DataFrame (doc_a, doc_b). Returns only docs that appear in at
    least one pair (singletons are trivially their own cluster).
    """
    from pyspark.sql import functions as F

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("doc_id"),
            F.least(F.col("src"), F.col("mn")).alias("cluster_id"),
        )
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        # neighbor labels + own label → min per node
        nbr = (
            edges.join(
                labels.withColumnRenamed("doc_id", "dst"), "dst"
            )
            .select(F.col("src").alias("doc_id"), "cluster_id")
        )
        # eager localCheckpoint truncates lineage per round — the loop's
        # plan otherwise doubles each round and a long-diameter graph OOMs
        # the analyzer before the data is ever big
        new_labels = (
            nbr.unionByName(labels)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        # labels are monotonically non-increasing → unchanged signature
        # (count + xor of row hashes; a sum could overflow int64 on
        # xxhash64-derived doc ids under ANSI mode) ⇒ converged
        sig = tuple(
            new_labels.agg(
                F.count("*"), F.expr("bit_xor(xxhash64(doc_id, cluster_id))")
            ).collect()[0]
        )
        labels.unpersist()
        labels = new_labels
        if prev_sig is not None and sig == prev_sig:
            break
        prev_sig = sig
    edges.unpersist()
    return labels


def dup_clusters_star(pairs, max_iter: int = 50):
    """Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    alternating algorithm) — the adversarial-graph path: converges in
    O(log² n) rounds even on long chains, where :func:`dup_clusters`'s
    min-label propagation needs O(diameter) rounds. Each round is two
    groupBy-join passes over the edge set; edges shrink monotonically toward
    a star per component.

    - large-star: ∀u with neighborhood Γ(u), m = min(Γ(u) ∪ {u}); emit
      (v, m) for every v ∈ Γ(u) with v > u.
    - small-star: ∀u, over N = {v ∈ Γ(u) : v < u}, m = min(N ∪ {u}); emit
      (v, m) for v ∈ N ∪ {u} \\ {m}.

    Fixpoint: every component is a star rooted at its min node. Output
    contract identical to :func:`dup_clusters`: (doc_id, cluster_id =
    min doc_id of the component), only docs appearing in ≥1 pair.
    """
    from pyspark.sql import functions as F

    def _canon(e, a="a", b="b"):
        # undirected canonical form, self-loops dropped
        return (
            e.where(F.col(a) != F.col(b))
            .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
            .distinct()
        )

    def _sym(e):
        return e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def large_star(e):
        p = _sym(e)
        m = p.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("mn", F.col("u")).alias("m"))
        out = (
            p.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        return _canon(out)

    def small_star(e):
        p = _sym(e).where(F.col("v") < F.col("u"))
        m = p.groupBy("u").agg(F.min("v").alias("m"))
        nbr = (
            p.join(m, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        own = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
        return _canon(nbr.unionByName(own))

    edges = _canon(
        pairs.select(
            F.col("doc_a").cast("long").alias("a"),
            F.col("doc_b").cast("long").alias("b"),
        )
    ).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        # eager localCheckpoint TRUNCATES LINEAGE each round — the edge set
        # appears 4× per round in the plan (sym union + groupBy join), so an
        # un-checkpointed loop grows the logical plan 4^rounds and OOMs the
        # analyzer long before the data is big. On a cluster, swap for
        # reliable checkpoint(dir) if executor loss mid-job must be survivable.
        nxt = small_star(large_star(edges)).localCheckpoint()
        # order-insensitive edge-set signature: count + XOR of edge hashes
        # (bit_xor can't overflow; sum of hashes would under ANSI mode)
        sig = tuple(
            nxt.agg(
                F.count("*"), F.expr("bit_xor(xxhash64(u, v))")
            ).collect()[0]
        )
        edges.unpersist()
        edges = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    labels = (
        _sym(edges)
        .groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("doc_id"),
            F.least(F.col("u"), F.col("mn")).alias("cluster_id"),
        )
    )
    return labels


def duckdb_dup_clusters_sql(pairs_sql: str) -> str:
    """Recursive-CTE mirror of :func:`dup_clusters`: transitive closure of
    the undirected pair graph, cluster id = min reachable node."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src"""


def decontaminate(docs, bench, text_col="text", id_col="doc_id",
                  bench_text_col="text", n: int = 13):
    """Benchmark decontamination (the GPT-3 appendix-C rule, kept by
    PaLM/Llama pipelines): flag every corpus document that shares ANY
    word ``n``-gram (default 13, the published choice) with ANY
    benchmark/eval example, so the training set can be scrubbed before
    an eval score is trusted.

    Returns one row per corpus doc: ``(doc_id, n_hit_ngrams,
    contaminated)`` where ``n_hit_ngrams`` counts DISTINCT benchmark
    n-grams present in the doc. Shingling is :func:`shingles_col` on
    BOTH sides (lowercased, whitespace words; a doc shorter than ``n``
    tokens contributes its full-text join as a single gram, so an exact
    short-text match still counts — symmetric on both sides).

    Scale shape (100 TB corpus × 10^3-10^6 bench examples): the bench
    n-gram set is aggregated on the tiny side and BROADCAST, so the
    corpus pass is one map-only scan (codegen shingle explode + broadcast
    hash join); the only corpus-keyed shuffle is the per-doc count over
    HIT rows (≪ corpus). The final per-doc flag join is broadcast in
    practice (the aggregated hit set is bench-bounded; AQE picks) — a
    pipeline that only needs the CLEAN corpus should instead anti-join
    the hit set and skip the per-doc flag row entirely.
    """
    from pyspark.sql import functions as F

    bench_grams = (
        bench.select(
            F.explode(shingles_col(F.col(bench_text_col), n)).alias("shingle"))
        .distinct()
    )
    hits = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(shingles_col(F.col(text_col), n)).alias("shingle"))
        .join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit_ngrams", F.lit(0)).cast("long").alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --------------------------------------------------------- DuckDB mirrors

def duplicated_spans(docs, text_col="text", id_col="doc_id",
                     n: int = 8, min_docs: int = 2,
                     hash_shingles: bool = False,
                     keep_one: bool = False):
    """Maximal duplicated token spans: substring-level dedup (the
    "repeated substrings across the corpus" operation of Lee et al. 2022,
    *Deduplicating Training Data Makes Language Models Better* — their
    suffix-array pass, re-expressed as the Spark-friendly fixed-n shingle
    variant: every duplicated run of ≥ n tokens is found exactly, with
    span boundaries rounded to token positions).

    A token n-gram occurring in ≥ ``min_docs`` distinct docs marks its
    occurrences as duplicated; overlapping/adjacent duplicated n-grams in
    one doc merge into MAXIMAL spans. Returns
    (doc_id, span_start, span_end, span_tokens) with 1-based inclusive
    token positions — the rows a curation pipeline would cut or down-weight.

    ``keep_one=True`` is the Lee-et-al-faithful survivor policy: each
    duplicated n-gram ELECTS its lexicographically first occurrence
    (min (doc_id, pos) — their "keep the first copy in order"), and the
    elected occurrence is not marked, so exactly one copy of every
    duplicated substring survives the downstream cut. The election is the
    same shingle-keyed aggregate extended with one ``min(struct)`` — no
    extra shuffle; a position in the elected doc still falls if a
    DIFFERENT, non-elected duplicated gram covers it (overlap rule).
    Default (False) marks every occurrence — the span set a down-weighting
    pipeline wants, and the cheaper cut (no survivor coordination).

    Scale shape (100 TB): one shuffle keyed on the shingle (map-side
    partial aggregation; with ``hash_shingles=True`` the key is
    ``xxhash64`` of the gram — 8 bytes instead of the string, identical
    output modulo 2^-64 collisions), one join of occurrences against the
    duplicated-gram set (broadcastable when dup vocabulary is small, AQE
    picks), one per-doc window (narrow after the join's doc partitioning).
    Tokenization/shingling is pure whole-stage-codegen column work —
    no Python kernels anywhere."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = _ws_tokens(F.col(text_col))
    d = (docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
             .where(F.size("toks") >= n))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
    )
    sh = d.select(
        "doc_id", F.posexplode(grams).alias("pos0", "sh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "sh")
    if hash_shingles:
        sh = sh.select("doc_id", "pos", F.xxhash64("sh").alias("sh"))
    dup = (sh.groupBy("sh")
             .agg(F.countDistinct("doc_id").alias("nd"),
                  F.min(F.struct("doc_id", "pos")).alias("fo"))
             .where(F.col("nd") >= min_docs)
             .select("sh", "fo"))
    hits = sh.join(dup, "sh")
    if keep_one:  # drop the elected occurrence from the marked set
        hits = hits.where(~((F.col("doc_id") == F.col("fo.doc_id"))
                            & (F.col("pos") == F.col("fo.pos"))))
    hits = hits.select("doc_id", "pos")  # (doc_id, pos) already unique:
    # one sh row per position, each matching exactly one dup row
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (hits
           .withColumn("brk", F.when(F.col("pos") - F.lag("pos").over(w)
                                     <= n, F.lit(0)).otherwise(F.lit(1)))
           .withColumn("island", F.sum("brk").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (isl.groupBy("doc_id", "island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + (n - 1)).alias("span_end"))
            .withColumn("span_tokens",
                        F.col("span_end") - F.col("span_start") + 1)
            .select("doc_id", "span_start", "span_end", "span_tokens"))


def duckdb_dup_spans_sql(table: str, id_col: str, text_col: str,
                         n: int = 8, min_docs: int = 2,
                         keep_one: bool = False) -> str:
    """Oracle for :func:`duplicated_spans` (hash_shingles=False): same
    positional shingling, dup-gram set, and gaps-and-islands merge in SQL.
    ``keep_one`` mirrors the survivor election (min (doc_id, pos) struct —
    DuckDB struct min is lexicographic, same rule as Spark's)."""
    toks = f"list_filter(string_split_regex({text_col}, '\\s+'), x -> x != '')"
    h_sql = (
        """
  SELECT s.doc_id, s.pos FROM s JOIN dup USING (sh)
  WHERE NOT (s.doc_id = dup.fo.d AND s.pos = dup.fo.p)"""
        if keep_one else """
  SELECT doc_id, pos FROM s WHERE sh IN (SELECT sh FROM dup)""")
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}
  WHERE len({toks}) >= {n}
), s AS (
  -- zipped unnests (same length) keep pos and its shingle aligned
  SELECT doc_id,
         unnest(range(1, len(toks) - {n} + 2)) AS pos,
         unnest(list_transform(range(1, len(toks) - {n} + 2),
                i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' ')))
           AS sh
  FROM d
), dup AS (
  SELECT sh, min({{'d': doc_id, 'p': pos}}) AS fo
  FROM s GROUP BY sh HAVING count(DISTINCT doc_id) >= {min_docs}
), h AS ({h_sql}
), b AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  <= {n} THEN 0 ELSE 1 END AS brk
  FROM h
), i AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM b
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {n - 1} AS span_end,
       max(pos) + {n - 1} - min(pos) + 1 AS span_tokens
FROM i GROUP BY doc_id, island
"""


def strip_dup_spans(docs, text_col="text", id_col="doc_id",
                    n: int = 8, min_docs: int = 2,
                    hash_shingles: bool = False,
                    keep_one: bool = False):
    """ExactSubstr REMOVAL (the transform half of Lee et al. 2022's
    suffix-array dedup): cut every maximal duplicated token span
    (:func:`duplicated_spans`, same n/min_docs spec) out of the text,
    keeping the rest of the document.

    ``keep_one=True`` is Lee et al.'s exact policy — ONE surviving copy of
    each duplicated substring (the lexicographically first occurrence,
    elected inside :func:`duplicated_spans`' existing shingle aggregate —
    no extra shuffle). Default (False) cuts every copy: the cheaper
    transform, and the difference is one copy per duplicated substring —
    negligible mass at corpus scale. Returns one row per input doc:
    (doc_id, clean_text, n_tokens, n_cut) where clean_text is the kept
    tokens re-joined with single spaces (token-normalized output —
    byte-faithful reconstruction would need char offsets) and n_cut the
    tokens removed (0 for untouched docs).

    Scale shape: :func:`duplicated_spans`' one shingle-keyed shuffle +
    per-doc window, then a doc-keyed left join of the per-doc span list
    (collect_list is bounded: ≤ len/n merged spans per doc) and a
    whole-stage-codegen positional token filter — no Python kernels."""
    from pyspark.sql import functions as F

    spans = (
        duplicated_spans(docs, text_col, id_col, n, min_docs, hash_shingles,
                         keep_one=keep_one)
        .groupBy("doc_id")
        .agg(F.collect_list(
            F.struct("span_start", "span_end")).alias("spans"))
    )
    toks = _ws_tokens(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    j = d.join(spans, "doc_id", "left")
    idx = F.when(
        F.size("toks") > 0, F.sequence(F.lit(1), F.size("toks"))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    pos_tok = F.transform(
        idx, lambda i: F.struct(i.alias("i"),
                                F.element_at("toks", i).alias("tok")))
    kept = F.filter(
        pos_tok,
        lambda p: ~F.exists(
            F.coalesce(
                F.col("spans"),
                F.expr("CAST(array() AS "
                       "array<struct<span_start:int,span_end:int>>)"),
            ),
            lambda s: (p["i"] >= s["span_start"]) & (p["i"] <= s["span_end"]),
        ),
    )
    return j.select(
        "doc_id",
        F.concat_ws(" ", F.transform(kept, lambda p: p["tok"]))
        .alias("clean_text"),
        F.size("toks").cast("bigint").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("bigint").alias("n_cut"),
    )


def duckdb_strip_spans_sql(table: str, id_col: str, text_col: str,
                           n: int = 8, min_docs: int = 2,
                           keep_one: bool = False) -> str:
    """Oracle for :func:`strip_dup_spans` (hash_shingles=False): the
    :func:`duckdb_dup_spans_sql` span set as a CTE, then the same
    positional cut + single-space re-join."""
    toks = f"list_filter(string_split_regex({text_col}, '\\s+'), x -> x != '')"
    return f"""
WITH spans AS ({duckdb_dup_spans_sql(table, id_col, text_col, n, min_docs,
                                     keep_one=keep_one)}),
dt AS (
  SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}
), tok AS (
  SELECT doc_id, unnest(toks) AS tok,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM dt
), cut AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM tok t JOIN spans s
    ON t.doc_id = s.doc_id AND t.pos BETWEEN s.span_start AND s.span_end
), kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM tok t LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.pos IS NULL GROUP BY t.doc_id
)
SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
       len(d.toks)::BIGINT AS n_tokens,
       (len(d.toks) - coalesce(k.n_kept, 0))::BIGINT AS n_cut
FROM dt d LEFT JOIN kept k USING (doc_id)
"""


def duckdb_decontaminate_sql(table: str, id_col: str, text_col: str,
                             bench_where: str, n: int = 13) -> str:
    """Oracle for :func:`decontaminate` with the bench set defined as
    ``SELECT {text_col} FROM {table} WHERE {bench_where}`` (the gate
    derives its benchmark slice from the same view so no extra table is
    needed). Same shingling as :func:`duckdb_shingles` on both sides;
    the flag is cast to BIGINT for hash-stable comparison."""
    return f"""
WITH bg AS (
  SELECT DISTINCT unnest({duckdb_shingles(text_col, n)}) AS shingle
  FROM {table} WHERE {bench_where}
), ds AS (
  SELECT {id_col} AS doc_id, unnest({duckdb_shingles(text_col, n)}) AS shingle
  FROM {table}
), h AS (
  SELECT doc_id, count(*) AS n_hit FROM ds
  WHERE shingle IN (SELECT shingle FROM bg) GROUP BY doc_id
)
SELECT d.{id_col} AS doc_id,
       coalesce(h.n_hit, 0)::BIGINT AS n_hit_ngrams,
       (coalesce(h.n_hit, 0) > 0)::BIGINT AS contaminated
FROM {table} d LEFT JOIN h ON d.{id_col} = h.doc_id
"""


def duckdb_shingles(col_sql: str, n: int = N_SHINGLE) -> str:
    toks = f"list_filter(string_split_regex(lower({col_sql}), '\\s+'), x -> x != '')"
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )
    return f"CASE WHEN len({toks}) > 0 THEN list_distinct({grams}) ELSE [] END"


def duckdb_minhash_sql(table: str, id_col: str, text_col: str, k=MINHASH_K, n=N_SHINGLE) -> str:
    """SQL producing (doc_id, seed, minhash)."""
    return f"""
WITH sh AS (
  SELECT {id_col} AS doc_id, unnest({duckdb_shingles(text_col, n)}) AS shingle
  FROM {table}
), seeded AS (
  SELECT doc_id, seed, md5(seed::VARCHAR || '|' || shingle) AS h
  FROM sh CROSS JOIN (SELECT unnest(range(0, {k})) AS seed)
)
SELECT doc_id, seed, min(h) AS minhash FROM seeded GROUP BY doc_id, seed
"""
