"""Regenerate PLANS.md — physical-plan evidence captured from the live engine.

Run:  python tools/gen_plans.py
"""

from __future__ import annotations

import io
import os
import shutil
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECTIONS: list[tuple[str, str, str]] = []  # (title, note, plan text)


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.query import aggs as _aggs
    from polaris_spark.query.engine import SearchEngine

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    idx = os.path.join(REPO, ".cache", "plans_idx")
    shutil.rmtree(idx, ignore_errors=True)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=32, n_shards=8, n_chunks=2,
                                positions=True, attr_cols=("source", "lang"),
                                field_cols=("source", "lang")))
    eng = SearchEngine(spark, idx)

    SECTIONS.append((
        "candidate scan (bucket partition pruning + term row-group pushdown)",
        "PartitionFilters prunes `bucket=` dirs at file-listing time; "
        "PushedFilters reaches the parquet reader (rows are term-sorted per "
        "file, so row-group min/max skips non-matching groups).",
        cap(eng._candidates(eng.query_terms("spark join"))),
    ))

    SECTIONS.append((
        "distributed top-k (per-shard Arrow kernels + global sort-limit)",
        "One FlatMapGroupsInPandas per shard group over the pruned scan; "
        "TakeOrderedAndProject merges ≤ k×shards rows — no full sort.",
        cap(eng.search_df("spark join", k=10)),
    ))

    SECTIONS.append((
        "top-k payload join (broadcast of the tiny top-k side)",
        "The k-row result broadcasts; the big table is scanned once, no "
        "shuffle of the payload side.",
        cap(
            docs.join(F.broadcast(eng.search_df("spark join", k=10)), "doc_id")
            .select("doc_id", "score", "text")
        ),
    ))

    SECTIONS.append((
        "encode-stage shuffle (explicit hash partitioning reused by groupBy)",
        "Packed tf checkpoint → JVM-side explode (Generate inside "
        "WholeStageCodegen) → ONE Exchange hashpartitioning(bucket, shard) "
        "that the FlatMapGroupsInPandas reuses — no second exchange before "
        "the kernel.",
        cap(_encode_plan(spark, idx)),
    ))

    SECTIONS.append((
        "distributed prohibit-term exclusion (cogrouped per-shard anti-set)",
        "A `-term` query decodes the excluded terms' postings into a "
        "(shard, doc_id) frame via ArrowEvalPython/mapInPandas and cogroups "
        "it with the candidate rows (FlatMapCoGroupsInPandas) — excluded ids "
        "never reach the driver; exclusion happens before scoring so "
        "MaxScore pruning stays exact.",
        cap(eng.search_df("spark -join", k=10)),
    ))

    SECTIONS.append((
        "prefix completion (build-time key-sorted table, StartsWith pushdown)",
        "complete() probes the `completion/` table (keys lowercased at write "
        "time, range-partitioned + sorted): StringStartsWith reaches "
        "PushedFilters, so row-group min/max stats prune everything outside "
        "the prefix range — no full dictionary scan, no per-term regexes.",
        cap(eng.complete("sca", 20)),
    ))

    SECTIONS.append((
        "*:* match-all (MatchAllDocsQuery: one doc_map scan, no postings)",
        "A `*:*` query never touches postings: every live doc at constant "
        "score 1.0 from ONE doc_map column-pruned scan; `-term` exclusions "
        "arrive as a decoded doc-id frame anti-joined before the k cut. "
        "At 10^12 docs this is a metadata-only projection of the id "
        "column, k-limited by TakeOrderedAndProject.",
        cap(eng.search_df("*:* -join", k=10)),
    ))

    SECTIONS.append((
        "attribute point lookup (equality filter pushed to doc_map scan)",
        "list_by_attr routes exact-attribute queries to the doc_map parquet "
        "with the equality predicate in PushedFilters.",
        cap(eng.list_by_attr("source", "src3")),
    ))

    SECTIONS.append((
        "batched multi-query search (one scan + one shuffle for a query SET)",
        "search_many_df scores every query in ONE job: a single bucket-"
        "pruned candidate scan for the UNION of all queries' terms, a "
        "BroadcastHashJoin against the tiny (term, qblock) membership "
        "table routing each candidate row ONLY to the blocks whose "
        "queries use its term (never a full ×B fan-out — total decode "
        "work stays ∝ the set's term postings as B grows with cores), "
        "then one Exchange clustered on (shard, qblock) so the "
        "FlatMapGroupsInPandas kernel runs up to S×B ways (an explicit "
        "repartition pins the task count: AQE would coalesce these "
        "few-KB-but-CPU-heavy groups by bytes). Each group decodes its "
        "routed packed blobs ONCE and scores its block's queries from the "
        "shared arrays; then a per-query window top-k. Q queries ≈ one "
        "query's scan + Q cheap accumulate passes, instead of Q full jobs.",
        cap(eng.search_many_df(
            ["spark join", "merge sort", "slow scan", "filter group"], k=10)),
    ))

    SECTIONS.append((
        "general wildcard expansion (pushed longest-literal prefix + regex)",
        "A `s*a?` pattern pushes its longest literal prefix before the "
        "first wildcard as StringStartsWith into the term-sorted dictionary "
        "scan (row-group pruning); the anchored regex filters only the "
        "pruned rows. Leading wildcards are rejected at parse time.",
        cap(eng._wildcard_frame("s*a?")),
    ))

    SECTIONS.append((
        "regexp expansion (classic /pattern/, pushed literal prefix)",
        "A slash-delimited `/qu.+y/` RegexpQuery pushes the pattern's "
        "longest literal head ('qu') as StringStartsWith into the "
        "term-sorted dictionary scan; the ANCHORED pattern (rlike) filters "
        "only the pruned rows — a pattern with a literal head never walks "
        "the vocab, one without pays a capped dictionary scan (exactly "
        "Lucene's terms-enum walk).",
        cap(eng._regexp_frame("/qu.+y/")),
    ))

    SECTIONS.append((
        "range expansion (classic TermRangeQuery, pushed lexicographic bounds)",
        "`[lo TO hi]` pushes BOTH bounds as GreaterThanOrEqual/LessThanOrEqual "
        "(or strict) filters into the term-sorted dictionary scan — parquet "
        "row-group min/max pruning reads only the range's slice of the vocab, "
        "never a full scan. Bare ranges additionally exclude field-qualified "
        "terms; field ranges push the `field:` prefix as StringStartsWith.",
        cap(eng._range_frame((None, "scan", "sparkz", True, True))),
    ))

    SECTIONS.append((
        "fuzzy expansion probe (n-gram table, g1 dir pruning + gram pushdown)",
        "term~N probes the prebuilt fuzzy_ngrams/ table: `g1=` partition "
        "pruning at file-listing time plus a pushed `gram IN (...)` filter "
        "— only the query's own bigram buckets are read, never the vocab; "
        "a JVM levenshtein re-verifies the (tiny) candidate set exactly.",
        cap(eng._fuzzy_gram_candidates("spark", 1)),
    ))

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from polaris_spark.ops.similarity import cosine_topk

    qv = [float(x) for x in
          emb.where("vec_id = 0").collect()[0]["embedding"]]
    SECTIONS.append((
        "brute-force cosine top-k (whole-stage codegen, no Python)",
        "Dot product via aggregate/zip_with stays JVM-side; "
        "TakeOrderedAndProject for the top-k.",
        cap(cosine_topk(emb, qv, k=10)),
    ))

    from polaris_spark.ops.similarity import build_ivf, ivf_topk

    ivf_dir = os.path.join(REPO, ".cache", "plans_ivf")
    shutil.rmtree(ivf_dir, ignore_errors=True)
    build_ivf(spark, emb, ivf_dir, n_centroids=4, seed=7)
    SECTIONS.append((
        "IVF probe (prebuilt centroid-partitioned table, partition pruning)",
        "ivf_topk scans only the nprobe nearest `centroid_id=` partitions "
        "(PartitionFilters at file-listing time) of the table build_ivf "
        "materialized — no inline re-assignment over the full embeddings.",
        cap(ivf_topk(spark, ivf_dir, qv, k=10, nprobe=1)),
    ))

    from polaris_spark.ops.similarity import build_ivf_pq, ivf_topk_pq

    build_ivf_pq(spark, ivf_dir, m=8, nbits=4, seed=7)
    SECTIONS.append((
        "PQ-IVF probe (codes sidecar, ADC lookup tables, exact rescore)",
        "ivf_topk_pq scans only the probed `centroid_id=` partitions of "
        "the m-smallint codes sidecar (same PartitionFilters pruning as "
        "the float probe, 16-32x fewer bytes); the ADC score is a codegen "
        "aggregate over element_at into two literal lookup arrays — no "
        "Python, no shuffle before the window cut — and the rescore is a "
        "broadcast semi-join back to the float partitions.",
        cap(ivf_topk_pq(spark, ivf_dir, qv, k=10, nprobe=1, window=16)),
    ))

    from polaris_spark.ops.similarity import knn_join, srp_candidate_pairs

    SECTIONS.append((
        "kNN self-join, SRP-bucketed scale path (no cross join)",
        "Each vector scores only its SRP-bucket cohort: the candidate "
        "pair set comes from an equi-join on the signature bucket (sort-"
        "merge/hash join below — never a CartesianProduct), and the "
        "per-vector top-k window runs on the joined cohort.",
        cap(knn_join(emb, k=3, candidates=srp_candidate_pairs(emb, n_bits=8))),
    ))

    from polaris_spark.ops.dedup import decontaminate

    docs_pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    SECTIONS.append((
        "benchmark decontamination (broadcast bench-gram join)",
        "The benchmark 13-gram set is tiny vs the corpus, so it is "
        "BROADCAST (BroadcastExchange + BroadcastHashJoin below): the "
        "corpus pass is one map-only scan, and the only corpus-keyed "
        "exchange is the per-doc count over hit rows (bench-bounded).",
        cap(decontaminate(docs_pq, docs_pq.where("doc_id % 7 = 0"), n=13)),
    ))

    from polaris_spark.ops.text import (encode_token_ids,
                                        quality_percentile_filter)

    SECTIONS.append((
        "quality percentile filter (one window exchange, codegen quality expr)",
        "The quality expression rides the scan (WholeStageCodegen); the "
        "only exchange is the window's hash partitioning on the group key.",
        cap(quality_percentile_filter(docs_pq, keep_frac=0.3)),
    ))
    SECTIONS.append((
        "token-id encoding (map-side explode, vocab-sized agg, broadcast encode join)",
        "Corpus side is Generate (explode) with no shuffle; the vocab "
        "aggregate and its dense-id window run over VOCAB rows only, and "
        "the encode join broadcasts the finished vocab back.",
        cap(encode_token_ids(docs_pq)),
    ))

    SECTIONS.append((
        "facet counts (match-set decode + partial-agg groupBy, no stray sort)",
        "The match set is the same pruned candidate scan + per-shard "
        "kernels as search (k=None); Catalyst's EliminateSorts drops the "
        "search-path ordering below the Aggregate, the doc_map equi-join "
        "carries only (doc_id, attr), and HashAggregate partial-folds per "
        "task to ≤ |attribute values| rows before the exchange.",
        cap(eng.facet_counts("spark join", "source")),
    ))

    from polaris_spark.query.multi import search_multi_df

    half_dirs = []
    for h in (0, 1):
        hd = os.path.join(REPO, ".cache", f"plans_idx_h{h}")
        shutil.rmtree(hd, ignore_errors=True)
        build_index(spark, docs.where(f"doc_id % 2 = {h}"), hd,
                    doc_id_col="doc_id",
                    cfg=IndexConfig(n_buckets=32, n_shards=8, n_chunks=2))
        half_dirs.append(hd)
    SECTIONS.append((
        "federated multi-index search (per-index pruned exchanges, one merge cut)",
        "Both indices keep their OWN bucket-partition-pruned candidate "
        "scan + per-shard kernel subtree (the merged global idf/avgdl are "
        "kernel closure constants — nothing about the exchange changes); "
        "the federation is ONE Union of the per-index results and ONE "
        "TakeOrderedAndProject over ≤ N·k rows. No cross-index shuffle "
        "exists anywhere in the plan.",
        cap(search_multi_df(spark, half_dirs, "spark join", k=10)),
    ))

    from polaris_spark.query.hybrid import hybrid_search_df

    _hy_emb = spark.createDataFrame(
        [(int(i), [float(i % 7), float(i % 3), 1.0]) for i in range(200)],
        "vec_id long, embedding array<float>")
    SECTIONS.append((
        "hybrid RRF fusion (two bounded legs, tiny fuse stage)",
        "Each leg keeps its own scaled subtree — the pruned-scan BM25 "
        "kernel exchange and the codegen cosine TakeOrdered — and is cut "
        "to top-window BEFORE fusing, so the rank Windows and the "
        "full-outer join run on ≤ 2·window rows (the unpartitioned "
        "Window's input IS a top-k result, bounded by construction — "
        "never a corpus frame).",
        cap(hybrid_search_df(eng, "spark join", _hy_emb,
                             [1.0, 2.0, 3.0], k=10, window=20)),
    ))

    from polaris_spark.ops.dedup import lsh_band_table, lsh_ingest

    _li_state = os.path.join(REPO, ".cache", "plans_lsh_state")
    shutil.rmtree(_li_state, ignore_errors=True)
    lsh_ingest(spark, docs.where("doc_id < 250"), _li_state, k=8, bands=4)
    _li_nb = lsh_band_table(docs.where("doc_id >= 250"), k=8, bands=4)
    _li_state_df = spark.read.parquet(os.path.join(_li_state, "bands"))
    from pyspark.sql import functions as _F2
    _li_probe = _li_nb.join(
        _li_state_df.select("band", "band_hash",
                            _F2.col("doc_id").alias("prior_id")),
        ["band", "band_hash"]).select("doc_id", "prior_id")
    SECTIONS.append((
        "incremental LSH ingest probe (band-partitioned state equi-join)",
        "The new batch's band table (map-side hash aggregates over the "
        "shingle explode) equi-joins the parquet state on (band, "
        "band_hash) — and the BUILD side of the join is the BATCH "
        "(BuildLeft here): batch-bounded by construction, so at scale "
        "the batch-side broadcast against the big state scan is exactly "
        "the shape you want; join output is bounded by true collisions, "
        "never |batch|x|state|.",
        cap(_li_probe),
    ))

    SECTIONS.append((
        "corpus-subset export (match-set shuffle join into the sink)",
        "The one surface with corpus-sized OUTPUT: the pruned match-set "
        "subtree joins the payload on doc_id as a plain shuffle join "
        "and rows stream straight to the sink — no collect, no "
        "TakeOrdered, nothing driver-side. (At this 500-doc capture AQE "
        "broadcasts the tiny doc_map; at corpus scale both sides are "
        "large and Catalyst picks the shuffle join — the invariant "
        "evidenced here is the absence of any driver-side operator.)",
        cap(spark.read.parquet(os.path.join(idx, "doc_map"))
            .join(eng.match_df("spark join"), "doc_id")),
    ))

    from polaris_spark.query.rankeval import rank_eval

    _re_run = eng.search_many_df(["spark join", "slow scan"], k=None) \
                 .select("query", "doc_id", "score")
    _re_jud = docs.select("doc_id").crossJoin(
        spark.createDataFrame([("spark join",), ("slow scan",)],
                              "query string")) \
        .withColumn("grade", (F.col("doc_id") % 7 == 0).cast("int")) \
        .where("grade > 0")
    SECTIONS.append((
        "rank evaluation (window rank cut + judgment join + per-query fold)",
        "The run is cut to |Q|·k rows by a per-query Window over the "
        "RESULT set (the corpus never enters); judgments join via "
        "BroadcastHashJoin (label sets are tiny by nature) and both the "
        "metric fold and the ideal-DCG fold are partial-aggregated "
        "HashAggregates that reduce to |Q| rows.",
        cap(rank_eval(_re_run, _re_jud, k=10)),
    ))

    from polaris_spark.ops.classifier import nb_score, nb_train

    _nb_model, _nb_ls = nb_train(docs, "lang", n_features=4096)
    SECTIONS.append((
        "NB classifier scoring (broadcast model join, no window argmax)",
        "The model rides a BroadcastExchange into the feature join "
        "(model-bounded, never corpus-bounded); per-(doc,label) sums are "
        "partial-aggregated HashAggregates, and the argmax is "
        "max(struct(score, -rank, label)) — ONE more HashAggregate, no "
        "Window operator anywhere in the plan.",
        cap(nb_score(docs, _nb_model, _nb_ls, n_features=4096)),
    ))

    SECTIONS.append((
        "composite agg (keyset cursor pushed BELOW the bucket aggregate)",
        "The exclusive after-cursor compiles to a lexicographic predicate "
        "over the grouping columns only, so PushPredicateThroughNonJoin "
        "sinks it under the HashAggregate: look for the Filter on the "
        "attr columns sitting below the partial aggregate — pages beyond "
        "the first aggregate only the keyspace tail, and the size cut is "
        "a TakeOrderedAndProject over page-visible buckets.",
        cap(_aggs.composite_agg(eng, "spark join", ["source", "lang"],
                                size=8, after=("src1", "en"))),
    ))

    SECTIONS.append((
        "interval query (term-union pruned scan, shard-pinned kernels)",
        "The intervals spec's TERM UNION drives the same pruned candidate "
        "scan as span_near (bucket PartitionFilters + term PushedFilters); "
        "minimal-interval evaluation happens inside the per-shard Arrow "
        "kernel (FlatMapGroupsInPandas), and the cut is one "
        "TakeOrderedAndProject.",
        cap(eng.search_intervals_df(
            {"ordered": [{"term": "spark"},
                         {"or": [{"term": "join"}, {"term": "merge"}]}],
             "max_gaps": 2}, k=10)),
    ))

    SECTIONS.append((
        "boosting query (two pruned match sets, one doc_id join, demote-then-cut)",
        "Both sides are the ordinary pruned candidate scans + per-shard "
        "kernels; the negative side collapses to a distinct doc set before "
        "the equi-join (AQE broadcasts the small side at runtime), the "
        "demotion multiply is a codegen projection, and the final cut is "
        "one TakeOrderedAndProject — no corpus-sized exchange anywhere.",
        cap(eng.search_boosting_df("spark join", "scan",
                                   negative_boost=0.4, k=10)),
    ))

    SECTIONS.append((
        "function score (match-set attr join + codegen fv projection)",
        "The match set is the ordinary pruned evaluation; the doc_map "
        "join carries only (doc_id, attr) — match-set-sized, AQE picks "
        "the broadcast — the modifier expression is a codegen "
        "projection, and the cut is one TakeOrderedAndProject.",
        cap(eng.search_function_score("spark join", "n_chars", factor=0.01,
                                      modifier="log1p", k=10, docs=docs)),
    ))

    SECTIONS.append((
        "significant terms (doc_id-IN-pushed tf/ scan + broadcast-semi dictionary fold)",
        "The foreground reads the tf/ checkpoint with the ≤window hit ids "
        "in PushedFilters (row-group pruned — never a corpus scan); the "
        "background df folds from the dictionary behind a broadcast "
        "LeftSemi on the window's term set; the JLH projection is "
        "codegen and the cut is a TakeOrderedAndProject over foreground-"
        "vocab rows.",
        cap(eng.significant_terms("spark join", n=10, window=50)),
    ))

    SECTIONS.append((
        "spell-suggest probe (fuzzy n-gram table, pushed gram IN + g1 pruning)",
        "Suggest rides the same fuzzy_ngrams/ probe as term~N expansion "
        "(the probe term is long enough for the lossless gram bound — "
        "shorter terms take the length-banded dictionary fallback): "
        "PartitionFilters on g1=, gram IN in PushedFilters — the vocab is "
        "never scanned; ranking is a TakeOrderedAndProject over the "
        "candidate rows.",
        cap(eng.suggest_df("querxes", n=5, max_edits=2)),
    ))

    from polaris_spark.ops.text import lm_score

    SECTIONS.append((
        "bigram-LM scoring (two hash aggs + bigram-keyed score join)",
        "Training is two partial-aggregated HashAggregates over the "
        "exploded bigrams (sub-linear outputs); scoring joins the doc "
        "bigrams to the count tables keyed by bigram and folds per doc — "
        "no windows, no driver data path beyond the scalar vocab count.",
        cap(lm_score(docs_pq)),
    ))

    from polaris_spark.ops.mixing import sample_hash_col, shuffle_rows

    pre = (
        docs_pq.select("doc_id")
        .withColumn("shuffle_key", sample_hash_col("doc_id", 13).cast("long"))
        .repartitionByRange(16, "shuffle_key", "doc_id")
        .sortWithinPartitions("shuffle_key", "doc_id")
    )
    SECTIONS.append((
        "corpus shuffle (range exchange + per-partition offset numbering)",
        "Two plans: (a) the sort pass — ONE Exchange rangepartitioning on "
        "(shuffle_key, id), Spark's ordinary global-sort shuffle, no "
        "single-partition window; (b) the numbering pass over the "
        "checkpoint-pinned result — MapInPandas against driver-computed "
        "per-partition offsets (the checkpoint truncates lineage, which "
        "is exactly what pins partition boundaries between the passes).",
        cap(pre) + "\n" + cap(shuffle_rows(docs_pq, seed=13)),
    ))

    from polaris_spark.ops.mixing import pack_sequences, token_budget

    SECTIONS.append((
        "mixing cumsums (range-exchange global cumsum — NO per-source "
        "window)",
        "Round 5: token_budget / pack_sequences / materialize_bins no "
        "longer run Window.partitionBy(source) running sums (whose "
        "partition is ONE task — with a handful of sources at 100 TB each "
        "source's whole stream would serialize through one executor "
        "thread). The plan now shows the shuffle_rows shape instead: one "
        "Exchange rangepartitioning on (source, id) over the slim "
        "(key, id, n_tokens) frame, MapInPandas numbering against "
        "driver-computed per-(partition, key) prefix offsets (subtotal "
        "longs only — no row data to the driver), then a join of the cum "
        "column back on the row identity. There is NO `Window` operator "
        "with partitionBy(source) anywhere in the plan; parallelism is "
        "∝ partitions, never ∝ |sources|.",
        cap(token_budget(docs_pq, {"src1": 1000}, 900))
        + "\n" + cap(pack_sequences(docs_pq, 256)),
    ))

    src_text = docs_pq.orderBy("doc_id").select("text").limit(1) \
        .collect()[0]["text"]
    SECTIONS.append((
        "MoreLikeThis (term-list query through the search_df kernel plan)",
        "mlt_select_terms probes the dictionary with a pushed `term IN` "
        "filter (PushedFilters — never a vocab scan); the selected terms "
        "then run the EXACT search_df shape (pruned candidate scan, "
        "per-shard kernels, TakeOrderedAndProject), with the source doc "
        "riding the cogrouped exclusion frame.",
        cap(eng.more_like_this_df(src_text, k=10, exclude_doc_id=1)),
    ))

    from polaris_spark.index.check import check_index as _ci  # noqa: F401
    from pyspark.sql import functions as _F

    chk_scan = eng._posts.select("term", "df").groupBy("term").agg(
        _F.sum("df").alias("df_p"))
    SECTIONS.append((
        "index check congruence aggregate (column-pruned postings read)",
        "check_index's dictionary-congruence leg reads ONLY the stat "
        "columns of the postings (ReadSchema excludes the packed binary "
        "blobs — the decode scan is a separate mapInPandas pass) and "
        "reduces to per-term partial-aggregated counts.",
        cap(chk_scan),
    ))

    from polaris_spark.ops.similarity import semantic_dedup
    from polaris_spark.ops.text import chunk_windows, gopher_cols

    SECTIONS.append((
        "Gopher rule filter (zero-shuffle codegen scan)",
        "Every rule column (word/line splits, ratios, required-word hits, "
        "pass flag) is a single Project over the scan — no Exchange, no "
        "Python; the whole filter rides any corpus read.",
        cap(docs.select("doc_id", *gopher_cols(F.col("text"), min_words=5))),
    ))

    SECTIONS.append((
        "context-window chunking (one Generate, no shuffle)",
        "Window starts come from a sequence+posexplode Generate; slicing "
        "and re-joining tokens are codegen array ops. Output volume is "
        "corpus_tokens/stride ROWS — document skew never concentrates in "
        "one task's memory (no grouping anywhere).",
        cap(chunk_windows(docs, size=32, stride=24)),
    ))

    SECTIONS.append((
        "hierarchical browse (pushed level filters + partial-agg counts)",
        "listDirectory analog: the fixed path levels are equality filters "
        "pushed into the doc_map parquet scan (PushedFilters below), and "
        "the child listing partial-aggregates to ≤ |distinct child values| "
        "rows per task before the reduce exchange — listing cost never "
        "exceeds the pruned scan.",
        cap(eng.browse(("src1",), levels=("source", "lang"))),
    ))

    emb_df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    SECTIONS.append((
        "SemDeDup within-cluster pair join (centroid-keyed, no cartesian)",
        "The pair join is keyed on centroid_id (SortMergeJoin/ShuffledHash "
        "on the cluster key — NEVER CartesianProduct), so pair work is "
        "n²/K and partitions by cluster; the keep policy is one "
        "aggregation over the pair stream plus a left join back.",
        cap(semantic_dedup(emb_df, n_centroids=4, threshold=0.45)),
    ))

    from polaris_spark.ops.dedup import strip_dup_spans
    from polaris_spark.ops.text import dsir_logweights

    SECTIONS.append((
        "ExactSubstr removal (bounded span join + codegen token filter)",
        "strip_dup_spans: the dup-span set folds per doc (collect_list "
        "bounded by len/n merged spans), left-joins back on doc_id, and "
        "the positional cut is a whole-stage-codegen lambda filter — the "
        "only exchanges are duplicated_spans' shingle shuffle + the "
        "doc-keyed join; no Python anywhere.",
        cap(strip_dup_spans(docs, n=8, min_docs=2)),
    ))

    SECTIONS.append((
        "DSIR importance weights (one sub-linear stats agg + broadcast score join)",
        "dsir_logweights: target+raw bucket counts fold in ONE "
        "tagged-union hash aggregation (≤ 2·buckets output rows, "
        "collected once); the driver-built per-bucket score table "
        "BROADCASTS to the raw feature stream (BroadcastHashJoin below) "
        "and the per-doc fold partial-aggregates — corpus-proportional "
        "work is exactly two raw feature scans + one target scan.",
        cap(dsir_logweights(docs, docs.where("lang = 'en'"))),
    ))

    SECTIONS.append((
        "sorted-search (field sort: match kernels + TakeOrderedAndProject)",
        "IndexSearcher Sort analog: the match set (same pruned scan + "
        "per-shard kernels, k=None) equi-joins a column-pruned "
        "(doc_id, attr) doc_map scan and the (attr, doc_id) top-k is ONE "
        "TakeOrderedAndProject — the search path's relevance orderBy is "
        "eliminated below the join, and no global Sort appears.",
        cap(eng.search_sorted("spark join", "source", k=10)),
    ))

    SECTIONS.append((
        "collapse-search (grouping: one keyed window + broadcast winners)",
        "Lucene grouping / ES collapse analog: the match set shuffles ONCE "
        "hash-partitioned on the group key for the within-group row_number "
        "window; the group heads (≤ one row per key) take a "
        "TakeOrderedAndProject top-k cut and the k winning keys broadcast-"
        "join back to filter members — nothing larger than the match set "
        "moves, and the only global ordering is over k rows.",
        cap(eng.search_collapse("spark join", "source", k=5, per_group=2)),
    ))
    SECTIONS.append((
        "parent-search (block join: partial-agg fold, no window)",
        "ToParentBlockJoinQuery analog: child scores fold per parent key "
        "through ONE aggregate with a map-side partial (SortAggregate — "
        "the best-child max_by is struct-ordered; each task still emits "
        "≤ |parents| rows), cut by TakeOrderedAndProject — no window, no "
        "global sort.",
        cap(eng.search_parent("spark join", "source", k=5,
                              score_mode="max")),
    ))

    SECTIONS.append((
        "rescore (two-pass rerank: broadcast window into the second pass)",
        "QueryRescorer / ES-rescore analog: pass 1 is the ordinary exact "
        "top-window search (MaxScore kernels + TakeOrderedAndProject); "
        "pass 2 evaluates the rescore query once and the ≤window-row "
        "first-pass result BROADCASTS into the left join — the second "
        "match set never shuffles, and the final combined-score cut is a "
        "TakeOrderedAndProject over ≤ window rows.",
        cap(eng.rescore("spark join", '"spark join"~1', k=5, window=20,
                        rescore_weight=2.0)),
    ))

    SECTIONS.append((
        "span-near (Lucene spans family: the phrase exchange, window kernels)",
        "SpanNearQuery analog: the same pruned candidate scan + "
        "shard-pinned Arrow kernels as the phrase path (positions decoded "
        "in-kernel, tombstones via the cogroup when present), ordered/"
        "unordered window matching per shard, one TakeOrderedAndProject — "
        "proximity costs exactly what a phrase costs.",
        cap(eng.span_near_df(["spark", "join"], slop=4, in_order=True,
                             k=5)),
    ))

    SECTIONS.append((
        "synonym blend (SynonymQuery: one scan over every group's members)",
        "Lucene SynonymQuery analog: one pruned candidate scan covers each "
        "token's group (token + synonyms, term IN list below); kernels "
        "fold per-doc tf-sums per group and score ONE blended impact each "
        "(pluggable scorer on the search_df exchange — the blended max-df "
        "idf is computed on the driver over GLOBAL dfs so it is "
        "shard-invariant), TakeOrderedAndProject cut.",
        cap(eng.search_synonyms_df("spark join",
                                   {"spark": ["stream"],
                                    "join": ["merge"]}, k=5)),
    ))

    SECTIONS.append((
        "FILTER context (constant-score inclusion rides the exclusion cogroup)",
        "FilteredQuery / ES bool-filter analog: the filter's doc set (here "
        "the zero-scoring flat docIdSet path — postings decoded via "
        "mapInPandas, never scored, never collected) unions into the "
        "per-shard exclusion frame tagged kind='i' and reaches the kernels "
        "through the SAME FlatMapCoGroupsInPandas exchange as prohibit "
        "terms — filtering happens in-kernel before θ₀, so MaxScore stays "
        "exact and survivors' scores are bit-identical to the unfiltered "
        "query's.",
        cap(eng.search_df("spark join", k=5, filter_query="lang:en")),
    ))

    SECTIONS.append((
        "dismax (DisjunctionMaxQuery: same exchange, variant-term scan)",
        "Solr/ES dismax analog: ONE pruned candidate scan covers every "
        "token's bare + field:token variants (term IN list below), the "
        "per-shard kernels fold max + tie×rest per token group (pluggable "
        "scorer on the search_df exchange — tombstones/filters ride the "
        "same cogroup), and the cut is one TakeOrderedAndProject. No "
        "MaxScore pruning (the max-fold breaks the Σ-bound) — candidates "
        "are still term-pruned by the scan.",
        cap(eng.search_dismax_df("spark join", k=5, tie=0.3,
                                 field_boosts={"text": 1.0, "source": 0.5})),
    ))

    from polaris_spark.ops.bpe import bpe_encode, bpe_learn
    from polaris_spark.ops.text import top_ngrams

    SECTIONS.append((
        "corpus n-gram heavy hitters (partial-agg + TakeOrderedAndProject)",
        "The n-gram windows are a JVM Generate over the token array (no "
        "Python); HashAggregate partial-folds the n·tokens intermediate "
        "rows map-side before the single exchange, and the top-k is a "
        "TakeOrderedAndProject — never a global sort.",
        cap(top_ngrams(docs, n=3, k=50)),
    ))
    SECTIONS.append((
        "BPE encode (zero-shuffle Arrow map, broadcast ranks)",
        "bpe_learn's corpus-proportional work is one word-histogram "
        "aggregation (same shape as the dictionary fold); the encode below "
        "is a single MapInPandas directly over the scan — no exchange "
        "anywhere, the merge table travels as a broadcast variable, and "
        "the kernel memoizes per distinct word within each Arrow batch.",
        cap(bpe_encode(docs, bpe_learn(spark, docs, n_merges=40))),
    ))

    from polaris_spark.ops.percolate import percolate

    SECTIONS.append((
        "percolator (zero-shuffle broadcast-registry map)",
        "The saved-query registry travels as a broadcast variable (parsed "
        "trees); documents stream through ONE MapInPandas directly over "
        "the scan — no exchange anywhere, so alerting scales with executor "
        "count alone. Per-doc registry cost is bounded by the token-"
        "routing presearcher (module docstring).",
        cap(percolate(docs.select("doc_id", "text"),
                      {"q1": "spark AND join", "q2": "sca*"})),
    ))

    from pyspark.sql import functions as F

    from polaris_spark.ops.similarity import maxsim_topk

    SECTIONS.append((
        "MaxSim late-interaction scoring (one scan, partial-agg max fold)",
        "All |q| cosine projections ride ONE WholeStageCodegen scan "
        "(query vectors are literals); the per-doc max fold is a "
        "partial-aggregated HashAggregate (map-side pre-fold to "
        "|docs-in-task| rows), and the top-k is a TakeOrderedAndProject.",
        cap(maxsim_topk(
            emb.withColumn("doc_id", (F.col("vec_id") % 25).cast("long")),
            [qv, qv], k=5)),
    ))

    from polaris_spark.ops.text import vocab_shift

    SECTIONS.append((
        "vocab drift (two bucket-bounded scans, B-row frame)",
        "Each corpus side partial-aggregates its hashed-gram stream to "
        "<=B bucket rows map-side (HashAggregate below); the JS math is "
        "codegen over the B-row spine with a broadcast totals row — no "
        "corpus-sized exchange anywhere.",
        cap(vocab_shift(docs_pq.where("doc_id % 2 = 0"),
                        docs_pq.where("doc_id % 2 = 1"), buckets=32)),
    ))

    out = [
        "# PLANS — physical-plan evidence (captured from the live engine)",
        "",
        "Checked properties: parquet `PartitionFilters` on `bucket`,",
        "`PushedFilters` on `term`, a single Exchange feeding each Arrow",
        "kernel, broadcast joins for tiny sides, WholeStageCodegen spans for",
        "all non-kernel expressions. Regenerate: `python tools/gen_plans.py`.",
        "",
    ]
    for title, note, plan in SECTIONS:
        out += [f"## {title}", "", note, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written,", len(SECTIONS), "sections")
    spark.stop()


def _encode_plan(spark, idx):
    from pyspark.sql import functions as F

    from polaris_spark.index.build import (
        IndexConfig, _encode_kernel, _explode_tf, POSTINGS_SCHEMA,
    )

    cfg = IndexConfig(n_buckets=32, n_shards=8, n_chunks=2, positions=True)
    tf_c = _explode_tf(
        spark.read.parquet(os.path.join(idx, "tf")).where(F.col("chunk") == 0), cfg
    )
    tf_c = tf_c.withColumn("is_hot", F.lit(False)).withColumn(
        "shard",
        (F.crc32(F.col("term").cast("binary")) % cfg.n_shards).cast("int"),
    )
    tf_c = tf_c.repartition(16, "bucket", "shard")
    return tf_c.groupBy("bucket", "shard").applyInPandas(
        _encode_kernel(cfg, 50.0), POSTINGS_SCHEMA
    )


if __name__ == "__main__":
    main()
