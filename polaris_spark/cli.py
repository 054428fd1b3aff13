"""spark-submit entry points: ``build``, ``query``, ``phrase``,
``complete``, ``stats``, ``curate``, ``scrub``, ``mix``, ``serve``.

Usage (north rule: multi-executor clusters via ``--py-files``):

    zip -r polaris_spark.zip polaris_spark
    spark-submit --py-files polaris_spark.zip -m polaris_spark.cli ...    # or:
    spark-submit --py-files polaris_spark.zip cli_shim.py build \\
        --input /data/transcripts_parquet --index /data/index \\
        --buckets 4096 --shards 512 --chunks 64

The CLI mirrors the reference's command surface
(reference: polaris-cli/.../cli/Main.java:31-33 — ``index``, ``search``,
``source`` etc.) re-expressed for the rebuilt engine.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(app: str):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app)
    b = b.config("spark.sql.adaptive.enabled", "true")
    b = b.config("spark.sql.execution.arrow.pyspark.enabled", "true")
    return b.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="polaris_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build/resume the inverted index")
    b.add_argument("--input", required=True, help="parquet path of the transcripts table")
    b.add_argument("--index", required=True, help="index output dir")
    b.add_argument("--text-col", default="text")
    b.add_argument("--doc-id-col", default=None)
    b.add_argument("--id-cols", default="conv_id,turn_idx")
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--chunks", type=int, default=4)
    b.add_argument("--hot-df-threshold", type=int, default=4096)
    b.add_argument("--positions", action="store_true",
                   help="store token positions (enables phrase queries)")
    b.add_argument("--field-cols", default="",
                   help="comma-separated columns indexed as field:token terms")
    b.add_argument("--attr-cols", default="",
                   help="comma-separated columns stored in doc_map for point lookups")
    b.add_argument("--store-text", action="store_true",
                   help="store the text column in doc_map (serving hits "
                        "then carry a snippet, Lucene stored-field analog)")
    b.add_argument("--no-resume", action="store_true")

    ap_ = sub.add_parser("append", help="append a new segment generation "
                         "(incremental: stats refresh + delta-folded "
                         "dictionary/completion/fuzzy tables)")
    ap_.add_argument("--input", required=True,
                     help="parquet path of the NEW docs to append")
    ap_.add_argument("--index", required=True)
    ap_.add_argument("--text-col", default="text")
    ap_.add_argument("--doc-id-col", default=None)
    ap_.add_argument("--id-cols", default="conv_id,turn_idx")

    cp = sub.add_parser("compact", help="forceMerge(1) analog: one row per "
                        "(term, shard), side tables re-folded, tombstones "
                        "applied (expungeDeletes), tf checkpoint GC'd")
    cp.add_argument("--index", required=True)
    cp.add_argument("--no-gc", action="store_true",
                    help="keep the tf checkpoint generations")

    mq = sub.add_parser("multi-query", help="federated search over several "
                        "index dirs with MERGED global stats (Lucene "
                        "MultiReader / ES dfs_query_then_fetch): scores "
                        "bit-identical to one monolithic index over the "
                        "union")
    mq.add_argument("--indexes", required=True,
                    help="comma-separated index directories")
    mq.add_argument("--query", required=True)
    mq.add_argument("-k", type=int, default=10)
    mq.add_argument("--mode", choices=["or", "and"], default="or")
    mq.add_argument("--expand-fields", action="store_true")

    ri = sub.add_parser("reindex", help="rebuild an index under a NEW "
                        "configuration from its own stored fields (ES "
                        "_reindex analog; source must be store_text=True; "
                        "tombstones not carried). Unset flags keep the "
                        "source's value.")
    ri.add_argument("--index", required=True, help="source index dir")
    ri.add_argument("--dest", required=True, help="destination index dir")
    ri.add_argument("--buckets", type=int, default=None)
    ri.add_argument("--shards", type=int, default=None)
    ri.add_argument("--chunks", type=int, default=None)
    ri.add_argument("--positions", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="--positions / --no-positions (a positions=True "
                         "source CAN be rebuilt without them)")
    ri.add_argument("--field-cols", default=None,
                    help="comma-separated columns (must be stored in the "
                         "source doc_map)")
    ri.add_argument("--attr-cols", default=None)
    ri.add_argument("--store-text", action=argparse.BooleanOptionalAction,
                    default=None)

    sn = sub.add_parser("snapshot", help="point-in-time index snapshot "
                        "(SnapshotDeletionPolicy/backup analog): a "
                        "consistent copy of the PUBLISHED state, safe "
                        "while appends run; restore = serve (or snapshot "
                        "back) the copied directory")
    sn.add_argument("--index", required=True)
    sn.add_argument("--dest", required=True)

    mg = sub.add_parser("merge", help="tiered generation merge (Lucene "
                        "TieredMergePolicy analog): merge all appended "
                        "generations into one, leaving the base segment "
                        "untouched; compact remains the full forceMerge(1)")
    mg.add_argument("--index", required=True)

    dl = sub.add_parser("delete", help="tombstone documents (Lucene "
                        "deleteDocuments analog; logical until compact "
                        "applies them physically — the data-removal path)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", default=None,
                    help="comma-separated doc ids")
    dl.add_argument("--ids-parquet", default=None,
                    help="parquet path with a doc_id column")

    q = sub.add_parser("query", help="top-k BM25 search")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", choices=["or", "and"], default="or")
    q.add_argument("--distributed", action="store_true")
    q.add_argument("--expand-fields", action="store_true",
                   help="bare tokens also query every indexed field column "
                        "(the reference's multi-field OR default)")
    q.add_argument("--sort-attr", default=None,
                   help="order hits by this stored doc_map attribute "
                        "instead of relevance (IndexSearcher Sort analog; "
                        "implies the distributed path)")
    q.add_argument("--sort-desc", action="store_true")
    q.add_argument("--count-only", action="store_true",
                   help="print only the total hit count "
                        "(TotalHitCountCollector analog)")
    q.add_argument("--pinned", default=None,
                   help="comma-separated doc ids promoted to the top in "
                        "list order (ES pinned query); unknown/deleted "
                        "ids are dropped")
    q.add_argument("--collapse-attr", default=None,
                   help="field-collapse hits on this stored attribute: "
                        "top-k GROUPS, --per-group hits each (Lucene "
                        "grouping / ES collapse analog)")
    q.add_argument("--per-group", type=int, default=1)
    q.add_argument("--parent-attr", default=None,
                   help="fold child hits per value of this stored "
                        "attribute (ToParentBlockJoinQuery analog), "
                        "scored by --score-mode")
    q.add_argument("--score-mode", default="max",
                   choices=["max", "avg", "total", "none"])
    q.add_argument("--rescore-query", default=None,
                   help="re-rank the top --rescore-window hits by "
                        "weighted combination with this second query "
                        "(QueryRescorer analog; full parser surface — "
                        "quote a phrase for proximity rerank)")
    q.add_argument("--rescore-window", type=int, default=50)
    q.add_argument("--query-weight", type=float, default=1.0)
    q.add_argument("--rescore-weight", type=float, default=1.0)
    q.add_argument("--filter", default=None,
                   help="constant-score FILTER sub-query (Lucene "
                        "FilteredQuery / ES bool filter): restricts hits "
                        "without touching scores; full parser surface "
                        "(e.g. 'lang:en', 'lang:en OR lang:de')")
    q.add_argument("--similarity", choices=["bm25", "classic"],
                   default="bm25",
                   help="'classic' ranks with Lucene ClassicSimilarity — "
                        "the reference's DefaultSimilarity TF-IDF scoring "
                        "incl. the exact byte315 norm quantization "
                        "(always the distributed path)")
    q.add_argument("--fuzzy-prefix", type=int, default=0,
                   help="FuzzyQuery prefixLength: term~N expansion "
                        "candidates must share the probe's first this-"
                        "many characters exactly (Lucene default 0)")
    q.add_argument("--dismax", action="store_true",
                   help="DisjunctionMaxQuery scoring: each token ranks by "
                        "the max over its field variants + --tie x the "
                        "rest (Solr/ES dismax)")
    q.add_argument("--tie", type=float, default=0.0)
    q.add_argument("--field-boosts", default=None,
                   help="dismax qf weights, e.g. 'text=1,source=0.5' "
                        "('text' = the unprefixed field)")
    q.add_argument("--synonyms", default=None,
                   help="SynonymQuery blended scoring: per-token synonym "
                        "groups, e.g. 'spark=stream|pyspark;join=merge' "
                        "(tf-sum + max-df blend, not a boolean OR)")
    q.add_argument("--negative", default=None,
                   help="BoostingQuery demotion (ES boosting): hits also "
                        "matching this query are re-scored x "
                        "--negative-boost, never excluded")
    q.add_argument("--negative-boost", type=float, default=0.5)
    q.add_argument("--boost-attr", default=None,
                   help="FunctionScoreQuery / ES field_value_factor: "
                        "reshape scores by modifier(attr x factor) from "
                        "this STORED numeric doc_map attribute")
    q.add_argument("--boost-factor", type=float, default=1.0)
    q.add_argument("--boost-modifier", default="none",
                   choices=["none", "log1p", "sqrt"])
    q.add_argument("--boost-mode", default="multiply",
                   choices=["multiply", "sum"])
    q.add_argument("--boost-missing", type=float, default=1.0)
    q.add_argument("--decay-attr", default=None,
                   help="ES function_score decay over this STORED numeric "
                        "attr: multiplier 1 at --decay-origin, "
                        "--decay-rate at distance --decay-scale")
    q.add_argument("--decay-origin", type=float, default=0.0)
    q.add_argument("--decay-scale", type=float, default=1.0)
    q.add_argument("--decay-shape", default="gauss",
                   choices=["gauss", "exp", "linear"])
    q.add_argument("--decay-rate", type=float, default=0.5)
    q.add_argument("--decay-offset", type=float, default=0.0)

    sp = sub.add_parser("suggest-phrase", help="whole-query spell "
                        "correction (ES phrase-suggester shape): per-token "
                        "fuzzy candidates ranked jointly by the dictionary "
                        "unigram LM minus an edit penalty")
    sp.add_argument("--index", required=True)
    sp.add_argument("--query", required=True)
    sp.add_argument("-n", type=int, default=3)
    sp.add_argument("--max-edits", type=int, default=2)
    sp.add_argument("--per-term", type=int, default=5)
    sp.add_argument("--edit-penalty", type=float, default=1.0)
    sp.add_argument("--collate", action="store_true",
                    help="keep only suggestions with >=1 conjunctive match")

    st = sub.add_parser("sig-terms", help="significant-terms aggregation "
                        "(ES significant_terms under a sampler): JLH-scored "
                        "terms of the query's top-window hits vs the corpus")
    st.add_argument("--index", required=True)
    st.add_argument("--query", required=True)
    st.add_argument("-n", type=int, default=10)
    st.add_argument("--window", type=int, default=200)
    st.add_argument("--min-doc-count", type=int, default=2)
    st.add_argument("--mode", choices=["or", "and"], default="or")

    c = sub.add_parser("complete", help="prefix completion")
    c.add_argument("--index", required=True)
    c.add_argument("--prefix", required=True)
    c.add_argument("-n", type=int, default=20)

    p = sub.add_parser("phrase", help="exact phrase query (needs a positions=True index)")
    p.add_argument("--index", required=True)
    p.add_argument("--phrase", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--distributed", action="store_true")

    hl = sub.add_parser(
        "highlight",
        help="tagged highlight fragments of one doc's stored text "
             "(Lucene highlighter analog; needs --store-text index)")
    hl.add_argument("--index", required=True)
    hl.add_argument("--id", type=int, required=True)
    hl.add_argument("--query", required=True)
    hl.add_argument("--max-frags", type=int, default=3)

    mp = sub.add_parser(
        "multi-phrase",
        help="MultiPhraseQuery: phrase with per-slot alternatives "
             "(Lucene MultiPhraseQuery analog; needs positions=True)")
    mp.add_argument("--index", required=True)
    mp.add_argument("--slots", required=True,
                    help="';'-separated slots, '|'-separated alternatives: "
                         "'spark;join|merge'")
    mp.add_argument("--slop", type=int, default=0)
    mp.add_argument("-k", type=int, default=10)
    mp.add_argument("--distributed", action="store_true")

    pp = sub.add_parser(
        "phrase-prefix",
        help="match_phrase_prefix (ES search-as-you-type): quoted phrase "
             "whose LAST token is a prefix (needs a positions=True index)")
    pp.add_argument("--index", required=True)
    pp.add_argument("--phrase", required=True)
    pp.add_argument("-k", type=int, default=10)
    pp.add_argument("--slop", type=int, default=0)
    pp.add_argument("--distributed", action="store_true")

    iv = sub.add_parser(
        "intervals",
        help="IntervalQuery (Lucene queries.intervals analog): nested "
             "ordered/unordered/or spec with max_gaps, minimal-interval "
             "semantics (needs a positions=True index)")
    iv.add_argument("--index", required=True)
    iv.add_argument("--spec", required=True,
                    help='JSON Intervals-factory form, e.g. \'{"ordered": '
                         '[{"term": "spark"}, {"or": [{"term": "join"}, '
                         '{"term": "merge"}]}], "max_gaps": 2}\'')
    iv.add_argument("-k", type=int, default=10)
    iv.add_argument("--distributed", action="store_true")

    sn = sub.add_parser(
        "span-near",
        help="SpanNearQuery: terms within a position window, optionally "
             "in order (Lucene spans analog; needs a positions=True index)")
    sn.add_argument("--index", required=True)
    sn.add_argument("--terms", required=True,
                    help="comma-separated index terms, e.g. spark,join")
    sn.add_argument("--slop", type=int, default=0)
    sn.add_argument("--ordered", action="store_true")
    sn.add_argument("-k", type=int, default=10)
    sn.add_argument("--distributed", action="store_true")

    sg = sub.add_parser("suggest", help="spell-correction suggestions "
                        "('did you mean') from the fuzzy n-gram table")
    sg.add_argument("--index", required=True)
    sg.add_argument("--term", required=True)
    sg.add_argument("-n", type=int, default=5)
    sg.add_argument("--max-edits", type=int, default=2)

    fc = sub.add_parser("facets", help="per-attribute-value counts over the "
                        "full match set (Lucene facets analog)")
    fc.add_argument("--index", required=True)
    fc.add_argument("--query", required=True)
    fc.add_argument("--attr", required=True)
    fc.add_argument("--mode", choices=["or", "and"], default="or")

    ag = sub.add_parser("aggs", help="ES multi-aggregation request over "
                        "one shared match set: --spec is the aggs body "
                        '{name: {"type": stats|terms|histogram|range|'
                        "date_histogram|cardinality|percentiles|composite|"
                        "filters, ...params}}")
    ag.add_argument("--index", required=True)
    ag.add_argument("--query", required=True)
    ag.add_argument("--spec", required=True, help="JSON aggs spec object")
    ag.add_argument("--mode", choices=["or", "and"], default="or")

    us = sub.add_parser("usages", help="decoded (doc_id, tf) occurrence "
                        "list for a term (the reference's `polaris "
                        "findusages`, cli/command/FindUsages.java)")
    us.add_argument("--index", required=True)
    us.add_argument("--term", required=True)

    so = sub.add_parser("source", help="doc_map identity rows for doc ids "
                        "(the reference's `polaris source`, "
                        "cli/command/Source.java)")
    so.add_argument("--index", required=True)
    so.add_argument("--ids", required=True, help="comma-separated doc ids")

    ls_ = sub.add_parser("ls", help="hierarchical corpus browse over the "
                         "stored attribute levels (the reference's "
                         "SourceDb.listDirectory, sourcedb/SourceDb.java:"
                         "23-25; transcripts have no filesystem, so the "
                         "attr columns are the directory levels and docs "
                         "the files)")
    ls_.add_argument("--index", required=True)
    ls_.add_argument("--path", default="",
                     help="slash-separated attr values fixing the leading "
                          "levels (empty = root)")
    ls_.add_argument("--levels", default=None,
                     help="comma-separated level columns (default: every "
                          "non-id doc_map attribute)")

    dt = sub.add_parser("doc-terms", help="forward term listing for one "
                        "document: (term, tf, df) — the reference's "
                        "UsageDb.findUsagesInFile / TypeDb.getTypesInFile "
                        "analog (needs a store_text index, or --docs for "
                        "the text side)")
    dt.add_argument("--index", required=True)
    dt.add_argument("--id", required=True, type=int)
    dt.add_argument("--docs", default=None,
                    help="optional parquet with (doc_id, text) when the "
                         "index stores no text")

    pl = sub.add_parser("plan", help="dump a query's physical plan — the "
                        "Catalyst analog of the reference's `polaris plan` "
                        "Crunch-plan dump (cli/command/Plan.java writes the "
                        "pipeline .dot; here the optimizer owns the plan, "
                        "so the dump is explain('formatted') of the "
                        "distributed search)")
    pl.add_argument("--index", required=True)
    pl.add_argument("--query", required=True)
    pl.add_argument("-k", type=int, default=10)
    pl.add_argument("--out", default=None,
                    help="write the plan to a file instead of stdout")

    s = sub.add_parser("stats", help="print index stats + manifests")
    s.add_argument("--index", required=True)

    tb = sub.add_parser("table", help="dump rows of index-internal parquet "
                        "tables (tf/postings/dictionary/doc_map/completion/"
                        "fuzzy_ngrams dirs, or any parquet path) — the "
                        "reference's `polaris seqfile` intermediate-file "
                        "dump (cli/command/DumpSequenceFile.java)")
    tb.add_argument("paths", nargs="+", help="parquet paths to dump")
    tb.add_argument("-s", "--summary", action="store_true",
                    help="only print row count + schema per path")
    tb.add_argument("-n", type=int, default=20,
                    help="max rows to print per path (non-summary)")

    ck = sub.add_parser("check", help="index integrity verification "
                        "(Lucene CheckIndex analog): decode every posting "
                        "blob and verify the aux tables' congruence; "
                        "exits 1 on any violation")
    ck.add_argument("--index", required=True)

    cv = sub.add_parser("check-ivf", help="vector-index integrity "
                        "verification: quantized sidecar row counts per "
                        "centroid vs the float table, PQ/SQ shape checks, "
                        "pending append marker; exits 1 on any violation")
    cv.add_argument("--index", required=True, help="IVF index dir")

    ex = sub.add_parser("explain", help="per-term BM25 score breakdown for "
                        "one (query, doc) — the IndexSearcher.explain "
                        "analog")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--doc", required=True, type=int)

    ml = sub.add_parser("mlt", help="MoreLikeThis: top-k docs most similar "
                        "to a given doc's text (top tf-idf terms scored as "
                        "a BM25 OR, source doc excluded)")
    ml.add_argument("--index", required=True)
    ml.add_argument("--doc", required=True, type=int,
                    help="source doc_id (its text must be stored in "
                         "doc_map, or pass --text)")
    ml.add_argument("--text", default=None,
                    help="explicit source text (skips the doc_map lookup)")
    ml.add_argument("-k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=8)

    cu = sub.add_parser("curate", help="training-data curation ledger "
                        "(quality → langid → exact dedup → LSH near-dup CC)")
    cu.add_argument("--input", required=True, help="documents parquet")
    cu.add_argument("--output", required=True,
                    help="output parquet of (doc_id, keep, reason)")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--doc-id-col", default="doc_id")
    cu.add_argument("--min-quality", type=float, default=0.55)
    cu.add_argument("--langs", default="en",
                    help="comma-separated allowed language codes")
    cu.add_argument("--threshold", type=float, default=0.5,
                    help="near-dup Jaccard threshold")
    cu.add_argument("--bench", default=None,
                    help="optional benchmark/eval parquet: adds "
                         "decontamination as stage 0 (reason "
                         "'contaminated', 13-gram rule)")
    cu.add_argument("--bench-text-col", default="text")
    cu.add_argument("--decontam-ngram", type=int, default=13)
    cu.add_argument("--gopher", action="store_true",
                    help="add the Gopher rule filter as a stage between "
                         "decontamination and the quality score "
                         "(reason 'gopher')")
    cu.add_argument("--gopher-min-words", type=int, default=50)

    lm = sub.add_parser("lm", help="corpus bigram-LM scoring (CCNet "
                        "perplexity-filter shape): train on --train-input "
                        "(default: the corpus itself), score every doc")
    lm.add_argument("--input", required=True, help="documents parquet")
    lm.add_argument("--output", required=True,
                    help="output parquet: (doc_id, n_bigrams, nlp_e6)")
    lm.add_argument("--train-input", default=None,
                    help="reference corpus to fit the model on "
                         "(train once, score any stream)")
    lm.add_argument("--text-col", default="text")
    lm.add_argument("--doc-id-col", default="doc_id")

    sc = sub.add_parser("scrub", help="PII-redact + annotate quality/"
                        "repetition/token-count signal columns")
    sc.add_argument("--input", required=True, help="documents parquet")
    sc.add_argument("--output", required=True,
                    help="output parquet: input columns + signals, text "
                         "replaced by its PII-redacted form")
    sc.add_argument("--text-col", default="text")
    sc.add_argument("--doc-id-col", default="doc_id")
    sc.add_argument("--dup-spans", action="store_true",
                    help="also write <output>_spans parquet of maximal "
                         "duplicated ≥n-token spans")
    sc.add_argument("--span-ngram", type=int, default=8)
    sc.add_argument("--span-min-docs", type=int, default=2)
    sc.add_argument("--gopher", action="store_true",
                    help="also annotate the Gopher rule columns + pass "
                         "flag (Rae et al. 2021 Table A1)")
    sc.add_argument("--gopher-min-words", type=int, default=50)
    sc.add_argument("--c4", action="store_true",
                    help="also annotate the C4 cleanup columns (Raffel "
                         "et al. 2020 §2.2: line filter -> c4_clean_text "
                         "+ page-rule flags)")
    sc.add_argument("--c4-bad-words", default="",
                    help="comma-separated blocklist for the C4 bad-word "
                         "rule (default empty)")

    ch = sub.add_parser("chunk", help="context-window chunking: split each "
                        "doc's whitespace tokens into fixed-size windows "
                        "with stride (pre-tokenizer sequence prep)")
    ch.add_argument("--input", required=True, help="documents parquet")
    ch.add_argument("--output", required=True,
                    help="output parquet (doc_id, chunk_idx, chunk_start, "
                         "n_tokens, chunk_text)")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--doc-id-col", default="doc_id")
    ch.add_argument("--size", type=int, default=512,
                    help="window size in whitespace tokens")
    ch.add_argument("--stride", type=int, default=384,
                    help="window advance (overlap = size - stride)")

    md = sub.add_parser("media", help="multimodal feature extraction: "
                        "decode binary media payloads with the REAL "
                        "in-container codecs (BMP/PPM/PNG/JPEG/GIF images, "
                        "WAV/FLAC audio) via Arrow mapInPandas and emit "
                        "per-asset feature vectors; unknown formats fall "
                        "back to the deterministic byte-level stub")
    md.add_argument("--input", required=True,
                    help="assets parquet (asset_id, kind, data, meta)")
    md.add_argument("--output", required=True,
                    help="output parquet (asset_id, kind, n_bytes, "
                         "features)")
    md.add_argument("--resize", default=None, metavar="WxH",
                    help="also write WxH luminance thumbnails of the "
                         "image assets to OUTPUT_resized")
    md.add_argument("--stub", action="store_true",
                    help="force the byte-level stub featurizer "
                         "(plumbing contract check)")

    pc = sub.add_parser("percolate", help="percolator (Lucene Monitor "
                        "analog): match a registry of saved queries "
                        "against documents — batch parquet, or a landing "
                        "stream with --stream (saved-search alerting)")
    pc.add_argument("--input", required=True,
                    help="documents parquet (batch) or landing dir "
                         "(--stream)")
    pc.add_argument("--queries", required=True,
                    help="registry: inline JSON object or a path to a "
                         "JSON file {query_id: classic query string}")
    pc.add_argument("--output", required=True,
                    help="alert parquet (input columns + query_id)")
    pc.add_argument("--text-col", default="text")
    pc.add_argument("--field-cols", default="",
                    help="comma-separated doc columns addressable as "
                         "field:value in registry queries")
    pc.add_argument("--stream", action="store_true")
    pc.add_argument("--checkpoint", default=None,
                    help="required with --stream (exactly-once pickup)")
    pc.add_argument("--schema", default=None,
                    help="streaming input schema DDL (defaults to the "
                         "documents shape)")

    bp = sub.add_parser("bpe", help="BPE tokenizer training (Sennrich et "
                        "al. 2016): learn a merge table from the corpus "
                        "word histogram, optionally encode the corpus "
                        "with it (array<string> subword column)")
    bp.add_argument("--input", required=True, help="documents parquet")
    bp.add_argument("--merges", required=True,
                    help="merge-table parquet to write (rank, left, right)"
                         " — or to read when --reuse-merges")
    bp.add_argument("--reuse-merges", action="store_true",
                    help="skip learning; encode with an existing table")
    bp.add_argument("--encode-out", default=None,
                    help="optional output parquet: input columns + 'bpe'")
    bp.add_argument("--text-col", default="text")
    bp.add_argument("--n-merges", type=int, default=1000)
    bp.add_argument("--max-words", type=int, default=65536,
                    help="histogram cap (top words by count; the cut is "
                         "reported, never silent)")
    bp.add_argument("--min-count", type=int, default=2)
    bp.add_argument("--ids", action="store_true",
                    help="also write <merges>_vocab.parquet (token_id, "
                         "token) and emit 'bpe_ids' (array<int>) in "
                         "--encode-out instead of subword strings")

    sd = sub.add_parser("semdedup", help="SemDeDup semantic dedup ledger "
                        "(Abbas et al. 2023): k-means cluster, then drop "
                        "within-cluster near-duplicates keeping the min-id "
                        "representative")
    sd.add_argument("--input", required=True,
                    help="embeddings parquet (id + array<float> column)")
    sd.add_argument("--output", required=True,
                    help="ledger parquet (vec_id, centroid_id, dup_of, keep)")
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--centroids", type=int, default=8,
                    help="k-means clusters (1 = exact brute force)")
    sd.add_argument("--threshold", type=float, default=0.9,
                    help="rounded-cosine near-duplicate threshold")
    sd.add_argument("--seed", type=int, default=42)
    sd.add_argument("--srp-bits", type=int, default=None,
                    help="hot-cluster dial: additionally key the pair "
                         "join on an SRP bucket (largest task shrinks "
                         "from cluster^2 to bucket^2; recall via "
                         "--srp-tables)")
    sd.add_argument("--srp-tables", type=int, default=8)

    ss = sub.add_parser("strip-spans", help="ExactSubstr removal (Lee et "
                        "al. 2022 transform): cut every duplicated "
                        ">=n-token span out of the text (no surviving "
                        "copy — see ops/dedup.strip_dup_spans)")
    ss.add_argument("--input", required=True, help="documents parquet")
    ss.add_argument("--output", required=True,
                    help="output parquet (doc_id, clean_text, n_tokens, "
                         "n_cut)")
    ss.add_argument("--text-col", default="text")
    ss.add_argument("--doc-id-col", default="doc_id")
    ss.add_argument("--span-ngram", type=int, default=8)
    ss.add_argument("--span-min-docs", type=int, default=2)
    ss.add_argument("--hash-shingles", action="store_true",
                    help="xxhash64 gram keys (the 100TB shuffle-width "
                         "setting; identical output modulo 2^-64 "
                         "collisions)")

    cl = sub.add_parser("classify", help="hashed multinomial NB text "
                        "classifier (the CCNet/GPT-3 trained-quality-"
                        "classifier slot): closed-form one-pass training "
                        "on --train's --label-col, map-side scoring of "
                        "--input")
    cl.add_argument("--input", required=True,
                    help="documents parquet to score")
    cl.add_argument("--train", default=None,
                    help="labeled documents parquet (default: --input — "
                         "self-train, e.g. on its lang column)")
    cl.add_argument("--label-col", required=True)
    cl.add_argument("--output", required=True,
                    help="predictions parquet (doc_id, label, score)")
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--doc-id-col", default="doc_id")
    cl.add_argument("--features", type=int, default=2 ** 18)
    cl.add_argument("--alpha", type=float, default=1.0)
    cl.add_argument("--scores", action="store_true",
                    help="write the full |docs| x |labels| score matrix "
                         "instead of the argmax row (thresholded curation)")

    ds = sub.add_parser("dsir", help="DSIR importance weights (Xie et al. "
                        "2023): hashed unigram+bigram bucket "
                        "distributions, log importance weight per raw "
                        "doc vs a target corpus")
    ds.add_argument("--input", required=True, help="raw documents parquet")
    ds.add_argument("--target", required=True,
                    help="target-domain documents parquet")
    ds.add_argument("--output", required=True,
                    help="weights parquet (doc_id, n_feats, logw_e6"
                         " [, kept])")
    ds.add_argument("--text-col", default="text")
    ds.add_argument("--doc-id-col", default="doc_id")
    ds.add_argument("--buckets", type=int, default=10000)
    ds.add_argument("--keep-frac", type=float, default=None,
                    help="also select the top fraction by weight "
                         "(the paper's resampling step, deterministic "
                         "top-weight variant)")
    ds.add_argument("--gumbel-k", type=int, default=None,
                    help="instead select k docs by Gumbel-top-k (the "
                         "paper's sampling-without-replacement step; "
                         "md5-derived noise — deterministic per seed)")
    ds.add_argument("--temperature", type=float, default=1.0)
    ds.add_argument("--seed", type=int, default=42)

    pp = sub.add_parser("pipeline", help="END-TO-END training-data "
                        "curation: curate (decontam/quality/langid/dedup "
                        "ledger) -> PII scrub -> ExactSubstr span removal "
                        "-> optional DSIR selection -> context-window "
                        "chunking, one command, per-stage parquet + "
                        "counts")
    pp.add_argument("--input", required=True, help="documents parquet")
    pp.add_argument("--output", required=True,
                    help="output DIRECTORY (one parquet per stage)")
    pp.add_argument("--text-col", default="text")
    pp.add_argument("--doc-id-col", default="doc_id")
    pp.add_argument("--min-quality", type=float, default=0.55)
    pp.add_argument("--langs", default="en")
    pp.add_argument("--bench", default=None,
                    help="benchmark parquet for the decontamination stage")
    pp.add_argument("--gopher", action="store_true",
                    help="insert the Gopher rule stage into curation")
    pp.add_argument("--gopher-min-words", type=int, default=50)
    pp.add_argument("--span-ngram", type=int, default=8)
    pp.add_argument("--span-min-docs", type=int, default=2)
    pp.add_argument("--dsir-target", default=None,
                    help="target-domain parquet: adds DSIR top-weight "
                         "selection after span removal")
    pp.add_argument("--dsir-keep-frac", type=float, default=0.5)
    pp.add_argument("--chunk-size", type=int, default=512)
    pp.add_argument("--chunk-stride", type=int, default=384)

    mx = sub.add_parser("mix", help="data-mixing: deterministic stratified "
                        "sample → per-source token budget → context-window "
                        "packing (any stage optional)")
    mx.add_argument("--input", required=True, help="documents parquet")
    mx.add_argument("--output", required=True,
                    help="output parquet of surviving rows (+ mix_u, "
                         "n_ws_tokens, bin_id columns as applicable)")
    mx.add_argument("--key", default="source", help="mixture group column")
    mx.add_argument("--doc-id-col", default="doc_id")
    mx.add_argument("--text-col", default="text")
    mx.add_argument("--rates", default="",
                    help="comma list grp=rate (e.g. web=0.3,code=1.0); "
                         "unlisted groups use --default-rate")
    mx.add_argument("--default-rate", type=float, default=1.0)
    mx.add_argument("--temperature", type=float, default=None,
                    help="alpha for temperature mixing (mT5/Pile rule: "
                         "source prob ∝ n^alpha); replaces --rates — "
                         "rates derive from per-source counts, scaled to "
                         "--target-frac and capped at 1")
    mx.add_argument("--target-frac", type=float, default=0.5,
                    help="overall kept fraction the temperature rates "
                         "aim for (ignored without --temperature)")
    mx.add_argument("--epochs", default="",
                    help="comma list grp=int-repeats (recipe epochs, 0 "
                         "drops the group); rows multiply map-side with "
                         "copy_idx; unlisted groups use --default-epochs")
    mx.add_argument("--default-epochs", type=int, default=1)
    mx.add_argument("--seed", type=int, default=0)
    mx.add_argument("--budgets", default="",
                    help="comma list grp=token-budget; unlisted groups use "
                         "--default-budget (0 = unlimited)")
    mx.add_argument("--default-budget", type=int, default=0)
    mx.add_argument("--capacity", type=int, default=0,
                    help=">0: pack surviving docs into context-window bins "
                         "of this many whitespace tokens")
    mx.add_argument("--materialize", action="store_true",
                    help="with --capacity: write ONE ROW PER BIN (concat "
                         "text, member doc_ids, document-boundary token "
                         "offsets) — the trainer-facing sequences — "
                         "instead of per-doc rows tagged bin_id")

    rc = sub.add_parser("recipe", help="END-TO-END training-data recipe as "
                        "ONE job: curate (quality+lang+decontam+dedup) → "
                        "temperature mix → epoch upsample → global shuffle "
                        "→ pack → trainer-facing bins (ops/recipe.py)")
    rc.add_argument("--input", required=True, help="documents parquet")
    rc.add_argument("--output", required=True, help="bins parquet")
    rc.add_argument("--bench", default=None,
                    help="benchmark parquet for the decontam stage")
    rc.add_argument("--key", default="source")
    rc.add_argument("--doc-id-col", default="doc_id")
    rc.add_argument("--text-col", default="text")
    rc.add_argument("--alpha", type=float, default=0.5,
                    help="temperature mixing alpha")
    rc.add_argument("--target-frac", type=float, default=0.7)
    rc.add_argument("--epochs", default="",
                    help="comma list grp=int-repeats (< --max-repeats)")
    rc.add_argument("--default-epochs", type=int, default=1)
    rc.add_argument("--max-repeats", type=int, default=8)
    rc.add_argument("--capacity", type=int, default=512)
    rc.add_argument("--seed", type=int, default=0)

    dc = sub.add_parser("decontam", help="benchmark decontamination: flag "
                        "or drop corpus docs sharing any word n-gram with "
                        "a benchmark/eval set (GPT-3 appendix-C rule)")
    dc.add_argument("--input", required=True, help="corpus parquet")
    dc.add_argument("--bench", required=True,
                    help="benchmark/eval parquet (small; its n-gram set "
                         "is broadcast)")
    dc.add_argument("--output", required=True,
                    help="output parquet: input columns + n_hit_ngrams + "
                         "contaminated (or only clean rows with --drop)")
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--doc-id-col", default="doc_id")
    dc.add_argument("--bench-text-col", default="text")
    dc.add_argument("--ngram", type=int, default=13)
    dc.add_argument("--drop", action="store_true",
                    help="write only clean rows (anti-join the hit set; "
                         "no per-doc flag columns)")

    rv = sub.add_parser("rank-eval", help="ranking-quality evaluation "
                        "(ES _rank_eval): per-query precision/recall/RR/"
                        "nDCG@k against a graded judgments parquet "
                        "(query, doc_id, grade); all queries scored as "
                        "ONE batched job")
    rv.add_argument("--index", required=True)
    rv.add_argument("--judgments", required=True,
                    help="parquet with (query, doc_id, grade) rows; the "
                         "evaluated query set = its distinct queries")
    rv.add_argument("-k", type=int, default=10)
    rv.add_argument("--rel-threshold", type=int, default=1)
    rv.add_argument("--mode", default="or")

    ex = sub.add_parser("export", help="materialize a query's FULL match "
                        "set to parquet (corpus-subset selection; ES "
                        "scroll-and-export as one distributed job)")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--output", required=True, help="output parquet path")
    ex.add_argument("--docs", default=None,
                    help="payload parquet (doc_id + columns); default: "
                         "the index's doc_map")
    ex.add_argument("--columns", default=None,
                    help="comma-separated payload columns (doc_id kept)")
    ex.add_argument("--mode", default="or")
    ex.add_argument("--no-score", action="store_true",
                    help="drop score/n_match for a pure subset table")

    hy = sub.add_parser("hybrid", help="hybrid BM25 + cosine-kNN search "
                        "fused by reciprocal rank (ES rrf retriever): the "
                        "embeddings id column must share the index's "
                        "doc_id space")
    hy.add_argument("--index", required=True)
    hy.add_argument("--embeddings", required=True,
                    help="embeddings parquet (id + array<float> column)")
    hy.add_argument("--query", required=True)
    hy.add_argument("--query-vec-id", type=int, default=None,
                    help="take the query vector from this embeddings row")
    hy.add_argument("--query-vec", default=None,
                    help="comma-separated floats (alternative to "
                         "--query-vec-id)")
    hy.add_argument("-k", type=int, default=10)
    hy.add_argument("--window", type=int, default=100,
                    help="per-leg rank window before fusion")
    hy.add_argument("--rank-constant", type=int, default=60)
    hy.add_argument("--weights", default="1,1",
                    help="lexical,vector leg weights")
    hy.add_argument("--id-col", default="vec_id")
    hy.add_argument("--vec-col", default="embedding")
    hy.add_argument("--mode", default="or")
    hy.add_argument("--filter", default=None,
                    help="constant-score FILTER query applied to BOTH "
                         "legs pre-ranking (ES filtered-kNN contract)")

    kn = sub.add_parser("neighbors", help="k-nearest-neighbor self-join "
                        "over an embeddings parquet (SemDeDup prep): "
                        "exact, or multi-table SRP-LSH at scale")
    kn.add_argument("--input", required=True,
                    help="embeddings parquet (id + array<float> column)")
    kn.add_argument("--output", required=True,
                    help="output parquet (vec_id, neighbor_id, cos, rank)")
    kn.add_argument("--id-col", default="vec_id")
    kn.add_argument("--vec-col", default="embedding")
    kn.add_argument("-k", type=int, default=3)
    kn.add_argument("--srp-bits", type=int, default=0,
                    help=">0: SRP-LSH candidates (bits per table) instead "
                         "of the exact O(n²) join")
    kn.add_argument("--srp-tables", type=int, default=8,
                    help="LSH tables (recall dial; only with --srp-bits)")
    kn.add_argument("--seed", type=int, default=42)

    rp = sub.add_parser("report", help="dataset-card report: docs/tokens/"
                        "length spread/language mix/dup rate/quality of a "
                        "corpus parquet as one JSON")
    rp.add_argument("--input", required=True)
    rp.add_argument("--text-col", default="text")
    rp.add_argument("--doc-id-col", default="doc_id")
    rp.add_argument("--group-col", default=None,
                    help="optional per-source breakdown column")
    rp.add_argument("--approx", action="store_true",
                    help="sketch forms (HLL++ dup count, approx "
                         "percentiles) — the corpus-scale path")

    dr = sub.add_parser("drift", help="token-distribution drift between "
                        "two corpus parquets (JS divergence over hashed "
                        "n-gram buckets; crawl-over-crawl monitor)")
    dr.add_argument("--input-a", required=True)
    dr.add_argument("--input-b", required=True)
    dr.add_argument("--text-col", default="text")
    dr.add_argument("--doc-id-col", default="doc_id")
    dr.add_argument("--buckets", type=int, default=1024)
    dr.add_argument("--top", type=int, default=10,
                    help="print the N most-shifted buckets")

    sdc = sub.add_parser("semdecontam", help="semantic benchmark "
                         "decontamination: flag corpus embeddings within "
                         "a cosine threshold of ANY bench embedding")
    sdc.add_argument("--input", required=True,
                     help="corpus embeddings parquet")
    sdc.add_argument("--bench", required=True,
                     help="benchmark embeddings parquet")
    sdc.add_argument("--output", required=True,
                     help="output parquet (vec_id, bench_cos, contaminated)")
    sdc.add_argument("--threshold", type=float, default=0.95)
    sdc.add_argument("--id-col", default="vec_id")
    sdc.add_argument("--vec-col", default="embedding")

    mx = sub.add_parser("maxsim", help="late-interaction (ColBERT MaxSim) "
                        "scoring over a token-vector parquet: per doc, "
                        "sum over query tokens of the max token cosine")
    mx.add_argument("--input", required=True,
                    help="token-vector parquet (doc col + array<float>)")
    mx.add_argument("--doc-col", required=True,
                    help="column grouping token vectors into docs")
    mx.add_argument("--vec-col", default="embedding")
    mx.add_argument("--query-ids", required=True,
                    help="comma-separated vec_id list whose vectors form "
                         "the query tokens")
    mx.add_argument("--id-col", default="vec_id")
    mx.add_argument("-k", type=int, default=5)

    st = sub.add_parser("ingest-stream", help="streaming ingest: stream "
                        "parquet files landing in a directory into an "
                        "EXISTING index (foreachBatch append_index; "
                        "exactly-once file pickup via the checkpoint)")
    st.add_argument("--input-dir", required=True,
                    help="directory watched for new parquet files")
    st.add_argument("--index", required=True)
    st.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (exactly-once pickup)")
    st.add_argument("--follow", action="store_true",
                    help="keep running and pick up new files "
                         "(default: drain available files, then exit)")
    st.add_argument("--merge-every", type=int, default=None,
                    help="tiered-merge accumulated generations once this "
                         "many are unmerged (TieredMergePolicy loop)")
    st.add_argument("--compact-every", type=int, default=None,
                    help="full compact (forceMerge + side-table refold + "
                         "tf GC) every this-many total generations — "
                         "bounds side-table delta growth under "
                         "indefinite ingest; costs ~a rebuild, so set "
                         "much higher than --merge-every")

    sv = sub.add_parser("serve", help="HTTP serving daemon (devserver analog)")
    sv.add_argument("--index", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8042)
    sv.add_argument("--cache-terms", type=int, default=65536)

    args = ap.parse_args(argv)

    if args.cmd == "build":
        from polaris_spark.index.build import IndexConfig, build_index

        spark = _session("polaris_spark_build")
        cfg = IndexConfig(
            n_buckets=args.buckets, n_shards=args.shards, n_chunks=args.chunks,
            hot_df_threshold=args.hot_df_threshold, positions=args.positions,
            field_cols=tuple(c for c in args.field_cols.split(",") if c),
            attr_cols=tuple(c for c in args.attr_cols.split(",") if c),
            store_text=args.store_text,
        )
        docs = spark.read.parquet(args.input)
        m = build_index(
            spark, docs, args.index, text_col=args.text_col,
            id_cols=tuple(args.id_cols.split(",")),
            doc_id_col=args.doc_id_col, cfg=cfg, resume=not args.no_resume,
        )
        print(json.dumps(m))
    elif args.cmd == "append":
        from polaris_spark.index.maintenance import append_index

        spark = _session("polaris_spark_append")
        m = append_index(
            spark, spark.read.parquet(args.input), args.index,
            text_col=args.text_col, id_cols=tuple(args.id_cols.split(",")),
            doc_id_col=args.doc_id_col,
        )
        print(json.dumps(m))
    elif args.cmd == "merge":
        from polaris_spark.index.maintenance import merge_generations

        spark = _session("polaris_spark_merge")
        print(json.dumps(merge_generations(spark, args.index)))
    elif args.cmd == "compact":
        from polaris_spark.index.maintenance import compact_index

        spark = _session("polaris_spark_compact")
        print(json.dumps(compact_index(spark, args.index, gc=not args.no_gc)))
    elif args.cmd == "multi-query":
        from polaris_spark.query.multi import search_multi_df

        spark = _session("polaris_spark_multi")
        rows = [r.asDict() for r in search_multi_df(
            spark, [d for d in args.indexes.split(",") if d],
            args.query, k=args.k, mode=args.mode,
            expand_fields=args.expand_fields).collect()]
        print(json.dumps(rows))
    elif args.cmd == "reindex":
        from polaris_spark.index.maintenance import reindex

        spark = _session("polaris_spark_reindex")
        over = {}
        for flag, key in (("buckets", "n_buckets"), ("shards", "n_shards"),
                          ("chunks", "n_chunks"), ("positions", "positions"),
                          ("store_text", "store_text")):
            v = getattr(args, flag)
            if v is not None:
                over[key] = v
        for flag in ("field_cols", "attr_cols"):
            v = getattr(args, flag)
            if v is not None:
                over[flag] = tuple(c for c in v.split(",") if c)
        print(json.dumps(reindex(spark, args.index, args.dest, **over)))
    elif args.cmd == "snapshot":
        from polaris_spark.index.maintenance import snapshot_index

        spark = _session("polaris_spark_snapshot")
        print(json.dumps(snapshot_index(spark, args.index, args.dest)))
    elif args.cmd == "delete":
        from polaris_spark.index.maintenance import delete_docs

        spark = _session("polaris_spark_delete")
        if args.ids_parquet:
            ids = spark.read.parquet(args.ids_parquet)
        elif args.ids:
            ids = [int(i) for i in args.ids.split(",")]
        else:
            raise SystemExit("delete: provide --ids or --ids-parquet")
        print(json.dumps(delete_docs(spark, args.index, ids)))
    elif args.cmd == "query":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_query")
        eng = SearchEngine(spark, args.index,
                           fuzzy_prefix_length=args.fuzzy_prefix)
        if args.count_only:
            print(json.dumps({"query": args.query,
                              "count": eng.search_count(args.query,
                                                        args.mode)}))
            return
        if args.similarity == "classic":
            rows = [r.asDict() for r in eng.search_classic_df(
                args.query, args.k, mode=args.mode,
                expand_fields=args.expand_fields,
                filter_query=args.filter).collect()]
            print(json.dumps(rows))
            return
        if args.rescore_query:
            rows = [r.asDict() for r in eng.rescore(
                args.query, args.rescore_query, args.k,
                window=args.rescore_window,
                query_weight=args.query_weight,
                rescore_weight=args.rescore_weight, mode=args.mode,
                expand_fields=args.expand_fields).collect()]
            print(json.dumps(rows))
            return
        if args.pinned:
            ids = [int(x) for x in args.pinned.split(",") if x.strip()]
            rows = [r.asDict() for r in eng.search_pinned(
                args.query, ids, args.k, mode=args.mode,
                expand_fields=args.expand_fields).collect()]
            print(json.dumps(rows))
            return
        if args.collapse_attr:
            rows = [r.asDict() for r in eng.search_collapse(
                args.query, args.collapse_attr, args.k,
                per_group=args.per_group, mode=args.mode,
                expand_fields=args.expand_fields).collect()]
            print(json.dumps(rows))
            return
        if args.parent_attr:
            rows = [r.asDict() for r in eng.search_parent(
                args.query, args.parent_attr, args.k,
                score_mode=args.score_mode, mode=args.mode,
                expand_fields=args.expand_fields).collect()]
            print(json.dumps(rows))
            return
        if args.sort_attr:
            rows = [r.asDict() for r in eng.search_sorted(
                args.query, args.sort_attr, args.k,
                ascending=not args.sort_desc, mode=args.mode,
                expand_fields=args.expand_fields).collect()]
            print(json.dumps(rows))
            return
        if args.negative:
            rows = eng.search_boosting(
                args.query, args.negative,
                negative_boost=args.negative_boost, k=args.k,
                mode=args.mode, expand_fields=args.expand_fields)
            print(json.dumps(rows))
            return
        if args.decay_attr:
            rows = [r.asDict() for r in eng.search_decay(
                args.query, args.decay_attr, origin=args.decay_origin,
                scale=args.decay_scale, shape=args.decay_shape,
                decay=args.decay_rate, offset=args.decay_offset,
                missing=args.boost_missing, k=args.k, mode=args.mode,
                expand_fields=args.expand_fields).collect()]
            print(json.dumps(rows))
            return
        if args.boost_attr:
            rows = [r.asDict() for r in eng.search_function_score(
                args.query, args.boost_attr, factor=args.boost_factor,
                modifier=args.boost_modifier, missing=args.boost_missing,
                boost_mode=args.boost_mode, k=args.k, mode=args.mode,
                expand_fields=args.expand_fields).collect()]
            print(json.dumps(rows))
            return
        if args.synonyms:
            syn = {kv.split("=")[0]: kv.split("=")[1].split("|")
                   for kv in args.synonyms.split(";") if "=" in kv}
            if args.distributed or args.filter:
                rows = [r.asDict() for r in eng.search_synonyms_df(
                    args.query, syn, args.k, mode=args.mode,
                    filter_query=args.filter).collect()]
            else:
                rows = eng.search_synonyms(args.query, syn, args.k,
                                           mode=args.mode)
            print(json.dumps(rows))
            return
        if args.dismax:
            fb = (dict((kv.split("=")[0], float(kv.split("=")[1]))
                       for kv in args.field_boosts.split(","))
                  if args.field_boosts else None)
            if args.distributed or args.filter:
                rows = [r.asDict() for r in eng.search_dismax_df(
                    args.query, args.k, tie=args.tie, mode=args.mode,
                    field_boosts=fb, filter_query=args.filter).collect()]
            else:
                rows = eng.search_dismax(args.query, args.k, tie=args.tie,
                                         mode=args.mode, field_boosts=fb)
        elif args.distributed:
            rows = [r.asDict() for r in eng.search_df(
                args.query, args.k, args.mode,
                expand_fields=args.expand_fields,
                filter_query=args.filter).collect()]
        else:
            rows = eng.search(args.query, args.k, args.mode,
                              expand_fields=args.expand_fields,
                              filter_query=args.filter)
        print(json.dumps(rows))
    elif args.cmd == "phrase":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_phrase")
        eng = SearchEngine(spark, args.index)
        if args.distributed:
            rows = [r.asDict() for r in eng.search_phrase_df(args.phrase, args.k).collect()]
        else:
            rows = eng.search_phrase(args.phrase, args.k)
        print(json.dumps(rows))
    elif args.cmd == "highlight":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_highlight")
        eng = SearchEngine(spark, args.index)
        print(json.dumps(eng.highlight(args.id, args.query,
                                       max_frags=args.max_frags)))
    elif args.cmd == "multi-phrase":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_multi_phrase")
        eng = SearchEngine(spark, args.index)
        slots = [s.split("|") for s in args.slots.split(";") if s]
        if args.distributed:
            rows = [r.asDict() for r in eng.search_multi_phrase_df(
                slots, k=args.k, slop=args.slop).collect()]
        else:
            rows = eng.search_multi_phrase(slots, k=args.k, slop=args.slop)
        print(json.dumps(rows))
    elif args.cmd == "phrase-prefix":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_phrase_prefix")
        eng = SearchEngine(spark, args.index)
        if args.distributed:
            rows = [r.asDict() for r in eng.search_phrase_prefix_df(
                args.phrase, k=args.k, slop=args.slop).collect()]
        else:
            rows = eng.search_phrase_prefix(args.phrase, k=args.k,
                                            slop=args.slop)
        print(json.dumps(rows))
    elif args.cmd == "intervals":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_intervals")
        eng = SearchEngine(spark, args.index)
        spec = json.loads(args.spec)
        if args.distributed:
            rows = [r.asDict() for r in
                    eng.search_intervals_df(spec, k=args.k).collect()]
        else:
            rows = eng.search_intervals(spec, k=args.k)
        print(json.dumps(rows))
    elif args.cmd == "span-near":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_span_near")
        eng = SearchEngine(spark, args.index)
        terms = [t for t in args.terms.split(",") if t]
        if args.distributed:
            rows = [r.asDict() for r in eng.span_near_df(
                terms, slop=args.slop, in_order=args.ordered,
                k=args.k).collect()]
        else:
            rows = eng.span_near(terms, slop=args.slop,
                                 in_order=args.ordered, k=args.k)
        print(json.dumps(rows))
    elif args.cmd == "complete":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_complete")
        eng = SearchEngine(spark, args.index)
        print(json.dumps([r.asDict() for r in eng.complete(args.prefix, args.n).collect()]))
    elif args.cmd == "suggest":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_suggest")
        eng = SearchEngine(spark, args.index)
        print(json.dumps(eng.suggest(args.term, args.n, args.max_edits)))
    elif args.cmd == "suggest-phrase":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_suggest_phrase")
        eng = SearchEngine(spark, args.index)
        rows = [r.asDict() for r in eng.suggest_phrase(
            args.query, n=args.n, max_edits=args.max_edits,
            per_term=args.per_term, edit_penalty=args.edit_penalty,
            collate=args.collate).collect()]
        print(json.dumps(rows))
    elif args.cmd == "sig-terms":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_sigterms")
        eng = SearchEngine(spark, args.index)
        rows = [r.asDict() for r in eng.significant_terms(
            args.query, n=args.n, window=args.window,
            min_doc_count=args.min_doc_count, mode=args.mode).collect()]
        print(json.dumps(rows))
    elif args.cmd == "facets":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_facets")
        eng = SearchEngine(spark, args.index)
        rows = [r.asDict() for r in
                eng.facet_counts(args.query, args.attr, args.mode).collect()]
        rows.sort(key=lambda r: (-r["n"], str(r["facet"])))
        print(json.dumps(rows))
    elif args.cmd == "aggs":
        from polaris_spark.query.aggs import run_aggs
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_aggs")
        eng = SearchEngine(spark, args.index)
        out = run_aggs(eng, args.query, json.loads(args.spec),
                       mode=args.mode)
        print(json.dumps(out, default=str))
    elif args.cmd == "usages":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_usages")
        eng = SearchEngine(spark, args.index)
        print(json.dumps(eng.lookup_postings(args.term)))
    elif args.cmd == "source":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_source")
        eng = SearchEngine(spark, args.index)
        rows = sorted(
            (r.asDict(recursive=True)
             for r in eng.lookup_docs(
                 [int(i) for i in args.ids.split(",")]).collect()),
            key=lambda r: r["doc_id"])
        print(json.dumps(rows, default=str))
    elif args.cmd == "ls":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_ls")
        eng = SearchEngine(spark, args.index)
        path = tuple(p for p in args.path.split("/") if p)
        levels = (tuple(args.levels.split(",")) if args.levels else None)
        rows = [r.asDict() for r in eng.browse(path, levels).collect()]
        print(json.dumps(rows))
    elif args.cmd == "doc-terms":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_doc_terms")
        eng = SearchEngine(spark, args.index)
        docs = spark.read.parquet(args.docs) if args.docs else None
        rows = [r.asDict() for r in eng.doc_terms(args.id, docs=docs).collect()]
        print(json.dumps(rows))
    elif args.cmd == "plan":
        import io
        from contextlib import redirect_stdout

        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_plan")
        eng = SearchEngine(spark, args.index)
        # same per-query routing as the serving endpoint (search_mixed):
        # quoted phrase / boolean tree / flat — each on its DISTRIBUTED path
        from polaris_spark.query.boolquery import has_operators
        from polaris_spark.query.engine import parse_phrase_query

        pq = parse_phrase_query(args.query)
        if pq is not None:
            df = eng.search_phrase_df(pq[0], args.k, slop=pq[1])
        elif has_operators(args.query):
            df = eng.search_bool_df(args.query, args.k)
        else:
            df = eng.search_df(args.query, args.k)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        if args.out:
            with open(args.out, "w") as f:
                f.write(text)
            print(json.dumps({"written": args.out, "bytes": len(text)}))
        else:
            print(text)
    elif args.cmd == "ingest-stream":
        import os

        from polaris_spark.fs import get_fs
        from polaris_spark.streaming import stream_append

        spark = _session("polaris_spark_ingest_stream")
        q = stream_append(spark, args.input_dir, args.index, args.checkpoint,
                          available_now=not args.follow,
                          merge_every=args.merge_every,
                          compact_every=args.compact_every)
        q.awaitTermination()
        fs = get_fs(spark, args.index)
        stats = json.loads(
            fs.read_text(os.path.join(args.index, "_stats.json")))
        print(json.dumps({"n_docs": stats.get("N"),
                          "avgdl": stats.get("avgdl")}))
    elif args.cmd == "serve":
        from polaris_spark.server import serve

        spark = _session("polaris_spark_serve")
        srv, t = serve(spark, args.index, args.host, args.port, args.cache_terms)
        print(json.dumps({"serving": f"http://{srv.server_address[0]}:{srv.server_address[1]}"}),
              flush=True)
        t.join()
    elif args.cmd == "curate":
        from pyspark.sql import functions as F

        from polaris_spark.ops.curate import curate

        spark = _session("polaris_spark_curate")
        docs = spark.read.parquet(args.input)
        led = curate(docs, text_col=args.text_col, id_col=args.doc_id_col,
                     min_quality=args.min_quality,
                     langs=tuple(x for x in args.langs.split(",") if x),
                     threshold=args.threshold,
                     bench=(spark.read.parquet(args.bench)
                            if args.bench else None),
                     bench_text_col=args.bench_text_col,
                     decontam_n=args.decontam_ngram,
                     gopher=args.gopher,
                     gopher_min_words=args.gopher_min_words)
        led.write.mode("overwrite").parquet(args.output)
        out = {r["reason"]: r["n"] for r in
               spark.read.parquet(args.output)
               .groupBy("reason").agg(F.count("*").alias("n")).collect()}
        print(json.dumps({"output": args.output, "by_reason": out}))
    elif args.cmd == "strip-spans":
        from pyspark.sql import functions as F

        from polaris_spark.ops.dedup import strip_dup_spans

        spark = _session("polaris_spark_strip_spans")
        docs = spark.read.parquet(args.input)
        out = strip_dup_spans(docs, text_col=args.text_col,
                              id_col=args.doc_id_col,
                              n=args.span_ngram,
                              min_docs=args.span_min_docs,
                              hash_shingles=args.hash_shingles)
        out.write.mode("overwrite").parquet(args.output)
        led = spark.read.parquet(args.output)
        agg = led.agg(
            F.count("*").alias("n"),
            F.sum((F.col("n_cut") > 0).cast("long")).alias("nd"),
            F.sum("n_cut").alias("nt")).collect()[0]
        print(json.dumps({"output": args.output, "n_docs": agg["n"],
                          "n_docs_cut": int(agg["nd"] or 0),
                          "n_tokens_cut": int(agg["nt"] or 0)}))
    elif args.cmd == "classify":
        from pyspark.sql import functions as F

        from polaris_spark.ops.classifier import nb_score, nb_train

        spark = _session("polaris_spark_classify")
        docs = spark.read.parquet(args.input)
        train = spark.read.parquet(args.train) if args.train else docs
        model, ls = nb_train(train, args.label_col, text_col=args.text_col,
                             n_features=args.features)
        out = nb_score(docs, model, ls, text_col=args.text_col,
                       id_col=args.doc_id_col, n_features=args.features,
                       alpha=args.alpha, keep_scores=args.scores)
        out.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        res = {"output": args.output, "n_rows": out.count(),
               "n_labels": ls.count()}
        if not args.scores:
            res["by_label"] = {
                r["label"]: r["n"] for r in
                out.groupBy("label").agg(F.count("*").alias("n"))
                .orderBy("label").collect()}
        print(json.dumps(res))
    elif args.cmd == "dsir":
        from pyspark.sql import functions as F

        from polaris_spark.ops.text import (dsir_logweights,
                                            quality_percentile_filter)

        spark = _session("polaris_spark_dsir")
        raw = spark.read.parquet(args.input)
        target = spark.read.parquet(args.target)
        w = dsir_logweights(raw, target, text_col=args.text_col,
                            id_col=args.doc_id_col, buckets=args.buckets)
        res = {"output": args.output}
        if args.gumbel_k is not None:
            from polaris_spark.ops.text import dsir_gumbel_select

            w = dsir_gumbel_select(w, k=args.gumbel_k,
                                   temperature=args.temperature,
                                   seed=args.seed)
        elif args.keep_frac is not None:
            led = quality_percentile_filter(
                w.withColumn("all", F.lit("all")),
                keep_frac=args.keep_frac, by="all", score_col="logw_e6",
            ).select("doc_id", "kept")
            w = w.join(led, "doc_id")
        w.write.mode("overwrite").parquet(args.output)
        w = spark.read.parquet(args.output)
        agg = w.agg(F.count("*").alias("n"),
                    F.avg("logw_e6").alias("m")).collect()[0]
        res.update(n_docs=agg["n"], mean_logw_e6=round(agg["m"], 1))
        if "kept" in w.columns:
            res["n_kept"] = w.where(F.col("kept") == 1).count()
        print(json.dumps(res))
    elif args.cmd == "pipeline":
        import os

        from pyspark.sql import functions as F

        from polaris_spark.ops.curate import curate
        from polaris_spark.ops.dedup import strip_dup_spans
        from polaris_spark.ops.text import (chunk_windows, dsir_logweights,
                                            pii_cols,
                                            quality_percentile_filter)

        spark = _session("polaris_spark_pipeline")
        out = args.output
        os.makedirs(out, exist_ok=True)
        docs = spark.read.parquet(args.input)
        tcol, icol = args.text_col, args.doc_id_col
        counts = {"input": docs.count()}

        # 1. curation ledger (decontam -> [gopher] -> quality -> langid ->
        #    exact dedup -> LSH near-dup CC); survivors continue
        led = curate(docs, text_col=tcol, id_col=icol,
                     min_quality=args.min_quality,
                     langs=tuple(args.langs.split(",")),
                     bench=(spark.read.parquet(args.bench)
                            if args.bench else None),
                     gopher=args.gopher,
                     gopher_min_words=args.gopher_min_words)
        led.write.mode("overwrite").parquet(f"{out}/curation_ledger.parquet")
        led = spark.read.parquet(f"{out}/curation_ledger.parquet")
        keep = led.where(F.col("keep") == 1).select("doc_id")
        cur = docs.join(keep, docs[icol] == keep["doc_id"]) \
                  .drop(keep["doc_id"])
        counts["after_curate"] = cur.count()

        # 2. PII redaction (text rewritten in place, zero shuffle)
        *_pii, redacted = pii_cols(F.col(tcol))
        cur = cur.select(*[c for c in cur.columns if c != tcol],
                         redacted.alias(tcol))

        # 3. ExactSubstr removal over the SURVIVORS (span stats computed
        #    on the post-curation corpus, Lee et al. order)
        stripped = strip_dup_spans(cur, text_col=tcol, id_col=icol,
                                   n=args.span_ngram,
                                   min_docs=args.span_min_docs,
                                   hash_shingles=True)
        stripped.write.mode("overwrite").parquet(f"{out}/stripped.parquet")
        stripped = spark.read.parquet(f"{out}/stripped.parquet")
        counts["tokens_cut"] = int(
            stripped.agg(F.sum("n_cut")).collect()[0][0] or 0)
        clean = stripped.select(F.col("doc_id").alias(icol),
                                F.col("clean_text").alias(tcol))

        # 4. optional DSIR top-weight selection vs the target domain
        if args.dsir_target:
            target = spark.read.parquet(args.dsir_target)
            w = dsir_logweights(clean, target, text_col=tcol, id_col=icol)
            sel = quality_percentile_filter(
                w.withColumn("all", F.lit("all")),
                keep_frac=args.dsir_keep_frac, by="all",
                score_col="logw_e6",
            ).select("doc_id", "kept")
            sel.write.mode("overwrite").parquet(f"{out}/dsir_kept.parquet")
            clean = clean.join(
                sel.where(F.col("kept") == 1).select("doc_id"),
                clean[icol] == F.col("doc_id")).drop("doc_id") \
                if icol != "doc_id" else clean.join(
                    sel.where(F.col("kept") == 1).select("doc_id"),
                    "doc_id")
            counts["after_dsir"] = clean.count()

        # 5. context-window chunking (pre-tokenizer sequence prep)
        chunks = chunk_windows(clean, size=args.chunk_size,
                               stride=args.chunk_stride,
                               text_col=tcol, id_col=icol)
        chunks.write.mode("overwrite").parquet(f"{out}/chunks.parquet")
        counts["chunks"] = spark.read.parquet(f"{out}/chunks.parquet").count()
        print(json.dumps({"output": out, **counts}))
    elif args.cmd == "mix":
        from polaris_spark.ops.mixing import (pack_sequences,
                                              stratified_sample,
                                              token_budget)

        def _kv(spec: str, cast):
            out = {}
            for part in (p for p in spec.split(",") if p):
                k, _, v = part.partition("=")
                out[k] = cast(v)
            return out

        spark = _session("polaris_spark_mix")
        df = spark.read.parquet(args.input)
        summary = {"n_in": df.count()}
        if args.temperature is not None:
            from polaris_spark.ops.mixing import temperature_sample

            df = temperature_sample(df, alpha=args.temperature,
                                    target_frac=args.target_frac,
                                    key=args.key, id_col=args.doc_id_col,
                                    seed=args.seed) \
                .where("kept").drop("kept")
            summary["n_sampled"] = df.count()
        else:
            rates = _kv(args.rates, float)
            if rates or args.default_rate < 1.0:
                df = stratified_sample(df, rates, args.default_rate,
                                       key=args.key,
                                       id_col=args.doc_id_col,
                                       seed=args.seed) \
                    .where("kept").drop("kept")
                summary["n_sampled"] = df.count()
        epochs = _kv(args.epochs, int)
        if epochs or args.default_epochs != 1:
            from polaris_spark.ops.mixing import upsample_epochs

            df = upsample_epochs(df, epochs, args.default_epochs,
                                 key=args.key, id_col=args.doc_id_col)
            summary["n_upsampled"] = df.count()
        budgets = _kv(args.budgets, int)
        if budgets or args.default_budget > 0:
            no_cap = 1 << 62  # 0 = unlimited
            df = token_budget(df, {k: (v if v > 0 else no_cap)
                                   for k, v in budgets.items()},
                              args.default_budget or no_cap,
                              key=args.key, id_col=args.doc_id_col,
                              text_col=args.text_col) \
                .where("kept").drop("kept", "n_ws_tokens")
            summary["n_budget"] = df.count()
        if args.capacity > 0:
            if args.materialize:
                from polaris_spark.ops.mixing import materialize_bins

                df = materialize_bins(df, args.capacity, key=args.key,
                                      id_col=args.doc_id_col,
                                      text_col=args.text_col)
            else:
                df = pack_sequences(df, args.capacity, key=args.key,
                                    id_col=args.doc_id_col,
                                    text_col=args.text_col)
        df.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        summary["n_out"] = out.count()
        if args.capacity > 0:
            summary["n_bins"] = (
                out.count() if args.materialize
                else out.select(args.key, "bin_id").distinct().count())
        print(json.dumps({"output": args.output, **summary}))
    elif args.cmd == "recipe":
        from pyspark.sql import functions as F

        from polaris_spark.ops.recipe import training_recipe

        spark = _session("polaris_spark_recipe")
        docs = spark.read.parquet(args.input)
        bench = spark.read.parquet(args.bench) if args.bench else None
        epochs = {}
        for part in (p for p in args.epochs.split(",") if p):
            k, _, v = part.partition("=")
            epochs[k] = int(v)
        bins = training_recipe(
            docs, bench=bench, alpha=args.alpha,
            target_frac=args.target_frac, repeats=epochs,
            default_repeat=args.default_epochs, capacity=args.capacity,
            seed=args.seed, max_repeats=args.max_repeats, key=args.key,
            id_col=args.doc_id_col, text_col=args.text_col)
        bins.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        agg = out.agg(F.count("*").alias("n_bins"),
                      F.sum("n_docs").alias("n_rows"),
                      F.sum("n_tokens").alias("n_tokens")).collect()[0]
        print(json.dumps({"output": args.output,
                          "n_in": docs.count(),
                          "n_bins": int(agg["n_bins"] or 0),
                          "n_packed_rows": int(agg["n_rows"] or 0),
                          "n_tokens": int(agg["n_tokens"] or 0)}))
    elif args.cmd == "lm":
        from polaris_spark.ops.text import lm_score, train_bigram_lm

        spark = _session("polaris_spark_lm")
        docs = spark.read.parquet(args.input)
        model = None
        if args.train_input:
            model = train_bigram_lm(spark.read.parquet(args.train_input),
                                    args.text_col, args.doc_id_col)
        out = lm_score(docs, model=model, text_col=args.text_col,
                       id_col=args.doc_id_col)
        out.write.mode("overwrite").parquet(args.output)
        res = spark.read.parquet(args.output)
        import pyspark.sql.functions as F

        agg = res.agg(
            F.count("*").alias("n"),
            F.round(F.avg("nlp_e6") / 1e6, 4).alias("mean_nlp"),
        ).collect()[0]
        print(json.dumps({"n_docs": int(agg["n"]),
                          "mean_nlp": float(agg["mean_nlp"] or 0.0)}))
    elif args.cmd == "scrub":
        from pyspark.sql import functions as F

        from polaris_spark.ops.dedup import duplicated_spans
        from polaris_spark.ops.text import (c4_cols, gopher_cols, pii_cols,
                                            quality_cols, repetition_cols,
                                            token_count_cols)

        spark = _session("polaris_spark_scrub")
        docs = spark.read.parquet(args.input)
        t = F.col(args.text_col)
        *pii_counts, redacted = pii_cols(t)
        extra = (gopher_cols(t, min_words=args.gopher_min_words)
                 if args.gopher else ())
        if args.c4:
            bw = tuple(w for w in args.c4_bad_words.split(",") if w)
            extra = (*extra, *c4_cols(t, bad_words=bw))
        ann = docs.select(
            *[c for c in docs.columns if c != args.text_col],
            redacted.alias(args.text_col),
            *pii_counts, *quality_cols(t), *repetition_cols(t),
            *token_count_cols(t), *extra,
        )
        ann.write.mode("overwrite").parquet(args.output)
        res = {"output": args.output, "n_docs": ann.count()}
        if args.dup_spans:
            spans = duplicated_spans(docs, text_col=args.text_col,
                                     id_col=args.doc_id_col,
                                     n=args.span_ngram,
                                     min_docs=args.span_min_docs,
                                     hash_shingles=True)
            spans.write.mode("overwrite").parquet(args.output + "_spans")
            res["n_dup_spans"] = spark.read.parquet(args.output + "_spans").count()
        print(json.dumps(res))
    elif args.cmd == "chunk":
        from polaris_spark.ops.text import chunk_windows

        spark = _session("polaris_spark_chunk")
        docs = spark.read.parquet(args.input)
        out = chunk_windows(docs, size=args.size, stride=args.stride,
                            text_col=args.text_col, id_col=args.doc_id_col)
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"output": args.output, "n_docs": docs.count(),
                          "n_chunks": n, "size": args.size,
                          "stride": args.stride}))
    elif args.cmd == "media":
        from polaris_spark.ops.multimodal import (decode_features,
                                                  media_featurizer,
                                                  media_resizer,
                                                  resize_images,
                                                  stub_featurizer)

        spark = _session("polaris_spark_media")
        assets = spark.read.parquet(args.input)
        feats = decode_features(
            assets,
            featurizer=stub_featurizer if args.stub else media_featurizer)
        feats.write.mode("overwrite").parquet(args.output)
        res = {"output": args.output, "n_assets": assets.count(),
               "n_features": spark.read.parquet(args.output).count()}
        if args.resize:
            w, h = (int(x) for x in args.resize.lower().split("x"))
            resize_images(assets, width=w, height=h,
                          resizer=media_resizer) \
                .write.mode("overwrite").parquet(args.output + "_resized")
            res["n_resized"] = spark.read.parquet(
                args.output + "_resized").count()
        print(json.dumps(res))
    elif args.cmd == "percolate":
        import os as _os

        from polaris_spark.ops.percolate import percolate, stream_percolate

        qarg = args.queries
        registry = (json.load(open(qarg))
                    if _os.path.exists(qarg) else json.loads(qarg))
        fcols = tuple(c for c in args.field_cols.split(",") if c)
        spark = _session("polaris_spark_percolate")
        if args.stream:
            if not args.checkpoint:
                print("--checkpoint is required with --stream",
                      file=sys.stderr)
                return 2
            q = stream_percolate(spark, args.input, registry, args.output,
                                 args.checkpoint, schema=args.schema,
                                 text_col=args.text_col, field_cols=fcols)
            q.awaitTermination()
        else:
            docs = spark.read.parquet(args.input)
            percolate(docs, registry, text_col=args.text_col,
                      field_cols=fcols).write.mode("overwrite").parquet(
                args.output)
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        try:
            out = spark.read.parquet(args.output)
            per_q = {r["query_id"]: r["n"] for r in
                     out.groupBy("query_id").agg(F.count("*").alias("n"))
                        .collect()}
            n_alerts = out.count()
        except AnalysisException:
            # an empty stream commits no micro-batch and never creates the
            # sink dir — the normal bootstrap state of an alerting loop
            per_q, n_alerts = {}, 0
        print(json.dumps({"output": args.output, "n_queries": len(registry),
                          "n_alerts": n_alerts, "per_query": per_q}))
    elif args.cmd == "bpe":
        from polaris_spark.ops import bpe as bpe_mod
        from polaris_spark.ops.bpe import bpe_encode, bpe_learn

        spark = _session("polaris_spark_bpe")
        docs = spark.read.parquet(args.input)
        if args.reuse_merges:
            merges = spark.read.parquet(args.merges)
        else:
            merges = bpe_learn(spark, docs, text_col=args.text_col,
                               n_merges=args.n_merges,
                               max_words=args.max_words,
                               min_count=args.min_count)
            merges.write.mode("overwrite").parquet(args.merges)
            merges = spark.read.parquet(args.merges)
        res = {"merges": args.merges,
               "n_merges": merges.count(),
               **bpe_mod._INPUT_ROWS_LOG.get("bpe_learn", {})}
        vocab = None
        if args.ids:
            from polaris_spark.ops.bpe import bpe_vocab

            vocab = bpe_vocab(spark, docs, merges, text_col=args.text_col)
            vocab.write.mode("overwrite").parquet(args.merges + "_vocab")
            vocab = spark.read.parquet(args.merges + "_vocab")
            res["vocab"] = args.merges + "_vocab"
            res["vocab_size"] = vocab.count()
        if args.encode_out:
            if args.ids:
                from polaris_spark.ops.bpe import bpe_encode_ids

                enc = bpe_encode_ids(docs, merges, vocab,
                                     text_col=args.text_col)
            else:
                enc = bpe_encode(docs, merges, text_col=args.text_col)
            enc.write.mode("overwrite").parquet(args.encode_out)
            res["encode_out"] = args.encode_out
            res["n_docs"] = spark.read.parquet(args.encode_out).count()
        print(json.dumps(res))
    elif args.cmd == "semdedup":
        from pyspark.sql import functions as F

        from polaris_spark.ops.similarity import semantic_dedup

        spark = _session("polaris_spark_semdedup")
        emb = spark.read.parquet(args.input)
        led = semantic_dedup(emb, n_centroids=args.centroids,
                             seed=args.seed, threshold=args.threshold,
                             vec_col=args.vec_col, id_col=args.id_col,
                             srp_bits=args.srp_bits,
                             srp_tables=args.srp_tables)
        led.write.mode("overwrite").parquet(args.output)
        led = spark.read.parquet(args.output)
        n_drop = led.where(F.col("keep") == 0).count()
        print(json.dumps({"output": args.output, "n_vectors": led.count(),
                          "n_dropped": n_drop,
                          "n_clusters": args.centroids,
                          "threshold": args.threshold}))
    elif args.cmd == "rank-eval":
        from polaris_spark.query.engine import SearchEngine
        from polaris_spark.query.rankeval import (
            mean_summary,
            pad_zero_queries,
            rank_eval,
        )

        spark = _session("polaris_spark_rank_eval")
        jud = spark.read.parquet(args.judgments)
        jrows = [(r["query"], int(r["doc_id"]), int(r["grade"]))
                 for r in jud.collect()]
        queries = sorted({q for q, _d, _g in jrows})
        if not queries:
            raise SystemExit("judgments parquet has no rows")
        eng = SearchEngine(spark, args.index)
        run = eng.search_many_df(queries, k=args.k, mode=args.mode) \
                 .select("query", "doc_id", "score")
        # ONE collect; zero-hit queries become explicit zero rows and the
        # summary folds in Python — same helpers as /api/rankEval
        rows = [r.asDict() for r in
                rank_eval(run, jud, k=args.k,
                          rel_threshold=args.rel_threshold).collect()]
        rows = sorted(pad_zero_queries(rows, queries, jrows,
                                       rel_threshold=args.rel_threshold),
                      key=lambda r: r["query"])
        print(json.dumps({"queries": rows, "summary": mean_summary(rows)}))
    elif args.cmd == "export":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_export")
        eng = SearchEngine(spark, args.index)
        docs = spark.read.parquet(args.docs) if args.docs else None
        cols = [c for c in (args.columns or "").split(",") if c] or None
        print(json.dumps(eng.export_matches(
            args.query, args.output, docs=docs, columns=cols,
            mode=args.mode, with_score=not args.no_score)))
    elif args.cmd == "hybrid":
        from polaris_spark.query.engine import SearchEngine
        from polaris_spark.query.hybrid import hybrid_search_df

        spark = _session("polaris_spark_hybrid")
        emb = spark.read.parquet(args.embeddings)
        if args.query_vec is not None:
            qv = [float(x) for x in args.query_vec.split(",")]
        elif args.query_vec_id is not None:
            rows = emb.where(
                f"{args.id_col} = {int(args.query_vec_id)}") \
                .select(args.vec_col).collect()
            if not rows:
                raise SystemExit(
                    f"no embeddings row with {args.id_col}="
                    f"{args.query_vec_id}")
            qv = [float(x) for x in rows[0][0]]
        else:
            raise SystemExit("hybrid needs --query-vec or --query-vec-id")
        eng = SearchEngine(spark, args.index)
        out = hybrid_search_df(
            eng, args.query, emb, qv, k=args.k, window=args.window,
            rank_constant=args.rank_constant,
            weights=[float(x) for x in args.weights.split(",")],
            mode=args.mode, vec_id_col=args.id_col, vec_col=args.vec_col,
            filter_query=args.filter)
        print(json.dumps([r.asDict() for r in out.collect()]))
    elif args.cmd == "neighbors":
        from polaris_spark.ops.similarity import knn_join, srp_candidate_pairs

        spark = _session("polaris_spark_neighbors")
        emb = spark.read.parquet(args.input)
        cand = None
        if args.srp_bits > 0:
            cand = srp_candidate_pairs(
                emb, n_bits=args.srp_bits, seed=args.seed,
                vec_col=args.vec_col, id_col=args.id_col,
                n_tables=args.srp_tables)
        out = knn_join(emb, k=args.k, vec_col=args.vec_col,
                       id_col=args.id_col, candidates=cand)
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"output": args.output, "n_vectors": emb.count(),
                          "n_neighbor_rows": n,
                          "mode": ("srp" if cand is not None else "exact")}))
    elif args.cmd == "report":
        from polaris_spark.ops.report import corpus_report

        spark = _session("polaris_spark_report")
        out = corpus_report(
            spark.read.parquet(args.input), text_col=args.text_col,
            id_col=args.doc_id_col, group_col=args.group_col,
            exact=not args.approx)
        print(json.dumps(out))
    elif args.cmd == "drift":
        from pyspark.sql import functions as F

        from polaris_spark.ops.text import vocab_shift

        spark = _session("polaris_spark_drift")
        out = vocab_shift(
            spark.read.parquet(args.input_a),
            spark.read.parquet(args.input_b),
            text_col=args.text_col, id_col=args.doc_id_col,
            buckets=args.buckets)
        rows = out.collect()  # exactly `buckets` rows by construction
        js = sum(r["js_e9"] for r in rows) / 1e9
        top = sorted(rows, key=lambda r: -r["js_e9"])[:args.top]
        print(json.dumps({
            "js_divergence": round(js, 6),
            "buckets": args.buckets,
            "grams_a": sum(r["c_a"] for r in rows),
            "grams_b": sum(r["c_b"] for r in rows),
            "top_shifted": [
                {"bucket": r["bucket"], "c_a": r["c_a"], "c_b": r["c_b"],
                 "js_e9": r["js_e9"]} for r in top],
        }))
    elif args.cmd == "semdecontam":
        from polaris_spark.ops.similarity import semantic_decontaminate

        spark = _session("polaris_spark_semdecontam")
        out = semantic_decontaminate(
            spark.read.parquet(args.input),
            spark.read.parquet(args.bench),
            threshold=args.threshold, vec_col=args.vec_col,
            id_col=args.id_col)
        out.write.mode("overwrite").parquet(args.output)
        flagged = spark.read.parquet(args.output) \
                       .where("contaminated = 1").count()
        total = spark.read.parquet(args.output).count()
        print(json.dumps({"output": args.output, "n_vectors": total,
                          "n_contaminated": flagged,
                          "threshold": args.threshold}))
    elif args.cmd == "maxsim":
        from polaris_spark.ops.similarity import maxsim_topk

        spark = _session("polaris_spark_maxsim")
        emb = spark.read.parquet(args.input)
        ids = [int(x) for x in args.query_ids.split(",") if x.strip()]
        qs = [[float(v) for v in r[args.vec_col]]
              for r in emb.where(
                  emb[args.id_col].isin(ids)).orderBy(args.id_col).collect()]
        out = maxsim_topk(emb, qs, k=args.k, doc_col=args.doc_col,
                          vec_col=args.vec_col)
        print(json.dumps([r.asDict() for r in out.collect()]))
    elif args.cmd == "decontam":
        from polaris_spark.ops.dedup import decontaminate

        spark = _session("polaris_spark_decontam")
        docs = spark.read.parquet(args.input)
        bench = spark.read.parquet(args.bench)
        flags = decontaminate(docs, bench, text_col=args.text_col,
                              id_col=args.doc_id_col,
                              bench_text_col=args.bench_text_col,
                              n=args.ngram)
        if args.drop:
            hit = flags.where("contaminated").select(
                flags["doc_id"].alias(args.doc_id_col))
            out = docs.join(hit, args.doc_id_col, "left_anti")
        else:
            out = docs.join(
                flags.withColumnRenamed("doc_id", args.doc_id_col),
                args.doc_id_col, "left")
        out.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        n_in = docs.count()
        n_hit = flags.where("contaminated").count()
        print(json.dumps({"output": args.output, "n_in": n_in,
                          "n_contaminated": n_hit, "n_out": n_out}))
    elif args.cmd == "check":
        from polaris_spark.index.check import check_index

        spark = _session("polaris_spark_check")
        rep = check_index(spark, args.index)
        print(json.dumps(rep, indent=1, sort_keys=True))
        return 0 if rep["ok"] else 1
    elif args.cmd == "check-ivf":
        from polaris_spark.ops.similarity import check_ivf

        spark = _session("polaris_spark_check_ivf")
        rep = check_ivf(spark, args.index)
        print(json.dumps(rep, indent=1, sort_keys=True))
        return 0 if rep["ok"] else 1
    elif args.cmd == "explain":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_explain")
        eng = SearchEngine(spark, args.index)
        print(json.dumps(eng.explain(args.query, args.doc)))
    elif args.cmd == "mlt":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_mlt")
        eng = SearchEngine(spark, args.index)
        text = args.text
        if text is None:
            rows = eng.lookup_docs([args.doc]).collect()
            if not rows or "text" not in rows[0].asDict():
                raise SystemExit(
                    "doc text not stored in doc_map; pass --text"
                )
            text = rows[0]["text"]
        print(json.dumps(eng.more_like_this(
            text, k=args.k, max_terms=args.max_terms,
            exclude_doc_id=args.doc)))
    elif args.cmd == "table":
        spark = _session("polaris_spark_table")
        for p in args.paths:
            df = spark.read.parquet(p)
            if args.summary:
                print(json.dumps({"path": p, "rows": df.count(),
                                  "schema": df.schema.simpleString()}))
            else:
                print(json.dumps({"path": p,
                                  "schema": df.schema.simpleString()}))
                for line in df.limit(args.n).toJSON().collect():
                    print(line)
    elif args.cmd == "stats":
        import glob
        import os

        with open(os.path.join(args.index, "_stats.json")) as f:
            out = {"stats": json.load(f), "manifests": []}
        for mf in sorted(glob.glob(os.path.join(args.index, "manifest", "*.json"))):
            with open(mf) as f:
                out["manifests"].append(json.load(f))
        print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
