"""spark-submit entry points: ``build``, ``query``, ``complete``, ``stats``.

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

    q = sub.add_parser("query", help="top-k BM25 search")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", choices=["or", "and"], default="or")
    q.add_argument("--distributed", action="store_true")
    q.add_argument("--expand-fields", action="store_true",
                   help="bare tokens also query every indexed field column "
                        "(the reference's multi-field OR default)")

    c = sub.add_parser("complete", help="prefix completion")
    c.add_argument("--index", required=True)
    c.add_argument("--prefix", required=True)
    c.add_argument("-n", type=int, default=20)

    p = sub.add_parser("phrase", help="exact phrase query (needs a positions=True index)")
    p.add_argument("--index", required=True)
    p.add_argument("--phrase", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--distributed", action="store_true")

    s = sub.add_parser("stats", help="print index stats + manifests")
    s.add_argument("--index", required=True)

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
    elif args.cmd == "query":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_query")
        eng = SearchEngine(spark, args.index)
        if args.distributed:
            rows = [r.asDict() for r in eng.search_df(
                args.query, args.k, args.mode,
                expand_fields=args.expand_fields).collect()]
        else:
            rows = eng.search(args.query, args.k, args.mode,
                              expand_fields=args.expand_fields)
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
    elif args.cmd == "complete":
        from polaris_spark.query.engine import SearchEngine

        spark = _session("polaris_spark_complete")
        eng = SearchEngine(spark, args.index)
        print(json.dumps([r.asDict() for r in eng.complete(args.prefix, args.n).collect()]))
    elif args.cmd == "serve":
        from polaris_spark.server import serve

        spark = _session("polaris_spark_serve")
        srv, t = serve(spark, args.index, args.host, args.port, args.cache_terms)
        print(json.dumps({"serving": f"http://{srv.server_address[0]}:{srv.server_address[1]}"}),
              flush=True)
        t.join()
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
