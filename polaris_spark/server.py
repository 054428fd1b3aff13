"""Serving daemon: a long-lived HTTP endpoint over a warm SearchEngine.

The rebuild of the reference's Jetty dev server (``polaris devserver``),
which reflectively dispatches ``POST /api/<method>`` requests onto the RPC
implementation (reference cli/command/DevServer.java:179-208 →
search/CodeSearchImpl.java). Differences, both deliberate:

- JSON request/response bodies instead of protobuf (no proto toolchain
  here; the method surface and semantics are the parity point).
- Backed by the serving-mode term-LRU engine (the analog of the reference
  keeping one warm IndexReader open, CodeSearchImpl.java:53-69).

Methods (POST JSON to /api/<method>):

- ``search``     {query, rankFrom?, rankTo?, mode?, payload?, filter?,
                 similarity?} →
                 the full mixed response (hits + completions + count +
                 latency_ms); each hit carries its doc_map identity columns
                 and, when the index stores text, a ``snippet`` context
                 window — the reference Hit's jump target + filename +
                 summary (CodeSearchImpl.search:71-92,
                 SourceDbImpl.java:147-157, SearchMixer.java:63-89).
                 ``payload:false`` returns bare (doc_id, score, n_match)
                 hits. ``filter`` is a constant-score FILTER sub-query
                 (Lucene 4.3 FilteredQuery / ES bool filter): survivors
                 keep their unfiltered scores bit-exactly.
                 ``similarity: "classic"`` ranks with the reference's
                 DefaultSimilarity TF-IDF (query/classic.py) — bare hits.
- ``searchMany`` {queries: [...], k?} → per-query top-k hits, the whole
                 list scored as ONE distributed job (engine.search_many_df
                 — replay/eval volume; bit-identical to per-query search).
- ``complete``   {query, limit?} → completion rows —
                 CodeSearchImpl.complete:121-138.
- ``source``     {docIds: [...]} → doc_map identity rows —
                 CodeSearchImpl.source / getFileHandle:94-119.
- ``listFiles``  {convId} → the conversation's turns in order —
                 CodeSearchImpl.listFiles (directory listing analog).
- ``listUsages`` {term} → decoded (doc_id, tf) occurrence list —
                 CodeSearchImpl.listUsages:216-232.
- ``getTurn``    {convId, turnIdx} → exact-key doc attributes —
                 getType/getField/getMethod analog:163-280.
- ``suggest``    {term, n?, maxEdits?} → spell-correction candidates
                 ("did you mean"; Lucene DirectSpellChecker analog over
                 the fuzzy n-gram table's pruned probe).
- ``facets``     {query, attr, mode?} → per-attribute-value match counts
                 over the FULL match set (Lucene facets analog).
- ``multiSearch`` {query, indexes: [dir...], k?, mode?} → federated hits
                 over several index dirs with merged global stats
                 (MultiReader / dfs_query_then_fetch; each hit carries
                 index_id).
- ``rankEval``   {requests: [{query, judgments: [[doc_id, grade]...]}],
                 k?, relThreshold?, mode?} → per-query precision@k /
                 recall@k / RR / nDCG@k plus the mean summary (the ES
                 _rank_eval API; all requests scored as ONE batched job).
- ``hybrid``     {query, embeddings: path, queryVecId? | queryVec?, k?,
                 window?, rankConstant?, weights?, mode?, filter?} →
                 BM25 + cosine-kNN hits fused by reciprocal rank (ES 8
                 rrf retriever; the embeddings id space = the index's
                 doc_id space; ``filter`` pre-constrains BOTH legs —
                 the ES filtered-kNN contract).
- ``aggs``       {query, aggs: {name: {type, ...}}, mode?} → the ES
                 multi-aggregation request: every named agg (stats /
                 terms / histogram / range / date_histogram /
                 cardinality / percentiles / composite / filters)
                 evaluated over ONE shared match set (lazily persisted
                 on second use, released after the request) —
                 ``{name: [bucket rows...]}`` keyed like the spec.
- ``collapse``   {query, attr, k?, perGroup?, mode?} → field-collapsed
                 hits: top-k attr groups, ≤ perGroup hits each, group and
                 within-group ranks (Lucene grouping TopGroups / ES
                 collapse analog).
- ``parents``    {query, attr, k?, scoreMode?, mode?} → parent-scoped
                 hits: children's scores folded per parent key by
                 max|avg|total|none (ToParentBlockJoinQuery analog), with
                 child count and leading child doc.
- ``rescore``    {query, rescoreQuery, k?, window?, queryWeight?,
                 rescoreWeight?, mode?} → the first query's top-window
                 re-ranked by queryWeight·first + rescoreWeight·second
                 (Lucene QueryRescorer / ES rescore analog).
- ``synonyms``   {query, synonyms: {token: [...]}, k?, mode?, filter?} →
                 SynonymQuery hits: each token and its synonyms score as
                 ONE pseudo-term with blended stats (tf-sum, max-df) —
                 the SynonymFilter analyzer surface, not a boolean OR.
- ``highlight``  {docId, query, maxFrags?, pre?, post?} → tagged
                 fragments of the hit's stored text (Lucene highlighter
                 analog; tokenizer-exact spans incl. sub-token matches;
                 needs a store_text index).
- ``multiPhrase`` {slots: [...], slop?, k?} → MultiPhraseQuery hits: a
                 phrase whose slots carry alternative terms (slot = a
                 term or a list), e.g. ["spark", ["join","merge"]].
- ``spanNear``   {terms: [...], slop?, inOrder?, k?} → SpanNearQuery hits
                 (Lucene spans analog: raw index terms within a position
                 window, optionally ordered; needs a positions index).
- ``dismax``     {query, k?, tie?, mode?, fieldBoosts?, filter?} →
                 DisjunctionMaxQuery hits: each token scores as the max
                 over its field variants + tie × the rest (Solr/ES
                 dismax; fieldBoosts = qf weights keyed by field, ``text``
                 = the unprefixed field).
- ``explain``    {query, docId} → the per-term BM25 score breakdown for
                 one hit (IndexSearcher.explain analog); contributions sum
                 to the hit's score bit-exactly.
- ``mlt``        {docId} or {text} → MoreLikeThis hits: docs most similar
                 to the given doc's stored text (or the raw text), the
                 source doc excluded (Lucene queries/mlt analog).
- ``count``      {query, mode?} → total hit count, full parser surface
                 (TotalHitCountCollector analog — no top-k work).
- ``reload``     {} → swap in a fresh engine over the index's CURRENT
                 published state (Lucene SearcherManager.maybeRefresh):
                 generations appended or tombstones written since daemon
                 start become searchable; in-flight requests finish on
                 the old point-in-time engine.

Unknown method → 404; malformed body → 400; handler exception → 500 with
the error message (the reference propagates RPC error codes similarly).
GET /healthz → 200 "ok" for liveness probes; GET /metrics → per-method
request counts, error counts, and latency p50/p99 over the last 512
requests (the operational dashboard surface).

Spark-wise this is a driver-side loop over the low-latency serving paths
(pruned candidate fetch + in-process scoring); each request is one tiny
partition-pruned Spark job at most. A production deployment would put N
such daemons behind a balancer, each with its own SparkSession — the index
itself is immutable shared storage, so serving scales horizontally without
coordination (same story as N Lucene searchers over one index directory).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


class _Handler(BaseHTTPRequestHandler):
    engine = None  # set by serve()

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):
        if self.path == "/healthz":
            self._respond(200, {"status": "ok"})
        elif self.path == "/metrics":
            self._respond(200, self._metrics_snapshot())
        else:
            self._respond(404, {"error": f"unknown path {self.path}"})

    # -- per-method request metrics: count, errors, latency p50/p99 over a
    # 512-sample ring (one shared dict on the handler CLASS, lock-guarded —
    # ThreadingHTTPServer runs each request on its own thread)
    @classmethod
    def _record(cls, method: str, ms: float, status: int) -> None:
        with cls._metrics_lock:
            m = cls._metrics.setdefault(
                method, {"n": 0, "errors": 0, "lat": []})
            m["n"] += 1
            if status >= 400:
                m["errors"] += 1
            lat = m["lat"]
            lat.append(ms)
            if len(lat) > 512:
                del lat[:len(lat) - 512]

    @classmethod
    def _metrics_snapshot(cls) -> dict:
        import math
        import statistics

        with cls._metrics_lock:
            out = {}
            for k, m in cls._metrics.items():
                lat = sorted(m["lat"])
                # ceil-rank p99: correct at small n too (int(n*0.99)-1
                # would pick the MINIMUM for n < 50)
                i99 = min(len(lat) - 1,
                          max(0, math.ceil(len(lat) * 0.99) - 1))
                out[k] = {
                    "n": m["n"], "errors": m["errors"],
                    "p50_ms": (round(statistics.median(lat), 2)
                               if lat else None),
                    "p99_ms": round(lat[i99], 2) if lat else None,
                }
            return {"methods": out}

    def do_POST(self):
        if not self.path.startswith("/api/"):
            self._respond(404, {"error": f"unknown path {self.path}"})
            return
        method = self.path[len("/api/"):]
        try:
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._record(method, 0.0, 400)  # malformed traffic is visible
            self._respond(400, {"error": "malformed JSON body"})
            return
        fn = getattr(self, f"_m_{method}", None)
        if fn is None:
            self._record("_unknown", 0.0, 404)
            self._respond(404, {"error": f"unknown method {method!r}"})
            return
        import time as _t

        t0 = _t.time()
        try:
            out = fn(body)
            self._record(method, (_t.time() - t0) * 1000.0, 200)
            self._respond(200, out)
        except (ValueError, KeyError) as e:
            # query/argument errors (unparseable query, leading wildcard,
            # missing field) → 400, like the reference's parse-error RPC code
            self._record(method, (_t.time() - t0) * 1000.0, 400)
            self._respond(400, {"error": f"{type(e).__name__}: {e}"})
        except Exception as e:  # → RPC-style error payload
            self._record(method, (_t.time() - t0) * 1000.0, 500)
            self._respond(500, {"error": f"{type(e).__name__}: {e}"})

    # ------------------------------------------------------- API methods

    def _m_search(self, b):
        if b.get("pinned"):
            # ES pinned query: promoted ids first in list order, then the
            # organic tail — bare rows (the curation surface, not the
            # mixed response). Unsupported combinations are rejected
            # explicitly (ADVICE r3): the pinned path ranks its organic
            # tail with BM25 and ignores expand_fields/filter, so
            # accepting those params would silently serve the wrong
            # scorer/result set.
            for p in ("similarity", "filter", "expandFields"):
                if b.get(p) not in (None, "", False, "bm25"):
                    raise ValueError(
                        f"pinned does not combine with {p!r} "
                        "(pinned organic tail is BM25-ranked only)")
            import time as _t

            t0 = _t.time()
            hits = [r.asDict() for r in self.engine.search_pinned(
                b["query"], [int(d) for d in b["pinned"]],
                k=int(b.get("rankTo", 20)),
                mode=b.get("mode", "or")).collect()]
            return {"hits": hits, "count": len(hits),
                    "latency_ms": round((_t.time() - t0) * 1000.0, 3)}
        if b.get("similarity", "bm25") == "classic":
            # the reference's DefaultSimilarity ranking (query/classic.py);
            # bare hits — classic is the parity scorer, the mixed response
            # (completions/payload) stays on the BM25 flagship path
            import time as _t

            t0 = _t.time()
            hits = [r.asDict() for r in self.engine.search_classic_df(
                b["query"], k=int(b.get("rankTo", 20)),
                mode=b.get("mode", "or"),
                filter_query=b.get("filter")).collect()]
            return {"hits": hits, "count": len(hits),
                    "latency_ms": round((_t.time() - t0) * 1000.0, 3)}
        return self.engine.search_mixed(
            b["query"],
            rank_from=int(b.get("rankFrom", 0)),
            rank_to=int(b.get("rankTo", 20)),
            mode=b.get("mode", "or"),
            payload=bool(b.get("payload", True)),
            # Lucene BooleanQuery.setMinimumNumberShouldMatch over the flat
            # OR path's SHOULD clauses
            min_match=(int(b["minShouldMatch"])
                       if b.get("minShouldMatch") is not None else None),
            # IndexSearcher.searchAfter cursor [score, doc_id]: the page is
            # the next (rankTo - rankFrom) hits strictly after it; the
            # response's next_after is the cursor for the page after that
            after=(tuple(b["searchAfter"])
                   if b.get("searchAfter") is not None else None),
            # constant-score FILTER context (Lucene 4.3 FilteredQuery /
            # the ES bool `filter` block): full parser surface, no score
            # contribution — flat main queries only
            filter_query=b.get("filter"),
        )

    def _m_highlight(self, b):
        """Lucene highlighter analog: tagged fragments of one hit's stored
        text. Body: {docId, query, maxFrags?, pre?, post?}."""
        return {"fragments": self.engine.highlight(
            int(b["docId"]), b["query"],
            max_frags=int(b.get("maxFrags", 3)),
            pre=b.get("pre", "<em>"), post=b.get("post", "</em>"))}

    def _m_multiPhrase(self, b):
        """MultiPhraseQuery (per-slot alternatives). Body:
        {slots: ["spark", ["join","merge"]], slop?, k?}."""
        return {"hits": self.engine.search_multi_phrase(
            list(b["slots"]), k=int(b.get("k", 10)),
            slop=int(b.get("slop", 0)))}

    def _m_spanNear(self, b):
        """SpanNearQuery (Lucene spans analog): raw index terms within a
        position window, optionally in order. Body:
        {terms: [...], slop?, inOrder?, k?}."""
        return {"hits": self.engine.span_near(
            list(b["terms"]), slop=int(b.get("slop", 0)),
            in_order=bool(b.get("inOrder", False)),
            k=int(b.get("k", 10)))}

    def _m_phrasePrefix(self, b):
        """match_phrase_prefix (ES search-as-you-type): quoted phrase
        whose LAST token is a prefix, expanded against the dictionary.
        Body: {phrase, k?, slop?}."""
        return {"hits": self.engine.search_phrase_prefix(
            b["phrase"], k=int(b.get("k", 10)),
            slop=int(b.get("slop", 0)))}

    def _m_intervals(self, b):
        """IntervalQuery (Lucene queries.intervals analog): nested
        ordered/unordered/or spec with max_gaps, minimal-interval
        semantics over the positions index. Body: {spec, k?} where spec
        is the JSON Intervals-factory form, e.g. {"ordered": [{"term":
        "spark"}, {"or": [{"term": "join"}, {"term": "merge"}]}],
        "max_gaps": 2}."""
        return {"hits": self.engine.search_intervals(
            b["spec"], k=int(b.get("k", 10)))}

    def _m_synonyms(self, b):
        """SynonymQuery blended scoring (Lucene SynonymQuery): per-token
        synonym groups scored as one pseudo-term each (tf-sum + max-df
        blend). Body: {query, synonyms: {token: [...]}, k?, mode?,
        filter?}."""
        return {"hits": _rows(self.engine.search_synonyms_df(
            b["query"], b.get("synonyms") or {}, k=int(b.get("k", 10)),
            mode=b.get("mode", "or"), filter_query=b.get("filter")))}

    def _m_dismax(self, b):
        """DisjunctionMaxQuery search (Solr/ES dismax): per-token max over
        field variants + tie × the rest; per-field qf boosts. Body:
        {query, k?, tie?, mode?, fieldBoosts?, filter?}."""
        return {"hits": _rows(self.engine.search_dismax_df(
            b["query"], k=int(b.get("k", 10)),
            tie=float(b.get("tie", 0.0)),
            mode=b.get("mode", "or"),
            field_boosts=b.get("fieldBoosts"),
            filter_query=b.get("filter")))}

    def _m_boosting(self, b):
        """BoostingQuery (Lucene queries BoostingQuery / ES boosting):
        hits matching the negative query are demoted ×negativeBoost, never
        excluded. Body: {query, negative, negativeBoost?, k?, mode?,
        negMode?}."""
        return {"hits": self.engine.search_boosting(
            b["query"], b["negative"],
            negative_boost=float(b.get("negativeBoost", 0.5)),
            k=int(b.get("k", 10)), mode=b.get("mode", "or"),
            neg_mode=b.get("negMode", "or"))}

    def _m_suggestPhrase(self, b):
        """ES phrase-suggester shape: whole-query spell correction over
        per-token fuzzy candidates, ranked by the dictionary unigram LM
        minus an edit penalty. Body: {query, n?, maxEdits?, perTerm?,
        editPenalty?, collate?}."""
        return {"suggestions": _rows(self.engine.suggest_phrase(
            b["query"], n=int(b.get("n", 3)),
            max_edits=int(b.get("maxEdits", 2)),
            per_term=int(b.get("perTerm", 5)),
            edit_penalty=float(b.get("editPenalty", 1.0)),
            collate=bool(b.get("collate", False))))}

    def _m_functionScore(self, b):
        """FunctionScoreQuery / ES function_score field_value_factor:
        score reshaped by modifier(attr × factor) from a STORED doc_map
        attribute. Body: {query, attr, factor?, modifier?, missing?,
        boostMode?, k?, mode?}."""
        return {"hits": _rows(self.engine.search_function_score(
            b["query"], b["attr"], factor=float(b.get("factor", 1.0)),
            modifier=b.get("modifier", "none"),
            missing=float(b.get("missing", 1.0)),
            boost_mode=b.get("boostMode", "multiply"),
            k=int(b.get("k", 10)), mode=b.get("mode", "or")))}

    def _m_decay(self, b):
        """ES function_score decay (gauss/exp/linear) over a STORED
        numeric doc_map attribute. Body: {query, attr, origin, scale,
        shape?, decay?, offset?, missing?, k?, mode?}."""
        return {"hits": _rows(self.engine.search_decay(
            b["query"], b["attr"], origin=float(b["origin"]),
            scale=float(b["scale"]), shape=b.get("shape", "gauss"),
            decay=float(b.get("decay", 0.5)),
            offset=float(b.get("offset", 0.0)),
            missing=float(b.get("missing", 1.0)),
            k=int(b.get("k", 10)), mode=b.get("mode", "or")))}

    def _m_significantTerms(self, b):
        """Significant-terms aggregation (ES significant_terms under a
        sampler): JLH-scored terms of the query's top-window hits vs the
        corpus. Body: {query, n?, window?, minDocCount?, mode?}."""
        return {"terms": _rows(self.engine.significant_terms(
            b["query"], n=int(b.get("n", 10)),
            window=int(b.get("window", 200)),
            min_doc_count=int(b.get("minDocCount", 2)),
            mode=b.get("mode", "or")))}

    def _m_reload(self, b):
        """Lucene SearcherManager.maybeRefresh analog: construct a fresh
        engine over the index's CURRENT published state — generations
        appended (or tombstones written) since this daemon's engine was
        built become visible — and swap it in with one atomic class-
        attribute assignment. In-flight requests finish on the old
        point-in-time engine (exactly an old IndexReader staying open
        until its searches drain); the next request sees the new one."""
        cls = type(self)
        old = cls.engine
        new = old.__class__(cls._spark, cls._index_dir,
                            cache_terms=cls._cache_terms)
        cls.engine = new
        return {
            "reloaded": True,
            "n_docs_before": int(old.stats.get("N", 0)),
            "n_docs_after": int(new.stats.get("N", 0)),
        }

    def _m_count(self, b):
        """TotalHitCountCollector analog: match-set size, full parser
        surface (flat / tree / phrase routing), no top-k work."""
        return {"query": b["query"],
                "count": self.engine.search_count(
                    b["query"], mode=b.get("mode", "or"))}

    def _m_searchMany(self, b):
        """Batch search: the whole query list scored as ONE distributed
        job (engine.search_many_df — the replay/eval shape; per-query
        results bit-identical to sequential /api/search calls). Response:
        {results: {query: [{doc_id, score, n_match, rank}, ...]}}."""
        # dedupe, order-preserving: a repeated query must not double its
        # hit list (results are keyed by query string anyway)
        queries = list(dict.fromkeys(b["queries"]))
        if not queries:
            raise ValueError("queries must be a non-empty list")
        out: dict = {q: [] for q in queries}
        rows = self.engine.search_many_df(
            queries, k=int(b.get("k", b.get("rankTo", 10)))).collect()
        for r in rows:
            d = r.asDict()
            out[d.pop("query")].append(d)
        for hits in out.values():
            hits.sort(key=lambda h: h["rank"])
        return {"results": out}

    def _m_complete(self, b):
        return {"completions": _rows(
            self.engine.complete(b["query"], int(b.get("limit", 20)))
        )}

    def _m_source(self, b):
        return {"docs": sorted(
            _rows(self.engine.lookup_docs([int(i) for i in b["docIds"]])),
            key=lambda r: r["doc_id"],
        )}

    def _m_listFiles(self, b):
        return {"turns": _rows(self.engine.list_conversation(b["convId"]))}

    def _m_listUsages(self, b):
        return {"usages": self.engine.lookup_postings(b["term"])}

    def _m_getTurn(self, b):
        return {"docs": _rows(
            self.engine.get_turn(b["convId"], int(b["turnIdx"]))
        )}

    def _m_layout(self, b):
        """Hierarchical browse — the reference devserver's listDirectory
        RPC (SourceDb.java:23-25 feeding polaris-web's tree view). Body:
        {path: ["src1", ...], levels: ["source","lang"]?}; children are
        'dir' rows with subtree doc counts until the levels are exhausted,
        then 'doc' rows."""
        path = tuple(b.get("path", ()))
        levels = tuple(b["levels"]) if b.get("levels") else None
        return {"children": _rows(self.engine.browse(path, levels))}

    def _m_docTerms(self, b):
        """Forward term listing (findUsagesInFile analog): (term, tf, df)
        for one doc_id; needs a store_text index."""
        return {"terms": _rows(self.engine.doc_terms(int(b["docId"])))}

    def _m_suggest(self, b):
        return {"suggestions": self.engine.suggest(
            b["term"], int(b.get("n", 5)), int(b.get("maxEdits", 2))
        )}

    def _m_facets(self, b):
        rows = _rows(self.engine.facet_counts(
            b["query"], b["attr"], mode=b.get("mode", "or")))
        rows.sort(key=lambda r: (-r["n"], str(r["facet"])))
        return {"facets": rows}

    def _m_multiSearch(self, b):
        """Federated search over several index directories with MERGED
        global stats (Lucene MultiReader / ES dfs_query_then_fetch —
        scores bit-identical to one monolithic index over the union).
        Body: {query, indexes: [dir, ...], k?, mode?}. Point-in-time
        engines are constructed per request (stats read + manifest
        listing — the ops/eval path, not the hot single-index one)."""
        from .query.multi import search_multi_df

        dirs = list(b.get("indexes") or [])
        if not dirs:
            raise ValueError("body needs a non-empty 'indexes' list")
        rows = [r.asDict() for r in search_multi_df(
            self._spark, dirs, b["query"], k=int(b.get("k", 10)),
            mode=b.get("mode", "or")).collect()]
        return {"hits": rows}

    def _m_rankEval(self, b):
        """Ranking-quality evaluation (ES _rank_eval): every request's
        query is scored in ONE batched job (search_many_df), judged
        against the request's inline graded judgments, and folded to the
        standard IR metrics (query/rankeval.py). Body: {requests:
        [{query, judgments: [[doc_id, grade], ...]}, ...], k?,
        relThreshold?, mode?}."""
        from .query.rankeval import mean_summary, pad_zero_queries, rank_eval

        reqs = b.get("requests") or []
        if not isinstance(reqs, list) or not reqs:
            raise ValueError("body needs a non-empty 'requests' list")
        queries = [r["query"] for r in reqs]
        k = int(b.get("k", 10))
        thr = int(b.get("relThreshold", 1))
        jrows = [(r["query"], int(d), int(g))
                 for r in reqs for d, g in (r.get("judgments") or [])]
        spark = self.engine.spark
        jud = spark.createDataFrame(
            jrows, "query string, doc_id long, grade int")
        # k here, not None: search_many_df's per-query top-k uses the
        # SAME (score desc, doc_id asc) order as rank_eval's cut, so
        # metrics are identical and the full match sets never shuffle
        run = self.engine.search_many_df(
            queries, k=k, mode=b.get("mode", "or"))
        per = [r.asDict() for r in rank_eval(
            run.select("query", "doc_id", "score"), jud,
            k=k, rel_threshold=thr).collect()]
        # zero-hit queries surface as explicit zeros and drag the mean
        # down (ES reports metric_score 0) — shared convention with the
        # rank-eval CLI via the rankeval helpers
        per = pad_zero_queries(per, queries, jrows, rel_threshold=thr)
        return {"queries": per, "summary": mean_summary(per)}

    def _m_hybrid(self, b):
        """Hybrid BM25 + cosine-kNN search fused by reciprocal rank
        (query/hybrid.py). Body: {query, embeddings: parquet path,
        queryVecId? | queryVec: [floats]?, k?, window?, rankConstant?,
        weights: [lex, vec]?, mode?, idCol?, vecCol?}."""
        from .query.hybrid import hybrid_search_df

        path = b.get("embeddings")
        if not path:
            raise ValueError("body needs an 'embeddings' parquet path")
        id_col = b.get("idCol", "vec_id")
        vec_col = b.get("vecCol", "embedding")
        emb = self.engine.spark.read.parquet(path)
        if b.get("queryVec") is not None:
            qv = [float(x) for x in b["queryVec"]]
        elif b.get("queryVecId") is not None:
            rows = emb.where(f"{id_col} = {int(b['queryVecId'])}") \
                      .select(vec_col).collect()
            if not rows:
                raise ValueError(
                    f"no embeddings row with {id_col}="
                    f"{int(b['queryVecId'])}")
            qv = [float(x) for x in rows[0][0]]
        else:
            raise ValueError("body needs 'queryVec' or 'queryVecId'")
        out = hybrid_search_df(
            self.engine, b["query"], emb, qv, k=int(b.get("k", 10)),
            window=int(b.get("window", 100)),
            rank_constant=int(b.get("rankConstant", 60)),
            weights=[float(x) for x in b.get("weights", (1.0, 1.0))],
            mode=b.get("mode", "or"), vec_id_col=id_col, vec_col=vec_col,
            filter_query=b.get("filter"))
        return {"hits": [r.asDict() for r in out.collect()]}

    def _m_aggs(self, b):
        """ES multi-aggregation request over one shared match set. Body:
        {query, aggs: {name: {type: stats|terms|histogram|range|
        date_histogram|cardinality|percentiles|composite|filters, ...}},
        mode?}. Timestamps/decimals in bucket rows render via their JSON
        string form."""
        from .query.aggs import run_aggs

        spec = b.get("aggs")
        if not isinstance(spec, dict) or not spec:
            raise ValueError("body needs a non-empty 'aggs' spec object")
        return {"aggregations": run_aggs(
            self.engine, b["query"], spec, mode=b.get("mode", "or"))}

    def _m_collapse(self, b):
        """Field-collapsed search (Lucene grouping / ES collapse): top-k
        'attr' groups of the match set, ≤ perGroup hits each, both ranks
        in every row. Body: {query, attr, k?, perGroup?, mode?}."""
        return {"groups": _rows(self.engine.search_collapse(
            b["query"], b["attr"], k=int(b.get("k", 10)),
            per_group=int(b.get("perGroup", 1)),
            mode=b.get("mode", "or")))}

    def _m_parents(self, b):
        """Parent-scoped search (ToParentBlockJoinQuery analog): parents
        keyed by a stored attribute, children's scores folded by scoreMode
        (max|avg|total|none). Body: {query, attr, k?, scoreMode?, mode?}."""
        return {"parents": _rows(self.engine.search_parent(
            b["query"], b["attr"], k=int(b.get("k", 10)),
            score_mode=b.get("scoreMode", "max"),
            mode=b.get("mode", "or")))}

    def _m_rescore(self, b):
        """Two-pass rescore (Lucene QueryRescorer / ES rescore): the first
        query's top-window re-ranked by weighted combination with a second
        query (full parser surface — typically a proximity phrase). Body:
        {query, rescoreQuery, k?, window?, queryWeight?, rescoreWeight?,
        mode?}."""
        return {"hits": _rows(self.engine.rescore(
            b["query"], b["rescoreQuery"], k=int(b.get("k", 10)),
            window=int(b.get("window", 50)),
            query_weight=float(b.get("queryWeight", 1.0)),
            rescore_weight=float(b.get("rescoreWeight", 1.0)),
            mode=b.get("mode", "or")))}

    def _m_explain(self, b):
        """IndexSearcher.explain analog, auto-routed like /api/search:
        flat queries get the per-term decomposition, genuine boolean
        trees the per-leaf one; {synonyms: {...}} routes to the
        per-group SynonymQuery breakdown, {dismax: true, tie?,
        fieldBoosts?} to the DisMax one — every variant's contributions
        sum to the corresponding search score bit-exactly."""
        from polaris_spark.query.boolquery import has_operators
        from polaris_spark.query.engine import parse_phrase_query

        q, did = b["query"], int(b["docId"])
        if b.get("synonyms") is not None:
            return {"explanation": self.engine.explain_synonyms(
                q, b["synonyms"], did)}
        if b.get("dismax"):
            return {"explanation": self.engine.explain_dismax(
                q, did, tie=float(b.get("tie", 0.0)),
                field_boosts=b.get("fieldBoosts"))}
        parsed = None
        if parse_phrase_query(q) is not None:
            return {"explanation": self.engine.explain_bool(q, did)}
        if has_operators(q):
            try:
                parsed = self.engine.parse_bool(q)
            except ValueError:
                parsed = None  # malformed-operator text degrades to flat
        if parsed is not None:
            return {"explanation":
                    self.engine.explain_bool(q, did, _parsed=parsed)}
        return {"explanation": self.engine.explain(q, did)}

    def _m_mlt(self, b):
        text = b.get("text")
        exclude = None
        if text is None:
            doc_id = int(b["docId"])
            rows = _rows(self.engine.lookup_docs([doc_id]))
            if not rows or "text" not in rows[0]:
                raise ValueError(
                    "doc text not stored in doc_map; pass 'text' explicitly"
                )
            text, exclude = rows[0]["text"], doc_id
        elif "docId" in b:
            exclude = int(b["docId"])
        return {"hits": self.engine.more_like_this(
            text, k=int(b.get("k", 10)),
            max_terms=int(b.get("maxTerms", 8)), exclude_doc_id=exclude,
        )}

    # ---------------------------------------------------------- plumbing

    def _respond(self, code: int, payload: dict):
        data = json.dumps(payload, default=str).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


def serve(spark, index_dir: str, host: str = "127.0.0.1", port: int = 0,
          cache_terms: int = 65536):
    """Start the daemon on a background thread. Returns (server, thread);
    ``server.server_address`` carries the bound (host, port) — port=0 picks
    a free one. Stop with ``server.shutdown()``."""
    from .query.engine import SearchEngine

    handler = type("Handler", (_Handler,), {
        "engine": SearchEngine(spark, index_dir, cache_terms=cache_terms),
        # kept for /api/reload (SearcherManager.maybeRefresh analog)
        "_spark": spark, "_index_dir": index_dir,
        "_cache_terms": cache_terms,
        # per-daemon metrics state (fresh per serve() call, not shared
        # across daemons in one process)
        "_metrics": {}, "_metrics_lock": threading.Lock(),
    })
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t


def main() -> int:
    """CLI entry: ``python -m polaris_spark.server --index DIR [--port P]``."""
    import argparse

    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8042)
    ap.add_argument("--cache-terms", type=int, default=65536)
    args = ap.parse_args()
    spark = (
        SparkSession.builder.appName("polaris_spark_server").getOrCreate()
    )
    srv, t = serve(spark, args.index, args.host, args.port, args.cache_terms)
    print(f"serving on http://{srv.server_address[0]}:{srv.server_address[1]}")
    t.join()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
