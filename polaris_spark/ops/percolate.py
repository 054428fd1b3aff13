"""Percolator: REGISTERED queries matched against a document stream — the
Lucene Monitor (Luwak) / Elasticsearch percolate analog, the inversion of
search: instead of one query probing a corpus-sized index, each incoming
document probes a registry of saved queries ("alert me when a matching
transcript arrives").

Semantics: a document matches a registered query iff it WOULD match that
query on the search engine — the same classic-parser surface (term chunks,
``field:value``, field groups, AND/OR/NOT, ``+``/``-``, ``(...)~N`` group
msm, boosts [ignored — percolation is boolean], ``term*`` prefixes,
``te?m``/mid-``*`` wildcards, ``term~N`` / ``f:term~N`` fuzzy,
``[a TO b]`` ranges, ``/pat/`` regexps, ``"a b"``/``"a b"~N`` phrases) and
the same occur truth table (boolquery module docstring). Multi-term
expansion leaves match against the DOCUMENT'S OWN tokens — Lucene's
MemoryIndex approach: per doc, prefix/wildcard/fuzzy/range/regexp test the
doc's token set directly, which is exactly what dictionary expansion
followed by posting intersection would decide for a one-doc index. The
engine's field-confinement rules carry over exactly: a qualified
expansion leaf on a field the registry was not compiled with matches
NOTHING (the engine's unknown-field range/regexp/prefix expansions are
empty — a TermRangeQuery on an absent field has no postings), except
fuzzy, whose unknown-field qualifier falls back to a bare body expansion
(engine._expand_fuzzy's documented rule). Regexp leaves replay the
engine's ``rlike`` anchoring verbatim (``^pat$`` by SEARCH, so a
top-level alternation anchors per-branch, not whole-string). Phrase
leaves match positionally over the document's base-token slots (sub-tokens
at the parent slot), the index kernel's exact rule.

Scale design (the percolator shape): a pure MAP over the document stream —
zero shuffle, broadcast query registry, Arrow-batched kernel. Routing is an
inverted token→queries index over the registry (the Lucene Monitor
"presearcher"): every query whose positive leaves are all term-based is
indexed under its tokens at registration, and a document evaluates only
the union of the query lists its own tokens hit — per-doc routing cost is
proportional to the DOC's token count, not the registry size — plus the
residual queries holding expansion leaves (prefix/wildcard/…), which must
always be tested. The prefilter is lossless: a token-routable query can
only match a doc sharing at least one positive term. With a 10⁶-query
registry of ordinary term queries, a doc evaluates only the handful its
tokens route to. Registration-time errors (unparseable query, leading
wildcard) raise immediately, never inside the stream.
"""

from __future__ import annotations

import re
from functools import lru_cache

from ..query import boolquery as bq
from ..tokenizer import BASE_PATTERN, tokenize, tokenize_with_positions

_BASE_RE = re.compile(BASE_PATTERN)


# --- memoized query-side constants -----------------------------------------
# Leaf payloads are fixed strings from the broadcast registry: tokenizing /
# compiling them once per executor (not once per document) keeps the per-doc
# hot path to set intersections. Caches are module-level so the driver-side
# test path shares them.

@lru_cache(maxsize=65536)
def _q_tokens(s: str) -> frozenset:
    return frozenset(tokenize(s))


@lru_cache(maxsize=65536)
def _wild_regex(pat: str) -> re.Pattern:
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out))


@lru_cache(maxsize=65536)
def _phrase_seq(body: str) -> tuple:
    """BASE-token sequence, order and duplicates kept — the engine's
    phrase_terms rule."""
    return tuple(_BASE_RE.findall(body))


@lru_cache(maxsize=65536)
def _regexp_rx(pre: str, pat: str) -> re.Pattern:
    # the engine's exact rlike anchoring: ^escape(pre)+pat+$ by SEARCH
    # over the full term string (engine._regexp_frame)
    return re.compile("^" + re.escape(pre) + pat + "$")


class _CompiledQuery:
    """One registered query: parsed tree + routing metadata."""

    __slots__ = ("qid", "root", "route_tokens", "always")

    def __init__(self, qid: str, query: str):
        self.qid = qid
        root = bq.parse(query)  # raises on leading wildcards / bad syntax
        if root is None:
            raise ValueError(f"query {qid!r} is empty")
        self.root = root
        # routing-token harvest: term-based positive leaves only
        toks: set[str] = set()
        self.always = False
        for leaf, _scoring in bq.iter_leaves(root):
            if leaf.kind == "chunk":
                toks |= _q_tokens(str(leaf.payload))
            elif leaf.kind == "phrase":
                _f, body, _slop = leaf.payload
                toks |= _q_tokens(body)
            elif leaf.kind in ("prefix", "wildcard", "fuzzy", "range",
                               "regexp"):
                self.always = True  # expansion leaf: cannot token-route
            else:  # pragma: no cover
                raise ValueError(f"unknown leaf kind {leaf.kind!r}")
        self.route_tokens = frozenset(toks) if not self.always else frozenset()


def compile_queries(queries: dict[str, str]) -> list[_CompiledQuery]:
    """Parse + validate the registry once, driver-side."""
    return [_CompiledQuery(qid, q) for qid, q in sorted(queries.items())]


def build_router(compiled) -> tuple:
    """Inverted token→query-index routing table (the presearcher index):
    ``(tok2idx, always_idx)``. A query with no routing tokens and no
    expansion leaf (every positive leaf tokenizes empty) can never match
    under the occur truth table, but is kept in ``always_idx`` so routed
    evaluation stays bit-identical to brute force."""
    tok2idx: dict[str, list[int]] = {}
    always_idx: list[int] = []
    for i, cq in enumerate(compiled):
        if cq.route_tokens:
            for t in cq.route_tokens:
                tok2idx.setdefault(t, []).append(i)
        else:
            always_idx.append(i)
    return tok2idx, always_idx


def _match_leaf(leaf, ctx, field_cols) -> bool:
    gf = leaf.group_field if leaf.group_field in field_cols else None

    def toks_of(field):
        return ctx["fields"].get(field, (frozenset(), []))[0]

    text_toks = ctx["toks"]
    if leaf.kind == "chunk":
        body = str(leaf.payload)
        f, _, rest = body.partition(":")
        if rest and f in field_cols:
            want, pool = _q_tokens(rest), toks_of(f)
        elif gf:
            want, pool = _q_tokens(body), toks_of(gf)
        else:
            want, pool = _q_tokens(body), text_toks
        return bool(want & pool) if want else False
    if leaf.kind == "phrase":
        f, body, slop = leaf.payload
        if f is None and gf:
            f = gf
        if f in field_cols:
            pos_toks = ctx["fields"][f][1]
        else:
            if f is not None:
                body = f"{f}:{body}"  # unknown qualifier: plain text
            pos_toks = ctx["pos_toks"]
        return _phrase_match(_phrase_seq(body), pos_toks, slop)
    if leaf.kind == "prefix":
        raw = str(leaf.payload)
        f, colon, rest = raw.partition(":")
        if colon and f in field_cols:
            # rest may be "" — ``f:*`` matches any doc with an f token,
            # exactly the engine's startswith("f:") dictionary expansion
            pref, pool = rest, toks_of(f)
        elif gf:
            pref, pool = raw, toks_of(gf)
        else:
            pref, pool = raw, text_toks
        return any(t.startswith(pref) for t in pool)
    if leaf.kind == "wildcard":
        raw = str(leaf.payload)
        f, _, rest = raw.partition(":")
        if rest and f in field_cols:
            pat, pool = rest, toks_of(f)
        elif gf:
            pat, pool = raw, toks_of(gf)
        else:
            pat, pool = raw, text_toks
        rx = _wild_regex(pat)
        return any(rx.fullmatch(t) for t in pool)
    if leaf.kind == "fuzzy":
        head, me = leaf.payload
        if gf and ":" not in head:
            head = f"{gf}:{head}"
        f, _, rest = head.partition(":")
        if rest and f in field_cols:
            probe, pool = rest, toks_of(f)
        else:
            # unknown qualifier → bare expansion of the body, the
            # engine._expand_fuzzy documented fallback
            probe, pool = (rest if rest else head), text_toks
        n = len(probe)
        return any(abs(len(t) - n) <= me and _lev_le(t, probe, me)
                   for t in pool)
    if leaf.kind == "range":
        f, lo, hi, ilo, ihi = leaf.payload
        if gf and f is None:
            f = gf
        if f is None:
            pool = text_toks
        elif f in field_cols:
            pool = toks_of(f)
        else:
            return False  # unknown field: no postings (engine._range_frame)
        return any(
            (lo is None or (t > lo or (ilo and t == lo)))
            and (hi is None or (t < hi or (ihi and t == hi)))
            for t in pool)
    if leaf.kind == "regexp":
        f, pat = bq.parse_regexp(str(leaf.payload))
        if gf and f is None:
            f = gf
        if f is None:
            pre, pool = "", text_toks
        elif f in field_cols:
            pre, pool = f"{f}:", toks_of(f)
        else:
            return False  # unknown field: empty expansion (engine rule)
        rx = _regexp_rx(pre, pat)
        return any(rx.search(pre + t) for t in pool)
    raise ValueError(f"unknown leaf kind {leaf.kind!r}")  # pragma: no cover


def _phrase_match(seq, pos_toks, slop: int) -> bool:
    """Positional phrase match over one token stream — the kernel's exact
    rule: sub-tokens sit at their parent base slot; slop=0 is the adjacency
    chain, slop=N the anchor-displacement bound (engine.phrase_shard)."""
    if not seq:
        return False
    if len(seq) == 1:
        return any(seq[0] in s for s in pos_toks)
    positions = {t: [i for i, s in enumerate(pos_toks) if t in s]
                 for t in set(seq)}
    if any(not positions[t] for t in set(seq)):
        return False
    for q0 in positions[seq[0]]:
        if slop == 0:
            if all((q0 + i) < len(pos_toks) and t in pos_toks[q0 + i]
                   for i, t in enumerate(seq[1:], start=1)):
                return True
        else:
            cost = 0
            for i, t in enumerate(seq[1:], start=1):
                tgt = q0 + i
                cost += min(abs(p - tgt) for p in positions[t])
                if cost > slop:
                    break
            if cost <= slop:
                return True
    return False


def _lev_le(a: str, b: str, k: int) -> bool:
    """levenshtein(a, b) <= k — full DP with a row-minimum early exit
    (tokens are short; a banded variant is not worth its edge cases)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, start=1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            if v < best:
                best = v
        if best > k:
            return False
        prev = cur
    return prev[-1] <= k


def _match_tree(nd, ctx, field_cols) -> bool:
    """The shared occur truth table (boolquery docstring), incl. group
    msm — the same rules the kernel vectorizes and the oracle SQL mirrors."""
    if isinstance(nd, bq.Leaf):
        return _match_leaf(nd, ctx, field_cols)
    if any(_match_tree(c, ctx, field_cols) for c in nd.must_not):
        return False
    if not all(_match_tree(c, ctx, field_cols) for c in nd.must):
        return False
    if nd.msm > 0 and not nd.should:
        return False
    if not nd.must and not nd.should:
        return False
    n_hit = sum(_match_tree(c, ctx, field_cols) for c in nd.should)
    eff = nd.msm if nd.msm > 0 else (0 if nd.must else 1)
    return n_hit >= eff


def _doc_ctx(text, fields: dict) -> dict:
    toks, pos = tokenize_with_positions(text or "")
    n_base = 1 + max(pos) if pos else 0
    pos_toks = [set() for _ in range(n_base)]
    for t, p in zip(toks, pos):
        pos_toks[p].add(t)
    ctx = {"toks": frozenset(toks), "pos_toks": pos_toks, "fields": {}}
    for col, val in fields.items():
        # the build lays each FIELD token (base tokens first, then
        # sub-tokens, tokenize() order) on its OWN consecutive slot —
        # index/build.py:161-172 — so field phrases see singleton slots
        ftoks = tokenize(val or "")
        ctx["fields"][col] = (frozenset(ftoks), [{t} for t in ftoks])
    return ctx


def match_doc(compiled, text, fields: dict | None = None,
              field_cols: tuple = (), router=None) -> list[str]:
    """Evaluate one document against the compiled registry (the unit the
    distributed kernel batches): returns the sorted matching query ids.
    Inverted-index routing first (cost ∝ doc tokens), tree evaluation only
    for the routed candidates. ``router`` is ``build_router(compiled)``;
    built on the fly when omitted (driver/test convenience)."""
    tok2idx, always_idx = router if router is not None \
        else build_router(compiled)
    ctx = _doc_ctx(text, fields or {})
    # field tokens are separate pools but a field chunk can still route on
    # them, so the doc's routing key set is text ∪ all field tokens
    doc_toks = set(ctx["toks"])
    for fpool, _ in ctx["fields"].values():
        doc_toks |= fpool
    cand = set(always_idx)
    for t in doc_toks:
        hit = tok2idx.get(t)
        if hit:
            cand.update(hit)
    fcols = tuple(field_cols)
    # compiled is qid-sorted, so index order == qid order
    return [compiled[i].qid for i in sorted(cand)
            if _match_tree(compiled[i].root, ctx, fcols)]


def percolate(df, queries: dict[str, str], text_col: str = "text",
              field_cols: tuple = ()):
    """Match every row of ``df`` against the query registry. Returns the
    input rows exploded to one row per (doc, matching query):
    all input columns + ``query_id``. Zero shuffle — broadcast registry,
    Arrow-batched mapInPandas."""
    from pyspark.sql.types import StringType, StructField, StructType

    missing = [c for c in (text_col, *field_cols) if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in input: {missing!r} "
                         f"(have {df.columns!r})")
    compiled = compile_queries(queries)
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((compiled, tuple(field_cols)))
    schema = StructType(list(df.schema.fields)
                        + [StructField("query_id", StringType())])
    cols = df.columns

    def it(batches):
        comp, fcols = b.value
        router = build_router(comp)  # once per task
        for pdf in batches:
            texts = pdf[text_col]
            fvals = [pdf[c] for c in fcols]
            idx, qids = [], []
            for i in range(len(pdf)):
                hits = match_doc(
                    comp, texts.iat[i],
                    {c: s.iat[i] for c, s in zip(fcols, fvals)},
                    fcols, router)
                idx.extend([i] * len(hits))
                qids.extend(hits)
            out = pdf.iloc[idx].copy()
            out["query_id"] = qids
            yield out[cols + ["query_id"]]

    return df.mapInPandas(it, schema)


def stream_percolate(spark, input_dir: str, queries: dict[str, str],
                     out_dir: str, checkpoint_dir: str,
                     schema: str | None = None, text_col: str = "text",
                     field_cols: tuple = (), available_now: bool = True):
    """Streaming percolation — the saved-search ALERTING loop: documents
    landing in ``input_dir`` stream through the registry; each match
    appends an alert row (doc columns + query_id) to the parquet sink,
    per-file exactly-once via the checkpoint. A pure streaming map: no
    watermark, no state store, scales like stream_scrub."""
    from ..streaming import DOCUMENT_SCHEMA

    stream = (spark.readStream.schema(schema or DOCUMENT_SCHEMA)
              .parquet(input_dir))
    alerts = percolate(stream, queries, text_col=text_col,
                       field_cols=field_cols)
    w = (alerts.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
