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
followed by posting intersection would decide for a one-doc index. Phrase
leaves match positionally over the document's base-token slots (sub-tokens
at the parent slot), the index kernel's exact rule.

Scale design (the percolator shape): a pure MAP over the document stream —
zero shuffle, broadcast query registry, Arrow-batched kernel. Per-batch
routing keeps cost sub-linear in the registry size: every query whose
positive leaves are all term-based is indexed by its token set at
registration, and a document only evaluates (a) queries sharing at least
one token with it — a correct prefilter, since such a query can only match
when at least one positive term-leaf matches — plus (b) the residual
queries holding expansion leaves (prefix/wildcard/…), which must always be
tested. With a 10⁶-query registry of ordinary term queries, a doc
evaluates only the handful its tokens route to (the Lucene Monitor
"presearcher" idea). Registration-time errors (unparseable query, leading
wildcard) raise immediately, never inside the stream.
"""

from __future__ import annotations

import re

from ..query import boolquery as bq
from ..tokenizer import BASE_PATTERN, tokenize, tokenize_with_positions

_BASE_RE = re.compile(BASE_PATTERN)


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


class _CompiledQuery:
    """One registered query: parsed tree + routing metadata."""

    __slots__ = ("qid", "root", "route_tokens", "always")

    def __init__(self, qid: str, query: str, field_cols: tuple):
        self.qid = qid
        root = bq.parse(query)
        if root is None:
            raise ValueError(f"query {qid!r} is empty")
        self.root = root
        # registration-time validation + routing-token harvest
        toks: set[str] = set()
        self.always = False
        for leaf, _scoring in bq.iter_leaves(root):
            if leaf.kind == "chunk":
                toks |= set(tokenize(str(leaf.payload)))
            elif leaf.kind == "phrase":
                _f, body, _slop = leaf.payload
                toks |= set(tokenize(body))
            elif leaf.kind in ("prefix", "wildcard", "fuzzy", "range",
                               "regexp"):
                if leaf.kind == "wildcard" and str(leaf.payload).split(
                        ":", 1)[-1][:1] in ("*", "?"):
                    raise ValueError(
                        f"query {qid!r}: leading wildcards are not allowed "
                        "(same rule as the search engine)")
                self.always = True  # expansion leaf: cannot token-route
            else:  # pragma: no cover
                raise ValueError(f"unknown leaf kind {leaf.kind!r}")
        self.route_tokens = frozenset(toks) if not self.always else frozenset()


def compile_queries(queries: dict[str, str],
                    field_cols: tuple = ()) -> list[_CompiledQuery]:
    """Parse + validate the registry once, driver-side."""
    return [_CompiledQuery(qid, q, tuple(field_cols))
            for qid, q in sorted(queries.items())]


def _match_leaf(leaf, ctx, field_cols) -> bool:
    gf = leaf.group_field if leaf.group_field in field_cols else None

    def toks_of(field):
        return ctx["fields"].get(field, (frozenset(), [], []))[0]

    text_toks = ctx["toks"]
    if leaf.kind == "chunk":
        body = str(leaf.payload)
        f, _, rest = body.partition(":")
        if rest and f in field_cols:
            want, pool = set(tokenize(rest)), toks_of(f)
        elif gf:
            want, pool = set(tokenize(body)), toks_of(gf)
        else:
            want, pool = set(tokenize(body)), text_toks
        return bool(want & pool) if want else False
    if leaf.kind == "phrase":
        f, body, slop = leaf.payload
        if f is None and gf:
            f = gf
        if f in field_cols:
            base, pos_toks = ctx["fields"][f][1], ctx["fields"][f][2]
        else:
            if f is not None:
                body = f"{f}:{body}"  # unknown qualifier: plain text
            base, pos_toks = ctx["base"], ctx["pos_toks"]
        return _phrase_match(_phrase_seq(body), base, pos_toks, slop)
    if leaf.kind == "prefix":
        raw = str(leaf.payload)
        f, _, rest = raw.partition(":")
        if rest and f in field_cols:
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
            probe, pool = (rest if rest else head), text_toks
        n = len(probe)
        return any(abs(len(t) - n) <= me and _lev_le(t, probe, me)
                   for t in pool)
    if leaf.kind == "range":
        f, lo, hi, ilo, ihi = leaf.payload
        if gf and f is None:
            f = gf
        pool = toks_of(f) if f in field_cols else text_toks
        return any(
            (lo is None or (t > lo or (ilo and t == lo)))
            and (hi is None or (t < hi or (ihi and t == hi)))
            for t in pool)
    if leaf.kind == "regexp":
        f, pat = bq.parse_regexp(str(leaf.payload))
        if gf and f is None:
            f = gf
        pool = toks_of(f) if f in field_cols else text_toks
        rx = re.compile(pat)
        return any(rx.fullmatch(t) for t in pool)
    raise ValueError(f"unknown leaf kind {leaf.kind!r}")  # pragma: no cover


def _phrase_seq(body: str) -> list[str]:
    """BASE-token sequence, order and duplicates kept — the engine's
    phrase_terms rule."""
    return _BASE_RE.findall(body)


def _phrase_match(seq, base_tokens, pos_toks, slop: int) -> bool:
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
    ctx = {"toks": frozenset(toks), "base": toks[:n_base],
           "pos_toks": pos_toks, "fields": {}}
    for col, val in fields.items():
        # the build lays each FIELD token (base tokens first, then
        # sub-tokens, tokenize() order) on its OWN consecutive slot —
        # index/build.py:161-172 — so field phrases see singleton slots
        ftoks = tokenize(val or "")
        ctx["fields"][col] = (frozenset(ftoks), list(ftoks),
                              [{t} for t in ftoks])
    return ctx


def match_doc(compiled, text, fields: dict | None = None,
              field_cols: tuple = ()) -> list[str]:
    """Evaluate one document against the compiled registry (the unit the
    distributed kernel batches): returns the sorted matching query ids.
    Token routing first, tree evaluation only for the routed candidates."""
    ctx = _doc_ctx(text, fields or {})
    out = []
    for cq in compiled:
        if cq.route_tokens and not (cq.route_tokens & ctx["toks"]):
            # token-routable query sharing no token: provably no match
            # UNLESS a field chunk could match — field tokens are separate
            # pools, so include them in the routing check
            if not any(cq.route_tokens & f[0]
                       for f in ctx["fields"].values()):
                continue
        if _match_tree(cq.root, ctx, tuple(field_cols)):
            out.append(cq.qid)
    return sorted(out)


def percolate(df, queries: dict[str, str], text_col: str = "text",
              field_cols: tuple = ()):
    """Match every row of ``df`` against the query registry. Returns the
    input rows exploded to one row per (doc, matching query):
    all input columns + ``query_id``. Zero shuffle — broadcast registry,
    Arrow-batched mapInPandas."""
    from pyspark.sql.types import StringType, StructField, StructType

    compiled = compile_queries(queries, field_cols)
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((compiled, tuple(field_cols)))
    schema = StructType(list(df.schema.fields)
                        + [StructField("query_id", StringType())])
    cols = df.columns

    def it(batches):
        comp, fcols = b.value
        for pdf in batches:
            idx, qids = [], []
            for i, row in enumerate(pdf.itertuples(index=False)):
                d = row._asdict()
                hits = match_doc(comp, d.get(text_col),
                                 {c: d.get(c) for c in fcols}, fcols)
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
