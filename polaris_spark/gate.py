"""DuckDB oracle-SQL builders for the driver's correctness gate.

Each builder returns ANSI-ish SQL runnable by DuckDB against the
pre-registered testdata views (``documents``, ``embeddings``, ...). The SQL
computes the SAME spec as the Spark engine (tokenizer spec, BM25 constants,
association-insensitive e4-rounded scores) from first principles — the gate
therefore checks the whole pipeline (tokenize → build → encode → decode →
score), not a re-implementation of its bugs.
"""

from __future__ import annotations

import re as _re

from .query.boolquery import (_has_wild, fold_ranges, parse_range,
                              parse_regexp, regexp_literal_prefix)
from .query.engine import _fuzzy_suffix
from .tokenizer import duckdb_tokens_sql, tokenize

K1_SQL = "1.2"
K1P1_SQL = "(1.2 + 1.0)"
B_SQL = "0.75"


def _parse(query: str, field_cols: tuple = (),
           expand_fields: bool = False) -> tuple[list[str], list[str]]:
    """(include_terms, exclude_terms) — same spec as engine.parse_query
    (incl. the multi-field OR expansion of bare tokens when
    ``expand_fields``)."""
    fields = set(field_cols)
    inc: set[str] = set()
    exc: set[str] = set()
    for chunk in query.split():
        neg = chunk.startswith("-") and len(chunk) > 1
        body = chunk[1:] if neg else chunk
        f, _, rest = body.partition(":")
        if rest and f in fields:
            terms = {f"{f}:{t}" for t in tokenize(rest)}
        else:
            toks = set(tokenize(body))
            terms = set(toks)
            if expand_fields:
                terms |= {f"{c}:{t}" for c in fields for t in toks}
        (exc if neg else inc).update(terms)
    return sorted(inc), sorted(exc)


MAX_EXPANSIONS = 128  # engine.SearchEngine.max_expansions mirror


def _split_chunks(query: str, field_cols: tuple = (),
                  expand_fields: bool = False):
    """Engine parse_query_boosts mirror incl. trailing-star wildcards and
    ``chunk^2.5`` clause boosts: returns
    (inc_terms: dict[term, boost], inc_prefixes: list[(prefix, boost)],
     exc_terms, exc_prefixes). Term reached via several chunks → MAX boost
    (same dedup rule as the engine); boosts on '-' chunks ignored."""
    fields = set(field_cols)
    inc: dict[str, float] = {}
    exc: set[str] = set()
    pinc: list[tuple[str, float]] = []
    pexc: list[str] = []

    def _add(terms, neg, boost):
        if neg:
            exc.update(terms)
        else:
            for t in terms:
                inc[t] = max(inc.get(t, 1.0), boost)

    for chunk in fold_ranges(query).split():
        neg = chunk.startswith("-") and len(chunk) > 1
        body = chunk[1:] if neg else chunk
        boost = 1.0
        if "^" in body:
            head, _, tail = body.rpartition("^")
            try:
                boost = float(tail)
                body = head
            except ValueError:
                pass
        rng = parse_range(body)
        if rng is not None:  # before the wildcard sniff: '[a TO *]' has '*'
            f, lo, hi, ilo, ihi = rng
            # '' encodes both "bare" (field) and "open" (bounds) — tuples
            # must stay None-free for the sorted() below
            ent = ("range", f or "", lo or "", hi or "", ilo, ihi,
                   f is None or f in fields)
            if neg:
                pexc.append(ent)
            else:
                pinc.append(ent + (boost,))
            continue
        rgx = parse_regexp(body)
        if rgx is not None:  # before the wildcard sniff: '/p.*t/' has '*'
            f, pat = rgx
            ent = ("regexp", f or "", pat, f is None or f in fields)
            if neg:
                pexc.append(ent)
            else:
                pinc.append(ent + (boost,))
            continue
        fz = _fuzzy_suffix(body)
        if fz is not None:
            raw, me = fz
            # engine _expand_fuzzy mirror: known-field heads probe the full
            # 'f:term' string confined to 'f:' candidates; bare/unknown-
            # field heads probe the body among unfielded terms
            ffld, _, frest = raw.partition(":")
            if frest and ffld in fields:
                probe, scope = raw, ffld
            else:
                probe, scope = (frest if frest else raw), ""
            if neg:
                pexc.append(("fuzzy", probe, me, scope))
            else:
                pinc.append(("fuzzy", probe, me, scope, boost))
            continue
        if len(body) > 1 and body.endswith("*") and not _has_wild(body[:-1]):
            raw = body[:-1]
            f, _, rest = raw.partition(":")
            pref = f"{f}:{rest}" if (rest and f in fields) else raw
            if neg:
                pexc.append(("prefix", pref))
            else:
                pinc.append(("prefix", pref, boost))
            continue
        if _has_wild(body):
            f, _, rest = body.partition(":")
            bare = not (rest and f in fields)
            if neg:
                pexc.append(("wildcard", body, bare))
            else:
                pinc.append(("wildcard", body, bare, boost))
            continue
        f, _, rest = body.partition(":")
        if rest and f in fields:
            terms = {f"{f}:{t}" for t in tokenize(rest)}
        else:
            toks = set(tokenize(body))
            terms = set(toks)
            if expand_fields:
                terms |= {f"{c}:{t}" for c in fields for t in toks}
        _add(terms, neg, boost)
    return inc, sorted(pinc), sorted(exc), sorted(pexc)


def _qt_cte(terms, prefixes) -> str:
    """SQL set of (term, boost): literal list UNION capped prefix
    expansions (top MAX_EXPANSIONS by (df desc, term asc) — the engine's
    Lucene maxClauseCount-style cap, ties broken identically); duplicate
    terms collapse to MAX boost, the engine's dedup rule. ``terms`` may be
    a dict {term: boost} or a plain list (boost 1); ``prefixes`` entries may
    be (prefix, boost) tuples or plain strings."""
    if not isinstance(terms, dict):
        terms = {t: 1.0 for t in terms}
    parts = []
    if terms:
        ts = sorted(terms)
        bs = "[" + ", ".join(repr(float(terms[t])) for t in ts) + "]"
        parts.append(
            f"SELECT unnest({_sql_list(ts)}) AS term, unnest({bs}) AS boost"
        )
    for p in prefixes:
        # entries: ("prefix", pref[, boost]) | ("fuzzy", term, max_edits[, boost])
        # BARE expansions never reach 'field:token' terms (engine mirror:
        # Lucene confines multi-term expansion to one field); fuzzy heads are
        # always bare (the parser rejects ':' in them), prefixes are fielded
        # iff they carry the ':' themselves.
        if p[0] == "fuzzy":
            _k, raw, me, scope = p[0], p[1], p[2], p[3]
            boost = p[4] if len(p) > 4 else 1.0
            lit = raw.replace("'", "''")
            guard = (f"starts_with(term, '{scope}:')" if scope
                     else "NOT contains(term, ':')")
            cond = (
                f"length(term) BETWEEN {len(raw) - me} AND {len(raw) + me} "
                f"AND levenshtein(term, '{lit}') <= {me} AND {guard}"
            )
        elif p[0] == "range":
            _k, fld, lo, hi, ilo, ihi, known = p[:7]
            boost = p[7] if len(p) > 7 else 1.0
            cond = _range_cond(fld, lo, hi, ilo, ihi, known)
        elif p[0] == "wildcard":
            _k, pat, bare = p[0], p[1], p[2]
            boost = p[3] if len(p) > 3 else 1.0
            cond = _wild_cond(pat, bare)
        elif p[0] == "regexp":
            _k, fld, pat, known = p[:4]
            boost = p[4] if len(p) > 4 else 1.0
            cond = _regexp_cond(fld, pat, known)
        else:
            pref = p[1]
            boost = p[2] if len(p) > 2 else 1.0
            lit = pref.replace("'", "''")
            cond = f"starts_with(term, '{lit}')"
            if ":" not in pref:
                cond += " AND NOT contains(term, ':')"
        parts.append(
            f"SELECT term, {float(boost)!r} AS boost FROM "
            f"(SELECT term, count(*) AS xdf FROM tf "
            f"WHERE {cond} GROUP BY term "
            f"ORDER BY xdf DESC, term ASC LIMIT {MAX_EXPANSIONS})"
        )
    if not parts:
        parts = ["SELECT NULL::VARCHAR AS term, 1.0 AS boost WHERE FALSE"]
    body = "\n  UNION ALL\n  ".join(parts)
    return (f"SELECT term, max(boost) AS boost FROM (\n  {body}\n  ) "
            "GROUP BY term")


def _range_cond(fld: str, lo: str, hi: str, ilo: bool, ihi: bool,
                known: bool) -> str:
    """TermRangeQuery term condition (engine ``_expand_range`` mirror):
    pushed lexicographic bounds (raw/case-sensitive, like every multi-term
    expansion), field confinement, '' = open bound, unknown field → empty
    set."""
    if not known:
        return "FALSE"
    pre = f"{fld}:" if fld else ""
    conds = ([f"starts_with(term, '{pre.replace(chr(39), chr(39)*2)}')"]
             if fld else ["NOT contains(term, ':')"])
    if lo:
        key = (pre + lo).replace("'", "''")
        conds.append(f"term >{'=' if ilo else ''} '{key}'")
    if hi:
        key = (pre + hi).replace("'", "''")
        conds.append(f"term <{'=' if ihi else ''} '{key}'")
    return " AND ".join(conds)


def _wild_cond(pattern: str, bare: bool) -> str:
    """General-wildcard term condition (engine ``_expand_wildcard`` mirror):
    pushed literal prefix + anchored regex (escaped literals, ``.*``, ``.``
    only — identical semantics in DuckDB RE2 and Spark's Java regex), bare
    patterns confined to unfielded terms."""
    first = min(x for x in (pattern.find("*"), pattern.find("?")) if x >= 0)
    lit = pattern[:first].replace("'", "''")
    rx = "^" + "".join(
        ".*" if c == "*" else "." if c == "?" else _re.escape(c)
        for c in pattern
    ) + "$"
    cond = (f"starts_with(term, '{lit}') AND "
            f"regexp_matches(term, '{rx.replace(chr(39), chr(39) * 2)}')")
    if bare:
        cond += " AND NOT contains(term, ':')"
    return cond


def _regexp_cond(fld: str, pat: str, known: bool) -> str:
    """RegexpQuery term condition (engine ``_expand_regexp`` mirror):
    pushed literal prefix + the raw pattern matched ANCHORED against whole
    terms (Java ∩ RE2 dialect — identical in Spark ``rlike`` and DuckDB
    ``regexp_matches``), bare patterns confined to unfielded terms, unknown
    field → empty set. ``fld`` is '' for bare."""
    if not known:
        return "FALSE"
    pre = f"{fld}:" if fld else ""
    lit = (pre + regexp_literal_prefix(pat)).replace("'", "''")
    rx = ("^" + _re.escape(pre) + pat + "$").replace("'", "''")
    conds = []
    if lit:
        conds.append(f"starts_with(term, '{lit}')")
    conds.append(f"regexp_matches(term, '{rx}')")
    if not fld:
        conds.append("NOT contains(term, ':')")
    return " AND ".join(conds)


def _sql_list(terms: list[str]) -> str:
    return "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in terms) + "]"


def _qt_list(query: str, field_cols: tuple = (),
             expand_fields: bool = False) -> str:
    return _sql_list(_parse(query, field_cols, expand_fields)[0])


def base_cte(table: str = "documents", field_cols: tuple = ()) -> str:
    toks = duckdb_tokens_sql("text")
    for c in field_cols:
        toks = (
            f"list_concat({toks}, "
            f"list_transform({duckdb_tokens_sql(c)}, t -> '{c}:' || t))"
        )
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM {table}),
tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM d),
stats AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS N,
         (SELECT sum(dl) FROM dl)::DOUBLE AS sumdl
)"""


def tokenize_tf_sql(table: str = "documents") -> str:
    return base_cte(table) + "\nSELECT doc_id, term, tf FROM tf"


def doc_stats_sql(table: str = "documents") -> str:
    return base_cte(table) + "\nSELECT doc_id, dl FROM dl"


def dictionary_sql(table: str = "documents") -> str:
    return base_cte(table) + (
        "\nSELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf "
        "FROM tf GROUP BY term"
    )


def bm25_scores_sql(query: str, table: str = "documents", limit: int | None = None,
                    field_cols: tuple = (), expand_fields: bool = False,
                    offset: int = 0, raw: bool = False) -> str:
    """All matching docs with e4-rounded BM25 scores (LIMIT → top-k with the
    engine's exact (score desc, doc_id asc) order). ``field_cols`` mirrors a
    fielded index: per-doc tokens are text tokens ++ '<col>:<tok>' field
    tokens, and the query accepts field:value syntax (plus the bare-token
    multi-field OR expansion when ``expand_fields``)."""
    inc, pinc, _exc, _pexc = _split_chunks(query, field_cols, expand_fields)
    sql = base_cte(table, field_cols) + f""",
qt AS (
  {_qt_cte(inc, pinc)}
),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id,
         qt.boost
         * ln(1.0 + (s.N - dft.df + 0.5) / (dft.df + 0.5))
         * (tf.tf * {K1P1_SQL}
            / (tf.tf + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c,
         tf.term AS term
  FROM tf
  JOIN dft USING (term)
  JOIN qt USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, CAST(round(sum(c) * 10000) AS BIGINT) AS score_e4,
         sum(c) AS raw_score
  FROM contrib{_exclusion_clause(query, field_cols, expand_fields)} GROUP BY doc_id
)
SELECT doc_id, score_e4{", raw_score" if raw else ""} FROM scored"""
    if limit is not None:
        # offset mirrors the engine's searchAfter page: a keyset page over
        # the total (score desc, doc_id asc) order IS the offset slice
        sql += f"\nORDER BY raw_score DESC, doc_id ASC LIMIT {limit} OFFSET {int(offset)}"
    return sql


def msm_scores_sql(query: str, min_match: int, table: str = "documents") -> str:
    """Mirror of ``SearchEngine.search_df(query, min_match=m)`` — Lucene's
    BooleanQuery.setMinimumNumberShouldMatch over the flat OR clauses: the
    :func:`bm25_scores_sql` contribution sum restricted to docs matching
    ≥ ``min_match`` distinct query terms, with the per-doc distinct-term
    count exposed as ``n_match``."""
    inc, pinc, _exc, _pexc = _split_chunks(query)
    return base_cte(table) + f""",
qt AS (
  {_qt_cte(inc, pinc)}
),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id,
         qt.boost
         * ln(1.0 + (s.N - dft.df + 0.5) / (dft.df + 0.5))
         * (tf.tf * {K1P1_SQL}
            / (tf.tf + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c,
         tf.term AS term
  FROM tf
  JOIN dft USING (term)
  JOIN qt USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(round(sum(c) * 10000) AS BIGINT) AS score_e4,
       count(DISTINCT term)::INT AS n_match
FROM contrib GROUP BY doc_id
HAVING count(DISTINCT term) >= {int(min_match)}"""


def _exclusion_clause(query: str, field_cols: tuple = (),
                      expand_fields: bool = False) -> str:
    """WHERE fragment dropping docs that contain any '-'-prohibited term
    (engine parse_query exclusion semantics, incl. capped wildcard
    expansion of '-prefix*' chunks and the multi-field expansion of negated
    bare chunks when ``expand_fields`` — the engine excludes the expanded
    field tokens too, so the oracle must)."""
    _inc, _pinc, exc, pexc = _split_chunks(query, field_cols, expand_fields)
    if not exc and not pexc:
        return ""
    return (
        "\n  WHERE doc_id NOT IN "
        "(SELECT doc_id FROM tf WHERE term IN "
        f"(SELECT term FROM ({_qt_cte(exc, pexc)})))"
    )


def bool_scores_sql(query: str, table: str = "documents",
                    limit: int | None = None, field_cols: tuple = (),
                    expand_fields: bool = False) -> str:
    """DuckDB mirror of the engine's boolean-tree search
    (``SearchEngine.search_bool``): same shared parser
    (:mod:`.query.boolquery`), per-leaf term sets resolved into capped
    expansion subqueries, Lucene BooleanQuery match/score semantics
    compiled into CASE expressions. Returns (doc_id, score_e4) for every
    doc matching the root (LIMIT → engine top-k order)."""
    from .query.boolquery import Leaf, parse

    root = parse(query)
    if root is None:
        return "SELECT NULL::BIGINT AS doc_id, NULL::BIGINT AS score_e4 WHERE FALSE"
    fields = tuple(field_cols)

    leaves: list[tuple] = []  # (qt_sql, boost, scoring, phrase_spec)

    def leaf_phrase(leaf: Leaf) -> tuple:
        """engine ``resolve_phrase`` mirror → (qt_sql, phrase_spec)."""
        from .tokenizer import _BASE_RE

        fld, body, slop = leaf.payload
        if fld in fields or (leaf.group_field in fields
                             and leaf.group_field is not None):
            raise ValueError("field-qualified phrases are not supported")
        if fld is not None:
            body = f"{fld}:{body}"  # unknown qualifier: plain text
        seq = _BASE_RE.findall(body)
        uniq = sorted(set(seq))
        if not uniq:
            return "SELECT NULL::VARCHAR AS term WHERE FALSE", None
        qt = f"SELECT unnest({_sql_list(uniq)}) AS term"
        if len(seq) == 1:
            return qt, None  # TermQuery degeneration, like the engine
        return qt, (seq, int(slop))

    def leaf_qt(leaf: Leaf) -> str:
        # engine parse_bool.resolve mirror incl. the f:(...) group scope
        gf = leaf.group_field if leaf.group_field in fields else None
        if leaf.kind == "chunk":
            body = leaf.payload
            f, _, rest = body.partition(":")
            if rest and f in fields:
                terms = sorted({f"{f}:{t}" for t in tokenize(rest)})
            elif gf:
                terms = sorted({f"{gf}:{t}" for t in tokenize(body)})
            else:
                toks = set(tokenize(body))
                terms = set(toks)
                if expand_fields:
                    terms |= {f"{c}:{t}" for c in fields for t in toks}
                terms = sorted(terms)
            if not terms:
                return "SELECT NULL::VARCHAR AS term WHERE FALSE"
            return f"SELECT unnest({_sql_list(terms)}) AS term"
        if leaf.kind == "prefix":
            raw = leaf.payload
            f, _, rest = raw.partition(":")
            pref = (f"{f}:{rest}" if (rest and f in fields)
                    else f"{gf}:{raw}" if gf else raw)
            lit = pref.replace("'", "''")
            cond = f"starts_with(term, '{lit}')"
            if ":" not in pref:
                cond += " AND NOT contains(term, ':')"
        elif leaf.kind == "fuzzy":
            raw, me = leaf.payload
            if gf and ":" not in raw:
                raw = f"{gf}:{raw}"  # field group scopes fuzzy leaves too
            ffld, _, frest = raw.partition(":")
            if frest and ffld in fields:
                probe, guard = raw, f"starts_with(term, '{ffld}:')"
            else:
                probe = frest if frest else raw
                guard = "NOT contains(term, ':')"
            lit = probe.replace("'", "''")
            cond = (
                f"length(term) BETWEEN {len(probe) - me} AND {len(probe) + me} "
                f"AND levenshtein(term, '{lit}') <= {me} AND {guard}"
            )
        elif leaf.kind == "wildcard":
            pat = leaf.payload
            f, _, rest = pat.partition(":")
            if gf and not (rest and f in fields):
                pat = f"{gf}:{pat}"
                f, _, rest = pat.partition(":")
            cond = _wild_cond(pat, bare=not (rest and f in fields))
        elif leaf.kind == "range":
            f, lo, hi, ilo, ihi = leaf.payload
            if gf and f is None:
                f = gf
            cond = _range_cond(f or "", lo or "", hi or "", ilo, ihi,
                               known=f is None or f in fields)
        elif leaf.kind == "regexp":
            f, pat = parse_regexp(leaf.payload)
            if gf and f is None:
                f = gf
            cond = _regexp_cond(f or "", pat,
                                known=f is None or f in fields)
        else:  # pragma: no cover
            raise ValueError(f"unknown leaf kind {leaf.kind!r}")
        return (
            "SELECT term FROM (SELECT term, count(*) AS xdf FROM tf "
            f"WHERE {cond} GROUP BY term "
            f"ORDER BY xdf DESC, term ASC LIMIT {MAX_EXPANSIONS})"
        )

    def conv(nd, scoring: bool):
        if isinstance(nd, Leaf):
            if nd.kind == "phrase":
                qt, phrase = leaf_phrase(nd)
            else:
                qt, phrase = leaf_qt(nd), None
            leaves.append((qt, nd.boost, scoring, phrase))
            return ("leaf", len(leaves) - 1)
        return (
            "node",
            [conv(c, scoring) for c in nd.must],
            [conv(c, scoring) for c in nd.should],
            [conv(c, False) for c in nd.must_not],
            int(nd.msm),
        )

    croot = conv(root, True)

    def mexpr(nd) -> str:
        if nd[0] == "leaf":
            i = nd[1]
            alias = f"l{i}" if leaves[i][2] else f"n{i}"
            return f"({alias}.doc_id IS NOT NULL)"
        _tag, must, should, mnot, msm = nd
        if not must and not should:
            return "FALSE"  # pure-negative group matches nothing
        if msm > 0 and not should:
            return "FALSE"  # msm with no optional clauses (Lucene)
        conds = [mexpr(c) for c in must]
        if should:
            # minimumNumberShouldMatch mirror: ≥ eff SHOULD children must
            # match (eff = msm when set, else 1 without MUSTs, 0 with)
            eff = msm if msm > 0 else (0 if must else 1)
            if eff == 1:
                conds.append(
                    "(" + " OR ".join(mexpr(c) for c in should) + ")")
            elif eff > 1:
                cnt = " + ".join(f"(CASE WHEN {mexpr(c)} THEN 1 ELSE 0 END)"
                                 for c in should)
                conds.append(f"(({cnt}) >= {eff})")
        conds.extend(f"(NOT {mexpr(c)})" for c in mnot)
        return "(" + " AND ".join(conds) + ")"

    def cexpr(nd) -> str:
        if nd[0] == "leaf":
            i = nd[1]
            if not leaves[i][2]:
                return "0.0"
            return f"coalesce({float(leaves[i][1])!r} * l{i}.c, 0.0)"
        _tag, must, should, _mnot, _msm = nd
        kids = [cexpr(c) for c in (*must, *should)]
        body = " + ".join(kids) if kids else "0.0"
        return f"(CASE WHEN {mexpr(nd)} THEN ({body}) ELSE 0.0 END)"

    qt_ctes = []
    leaf_ctes = []
    joins = []
    scoring_qts = []
    any_phrase = any(ph for _qt, _b, _sc, ph in leaves)
    for i, (qt, _boost, scoring, phrase) in enumerate(leaves):
        qt_ctes.append(f"qt{i} AS ({qt})")
        if scoring:
            scoring_qts.append(f"SELECT term FROM qt{i}")
        if phrase is not None:
            # quoted PhraseQuery leaf: positional anchor count over sl,
            # contribution = idf_sum(sequence) × impact(phrase_freq, dl) —
            # the engine kernel's phrase branch, verbatim
            seq, slop = phrase
            t0 = seq[0].replace("'", "''")
            leaf_ctes.append(
                f"pf{i} AS (SELECT a0.doc_id, count(*)::BIGINT AS pf "
                f"FROM sl a0 WHERE a0.tok = '{t0}'\n    AND "
                + _phrase_cond(seq, slop) + " GROUP BY a0.doc_id)"
            )
            if scoring:
                leaf_ctes.append(
                    f"l{i} AS (SELECT p.doc_id, ({_phrase_idf_sum(seq)})"
                    f" * (p.pf * {K1P1_SQL} / (p.pf + {K1_SQL} * "
                    f"(1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c "
                    f"FROM pf{i} p JOIN dl USING (doc_id) CROSS JOIN stats s)"
                )
                joins.append(f"LEFT JOIN l{i} ON l{i}.doc_id = u.doc_id")
            else:
                leaf_ctes.append(
                    f"n{i} AS (SELECT DISTINCT doc_id FROM pf{i})"
                )
                joins.append(f"LEFT JOIN n{i} ON n{i}.doc_id = u.doc_id")
        elif scoring:
            leaf_ctes.append(
                f"l{i} AS (SELECT doc_id, sum(c) AS c FROM contrib "
                f"WHERE term IN (SELECT term FROM qt{i}) GROUP BY doc_id)"
            )
            joins.append(f"LEFT JOIN l{i} ON l{i}.doc_id = u.doc_id")
        else:
            leaf_ctes.append(
                f"n{i} AS (SELECT DISTINCT doc_id FROM tf "
                f"WHERE term IN (SELECT term FROM qt{i}))"
            )
            joins.append(f"LEFT JOIN n{i} ON n{i}.doc_id = u.doc_id")

    univq = " UNION ALL ".join(scoring_qts) or \
        "SELECT NULL::VARCHAR AS term WHERE FALSE"
    qt_block = ",\n".join(qt_ctes)
    if any_phrase:
        leaf_ctes.insert(0, _slot_ctes(table))
    leaf_block = ",\n".join(leaf_ctes)
    sql = base_cte(table, fields) + f""",
{qt_block},
univq AS (SELECT DISTINCT term FROM ({univq})),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM univq) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (s.N - dft.df + 0.5) / (dft.df + 0.5))
         * (tf.tf * {K1P1_SQL}
            / (tf.tf + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c
  FROM tf
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
univ AS (
  SELECT DISTINCT doc_id FROM tf WHERE term IN (SELECT term FROM univq)
),
{leaf_block},
scored AS (
  SELECT u.doc_id,
         {cexpr(croot)} AS raw_score,
         {mexpr(croot)} AS m
  FROM univ u
  {' '.join(joins)}
)
SELECT doc_id, CAST(round(raw_score * 10000) AS BIGINT) AS score_e4
FROM scored WHERE m"""
    if limit is not None:
        sql += f"\nORDER BY raw_score DESC, doc_id ASC LIMIT {limit}"
    return sql


def batch_scores_sql(queries: list[str], table: str = "documents",
                     field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Oracle for the batched multi-query search (search_many_df, k=None):
    the UNION ALL of each query's full e4-rounded score set, keyed by the
    query string. Per-query routing mirrors the engine: quoted phrases and
    boolean-tree syntax → :func:`bool_scores_sql`, plain text →
    :func:`bm25_scores_sql` (incl. boosts, wildcards and '-term'
    exclusion), so the batch oracle inherits every single-query mirror
    already proven by the other gates. Parse failures degrade to the flat
    mirror, matching the engine fallback (assumes a positions=True index —
    the engine's positionless-phrase degrade has no oracle analog; the
    batch gate builds with positions). Duplicate query strings are deduped
    (first occurrence), matching the engine."""
    from .query.boolquery import has_operators
    from .query.engine import parse_phrase_query

    seen: set[str] = set()
    subs = []
    for q in queries:
        if q in seen:
            continue
        seen.add(q)
        esc = q.replace("'", "''")
        sub = None
        if parse_phrase_query(q) is not None or has_operators(q):
            try:
                sub = bool_scores_sql(q, table, None, field_cols,
                                      expand_fields)
            except ValueError:
                sub = None  # malformed: flat fallback, like the engine
        if sub is None:
            sub = bm25_scores_sql(q, table, None, field_cols, expand_fields)
        subs.append(
            f"SELECT '{esc}' AS query, doc_id, score_e4\nFROM (\n{sub}\n)")
    return "\nUNION ALL\n".join(subs)


def rank_eval_sql(queries: list[str], k: int = 10, mod2: int = 17,
                  mod1: int = 7, table: str = "documents") -> str:
    """Oracle for the rank_eval gate (query/rankeval.py): the run is the
    batched-search mirror (:func:`batch_scores_sql`) ranked by
    (score_e4 desc, doc_id asc) — the engine side ranks on the SAME
    e4-rounded score so tie order is bit-stable across both engines —
    and the judgments are replayed from pure doc_id arithmetic: for
    query index i, grade 2 where doc_id % mod2 = (3i+1) % mod2, else
    grade 1 where doc_id % mod1 = (2i+1) % mod1 (doc_id is dense
    0..N-1 in the driver corpus, so both moduli are sign-trivial).
    Metrics follow the module docstring of rankeval.py exactly
    (exponential-gain DCG, ideal from the judgments cut at k,
    precision over retrieved, recall over the query's relevant set),
    emitted e6-rounded."""
    vals = ", ".join(
        f"('{q.replace(chr(39), chr(39) * 2)}', {i})"
        for i, q in enumerate(queries))
    return f"""
WITH res AS (
{batch_scores_sql(queries, table)}
),
ranked AS (
  SELECT query, doc_id,
         row_number() OVER (PARTITION BY query
                            ORDER BY score_e4 DESC, doc_id ASC) AS rank
  FROM res
),
qidx(query, i) AS (VALUES {vals}),
jud AS (
  SELECT query, doc_id, grade FROM (
    SELECT q.query, d.doc_id,
           CASE WHEN d.doc_id % {mod2} = (3 * q.i + 1) % {mod2} THEN 2
                WHEN d.doc_id % {mod1} = (2 * q.i + 1) % {mod1} THEN 1
                ELSE 0 END AS grade
    FROM {table} d CROSS JOIN qidx q
  ) WHERE grade > 0
),
run AS (
  SELECT r.query, r.doc_id, r.rank, coalesce(j.grade, 0) AS grade
  FROM ranked r LEFT JOIN jud j USING (query, doc_id)
  WHERE r.rank <= {int(k)}
),
perq AS (
  SELECT query,
         count(*)::BIGINT AS n_ret,
         sum(CASE WHEN grade >= 1 THEN 1 ELSE 0 END) AS rel_ret,
         min(CASE WHEN grade >= 1 THEN rank END) AS first_rel,
         sum((power(2.0, grade) - 1.0) / log2(rank + 1.0)) AS dcg
  FROM run GROUP BY query
),
ideal AS (
  SELECT query,
         sum(CASE WHEN irank <= {int(k)}
                  THEN (power(2.0, grade) - 1.0) / log2(irank + 1.0)
                  ELSE 0 END) AS idcg,
         sum(CASE WHEN grade >= 1 THEN 1 ELSE 0 END)::BIGINT AS n_rel
  FROM (SELECT query, doc_id, grade,
               row_number() OVER (PARTITION BY query
                                  ORDER BY grade DESC, doc_id ASC) AS irank
        FROM jud)
  GROUP BY query
)
SELECT p.query, p.n_ret, coalesce(i.n_rel, 0)::BIGINT AS n_rel,
       CAST(round(1e6 * p.rel_ret / p.n_ret) AS BIGINT) AS precision_e6,
       CAST(round(CASE WHEN coalesce(i.n_rel, 0) > 0
                       THEN 1e6 * p.rel_ret / i.n_rel ELSE 0 END)
            AS BIGINT) AS recall_e6,
       CAST(round(CASE WHEN p.first_rel IS NOT NULL
                       THEN 1e6 / p.first_rel ELSE 0 END)
            AS BIGINT) AS rr_e6,
       CAST(round(CASE WHEN coalesce(i.idcg, 0) > 0
                       THEN 1e6 * p.dcg / i.idcg ELSE 0 END)
            AS BIGINT) AS ndcg_e6
FROM perq p LEFT JOIN ideal i USING (query)"""


def hybrid_rrf_sql(query: str, k: int = 10, window: int = 50,
                   rank_constant: int = 60, qvec_id: int = 0,
                   table: str = "documents",
                   emb_table: str = "embeddings") -> str:
    """Oracle for the hybrid RRF gate (query/hybrid.py): the lexical leg
    is the bm25 mirror ranked by (raw_score desc, doc_id asc) — bit-equal
    doubles per the bm25 gates, so ranks agree — and the vector leg
    mirrors ``cosine_topk`` exactly: sims ROUNDED TO 6 DECIMALS BEFORE
    ordering (that is what the engine ranks on), vec_id tiebreak. Both
    legs cut at ``window``; rrf = Σ 1/(rank_constant + rank) over present
    legs, a pure function of small integer ranks, emitted e6-rounded."""
    rc = int(rank_constant)
    qvec = (f"(SELECT embedding::DOUBLE[] FROM {emb_table} "
            f"WHERE vec_id = {int(qvec_id)})")
    dot = (f"list_sum(list_transform(list_zip(embedding::DOUBLE[], {qvec}),"
           f" p -> p[1] * p[2]))")
    n1 = "sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))"
    n2 = f"sqrt(list_sum(list_transform({qvec}, x -> x * x)))"
    return f"""
WITH lexbase AS (
  SELECT * FROM (
{bm25_scores_sql(query, table, limit=int(window), raw=True)}
  )
),
lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY raw_score DESC, doc_id ASC)
         AS rank_leg0
  FROM lexbase
),
vecbase AS (
  SELECT vec_id AS doc_id, round({dot} / ({n1} * {n2}), 6) AS sim
  FROM {emb_table} ORDER BY sim DESC, vec_id ASC LIMIT {int(window)}
),
vecr AS (
  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC)
         AS rank_leg1
  FROM vecbase
),
fused AS (
  SELECT doc_id, coalesce(rank_leg0, 0) AS rank_leg0,
         coalesce(rank_leg1, 0) AS rank_leg1
  FROM lexr FULL OUTER JOIN vecr USING (doc_id)
),
scored AS (
  SELECT doc_id, rank_leg0, rank_leg1,
         (CASE WHEN rank_leg0 > 0 THEN 1.0 / ({rc} + rank_leg0)
               ELSE 0 END)
         + (CASE WHEN rank_leg1 > 0 THEN 1.0 / ({rc} + rank_leg1)
                 ELSE 0 END) AS rrf
  FROM fused
)
SELECT doc_id, rank_leg0, rank_leg1,
       CAST(round(1e6 * rrf) AS BIGINT) AS rrf_e6
FROM scored
ORDER BY rrf DESC, doc_id ASC LIMIT {int(k)}"""


def boolean_and_sql(query: str, table: str = "documents") -> str:
    """Doc ids containing ALL query terms (posting-list intersection)."""
    qt = _qt_list(query)
    n = len(sorted(set(tokenize(query))))
    return base_cte(table) + f""",
qt AS (SELECT unnest({qt}) AS term)
SELECT doc_id FROM tf
WHERE term IN (SELECT term FROM qt)
GROUP BY doc_id
HAVING count(DISTINCT term) = {n}"""


def _slot_ctes(table: str) -> str:
    """The positional CTE block shared by every phrase mirror: per-doc base
    tokens slotted in order (``slotted``) plus camel/separator sub-tokens at
    their parent slot (``subs``), unioned as ``sl`` — the DuckDB image of
    ``tokenize_with_positions``'s position-increment-0 convention."""
    from .tokenizer import BASE_PATTERN, CAMEL1, CAMEL2, SEPS_PATTERN

    base_lit = BASE_PATTERN.replace("'", "''")
    seps_lit = SEPS_PATTERN.replace("'", "''")
    camel = (
        "list_filter(string_split(regexp_replace(regexp_replace(regexp_replace("
        f"tok, '{CAMEL1[0]}', '\\1 \\2', 'g'), '{CAMEL2[0]}', '\\1 \\2', 'g'), "
        f"'{seps_lit}', ' ', 'g'), ' '), s -> s != '')"
    )
    return f"""bt AS (SELECT doc_id, regexp_extract_all(text, '{base_lit}') AS b FROM {table}),
slotted AS (
  SELECT doc_id, unnest(range(1, len(b) + 1))::INT AS slot, unnest(b) AS tok
  FROM bt
),
subs AS (
  SELECT doc_id, slot,
         unnest(CASE WHEN len({camel}) > 1 THEN {camel} ELSE [] END) AS tok
  FROM slotted
),
sl AS (SELECT * FROM slotted UNION ALL SELECT * FROM subs)"""


def _phrase_cond(terms: list[str], slop: int) -> str:
    """The anchor-match condition over ``sl`` alias ``a0`` (terms 1..n as
    correlated subqueries): exact adjacency EXISTS chain at slop=0, the
    engine's anchor-displacement Σmin form otherwise (an absent term yields
    a NULL min → NULL sum → row excluded, same all-terms-required rule)."""
    if slop == 0:
        return "\n    AND ".join(
            f"EXISTS (SELECT 1 FROM sl a{i} WHERE a{i}.doc_id = a0.doc_id "
            f"AND a{i}.slot = a0.slot + {i} AND a{i}.tok = '"
            + t.replace("'", "''") + "')"
            for i, t in enumerate(terms[1:], start=1)
        )
    mins = " + ".join(
        f"(SELECT min(abs(a{i}.slot - (a0.slot + {i}))) FROM sl a{i} "
        f"WHERE a{i}.doc_id = a0.doc_id AND a{i}.tok = '"
        + t.replace("'", "''") + "')"
        for i, t in enumerate(terms[1:], start=1)
    )
    return f"({mins}) <= {int(slop)}"


def _phrase_idf_sum(terms: list[str]) -> str:
    """Σ_i idf(term_i) over the SEQUENCE (duplicates count twice, like
    Lucene's sumOfSquaredWeights) as dft-correlated subqueries."""
    return " + ".join(
        f"(SELECT ln(1.0 + (s.N - df + 0.5) / (df + 0.5)) FROM dft "
        f"WHERE term = '" + t.replace("'", "''") + "')"
        for t in terms
    )


def phrase_sql(phrase: str, table: str = "documents", slop: int = 0,
               raw: bool = False) -> str:
    """Phrase matches with e4-rounded scores (``slop`` > 0 mirrors the
    engine's anchor-displacement sloppy semantics: anchor q0 matches when
    Σ_i min_q |q − (q0+i)| ≤ slop over term_i's slots — the exact path is
    the slop=0 special case but keeps its cheaper EXISTS form).

    Spec (same as engine ``search_phrase`` / ``phrase_shard``): phrase terms
    are the BASE tokens of the phrase in order; a doc matches at start slot p
    when term_i occupies slot ``p + i`` for all i, where a slot's occupants
    are its base token PLUS that token's camel/separator sub-tokens (the
    Lucene position-increment-0 convention mirrored from
    ``tokenize_with_positions`` — so 'big data' matches 'the_big data.x').
    phrase_freq counts term_0 slot entries WITH multiplicity (a token like
    ``foo_foo`` contributes two ``foo`` entries at one slot), existence-only
    for terms 1..n — exactly the engine kernel's live-chain semantics.
    Score = (Σ_i idf(term_i)) × BM25-impact(phrase_freq, dl) with dl from the
    FULL token stream (base + sub tokens)."""
    from .tokenizer import _BASE_RE

    terms = _BASE_RE.findall(phrase)
    assert len(terms) >= 2, "phrase oracle needs >= 2 terms"
    t0 = terms[0].replace("'", "''")
    exists = _phrase_cond(terms, slop)
    qt = _qt_list(" ".join(terms))
    idf_terms = _phrase_idf_sum(terms)
    impact = (f"(pf.pf * {K1P1_SQL} / (pf.pf + {K1_SQL} * "
              f"(1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N))))")
    raw_col = (f",\n       ({idf_terms}) * {impact} AS raw_score"
               if raw else "")
    return base_cte(table) + f""",
qt AS (SELECT unnest({qt}) AS term),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
{_slot_ctes(table)},
pf AS (
  SELECT a0.doc_id, count(*)::BIGINT AS pf
  FROM sl a0
  WHERE a0.tok = '{t0}'
    AND {exists}
  GROUP BY a0.doc_id
)
SELECT pf.doc_id,
       CAST(round(({idf_terms}) * {impact} * 10000) AS BIGINT) AS score_e4,
       pf.pf::INT AS phrase_freq{raw_col}
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s
WHERE pf.pf > 0"""


def complete_sql(prefix: str, n: int = 20, table: str = "documents") -> str:
    """Prefix completion mirror: full-prefix | camel-part-prefix | acronym."""
    p = prefix.lower().replace("'", "''")
    u = prefix.upper().replace("'", "''")
    parts = (
        "list_filter(string_split(regexp_replace(regexp_replace(regexp_replace("
        "term, '([a-z0-9])([A-Z])', '\\1 \\2', 'g'), '([A-Z]+)([A-Z][a-z])', "
        "'\\1 \\2', 'g'), '[._'']+', ' ', 'g'), ' '), s -> s != '')"
    )
    acro = "regexp_replace(term, '[^A-Z]', '', 'g')"
    return dictionary_sql(table).replace(
        "SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term",
        f"""SELECT term, df, cf FROM (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
) WHERE starts_with(lower(term), '{p}')
   OR len(list_filter({parts}, s -> starts_with(lower(s), '{p}'))) > 0
   OR (length({acro}) > 1 AND starts_with({acro}, '{u}'))
ORDER BY df DESC, term ASC LIMIT {n}""",
    )


def facet_sql(query: str, attr: str = "source", table: str = "documents",
              field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Facet-counts mirror (engine ``facet_counts``): every doc matching
    the query (same BM25 OR match semantics as ``bm25_scores_sql`` with no
    limit), counted per value of the stored attribute."""
    inner = bm25_scores_sql(query, table, None, field_cols, expand_fields)
    return (
        f"SELECT d.{attr} AS facet, count(*)::BIGINT AS n\n"
        f"FROM ({inner}) m JOIN {table} d USING (doc_id)\n"
        f"GROUP BY 1"
    )


def collapse_sql(query: str, attr: str = "source", k: int = 10,
                 per_group: int = 1, table: str = "documents",
                 field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Field-collapse mirror (engine ``search_collapse`` — Lucene grouping
    TopGroups / ES collapse): the full BM25 match set joined to the stored
    attribute, at most ``per_group`` hits per attribute value ranked
    (raw score desc, doc_id asc), groups ranked by their head hit under
    the same order, top-``k`` groups kept. Ordering uses the RAW float64
    score (the engine's total order), never the e4 rounding."""
    inner = bm25_scores_sql(query, table, None, field_cols, expand_fields,
                            raw=True)
    return f"""
SELECT h.group_rank, g.{attr}, g.hit_rank, g.doc_id, g.score_e4
FROM (
  SELECT tb.{attr} AS {attr}, m.doc_id, m.score_e4, m.raw_score,
         row_number() OVER (PARTITION BY tb.{attr}
                            ORDER BY m.raw_score DESC, m.doc_id ASC)::BIGINT
           AS hit_rank
  FROM ({inner}) m JOIN {table} tb USING (doc_id)
) g
JOIN (
  SELECT {attr},
         row_number() OVER (ORDER BY raw_score DESC, doc_id ASC)::BIGINT
           AS group_rank
  FROM (
    SELECT tb.{attr} AS {attr}, m.doc_id, m.raw_score,
           row_number() OVER (PARTITION BY tb.{attr}
                              ORDER BY m.raw_score DESC, m.doc_id ASC)
             AS hit_rank
    FROM ({inner}) m JOIN {table} tb USING (doc_id)
  ) WHERE hit_rank = 1
) h USING ({attr})
WHERE h.group_rank <= {int(k)} AND g.hit_rank <= {int(per_group)}"""


def parent_sql(query: str, attr: str = "source", k: int = 10,
               score_mode: str = "max", table: str = "documents") -> str:
    """Parent-scoped search mirror (engine ``search_parent`` — Lucene
    ToParentBlockJoinQuery with a stored attribute as the parent key):
    child BM25 scores folded per parent (max|avg|total|none — ScoreMode),
    best child = (raw score desc, doc_id asc) head, top-``k`` parents by
    (folded raw score desc, key asc)."""
    fold = {"max": "max(m.raw_score)", "avg": "avg(m.raw_score)",
            "total": "sum(m.raw_score)", "none": "0.0"}[score_mode]
    inner = bm25_scores_sql(query, table, None, raw=True)
    return f"""
SELECT tb.{attr} AS {attr},
       CAST(round(({fold}) * 10000) AS BIGINT) AS score_e4,
       count(*)::BIGINT AS n_children,
       (array_agg(m.doc_id ORDER BY m.raw_score DESC, m.doc_id ASC))[1]::BIGINT
         AS best_doc_id
FROM ({inner}) m JOIN {table} tb USING (doc_id)
GROUP BY 1
ORDER BY ({fold}) DESC, tb.{attr} ASC
LIMIT {int(k)}"""


def rescore_sql(query: str, rescore_phrase: str, k: int = 10,
                window: int = 50, query_weight: float = 1.0,
                rescore_weight: float = 1.0, slop: int = 0,
                table: str = "documents") -> str:
    """Two-pass rescore mirror (engine ``rescore`` — Lucene QueryRescorer
    / ES rescore): the flat query's exact top-``window`` (raw-score
    order) left-joined to the sloppy-phrase score set; combined =
    qw·first + rw·coalesce(second, 0), top-``k`` by (combined raw desc,
    doc_id asc). All ordering uses raw float64 scores; only the output
    is e4-rounded."""
    first = bm25_scores_sql(query, table, limit=int(window), raw=True)
    second = phrase_sql(rescore_phrase, table, slop=slop, raw=True)
    comb = (f"({float(query_weight)} * f.raw_score + "
            f"{float(rescore_weight)} * coalesce(s.raw_score, 0.0))")
    return f"""
SELECT f.doc_id,
       CAST(round({comb} * 10000) AS BIGINT) AS score_e4,
       f.score_e4 AS first_e4,
       coalesce(s.score_e4, 0) AS second_e4
FROM ({first}) f LEFT JOIN ({second}) s USING (doc_id)
ORDER BY {comb} DESC, f.doc_id ASC
LIMIT {int(k)}"""


def multi_phrase_sql(slots: list, slop: int = 0,
                     table: str = "documents") -> str:
    """MultiPhraseQuery mirror (engine ``search_multi_phrase``): the
    phrase mirror with each slot's occupancy = tok IN (members); slot-0
    anchor rows keep multiplicity, absent members coalesce to zero idf
    (the engine's documented deviation), slop>0 uses the Σmin displacement
    over slot unions."""
    slots = [[s] if isinstance(s, str) else list(s) for s in slots]
    n = len(slots)

    def inlist(members):
        return ", ".join("'" + t.replace("'", "''") + "'" for t in members)

    if slop == 0:
        cond = "\n    AND ".join(
            f"EXISTS (SELECT 1 FROM sl a{i} WHERE a{i}.doc_id = a0.doc_id "
            f"AND a{i}.slot = a0.slot + {i} AND a{i}.tok IN ({inlist(ms)}))"
            for i, ms in enumerate(slots[1:], start=1)
        )
    else:
        mins = " + ".join(
            f"(SELECT min(abs(a{i}.slot - (a0.slot + {i}))) FROM sl a{i} "
            f"WHERE a{i}.doc_id = a0.doc_id AND a{i}.tok IN ({inlist(ms)}))"
            for i, ms in enumerate(slots[1:], start=1)
        )
        cond = f"({mins}) <= {int(slop)}"
    all_terms = sorted({t for ms in slots for t in ms})
    idf_terms = " + ".join(
        f"coalesce((SELECT ln(1.0 + (s.N - df + 0.5) / (df + 0.5)) FROM dft "
        f"WHERE term = '" + t.replace("'", "''") + "'), 0.0)"
        for ms in slots for t in ms
    )
    impact = (f"(pf.pf * {K1P1_SQL} / (pf.pf + {K1_SQL} * "
              f"(1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N))))")
    return base_cte(table) + f""",
qt AS (SELECT unnest({_sql_list(all_terms)}) AS term),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
{_slot_ctes(table)},
pf AS (
  SELECT a0.doc_id, count(*)::BIGINT AS pf
  FROM sl a0
  WHERE a0.tok IN ({inlist(slots[0])})
    AND {cond}
  GROUP BY a0.doc_id
)
SELECT pf.doc_id,
       CAST(round(({idf_terms}) * {impact} * 10000) AS BIGINT) AS score_e4,
       pf.pf::INT AS phrase_freq
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s
WHERE pf.pf > 0"""


def phrase_prefix_sql(tokens: list[str], max_expansions: int = 128,
                      slop: int = 0, table: str = "documents") -> str:
    """match_phrase_prefix mirror (engine ``search_phrase_prefix``): the
    multi-phrase mirror with the LAST slot's members = the top
    ``max_expansions`` dictionary terms carrying the prefix (df desc,
    term asc — the engine's PrefixQuery expansion, recomputed here from
    the corpus so the mirror is self-contained); Σ idf includes every
    expansion member, like the engine's multi-phrase scoring."""
    *lits, prefix = tokens
    if not lits:
        raise ValueError("phrase_prefix_sql needs ≥2 tokens")
    p_lit = prefix.replace("'", "''")
    fixed = sorted(set(lits))
    idf_fixed = " + ".join(
        "coalesce((SELECT ln(1.0 + (s.N - df + 0.5) / (df + 0.5)) FROM dft "
        "WHERE term = '" + t.replace("'", "''") + "'), 0.0)"
        for t in lits)
    idf_exp = ("(SELECT coalesce(sum(ln(1.0 + (s.N - e.df + 0.5) "
               "/ (e.df + 0.5))), 0.0) FROM exp e)")
    n = len(tokens)
    last = n - 1
    if slop == 0:
        conds = [
            f"EXISTS (SELECT 1 FROM sl a{i} WHERE a{i}.doc_id = a0.doc_id "
            f"AND a{i}.slot = a0.slot + {i} AND a{i}.tok = '"
            + t.replace("'", "''") + "')"
            for i, t in enumerate(lits[1:], start=1)]
        conds.append(
            f"EXISTS (SELECT 1 FROM sl a{last} WHERE a{last}.doc_id = "
            f"a0.doc_id AND a{last}.slot = a0.slot + {last} "
            f"AND a{last}.tok IN (SELECT term FROM exp))")
        cond = "\n    AND ".join(conds)
    else:
        mins = [
            f"(SELECT min(abs(a{i}.slot - (a0.slot + {i}))) FROM sl a{i} "
            f"WHERE a{i}.doc_id = a0.doc_id AND a{i}.tok = '"
            + t.replace("'", "''") + "')"
            for i, t in enumerate(lits[1:], start=1)]
        mins.append(
            f"(SELECT min(abs(a{last}.slot - (a0.slot + {last}))) "
            f"FROM sl a{last} WHERE a{last}.doc_id = a0.doc_id "
            f"AND a{last}.tok IN (SELECT term FROM exp))")
        cond = f"({' + '.join(mins)}) <= {int(slop)}"
    impact = (f"(pf.pf * {K1P1_SQL} / (pf.pf + {K1_SQL} * "
              f"(1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N))))")
    return base_cte(table) + f""",
dic AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
exp AS (
  SELECT term, df FROM dic
  WHERE term LIKE '{p_lit}%' AND term NOT LIKE '%:%'
  ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}
),
qt AS (SELECT unnest({_sql_list(fixed)}) AS term),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
{_slot_ctes(table)},
pf AS (
  SELECT a0.doc_id, count(*)::BIGINT AS pf
  FROM sl a0
  WHERE a0.tok = '{lits[0].replace(chr(39), chr(39) * 2)}'
    AND {cond}
  GROUP BY a0.doc_id
)
SELECT pf.doc_id,
       CAST(round(({idf_fixed} + {idf_exp}) * {impact} * 10000) AS BIGINT)
         AS score_e4,
       pf.pf::INT AS phrase_freq
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s
WHERE pf.pf > 0"""


def span_near_sql(terms: list[str], slop: int = 0, in_order: bool = False,
                  table: str = "documents") -> str:
    """SpanNearQuery mirror (engine ``span_near`` — Lucene
    spans.SpanNearQuery): over the shared positional ``sl`` CTE,
    ordered = greedy strictly-increasing LATERAL min-chain from each
    term₀ anchor, unordered = minimal window [anchor,
    max_t min{slot_t ≥ anchor}] from every query-term position row;
    a match needs (width − n) ≤ slop, span_freq counts matching anchors,
    score = idf-sum × BM25 impact of span_freq (the engine's pseudo-term
    shape)."""
    n = len(terms)
    lits = [t.replace("'", "''") for t in terms]
    idf_terms = _phrase_idf_sum(terms)
    impact = (f"(pf.pf * {K1P1_SQL} / (pf.pf + {K1_SQL} * "
              f"(1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N))))")
    if in_order:
        lat, prev = [], "a0.slot"
        for i, t in enumerate(lits[1:], start=1):
            lat.append(
                f"LATERAL (SELECT min(s{i}.slot) AS m FROM sl s{i} "
                f"WHERE s{i}.doc_id = a0.doc_id AND s{i}.tok = '{t}' "
                f"AND s{i}.slot > {prev}) l{i}")
            prev = f"l{i}.m"
        anchor = f"(SELECT doc_id, slot FROM sl WHERE tok = '{lits[0]}') a0"
        cond = (f"{prev} IS NOT NULL AND "
                f"({prev} - a0.slot + 1 - {n}) <= {int(slop)}")
    else:
        inlist = ", ".join(f"'{t}'" for t in sorted(set(lits)))
        lat, mins = [], []
        for i, t in enumerate(sorted(set(lits))):
            lat.append(
                f"LATERAL (SELECT min(s{i}.slot) AS m FROM sl s{i} "
                f"WHERE s{i}.doc_id = a0.doc_id AND s{i}.tok = '{t}' "
                f"AND s{i}.slot >= a0.slot) l{i}")
            mins.append(f"l{i}.m")
        anchor = f"(SELECT doc_id, slot FROM sl WHERE tok IN ({inlist})) a0"
        notnull = " AND ".join(f"{m} IS NOT NULL" for m in mins)
        cond = (f"{notnull} AND (greatest({', '.join(mins)}) "
                f"- a0.slot + 1 - {n}) <= {int(slop)}")
    joins = ",\n       ".join([anchor, *lat])
    return base_cte(table) + f""",
qt AS (SELECT unnest({_sql_list(sorted(set(terms)))}) AS term),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
{_slot_ctes(table)},
pf AS (
  SELECT a0.doc_id, count(*)::BIGINT AS pf
  FROM {joins}
  WHERE {cond}
  GROUP BY a0.doc_id
)
SELECT pf.doc_id,
       CAST(round(({idf_terms}) * {impact} * 10000) AS BIGINT) AS score_e4,
       pf.pf::INT AS span_freq
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s
WHERE pf.pf > 0"""


def intervals_sql(first: str, alts: list[str], max_gaps: int = -1,
                  table: str = "documents") -> str:
    """IntervalQuery mirror for the gate's spec shape
    ``ordered([{term: first}, {or: alts}], max_gaps)`` (engine
    ``search_intervals`` — Lucene queries.intervals minimal-interval
    semantics): per ``first`` position p, the chain interval is
    (p, min{alt slot > p}); the minimal set keeps, per distinct end q,
    the largest start p (strictly nested intervals drop); ``max_gaps``
    filters the minimal stream on q − p − 1; ivl_freq counts minimal
    intervals, score = Σ idf(distinct terms, 0 when absent) × BM25
    impact of ivl_freq."""
    f_lit = first.replace("'", "''")
    alist = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(alts))
    terms = sorted({first, *alts})
    idf_sum = " + ".join(
        "coalesce((SELECT ln(1.0 + (s.N - df + 0.5) / (df + 0.5)) FROM dft "
        "WHERE term = '" + t.replace("'", "''") + "'), 0.0)"
        for t in terms)
    impact = (f"(pf.pf * {K1P1_SQL} / (pf.pf + {K1_SQL} * "
              f"(1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N))))")
    gap_cond = (f"\n  WHERE q - p - 1 <= {int(max_gaps)}"
                if int(max_gaps) >= 0 else "")
    return base_cte(table) + f""",
qt AS (SELECT unnest({_sql_list(terms)}) AS term),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
{_slot_ctes(table)},
iv AS (
  SELECT a0.doc_id, a0.slot AS p, l1.m AS q
  FROM (SELECT doc_id, slot FROM sl WHERE tok = '{f_lit}') a0,
  LATERAL (SELECT min(s1.slot) AS m FROM sl s1
           WHERE s1.doc_id = a0.doc_id AND s1.tok IN ({alist})
           AND s1.slot > a0.slot) l1
  WHERE l1.m IS NOT NULL
),
miv AS (SELECT doc_id, max(p) AS p, q FROM iv GROUP BY doc_id, q),
pf AS (
  SELECT doc_id, count(*)::BIGINT AS pf FROM miv{gap_cond}
  GROUP BY doc_id
)
SELECT pf.doc_id,
       CAST(round(({idf_sum}) * {impact} * 10000) AS BIGINT) AS score_e4,
       pf.pf::INT AS ivl_freq
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s
WHERE pf.pf > 0"""


def filtered_sql(query: str, filter_query: str, k: int | None = None,
                 table: str = "documents", field_cols: tuple = ()) -> str:
    """FILTER-context mirror (engine ``search_df(filter_query=...)`` —
    Lucene 4.3 FilteredQuery / ES bool filter): the main query's full BM25
    match set restricted to docs containing ANY of the filter's parsed
    terms (the flat pure-OR constant-score docIdSet path), scores
    untouched. ``filter_query`` must be the flat form the engine's
    zero-scoring path serves (plain/fielded terms, OR semantics)."""
    inner = bm25_scores_sql(query, table, None, field_cols, raw=True)
    fterms = _parse(filter_query, field_cols, False)[0]
    flist = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(fterms)))
    fset = base_cte(table, field_cols) + \
        f"\nSELECT DISTINCT doc_id FROM tf WHERE term IN ({flist})"
    sql = f"""
SELECT m.doc_id, m.score_e4
FROM ({inner}) m
WHERE m.doc_id IN (SELECT doc_id FROM ({fset}))"""
    if k is not None:
        sql += f"\nORDER BY m.raw_score DESC, m.doc_id ASC LIMIT {int(k)}"
    return sql


def dismax_sql(query: str, tie: float = 0.0, k: int | None = None,
               mode: str = "or", field_boosts: dict | None = None,
               table: str = "documents", field_cols: tuple = ()) -> str:
    """DisjunctionMaxQuery mirror (engine ``search_dismax_df`` — Lucene
    DisjunctionMaxQuery / Solr-ES dismax): per query token, contributions
    of its bare + ``field:token`` variants fold as
    ``max + tie × (sum − max)`` (per-field qf boosts pre-multiplied), and
    docs score the sum of token-group folds with ``n_match`` = distinct
    token groups matched (``mode='and'`` requires all)."""
    fb = {str(kk): float(v) for kk, v in (field_boosts or {}).items()}
    bases = sorted(set(_parse(query, (), False)[0]))
    rows = []
    for bse in bases:
        lit = bse.replace("'", "''")
        for f in ["text", *field_cols]:
            t = lit if f == "text" else f"{f}:{lit}"
            rows.append(f"('{t}', '{lit}', {fb.get(f, 1.0)!r})")
    vals = ",\n    ".join(rows) or "(NULL, NULL, 1.0)"
    having = f"\nHAVING count(*) = {len(bases)}" if mode == "and" else ""
    sql = base_cte(table, field_cols) + f""",
qt AS (SELECT * FROM (VALUES {vals}) v(term, base, fboost)),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id, qt.base,
         qt.fboost
         * ln(1.0 + (s.N - dft.df + 0.5) / (dft.df + 0.5))
         * (tf.tf * {K1P1_SQL}
            / (tf.tf + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c
  FROM tf
  JOIN dft USING (term)
  JOIN qt USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
g AS (
  SELECT doc_id, base, max(c) AS m, sum(c) AS sm
  FROM contrib GROUP BY 1, 2
)
SELECT doc_id,
       CAST(round(sum(m + {float(tie)!r} * (sm - m)) * 10000) AS BIGINT)
         AS score_e4,
       count(*)::INT AS n_match
FROM g GROUP BY doc_id{having}"""
    if k is not None:
        sql += (f"\nORDER BY sum(m + {float(tie)!r} * (sm - m)) DESC, "
                f"doc_id ASC LIMIT {int(k)}")
    return sql


def boosting_sql(query: str, negative_query: str,
                 negative_boost: float = 0.5, k: int | None = None,
                 table: str = "documents", field_cols: tuple = ()) -> str:
    """Boosting-query mirror (engine ``search_boosting_df`` — Lucene
    BoostingQuery / ES ``boosting``): the main query's full BM25 match
    set, scores multiplied by ``negative_boost`` for docs that ALSO
    contain ANY of the negative query's parsed terms (demotion, never
    exclusion). ``negative_query`` must be the flat pure-OR form (plain/
    fielded terms), like :func:`filtered_sql`'s filter."""
    inner = bm25_scores_sql(query, table, None, field_cols, raw=True)
    nterms = sorted(set(_parse(negative_query, field_cols, False)[0]))
    nlist = ", ".join("'" + t.replace("'", "''") + "'" for t in nterms)
    nset = base_cte(table, field_cols) + \
        f"\nSELECT DISTINCT doc_id FROM tf WHERE term IN ({nlist})"
    nb = float(negative_boost)
    adj = f"m.raw_score * (CASE WHEN nx.doc_id IS NOT NULL THEN {nb!r} ELSE 1.0 END)"
    sql = f"""
SELECT m.doc_id,
       CAST(round({adj} * 10000) AS BIGINT) AS score_e4,
       (CASE WHEN nx.doc_id IS NOT NULL THEN 1 ELSE 0 END)::INT AS demoted
FROM ({inner}) m
LEFT JOIN ({nset}) nx ON m.doc_id = nx.doc_id"""
    if k is not None:
        sql += f"\nORDER BY {adj} DESC, m.doc_id ASC LIMIT {int(k)}"
    return sql


def function_score_sql(query: str, attr: str, factor: float = 1.0,
                       modifier: str = "none", missing: float = 1.0,
                       boost_mode: str = "multiply", k: int | None = None,
                       table: str = "documents",
                       field_cols: tuple = ()) -> str:
    """Function-score mirror (engine ``search_function_score`` — Lucene
    FunctionScoreQuery / ES function_score field_value_factor): the main
    query's full BM25 match set reshaped by modifier(attr × factor),
    NULL attr → ``missing``; log1p is written ``ln(1 + x)`` to match the
    engine's op-for-op f64 expression."""
    inner = bm25_scores_sql(query, table, None, field_cols, raw=True)
    raw = f"(d.{attr}::DOUBLE * {float(factor)!r})"
    if modifier == "log1p":
        raw = f"ln(1.0 + {raw})"
    elif modifier == "sqrt":
        raw = f"sqrt({raw})"
    fv = f"coalesce({raw}, {float(missing)!r})"
    op = "*" if boost_mode == "multiply" else "+"
    adj = f"(m.raw_score {op} {fv})"
    sql = f"""
SELECT m.doc_id,
       CAST(round({adj} * 10000) AS BIGINT) AS score_e4,
       CAST(round({fv} * 10000) AS BIGINT) AS fv_e4
FROM ({inner}) m
LEFT JOIN {table} d ON m.doc_id = d.doc_id"""
    if k is not None:
        sql += f"\nORDER BY {adj} DESC, m.doc_id ASC LIMIT {int(k)}"
    return sql


def decay_sql(query: str, attr: str, origin: float, scale: float,
              shape: str = "gauss", decay: float = 0.5,
              offset: float = 0.0, missing: float = 1.0,
              k: int | None = None, table: str = "documents",
              field_cols: tuple = ()) -> str:
    """Decay-scoring mirror (engine ``search_decay`` — ES function_score
    gauss/exp/linear decay): multiplier from the attr's distance to
    ``origin``. The shape constants (ln(decay)/scale² etc.) are computed
    in PYTHON and embedded as literals, exactly like the engine does, so
    both sides evaluate the same f64 expression tree."""
    import math

    inner = bm25_scores_sql(query, table, None, field_cols, raw=True)
    d = (f"greatest(0.0, abs(d.{attr}::DOUBLE - {float(origin)!r}) "
         f"- {float(offset)!r})")
    ln_d, s = math.log(float(decay)), float(scale)
    if shape == "gauss":
        fn = f"exp({d} * {d} * {ln_d / (s * s)!r})"
    elif shape == "exp":
        fn = f"exp({d} * {ln_d / s!r})"
    else:
        fn = f"greatest(0.0, 1.0 - {d} * {(1.0 - float(decay)) / s!r})"
    # CASE, not coalesce — greatest() ignores NULLs on both engines, so
    # a NULL attr must be caught before it reads as d=0
    fv = (f"(CASE WHEN d.{attr} IS NULL THEN {float(missing)!r} "
          f"ELSE {fn} END)")
    adj = f"(m.raw_score * {fv})"
    sql = f"""
SELECT m.doc_id,
       CAST(round({adj} * 10000) AS BIGINT) AS score_e4,
       CAST(round({fv} * 10000) AS BIGINT) AS fv_e4
FROM ({inner}) m
LEFT JOIN {table} d ON m.doc_id = d.doc_id"""
    if k is not None:
        sql += f"\nORDER BY {adj} DESC, m.doc_id ASC LIMIT {int(k)}"
    return sql


def significant_terms_sql(query: str, n: int = 10, window: int = 200,
                          min_doc_count: int = 2, table: str = "documents",
                          field_cols: tuple = ()) -> str:
    """Significant-terms mirror (engine ``significant_terms`` — the ES
    ``significant_terms`` agg under a ``sampler``): JLH score
    ``(fg% − bg%) × (fg% / bg%)`` of every term of the query's
    top-``window`` hit docs against the corpus, superset rule fg% > bg%,
    foreground df ≥ ``min_doc_count``, top-``n`` by (score desc, term
    asc). All score inputs are exact integer counts, so the f64 JLH is
    bit-identical to the engine's."""
    inner = bm25_scores_sql(query, table, int(window), field_cols)
    jlh = ("((fg.fg_df / fgn.fg_n) - (bg.bg_df / s.N))"
           " * ((fg.fg_df / fgn.fg_n) / (bg.bg_df / s.N))")
    return base_cte(table, field_cols) + f""",
hits AS (SELECT doc_id FROM ({inner}) h),
fgn AS (SELECT count(*)::DOUBLE AS fg_n FROM hits),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM tf
  WHERE doc_id IN (SELECT doc_id FROM hits) GROUP BY term
),
bg AS (
  SELECT term, count(*)::BIGINT AS bg_df FROM tf
  WHERE term IN (SELECT term FROM fg) GROUP BY term
)
SELECT fg.term, fg.fg_df, bg.bg_df,
       CAST(round({jlh} * 1000000) AS BIGINT) AS score_e6
FROM fg JOIN bg USING (term) CROSS JOIN fgn CROSS JOIN stats s
WHERE fg.fg_df >= {int(min_doc_count)} AND {jlh} > 0
ORDER BY {jlh} DESC, fg.term ASC LIMIT {int(n)}"""


def synonym_sql(query: str, synonyms: dict, mode: str = "or",
                k: int | None = None, table: str = "documents") -> str:
    """SynonymQuery mirror (engine ``search_synonyms`` — Lucene
    SynonymQuery blended statistics): each query token's group (token +
    synonyms) scores as one pseudo-term with per-doc tf = Σ member tfs
    and docFreq = max member df; n_match = distinct groups matched."""
    bases = sorted(set(_parse(query, (), False)[0]))
    syn = {str(kk): [str(x) for x in v] for kk, v in (synonyms or {}).items()}
    rows = []
    for bse in bases:
        bl = bse.replace("'", "''")
        for t in [bse, *syn.get(bse, [])]:
            rows.append(f"('{t.replace(chr(39), chr(39)*2)}', '{bl}')")
    vals = ",\n    ".join(rows) or "(NULL, NULL)"
    having = f"\nHAVING count(*) = {len(bases)}" if mode == "and" else ""
    sql = base_cte(table) + f""",
qt AS (SELECT * FROM (VALUES {vals}) v(term, base)),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
gdf AS (
  SELECT q.base, max(coalesce(d.df, 0)) AS dfb
  FROM qt q LEFT JOIN dft d USING (term) GROUP BY q.base
),
gtf AS (
  SELECT tf.doc_id, q.base, sum(tf.tf)::DOUBLE AS tfsum
  FROM tf JOIN qt q USING (term) GROUP BY 1, 2
),
contrib AS (
  SELECT g.doc_id,
         ln(1.0 + (s.N - gd.dfb + 0.5) / (gd.dfb + 0.5))
         * (g.tfsum * {K1P1_SQL}
            / (g.tfsum + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c
  FROM gtf g
  JOIN gdf gd USING (base)
  JOIN dl ON dl.doc_id = g.doc_id
  CROSS JOIN stats s
)
SELECT doc_id,
       CAST(round(sum(c) * 10000) AS BIGINT) AS score_e4,
       count(*)::INT AS n_match
FROM contrib GROUP BY doc_id{having}"""
    if k is not None:
        sql += f"\nORDER BY sum(c) DESC, doc_id ASC LIMIT {int(k)}"
    return sql


def suggest_sql(term: str, n: int = 5, max_edits: int = 2,
                table: str = "documents") -> str:
    """Spell-suggest mirror (engine ``suggest_df``): vocabulary terms
    within ``max_edits`` Levenshtein edits of ``term`` (input excluded),
    ranked (dist asc, df desc, term asc). The engine's n-gram-table probe
    is a provably lossless candidate filter, so the full-vocab oracle must
    agree exactly."""
    lit = term.replace("'", "''")
    return (
        f"SELECT term, levenshtein(term, '{lit}')::BIGINT AS dist, df\n"
        f"FROM ({dictionary_sql(table)}) d\n"
        f"WHERE term <> '{lit}'\n"
        f"  AND levenshtein(term, '{lit}') <= {int(max_edits)}\n"
        f"  AND term NOT LIKE '%:%'\n"
        f"ORDER BY dist ASC, df DESC, term ASC\nLIMIT {int(n)}"
    )


def suggest_phrase_sql(t1: str, t2: str, n: int = 3, per_term: int = 5,
                       max_edits: int = 2, edit_penalty: float = 1.0,
                       table: str = "documents") -> str:
    """Phrase-suggester mirror (engine ``suggest_phrase``, two-token
    form): per token, identity + top-``per_term`` spell candidates
    (dist asc, df desc, term asc — same order as :func:`suggest_sql`);
    combinations scored Σ ln(1+cf) − edit_penalty × Σ edits with cf the
    collection frequency; the original sequence excluded."""
    def cand(t: str, alias: str) -> str:
        lit = t.replace("'", "''")
        return f"""{alias} AS (
  SELECT '{lit}' AS term, 0::BIGINT AS dist
  UNION ALL
  SELECT term, dist FROM (
    SELECT term, levenshtein(term, '{lit}')::BIGINT AS dist, df
    FROM dic
    WHERE term <> '{lit}'
      AND levenshtein(term, '{lit}') <= {int(max_edits)}
      AND term NOT LIKE '%:%'
    ORDER BY dist ASC, df DESC, term ASC LIMIT {int(per_term)})
)"""
    lam = float(edit_penalty)
    o1, o2 = t1.replace("'", "''"), t2.replace("'", "''")
    score = (f"(ln(1.0 + coalesce(d1.cf, 0)) + ln(1.0 + coalesce(d2.cf, 0))"
             f" - {lam!r} * (c1.dist + c2.dist))")
    return base_cte(table) + f""",
dic AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
        FROM tf GROUP BY term),
{cand(t1, 'c1')},
{cand(t2, 'c2')}
SELECT c1.term || ' ' || c2.term AS suggestion,
       (c1.dist + c2.dist)::BIGINT AS edits,
       CAST(round({score} * 1000000) AS BIGINT) AS score_e6
FROM c1 CROSS JOIN c2
LEFT JOIN dic d1 ON d1.term = c1.term
LEFT JOIN dic d2 ON d2.term = c2.term
WHERE c1.term || ' ' || c2.term <> '{o1} {o2}'
ORDER BY {score} DESC, suggestion ASC
LIMIT {int(n)}"""


def explain_sql(query: str, table: str = "documents") -> str:
    """Score-explanation mirror (engine ``explain``): the per-term BM25
    breakdown (term, df, tf, dl, e4-rounded contribution) for the TOP-1
    document of the query — the Lucene ``IndexSearcher.explain`` surface
    (the reference's ranked search rides on Lucene 4.3 scoring; explain
    exposes the same decomposition the ``bm25_scores`` gate sums). The
    doc pick reuses the scored CTE's exact (score desc, doc_id asc) order,
    so both sides explain the same document whenever ``bm25_top10``
    agrees."""
    inc, pinc, _exc, _pexc = _split_chunks(query)
    return base_cte(table) + f""",
qt AS (
  {_qt_cte(inc, pinc)}
),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id, tf.term AS term, dft.df AS df, tf.tf AS tf, dl.dl AS dl,
         qt.boost
         * ln(1.0 + (s.N - dft.df + 0.5) / (dft.df + 0.5))
         * (tf.tf * {K1P1_SQL}
            / (tf.tf + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c
  FROM tf
  JOIN dft USING (term)
  JOIN qt USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
pick AS (
  SELECT doc_id FROM contrib GROUP BY doc_id
  ORDER BY sum(c) DESC, doc_id ASC LIMIT 1
)
SELECT term, df, tf, dl, CAST(round(c * 10000) AS BIGINT) AS contrib_e4
FROM contrib WHERE doc_id = (SELECT doc_id FROM pick)
ORDER BY term"""


def mlt_sql(table: str = "documents", max_terms: int = 8,
            k: int = 10) -> str:
    """MoreLikeThis mirror (engine ``more_like_this``): source doc = the
    table's min doc_id; its distinct terms ranked by tf(doc) × idf(corpus)
    (desc, term asc), top ``max_terms`` kept; those terms scored as a flat
    BM25 OR over every OTHER doc, exact top-``k`` by (score desc, doc_id
    asc). idf is the engine's BM25 idf — the same selection the engine
    computes from its dictionary probe."""
    return base_cte(table) + f""",
src AS (SELECT min(doc_id) AS doc_id FROM {table}),
dt AS (
  SELECT term, tf FROM tf WHERE doc_id = (SELECT doc_id FROM src)
),
dfa AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM dt) GROUP BY term
),
sel AS (
  SELECT dt.term AS term, dfa.df AS df
  FROM dt JOIN dfa USING (term) CROSS JOIN stats s
  ORDER BY dt.tf * ln(1.0 + (s.N - dfa.df + 0.5) / (dfa.df + 0.5)) DESC,
           dt.term ASC
  LIMIT {int(max_terms)}
),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.N - sel.df + 0.5) / (sel.df + 0.5))
         * (tf.tf * {K1P1_SQL}
            / (tf.tf + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c
  FROM tf
  JOIN sel USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE tf.doc_id <> (SELECT doc_id FROM src)
),
scored AS (
  SELECT doc_id, CAST(round(sum(c) * 10000) AS BIGINT) AS score_e4,
         sum(c) AS raw_score
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, score_e4 FROM scored
ORDER BY raw_score DESC, doc_id ASC LIMIT {int(k)}"""


# the fixed check inventory of index.check.check_index — the gate's oracle
# is this constant all-zeros table, so a hash match REQUIRES every
# integrity check to actually pass on the gate-built index
INDEX_CHECKS = (
    "block_last", "block_max_bound", "block_shape", "bucket_key", "cf_sum",
    "completion_subset", "decode_error", "df_len", "dict_congruence",
    "doc_map_n", "doc_stats_n", "docs_sorted", "fuzzy_subset",
    "positions", "salted_shard", "sum_dl", "tf_positive",
)


def index_check_sql() -> str:
    """CheckIndex mirror: the expected (all-zero) violation table. The
    Spark side computes real violation counts over the index
    (``index.check.check_index``); equality with this constant is the
    integrity assertion."""
    rows = ",\n  ".join(f"('{c}', 0)" for c in INDEX_CHECKS)
    return (
        "SELECT chk, CAST(violations AS BIGINT) AS violations FROM (VALUES\n"
        f"  {rows}\n) AS t(chk, violations)\nORDER BY chk"
    )


# ---------------------------------------------------------------- aggs

def _match_join_cte(query: str, table: str, field_cols: tuple,
                    expand_fields: bool) -> str:
    """Shared aggs front half: the full BM25 match set joined to the base
    table for attribute columns (mirror of ``aggs._attr_matches``)."""
    inner = bm25_scores_sql(query, table, None, field_cols, expand_fields)
    return f"SELECT d.* FROM ({inner}) m JOIN {table} d USING (doc_id)"


def stats_agg_sql(query: str, attr: str, table: str = "documents",
                  field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Mirror of ``aggs.stats_agg``: integer-space sum, f64 division last."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    return (
        f"SELECT count(*)::BIGINT AS n,\n"
        f"       min({attr})::DOUBLE AS min_v,\n"
        f"       max({attr})::DOUBLE AS max_v,\n"
        f"       sum({attr})::DOUBLE AS sum_v,\n"
        f"       sum({attr})::DOUBLE / count(*) AS avg_v\n"
        f"FROM ({j}) j"
    )


def terms_agg_sql(query: str, attr: str, metric_attr: str | None = None,
                  size: int | None = None, table: str = "documents",
                  field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Mirror of ``aggs.terms_agg`` — (n desc, key asc) bucket order."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    cols = f"{attr} AS key, count(*)::BIGINT AS n"
    if metric_attr is not None:
        cols += (
            f", min({metric_attr})::DOUBLE AS min_v"
            f", max({metric_attr})::DOUBLE AS max_v"
            f", sum({metric_attr})::DOUBLE AS sum_v"
            f", sum({metric_attr})::DOUBLE / count(*) AS avg_v"
        )
    sql = f"SELECT {cols} FROM ({j}) j GROUP BY 1 ORDER BY n DESC, key ASC"
    if size is not None:
        sql += f" LIMIT {int(size)}"
    return sql


def top_hits_sql(query: str, attr: str, size: int = 3,
                 table: str = "documents", field_cols: tuple = (),
                 expand_fields: bool = False) -> str:
    """Mirror of ``aggs.top_hits_agg``: per attribute value, the top
    ``size`` hits by the engine's exact (raw score desc, doc_id asc)
    order, scores e4-rounded AFTER ranking (matching the gate's
    score_e4 projection of the engine's double scores)."""
    inner = bm25_scores_sql(query, table, None, field_cols,
                            expand_fields, raw=True)
    return f"""
WITH j AS (
  SELECT d.{attr} AS key, m.doc_id, m.raw_score
  FROM ({inner}) m JOIN {table} d USING (doc_id)
), r AS (
  SELECT key, doc_id,
         CAST(round(raw_score * 10000) AS BIGINT) AS score_e4,
         row_number() OVER (PARTITION BY key
                            ORDER BY raw_score DESC, doc_id ASC) AS rank
  FROM j
)
SELECT key, rank::BIGINT AS rank, doc_id, score_e4
FROM r WHERE rank <= {int(size)}"""


def histogram_sql(query: str, attr: str, interval: float,
                  table: str = "documents", field_cols: tuple = (),
                  expand_fields: bool = False,
                  min_doc_count: int = 1) -> str:
    """Mirror of ``aggs.histogram_agg``: floor(v/interval)*interval keys."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    step = float(interval)
    return (
        f"SELECT floor({attr}::DOUBLE / {step!r}) * {step!r} AS bucket,\n"
        f"       count(*)::BIGINT AS n\n"
        f"FROM ({j}) j GROUP BY 1 HAVING count(*) >= {int(min_doc_count)}\n"
        f"ORDER BY bucket ASC"
    )


def pipeline_agg_sql(query: str, attr: str, interval: float,
                     moving_avg: int = 3, table: str = "documents") -> str:
    """Mirror of ``aggs.pipeline_agg`` over a histogram parent: window
    functions over the bucket series — derivative = n − lag(n) (NULL for
    the first bucket, exactly ES), running sum, and a trailing
    ``moving_avg``-bucket mean including the current bucket. Derived
    values are exact functions of the (integer) bucket counts; the
    moving average emits e6-rounded."""
    h = histogram_sql(query, attr, interval, table)
    n = int(moving_avg)
    return f"""
WITH h AS (
{h}
)
SELECT bucket, n,
       n::DOUBLE - lag(n::DOUBLE) OVER (ORDER BY bucket) AS derivative,
       sum(n::DOUBLE) OVER (ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cumulative,
       CAST(round(1e6 * avg(n::DOUBLE) OVER (
            ORDER BY bucket ROWS {n - 1} PRECEDING)) AS BIGINT)
           AS moving_avg_e6
FROM h ORDER BY bucket"""


def range_agg_sql(query: str, attr: str, edges: list,
                  table: str = "documents", field_cols: tuple = (),
                  expand_fields: bool = False) -> str:
    """Mirror of ``aggs.range_agg``: from-inclusive/to-exclusive buckets."""
    es = sorted(float(e) for e in edges)
    j = _match_join_cte(query, table, field_cols, expand_fields)
    cond = f"WHEN {attr}::DOUBLE < {es[0]!r} THEN 0 "
    for i, e in enumerate(es[1:], start=1):
        cond += f"WHEN {attr}::DOUBLE < {e!r} THEN {i} "
    arr = "(ARRAY[" + ", ".join(repr(e) for e in es) + "]::DOUBLE[])"
    return (
        f"WITH j AS ({j}),\n"
        f"b AS (SELECT CASE {cond}ELSE {len(es)} END::BIGINT AS bucket_idx\n"
        f"      FROM j)\n"
        f"SELECT bucket_idx,\n"
        f"       CASE WHEN bucket_idx > 0 THEN {arr}[bucket_idx::INT] END AS lo,\n"
        f"       CASE WHEN bucket_idx < {len(es)} THEN {arr}[bucket_idx::INT + 1] END AS hi,\n"
        f"       count(*)::BIGINT AS n\n"
        f"FROM b GROUP BY 1 ORDER BY bucket_idx ASC"
    )


def date_histogram_sql(query: str, ts_expr: str, width_s: int,
                       table: str = "documents", field_cols: tuple = (),
                       expand_fields: bool = False) -> str:
    """Mirror of ``aggs.date_histogram_agg`` (FIXED intervals — the
    timezone-proof integer form): ``ts_expr`` is a SQL expression over the
    base table's columns producing an epoch-second BIGINT (the gate derives
    a deterministic per-doc timestamp; a real deployment stores one),
    bucketed by ``floor(epoch / width) * width``."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    w = int(width_s)
    return (
        f"SELECT (floor(({ts_expr})::DOUBLE / {w}) * {w})::BIGINT AS bucket_epoch,\n"
        f"       count(*)::BIGINT AS n\n"
        f"FROM ({j}) j GROUP BY 1 ORDER BY bucket_epoch ASC"
    )


def cardinality_sql(query: str, attr: str, table: str = "documents",
                    field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Mirror of ``aggs.cardinality_agg(exact=True)``."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    return f"SELECT count(DISTINCT {attr})::BIGINT AS n_distinct FROM ({j}) j"


def percentiles_sql(query: str, attr: str, qs=(0.25, 0.5, 0.75, 0.95),
                    table: str = "documents", field_cols: tuple = (),
                    expand_fields: bool = False) -> str:
    """Mirror of ``aggs.percentiles_agg(exact=True)``: DuckDB
    ``quantile_cont`` is the same sorted-values linear interpolation as
    Spark's exact ``percentile``."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    qlist = ", ".join(repr(float(q)) for q in qs)
    return (
        f"WITH j AS ({j}),\n"
        f"qv AS (SELECT unnest(ARRAY[{qlist}]::DOUBLE[]) AS q,\n"
        f"              unnest(quantile_cont({attr}::DOUBLE, ARRAY[{qlist}]::DOUBLE[])) AS value\n"
        f"       FROM j)\n"
        f"SELECT q, value::DOUBLE AS value FROM qv ORDER BY q ASC"
    )


def _sql_lit(v) -> str:
    """One SQL literal for a composite after-cursor value."""
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(float(v)) if isinstance(v, float) else repr(int(v))


def composite_sql(query: str, sources: list, size: int = 10,
                  after: tuple | None = None, table: str = "documents",
                  field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Mirror of ``aggs.composite_agg``: key-tuple-asc bucket pages with an
    exclusive keyset cursor (DuckDB row-value comparison ≡ the engine's
    compiled lexicographic predicate)."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    keys = ", ".join(sources)
    sql = (f"SELECT {keys}, count(*)::BIGINT AS n FROM ({j}) j\n")
    if after is not None:
        vals = ", ".join(_sql_lit(v) for v in after)
        sql += f"WHERE ({keys}) > ({vals})\n"
    sql += f"GROUP BY {keys} ORDER BY {keys} LIMIT {int(size)}"
    return sql


def filters_agg_sql(query: str, filters: dict, table: str = "documents",
                    field_cols: tuple = (), expand_fields: bool = False) -> str:
    """Mirror of ``aggs.filters_agg``: per-name scalar counts of the main
    match set intersected with each sub-query's match set (0 for empty
    buckets — the keyed-bucket contract)."""
    main = bm25_scores_sql(query, table, None, field_cols, expand_fields)
    parts = []
    for name in sorted(filters):
        sub = bm25_scores_sql(filters[name], table, None, field_cols,
                              expand_fields)
        parts.append(
            f"SELECT {_sql_lit(name)} AS name,\n"
            f"  (SELECT count(*) FROM ({main}) m JOIN ({sub}) s "
            f"USING (doc_id))::BIGINT AS n"
        )
    return ("SELECT name, n FROM (\n" + "\nUNION ALL\n".join(parts)
            + "\n) b ORDER BY name ASC")


def pinned_sql(query: str, pinned_ids: list, k: int = 10,
               table: str = "documents", field_cols: tuple = (),
               expand_fields: bool = False) -> str:
    """Mirror of ``SearchEngine.search_pinned``: pinned ids first in
    list order (existing docs only; organic score kept when the pinned
    doc also matches, NULL otherwise), then the organic top-k excluding
    pinned; scores e4-rounded after ranking."""
    org = bm25_scores_sql(query, table, None, field_cols, expand_fields,
                          raw=True)
    pins = ", ".join(f"({int(d)}, {i + 1})"
                     for i, d in enumerate(pinned_ids))
    return f"""
WITH org AS ({org}),
pins(doc_id, pin_pos) AS (VALUES {pins}),
p AS (
  SELECT pins.doc_id, 0 AS sec, pins.pin_pos AS o1, 0.0 AS o2,
         org.raw_score AS score, 1 AS pinned
  FROM pins
  JOIN (SELECT doc_id FROM {table}) live USING (doc_id)
  LEFT JOIN org USING (doc_id)
), o AS (
  SELECT doc_id, 1 AS sec, 0 AS o1, -raw_score AS o2,
         raw_score AS score, 0 AS pinned
  FROM org WHERE doc_id NOT IN (SELECT doc_id FROM pins)
  ORDER BY raw_score DESC, doc_id ASC LIMIT {int(k)}
), u AS (
  SELECT * FROM p UNION ALL SELECT * FROM o
), r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sec, o1, o2, doc_id) AS rank,
         pinned, score
  FROM u
)
SELECT doc_id, rank::BIGINT AS rank, pinned::INTEGER AS pinned,
       CAST(round(score * 10000) AS BIGINT) AS score_e4
FROM r WHERE rank <= {int(k)} ORDER BY rank"""


def weighted_avg_sql(query: str, attr: str, weight_attr: str,
                     table: str = "documents", field_cols: tuple = (),
                     expand_fields: bool = False) -> str:
    """Mirror of ``aggs.weighted_avg_agg``: integer-space Σ(v·w) and Σw,
    f64 division last."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    return (
        f"SELECT count(*)::BIGINT AS n,\n"
        f"       sum({attr} * {weight_attr})::DOUBLE AS vw_sum,\n"
        f"       sum({weight_attr})::DOUBLE AS w_sum,\n"
        f"       sum({attr} * {weight_attr})::DOUBLE"
        f" / sum({weight_attr})::DOUBLE AS wavg\n"
        f"FROM ({j}) j"
    )


def matrix_stats_sql(query: str, attrs: list, table: str = "documents",
                     field_cols: tuple = (),
                     expand_fields: bool = False) -> str:
    """Mirror of ``aggs.matrix_stats_agg``: the same integer-space raw
    sums and the LITERAL same f64 derivation shapes (ssx/n − (sx/n)²,
    sp/n − mx·my, cov/sqrt(vx·vy)), e6-rounded — IEEE-deterministic so
    the rounded moments match bit-for-bit."""
    j = _match_join_cte(query, table, field_cols, expand_fields)
    sums = ["count(*)::BIGINT AS n"]
    for a in attrs:
        sums.append(f"sum({a}) AS s_{a}")
        sums.append(f"sum({a} * {a}) AS ss_{a}")
    pairs = []
    for i, ax in enumerate(attrs):
        for ay in attrs[i + 1:]:
            sums.append(f"sum({ax} * {ay}) AS sp_{ax}_{ay}")
            pairs.append((ax, ay))
    parts = []
    for ax, ay in pairs:
        mx = f"(s_{ax}::DOUBLE / n)"
        my = f"(s_{ay}::DOUBLE / n)"
        vx = f"(ss_{ax}::DOUBLE / n - {mx} * {mx})"
        vy = f"(ss_{ay}::DOUBLE / n - {my} * {my})"
        cov = f"(sp_{ax}_{ay}::DOUBLE / n - {mx} * {my})"
        parts.append(
            f"SELECT '{ax}' AS attr_x, '{ay}' AS attr_y, n,\n"
            f"  round({mx}, 6) AS mean_x, round({my}, 6) AS mean_y,\n"
            f"  round({vx}, 6) AS var_x, round({vy}, 6) AS var_y,\n"
            f"  round({cov}, 6) AS cov,\n"
            f"  round(CASE WHEN {vx} * {vy} > 0\n"
            f"        THEN {cov} / sqrt({vx} * {vy}) END, 6) AS corr\n"
            f"FROM one"
        )
    return (f"WITH one AS (SELECT {', '.join(sums)} FROM ({j}) j)\n"
            + "\nUNION ALL\n".join(parts)
            + "\nORDER BY attr_x, attr_y")


def adjacency_matrix_sql(query: str, filters: dict, sep: str = "&",
                         table: str = "documents", field_cols: tuple = (),
                         expand_fields: bool = False) -> str:
    """Mirror of ``aggs.adjacency_matrix_agg``: scalar counts for every
    name and every name-sorted pair intersection, non-empty only."""
    main = bm25_scores_sql(query, table, field_cols=field_cols,
                           expand_fields=expand_fields)
    names = sorted(filters)
    subs = {n: bm25_scores_sql(filters[n], table, field_cols=field_cols,
                               expand_fields=expand_fields)
            for n in names}
    parts = []
    for n in names:
        parts.append(
            f"SELECT {_sql_lit(n)} AS key,\n"
            f"  (SELECT count(*) FROM ({main}) m JOIN ({subs[n]}) s "
            f"USING (doc_id))::BIGINT AS n")
    for i, na in enumerate(names):
        for nb in names[i + 1:]:
            parts.append(
                f"SELECT {_sql_lit(na + sep + nb)} AS key,\n"
                f"  (SELECT count(*) FROM ({main}) m"
                f" JOIN ({subs[na]}) s1 USING (doc_id)"
                f" JOIN ({subs[nb]}) s2 USING (doc_id))::BIGINT AS n")
    return ("SELECT key, n FROM (\n" + "\nUNION ALL\n".join(parts)
            + "\n) b WHERE n > 0 ORDER BY key ASC")


def sampler_agg_sql(query: str, attr: str, shard_size: int = 100,
                    table: str = "documents", field_cols: tuple = (),
                    expand_fields: bool = False) -> str:
    """Mirror of ``aggs.sampler_agg``: terms counts over the global
    top-``shard_size`` matches in exact (raw score desc, doc_id asc)
    order."""
    inner = bm25_scores_sql(query, table, limit=int(shard_size),
                            field_cols=field_cols,
                            expand_fields=expand_fields)
    return (
        f"SELECT d.{attr} AS key, count(*)::BIGINT AS n\n"
        f"FROM ({inner}) m JOIN {table} d USING (doc_id)\n"
        f"GROUP BY 1 ORDER BY n DESC, key ASC"
    )


def classic_scores_sql(query: str, table: str = "documents",
                       limit: int | None = None, field_cols: tuple = (),
                       expand_fields: bool = False) -> str:
    """Mirror of ``SearchEngine.search_classic_df`` — Lucene
    ClassicSimilarity (the reference's DefaultSimilarity ranking; see
    query/classic.py): e4-rounded scores with the EXACT byte315 norm
    quantization reproduced as "largest decodable value <= float32
    lengthNorm" over the embedded 256-value decode table (truncation ==
    round-toward-zero onto the 3-bit-mantissa grid, verified exhaustively
    in tests). idf/queryNorm/coord fold over the same term sets as the
    engine: queryNorm over matched terms, coord denominator over ALL
    parsed terms (the qt rows)."""
    from .query.classic import NORM_DECODE

    inc, pinc, _exc, _pexc = _split_chunks(query, field_cols, expand_fields)
    vals = ", ".join(repr(float(v)) for v in NORM_DECODE)
    sql = base_cte(table, field_cols) + f""",
qt AS (
  {_qt_cte(inc, pinc)}
),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
idfq AS (
  SELECT qt.term, qt.boost,
         (1.0 + ln(s.N / (dft.df + 1.0))) AS idf
  FROM qt JOIN dft USING (term) CROSS JOIN stats s
),
qn AS (
  SELECT 1.0 / sqrt(sum((idf * boost) * (idf * boost))) AS qnorm FROM idfq
),
normv AS (SELECT unnest(ARRAY[{vals}]::DOUBLE[]) AS v),
dnorm AS (
  SELECT dl.doc_id,
         (SELECT max(v) FROM normv
          WHERE v <= CAST(1.0 / sqrt(dl.dl::DOUBLE) AS REAL)) AS nrm
  FROM dl
),
contrib AS (
  SELECT tf.doc_id,
         i.idf * i.idf * i.boost * qn.qnorm
         * sqrt(tf.tf::DOUBLE) * d.nrm AS c,
         tf.term AS term
  FROM tf
  JOIN idfq i USING (term)
  JOIN dnorm d ON d.doc_id = tf.doc_id
  CROSS JOIN qn
),
scored AS (
  SELECT doc_id,
         sum(c) * (count(DISTINCT term)::DOUBLE
                   / (SELECT count(*) FROM qt)) AS raw_score,
         count(DISTINCT term)::INT AS n_match
  FROM contrib{_exclusion_clause(query, field_cols, expand_fields)}
  GROUP BY doc_id
)
SELECT doc_id, CAST(round(raw_score * 10000) AS BIGINT) AS score_e4, n_match
FROM scored"""
    if limit is not None:
        sql += f"\nORDER BY raw_score DESC, doc_id ASC LIMIT {int(limit)}"
    return sql
