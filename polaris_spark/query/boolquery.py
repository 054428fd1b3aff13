"""Lucene-classic boolean query trees: parser + AST.

The reference accepts full classic-parser composition — explicit ``AND`` /
``OR`` / ``NOT`` (also ``&&``/``||``/``!``), ``+required`` / ``-prohibited``
clause prefixes, parenthesized groups, clause boosts, wildcard and fuzzy
terms — through ``MultiFieldQueryParser`` (reference
sourcedb/SourceDbImpl.java:135-139). This module is the shared front half of
that surface: one pure-Python parser used by BOTH the Spark engine (which
resolves leaves against the index dictionary) and the DuckDB oracle builder
(which resolves the same leaves into SQL term-set subqueries), so the two
sides can never drift on query syntax.

Grammar (standard precedence — a DOCUMENTED deviation from Lucene's
stateful single-level parse, which re-interprets earlier clauses when it
meets an operator; ours is the conventional reading):

    expr     := or_list
    or_list  := and_list ( [OR] and_list )*      # adjacency = OR (SHOULD)
    and_list := clause ( AND clause )*
    clause   := [ '+' | '-' | NOT | '!' ] atom [ '^' number ]
    atom     := '(' expr ')' [ '~' int ] [ '^' number ] | TERM

A ``~N`` suffix on a parenthesized group is Lucene's classic-parser
``minimumNumberShouldMatch``: at least N of the group's SHOULD clauses
must match (in addition to every MUST clause). ``(a b c)~2`` over a flat
OR group is exactly the engine's flat ``min_match=2``. Glued suffixes
(``)~2^3`` lexes as one token) are handled; per Lucene, msm greater than
the number of SHOULD clauses matches nothing, and msm with NO should
clauses matches nothing. Nested suffixes on collapsing groups
(``((a b c)~3)~2``) OVERWRITE inner-first — the same behavior as Lucene's
classic parser, whose single-clause group returns the inner BooleanQuery
unwrapped so the outer ``~2`` calls setMinimumNumberShouldMatch on the
SAME query object.

Occur semantics (Lucene BooleanQuery):
- ``and_list`` children are MUST (``-``/NOT children MUST_NOT).
- ``or_list`` children are SHOULD; ``+`` lifts one to MUST, ``-``/NOT to
  MUST_NOT (exactly Lucene's reading of ``a OR NOT b`` → SHOULD a,
  MUST_NOT b on one level).
- A node matches iff all MUST children match, no MUST_NOT child matches,
  and — when it has no MUST children — at least one SHOULD child matches.
  With ``msm`` set (``(...)~N``), "at least one" hardens to "at least N",
  and the requirement binds EVEN IF the node has MUST children (Lucene's
  minimumNumberShouldMatch).
  A group with neither MUST nor SHOULD children (pure negation, ``(-a)``)
  matches nothing, like Lucene's all-prohibited BooleanQuery.
- Score(doc) = Σ contributions of matching MUST/SHOULD descendants whose
  every ancestor subtree also matches (Lucene: each scorer sums its
  matching sub-scorers) — leaves inside a MUST_NOT subtree match-test only,
  never score.

Leaves are SYMBOLIC here (kind + payload + boost); resolution — dictionary
expansion for wildcard/fuzzy, tokenization, multi-field OR — happens in the
consumer. A chunk that tokenizes to several terms becomes ONE leaf matching
ANY of them (our documented set-semantics reading of multi-token chunks).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# One token = a slash-delimited regexp chunk (optionally [+-!]-prefixed,
# field-qualified and ^boost-suffixed — its parens/operators are pattern
# text, exactly how Lucene's lexer treats a REGEXPTERM), a paren, or a run
# of non-space non-paren chars. The regexp alternative must come first so
# `/s(ca|pa)n/` stays ONE chunk instead of splitting at its parens.
_TOKEN_RE = re.compile(
    r"[+\-]?(?:[^\s()/:]+:)?/(?:\\.|[^\\/\s])+/(?:\^[^\s()]+)?"
    r"|\(|\)|(?:\\.|[^\s()])+"
)
_KW_AND = {"AND", "&&"}
_KW_OR = {"OR", "||"}
_KW_NOT = {"NOT", "!"}

# ---- TermRangeQuery (classic `field:[a TO b]` / `{a TO b}`) --------------
# Range syntax spans whitespace, so both tokenizers pre-join it: internal
# gaps become \x00 (never in user text), making the construct ONE chunk.
_RANGE_FOLD_RE = re.compile(
    r"((?:[^\s()\[\]{}:]+:)?[\[\{])\s*([^\s\]\}]+)\s+TO\s+([^\s\]\}]+)\s*([\]\}])"
)
_RANGE_RE = re.compile(
    r"^(?:(?P<f>[^\s:\[\]{}]+):)?(?P<o>[\[\{])(?P<lo>[^\x00]+)\x00TO\x00"
    r"(?P<hi>[^\x00]+)(?P<c>[\]\}])$"
)


def fold_ranges(query: str) -> str:
    """Join each ``[a TO b]`` / ``{a TO b}`` construct (optionally
    ``field:``-qualified) into a single whitespace-free chunk with \\x00
    placeholders, so whitespace splitting keeps it intact."""
    return _RANGE_FOLD_RE.sub("\\1\\2\x00TO\x00\\3\\4", query or "")


def parse_range(body: str):
    """A folded range chunk → ``(field, lo, hi, inc_lo, inc_hi)`` or None.

    ``field`` is the raw qualifier or None (bare). Bounds are RAW —
    case-sensitive, unanalyzed, exactly like our prefix/wildcard/fuzzy
    expansions (Lucene's classic parser likewise leaves range endpoints
    unanalyzed by default, ``analyzeRangeTerms=false``). A ``*`` endpoint
    means unbounded (open range), → None. ``[`` / ``]`` are inclusive,
    ``{`` / ``}`` exclusive — mixed forms allowed, exactly Lucene
    TermRangeQuery."""
    m = _RANGE_RE.match(body or "")
    if not m:
        return None
    lo = None if m.group("lo") == "*" else m.group("lo")
    hi = None if m.group("hi") == "*" else m.group("hi")
    return (m.group("f"), lo, hi, m.group("o") == "[", m.group("c") == "]")


# ---- PhraseQuery (classic `"a b"` / `"a b"~N`, inside boolean trees) -----
# A quoted phrase spans whitespace, so the tokenizer pre-folds it exactly
# like ranges: whitespace (and parens, which the lexer would otherwise split
# on) inside balanced double quotes becomes \x00, making the construct ONE
# whitespace-free chunk `"a\x00b"~2^3` the clause machinery (prefix strip,
# boost strip) already handles.
_PHRASE_FOLD_RE = re.compile(r'(?<!\\)"[^"]*"')
_PHRASE_RE = re.compile(
    r'^(?:(?P<f>[^\s:"]+):)?"(?P<body>[^"]*)"(?:~(?P<slop>\d+))?$'
)


def fold_phrases(query: str) -> str:
    """Replace whitespace and parens inside each balanced double-quoted
    span with \\x00 so whitespace splitting keeps the phrase intact (parens
    are phrase text — the analyzer drops them — not group syntax). Runs
    BEFORE :func:`fold_ranges` so quoted text can never be range-folded.
    An unbalanced trailing quote is left as-is and rejected downstream."""
    return _PHRASE_FOLD_RE.sub(
        lambda m: re.sub(r"[\s()]", "\x00", m.group(0)), query or ""
    )


def parse_phrase(body: str):
    """A folded phrase chunk → ``(field, phrase_text, slop)`` or None.

    ``field`` is the raw qualifier or None (bare). ``phrase_text`` has its
    \\x00 placeholders restored to spaces; tokenization (base-token
    sequence, order and duplicates kept) happens in the consumer. ``slop``
    is the classic ``~N`` suffix, 0 when absent (exact PhraseQuery)."""
    m = _PHRASE_RE.match(body or "")
    if not m:
        return None
    return (m.group("f"), m.group("body").replace("\x00", " "),
            int(m.group("slop") or 0))


# ---- RegexpQuery (classic `/pattern/`, optionally `field:/pattern/`) -----
# Lucene's classic parser (4.0+) reads a slash-delimited chunk as a
# RegexpQuery over the indexed terms; the reference's MultiFieldQueryParser
# accepts the syntax (sourcedb/SourceDbImpl.java:135-139). A chunk is one
# whitespace-free token, so the pattern itself cannot contain whitespace —
# same restriction every other classic multi-term construct has here.
_REGEXP_RE = re.compile(r"^(?:(?P<f>[^\s:/]+):)?/(?P<p>.+)/$")

# characters that end the pushable literal prefix of a regex (union of the
# Java and RE2 metacharacter sets plus backslash — anything after the first
# of these may not be literal)
_RE_META = set('\\.?*+|(){}[]"~^$<>#@&')


def parse_regexp(body: str):
    """A regexp chunk → ``(field, pattern)`` or None.

    ``field`` is the raw qualifier or None (bare). ``pattern`` is the RAW
    text between the outer slashes — unanalyzed and case-sensitive like
    every other multi-term expansion; it is later matched ANCHORED
    (``^pat$``) against whole index terms, exactly Lucene RegexpQuery's
    implicit anchoring. The supported dialect is the Java-regex ∩ RE2
    common subset (literals, ``.``, ``*``, ``+``, ``?``, ``|``, ``()``,
    ``[]`` classes, ``{m,n}`` intervals) — wider than Lucene's own
    operators but identical between the Spark engine (``rlike``) and the
    DuckDB oracle (``regexp_matches``) by construction."""
    m = _REGEXP_RE.match(body or "")
    if not m:
        return None
    return (m.group("f"), m.group("p"))


def regexp_literal_prefix(pattern: str) -> str:
    """Longest leading run of literal characters that is a NECESSARY
    condition for a match — the pushable ``StartsWith`` bound for the
    dictionary scan (stops at the first metacharacter of either regex
    dialect). Two soundness guards: a TOP-LEVEL alternation makes the
    leading literal optional (``err|w.b`` matches ``web`` via the second
    branch → no pushable bound; a group-scoped ``s(ca|pa)n`` keeps ``s`` —
    the branch choice cannot bypass literals before the group), and a
    quantifier that can erase its atom (``*``, ``?``, ``{0,n}`` —
    conservatively any ``{``) drops the run's last character (``abc*``
    matches ``ab``). ``+`` keeps the run: it requires ≥1 occurrence."""
    depth, in_class, esc = 0, False, False
    for ch in pattern:
        if esc:
            esc = False
        elif ch == "\\":
            esc = True
        elif in_class:
            in_class = ch != "]"
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return ""
    out = []
    for ch in pattern:
        if ch in _RE_META:
            if ch in "*?{" and out:
                out.pop()
            break
        out.append(ch)
    return "".join(out)


@dataclass
class Leaf:
    """Unresolved query clause.

    kind ∈ {"chunk", "prefix", "fuzzy", "wildcard", "range", "regexp",
    "phrase"}:
    - "range": classic TermRangeQuery ``field:[a TO b]``; payload is
      :func:`parse_range`'s ``(field, lo, hi, inc_lo, inc_hi)``.
    - "regexp": classic slash-delimited RegexpQuery ``/pat/`` /
      ``field:/pat/``; payload is the raw chunk (``field:`` kept).
    - "phrase": classic quoted PhraseQuery ``"a b"`` / ``"a b"~N``;
      payload is :func:`parse_phrase`'s ``(field, phrase_text, slop)``.

    ``group_field`` carries the classic field-group scope (``f:(a OR b)``
    sets it to ``f`` on every leaf of the group that has no explicit field
    of its own — inner ``f2:x`` wins over the enclosing group, like
    Lucene). Resolution (engine / oracle) applies it per leaf kind.
    - "chunk": plain text to tokenize (may be ``field:value``); payload is
      the raw body string.
    - "prefix": trailing-star-only wildcard; payload is the raw prefix
      (``field:`` kept if field-qualified).
    - "fuzzy": payload is (head, max_edits).
    - "wildcard": general ``*``/``?`` pattern; payload is the raw pattern
      (``field:`` kept if field-qualified).
    """

    kind: str
    payload: object
    boost: float = 1.0
    group_field: str | None = None


@dataclass
class Node:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    msm: int = 0  # minimumNumberShouldMatch, classic `(...)~N` (0 = off)

    def scale_boost(self, f: float) -> None:
        for ch in (*self.must, *self.should, *self.must_not):
            ch.scale_boost(f)


def _leaf_scale(self: Leaf, f: float) -> None:
    self.boost *= f


Leaf.scale_boost = _leaf_scale  # type: ignore[attr-defined]


def _set_group_field(root, fld: str) -> None:
    """Scope a parsed group to ``fld`` (classic ``f:(...)``): set on every
    descendant leaf that has no field of its own yet — nested groups and
    explicitly-fielded leaves win."""
    if isinstance(root, Leaf):
        if root.group_field is None:
            root.group_field = fld
        return
    for ch in (*root.must, *root.should, *root.must_not):
        _set_group_field(ch, fld)


# ---- Escapes (classic `\c` — c reads as literal text) ---------------------
# During classification each `\c` is replaced by a private-use sentinel so
# the syntax sniffers (boost/phrase/range/regexp/fuzzy/wildcard) only see
# UNESCAPED specials; payloads are decoded (backslash dropped) on the way
# out. DOCUMENTED deviation from Lucene: an escape forces the whole token
# to read as plain text (or a phrase, when unescaped quotes delimit one) —
# mixing escapes with LIVE multi-term syntax in one token (`te\*t*`) is not
# supported; the token reads literal.
_ESC_RE = re.compile(r"\\(.)")
_SENT_BASE = 0xE000  # unicode private-use area


def _esc_encode(s: str) -> str:
    return _ESC_RE.sub(lambda m: chr(_SENT_BASE + ord(m.group(1))), s)


def esc_decode(s: str) -> str:
    """Sentinels → their literal characters (exported: consumers may hold
    encoded text only if they sliced payloads themselves)."""
    return "".join(chr(ord(c) - _SENT_BASE)
                   if _SENT_BASE <= ord(c) < _SENT_BASE + 0x110 else c
                   for c in s)


def has_operators(query: str) -> bool:
    """True when the query uses boolean-tree syntax the flat parser can't
    express: parens, explicit AND/OR/NOT keywords, '+' clause prefixes, or
    a quoted phrase (phrase-in-tree composition — callers route a LONE
    ``"a b"``/``"a b"~N`` to the dedicated phrase path first, via
    ``parse_phrase_query``, so it never reaches this check)."""
    for tok in _TOKEN_RE.findall(fold_phrases(query or "")):
        if tok in ("(", ")") or tok in _KW_AND or tok in _KW_OR \
                or tok in _KW_NOT or (tok.startswith("+") and len(tok) > 1) \
                or '"' in tok or "\\" in tok:
            return True
    return False


def classify_chunk(body: str) -> Leaf:
    """One non-operator chunk → symbolic Leaf (boost suffix stripped here).

    Order of sniffing mirrors the flat parser: boost suffix, fuzzy suffix,
    trailing-star-only prefix, general wildcard, plain chunk. Leading
    wildcards are rejected like Lucene's default
    (``allowLeadingWildcard=false``)."""
    if "\\" in body:
        # escapes force a literal reading (module-level deviation note):
        # sentinel-encode so only UNESCAPED ^/quotes act as syntax, then
        # classify as phrase (unescaped quotes) or plain chunk
        enc = _esc_encode(body)
        boost = 1.0
        if "^" in enc:
            head, _, tail = enc.rpartition("^")
            try:
                boost = float(tail)
                enc = head
            except ValueError:
                pass
        ph = parse_phrase(enc)
        if ph is not None:
            f, btxt, slop = ph
            return Leaf("phrase",
                        (esc_decode(f) if f else f, esc_decode(btxt), slop),
                        boost)
        if '"' in enc:
            raise ValueError(
                f"unbalanced or malformed quoted phrase near {body!r}"
            )
        return Leaf("chunk", esc_decode(enc), boost)
    boost = 1.0
    if "^" in body:
        head, _, tail = body.rpartition("^")
        try:
            boost = float(tail)
            body = head
        except ValueError:
            pass  # not a boost suffix; '^' is punctuation
    ph = parse_phrase(body)
    if ph is not None:  # before everything: the body may hold ~ * ? [ /
        return Leaf("phrase", ph, boost)
    if '"' in body:
        raise ValueError(
            f"unbalanced or malformed quoted phrase near {body!r}"
        )
    rng = parse_range(body)
    if rng is not None:  # before wildcard sniffing: '[a TO *]' carries '*'
        return Leaf("range", rng, boost)
    if parse_regexp(body) is not None:  # before wildcard: /p.*t/ has '*'
        return Leaf("regexp", body, boost)
    fz = _fuzzy_suffix(body)
    if fz is not None:
        return Leaf("fuzzy", fz, boost)
    if len(body) > 1 and body.endswith("*") and not _has_wild(body[:-1]):
        return Leaf("prefix", body[:-1], boost)
    if _has_wild(body):
        f, _, rest = body.partition(":")
        pat = rest if rest else body
        if pat and pat[0] in "*?":
            raise ValueError(
                f"leading wildcard not allowed: {body!r} "
                "(Lucene classic default: allowLeadingWildcard=false)"
            )
        return Leaf("wildcard", body, boost)
    return Leaf("chunk", body, boost)


def _has_wild(s: str) -> bool:
    return "*" in s or "?" in s


def _fuzzy_suffix(body: str):
    # duplicated tiny helper (engine imports the canonical one; this module
    # must stay importable without Spark). One field: qualifier is legal
    # (classic `title:roam~2`); multi-colon heads (URLs) read as chunks.
    if "~" not in body or body.startswith("~"):
        return None
    head, _, tail = body.rpartition("~")
    if "~" in head or "*" in head or "?" in head:
        return None
    if head.count(":") > 1 or head.startswith(":") or head.endswith(":"):
        return None
    if ":" in head and "/" in head:
        return None  # single-colon URL-ish text — reads as a plain chunk
    if tail == "":
        return head, 2
    if tail in ("1", "2"):
        return head, int(tail)
    return None


def _parse_group_suffix(tok: str):
    """``~2`` / ``^3`` / ``~2^3`` / ``^3~2`` → (msm, boost) with None for
    the absent half; None when the token is not a pure group suffix (then
    it stays unconsumed, mirroring the old '^garbage' behavior)."""
    msm = boost = None
    i = 0
    while i < len(tok):
        if tok[i] == "~" and msm is None:
            j = i + 1
            while j < len(tok) and tok[j].isdigit():
                j += 1
            if j == i + 1:
                return None
            msm = int(tok[i + 1:j])
            i = j
        elif tok[i] == "^" and boost is None:
            j = i + 1
            while j < len(tok) and tok[j] not in "~^":
                j += 1
            try:
                boost = float(tok[i + 1:j])
            except ValueError:
                return None
            i = j
        else:
            return None
    return msm, boost


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # ---------------------------------------------------------- grammar

    def expr(self) -> Node | Leaf:
        prefixed = self.or_items()
        return _fold_or(prefixed)

    def or_items(self):
        items = [self.and_list()]
        while True:
            t = self.peek()
            if t is None or t == ")":
                break
            if t in _KW_OR:
                self.next()
                t = self.peek()
                if t is None or t == ")":
                    raise ValueError("dangling OR")
            items.append(self.and_list())
        return items

    def and_list(self):
        items = [self.clause()]
        while self.peek() in _KW_AND:
            self.next()
            if self.peek() is None or self.peek() == ")":
                raise ValueError("dangling AND")
            items.append(self.clause())
        if len(items) == 1:
            return items[0]
        node = Node()
        for prefix, child in items:
            (node.must_not if prefix == "-" else node.must).append(child)
        if not node.must:
            raise ValueError("AND group with only prohibited clauses")
        return (None, node)

    def clause(self):
        prefix = None
        t = self.peek()
        if t in _KW_NOT:
            self.next()
            prefix = "-"
        elif t in ("+", "-"):
            # standalone prefix token (e.g. '- (a b)' or the '-' the lexer
            # splits off '-(group)')
            self.next()
            prefix = t
        elif (t is not None and t[0] in "+-" and len(t) > 1
              and t not in _KW_AND and t not in _KW_OR):
            prefix = t[0]
            self.toks[self.i] = t[1:]  # atom parses the stripped body
        return (prefix, self.atom())

    def atom(self):
        t = self.peek()
        if t is None or t == ")":
            raise ValueError("expected a clause")
        grp_field = None
        if (t.endswith(":") and len(t) > 1 and ":" not in t[:-1]
                and not t[:-1].endswith("\\")  # `f\:` is literal, not a group
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1] == "("):
            # classic field group `f:(...)` — the lexer split `f:` off the
            # paren; scope the group's leaves to f below
            grp_field = t[:-1]
            self.next()
            t = self.peek()
        if t == "(":
            self.next()
            inner = self.expr()
            if self.next() != ")":
                raise ValueError("unbalanced parentheses")
            # group suffixes: `^B` boost and/or `~N` msm
            # (minimumNumberShouldMatch, classic `(a b c)~2`), possibly
            # glued into one token (`)~2^3`); '^garbage' stays unconsumed
            # like before
            msm_val = None
            while True:
                nxt = self.peek()
                parsed = (_parse_group_suffix(nxt)
                          if nxt and nxt[0] in "^~" else None)
                if parsed is None:
                    break
                self.next()
                sm, bo = parsed
                if bo is not None:
                    inner.scale_boost(bo)
                if sm is not None and msm_val is None:
                    msm_val = sm
            if msm_val:
                if isinstance(inner, Leaf):
                    # `(term)~N`: a one-SHOULD-clause BooleanQuery — msm
                    # ≥ 2 then matches nothing, exactly Lucene
                    inner = Node(should=[inner], msm=msm_val)
                else:
                    inner.msm = msm_val
            if grp_field is not None:
                _set_group_field(inner, grp_field)
            return inner
        self.next()
        return classify_chunk(t)


def _fold_or(prefixed: list) -> Node | Leaf:
    if len(prefixed) == 1 and prefixed[0][0] is None:
        return prefixed[0][1]
    node = Node()
    for prefix, child in prefixed:
        if prefix == "+":
            node.must.append(child)
        elif prefix == "-":
            node.must_not.append(child)
        else:
            node.should.append(child)
    return node


def parse(query: str) -> Node | Leaf | None:
    """Query string → AST root (Node or single Leaf), or None when empty."""
    tokens = _TOKEN_RE.findall(fold_ranges(fold_phrases(query)))
    if not tokens:
        return None
    p = _Parser(tokens)
    root = p.expr()
    if p.peek() is not None:
        raise ValueError(f"unexpected token {p.peek()!r}")
    return root


def iter_leaves(root, scoring: bool = True):
    """Yield (leaf, scoring) pairs; ``scoring`` is False anywhere below a
    MUST_NOT edge (those leaves match-test but never contribute score)."""
    if isinstance(root, Leaf):
        yield root, scoring
        return
    for ch in root.must:
        yield from iter_leaves(ch, scoring)
    for ch in root.should:
        yield from iter_leaves(ch, scoring)
    for ch in root.must_not:
        yield from iter_leaves(ch, False)
