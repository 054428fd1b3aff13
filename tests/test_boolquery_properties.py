"""Property-based invariants of the classic query parser
(polaris_spark/query/boolquery.py) — hypothesis-driven, no Spark.

The parser is THE shared front door: engine, oracle, daemon, batch and
percolation all route through it, so its totality and structural
invariants deserve fuzzing beyond the hand goldens in test_boolquery.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from polaris_spark.query.boolquery import (
    Leaf,
    Node,
    fold_phrases,
    fold_ranges,
    iter_leaves,
    parse,
)

# -------------------------------------------------- totality / no crashes

# printable junk incl. every operator char the grammar knows
_JUNK = st.text(
    alphabet=string.ascii_letters + string.digits + ' ()"~^*?:[]{}/\\+-._',
    max_size=80)


@settings(max_examples=300, deadline=None)
@given(_JUNK)
def test_parse_is_total(q):
    """parse() either returns a tree/None or raises ValueError — never any
    other exception, never hangs. (The engine catches ValueError and
    degrades to the flat parser, so ValueError IS part of the contract.)"""
    try:
        root = parse(q)
    except ValueError:
        return
    assert root is None or isinstance(root, (Node, Leaf))
    if root is not None:
        # every leaf is visitable and carries a known kind
        for leaf, _scoring in iter_leaves(root):
            assert leaf.kind in {"chunk", "prefix", "fuzzy", "wildcard",
                                 "range", "regexp", "phrase"}


@settings(max_examples=300, deadline=None)
@given(_JUNK)
def test_folds_are_stable(q):
    """The pre-tokenizer folds are idempotent (folding twice == once) —
    a non-idempotent fold would corrupt queries that legitimately contain
    \\x00-free quoted/range spans when composed."""
    fp = fold_phrases(q)
    assert fold_phrases(fp) == fp
    fr = fold_ranges(fp)
    assert fold_ranges(fr) == fr


# -------------------------------------------------- structured round-trip

_term = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


def _render(node, top=False) -> str:
    if isinstance(node, str):
        return node
    parts = (["+" + _render(c) for c in node["must"]]
             + [_render(c) for c in node["should"]]
             + ["-" + _render(c) for c in node["must_not"]])
    body = " ".join(parts)
    return body if top else f"({body})"


_tree = st.deferred(lambda: st.one_of(
    _term,
    st.fixed_dictionaries({
        "must": st.lists(_tree, max_size=2),
        "should": st.lists(_tree, min_size=1, max_size=3),
        "must_not": st.lists(_term, max_size=2),
    }),
))


def _expected_leaves(node):
    if isinstance(node, str):
        return [node]
    out = []
    for c in node["must"]:
        out.extend(_expected_leaves(c))
    for c in node["should"]:
        out.extend(_expected_leaves(c))
    for c in node["must_not"]:
        out.extend(_expected_leaves(c))
    return out


@settings(max_examples=200, deadline=None)
@given(_tree)
def test_generated_tree_round_trips(tree):
    """Render a random MUST/SHOULD/MUST_NOT tree to classic syntax, parse
    it back: the multiset of leaf terms survives, and scoring=False
    exactly for leaves under a MUST_NOT edge."""
    q = _render(tree, top=True)
    root = parse(q)
    if root is None:
        assert q.strip() == ""
        return
    got = sorted(leaf.payload for leaf, _s in iter_leaves(root)
                 if leaf.kind == "chunk")
    assert got == sorted(_expected_leaves(tree))
    # every leaf below a MUST_NOT edge is non-scoring
    neg = set()

    def _collect_neg(node):
        if isinstance(node, str):
            return
        for c in node["must_not"]:
            neg.update(_expected_leaves(c))
        for c in node["must"] + node["should"]:
            _collect_neg(c)

    _collect_neg(tree)
    for leaf, scoring in iter_leaves(root):
        if leaf.kind == "chunk" and leaf.payload in neg \
                and not scoring:
            neg.discard(leaf.payload)
    assert not neg, f"MUST_NOT leaves not marked non-scoring: {neg}"


# -------------------------------------------------- operator suffixes

@settings(max_examples=200, deadline=None)
@given(_term, st.integers(min_value=1, max_value=9),
       st.floats(min_value=0.1, max_value=9.9, allow_nan=False))
def test_group_suffixes_parse(t, msm, boost):
    """(a b c)~N and (a b c)^F parse to the msm/boost they spell, in
    either order, on any generated term."""
    root = parse(f"({t} {t}x {t}y)~{msm}")
    assert isinstance(root, Node) and root.msm == msm
    root2 = parse(f"({t} {t}x)^{round(boost, 2)}")
    leaves = [l for l, _s in iter_leaves(root2)]
    assert all(abs(l.boost - round(boost, 2)) < 1e-9 for l in leaves)
