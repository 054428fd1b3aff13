"""Lucene-classic boolean composition (MultiFieldQueryParser surface,
reference SourceDbImpl.java:135-139): parser AST, match semantics on a
hand-checked fixture, driver/distributed parity, wildcard+fuzzy legality
inside AND groups, DuckDB oracle parity, general ?/mid-* wildcards."""

import duckdb
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.boolquery import Leaf, Node, has_operators, parse
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "spark join merge"),
    (2, "spark join scan"),
    (3, "spark merge"),
    (4, "join merge scan"),
    (5, "spark sort"),
    (6, "merge sort scan"),
    (7, "spark join sort scan"),
    (8, "totally unrelated words"),
    (9, "spark spark join join merge"),
]


@pytest.fixture(scope="module")
def beng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bool_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    return c


# ------------------------------------------------------------- parser AST

def test_parser_shapes():
    r = parse("spark AND (join OR merge) -scan")
    assert isinstance(r, Node)
    assert len(r.should) == 1 and len(r.must_not) == 1
    inner = r.should[0]
    assert isinstance(inner, Node) and len(inner.must) == 2
    group = inner.must[1]
    assert isinstance(group, Node) and len(group.should) == 2

    r2 = parse("+spark join^2 -scan")
    assert len(r2.must) == 1 and len(r2.should) == 1 and len(r2.must_not) == 1
    assert r2.should[0].boost == 2.0

    r3 = parse("(a AND b)^3 OR c")
    assert r3.should[0].must[0].boost == 3.0

    assert isinstance(parse("solo"), Leaf)
    assert has_operators("a AND b") and has_operators("(a b)")
    assert has_operators("+a b") and not has_operators("a -b c^2")


def test_parser_field_groups():
    # classic field group f:(...) scopes every bare leaf inside
    r = parse("source:(a OR b*) x")
    grp, bare = r.should
    assert isinstance(grp, Node) and len(grp.should) == 2
    assert grp.should[0].group_field == "source"
    assert grp.should[1].group_field == "source"
    assert grp.should[1].kind == "prefix"
    assert bare.group_field is None

    # nested explicit field is kept on the leaf (resolution prefers it)
    r2 = parse("lang:(en OR source:src3)")
    inner = r2.should[1]
    assert inner.group_field == "lang" and inner.payload == "source:src3"

    # boost after the group still parses; scope survives
    r3 = parse("tool:(a b)^2")
    assert all(lf.group_field == "tool" and lf.boost == 2.0
               for lf in r3.should)

    # nested sub-group inherits the enclosing scope
    r4 = parse("tool:((a OR b) AND c)")
    leaves = [*r4.must[0].should, r4.must[1]]
    assert all(lf.group_field == "tool" for lf in leaves)

    # '"x y" z' is no longer here: quoted phrases are legal tree leaves
    # since round 3 (see test_bool_phrase.py)
    for bad in ["(a", "a)", "a AND", "a OR", '"x y', "*lead", "te*st AND *x"]:
        with pytest.raises(ValueError):
            parse(bad)


# ------------------------------------------------- match + score semantics

def _ids(hits):
    return {h["doc_id"] for h in hits}


def test_bool_match_semantics(beng):
    # spark AND (join OR merge) -scan:
    # must spark, must (join|merge), not scan → 1 (sjm), 3 (sm), 9 (ssjjm)
    assert _ids(beng.search_bool("spark AND (join OR merge) -scan", k=None)) \
        == {1, 3, 9}
    # +spark join: spark required, join optional → all spark docs
    assert _ids(beng.search_bool("+spark join", k=None)) == {1, 2, 3, 5, 7, 9}
    # pure OR == flat parser OR (same doc set)
    flat = _ids(beng.search("spark join", k=None))
    assert _ids(beng.search_bool("spark join", k=None)) == flat
    # a OR NOT b → SHOULD a, MUST_NOT b on one level (Lucene reading)
    assert _ids(beng.search_bool("spark OR NOT scan", k=None)) == {1, 3, 5, 9}
    # pure-negative group matches nothing
    assert beng.search_bool("(-spark)", k=None) == []
    # AND of absent term matches nothing
    assert beng.search_bool("spark AND zzzmissing", k=None) == []
    # nested: (spark AND sort) OR (merge AND scan)
    assert _ids(beng.search_bool("(spark AND sort) OR (merge AND scan)",
                                 k=None)) == {4, 5, 6, 7}


def test_group_msm_semantics(beng):
    """Classic `(...)~N` — minimumNumberShouldMatch on a parenthesized
    group — hand-checked on the fixture and pinned to the flat parser's
    min_match (they are the SAME semantics for a flat OR group)."""
    # >= 2 of {spark, join, merge}
    assert _ids(beng.search_bool("(spark join merge)~2", k=None)) \
        == {1, 2, 3, 4, 7, 9}
    # binds IN ADDITION to MUST (Lucene: msm hardens optional clauses)
    assert _ids(beng.search_bool("scan AND (spark join merge)~2", k=None)) \
        == {2, 4, 7}
    # msm > |should| matches nothing; msm with no optional clauses too
    assert beng.search_bool("(spark join)~3", k=None) == []
    assert beng.search_bool("(spark AND join)~1", k=None) == []
    # flat-OR equivalence: same docs, same scores up to the paths'
    # documented summation-association difference (flat: term-ordered
    # accumulation; tree: per-leaf sorted-term fold) — ids exact, scores
    # to 1e-12 relative
    tree = [(h["doc_id"], h["score"])
            for h in beng.search_bool("(spark join merge)~2", k=None)]
    flat = [(h["doc_id"], h["score"])
            for h in beng.search("spark join merge", k=None, min_match=2)]
    assert [d for d, _ in tree] == [d for d, _ in flat]
    for (_, s1), (_, s2) in zip(tree, flat):
        assert s1 == pytest.approx(s2, rel=1e-12)


def test_bool_scores_compose_from_flat(beng):
    # for docs matching everything, tree score == flat OR score of the leaves
    flat = {h["doc_id"]: h["score"] for h in beng.search("spark join", k=None)}
    tree = {h["doc_id"]: h["score"]
            for h in beng.search_bool("spark AND join", k=None)}
    for d, s in tree.items():
        assert s == pytest.approx(flat[d], rel=1e-12)
    # boost scales the leaf's contribution
    s_spark = {h["doc_id"]: h["score"] for h in beng.search("spark", k=None)}
    s_join = {h["doc_id"]: h["score"] for h in beng.search("join", k=None)}
    t2 = {h["doc_id"]: h["score"]
          for h in beng.search_bool("spark^2 AND join", k=None)}
    for d, s in t2.items():
        assert s == pytest.approx(2.0 * s_spark[d] + s_join[d], rel=1e-12)


def test_bool_driver_distributed_parity(beng):
    for q in ["(spark join merge)~2", "scan AND (spark join merge)~2",
              "spark AND (join OR merge) -scan", "+spark join^2 -scan",
              "(spark AND sort) OR (merge AND scan)",
              "spark AND (jo* OR merge~1)", "sp?rk OR scan",
              "(join merge)^2 AND NOT sort"]:
        a = [(h["doc_id"], h["score"], h["n_match"])
             for h in beng.search_bool(q, k=None)]
        b = [(r["doc_id"], r["score"], r["n_match"])
             for r in beng.search_bool_df(q, k=None).collect()]
        assert a == b, q
    # top-k agrees too
    a = beng.search_bool("spark join merge", k=3)
    b = [r.asDict() for r in beng.search_bool_df("spark join merge", k=3).collect()]
    assert [(x["doc_id"], x["score"]) for x in a] == \
        [(x["doc_id"], x["score"]) for x in b]


def test_wildcard_fuzzy_legal_under_and(beng):
    # the flat parser rejects wildcards under mode='and'; the tree expresses
    # them exactly (leaf matches ANY expansion — one Lucene clause)
    hits = _ids(beng.search_bool("spark AND jo*", k=None))
    assert hits == {1, 2, 7, 9}
    hits2 = _ids(beng.search_bool("spark AND merge~1", k=None))
    assert hits2 == {1, 3, 9}


def test_general_wildcards_flat_and_tree(beng):
    # ? single char, mid-string *
    inc, _ = beng.parse_query("sp?rk")
    assert inc == ["spark"]
    inc2, _ = beng.parse_query("s*t")
    assert set(inc2) == {"sort"}  # scan/spark/sort: only sort ends with t
    inc3, _ = beng.parse_query("s*a*")
    assert set(inc3) == {"scan", "spark"}
    with pytest.raises(ValueError, match="leading wildcard"):
        beng.search("*ark", k=None)
    with pytest.raises(ValueError, match="leading wildcard"):
        beng.search("?ark", k=None)
    # flat OR path scores them as expansions
    got = _ids(beng.search("sp?rk scan", k=None))
    assert got == _ids(beng.search("spark scan", k=None))


# ------------------------------------------------------- oracle parity

QUERIES = [
    "(spark join merge)~2",
    "scan AND (spark join merge)~2",
    "(spark join)~2^2 -scan",
    "spark AND (join OR merge) -scan",
    "+spark join^2 -scan",
    "(spark AND sort) OR (merge AND scan)",
    "spark AND (jo* OR merge~1)",
    "sp?rk OR s*t",
    "(join merge)^2 AND NOT sort",
    "spark OR NOT scan",
    "spark join merge",
    "(-spark)",
    "spark AND zzzmissing",
]


def test_bool_oracle_parity(beng, con):
    from polaris_spark.gate import bool_scores_sql

    for q in QUERIES:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in beng.search_bool(q, k=None)}
        want = set(con.execute(bool_scores_sql(q, table="fixture")).fetchall())
        assert got == want, q


def test_general_wildcard_oracle_parity(beng, con):
    from polaris_spark.gate import bm25_scores_sql

    for q in ["sp?rk scan", "s*t merge", "s*a* -join"]:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in beng.search(q, k=None)}
        want = set(con.execute(bm25_scores_sql(q, table="fixture")).fetchall())
        assert got == want, q


def test_parser_escapes():
    """Classic `\\c` escapes: an escape forces the token to read literal
    (documented deviation: escapes don't mix with live multi-term syntax
    in one token). Payloads come out decoded; the oracle shares them."""
    r = parse(r"foo\-bar")
    assert r.kind == "chunk" and r.payload == "foo-bar"
    # escaped '-' is not a prohibit: both children are MUST
    r = parse(r"\-term AND x")
    assert [c.payload for c in r.must] == ["-term", "x"]
    # escaped parens are text, not groups
    assert [l.payload for l in parse(r"\(a b\)").should] == ["(a", "b)"]
    # escaped star: literal chunk, not a wildcard/prefix
    assert parse(r"te\*t").kind == "chunk"
    # boost stays live after escaped content
    r = parse(r"foo\-bar^2")
    assert r.payload == "foo-bar" and r.boost == 2.0
    # escaped quotes are literal; unescaped quotes still make phrases
    assert parse(r"\"ab\"").payload == '"ab"'
    assert parse(r'"a \-b" AND c').must[0].payload == (None, "a -b", 0)
    # `f\:` before a paren is literal text, not a field group
    r = parse(r"f\: (x)")
    assert r.should[0].payload == "f:"
    # escapes route to the tree path
    assert has_operators(r"foo\-bar") and not has_operators("foo-bar")


def test_escape_oracle_parity(beng, con):
    from polaris_spark.gate import bool_scores_sql

    for q in [r"spark\-join AND merge", r"\-spark merge",
              r"spark AND \(join\)", r"\"spark\" scan",
              r"spark\:join^2 OR sort"]:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in beng.search_bool(q, k=None)}
        want = set(con.execute(bool_scores_sql(q, table="fixture")).fetchall())
        assert got == want, q


def test_parser_fuzz_only_valueerror():
    """Robustness contract the daemon relies on (server.py maps ValueError
    -> 400): no input, however malformed, may raise anything but
    ValueError from the classic parser. 30k seeded random strings over the
    full special-character alphabet."""
    import random

    from polaris_spark.query.boolquery import has_operators, parse

    random.seed(7)
    alpha = list('abc ()"~^*?-+:[]{}/\\.|&!05eANDORT')
    for _ in range(30000):
        s = "".join(random.choice(alpha)
                    for _ in range(random.randint(1, 24)))
        try:
            has_operators(s)
            parse(s)
        except ValueError:
            pass  # documented rejection of malformed classic syntax


def test_randomized_trees_vs_independent_python_oracle(beng):
    """200+ random classic boolean queries (AND/OR/adjacency, +/-/NOT,
    nested parens, ``(...)~N`` group msm, present AND absent terms): the
    engine's matched doc set must equal an INDEPENDENT Python evaluation
    of the documented occur truth table (boolquery module docstring) over
    the fixture — the randomized complement to the hand-checked goldens."""
    import random

    from polaris_spark.tokenizer import tokenize

    doc_toks = {i: set(tokenize(t)) for i, t in DOCS}
    vocab = sorted({t for s in doc_toks.values() for t in s}) + ["absentxyz"]

    def matches(node, toks):
        if isinstance(node, Leaf):
            return bool(set(tokenize(str(node.payload))) & toks)
        if any(matches(c, toks) for c in node.must_not):
            return False
        if not all(matches(c, toks) for c in node.must):
            return False
        if node.msm > 0 and not node.should:
            return False  # msm with no optional clauses (Lucene)
        n_hit = sum(matches(c, toks) for c in node.should)
        eff = node.msm if node.msm > 0 else (0 if node.must else 1)
        return n_hit >= eff

    rng = random.Random(11)

    def gen(depth):
        if depth == 0 or rng.random() < 0.4:
            return rng.choice(vocab)
        parts = []
        for _ in range(rng.randint(2, 3)):
            child = gen(depth - 1)
            if " " in child:
                child = f"({child})"
                if rng.random() < 0.25:  # classic group msm suffix
                    child += f"~{rng.randint(1, 3)}"
            parts.append(rng.choice(["", "", "", "+", "-", "NOT "]) + child)
        return rng.choice([" AND ", " OR ", " "]).join(parts)

    checked = 0
    for _ in range(300):
        q = gen(2)
        try:
            tree = parse(q)
        except ValueError:
            continue  # generator occasionally renders malformed prefixes
        if tree is None:
            continue
        want = {i for i, toks in doc_toks.items() if matches(tree, toks)}
        got = {h["doc_id"] for h in beng.search_bool(q, k=None)}
        assert got == want, (
            f"{q!r}: engine {sorted(got)} vs oracle {sorted(want)}")
        checked += 1
    assert checked >= 200


def test_nested_msm_overwrites_like_lucene(beng):
    """((a b c)~3)~2: the single-clause outer group collapses to the inner
    BooleanQuery (exactly Lucene's classic parser), so the outer suffix
    overwrites msm 3 -> 2."""
    r = parse("((spark join merge)~3)~2")
    assert isinstance(r, Node) and r.msm == 2
    assert _ids(beng.search_bool("((spark join merge)~3)~2", k=None)) == \
        _ids(beng.search_bool("(spark join merge)~2", k=None))


def test_fuzzy_url_chunks_stay_chunks():
    """Single-colon URL-ish text with a trailing '~' must read as a plain
    chunk (the ':'+'/' guard), not an unknown-field fuzzy probe."""
    from polaris_spark.query.boolquery import classify_chunk

    lf = classify_chunk("http://a.io/b~")
    assert lf.kind == "chunk"
    # a real fielded fuzzy still parses
    lf2 = classify_chunk("source:web~1")
    assert lf2.kind == "fuzzy" and lf2.payload == ("source:web", 1)
