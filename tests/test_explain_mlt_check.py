"""explain (IndexSearcher.explain analog), MoreLikeThis, and the
CheckIndex-analog integrity verifier.

- explain: per-term contributions sum to the search() score BIT-exactly
  (same float64 factors in the same term order); excluded or non-matching
  docs explain to [].
- MoreLikeThis: driver path ≡ distributed path; the source doc never
  appears in its own neighbors; term selection follows the tf·idf spec.
- check_index: a fresh index verifies clean (all-zero violations over the
  FIXED inventory shared with gate.INDEX_CHECKS); targeted corruptions of
  the dictionary, doc_stats, completion table, and a postings blob are
  each detected by their own check.
"""

import os
import shutil

import pytest

from polaris_spark.gate import INDEX_CHECKS
from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.check import check_index
from polaris_spark.query.engine import SearchEngine, _idf
from polaris_spark.synth import make_transcripts
from polaris_spark.tokenizer import tokenize


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("emc_idx"))
    docs = spark.createDataFrame(make_transcripts(n_turns=900, seed=5))
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                positions=True, store_text=True))
    return d


def _src_doc(spark, idx):
    """The min-doc_id stored row — the same deterministic pick as the
    more_like_this gate (oracle: min(doc_id))."""
    dm = spark.read.parquet(os.path.join(idx, "doc_map"))
    return dm.orderBy("doc_id").select("doc_id", "text").limit(1).collect()[0]


# ----------------------------------------------------------------- explain


def test_explain_sums_to_search_score_bitexact(spark, idx):
    eng = SearchEngine(spark, idx)
    q = "conkaconda muor kato"  # synthetic-vocab terms
    hits = eng.search(q, k=5)
    assert hits
    for h in hits:
        rows = eng.explain(q, h["doc_id"])
        assert rows == sorted(rows, key=lambda r: r["term"])
        s = 0.0
        for r in rows:
            s += r["contribution"]  # same term-ordered float64 association
        assert s == h["score"]  # BIT-exact, not approx
        assert len(rows) == h["n_match"]
        for r in rows:
            assert r["contribution"] == r["idf"] * r["boost"] * r["impact"]
            assert r["idf"] == _idf(eng.stats["N"], r["df"])


def test_explain_boost_and_absent_doc(spark, idx):
    eng = SearchEngine(spark, idx)
    top = eng.search("kato^2.5 muor", k=1)
    assert top
    rows = eng.explain("kato^2.5 muor", top[0]["doc_id"])
    by_term = {r["term"]: r for r in rows}
    if "kato" in by_term:
        assert by_term["kato"]["boost"] == 2.5
    # a doc matching no query term explains to []
    assert eng.explain("zzzznotaterm", 12345) == []


def test_explain_excluded_doc_empty(spark, idx):
    eng = SearchEngine(spark, idx)
    both = eng.search("kato muor", k=200, mode="or")
    doc = next((h["doc_id"] for h in both if h["n_match"] == 2), None)
    if doc is None:
        pytest.skip("corpus has no doc with both terms")
    assert eng.explain("kato -muor", doc) == []
    assert eng.explain("kato muor", doc)  # sanity: matches without the -


# ------------------------------------------------------------ MoreLikeThis


def test_mlt_select_terms_spec(spark, idx):
    eng = SearchEngine(spark, idx)
    text = _src_doc(spark, idx)["text"]
    sel = eng.mlt_select_terms(text, max_terms=5)
    assert 0 < len(sel) <= 5
    # independent spec: tf(text) × idf from the dictionary, desc, term asc
    from collections import Counter

    tf = Counter(tokenize(text))
    dic = {r["term"]: int(r["df"]) for r in
           spark.read.parquet(os.path.join(idx, "dictionary")).collect()}
    scored = sorted(
        (-(tf[t] * _idf(eng.stats["N"], dic[t])), t)
        for t in tf if t in dic
    )
    assert sel == [t for _s, t in scored[:5]]


def test_mlt_driver_equals_distributed_and_excludes_self(spark, idx):
    eng = SearchEngine(spark, idx)
    src = _src_doc(spark, idx)
    drv = eng.more_like_this(src["text"], k=10, max_terms=8,
                             exclude_doc_id=int(src["doc_id"]))
    dist = eng.more_like_this_df(src["text"], k=10, max_terms=8,
                                 exclude_doc_id=int(src["doc_id"])).collect()
    assert [(h["doc_id"], h["score"], h["n_match"]) for h in drv] == \
           [(r["doc_id"], r["score"], r["n_match"]) for r in dist]
    assert int(src["doc_id"]) not in {h["doc_id"] for h in drv}
    assert drv  # similar docs exist in a synthetic template corpus
    # without exclusion the source doc itself ranks (sanity of the knob)
    incl = eng.more_like_this(src["text"], k=None, max_terms=8)
    assert int(src["doc_id"]) in {h["doc_id"] for h in incl}


# -------------------------------------------------------------- CheckIndex


def test_check_clean_index_and_inventory(spark, idx):
    rep = check_index(spark, idx)
    assert rep["ok"], rep
    assert tuple(sorted(rep["checks"])) == tuple(sorted(INDEX_CHECKS))
    assert all(v == 0 for v in rep["checks"].values())


def _copy_index(idx, tmp_path, name):
    d = os.path.join(str(tmp_path), name)
    shutil.copytree(idx, d)
    return d


def test_check_detects_dictionary_mismatch(spark, idx, tmp_path):
    d = _copy_index(idx, tmp_path, "bad_dict")
    p = os.path.join(d, "dictionary")
    pdf = spark.read.parquet(p).toPandas()
    pdf.loc[0, "df"] = int(pdf.loc[0, "df"]) + 1
    shutil.rmtree(p)
    spark.createDataFrame(pdf).write.parquet(p)
    rep = check_index(spark, d)
    assert not rep["ok"]
    assert rep["checks"]["dict_congruence"] >= 1


def test_check_detects_doc_stats_and_completion(spark, idx, tmp_path):
    d = _copy_index(idx, tmp_path, "bad_ds")
    p = os.path.join(d, "doc_stats")
    pdf = spark.read.parquet(p).toPandas()
    shutil.rmtree(p)
    spark.createDataFrame(pdf.iloc[1:]).write.parquet(p)  # drop one doc
    cp = os.path.join(d, "completion")
    cpdf = spark.read.parquet(cp).toPandas()
    cpdf.loc[0, "term"] = "zzz_not_in_dictionary"
    shutil.rmtree(cp)
    spark.createDataFrame(cpdf).write.parquet(cp)
    rep = check_index(spark, d)
    assert rep["checks"]["doc_stats_n"] >= 1
    assert rep["checks"]["sum_dl"] >= 1
    assert rep["checks"]["completion_subset"] >= 1


def test_check_detects_corrupt_posting_blob(spark, idx, tmp_path):
    import pyarrow.parquet as pq

    d = _copy_index(idx, tmp_path, "bad_post")
    # corrupt the first row's tfs blob in one postings part file (truncate
    # to 0 bytes: decodes to an empty array → df_len violation; schema and
    # row count unchanged, so the scan itself still runs)
    target = None
    for root, _dirs, files in os.walk(os.path.join(d, "postings")):
        for f in files:
            if f.endswith(".parquet"):
                target = os.path.join(root, f)
                break
        if target:
            break
    assert target
    t = pq.read_table(target)
    import pyarrow as pa

    i = t.schema.get_field_index("tfs")
    col = t.column("tfs").to_pylist()
    col[0] = b""
    t = t.set_column(i, "tfs", pa.array(col, type=t.schema.field(i).type))
    pq.write_table(t, target)
    crc = os.path.join(os.path.dirname(target),
                       "." + os.path.basename(target) + ".crc")
    if os.path.exists(crc):  # stale Hadoop-local checksum would fail the read
        os.remove(crc)
    rep = check_index(spark, d)
    assert not rep["ok"]
    assert rep["checks"]["df_len"] + rep["checks"]["decode_error"] >= 1


def test_check_cli(spark, idx):
    """The `check` subcommand prints the report and exits 0 on clean."""
    from polaris_spark import cli

    rc = cli.main(["check", "--index", idx])
    assert rc == 0


def test_explain_rejects_tree_and_phrase_queries(spark, idx):
    """Operator queries must 400 at the surface, not silently flat-parse
    AND/OR as corpus tokens."""
    import pytest as _pt

    eng = SearchEngine(spark, idx)
    with _pt.raises(ValueError):
        eng.explain("kato AND muor", 1)
    with _pt.raises(ValueError):
        eng.explain('"kato muor"', 1)


def test_explain_degrades_malformed_operator_text(spark, idx):
    """Operator-LOOKING but malformed text (stray paren from a pasted
    corpus token) must flat-parse and explain — exactly the queries
    search_mixed serves via its ValueError fallover (regression: the
    daemon's /api/explain 400'd on 'ridash)' while /api/search served it)."""
    eng = SearchEngine(spark, idx)
    top = eng.search("kato)", k=1)
    assert top
    exp = eng.explain("kato)", top[0]["doc_id"])
    assert exp == eng.explain("kato", top[0]["doc_id"])
    assert sum(r["contribution"] for r in exp) == top[0]["score"]


def test_explain_bool_replays_tree_score_bitexact(spark, idx):
    """explain_bool: per-leaf decomposition whose kernel-order replay
    ('score') equals search_bool's score BIT-FOR-BIT, for trees with
    groups, msm, boosts, prohibits, and phrase leaves."""
    eng = SearchEngine(spark, idx)
    for q in ['kato AND (muor OR tyb*)^2 -ridash',
              '(kato muor tyb)~2',
              '"kato muor" OR kato',
              'kato OR NOT muor']:
        hits = eng.search_bool(q, k=5)
        if not hits:
            continue
        for h in hits[:3]:
            exp = eng.explain_bool(q, h["doc_id"])
            assert exp["matched"], (q, h)
            assert exp["score"] == h["score"], (q, h["doc_id"])
            # counted leaves are scoring, matched, ancestor-matched
            assert any(l["counts"] for l in exp["leaves"])
            for l in exp["leaves"]:
                if not l["matched"]:
                    assert l["contribution"] == 0.0
    # a doc matching a leaf but NOT the root: matched=False, score 0
    only_muor = ({r["doc_id"] for r in eng.search("muor", k=None)}
                 - {r["doc_id"] for r in eng.search("kato", k=None)})
    if only_muor:
        exp = eng.explain_bool("kato AND muor", sorted(only_muor)[0])
        assert exp["matched"] is False and exp["score"] == 0.0
        assert any(l["matched"] for l in exp["leaves"])
        assert all(not l["counts"] for l in exp["leaves"])
