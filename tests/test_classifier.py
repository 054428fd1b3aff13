"""Hashed multinomial NB classifier (the CCNet/GPT-3 trained-quality-
classifier slot): exact-formula parity vs a pure-Python reference,
collision behavior under a tiny feature space, the full score matrix,
and cross-engine hash agreement."""

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.classifier import duckdb_nb_sql, nb_score, nb_train
from polaris_spark.tokenizer import tokenize

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "le chat est sur le tapis", "fr"),
    (3, "the dog ate the bone", "en"),
    (4, "le chien mange le os", "fr"),
    (5, "the cat and the dog", "en"),
    (6, "le chat et le chien", "fr"),
    (7, "the the the cat", "en"),
    (8, "le le chat chat", "fr"),
]


def _feat(tok: str, B: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B


def _ref(B: int, alpha: float = 1.0):
    """Pure-Python NB: train on DOCS, score DOCS. Returns
    {doc_id: [(label, score) sorted (score desc, label asc)]}."""
    toks = {d: tokenize(t) for d, t, _l in DOCS}
    labels = sorted({l for *_x, l in DOCS})
    cnt, tot, nd = {}, {l: 0 for l in labels}, {l: 0 for l in labels}
    for d, _t, l in DOCS:
        nd[l] += 1
        for tk in toks[d]:
            f = _feat(tk, B)
            cnt[(l, f)] = cnt.get((l, f), 0) + 1
            tot[l] += 1
    N = sum(nd.values())
    out = {}
    for d, _t, _l in DOCS:
        rows = []
        for l in labels:
            s = math.log(nd[l] / N)
            for tk in toks[d]:
                s += math.log((cnt.get((l, _feat(tk, B)), 0) + alpha)
                              / (tot[l] + alpha * B))
            rows.append((l, s))
        rows.sort(key=lambda r: (-r[1], r[0]))
        out[d] = rows
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


@pytest.mark.parametrize("B", [2 ** 16, 8])  # big (no collisions) + tiny
def test_nb_matches_pure_python(docs, B):
    model, ls = nb_train(docs, "lang", n_features=B)
    got = {r["doc_id"]: (r["label"], r["score"])
           for r in nb_score(docs, model, ls, n_features=B).collect()}
    want = _ref(B)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0][0]
        assert got[d][1] == pytest.approx(want[d][0][1], abs=1e-10)


def test_nb_score_matrix_and_errors(docs, spark):
    B = 64
    model, ls = nb_train(docs, "lang", n_features=B)
    mat = nb_score(docs, model, ls, n_features=B,
                   keep_scores=True).collect()
    want = _ref(B)
    assert len(mat) == len(DOCS) * 2  # full |docs| x |labels| matrix
    for r in mat:
        w = dict(want[r["doc_id"]])
        assert r["score"] == pytest.approx(w[r["label"]], abs=1e-10)
    with pytest.raises(ValueError, match="empty label_stats"):
        nb_score(docs, model, ls.where("label = 'nope'"), n_features=B)


def test_nb_cross_engine_oracle(docs):
    """Train+score replayed by the DuckDB mirror: identical argmax labels
    and e4 scores — the gate contract, including hash collisions."""
    B = 32
    model, ls = nb_train(docs, "lang", n_features=B)
    got = sorted(
        (r["doc_id"], r["label"], int(round(r["score"] * 10000)))
        for r in nb_score(docs, model, ls, n_features=B).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ",".join(f"({d},'{t}','{l}')" for d, t, l in DOCS)
        + ") t(doc_id, text, lang)")
    want = sorted(map(tuple,
                      con.execute(duckdb_nb_sql("lang", n_features=B))
                      .fetchall()))
    assert got == want


def test_nb_alpha_smoothing_effect(docs):
    """Stronger smoothing pulls the LIKELIHOOD toward uniform: for an
    unseen-words probe the cross-label likelihood gap (scores with the
    priors subtracted out) shrinks as alpha grows — for seen words, the
    per-word evidence weakens too."""
    import math

    B = 256
    # drop one fr doc so priors AND token totals differ between labels
    # (DOCS is otherwise en/fr-symmetric and every gap would be 0)
    model, ls = nb_train(docs.where("doc_id != 8"), "lang", n_features=B)
    nd = {r["label"]: r["n_docs"] for r in ls.collect()}
    N = sum(nd.values())
    prior = {l: math.log(n / N) for l, n in nd.items()}
    spark = docs.sparkSession
    probe = spark.createDataFrame([(99, "zzz qqq www")],
                                  "doc_id long, text string")
    gaps = {}
    for a in (0.1, 10.0):
        m = nb_score(probe, model, ls, n_features=B, alpha=a,
                     keep_scores=True).collect()
        s = {r["label"]: r["score"] - prior[r["label"]] for r in m}
        gaps[a] = abs(s["en"] - s["fr"])
    assert gaps[10.0] < gaps[0.1]
