"""Lucene ClassicSimilarity (TF-IDF practical scoring) — THE REFERENCE'S
ranking function.

The reference never calls ``setSimilarity`` anywhere, so every search it
serves scores with Lucene 4.3's ``DefaultSimilarity`` (pom.xml:49-52;
SURVEY §2 A4/A5) — NOT BM25. ``SearchEngine``'s default ranking is BM25
(the modern choice, kept as the flagship); this module is the
reference-parity scorer a migrating user can switch to and see the
reference's ranking:

    score(q, d) = coord(q, d) · queryNorm(q)
                  · Σ_t  idf(t)² · boost(t) · sqrt(tf(t, d)) · norm(d)

    idf(t)      = 1 + ln(N / (df(t) + 1))
    coord(q, d) = n_match / |q|               (overlap / maxOverlap)
    queryNorm   = 1 / sqrt(Σ_t (idf(t)·boost(t))²)
    norm(d)     = byte315⁻¹(byte315(float32(1 / sqrt(dl))))

``norm(d)`` replicates Lucene's lossy 8-bit norm encoding EXACTLY
(``SmallFloat.floatToByte315`` — 3 mantissa bits, 5 exponent bits): the
quantization is SEMANTIC, not cosmetic — all dl values inside a byte
bucket tie, so rankings differ from a full-precision norm and a
reference user would notice. Two documented deviations, both
sub-ranking: arithmetic runs in float64 (Lucene truncates each factor to
float32 — noise ~1e-7, far below the gate's e4 rounding and never
reordering the byte-quantized buckets at these magnitudes), and
duplicate query tokens collapse to one clause (the engine's parser
contract everywhere).

Spark shape: IDENTICAL exchange to ``search_df`` — one pruned candidate
scan, per-shard Arrow kernels via ``_flat_scored_df``'s pluggable
``scorer`` (tombstones / prohibit exclusion / FILTER inclusion ride the
same cogroup), one TakeOrderedAndProject. No MaxScore pruning: the
stored block-max metadata carries BM25 impacts, not sqrt(tf)·norm upper
bounds, so the classic path scores every term-pruned candidate — still
shard-parallel, the same exactness posture as AND / min_match / dismax.
"""
from __future__ import annotations

import math

import numpy as np


def _decode_table() -> np.ndarray:
    """The 256 decoded values of Lucene's byte315 norm code
    (``SmallFloat.byte315ToFloat``), as float64 (every float32 is exact
    in float64). Index = the encoded byte."""
    b = np.arange(256, dtype=np.int64)
    bits = (b << 21) + ((63 - 15) << 24)
    vals = bits.astype(np.int32).view(np.float32).astype(np.float64)
    vals[0] = 0.0
    return vals


NORM_DECODE = _decode_table()


def lucene_norm(dls: np.ndarray) -> np.ndarray:
    """decode(encode(lengthNorm)) for an int doc-length array — the norm
    value Lucene's scorer actually multiplies by: ``lengthNorm =
    (float)(1.0 / Math.sqrt(dl))`` (double math, one float32 round — IEEE
    division and sqrt are correctly rounded, so numpy reproduces the
    exact same float32), then ``SmallFloat.floatToByte315`` (mantissa
    truncation — round toward zero onto the 3-bit-mantissa grid)."""
    f32 = (1.0 / np.sqrt(dls.astype(np.float64))).astype(np.float32)
    bits = f32.view(np.int32).astype(np.int64)
    small = bits >> 21
    fzero = (63 - 15) << 3
    enc = np.where(small <= fzero, np.where(bits <= 0, 0, 1),
                   np.where(small >= fzero + 0x100, 255, small - fzero))
    return NORM_DECODE[enc]


def classic_weights(dfs: dict[str, int], N: int,
                    boosts: dict[str, float] | None = None
                    ) -> dict[str, float]:
    """Per-term scorer weights idf²·boost·queryNorm (TermWeight.value in
    Lucene: queryWeight · idf, after normalize(queryNorm))."""
    idf = {t: 1.0 + math.log(N / (d + 1.0)) for t, d in dfs.items()}
    qw = {t: idf[t] * (boosts.get(t, 1.0) if boosts else 1.0) for t in idf}
    s = sum(w * w for w in qw.values())
    qnorm = 1.0 / math.sqrt(s) if s > 0 else 1.0
    return {t: qw[t] * idf[t] * qnorm for t in idf}


def score_decoded_classic(
    decoded: dict,
    weights: dict[str, float],
    k: int | None,
    mode: str,
    n_query_terms: int,
    excluded: np.ndarray | None = None,
    included: np.ndarray | None = None,
):
    """Classic-similarity accumulation over pre-decoded per-term postings
    (the ``score_decoded_arrays`` shape with the TF-IDF impact): per-doc
    float64 sums in sorted term order, coord applied once at the end.
    Returns ``(doc_ids, scores, n_match)`` or None when nothing matches."""
    items = []
    for term in sorted(decoded):
        if term not in weights:
            continue
        docs, tfs, dls = decoded[term]
        if excluded is not None and len(docs):
            keep = ~np.isin(docs, excluded, assume_unique=True)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        if included is not None and len(docs):
            keep = np.isin(docs, included, assume_unique=True)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        if len(docs):
            items.append((term, docs, tfs, dls))
    if not items:
        return None
    all_docs = np.unique(np.concatenate([d[1] for d in items]))
    scores = np.zeros(len(all_docs), dtype=np.float64)
    nmatch = np.zeros(len(all_docs), dtype=np.int32)
    for term, docs, tfs, dls in items:  # sorted order == oracle order
        impact = np.sqrt(tfs.astype(np.float64)) * lucene_norm(dls)
        idx = np.searchsorted(all_docs, docs)
        scores[idx] += weights[term] * impact
        nmatch[idx] += 1
    if mode == "and":
        keep = nmatch == n_query_terms
        all_docs, scores, nmatch = all_docs[keep], scores[keep], nmatch[keep]
    if not len(all_docs):
        return None
    scores = scores * (nmatch.astype(np.float64) / float(n_query_terms))
    if k is not None and len(all_docs) > k:
        order = np.lexsort((all_docs, -scores))[:k]
        all_docs, scores, nmatch = all_docs[order], scores[order], nmatch[order]
    return all_docs, scores, nmatch


def score_shard_classic(pdf, weights, k, mode, n_query_terms,
                        n_shards=None, shard=None, excluded=None,
                        included=None):
    """Per-shard kernel: decode packed candidate rows once, score classic.
    Returns the RESULT_SCHEMA pandas frame (empty when nothing matches)."""
    import pandas as pd

    from .engine import decode_shard_rows

    decoded, _ = decode_shard_rows(pdf, n_shards=n_shards, shard=shard)
    r = score_decoded_classic(decoded, weights, k, mode, n_query_terms,
                              excluded=excluded, included=included)
    if r is None:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64"),
                             "n_match": pd.Series(dtype="int32")})
    docs, scores, nmatch = r
    return pd.DataFrame({"doc_id": docs.astype(np.int64), "score": scores,
                         "n_match": nmatch.astype(np.int32)})
