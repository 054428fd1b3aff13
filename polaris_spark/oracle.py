"""Pure-numpy single-node BM25 oracle — the rank-identity judge for the engine.

Implements exactly the scoring the distributed engine must reproduce
bit-for-bit (same float64 expressions, same association order, same
tie-breaks). The reference scores with Lucene 4.3's default TF-IDF similarity
(never overridden anywhere in the repo — see SURVEY.md §4.2); per the north
rule the rebuild uses explicit BM25 with documented constants instead.

Scoring spec (shared by oracle and engine):
- ``idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))``   (Robertson/Lucene BM25)
- ``impact   = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))``
- ``score(d) = Σ_t idf(t) * impact(t, d)`` summed over query terms in
  **lexicographically sorted term order** (fixed association order so the
  distributed kernel can reproduce float64 sums exactly),
- query terms are DEDUPLICATED (set semantics; documented deviation — the
  reference's Lucene query parser would add duplicate clauses),
- ``avgdl = Σ dl / N`` in float64; docs with dl=0 never match (no tokens),
- result order: ``score desc, doc_id asc`` (total order; the reference's
  SearchMixer sorts ASCENDING by score — a bug we do not replicate, see
  reference search/SearchMixer.java:54-61).
"""

from __future__ import annotations

import math
from collections import Counter

from .tokenizer import tokenize

K1 = 1.2
B = 0.75


class BM25Oracle:
    def __init__(self, docs: list[tuple[int, str]], k1: float = K1, b: float = B):
        self.k1 = k1
        self.b = b
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        self.df: Counter = Counter()
        self.cf: Counter = Counter()
        for doc_id, text in docs:
            toks = tokenize(text)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            for t, n in c.items():
                self.df[t] += 1
                self.cf[t] += n
        self.N = len(self.tf)
        self.avgdl = float(sum(self.dl.values())) / self.N if self.N else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def impact(self, tf: int, dl: int) -> float:
        k1, b = self.k1, self.b
        return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))

    def query_terms(self, query: str) -> list[str]:
        """Deduplicated query tokens in sorted order (fixed sum association)."""
        return sorted(set(tokenize(query)))

    def search(self, query: str, k: int | None = 10, mode: str = "or"):
        """Top-k [(doc_id, score)] with the spec's exact float64 semantics."""
        terms = [t for t in self.query_terms(query) if t in self.df]
        if not terms:
            return []
        scores: dict[int, float] = {}
        nmatch: dict[int, int] = {}
        for t in terms:  # sorted term order == fixed association order
            w = self.idf(t)
            for doc_id, c in self.tf.items():
                tf = c.get(t)
                if tf:
                    contrib = w * self.impact(tf, self.dl[doc_id])
                    scores[doc_id] = scores.get(doc_id, 0.0) + contrib
                    nmatch[doc_id] = nmatch.get(doc_id, 0) + 1
        if mode == "and":
            scores = {d: s for d, s in scores.items() if nmatch[d] == len(self.query_terms(query))}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k] if k is not None else ranked
