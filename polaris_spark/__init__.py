"""polaris_spark — a PySpark-native inverted-index + BM25 full-text engine.

A from-scratch rebuild of the *query and data-processing capabilities* of
stepinto/polaris (a Lucene 4.3-based code-search engine; reference read-only
at /root/reference) as an idiomatic PySpark engine over transcript tables:

- code-aware tokenization (one spec, three implementations: pure Python,
  Spark-native columns, DuckDB SQL — golden-tested identical),
- SPIMI-style distributed index build: map-side per-doc inversion via an
  Arrow-vectorized pandas UDF, a single shuffle into (term-bucket, doc-shard)
  groups, delta+varint-compressed posting lists with per-block max-impact
  metadata, per-chunk manifests for resumable builds,
- DataFrame-native top-k BM25 with block-max pruning, broadcast query-term
  stats, and per-shard top-k heaps merged by a global sort-limit,
- training-data pipeline operators (dedup, similarity search, text analysis).

Nothing here is a port: the reference's single-writer Lucene materialization
(reference: polaris-core/.../pipeline/IndexPipeline.java:607-673) is replaced
by a fully distributed segment build; its TF-IDF-by-default scoring by
explicit BM25 with documented constants.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
