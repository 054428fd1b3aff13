"""DuckDB oracle-SQL builders for the driver's correctness gate.

Each builder returns ANSI-ish SQL runnable by DuckDB against the
pre-registered testdata views (``documents``, ``embeddings``, ...). The SQL
computes the SAME spec as the Spark engine (tokenizer spec, BM25 constants,
association-insensitive e4-rounded scores) from first principles — the gate
therefore checks the whole pipeline (tokenize → build → encode → decode →
score), not a re-implementation of its bugs.
"""

from __future__ import annotations

from .tokenizer import duckdb_tokens_sql, tokenize

K1_SQL = "1.2"
K1P1_SQL = "(1.2 + 1.0)"
B_SQL = "0.75"


def _qt_list(query: str) -> str:
    terms = sorted(set(tokenize(query)))
    return "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in terms) + "]"


def base_cte(table: str = "documents") -> str:
    toks = duckdb_tokens_sql("text")
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


def bm25_scores_sql(query: str, table: str = "documents", limit: int | None = None) -> str:
    """All matching docs with e4-rounded BM25 scores (LIMIT → top-k with the
    engine's exact (score desc, doc_id asc) order)."""
    qt = _qt_list(query)
    sql = base_cte(table) + f""",
qt AS (SELECT unnest({qt}) AS term),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.N - dft.df + 0.5) / (dft.df + 0.5))
         * (tf.tf * {K1P1_SQL}
            / (tf.tf + {K1_SQL} * (1.0 - {B_SQL} + {B_SQL} * dl.dl / (s.sumdl / s.N)))) AS c,
         tf.term AS term
  FROM tf
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, CAST(round(sum(c) * 10000) AS BIGINT) AS score_e4,
         sum(c) AS raw_score
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, score_e4 FROM scored"""
    if limit is not None:
        sql += f"\nORDER BY raw_score DESC, doc_id ASC LIMIT {limit}"
    return sql


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
