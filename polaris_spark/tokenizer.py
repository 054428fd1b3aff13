"""Code-aware tokenizer — ONE spec, THREE implementations (golden-tested equal).

Spec (documented here; every implementation must match it exactly):

1. **Base tokens**: maximal runs matching ``[A-Za-z0-9_]+(?:[.'][A-Za-z0-9_]+)*``
   — letters/digits/underscores, with dots and apostrophes joining only when
   surrounded by such runs. This mirrors the reference analyzer's effective
   behavior: Lucene 4.3 StandardTokenizer (UAX#29) with NO LowerCaseFilter and
   NO StopFilter (reference: polaris-core/src/main/java/com/codingstory/polaris/
   indexing/analysis/SourceCodeAnalyzer.java:24-31). Consequences preserved:
   case-sensitive terms, ``foo_bar`` one token, ``com.company.A`` one token,
   ``don't`` one token, punctuation ``(){};=/`` splits, trailing dot dropped.

2. **Code-aware sub-tokens** (the extension polaris wanted but left as a TODO —
   reference: typedb/TypeDbAnalyzer.java:20): for each base token, derive parts
   by (a) inserting a break between a lower/digit char and an upper char,
   (b) between an upper-run and Upper+lower (acronym boundary: ``HTTPServer``
   → ``HTTP Server``), (c) replacing ``[._']+`` runs with breaks; if this
   yields >1 part, the parts are emitted as additional tokens (base token is
   always preserved verbatim — identifiers and tool names stay whole).
   Emission order: ALL base tokens in text order first, then all sub-tokens
   in text order (order is irrelevant to tf/df/dl; positions are not stored).

3. No lowercasing anywhere; no stopwords. Document length ``dl`` = total
   emitted tokens (base + sub).

The three implementations:
- :func:`tokenize` — pure Python (shared by the numpy oracle and pandas UDFs),
- :func:`tokens_col` — Spark-native Column expression (JVM-side, whole-stage
  codegen; the fast path used by the index build),
- :func:`duckdb_tokens_sql` — DuckDB SQL snippet (used by oracle_sql gates).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd

BASE_PATTERN = r"[A-Za-z0-9_]+(?:[.'][A-Za-z0-9_]+)*"
CAMEL1 = (r"([a-z0-9])([A-Z])", r"\1 \2")  # lower/digit → Upper boundary
CAMEL2 = (r"([A-Z]+)([A-Z][a-z])", r"\1 \2")  # acronym → CamelWord boundary
SEPS_PATTERN = r"[._']+"

TOKENIZER_VERSION = 1

_BASE_RE = re.compile(BASE_PATTERN)
_CAMEL1_RE = re.compile(CAMEL1[0])
_CAMEL2_RE = re.compile(CAMEL2[0])
_SEPS_RE = re.compile(SEPS_PATTERN)


# ---------------------------------------------------------------- pure Python

def subtokens(token: str) -> list[str]:
    """Parts of *token* per spec step 2; ``[]`` when the token has one part."""
    s = _CAMEL1_RE.sub(r"\1 \2", token)
    s = _CAMEL2_RE.sub(r"\1 \2", s)
    s = _SEPS_RE.sub(" ", s)
    parts = s.split()
    return parts if len(parts) > 1 else []


_cached_subtokens = lru_cache(maxsize=1_000_000)(subtokens)


def tokenize_with_positions(text: str | None) -> tuple[list[str], list[int]]:
    """(tokens, positions) — position = index of the BASE token in text order.

    Sub-tokens carry their parent base token's position (the Lucene
    position-increment-0 convention for synonym/sub tokens), so a phrase
    query over base tokens sees consecutive integers, and a sub-token
    matches at its parent's slot. ``tokens`` is ordered exactly like
    :func:`tokenize` (all base tokens first, then all sub-tokens)."""
    if not text:
        return [], []
    base = _BASE_RE.findall(text)
    toks = list(base)
    pos = list(range(len(base)))
    for i, tok in enumerate(base):
        for s in _cached_subtokens(tok):
            toks.append(s)
            pos.append(i)
    return toks, pos


def tokenize(text: str | None) -> list[str]:
    """Reference implementation of the full spec (base + sub tokens).

    Sub-token derivation is memoized per distinct base token (Zipfian vocab
    → ~4× fewer regex passes; output identical by construction). The cache
    lives per Python worker process and is bounded at 1M entries."""
    if not text:
        return []
    base = _BASE_RE.findall(text)
    subs: list[str] = []
    for tok in base:
        subs.extend(_cached_subtokens(tok))
    return base + subs


# ------------------------------------------------------------- Spark-native

def tokens_col(col):
    """Spark Column: array<string> of tokens for a string column.

    Pure built-in functions — stays inside whole-stage codegen; no Python
    boundary. Semantics identical to :func:`tokenize`.
    """
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)

    def camel(t):
        s = F.regexp_replace(t, CAMEL1[0], "$1 $2")
        s = F.regexp_replace(s, CAMEL2[0], "$1 $2")
        s = F.regexp_replace(s, SEPS_PATTERN, " ")
        return F.filter(F.split(s, " "), lambda x: x != F.lit(""))

    empty = F.expr("CAST(array() AS array<string>)")
    base = F.regexp_extract_all(col, F.lit(BASE_PATTERN), F.lit(0))
    subs = F.flatten(
        F.transform(base, lambda t: F.when(F.size(camel(t)) > 1, camel(t)).otherwise(empty))
    )
    return F.coalesce(F.concat(base, subs), empty)


# single-regex equivalent of the CAMEL1 → CAMEL2 → SEPS replace cascade:
# split at (a) separator runs, (b) lower/digit→Upper boundaries, (c) the
# acronym→CamelWord boundary. One regex pass instead of three replaces +
# split — ~3× cheaper on vocab-scale columns (completion build); golden-
# tested equal to the Python `subtokens` spec.
PARTS_SPLIT_PATTERN = r"[._']+|(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])"


def parts_col(col):
    """Spark Column: array<string> of a token's camel/sep parts (spec step 2,
    without the >1-part condition). Used by prefix completion's simple-name
    analog (reference typedb TypeCaseInsensitive field)."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return F.filter(
        F.split(col, PARTS_SPLIT_PATTERN), lambda x: x != F.lit("")
    )


@lru_cache(maxsize=1)
def _pandas_tokenize_udf():
    """Arrow-vectorized pandas UDF variant of the tokenizer (same Python spec).

    Provided for parity with the mandated UDF surface; the build's default
    path is :func:`tokens_col` (JVM-side) which is strictly faster. Golden
    tests assert both produce identical output.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return texts.map(tokenize)

    return tokenize_udf


def tokens_udf_col(col):
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return _pandas_tokenize_udf()(col)


# ------------------------------------------------------------------- DuckDB

def duckdb_tokens_sql(col_sql: str) -> str:
    """DuckDB SQL expression (list<varchar>) implementing the same spec.

    Note DuckDB regexp_replace needs the 'g' flag (Spark/Python replace
    globally by default) and backrefs are ``\\1``; apostrophes inside SQL
    string literals are doubled.
    """
    base_lit = BASE_PATTERN.replace("'", "''")
    seps_lit = SEPS_PATTERN.replace("'", "''")
    camel = (
        "list_filter(string_split("
        f"regexp_replace(regexp_replace(regexp_replace(t, '{CAMEL1[0]}', '\\1 \\2', 'g'),"
        f" '{CAMEL2[0]}', '\\1 \\2', 'g'), '{seps_lit}', ' ', 'g'), ' '), s -> s != '')"
    )
    base = f"regexp_extract_all({col_sql}, '{base_lit}')"
    return (
        f"COALESCE(list_concat({base}, flatten(list_transform({base}, "
        f"t -> CASE WHEN len({camel}) > 1 THEN {camel} ELSE [] END))), [])"
    )
