"""Text-analysis operators for training-data pipelines.

All are pure Spark-native column expressions (JVM-side, whole-stage codegen,
no Python in the hot path) with DuckDB-SQL mirrors used by the correctness
gate. Semantics are defined HERE (both implementations follow this spec):

- token_count:     whitespace tokens (split on \\s+) and engine terms
                   (tokenizer spec base+sub tokens).
- quality:         length/alpha/punct/stopword ratios → quality score in
                   [0,1]: 0.25*cap(n_ws/100) + 0.25*alpha_ratio +
                   0.25*(1-punct_ratio) + 0.25*stop_ratio, rounded 4dp.
- langid:          argmax over per-language stopword hit counts on lowercased
                   whitespace tokens; ties + zero hits → 'und'. Deterministic
                   tiebreak: language list order.
- fingerprint:     md5 of the normalized text (lowercase, collapse all \\s+
                   runs to single spaces, trim) — a portable stand-in for a
                   rolling-hash document fingerprint.
"""

from __future__ import annotations

# Common function words per language (standard public stopword lists, no
# apostrophe forms so the same literals embed safely in DuckDB SQL). The
# argmax spec is unchanged from the 4x10 toy tables of round 2 — only the
# evidence widened (10 languages x ~35-45 words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
           "on", "with", "as", "was", "at", "by", "be", "this", "have",
           "from", "or", "are", "not", "but", "had", "his", "they", "she",
           "which", "you", "were", "her", "all", "we", "an", "their",
           "been", "one", "there", "what", "when", "who", "will", "would"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "von", "zu", "den", "dem", "des", "im", "für", "auf", "sich",
           "als", "auch", "es", "an", "er", "nach", "bei", "um", "aus",
           "wenn", "nur", "noch", "wie", "über", "so", "zum", "hat", "war",
           "sind", "oder", "aber", "durch", "kann", "mehr", "schon"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que",
           "pour", "dans", "qui", "par", "sur", "pas", "plus", "ne", "se",
           "au", "du", "il", "elle", "avec", "son", "ses", "ce", "cette",
           "mais", "ou", "comme", "nous", "vous", "ils", "sont", "tout",
           "aux", "leur", "bien", "même", "peut", "fait", "deux"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por",
           "en", "se", "del", "las", "no", "con", "para", "su", "al", "lo",
           "como", "más", "pero", "sus", "ya", "o", "este", "ha",
           "porque", "esta", "entre", "cuando", "muy", "sin", "sobre",
           "también", "me", "hasta", "hay", "donde", "quien", "desde"],
    "it": ["il", "la", "le", "e", "è", "un", "una", "di", "che", "per",
           "in", "non", "si", "del", "con", "al", "lo", "come", "più",
           "ma", "sono", "stato", "questo", "ha", "gli", "nel", "alla",
           "della", "dei", "delle", "anche", "tra", "molto", "senza",
           "dopo", "essere", "perché", "quando", "sua", "suo", "due"],
    "pt": ["o", "os", "as", "e", "é", "um", "uma", "de", "que", "por",
           "em", "se", "do", "da", "não", "com", "para", "seu", "ao",
           "como", "mais", "mas", "foi", "este", "tem", "no", "na", "dos",
           "das", "ele", "ela", "são", "ser", "muito", "já", "também",
           "pela", "pelo", "sua", "ou", "quando", "depois"],
    "nl": ["de", "het", "een", "en", "van", "is", "in", "op", "dat", "die",
           "niet", "met", "voor", "aan", "er", "om", "ook", "als", "maar",
           "dan", "zij", "hij", "naar", "bij", "uit", "nog", "wordt",
           "worden", "heeft", "deze", "over", "tot", "je", "zijn", "door",
           "al", "veel", "geen", "wel", "kan", "meer"],
    "sv": ["och", "det", "att", "i", "en", "jag", "hon", "som", "han",
           "på", "den", "med", "var", "sig", "för", "så", "till", "är",
           "men", "ett", "om", "hade", "av", "vill", "nu", "mycket",
           "bara", "kan", "ska", "när", "vad", "efter", "upp",
           "vi", "dem", "vara", "har", "inte", "från"],
    "pl": ["i", "w", "nie", "na", "się", "że", "do", "jest", "z", "to",
           "jak", "po", "co", "tak", "jego", "ale", "za", "od", "ma",
           "być", "przez", "już", "tylko", "był", "może", "bardzo",
           "trzeba", "mnie", "ich", "czy", "przy", "ten", "przed", "tego",
           "lub", "oraz", "także", "która", "które", "gdy"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "dalam", "akan", "pada", "juga", "saya", "ke", "bisa",
           "ada", "mereka", "lebih", "tahun", "sudah", "atau", "saat",
           "oleh", "kita", "seperti", "bagi", "telah", "karena", "kami",
           "secara", "banyak", "hanya", "masih", "harus", "saja"],
}
LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "sv", "pl", "id"]  # fixed tiebreak order


def _ws_tokens_col(col):
    from pyspark.sql import functions as F

    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def token_count_cols(text_col):
    """(n_ws_tokens, n_terms) columns."""
    from pyspark.sql import functions as F

    from ..tokenizer import tokens_col

    return (
        F.size(_ws_tokens_col(text_col)).alias("n_ws_tokens"),
        F.size(tokens_col(text_col)).alias("n_terms"),
    )


def quality_cols(text_col):
    from pyspark.sql import functions as F

    n_chars = F.length(text_col)
    alpha = F.length(F.regexp_replace(text_col, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?(){}\[\]\"'`]", ""))
    ws = _ws_tokens_col(text_col)
    n_ws = F.size(ws)
    stop_hits = F.size(F.filter(ws, lambda w: F.lower(w).isin(STOPWORDS["en"])))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    alpha_ratio = safe(alpha, n_chars)
    punct_ratio = safe(punct, n_chars)
    stop_ratio = safe(stop_hits, n_ws)
    quality = F.round(
        0.25 * F.least(n_ws.cast("double") / 100.0, F.lit(1.0))
        + 0.25 * alpha_ratio
        + 0.25 * (1.0 - punct_ratio)
        + 0.25 * stop_ratio,
        4,
    )
    return (
        n_chars.alias("n_chars_calc"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        quality.alias("quality"),
    )


def langid_col(text_col):
    """Predicted language code ('und' when no stopword hits)."""
    from pyspark.sql import functions as F

    ws = _ws_tokens_col(text_col)

    def _hits(lang):
        words = STOPWORDS[lang]
        return F.size(F.filter(ws, lambda w: F.lower(w).isin(words)))

    hits = {lang: _hits(lang) for lang in LANGS}
    best = F.greatest(*[hits[L] for L in LANGS])
    out = F.lit("und")
    # first language (in LANGS order) achieving the max wins
    for lang in reversed(LANGS):
        out = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint_col(text_col):
    from pyspark.sql import functions as F

    norm = F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))
    return F.md5(norm.cast("binary"))


def snippet_col(text_col, terms: list[str], before: int = 2, after: int = 3):
    """Context-window summary: the lines around the first line containing any
    query term, ±(before, after) lines — the rebuild of reference
    search/SearchMixer.java:79-89 (getSummary ±(2,3)) and the stripped-line
    snippet of parser/TypeUtils.java:212-216. Spark-native (no UDF)."""
    from pyspark.sql import functions as F

    lines = F.split(text_col, "\n")
    n = F.size(lines)

    def has_term(line):
        cond = F.lit(False)
        for t in terms:
            cond = cond | line.contains(t)
        return cond

    matches = F.filter(F.sequence(F.lit(1), n), lambda i: has_term(F.element_at(lines, i)))
    first = F.coalesce(F.element_at(matches, 1), F.lit(1))
    start = F.greatest(first - before, F.lit(1))
    length = F.lit(before + after + 1)
    return F.concat_ws("\n", F.slice(lines, start, length))


# ------------------------------------------------------------ DuckDB mirrors

# ---- PII scan / redaction ------------------------------------------------
# Patterns restricted to the Java-regex ∩ RE2 common subset so the Spark
# columns and the DuckDB mirror compute identical results. Ordered: emails
# first (their local part may contain digits a later pass would chew on),
# then IPv4, then phone-ish digit runs (IPv4 octets are ≤3 digits and
# dot-separated, so the phone pattern — space/dash separators only — never
# fires inside an address).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+?\d(?:[ \-]?\d){7,14}"),
)


def pii_cols(text_col):
    """(n_email, n_ipv4, n_phone, redacted) columns — a training-data
    pipeline's PII scrub pass: counts per category plus the text with each
    match replaced by ``<CATEGORY>``. Pure JVM column expressions
    (``regexp_count``/``regexp_replace``, whole-stage codegen) — no Python
    touches the strings; at 100 TB this is a narrow map over the corpus."""
    from pyspark.sql import functions as F

    counts = [
        F.regexp_count(text_col, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    red = text_col
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return (*counts, red.alias("redacted"))


def duckdb_pii_sql(col_sql: str) -> str:
    """SELECT-list fragment mirroring :func:`pii_cols` (counts + redacted)."""
    parts = []
    for name, pat in PII_PATTERNS:
        lit = pat.replace("'", "''")
        parts.append(
            f"len(regexp_extract_all({col_sql}, '{lit}'))::BIGINT AS n_{name}"
        )
    red = col_sql
    for name, pat in PII_PATTERNS:
        lit = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{lit}', '<{name.upper()}>', 'g')"
    parts.append(f"{red} AS redacted")
    return ", ".join(parts)


# ---- repetition signals (Gopher-style quality filters) -------------------

def repetition_cols(text_col, n: int = 2):
    """(dup_ngram_frac, top_token_frac) columns — the Rae et al. 2021
    (Gopher) repetition filters re-expressed as Spark columns:
    ``dup_ngram_frac`` = fraction of word n-grams that are repeats of an
    earlier n-gram in the doc; ``top_token_frac`` = share of the most
    frequent token. Both pure higher-order column functions (aggregate /
    transform / array ops) — no shuffle, no Python; docs with fewer than
    n tokens (or none) report 0.0."""
    from pyspark.sql import functions as F

    toks = _ws_tokens_col(text_col)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws("\x00", F.slice(toks, i, n)),
    )
    n_grams = F.greatest(k - (n - 1), F.lit(1))
    dup_frac = F.when(
        k >= n,
        (n_grams - F.size(F.array_distinct(grams)))
        / n_grams.cast("double"),
    ).otherwise(F.lit(0.0))
    # top token share: max over distinct tokens of its occurrence count
    top = F.array_max(F.transform(
        F.array_distinct(toks),
        lambda t: F.size(F.filter(toks, lambda x: x == t)),
    ))
    top_frac = F.when(k > 0, top / k.cast("double")).otherwise(F.lit(0.0))
    return (dup_frac.alias("dup_ngram_frac"), top_frac.alias("top_token_frac"))


def duckdb_repetition_sql(col_sql: str, n: int = 2) -> str:
    """SELECT-list fragment mirroring :func:`repetition_cols`."""
    toks = duckdb_ws_tokens(col_sql)
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), chr(0)))"
    )
    n_grams = f"greatest(len({toks}) - {n - 1}, 1)"
    dup = (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"({n_grams} - len(list_distinct({grams}))) / {n_grams}::DOUBLE "
        "ELSE 0.0 END AS dup_ngram_frac"
    )
    top = (
        f"list_max(list_transform(list_distinct({toks}), "
        f"t -> len(list_filter({toks}, x -> x = t))))"
    )
    topf = (
        f"CASE WHEN len({toks}) > 0 THEN {top} / len({toks})::DOUBLE "
        "ELSE 0.0 END AS top_token_frac"
    )
    return f"{dup}, {topf}"


def duckdb_ws_tokens(col_sql: str) -> str:
    return f"list_filter(string_split_regex({col_sql}, '\\s+'), x -> x != '')"


def _duck_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def duckdb_quality_sql(col_sql: str) -> str:
    ws = duckdb_ws_tokens(col_sql)
    n_chars = f"length({col_sql})"
    alpha = f"length(regexp_replace({col_sql}, '[^A-Za-z]', '', 'g'))"
    punct = f"length(regexp_replace({col_sql}, '[^.,;:!?(){{}}\\[\\]\"''`]', '', 'g'))"
    n_ws = f"len({ws})"
    stop = f"len(list_filter({ws}, w -> list_contains({_duck_list(STOPWORDS['en'])}, lower(w))))"
    safe = lambda num, den: f"(CASE WHEN {den} > 0 THEN {num}::DOUBLE / {den} ELSE 0.0 END)"
    alpha_r, punct_r, stop_r = safe(alpha, n_chars), safe(punct, n_chars), safe(stop, n_ws)
    quality = (
        f"round(0.25 * least({n_ws}::DOUBLE / 100.0, 1.0) + 0.25 * {alpha_r} "
        f"+ 0.25 * (1.0 - {punct_r}) + 0.25 * {stop_r}, 4)"
    )
    return (
        f"{n_chars} AS n_chars_calc, round({alpha_r}, 4) AS alpha_ratio, "
        f"round({punct_r}, 4) AS punct_ratio, round({stop_r}, 4) AS stop_ratio, "
        f"{quality} AS quality"
    )


def duckdb_langid_sql(col_sql: str) -> str:
    ws = duckdb_ws_tokens(col_sql)
    hits = {
        L: f"len(list_filter({ws}, w -> list_contains({_duck_list(STOPWORDS[L])}, lower(w))))"
        for L in LANGS
    }
    best = "greatest(" + ", ".join(hits[L] for L in LANGS) + ")"
    expr = "'und'"
    for lang in reversed(LANGS):
        expr = f"CASE WHEN {hits[lang]} = {best} AND {best} > 0 THEN '{lang}' ELSE {expr} END"
    return expr


def duckdb_fingerprint_sql(col_sql: str) -> str:
    return f"md5(trim(regexp_replace(lower({col_sql}), '\\s+', ' ', 'g')))"


def quality_percentile_filter(docs, keep_frac: float = 0.3,
                              by: str = "source", text_col: str = "text",
                              id_col: str = "doc_id",
                              score_col: str | None = None,
                              ascending: bool = False):
    """Per-group quality PERCENTILE filter: keep the best ``keep_frac``
    of documents by :func:`quality_cols` score WITHIN each ``by`` group —
    the per-domain thresholding curation pipelines use when one global
    cut would wipe out whole domains (CCNet-style quality bucketing).

    ``score_col`` swaps in ANY precomputed signal column instead of the
    built-in quality score — e.g. :func:`lm_score`'s ``nlp_e6`` with
    ``ascending=True`` (lower perplexity = better) is exactly CCNet's
    per-domain perplexity bucketing. ``ascending`` orders the rank so
    "best" matches the signal's polarity.

    Returns ``(doc_id, grp, quality, pct_rank, kept)`` over the FULL
    corpus (auditable, like the curation ledger): ``pct_rank`` is
    percent_rank over (quality best-first, doc_id asc) — the doc_id
    tiebreak makes ranks unique and the whole output deterministic — and
    ``kept = pct_rank <= keep_frac`` as int.

    Scale: ONE window shuffle on the group key. At 10^12 docs a bare
    `source` partition can exceed an executor — refine ``by`` to a
    composite (source, shard) column the same way the mixing ops do; the
    percentile is then per refined group, which is the operational intent
    anyway (thresholds drift over time slices)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    q = (F.col(score_col).alias("quality") if score_col
         else quality_cols(F.col(text_col))[-1])
    order = F.asc("quality") if ascending else F.desc("quality")
    w = Window.partitionBy("grp").orderBy(order, F.asc("doc_id"))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(by).alias("grp"), q)
        .withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("kept",
                    (F.col("pct_rank") <= keep_frac).cast("int"))
        .select("doc_id", "grp", "quality", "pct_rank", "kept")
    )


def duckdb_quality_percentile_sql(table: str, keep_frac: float = 0.3,
                                  by: str = "source",
                                  text_col: str = "text",
                                  id_col: str = "doc_id") -> str:
    """Oracle for :func:`quality_percentile_filter` — identical
    percent_rank definition ((rank-1)/(n-1), unique ordering)."""
    return f"""
WITH q AS (
  SELECT {id_col} AS doc_id, {by} AS grp, {duckdb_quality_sql(text_col)}
  FROM {table}
), r AS (
  SELECT doc_id, grp, quality,
         percent_rank() OVER (PARTITION BY grp
                              ORDER BY quality DESC, doc_id ASC) AS pct_rank
  FROM q
)
SELECT doc_id, grp, quality, pct_rank,
       (pct_rank <= {keep_frac})::INT AS kept
FROM r
"""


def encode_token_ids(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Vocabulary-indexed corpus encoding — the "tokenize to ids" step of
    a training-data pipeline: every doc's token stream mapped to dense
    integer ids from a corpus-derived vocabulary, frequency-ranked
    (token_id = row_number over (df desc, term asc) — the classic vocab
    ordering, deterministic via the term tiebreak). Tokenization is the
    index tokenizer (:func:`..tokenizer.tokens_col` — sub-tokens in
    emission order), so ids compose with the engine's dictionary.
    Returns exploded ``(doc_id, pos, token_id)`` rows, pos 1-based.

    Scale: the token explode is map-side; the vocab aggregate is
    dictionary-fold sized (vocab rows, ≪ corpus) and the encode join
    broadcasts it when it fits, else shuffles on the term. The one
    honest caveat: the dense-id window is a single task over VOCAB rows
    — fine into the 10⁸-term range (a few GB of (term, df)); past that,
    assign ids with sorted zipWithIndex or accept banded ids. The
    corpus-side cost is exactly the tf_invert shuffle shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..tokenizer import tokens_col

    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        F.posexplode(tokens_col(F.col(text_col)))
                        .alias("pos0", "term"))
            .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"),
                    "term"))
    vocab = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    vid = vocab.select(
        "term", F.row_number().over(w).cast("long").alias("token_id"))
    return toks.join(vid, "term").select("doc_id", "pos", "token_id")


def duckdb_token_ids_sql(table: str, text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Oracle for :func:`encode_token_ids`: same tokenizer mirror, same
    frequency-ranked dense vocabulary (zipped unnests keep pos aligned)."""
    from ..tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql(text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}
), s AS (
  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos,
         unnest(toks) AS term
  FROM t
), v AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM s GROUP BY term
), vid AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS token_id
  FROM v
)
SELECT doc_id, pos, token_id FROM s JOIN vid USING (term)
"""


# ----------------------------------------------------- corpus bigram LM

def train_bigram_lm(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Train a corpus bigram language model — the statistics behind a
    CCNet-style perplexity filter (CCNet trains KenLM on a reference
    corpus and buckets documents by perplexity; here the model is an
    add-one-smoothed bigram LM trained on the corpus itself, a spec both
    Spark and DuckDB can evaluate EXACTLY for the oracle gate).

    Tokens = whitespace tokens of lowercased text. Returns
    (bigram_counts DF (w1, w2, c2), prefix_counts DF (w1, c1), V) where
    c2 = corpus count of the ordered bigram, c1 = Σ_w2 c2 (the token's
    count as a bigram prefix), and V = |distinct corpus tokens|.

    Scale shape (100 TB): one map-side explode then two hash aggregations
    keyed by bigram/token — sub-linear outputs (bounded by the distinct
    bigram/vocab counts), full map-side partial aggregation, no windows.
    """
    from pyspark.sql import functions as F

    toks = _ws_tokens_col(F.lower(F.col(text_col)))
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    bg = (
        t.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = int(
        t.select(F.explode("t").alias("tok")).agg(
            F.countDistinct("tok").alias("v")
        ).collect()[0]["v"]
    )
    return c2, c1, vocab


def lm_score(docs, model=None, text_col: str = "text",
             id_col: str = "doc_id"):
    """Per-document LM quality score: average negative log-probability of
    the doc's bigrams under the (add-one smoothed) corpus bigram model —
    low = fluent/typical, high = garbled/atypical, exactly the quantity a
    CCNet perplexity bucket thresholds (perplexity = exp(score)).

    ``model`` is a ``train_bigram_lm`` result; None trains on ``docs``
    itself (the self-scoring shape the gate pins). Returns one row per
    input doc: (doc_id, n_bigrams, nlp_e6) with nlp_e6 = round(avg ·10⁶)
    as BIGINT (cross-engine value-hashable) and NULL for docs with fewer
    than 2 tokens (n_bigrams 0).

    Scale shape: the score join is keyed by bigram — the standard
    LM-scoring shuffle (both sides hash-partitioned on (w1, w2)); per-doc
    folding is one partial-aggregated groupBy."""
    from pyspark.sql import functions as F

    c2, c1, vocab = model if model is not None else train_bigram_lm(
        docs, text_col, id_col)
    toks = _ws_tokens_col(F.lower(F.col(text_col)))
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    bg = (
        t.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    nlp = -F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(vocab)))
    )
    scored = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select("doc_id", nlp.alias("nlp"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.round(F.avg("nlp") * 1e6).cast("long").alias("nlp_e6"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "nlp_e6",
        )
    )


def duckdb_lm_sql(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Oracle for :func:`lm_score` (self-scoring shape): identical token,
    count, smoothing and rounding spec evaluated by DuckDB."""
    toks = duckdb_ws_tokens(f"lower({text_col})")
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
), bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM t, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), c2 AS (
  SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY 1, 2
), c1 AS (
  SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok)::BIGINT AS vocab
  FROM (SELECT unnest(t) AS tok FROM t)
), scored AS (
  SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
         CAST(round(avg(-ln((c2.c2 + 1.0) / (c1.c1 + v.vocab))) * 1e6)
              AS BIGINT) AS nlp_e6
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
  GROUP BY bg.doc_id
)
SELECT d.{id_col} AS doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
       s.nlp_e6
FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.doc_id
"""


# ---- C4 heuristic cleanup (Raffel et al. 2020 §2.2) ----------------------

C4_TERMINAL = (".", "!", "?", '"')


def c4_cols(text_col, min_line_words: int = 5, min_sentences: int = 3,
            bad_words: tuple = ()):
    """C4 cleanup rules (Raffel et al. 2020, *Exploring the Limits of
    Transfer Learning...*, §2.2) as pure column expressions — the
    line-level filter plus the page-level discards:

    - keep only lines that (a) end in terminal punctuation (``. ! ? "``
      after rtrim), (b) have ≥ ``min_line_words`` words, and (c) do not
      contain the word 'javascript' (case-insensitive) — returned
      re-joined as ``c4_clean_text``
    - ``c4_n_lines_kept``  lines surviving the filter
    - ``c4_n_sentences``   terminal-punctuation count of the kept text
      (the paper's ≥3-sentence page rule, approximated the standard way)
    - ``c4_has_lorem``     page contains 'lorem ipsum' (1/0)
    - ``c4_has_brace``     page contains '{' (the code discard) (1/0)
    - ``c4_bad_word_hits`` occurrences of ``bad_words`` entries as words
      (the paper uses a public blocklist; parameterized here, default
      empty — supply your deployment's list)
    - ``c4_pass``          1 iff sentences ≥ ``min_sentences`` and no
      lorem/brace/bad-word discard fired

    The paper's remaining rule — three-sentence-span dedup across the
    corpus — is :func:`..ops.dedup.strip_dup_spans` composed after this
    filter. Everything here is a narrow whole-stage-codegen map (line
    split, lambda filter, re-join): zero shuffle at any scale."""
    from pyspark.sql import functions as F

    lines = F.split(text_col, "\n")
    rt = lambda ln: F.rtrim(ln)  # noqa: E731
    ends_ok = lambda ln: F.array_contains(  # noqa: E731
        F.array(*[F.lit(c) for c in C4_TERMINAL]),
        F.substring(rt(ln), -1, 1))
    nwords = lambda ln: F.size(F.filter(  # noqa: E731
        F.split(rt(ln), r"\s+"), lambda w: w != ""))
    keep = F.filter(
        lines,
        lambda ln: ends_ok(ln) & (nwords(ln) >= min_line_words)
        & ~F.lower(ln).contains("javascript"),
    )
    clean = F.concat_ws("\n", keep)
    n_sent = (
        F.length(clean)
        - F.length(F.regexp_replace(clean, r"[.!?]", ""))
    ).cast("bigint")
    low = F.lower(text_col)
    bad_hits = F.lit(0).cast("bigint")
    if bad_words:
        ws = F.filter(F.split(low, r"\s+"), lambda w: w != "")
        bad_hits = F.size(
            F.filter(ws, lambda w: w.isin(*[b.lower() for b in bad_words]))
        ).cast("bigint")
    has_lorem = low.contains("lorem ipsum").cast("int")
    has_brace = text_col.contains("{").cast("int")
    c4_pass = (
        (n_sent >= min_sentences) & (has_lorem == 0) & (has_brace == 0)
        & (bad_hits == 0)
    ).cast("int")
    return (
        clean.alias("c4_clean_text"),
        F.size(keep).cast("bigint").alias("c4_n_lines_kept"),
        n_sent.alias("c4_n_sentences"),
        has_lorem.alias("c4_has_lorem"),
        has_brace.alias("c4_has_brace"),
        bad_hits.alias("c4_bad_word_hits"),
        c4_pass.alias("c4_pass"),
    )


def duckdb_c4_sql(text_col: str = "text", min_line_words: int = 5,
                  min_sentences: int = 3, bad_words: tuple = ()) -> str:
    """DuckDB mirror of :func:`c4_cols` (same rules, same names) — a
    column-list fragment for a SELECT over the same table."""
    term = "['.', '!', '?', '\"']"
    keep = (
        f"list_filter(string_split({text_col}, chr(10)), ln -> "
        f"list_contains({term}, substr(rtrim(ln), length(rtrim(ln)), 1)) "
        f"AND len(list_filter(string_split_regex(rtrim(ln), '\\s+'), "
        f"w -> w != '')) >= {min_line_words} "
        f"AND NOT contains(lower(ln), 'javascript'))"
    )
    # coalesce: DuckDB's array_to_string over an empty list is NULL,
    # Spark's concat_ws is ''
    clean = f"coalesce(array_to_string({keep}, chr(10)), '')"
    n_sent = (f"(length({clean}) - length(regexp_replace({clean}, "
              f"'[.!?]', '', 'g')))::BIGINT")
    if bad_words:
        bl = "[" + ", ".join(f"'{b.lower()}'" for b in bad_words) + "]"
        bad = (f"len(list_filter(list_filter(string_split_regex("
               f"lower({text_col}), '\\s+'), w -> w != ''), "
               f"w -> list_contains({bl}, w)))::BIGINT")
    else:
        bad = "0::BIGINT"
    lorem = f"contains(lower({text_col}), 'lorem ipsum')::INT"
    brace = f"contains({text_col}, '{{')::INT"
    return (
        f"{clean} AS c4_clean_text, "
        f"len({keep})::BIGINT AS c4_n_lines_kept, "
        f"{n_sent} AS c4_n_sentences, "
        f"{lorem} AS c4_has_lorem, "
        f"{brace} AS c4_has_brace, "
        f"{bad} AS c4_bad_word_hits, "
        f"({n_sent} >= {min_sentences} AND {lorem} = 0 AND {brace} = 0 "
        f"AND {bad} = 0)::INT AS c4_pass"
    )


# ---- DSIR importance weights (Xie et al. 2023) ---------------------------

def _dsir_features(df, text_col: str, id_col: str, buckets: int):
    """(doc_id, bucket) feature stream — the DSIR hashed unigram+bigram
    space. Bucket = first 60 bits of md5(gram) mod ``buckets`` (md5 so
    the DuckDB oracle computes the SAME buckets — the module-wide
    cross-engine hashing rule).

    The token array is PROJECTED before the bigram lambda touches it:
    ``element_at`` over a raw expression re-evaluates the whole regexp
    split per element (O(len²) splits — measured 4× the scan cost at
    sf0.1), over a projected column it is one array access. The bucket
    hash runs on the exploded gram column for the same reason."""
    from pyspark.sql import functions as F

    tk = df.select(F.col(id_col).alias("doc_id"),
                   _ws_tokens_col(F.lower(F.col(text_col))).alias("_t"))
    t = F.col("_t")
    bi = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return tk.select(
        "doc_id", F.explode(F.concat(t, bi)).alias("_g")
    ).select(
        "doc_id",
        (F.conv(F.substring(F.md5(F.col("_g").cast("binary")), 1, 15),
                16, 10).cast("long") % buckets).alias("bucket"),
    )


def dsir_logweights(raw, target, text_col: str = "text",
                    id_col: str = "doc_id", buckets: int = 10_000):
    """DSIR importance weights (Xie et al. 2023, *Data Selection for
    Language Models via Importance Resampling*): score every raw doc by
    how target-like its hashed-n-gram profile is. Features are word
    unigrams+bigrams of the lowercased text hashed into ``buckets``
    (:func:`_dsir_features` — the paper's hashed feature space);
    bucket distributions are add-one-smoothed over the ``target`` and
    ``raw`` corpora (p_b = (t_b+1)/(T+B), q_b = (r_b+1)/(R+B)); the log
    importance weight of a doc is Σ over its feature occurrences of
    ln p_b − ln q_b.

    Returns one row per raw doc: (doc_id, n_feats, logw_e6) with
    logw_e6 = round(log w · 10⁶) as BIGINT (cross-engine hashable;
    featureless docs score 0 — weight 1). Resampling = compose with
    :func:`quality_percentile_filter(score_col='logw_e6')` for the
    deterministic top-weight selection (the paper's Gumbel-noise
    variant is one seeded-hash noise column away).

    Scale shape (the :func:`lm_score` pattern, one-pass stats): ONE
    tagged-union hash aggregation over target+raw features whose output
    is ≤ 2·``buckets`` rows (sub-linear — collected once to build the
    per-bucket score table on the driver), the score table broadcast to
    the raw feature stream, one partial-aggregated per-doc fold — total
    corpus-proportional work is exactly two raw feature scans + one
    target scan, no windows, no per-row Python."""
    import math

    from pyspark.sql import functions as F

    def feats(df):
        return _dsir_features(df, text_col, id_col, buckets)

    cnt = (
        feats(target).select("bucket", F.lit(1).alias("is_t"))
        .unionAll(feats(raw).select("bucket", F.lit(0).alias("is_t")))
        .groupBy("bucket", "is_t").agg(F.count("*").alias("c"))
        .collect()  # ≤ 2·buckets rows regardless of corpus size
    )
    t_b = {r["bucket"]: r["c"] for r in cnt if r["is_t"] == 1}
    r_b = {r["bucket"]: r["c"] for r in cnt if r["is_t"] == 0}
    tden = float(sum(t_b.values()) + buckets)
    rden = float(sum(r_b.values()) + buckets)
    lw_rows = [
        (b, math.log((t_b.get(b, 0) + 1.0) / tden)
            - math.log((c + 1.0) / rden))
        for b, c in sorted(r_b.items())
    ]
    lw = raw.sparkSession.createDataFrame(lw_rows, "bucket long, lw double")
    scored = (
        feats(raw).join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"),
             F.round(F.sum("lw") * 1e6).cast("long").alias("logw_e6"))
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce("logw_e6", F.lit(0)).alias("logw_e6"),
        )
    )


def vocab_shift(corpus_a, corpus_b, text_col: str = "text",
                id_col: str = "doc_id", buckets: int = 64):
    """Token-distribution drift monitor between two corpus snapshots —
    the check a training pipeline runs crawl-over-crawl (or between a
    source mix and its predecessor) to catch silent distribution shift
    before it reaches training. Features are the DSIR hashed
    unigram+bigram buckets (:func:`_dsir_features` — md5, the
    module-wide cross-engine hashing rule); each corpus's bucket
    distribution is add-one-smoothed (p_b = (c_b+1)/(C+B)); the output
    is one row per bucket 0..B−1 with both counts, both probabilities
    and the bucket's Jensen-Shannon contribution —
    ``Σ js_e9 / 1e9`` is the corpus-level JS divergence (0 = identical
    distributions, ln 2 ≈ 0.693 = disjoint; symmetric and bounded,
    unlike raw KL). Sorting by js_e9 desc names the most-shifted
    buckets — the drill-down a drift alert links to.

    Spark shape: two feature scans (corpus-proportional, the only big
    work) each partial-aggregating to ≤B rows; the rest is a B-row
    frame — a `range(B)` spine left-joined to both count sides, one
    broadcast totals row, pure codegen math. Zero windows, zero driver
    loops, output exactly ``buckets`` rows at any corpus size."""
    from pyspark.sql import functions as F

    spark = corpus_a.sparkSession
    f_a = (_dsir_features(corpus_a, text_col, id_col, buckets)
           .groupBy("bucket").agg(F.count("*").alias("c_a")))
    f_b = (_dsir_features(corpus_b, text_col, id_col, buckets)
           .groupBy("bucket").agg(F.count("*").alias("c_b")))
    base = spark.range(int(buckets)).select(
        F.col("id").cast("long").alias("bucket"))
    j = (base.join(f_a, "bucket", "left").join(f_b, "bucket", "left")
         .fillna(0, ["c_a", "c_b"]))
    tot = j.agg(F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb"))
    j = j.crossJoin(F.broadcast(tot))
    pa = (F.col("c_a") + 1.0) / (F.col("ta").cast("double") + buckets)
    pb = (F.col("c_b") + 1.0) / (F.col("tb").cast("double") + buckets)
    m = (pa + pb) / 2.0
    js = 0.5 * pa * F.log(pa / m) + 0.5 * pb * F.log(pb / m)
    return (j.select(
        "bucket",
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        F.round(pa * 1e9).cast("long").alias("p_a_e9"),
        F.round(pb * 1e9).cast("long").alias("p_b_e9"),
        F.round(js * 1e9).cast("long").alias("js_e9"),
    ).orderBy("bucket"))


def duckdb_vocab_shift_sql(table: str = "documents",
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           where_a: str = "doc_id % 2 = 0",
                           where_b: str = "doc_id % 2 = 1",
                           buckets: int = 64) -> str:
    """Oracle for :func:`vocab_shift` with the two corpora defined as
    WHERE slices of one table: identical md5 feature buckets, smoothing
    and the literally mirrored JS expression shape."""
    toks = duckdb_ws_tokens(f"lower({text_col})")
    grams = (
        f"list_concat({toks}, "
        f"list_transform(range(1, greatest(len({toks}), 1)), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1]))"
    )
    bucket = ("(('0x' || substr(md5(g), 1, 15))::UBIGINT "
              f"% {buckets})::BIGINT")
    return f"""
WITH ga AS (
  SELECT {bucket} AS bucket, count(*)::BIGINT AS c_a
  FROM (SELECT unnest({grams}) AS g FROM {table} WHERE {where_a})
  GROUP BY 1
), gb AS (
  SELECT {bucket} AS bucket, count(*)::BIGINT AS c_b
  FROM (SELECT unnest({grams}) AS g FROM {table} WHERE {where_b})
  GROUP BY 1
), base AS (
  SELECT unnest(range({buckets}))::BIGINT AS bucket
), j AS (
  SELECT base.bucket, coalesce(ga.c_a, 0) AS c_a,
         coalesce(gb.c_b, 0) AS c_b
  FROM base LEFT JOIN ga USING (bucket) LEFT JOIN gb USING (bucket)
), t AS (
  SELECT sum(c_a)::DOUBLE AS ta, sum(c_b)::DOUBLE AS tb FROM j
), e AS (
  SELECT j.bucket, j.c_a, j.c_b,
         (j.c_a + 1.0) / (t.ta + {buckets}) AS pa,
         (j.c_b + 1.0) / (t.tb + {buckets}) AS pb
  FROM j CROSS JOIN t
)
SELECT bucket, c_a, c_b,
       CAST(round(pa * 1e9) AS BIGINT) AS p_a_e9,
       CAST(round(pb * 1e9) AS BIGINT) AS p_b_e9,
       CAST(round((0.5 * pa * ln(pa / ((pa + pb) / 2.0))
                   + 0.5 * pb * ln(pb / ((pa + pb) / 2.0))) * 1e9)
            AS BIGINT) AS js_e9
FROM e ORDER BY bucket"""


_GUMBEL_M = 1 << 52  # md5-derived uniform resolution for the Gumbel trick


def dsir_gumbel_select(weights, k: int = 100, temperature: float = 1.0,
                       seed: int = 42):
    """The DSIR resampling step proper (Xie et al. 2023 §2: draw k docs
    without replacement with probability ∝ w^(1/T)) via the Gumbel-top-k
    trick: key_i = log w_i / T + g_i with g_i standard Gumbel noise; the
    k largest keys are exactly a weighted sample without replacement.

    The noise is DERIVED, not random: u = (md5(seed ':' doc_id)'s first
    52 bits + 1) / (2^52 + 1) ∈ (0, 1), g = −ln(−ln u) — so the same
    (seed, corpus) always selects the same k docs (retry-safe on a
    cluster, mirrorable by the DuckDB oracle; the module-wide
    cross-engine hashing rule). Input is a :func:`dsir_logweights`
    frame; returns (doc_id, n_feats, logw_e6, gumbel_key_e6, kept).

    Scale: the only non-map work is the global top-k — a
    TakeOrderedAndProject (sort+limit, per-partition heads then one
    k-row reduce) whose k rows broadcast back as the kept flag. No
    global window, no single-partition sort."""
    from pyspark.sql import functions as F

    M = _GUMBEL_M
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)),
                              F.col("doc_id").cast("string"))
                  .cast("binary")),
            1, 15),
        16, 10,
    ).cast("long")
    u = ((h % M) + 1).cast("double") / float(M + 1)
    key = (F.col("logw_e6") / 1e6 / float(temperature)
           - F.log(-F.log(u)))
    wk = weights.select(
        "doc_id", "n_feats", "logw_e6",
        F.round(key * 1e6).cast("long").alias("gumbel_key_e6"),
        key.alias("_key"),
    )
    top = (wk.orderBy(F.desc("_key"), F.asc("doc_id")).limit(int(k))
           .select("doc_id", F.lit(1).alias("_kept")))
    return (
        wk.join(F.broadcast(top), "doc_id", "left")
        .select("doc_id", "n_feats", "logw_e6", "gumbel_key_e6",
                F.coalesce("_kept", F.lit(0)).cast("int").alias("kept"))
    )


def duckdb_dsir_gumbel_sql(table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text",
                           target_where: str = "lang = 'en'",
                           buckets: int = 10_000, k: int = 100,
                           temperature: float = 1.0,
                           seed: int = 42) -> str:
    """Oracle for :func:`dsir_gumbel_select` over
    :func:`dsir_logweights`: identical md5-derived uniforms, Gumbel keys
    and top-k cut."""
    M = _GUMBEL_M
    u = (f"((('0x' || substr(md5('{seed}:' || doc_id), 1, 15))::UBIGINT "
         f"% {M} + 1) / {M + 1}.0)")
    return f"""
WITH w AS ({duckdb_dsir_sql(table, id_col, text_col, target_where, buckets)}),
ky AS (
  SELECT doc_id, n_feats, logw_e6,
         logw_e6 / 1e6 / {temperature!r} - ln(-ln({u})) AS key
  FROM w
), r AS (
  SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rn FROM ky
)
SELECT doc_id, n_feats, logw_e6,
       CAST(round(key * 1e6) AS BIGINT) AS gumbel_key_e6,
       (rn <= {k})::INT AS kept
FROM r
"""


def duckdb_dsir_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text", target_where: str = "lang = 'en'",
                    buckets: int = 10_000) -> str:
    """Oracle for :func:`dsir_logweights` with the target corpus defined
    as ``SELECT ... FROM {table} WHERE {target_where}`` (the gate derives
    its target slice from the same view): identical feature buckets
    (md5-based), smoothing and rounding."""
    toks = duckdb_ws_tokens(f"lower({text_col})")
    grams = (
        f"list_concat({toks}, "
        f"list_transform(range(1, greatest(len({toks}), 1)), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1]))"
    )
    bucket = "(('0x' || substr(md5(g), 1, 15))::UBIGINT % {b})::BIGINT" \
        .format(b=buckets)
    return f"""
WITH fr AS (
  SELECT {id_col} AS doc_id, {bucket} AS bucket
  FROM (SELECT {id_col}, unnest({grams}) AS g FROM {table})
), ftg AS (
  SELECT {bucket} AS bucket, count(*)::BIGINT AS t_b
  FROM (SELECT unnest({grams}) AS g FROM {table} WHERE {target_where})
  GROUP BY 1
), frg AS (
  SELECT bucket, count(*)::BIGINT AS r_b FROM fr GROUP BY 1
), sums AS (
  SELECT (SELECT coalesce(sum(t_b), 0) FROM ftg)::DOUBLE AS tsum,
         (SELECT coalesce(sum(r_b), 0) FROM frg)::DOUBLE AS rsum
), lw AS (
  SELECT frg.bucket,
         ln((coalesce(ftg.t_b, 0) + 1.0) / (s.tsum + {buckets}))
         - ln((frg.r_b + 1.0) / (s.rsum + {buckets})) AS lw
  FROM frg LEFT JOIN ftg USING (bucket) CROSS JOIN sums s
), scored AS (
  SELECT fr.doc_id, count(*)::BIGINT AS n_feats,
         CAST(round(sum(lw.lw) * 1e6) AS BIGINT) AS logw_e6
  FROM fr JOIN lw USING (bucket) GROUP BY fr.doc_id
)
SELECT d.{id_col} AS doc_id, coalesce(s.n_feats, 0) AS n_feats,
       coalesce(s.logw_e6, 0) AS logw_e6
FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.doc_id
"""


# ---- Gopher rule filter (Rae et al. 2021, Table A1 quality rules) --------

# The 8 "required word" function words of the Gopher rule set; a doc must
# contain at least `min_stop_hits` distinct ones.
GOPHER_REQUIRED = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_cols(text_col,
                min_words: int = 50, max_words: int = 100_000,
                min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
                max_symbol_ratio: float = 0.1, max_bullet_ratio: float = 0.9,
                max_ellipsis_ratio: float = 0.3, min_alpha_frac: float = 0.8,
                min_stop_hits: int = 2):
    """Per-document Gopher rule columns (Rae et al. 2021, *Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher*, Table A1) —
    the standard pre-training quality gate, as pure JVM column expressions
    (no Python, no shuffle; a narrow map at 100 TB):

    - ``n_words``            whitespace tokens
    - ``mean_word_len``      mean characters per word
    - ``frac_alpha_words``   fraction of words containing >=1 [A-Za-z]
    - ``symbol_ratio``       ('#' + '...') occurrences per word
    - ``bullet_ratio``       fraction of lines starting with -, * or •
    - ``ellipsis_line_ratio``fraction of lines ending with '...' or '…'
    - ``stop_hits``          distinct GOPHER_REQUIRED words present
    - ``gopher_pass``        1 iff every rule passes (thresholds above are
                             the paper's defaults; all keyword-tunable)

    Ratio columns are rounded to 4dp for display; the pass flag compares
    the UNROUNDED values (both engines divide the same exact integers, so
    IEEE doubles — and therefore comparisons — agree bit-for-bit).
    The repetition rules of the same table live in :func:`repetition_cols`.
    """
    from pyspark.sql import functions as F

    ws = _ws_tokens_col(text_col)
    n_words = F.size(ws)
    nw_d = n_words.cast("double")
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    sum_len = F.aggregate(ws, F.lit(0).cast("long"),
                          lambda acc, x: acc + F.length(x))
    mean_wl = safe(sum_len, nw_d)

    alpha_words = F.size(F.filter(ws, lambda x: x.rlike("[A-Za-z]")))
    frac_alpha = safe(alpha_words, nw_d)

    n_hash = F.length(text_col) - F.length(F.replace(text_col, F.lit("#")))
    n_ell = ((F.length(text_col)
              - F.length(F.replace(text_col, F.lit("...")))) / 3).cast("long")
    symbol_ratio = safe(n_hash + n_ell, nw_d)

    lines = F.split(text_col, "\n")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(
        lines, lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•")))
    bullet_ratio = safe(bullet, n_lines.cast("double"))
    ell_lines = F.size(F.filter(
        lines, lambda l: F.endswith(F.rtrim(l), F.lit("..."))
        | F.endswith(F.rtrim(l), F.lit("…"))))
    ellipsis_ratio = safe(ell_lines, n_lines.cast("double"))

    lws = F.transform(ws, lambda x: F.lower(x))
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(w) for w in GOPHER_REQUIRED]),
        lambda w: F.array_contains(lws, w)))

    gpass = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        & (symbol_ratio < max_symbol_ratio)
        & (bullet_ratio < max_bullet_ratio)
        & (ellipsis_ratio < max_ellipsis_ratio)
        & (frac_alpha >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return (
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(frac_alpha, 4).alias("frac_alpha_words"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_ratio, 4).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 4).alias("ellipsis_line_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        gpass.cast("int").alias("gopher_pass"),
    )


def duckdb_gopher_sql(col_sql: str,
                      min_words: int = 50, max_words: int = 100_000,
                      min_mean_word_len: float = 3.0,
                      max_mean_word_len: float = 10.0,
                      max_symbol_ratio: float = 0.1,
                      max_bullet_ratio: float = 0.9,
                      max_ellipsis_ratio: float = 0.3,
                      min_alpha_frac: float = 0.8,
                      min_stop_hits: int = 2) -> str:
    """SELECT-list fragment mirroring :func:`gopher_cols` exactly."""
    ws = duckdb_ws_tokens(col_sql)
    n_words = f"len({ws})"
    safe = lambda num, den: f"(CASE WHEN {den} > 0 THEN ({num})::DOUBLE / {den} ELSE 0.0 END)"
    sum_len = f"list_sum(list_transform({ws}, x -> length(x)))"
    mean_wl = safe(f"coalesce({sum_len}, 0)", n_words)
    alpha = f"len(list_filter({ws}, x -> regexp_matches(x, '[A-Za-z]')))"
    frac_alpha = safe(alpha, n_words)
    n_hash = f"(length({col_sql}) - length(replace({col_sql}, '#', '')))"
    n_ell = f"((length({col_sql}) - length(replace({col_sql}, '...', ''))) // 3)"
    symbol_ratio = safe(f"{n_hash} + {n_ell}", n_words)
    lines = f"string_split({col_sql}, chr(10))"
    n_lines = f"len({lines})"
    bullet = (f"len(list_filter({lines}, "
              f"l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))")
    bullet_ratio = safe(bullet, n_lines)
    ell = (f"len(list_filter({lines}, "
           f"l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))")
    ellipsis_ratio = safe(ell, n_lines)
    lws = f"list_transform({ws}, x -> lower(x))"
    req = _duck_list(GOPHER_REQUIRED)
    stop_hits = f"len(list_filter({req}, w -> list_contains({lws}, w)))"
    gpass = (
        f"(({n_words} >= {min_words}) AND ({n_words} <= {max_words}) "
        f"AND ({mean_wl} >= {min_mean_word_len}) AND ({mean_wl} <= {max_mean_word_len}) "
        f"AND ({symbol_ratio} < {max_symbol_ratio}) "
        f"AND ({bullet_ratio} < {max_bullet_ratio}) "
        f"AND ({ellipsis_ratio} < {max_ellipsis_ratio}) "
        f"AND ({frac_alpha} >= {min_alpha_frac}) "
        f"AND ({stop_hits} >= {min_stop_hits}))"
    )
    return (
        f"{n_words}::BIGINT AS n_words, "
        f"round({mean_wl}, 4) AS mean_word_len, "
        f"round({frac_alpha}, 4) AS frac_alpha_words, "
        f"round({symbol_ratio}, 4) AS symbol_ratio, "
        f"round({bullet_ratio}, 4) AS bullet_ratio, "
        f"round({ellipsis_ratio}, 4) AS ellipsis_line_ratio, "
        f"{stop_hits}::BIGINT AS stop_hits, "
        f"({gpass})::INT AS gopher_pass"
    )


# ---- context-window chunking (training-sequence preprocessing) -----------

def chunk_windows(docs, size: int = 512, stride: int = 384,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Split each document's whitespace tokens into fixed-``size`` windows
    advancing by ``stride`` tokens (overlap = size - stride), the standard
    context-window chunking step before tokenizer packing. Returns
    (doc_id, chunk_idx, chunk_start, n_tokens, chunk_text) with 1-based
    inclusive token positions; the final window may be shorter, windows
    cover every token, and a doc with <= size tokens yields exactly one
    window. Docs with zero tokens are dropped.

    Physical shape: split/sequence/posexplode — one JVM-side Generate over
    a narrow map, no shuffle, no Python; output rows ~= corpus_tokens /
    stride regardless of document skew (one 10^9-token doc explodes into
    rows, never into one task's memory as a group)."""
    from pyspark.sql import functions as F

    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    toks = _ws_tokens_col(F.col(text_col))
    d = (docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
             .withColumn("n", F.size("toks"))
             .where(F.col("n") > 0))
    n = F.col("n")
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        1 + F.floor(((n - size) + (stride - 1)) / stride).cast("int"))
    out = (
        d.select("doc_id", "toks", "n",
                 F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
                  .alias("chunk_idx", "_k"))
         .withColumn("chunk_start", F.lit(1) + F.col("_k") * stride)
         .withColumn("chunk_toks", F.slice("toks", F.col("chunk_start"), size))
         .select(
             "doc_id",
             F.col("chunk_idx").cast("long").alias("chunk_idx"),
             F.col("chunk_start").cast("long").alias("chunk_start"),
             F.size("chunk_toks").cast("long").alias("n_tokens"),
             F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
         )
    )
    return out


def duckdb_chunks_sql(table: str = "documents", size: int = 512,
                      stride: int = 384, text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """Oracle for :func:`chunk_windows` — identical window arithmetic."""
    toks = duckdb_ws_tokens(text_col)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {toks} AS toks, len({toks}) AS n
  FROM {table}
), nz AS (
  SELECT * FROM d WHERE n > 0
), k AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CASE WHEN n <= {size} THEN 1
                         ELSE 1 + (n - {size} + {stride} - 1) // {stride} END)) AS k
  FROM nz
)
SELECT doc_id, k::BIGINT AS chunk_idx, (1 + k * {stride})::BIGINT AS chunk_start,
       (least(k * {stride} + {size}, n) - k * {stride})::BIGINT AS n_tokens,
       array_to_string(toks[(1 + k * {stride}):least(k * {stride} + {size}, n)], ' ')
         AS chunk_text
FROM k
"""


def top_ngrams(df, text_col: str = "text", n: int = 3, k: int = 50):
    """Corpus-wide word n-gram heavy hitters: the ``k`` most frequent
    whitespace-token n-grams by (count desc, ngram asc) — the standard
    corpus-analysis probe for boilerplate and template text (the same
    n-gram spec the per-doc ``repetition_cols`` fractions use, lifted to a
    corpus aggregate).

    Scale shape: JVM-side transform/explode (no Python), one partial-agg
    groupBy shuffle on the n-gram, then ``TakeOrderedAndProject`` for the
    top-k — identical to the dictionary fold. The total order makes the
    result deterministic under ties at the k boundary."""
    from pyspark.sql import functions as F

    w = _ws_tokens_col(F.col(text_col))
    grams = F.when(
        F.size(w) >= n,
        F.transform(F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))
    return (df.select(F.explode(grams).alias("ngram"))
              .groupBy("ngram").agg(F.count("*").alias("n_occur"))
              .orderBy(F.desc("n_occur"), F.asc("ngram")).limit(k))


def duckdb_top_ngrams_sql(table: str = "documents", text_col: str = "text",
                          n: int = 3, k: int = 50) -> str:
    """Oracle for :func:`top_ngrams` — identical window + order spec."""
    toks = duckdb_ws_tokens(f"coalesce({text_col}, '')")
    return f"""
WITH toks AS (
  SELECT {toks} AS w FROM {table}
), grams AS (
  SELECT array_to_string(list_slice(w, i, i + {n} - 1), ' ') AS ngram
  FROM toks, UNNEST(range(1, len(w) - {n} + 2)) AS t(i)
  WHERE len(w) >= {n}
)
SELECT ngram, count(*)::BIGINT AS n_occur FROM grams GROUP BY ngram
ORDER BY n_occur DESC, ngram ASC LIMIT {k}
"""


# ---- highlighting ----------------------------------------------------------

def highlight_fragments(text: str, terms: list[str], max_frags: int = 3,
                        frag_gap: int = 80, pad: int = 20,
                        pre: str = "<em>", post: str = "</em>") -> list[dict]:
    """Tagged highlight fragments for ONE document — the Lucene
    highlighter-module analog (Highlighter + SimpleHTMLFormatter over a
    stored field; the reference serves only the ±line summary of
    SearchMixer.java:79-89, so this is the beyond-parity hit-presentation
    surface).

    Matching is TOKENIZER-exact, not substring: base tokens come from the
    spec regex with char offsets, and a token matches when it equals a
    query term or one of its camel/separator sub-tokens does (so the
    query term ``parse`` highlights the whole token ``parseQuery`` —
    Lucene's TokenSources offsets behave the same way). Deterministic
    fragmenting: matched token spans sort by offset, spans whose gap ≤
    ``frag_gap`` chars merge into one fragment, fragments rank by
    (match count desc, start asc), the top ``max_frags`` re-sort by
    start, and each fragment carries ``pad`` chars of context with
    every matched span wrapped in ``pre``/``post``.

    Returns [{fragment, n_matches, start, end}] — start/end are char
    offsets of the UNTAGGED fragment in the original text. Pure Python:
    the engine calls it driver-side for one served page (point-lookup
    cost), never inside a distributed plan."""
    from ..tokenizer import _BASE_RE, _cached_subtokens

    tset = {t for t in terms if t and ":" not in t}
    if not text or not tset:
        return []
    spans = []
    for m in _BASE_RE.finditer(text):
        tok = m.group(0)
        if tok in tset or any(s in tset for s in _cached_subtokens(tok)):
            spans.append((m.start(), m.end()))
    if not spans:
        return []
    groups: list[list[tuple]] = [[spans[0]]]
    for s in spans[1:]:
        if s[0] - groups[-1][-1][1] <= frag_gap:
            groups[-1].append(s)
        else:
            groups.append([s])
    ranked = sorted(range(len(groups)),
                    key=lambda i: (-len(groups[i]), groups[i][0][0]))
    keep = sorted(ranked[:max_frags])
    out = []
    for i in keep:
        g = groups[i]
        fs = max(0, g[0][0] - pad)
        fe = min(len(text), g[-1][1] + pad)
        parts, cur = [], fs
        for s, e in g:
            parts.append(text[cur:s])
            parts.append(pre + text[s:e] + post)
            cur = e
        parts.append(text[cur:fe])
        out.append({"fragment": "".join(parts), "n_matches": len(g),
                    "start": fs, "end": fe})
    return out
