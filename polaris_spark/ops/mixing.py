"""Data-mixing operators for training-data pipelines: deterministic
stratified sampling, token-budget mixture selection, and context-window
sequence packing.

These are the steps between curation and the trainer: given a cleaned
corpus, (1) subsample each source at its mixture rate, (2) cap each source
at a token budget, (3) pack the surviving documents into contiguous
context-window bins. The reference engine has no such surface (it is a code
search index); these belong to the LLM-data-pipeline extension the same way
dedup/quality/langid do.

All three are defined by arithmetic specs implementable identically in
Spark column expressions (JVM-side, zero Python) and DuckDB SQL, so every
op is value-hash gated:

- sample_hash:  a 31-bit xor-shift-multiply mixer (murmur-finalizer
  shape): h = (id + seed) mod 2^31, then twice h = ((h ⊕ h>>15)·A) mod
  2^31 with golden-ratio multipliers, then h ⊕= h>>16; the draw is
  h mod 10^6. Every intermediate stays below 2^63, so BIGINT arithmetic
  is exact (no wraparound) in BOTH engines; the xor-shift rounds break
  the linearity that would otherwise correlate the draw with id-stride
  patterns (round-robin source assignment). A row is kept when the draw
  < round(rate·10^6). NOTE: for Spark-only pipelines
  ``pmod(xxhash64(id, seed), 10^6)`` remains the stronger choice; this
  spec trades a few avalanche bits for a cross-engine-checkable oracle.
- split_assign:  disjoint named splits (train/val/test) from the SAME
  draw: split = first name (name-sorted) whose cumulative threshold
  exceeds the draw, else the default split. Zero shuffle; each split
  owns a contiguous hash interval (see the function docstring for the
  monotone-growth property).
- token_budget: within each group (ordered by id, tie-broken by
  copy_idx when present) keep rows while the INCLUSIVE running sum of
  whitespace-token counts stays ≤ budget — the "first N tokens of each
  source" mixture rule.
- pack:         within each group (ordered by id), bin = floor(exclusive
  running token sum / capacity) — contiguous chunking: a bin takes
  consecutive docs until their cumulative tokens cross the capacity, and
  the straddling doc belongs to the bin where it started, so a bin may
  overflow by < its last doc's length. Docs are never split (document-
  boundary packing); docs longer than the capacity get a bin of their own
  by the same rule. This is the standard greedy sequential packer
  (first-fit on a stream), not global bin-packing — deterministic,
  single-pass, and window-expressible.

Scale notes (100 TB): sampling is a pure map-side filter — zero shuffle,
pushed predicates intact. Budget/pack specs are per-group sequential BY
DEFINITION (the order defines the bins) — but the IMPLEMENTATION is not
one-task-per-group: the running sums run as a two-pass range-exchange
global cumsum (`_global_keyed_cumsum`, same shape as `shuffle_rows`), so
a single source spans many partitions and parallelism ∝ partitions, not
∝ |sources|. The driver sees only per-(partition, key) subtotal longs.
"""

from __future__ import annotations

_MOD = 2_147_483_648  # 2^31
_MULT1 = 2_654_435_761  # golden-ratio multipliers (Knuth / murmur-ish)
_MULT2 = 1_597_334_677
_RES = 1_000_000  # rate resolution: micro-units


def sample_hash_col(id_col, seed: int = 0):
    """The spec's deterministic per-row draw in [0, 10^6) as a Column."""
    from pyspark.sql import functions as F

    h = F.pmod(F.col(id_col).cast("long") + F.lit(int(seed)), F.lit(_MOD))
    for mult in (_MULT1, _MULT2):
        h = (h.bitwiseXOR(F.shiftrightunsigned(h, 15)) * F.lit(mult)) \
            % F.lit(_MOD)
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 16))
    return F.pmod(h, F.lit(_RES))


def stratified_sample(df, rates: dict[str, float], default_rate: float = 1.0,
                      key: str = "source", id_col: str = "doc_id",
                      seed: int = 0):
    """Deterministic per-group mixture sampling: keep each row of group g
    with probability ``rates.get(g, default_rate)``, decided by the row's
    id hash alone — reproducible across runs, partitionings and engines,
    and a pure map-side filter (zero shuffle; scan pushdown unaffected).

    Returns the input rows plus ``mix_u`` (the draw) and ``kept``; filter
    on ``kept`` for the sampled corpus. Keeping the rejected rows visible
    makes the op auditable (and value-hash gateable end to end)."""
    from pyspark.sql import functions as F

    u = sample_hash_col(id_col, seed)
    thr = F.lit(int(round(default_rate * _RES)))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(key) == g, F.lit(int(round(r * _RES)))) \
            .otherwise(thr)
    return df.withColumn("mix_u", u).withColumn("kept", F.col("mix_u") < thr)


def split_assign(df, fractions: dict[str, float], default_split: str = "train",
                 id_col: str = "doc_id", seed: int = 0):
    """Deterministic disjoint train/val/test split: each row's named split
    is decided by the same cross-engine-exact id hash as
    ``stratified_sample`` — stacked cumulative thresholds over
    ``fractions`` (name-sorted), remaining mass → ``default_split``.

    Properties a training pipeline needs and ad-hoc ``rand()`` splits
    lack: reproducible across runs/partitionings/engines, a pure map-side
    projection (ZERO shuffle, scan pushdown intact), and disjoint +
    exhaustive by construction. Each split owns a contiguous hash
    interval [lo, hi) under name-sorted stacking, so growing a split's
    fraction while name-earlier fractions stay fixed yields a SUPERSET
    of its previous membership (monotone eval-set growth); all churn is
    confined to interval boundaries. Returns rows + ``split_u`` (the
    draw) + ``split``."""
    from pyspark.sql import functions as F

    u = sample_hash_col(id_col, seed)
    expr, lo = None, 0
    for name, frac in sorted(fractions.items()):
        hi = lo + int(round(frac * _RES))
        cond = F.col("split_u") < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
        lo = hi
    split = F.lit(default_split) if expr is None \
        else expr.otherwise(F.lit(default_split))
    return df.withColumn("split_u", u).withColumn("split", split)


def _order_cols(df, id_col: str, order_cols) -> list[str]:
    """Resolve the per-group ordering identity for the cumulative mixers.

    Default: ``[id_col]``, auto-extended with ``copy_idx`` when
    :func:`upsample_epochs` ran upstream — the copies share ``id_col``,
    so ordering by id alone would leave tie order (and therefore bin
    assignment / budget ``kept`` flags) nondeterministic across runs and
    partitionings. ``(id_col, copy_idx)`` restores a total order and the
    module's determinism guarantee."""
    if order_cols is not None:
        return list(order_cols)
    return [id_col] + (["copy_idx"] if "copy_idx" in df.columns else [])


def _global_keyed_cumsum(slim, key: str, order_cols: list[str],
                         val_col: str, cum_col: str, inclusive: bool):
    """Scale-safe per-key running sum — the two-pass range-exchange
    global-cumsum (same shape as :func:`shuffle_rows`), replacing
    ``Window.partitionBy(key).orderBy(...)`` whose partition is ONE task:
    at 100 TB with a handful of sources, each source's entire row stream
    would serialize through a single executor thread.

    Plan: (1) range-exchange the slim ``(key, *order_cols, val)`` frame
    on ``(key, *order_cols)`` — Spark's ordinary global-sort shuffle, so
    one source SPANS MANY partitions in order; (2) per-(partition, key)
    subtotals (one long each — npart × |keys| rows, never row data) come
    to the driver; (3) prefix offsets go back in the closure and each
    partition numbers its own rows in ``mapInPandas`` (batches arrive in
    stored order). The frame is localCheckpoint-pinned between the
    passes so both see identical partition boundaries. Long arithmetic
    throughout, so the result is bit-identical to the window form.

    Requires ``(key, *order_cols)`` to be a non-null unique row identity
    (callers join the cum column back on ``order_cols``).
    """
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = slim.sparkSession
    npart = max(1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    keyed = (
        slim
        .repartitionByRange(npart, key, *order_cols)
        .sortWithinPartitions(key, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sub = keyed.groupBy("_pid", key).agg(
        F.sum(val_col).cast("long").alias("s")).collect()
    offsets, totals = {}, {}
    for r in sorted(sub, key=lambda r: int(r["_pid"])):
        k = r[key]
        offsets[(int(r["_pid"]), k)] = totals.get(k, 0)
        totals[k] = totals.get(k, 0) + int(r["s"])

    out_schema = T.StructType(
        [f for f in keyed.schema.fields if f.name != "_pid"]
        + [T.StructField(cum_col, T.LongType(), False)]
    )

    def _accumulate(batches):
        carry, pid = {}, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            vals = pdf[val_col].astype("int64")
            incl = vals.groupby(pdf[key], sort=False, dropna=False) \
                .cumsum().to_numpy()
            base = np.fromiter(
                (carry.get(k, offsets.get((pid, k), 0))
                 for k in pdf[key]),
                dtype=np.int64, count=len(pdf))
            cum = incl + base
            batch_sums = vals.groupby(
                pdf[key], sort=False, dropna=False).sum()
            for k, s in batch_sums.items():
                carry[k] = carry.get(k, offsets.get((pid, k), 0)) + int(s)
            pdf = pdf.drop(columns=["_pid"])
            pdf[cum_col] = cum if inclusive else cum - vals.to_numpy()
            yield pdf

    return keyed.mapInPandas(_accumulate, out_schema)


def token_budget(df, budgets: dict[str, int], default_budget: int,
                 key: str = "source", id_col: str = "doc_id",
                 text_col: str = "text", order_cols=None):
    """Per-group token-budget mixture: within each group (``order_cols``
    order — ``(id)`` or ``(id, copy_idx)``, see :func:`_order_cols`),
    keep rows while the inclusive running whitespace-token sum ≤ the
    group's budget. Returns rows + (n_ws_tokens, cum_tokens, kept).

    Scale shape: NO per-source window (one task per source at 100 TB) —
    the slim (key, order, n_tokens) frame takes one range exchange and a
    driver-mediated prefix-offset pass (:func:`_global_keyed_cumsum`),
    then the cum column joins back on the row identity. Cost ∝ corpus,
    parallelism ∝ partitions, never ∝ |sources|."""
    from pyspark.sql import functions as F

    from .text import _ws_tokens_col

    order_cols = _order_cols(df, id_col, order_cols)
    bud = F.lit(int(default_budget))
    for g, b in sorted(budgets.items()):
        bud = F.when(F.col(key) == g, F.lit(int(b))).otherwise(bud)
    base = df.withColumn(
        "n_ws_tokens", F.size(_ws_tokens_col(F.col(text_col))))
    cums = _global_keyed_cumsum(
        base.select(key, *order_cols, "n_ws_tokens"), key, order_cols,
        "n_ws_tokens", "cum_tokens", inclusive=True,
    ).select(*order_cols, "cum_tokens")
    return (
        base.join(cums, order_cols)
        .withColumn("kept", F.col("cum_tokens") <= bud)
        .select(*base.columns, "cum_tokens", "kept")
    )


def temperature_rates(counts: dict[str, int], alpha: float,
                      target_frac: float) -> dict[str, float]:
    """Per-source sampling rates from the TEMPERATURE mixing rule the
    multilingual/multi-source recipes use (mT5, Xue et al. 2021 §3.1; the
    Pile, Gao et al. 2020; α-scaled source weights): source probability
    p(s) ∝ n_s^α — α=1 is natural proportions, α→0 uniform-over-sources,
    the recipes' usual 0.2-0.7 boosts small sources. The per-ROW keep
    rate that realizes p(s) at an overall kept fraction ``target_frac``
    is r_s = target_frac · N · p_s / n_s, capped at 1 (a small source
    saturates: it is kept whole and the realized overall fraction drops
    below target — the standard recipe behavior; renormalize α or target
    if that matters).

    Driver-side on the per-source COUNTS (|sources| numbers) by design:
    the rates become exact integer micro-unit thresholds shared verbatim
    by the Spark filter and the DuckDB oracle, so no pow()
    last-ulp difference between engines can flip a threshold."""
    N = sum(counts.values())
    if not N:
        return {}
    powed = {s: float(n) ** float(alpha) for s, n in counts.items()}
    z = sum(powed.values())
    return {s: min(1.0, target_frac * N * (powed[s] / z) / counts[s])
            for s in counts}


def temperature_thresholds(counts: dict[str, int], alpha: float,
                           target_frac: float) -> dict[str, int]:
    """:func:`temperature_rates` quantized to integer micro-unit
    thresholds with HALF-UP rounding (``floor(r·10⁶ + 0.5)``) — the rule
    DuckDB's ``round()`` (half-away-from-zero, positive domain) also
    implements, unlike Python's banker's ``round()``. Pinning the
    rounding rule on both engines removes the one boundary where a
    micro-unit tie could flip a row's ``kept`` between the Spark filter
    and the SQL oracle."""
    import math

    rates = temperature_rates(counts, alpha, target_frac)
    return {s: int(math.floor(r * _RES + 0.5)) for s, r in rates.items()}


def temperature_sample(df, alpha: float, target_frac: float,
                       key: str = "source", id_col: str = "doc_id",
                       seed: int = 0):
    """Temperature-based mixture sampling (see :func:`temperature_rates`):
    ONE tiny per-source count aggregate (|sources| rows to the driver),
    rates resolved to half-up micro-unit thresholds
    (:func:`temperature_thresholds`), then the same zero-shuffle
    deterministic hash filter as :func:`stratified_sample` — the whole op
    is one small agg + one map-side filter at any corpus size. Returns
    rows + ``mix_u`` + ``kept`` (audit-friendly, like the other mixers).
    Rows with a NULL ``key`` take the default threshold 0 (kept=false) —
    mirrored by the oracle's LEFT JOIN + coalesce."""
    from pyspark.sql import functions as F

    counts = {r[key]: r["n"] for r in
              df.groupBy(key).agg(F.count("*").alias("n")).collect()}
    thrs = temperature_thresholds(counts, alpha, target_frac)
    u = sample_hash_col(id_col, seed)
    thr = F.lit(0)
    for g, t in sorted((g, t) for g, t in thrs.items() if g is not None):
        thr = F.when(F.col(key) == g, F.lit(int(t))).otherwise(thr)
    return df.withColumn("mix_u", u).withColumn("kept", F.col("mix_u") < thr)


def upsample_epochs(df, repeats: dict[str, int], default_repeat: int = 1,
                    key: str = "source", id_col: str = "doc_id"):
    """Integer per-source upsampling — the "epochs per source" lever of
    published data recipes (Llama's multi-epoch Wikipedia/Books, DoReMi
    weight realization, Muennighoff et al. 2023 on repeating data):
    every row of source s appears ``repeats.get(s, default_repeat)``
    times, tagged ``copy_idx`` 0..k-1 (so downstream shuffling/packing
    treats copies as distinct rows and a trainer can still trace the
    original id). Zero shuffle: one map-side
    ``explode(sequence(0, k-1))`` — row multiplication happens inside
    the scan's own partitions, no skew beyond the chosen multipliers.
    k=0 drops the source (a recipe's "exclude" entry)."""
    from pyspark.sql import functions as F

    k = F.lit(int(default_repeat))
    for g, r in sorted(repeats.items()):
        k = F.when(F.col(key) == g, F.lit(int(r))).otherwise(k)
    return (
        df.withColumn("_k", k)
        .where(F.col("_k") > 0)
        .withColumn("copy_idx",
                    F.explode(F.sequence(F.lit(0), F.col("_k") - 1)))
        .drop("_k")
    )


def _with_bin_ids(df, capacity: int, key: str, id_col: str, text_col: str,
                  order_cols):
    """Shared pack stage: rows + (n_ws_tokens, _excl_cum, bin_id) via the
    scale-safe global cumsum (no per-source window — see
    :func:`_global_keyed_cumsum`)."""
    from pyspark.sql import functions as F

    from .text import _ws_tokens_col

    order_cols = _order_cols(df, id_col, order_cols)
    base = df.withColumn(
        "n_ws_tokens", F.size(_ws_tokens_col(F.col(text_col))))
    cums = _global_keyed_cumsum(
        base.select(key, *order_cols, "n_ws_tokens"), key, order_cols,
        "n_ws_tokens", "_excl_cum", inclusive=False,
    ).select(*order_cols, "_excl_cum")
    return (
        base.join(cums, order_cols)
        # integer DIV, not floor(double /): exact past 2^53 token streams
        .withColumn("bin_id",
                    F.expr(f"_excl_cum div {int(capacity)}").cast("long"))
        .select(*base.columns, "_excl_cum", "bin_id")
    )


def pack_sequences(df, capacity: int, key: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   order_cols=None):
    """Greedy sequential context-window packing (document-boundary): within
    each group (``order_cols`` order), ``bin_id = floor(exclusive_cum_tokens
    / capacity)`` — see the module spec for the straddle/overflow rule.
    Returns rows + (n_ws_tokens, bin_id).

    Scale shape: same as :func:`token_budget` — range-exchange global
    cumsum, never one-task-per-source; downstream trainers repartition
    by (key, bin_id) to materialize one sequence per bin."""
    return _with_bin_ids(df, capacity, key, id_col, text_col,
                         order_cols).drop("_excl_cum")


def shuffle_rows(df, seed: int = 0, id_col: str = "doc_id"):
    """Deterministic global corpus shuffle: every row gets a contiguous
    0-based ordinal (``shuffle_pos``) in seeded-hash order — the "shuffle
    the training corpus once, reproducibly" step before sharding to the
    trainer. Spec: order rows by (shuffle_key, id), where shuffle_key is
    the same cross-engine-exact xor-shift-multiply draw as
    :func:`stratified_sample`; shuffle_pos = 0-based rank in that order.
    The result is a pure function of the row ids — independent of input
    partitioning, task order, and cluster size.

    Scale shape (100 TB): a single-partition ``row_number()`` window would
    serialize the corpus through one task; instead this is ONE range
    exchange on (shuffle_key, id) — Spark's ordinary global-sort shuffle —
    followed by the classic two-pass global-rank: per-partition row counts
    (one long per partition) come to the driver, cumulative offsets go
    back in the closure, and each partition numbers its own rows
    (mapInPandas, batches arrive in stored order). The driver never sees
    row data, only the count vector. The frame is localCheckpoint-pinned
    between the passes so both see identical partition boundaries; the
    ordinal itself is boundary-independent (range partitions are disjoint
    in the sort key), the pin only guards against resampled boundaries
    double-counting a row across the two passes.

    Returns (id_col, shuffle_key, shuffle_pos).
    """
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = df.sparkSession
    npart = max(1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    keyed = (
        df.select(id_col)
        .withColumn("shuffle_key", sample_hash_col(id_col, seed).cast("long"))
        .repartitionByRange(npart, "shuffle_key", id_col)
        .sortWithinPartitions("shuffle_key", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        int(r["_pid"]): int(r["n"])
        for r in keyed.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [f for f in keyed.schema.fields if f.name != "_pid"]
        + [T.StructField("shuffle_pos", T.LongType(), False)]
    )

    def _number(batches):
        local, base = 0, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["shuffle_pos"] = np.arange(
                base + local, base + local + len(pdf), dtype=np.int64)
            local += len(pdf)
            yield pdf

    return keyed.mapInPandas(_number, out_schema)


# ------------------------------------------------------------ DuckDB mirrors

def _duck_hash(id_sql: str, seed: int) -> str:
    h = f"((({id_sql}) + {int(seed)}) % {_MOD})"
    for mult in (_MULT1, _MULT2):
        h = f"((xor({h}, ({h}) >> 15)) * {mult} % {_MOD})"
    return f"(xor({h}, ({h}) >> 16)) % {_RES}"


def duckdb_sample_sql(rates: dict[str, float], default_rate: float = 1.0,
                      key: str = "source", id_col: str = "doc_id",
                      seed: int = 0, table: str = "documents") -> str:
    thr = str(int(round(default_rate * _RES)))
    for g, r in sorted(rates.items()):
        lit = g.replace("'", "''")
        thr = (f"CASE WHEN {key} = '{lit}' THEN {int(round(r * _RES))} "
               f"ELSE {thr} END")
    h = _duck_hash(id_col, seed)
    return (f"SELECT {id_col}, {key}, {h} AS mix_u, "
            f"({h}) < ({thr}) AS kept FROM {table}")


def materialize_bins(df, capacity: int, key: str = "source",
                     id_col: str = "doc_id", text_col: str = "text",
                     sep: str = " ", order_cols=None, label_col=None):
    """Realize :func:`pack_sequences`' bins into the TRAINER-facing
    artifact: one row per (key, bin_id) with the concatenated text, the
    member ids in pack order, and the token-boundary OFFSETS a collator
    needs to reset attention masks / position ids at document boundaries
    (the "document-boundary packing" convention — each bin is one
    training sequence, offsets mark where each doc starts in tokens).

    Spark shape: the same scale-safe pack stage as
    :func:`pack_sequences` (range-exchange global cumsum — NO
    one-task-per-source window), then ONE groupBy (key, bin_id) building
    the sorted member structs with ``sort_array(collect_list(struct))``
    — bounded exchanges at any scale, rows out = number of bins. Offsets
    are bin-relative (first = 0); ``n_tokens`` is the bin's
    whitespace-token total (may exceed ``capacity`` by < its last doc's
    length — the straddle rule)."""
    from pyspark.sql import functions as F

    rows = _with_bin_ids(df, capacity, key, id_col, text_col, order_cols)
    # bin-relative offset = global exclusive cum − the bin's first
    # global exclusive cum (min over the bin — the pack order is id
    # order, so min(_excl_cum) is the first member's).
    # ``label_col``: list THAT column in doc_ids (in pack order) instead
    # of id_col — the recipe packs by shuffle ordinal but the trainer
    # wants original row identity in the manifest.
    members = F.sort_array(F.collect_list(F.struct(
        F.col(id_col).alias("i"), F.col("_excl_cum").alias("c"),
        F.col("n_ws_tokens").alias("n"),
        F.col(label_col or id_col).alias("l"),
        F.col(text_col).alias("t"))))
    agg = (
        rows.groupBy(key, "bin_id")
        .agg(members.alias("m"))
        .select(
            key, "bin_id",
            F.size("m").cast("int").alias("n_docs"),
            F.aggregate("m", F.lit(0).cast("long"),
                        lambda a, x: a + x["n"]).alias("n_tokens"),
            F.transform("m", lambda x: x["l"]).alias("doc_ids"),
            F.transform("m", lambda x: (x["c"] - F.element_at("m", 1)["c"])
                        .cast("long")).alias("offsets"),
            F.array_join(F.transform("m", lambda x: x["t"]), sep)
             .alias(text_col),
        )
    )
    return agg


def duckdb_bins_sql(capacity: int, key: str = "source",
                    id_col: str = "doc_id", text_col: str = "text",
                    sep: str = " ", table: str = "documents",
                    order_by=None) -> str:
    """Mirror of :func:`materialize_bins` (window cum + ordered
    aggregates). ``order_by`` mirrors the Spark side's ``order_cols``."""
    from .text import duckdb_ws_tokens

    order = ", ".join(order_by or (id_col,))
    sel = ", ".join(dict.fromkeys((order_by or (id_col,))))
    n = f"len({duckdb_ws_tokens(text_col)})"
    s = sep.replace("'", "''")
    return f"""
WITH t AS (
  SELECT {sel}, {key}, {text_col}, {n}::BIGINT AS n_ws_tokens
  FROM {table}
),
c AS (
  SELECT *, coalesce(sum(n_ws_tokens) OVER (PARTITION BY {key}
    ORDER BY {order} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    0) AS excl_cum
  FROM t
),
b AS (
  SELECT *, (excl_cum // {int(capacity)})::BIGINT AS bin_id,
         (excl_cum - min(excl_cum) OVER (PARTITION BY {key},
            excl_cum // {int(capacity)}))::BIGINT AS rel_off
  FROM c
)
SELECT {key}, bin_id,
       count(*)::INT AS n_docs,
       sum(n_ws_tokens)::BIGINT AS n_tokens,
       list({id_col} ORDER BY {order}) AS doc_ids,
       list(rel_off ORDER BY {order}) AS offsets,
       string_agg({text_col}, '{s}' ORDER BY {order}) AS {text_col}
FROM b
GROUP BY {key}, bin_id"""


def duckdb_temperature_sql(alpha: float, target_frac: float,
                           key: str = "source", id_col: str = "doc_id",
                           seed: int = 0, table: str = "documents") -> str:
    """Mirror of :func:`temperature_sample`, rates computed IN SQL from
    the same counts, quantized with the SAME half-up rule
    (``floor(x·10⁶ + 0.5)``) as :func:`temperature_thresholds` — the
    rounding rule is pinned on both engines, so a micro-unit tie can no
    longer flip a row. (Residual risk is a last-ulp pow() divergence
    landing exactly on an integer boundary — measure-zero for pow
    outputs; the rehearsal would catch a flip.) NULL-``key`` rows take
    threshold 0 via LEFT JOIN + coalesce, matching the Spark side's
    when/otherwise default."""
    h = _duck_hash(id_col, seed)
    a, tf = float(alpha), float(target_frac)
    return f"""
WITH c AS (
  SELECT {key} AS g, count(*)::BIGINT AS n,
         pow(count(*)::DOUBLE, {a!r}) AS pw
  FROM {table} GROUP BY 1
),
tot AS (SELECT sum(n)::DOUBLE AS N, sum(pw) AS z FROM c),
r AS (
  SELECT g, CAST(floor(least(1.0,
           {tf!r} * tot.N * (c.pw / tot.z) / c.n) * {_RES} + 0.5) AS BIGINT)
         AS thr
  FROM c CROSS JOIN tot
)
SELECT t.{id_col}, t.{key}, {h.replace(id_col, f"t.{id_col}")} AS mix_u,
       ({h.replace(id_col, f"t.{id_col}")}) < coalesce(r.thr, 0) AS kept
FROM {table} t LEFT JOIN r ON t.{key} = r.g"""


def duckdb_upsample_sql(repeats: dict[str, int], default_repeat: int = 1,
                        key: str = "source", id_col: str = "doc_id",
                        table: str = "documents") -> str:
    """Mirror of :func:`upsample_epochs`: per-source integer row
    multiplication via generate_series, copy_idx 0..k-1."""
    k = str(int(default_repeat))
    for g, r in sorted(repeats.items()):
        lit = g.replace("'", "''")
        k = f"CASE WHEN {key} = '{lit}' THEN {int(r)} ELSE {k} END"
    return f"""
WITH t AS (SELECT {id_col}, {key}, ({k}) AS k FROM {table})
SELECT {id_col}, {key}, gs.copy_idx::INT AS copy_idx
FROM t, LATERAL (SELECT unnest(range(0, t.k)) AS copy_idx) gs
WHERE t.k > 0"""


def duckdb_split_sql(fractions: dict[str, float],
                     default_split: str = "train", id_col: str = "doc_id",
                     seed: int = 0, table: str = "documents") -> str:
    h = _duck_hash(id_col, seed)
    cases, lo = [], 0
    for name, frac in sorted(fractions.items()):
        hi = lo + int(round(frac * _RES))
        lit = name.replace("'", "''")
        cases.append(f"WHEN ({h}) < {hi} THEN '{lit}'")
        lo = hi
    dflt = default_split.replace("'", "''")
    case = (f"CASE {' '.join(cases)} ELSE '{dflt}' END" if cases
            else f"'{dflt}'")
    return (f"SELECT {id_col}, {h} AS split_u, {case} AS split "
            f"FROM {table}")


def duckdb_budget_sql(budgets: dict[str, int], default_budget: int,
                      key: str = "source", id_col: str = "doc_id",
                      text_col: str = "text", table: str = "documents",
                      order_by=None) -> str:
    """Mirror of :func:`token_budget`. ``order_by`` mirrors the Spark
    side's ``order_cols`` (pass ``(id_col, "copy_idx")`` after an
    upsample)."""
    from .text import duckdb_ws_tokens

    order = ", ".join(order_by or (id_col,))
    sel = ", ".join(dict.fromkeys((order_by or (id_col,))))
    bud = str(int(default_budget))
    for g, b in sorted(budgets.items()):
        lit = g.replace("'", "''")
        bud = f"CASE WHEN {key} = '{lit}' THEN {int(b)} ELSE {bud} END"
    n = f"len({duckdb_ws_tokens(text_col)})"
    return f"""
WITH t AS (
  SELECT {sel}, {key}, {n}::BIGINT AS n_ws_tokens FROM {table}
),
c AS (
  SELECT *, sum(n_ws_tokens) OVER (PARTITION BY {key} ORDER BY {order}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM t
)
SELECT {sel}, {key}, n_ws_tokens, cum_tokens::BIGINT AS cum_tokens,
       cum_tokens <= ({bud}) AS kept
FROM c"""


def duckdb_pack_sql(capacity: int, key: str = "source",
                    id_col: str = "doc_id", text_col: str = "text",
                    table: str = "documents", order_by=None) -> str:
    """Mirror of :func:`pack_sequences`. ``order_by`` mirrors the Spark
    side's ``order_cols``."""
    from .text import duckdb_ws_tokens

    order = ", ".join(order_by or (id_col,))
    sel = ", ".join(dict.fromkeys((order_by or (id_col,))))
    n = f"len({duckdb_ws_tokens(text_col)})"
    return f"""
WITH t AS (
  SELECT {sel}, {key}, {n}::BIGINT AS n_ws_tokens FROM {table}
),
c AS (
  SELECT *, coalesce(sum(n_ws_tokens) OVER (PARTITION BY {key}
    ORDER BY {order} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    0) AS excl_cum
  FROM t
)
SELECT {sel}, {key}, n_ws_tokens,
       (excl_cum // {int(capacity)})::BIGINT AS bin_id
FROM c"""


def duckdb_shuffle_sql(seed: int = 0, id_col: str = "doc_id",
                       table: str = "documents") -> str:
    """Oracle for :func:`shuffle_rows` — the whole-corpus row_number()
    window the distributed two-pass rank must equal exactly."""
    h = _duck_hash(id_col, seed)
    return (
        f"SELECT {id_col}, ({h})::BIGINT AS shuffle_key,\n"
        f"       (row_number() OVER (ORDER BY {h}, {id_col}) - 1)::BIGINT"
        f" AS shuffle_pos\nFROM {table}"
    )
