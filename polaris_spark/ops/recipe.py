"""The END-TO-END training-data recipe as ONE composed Spark job — the
full pipeline the LLM-data mission describes, with no driver round-trips
between stages beyond the two tiny aggregates the component ops already
own (per-source counts for temperature rates; per-partition subtotal longs
for the global cumsum / shuffle rank):

1. **curate**   — quality + language filters, benchmark decontamination,
   exact + LSH near-dup removal (:func:`..ops.curate.curate` ledger;
   keep=1 survivors continue),
2. **temperature mix** — mT5 α-rule per-source sampling
   (:func:`..ops.mixing.temperature_sample`),
3. **epoch upsample** — integer per-source repeats, copies tagged
   ``copy_idx`` (:func:`..ops.mixing.upsample_epochs`),
4. **global shuffle** — deterministic corpus shuffle ordinal over the
   composite row identity ``sid = doc_id·max_repeats + copy_idx``
   (:func:`..ops.mixing.shuffle_rows` two-pass distributed rank),
5. **pack + materialize** — greedy document-boundary packing of the
   SHUFFLED stream into context-window bins, realized as trainer-facing
   sequences with member sids + token offsets
   (:func:`..ops.mixing.materialize_bins` over the shuffle ordinal,
   ``label_col="sid"``).

The whole composition is value-hash gated against ONE DuckDB oracle
(:func:`duckdb_recipe_sql`) running the same stages as a single CTE
chain — proving the ops COMPOSE, not just pass their unit gates.

Scale notes (100 TB): every stage is the already-audited scale shape of
its component op — zero-shuffle hash filters (sample), map-side explode
(epochs), range-exchange two-pass rank (shuffle), range-exchange global
cumsum + one groupBy (pack/materialize; the pack key is a single global
stream here, which is exactly the case the round-5 cumsum rewrite makes
safe: parallelism ∝ partitions, never ∝ |keys|). Packing the shuffled
stream (not per-source) is the trainer convention: bins draw documents
from the mixed corpus in shuffle order.
"""

from __future__ import annotations

from .curate import duckdb_curate_sql
from .mixing import (_RES, _duck_hash, materialize_bins, shuffle_rows,
                     temperature_sample, upsample_epochs)


def training_recipe(docs, bench=None, alpha: float = 0.5,
                    target_frac: float = 0.7,
                    repeats: dict[str, int] | None = None,
                    default_repeat: int = 1, capacity: int = 512,
                    seed: int = 0, max_repeats: int = 8,
                    key: str = "source", id_col: str = "doc_id",
                    text_col: str = "text"):
    """One job: curate → temperature-mix → upsample → shuffle → pack →
    materialize. Returns the trainer manifest — one row per bin:
    ``(bin_id, n_docs, n_tokens, doc_ids, offsets, text)`` where
    ``doc_ids`` lists member ``sid = doc_id·max_repeats + copy_idx`` in
    pack (= shuffle) order. ``id_col`` values must be integral and
    ``repeats`` < ``max_repeats`` so sids are collision-free."""
    from pyspark.sql import functions as F

    from .curate import curate

    repeats = repeats or {}
    assert all(r < max_repeats for r in repeats.values()) \
        and default_repeat < max_repeats, "repeats must stay < max_repeats"

    led = curate(docs, text_col=text_col, id_col=id_col, bench=bench)
    # pin the survivor set ONCE: the curate ledger is the expensive stage
    # (LSH bands, Jaccard verification, connected components) and three
    # downstream actions re-trigger it otherwise — the temperature count
    # aggregate, the shuffle-rank count pass, and the final bin job.
    # localCheckpoint truncates the lineage so each reads the materialized
    # survivors instead of re-running the dedup DAG (same pinning the
    # two-pass rank itself uses).
    surv = docs.join(
        led.where(F.col("keep") == 1).select(F.col("doc_id").alias(id_col)),
        id_col).localCheckpoint()
    samp = temperature_sample(surv, alpha, target_frac, key=key,
                              id_col=id_col, seed=seed) \
        .where("kept").drop("mix_u", "kept")
    up = upsample_epochs(samp, repeats, default_repeat, key=key,
                         id_col=id_col)
    up = up.withColumn(
        "sid", F.col(id_col).cast("long") * int(max_repeats)
        + F.col("copy_idx"))
    pos = shuffle_rows(up, seed=seed, id_col="sid")
    rows = (up.join(pos.select("sid", "shuffle_pos"), "sid")
            .withColumn("_mix", F.lit("all")))
    bins = materialize_bins(rows, capacity, key="_mix",
                            id_col="shuffle_pos", text_col=text_col,
                            order_cols=["shuffle_pos"], label_col="sid")
    return bins.select("bin_id", "n_docs", "n_tokens", "doc_ids",
                       "offsets", text_col)


def duckdb_recipe_sql(table: str = "documents",
                      bench_where: str | None = None, alpha: float = 0.5,
                      target_frac: float = 0.7,
                      repeats: dict[str, int] | None = None,
                      default_repeat: int = 1, capacity: int = 512,
                      seed: int = 0, max_repeats: int = 8,
                      key: str = "source", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """ONE SQL statement mirroring :func:`training_recipe` end to end:
    the curate ledger (recursive-CTE chain) as a derived table, then
    temperature thresholds (same half-up micro-unit rule), LATERAL
    epoch expansion, the shuffle-hash order, a single global exclusive
    cumsum window, and the ordered bin aggregates."""
    from .text import duckdb_ws_tokens

    repeats = repeats or {}
    a, tf = float(alpha), float(target_frac)
    led = duckdb_curate_sql(table=table, bench_where=bench_where)
    hdoc = _duck_hash(f"s.{id_col}", seed)
    k = str(int(default_repeat))
    for g, r in sorted(repeats.items()):
        lit = g.replace("'", "''")
        k = f"CASE WHEN {key} = '{lit}' THEN {int(r)} ELSE {k} END"
    hsid = _duck_hash("sid", seed)
    n = f"len({duckdb_ws_tokens(text_col)})"
    return f"""
WITH led AS (SELECT * FROM ({led}) _led),
surv AS (
  SELECT d.* FROM {table} d JOIN led ON d.{id_col} = led.doc_id
  WHERE led.keep = 1
),
cnt AS (
  SELECT {key} AS g, count(*)::BIGINT AS n,
         pow(count(*)::DOUBLE, {a!r}) AS pw
  FROM surv GROUP BY 1
),
tot AS (SELECT sum(n)::DOUBLE AS N, sum(pw) AS z FROM cnt),
thr AS (
  SELECT g, CAST(floor(least(1.0,
           {tf!r} * tot.N * (cnt.pw / tot.z) / cnt.n) * {_RES} + 0.5)
           AS BIGINT) AS thr
  FROM cnt CROSS JOIN tot
),
samp AS (
  SELECT s.* FROM surv s LEFT JOIN thr ON s.{key} = thr.g
  WHERE ({hdoc}) < coalesce(thr.thr, 0)
),
up AS (
  SELECT s.*, gs.copy_idx::INT AS copy_idx,
         (s.{id_col} * {int(max_repeats)} + gs.copy_idx)::BIGINT AS sid
  FROM (SELECT *, ({k}) AS _k FROM samp) s,
       LATERAL (SELECT unnest(range(0, s._k)) AS copy_idx) gs
  WHERE s._k > 0
),
tok AS (
  SELECT sid, {text_col}, {n}::BIGINT AS n_ws_tokens,
         ({hsid})::BIGINT AS shuffle_key
  FROM up
),
c AS (
  SELECT *, coalesce(sum(n_ws_tokens) OVER (ORDER BY shuffle_key, sid
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl_cum
  FROM tok
),
b AS (
  SELECT *, (excl_cum // {int(capacity)})::BIGINT AS bin_id,
         (excl_cum - min(excl_cum) OVER (PARTITION BY
            excl_cum // {int(capacity)}))::BIGINT AS rel_off
  FROM c
)
SELECT bin_id,
       count(*)::INT AS n_docs,
       sum(n_ws_tokens)::BIGINT AS n_tokens,
       list(sid ORDER BY shuffle_key, sid) AS doc_ids,
       list(rel_off ORDER BY shuffle_key, sid) AS offsets,
       string_agg({text_col}, ' ' ORDER BY shuffle_key, sid) AS {text_col}
FROM b
GROUP BY bin_id"""
