"""Search aggregations — the Lucene facets-module / Elasticsearch ``aggs``
analog over a query's FULL match set.

The reference surfaces only hit lists (SourceDbImpl.java:141-158); its
Lucene 4.3 substrate ships the facets module and ES builds the ``aggs``
block on the same collector machinery — the summaries a search UI or a
corpus-curation dashboard runs next to every query ("hits by source",
"length distribution of matches", "matches per day"). Re-expressed
Spark-first, every aggregation here is:

    match set (engine.match_df: bucket-pruned candidate scan + per-shard
    scoring kernels, k=None, full parser routing, tombstones filtered)
      → doc_id equi-join against ONE column-pruned attribute frame
      → a partially-aggregated groupBy / aggregate

so the shuffle moves at most |match set| narrow rows once, each task
pre-folds to |buckets| partial rows (map-side combine), and the reduce
moves |buckets| × partitions tiny rows regardless of corpus size — the
same 100 TB shape as ``facet_counts``. No collector loop, no driver ids.

Attribute resolution mirrors ``search_function_score``: a stored doc_map
attribute (``IndexConfig.attr_cols`` — the Lucene DocValues analog) when
present, else a caller-supplied ``docs`` frame (doc_id + the column) for
ad-hoc attributes the index wasn't built with.

Determinism: bucket outputs carry a total order (bucket key asc) and the
metric arithmetic is chosen to be oracle-exact — integer attributes
aggregate in integer space (Spark sum(long)=long, DuckDB sum=hugeint:
both exact) with division to f64 only at the end, so the DuckDB mirrors
in gate.py match bit-for-bit at the gate's 1e-9 rounding.
"""
from __future__ import annotations

from pyspark.sql import functions as F

__all__ = [
    "stats_agg", "terms_agg", "histogram_agg", "range_agg",
    "date_histogram_agg", "cardinality_agg", "percentiles_agg",
]


def _attr_matches(engine, query: str, attr: str, docs=None, mode: str = "or",
                  expand_fields: bool = False):
    """Shared front half: FULL match set joined to one attribute column.

    Returns (doc_id, <attr>) — score/n_match are projected away here so
    Catalyst prunes the scoring columns out of everything below the join
    when the aggregation doesn't reference them.
    """
    hits = engine.match_df(query, mode=mode, expand_fields=expand_fields) \
                 .select("doc_id")
    if attr == "doc_id":  # the id itself (e.g. cardinality = match count)
        return hits
    dm = engine._live(engine.spark.read.parquet(engine.doc_map_path))
    if attr in dm.columns:
        src = dm
    elif docs is not None and attr in docs.columns:
        src = docs
    else:
        raise ValueError(
            f"attribute {attr!r} neither stored in doc_map "
            f"(available: {[c for c in dm.columns if c != 'doc_id']}) "
            f"nor present in the docs frame"
        )
    return hits.join(src.select("doc_id", attr), "doc_id")


def stats_agg(engine, query: str, attr: str, docs=None, mode: str = "or",
              expand_fields: bool = False):
    """ES ``stats`` aggregation: one row
    (n, min_v, max_v, sum_v, avg_v) over a numeric attribute of every
    matching doc. Integer attributes stay exact: the sum folds in integer
    space and only avg divides to f64.

    Spark shape: join + ONE partial-aggregated global Aggregate — each
    task emits a single (count, min, max, sum) partial; the reduce sees
    |partitions| rows.
    """
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    v = F.col(attr)
    return j.agg(
        F.count("*").cast("long").alias("n"),
        F.min(v).cast("double").alias("min_v"),
        F.max(v).cast("double").alias("max_v"),
        F.sum(v).cast("double").alias("sum_v"),
        (F.sum(v).cast("double") / F.count("*")).alias("avg_v"),
    )


def terms_agg(engine, query: str, attr: str, metric_attr: str | None = None,
              size: int | None = None, docs=None, mode: str = "or",
              expand_fields: bool = False):
    """ES ``terms`` aggregation with an optional metric sub-aggregation:
    per value of a stored categorical attribute, the matching-doc count —
    plus (min/max/sum/avg of ``metric_attr``) when given, the
    ``terms → stats`` nesting every analytics UI draws. Buckets ordered
    (n desc, key asc) — ES's order, made total — with an optional
    ``size`` cut.

    Spark shape: one join when both attributes live in doc_map (a single
    column-pruned scan carries both), two joins otherwise; then ONE
    hash-partitioned partial-aggregated groupBy on the bucket key and —
    only under ``size`` — a TakeOrderedAndProject over |buckets| rows.
    """
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    if metric_attr is not None:
        dm = engine._live(engine.spark.read.parquet(engine.doc_map_path))
        msrc = dm if metric_attr in dm.columns else docs
        if msrc is None or metric_attr not in msrc.columns:
            raise ValueError(f"metric attribute {metric_attr!r} not available")
        j = j.join(msrc.select("doc_id", metric_attr), "doc_id")
        m = F.col(metric_attr)
        out = j.groupBy(F.col(attr).alias("key")).agg(
            F.count("*").cast("long").alias("n"),
            F.min(m).cast("double").alias("min_v"),
            F.max(m).cast("double").alias("max_v"),
            F.sum(m).cast("double").alias("sum_v"),
            (F.sum(m).cast("double") / F.count("*")).alias("avg_v"),
        )
    else:
        out = j.groupBy(F.col(attr).alias("key")).agg(
            F.count("*").cast("long").alias("n"))
    out = out.orderBy(F.desc("n"), F.asc("key"))
    return out.limit(int(size)) if size is not None else out


def histogram_agg(engine, query: str, attr: str, interval: float,
                  docs=None, mode: str = "or", expand_fields: bool = False,
                  min_doc_count: int = 1):
    """ES ``histogram`` aggregation: matching docs bucketed by
    ``floor(attr / interval) * interval`` (ES's exact bucket key formula).
    Returns (bucket, n) ordered bucket asc. Empty buckets are not
    materialized (``min_doc_count`` ≥ 1 — the sparse form; ES's
    min_doc_count=0 zero-fill is a driver-side densify over |buckets|
    keys, deliberately not done distributed).

    Spark shape: the bucket key is one codegen'd projection, then the
    same partial-aggregated groupBy as ``terms_agg`` — |buckets| partial
    rows per task.
    """
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    step = float(interval)
    bucket = (F.floor(F.col(attr).cast("double") / F.lit(step))
              .cast("double") * F.lit(step)).alias("bucket")
    out = (j.groupBy(bucket).agg(F.count("*").cast("long").alias("n"))
            .where(F.col("n") >= int(min_doc_count))
            .orderBy(F.asc("bucket")))
    return out


def range_agg(engine, query: str, attr: str, edges: list[float],
              docs=None, mode: str = "or", expand_fields: bool = False):
    """ES ``range`` aggregation over sorted ``edges`` [e1, .., em]:
    m+1 half-open buckets (-inf, e1), [e1, e2), .., [em, +inf) — ES's
    from-inclusive / to-exclusive convention. Returns
    (bucket_idx, lo, hi, n) for every non-empty bucket, bucket_idx asc;
    open ends surface as NULL lo/hi.

    Spark shape: the bucket index is ONE chained ``when`` projection
    (codegen, no join against a ranges table — edges are a handful of
    literals), then the partial-aggregated groupBy.
    """
    es = sorted(float(e) for e in edges)
    if not es:
        raise ValueError("range_agg needs at least one edge")
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    v = F.col(attr).cast("double")
    idx = F.when(v < F.lit(es[0]), F.lit(0))
    for i, e in enumerate(es[1:], start=1):
        idx = idx.when(v < F.lit(e), F.lit(i))
    idx = idx.otherwise(F.lit(len(es)))
    lo = F.when(F.col("bucket_idx") > 0,
                F.element_at(F.lit(es), F.col("bucket_idx").cast("int")))
    hi = F.when(F.col("bucket_idx") < len(es),
                F.element_at(F.lit(es), (F.col("bucket_idx") + 1).cast("int")))
    return (j.groupBy(idx.cast("long").alias("bucket_idx"))
             .agg(F.count("*").cast("long").alias("n"))
             .withColumn("lo", lo.cast("double"))
             .withColumn("hi", hi.cast("double"))
             .select("bucket_idx", "lo", "hi", "n")
             .orderBy(F.asc("bucket_idx")))


def date_histogram_agg(engine, query: str, attr: str,
                       interval: str = "1d", docs=None, mode: str = "or",
                       expand_fields: bool = False):
    """ES ``date_histogram`` over a timestamp attribute of matching docs.

    Two interval families, exactly ES's split:
    - **fixed intervals** (``"<n>s|m|h|d"``): bucket key =
      ``floor(epoch_seconds / width) * width`` as a LONG epoch-second —
      timezone-independent arithmetic (the oracle-gated form: integer
      space end-to-end, no session-timezone rendering in the result).
      Returns (bucket_epoch, n) ordered bucket asc.
    - **calendar intervals** (``"week"|"month"|"quarter"|"year"``):
      ``date_trunc`` buckets, returned as (bucket, n) with a timestamp
      key (calendar months are not fixed-width; tested against DuckDB's
      date_trunc in pytest, not driver-gated — timestamp rendering is
      session-timezone-dependent).

    Spark shape: one codegen'd bucket projection + the partial-aggregated
    groupBy; at 10^12 turns the reduce still moves only
    |buckets| × partitions rows (a year of hourly buckets is 8.8k keys).
    """
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    iv = interval.strip().lower()
    units = {"s": 1, "m": 60, "h": 3600, "d": 86400}
    if iv and iv[-1] in units and iv[:-1].lstrip("+").isdigit():
        width = int(iv[:-1]) * units[iv[-1]]
        if width <= 0:
            raise ValueError(f"bad fixed interval {interval!r}")
        b = (F.floor(F.unix_timestamp(F.col(attr)) / F.lit(width))
             * F.lit(width)).cast("long").alias("bucket_epoch")
        return (j.groupBy(b).agg(F.count("*").cast("long").alias("n"))
                 .orderBy(F.asc("bucket_epoch")))
    if iv in ("week", "month", "quarter", "year"):
        b = F.date_trunc(iv, F.col(attr)).alias("bucket")
        return (j.groupBy(b).agg(F.count("*").cast("long").alias("n"))
                 .orderBy(F.asc("bucket")))
    raise ValueError(f"unsupported interval {interval!r} "
                     "(use <n>s/m/h/d or week/month/quarter/year)")


def cardinality_agg(engine, query: str, attr: str, exact: bool = True,
                    rsd: float = 0.05, docs=None, mode: str = "or",
                    expand_fields: bool = False):
    """ES ``cardinality`` aggregation: distinct values of an attribute
    across matching docs. ``exact=True`` is the verification form (two-
    level exact distinct aggregate). ``exact=False`` is the SCALE form —
    ``approx_count_distinct`` (HyperLogLog++, the same sketch family ES
    uses), one pass, fixed-size per-task state, mergeable partials: at
    10^12 docs the exact form's first-level shuffle is |distinct values|
    rows while HLL ships one ~kB sketch per task. Returns one row
    (n_distinct).
    """
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    agg = (F.count_distinct(F.col(attr)) if exact
           else F.approx_count_distinct(F.col(attr), rsd=float(rsd)))
    return j.agg(agg.cast("long").alias("n_distinct"))


def percentiles_agg(engine, query: str, attr: str,
                    qs=(0.25, 0.5, 0.75, 0.95), exact: bool = True,
                    accuracy: int = 10000, docs=None, mode: str = "or",
                    expand_fields: bool = False):
    """ES ``percentiles`` aggregation over a numeric attribute of matching
    docs. Returns (q, value) rows, q asc.

    ``exact=True``: Spark's exact ``percentile`` (linear interpolation on
    the sorted values — the same continuous-quantile definition as
    DuckDB's ``quantile_cont``, which the gate mirrors). Exactness costs
    a per-group value buffer, fine for verification.

    ``exact=False`` is the SCALE form: ``percentile_approx`` (Greenwald-
    Khanna / KLL-style sketch — ES itself serves this agg from t-digest,
    also approximate): fixed-size mergeable per-task state, one pass, no
    value buffer — the 10^12-doc path.
    """
    qlist = [float(q) for q in qs]
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    v = F.col(attr).cast("double")
    if exact:
        arr = F.percentile(v, F.lit(qlist)).alias("vals")
    else:
        arr = F.percentile_approx(v, F.lit(qlist),
                                  F.lit(int(accuracy))).alias("vals")
    one = j.agg(arr)
    pairs = F.arrays_zip(
        F.lit(qlist).cast("array<double>").alias("q"),
        F.col("vals").cast("array<double>").alias("value"))
    return (one.select(F.explode(pairs).alias("p"))
               .select(F.col("p.q").alias("q"),
                       F.col("p.value").alias("value"))
               .orderBy(F.asc("q")))
