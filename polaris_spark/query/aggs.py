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

from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = [
    "stats_agg", "terms_agg", "histogram_agg", "range_agg",
    "date_histogram_agg", "cardinality_agg", "percentiles_agg",
    "composite_agg", "filters_agg", "pipeline_agg", "top_hits_agg",
    "weighted_avg_agg", "matrix_stats_agg", "adjacency_matrix_agg",
    "sampler_agg",
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


def pipeline_agg(buckets, value_col: str = "n", order_col: str = "bucket",
                 derivative: bool = True, cumulative: bool = True,
                 moving_avg: int | None = None):
    """ES PIPELINE aggregations (``derivative``, ``cumulative_sum``,
    ``moving_fn``/moving average): second-order series computed over a
    PARENT aggregation's buckets — "requests per hour AND the hour-over-
    hour delta / running total / 3-bucket trend" in one response. Takes
    any (order_col, value_col) bucket frame (``histogram_agg`` /
    ``date_histogram_agg`` output, or any tiny series) and appends:

    - ``derivative``   = value − lag(value)  (NULL for the first bucket,
      exactly ES: no derivative exists for the first bucket)
    - ``cumulative``   = running sum over buckets so far
    - ``moving_avg_N`` = trailing mean over the last N buckets INCLUDING
      the current one (ES moving_fn with a size-N window)

    Spark shape: pipeline aggs are post-processing over the parent's
    REDUCED buckets — |buckets| rows regardless of corpus size — so the
    single-partition Window here is bounded by construction, the same
    argument as hybrid's rank windows (never a corpus frame). The parent
    agg did the corpus-sized work map-side already.
    """
    w = Window.orderBy(F.asc(order_col))
    out = buckets
    v = F.col(value_col).cast("double")
    if derivative:
        out = out.withColumn("derivative", v - F.lag(v, 1).over(w))
    if cumulative:
        out = out.withColumn(
            "cumulative",
            F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    if moving_avg is not None:
        n = int(moving_avg)
        if n <= 0:
            raise ValueError(f"moving_avg window must be positive: {n}")
        out = out.withColumn(
            f"moving_avg_{n}",
            F.avg(v).over(w.rowsBetween(-(n - 1), 0)))
    return out.orderBy(F.asc(order_col))


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


def composite_agg(engine, query: str, sources: list[str], size: int = 10,
                  after: tuple | None = None, docs=None, mode: str = "or",
                  expand_fields: bool = False):
    """ES ``composite`` aggregation: buckets over a TUPLE of attributes in
    key order (every source asc — a deterministic total order), sized
    pages walked with an exclusive ``after`` keyset cursor — the only
    bucket enumeration that stays bounded when |buckets| itself is huge
    (per-source terms × terms can mint 10^9 composite keys; ``terms_agg``'s
    n-desc head needs every bucket at the reduce, this needs ``size``).
    Returns (<source1>, .., <sourcem>, n) ordered by the key tuple asc;
    the last row of a page IS the next ``after`` (ES's after_key).

    Spark shape: attributes resolve like every agg here (stored doc_map
    column — one shared column-pruned scan carries all stored sources —
    else the caller ``docs`` frame); then ONE partial-aggregated groupBy
    on the key tuple. The ``after`` cursor compiles to a lexicographic
    row-comparison predicate on the GROUPING columns only, so Catalyst
    pushes it below the HashAggregate (PushPredicateThroughNonJoin):
    pages beyond the first aggregate only the keyspace tail, and the
    final cut is a TakeOrderedAndProject over |page-visible buckets|.
    """
    if not sources:
        raise ValueError("composite_agg needs at least one source")
    if after is not None and len(after) != len(sources):
        raise ValueError(
            f"after cursor has {len(after)} values for {len(sources)} sources")
    j = _attr_matches(engine, query, sources[0], docs, mode, expand_fields)
    have = set(j.columns)
    for s in sources[1:]:
        if s in have:
            continue
        dm = engine._live(engine.spark.read.parquet(engine.doc_map_path))
        src = dm if s in dm.columns else docs
        if src is None or s not in src.columns:
            raise ValueError(f"composite source {s!r} not available")
        j = j.join(src.select("doc_id", s), "doc_id")
        have.add(s)
    if after is not None:
        # lexicographic (k1..km) > (a1..am): k1>a1 OR (k1=a1 AND k2>a2) ..
        pred = None
        for i in range(len(sources)):
            clause = F.col(sources[i]) > F.lit(after[i])
            for p in range(i):
                clause = clause & (F.col(sources[p]) == F.lit(after[p]))
            pred = clause if pred is None else (pred | clause)
        j = j.where(pred)
    out = (j.groupBy(*[F.col(s) for s in sources])
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(*[F.asc(s) for s in sources]))
    return out.limit(int(size)) if size is not None else out


def filters_agg(engine, query: str, filters: dict[str, str],
                mode: str = "or", expand_fields: bool = False):
    """ES ``filters`` aggregation: named buckets, each counting how many
    docs of the main query's match set ALSO match a named sub-query (full
    parser surface — trees, phrases, prohibits — per bucket; buckets are
    independent, a doc may land in several, and an empty bucket still
    reports n=0, ES's keyed-bucket contract). Returns (name, n), name asc.

    Spark shape: every sub-query's match set is tagged with its bucket
    name and UNIONED into one frame — Spark turns the union of pruned
    candidate scans into one multi-child job, not |filters| sequential
    jobs — then ONE doc_id equi-join against the main match set and ONE
    partial-aggregated groupBy(name); the reduce moves |filters| ×
    partitions rows. Zero-count names come from a |filters|-row literal
    frame left-joined to the counts (driver-side constant, no scan).
    """
    if not filters:
        raise ValueError("filters_agg needs at least one named filter")
    hits = engine.match_df(query, mode=mode,
                           expand_fields=expand_fields).select("doc_id")
    tagged = None
    for name in sorted(filters):
        sub = (engine.match_df(filters[name], mode=mode,
                               expand_fields=expand_fields)
               .select("doc_id", F.lit(name).alias("name")))
        tagged = sub if tagged is None else tagged.unionByName(sub)
    counts = (tagged.join(hits, "doc_id")
              .groupBy("name").agg(F.count("*").cast("long").alias("n")))
    names = engine.spark.createDataFrame(
        [(n,) for n in sorted(filters)], "name string")
    return (names.join(counts, "name", "left")
            .select("name", F.coalesce(F.col("n"), F.lit(0))
                    .cast("long").alias("n"))
            .orderBy(F.asc("name")))


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


def top_hits_agg(engine, query: str, attr: str, size: int = 3,
                 docs=None, mode: str = "or",
                 expand_fields: bool = False):
    """ES ``top_hits`` sub-aggregation (the usual ``terms → top_hits``
    nesting): per value of a stored categorical attribute, the bucket's
    top ``size`` matching docs by relevance — "the best 3 hits from each
    source" next to the per-source counts. Returns
    (key, rank, doc_id, score), ordered (key asc, rank asc); rank 1..size
    by the engine's exact (score desc, doc_id asc) hit order within the
    bucket.

    Spark shape: unlike the metric aggs this one keeps the score column —
    match set → doc_id equi-join to the attribute frame → ONE
    hash-partitioned per-key ``row_number`` window + rank filter. The
    window's partitions are the buckets of the MATCH SET (≤ |match| rows
    shuffled once, same volume as every agg here); no bucket ever holds
    more than its own matches, and the output is ≤ |buckets|·size rows.
    A skew-hot bucket costs what that bucket's match count costs — the
    same bound as ``terms_agg``'s partial fold on the same key."""
    hits = engine.match_df(query, mode=mode,
                           expand_fields=expand_fields) \
                 .select("doc_id", "score")
    if attr == "doc_id":
        raise ValueError("top_hits buckets need a non-id attribute")
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
    j = hits.join(src.select("doc_id", attr), "doc_id")
    w = Window.partitionBy(attr).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(size))
        .select(F.col(attr).alias("key"), "rank", "doc_id", "score")
        .orderBy(F.asc("key"), F.asc("rank"))
    )


def _resolve_attr(engine, j, attr: str, docs):
    """Join one more attribute column onto a match frame (shared by the
    multi-attribute aggs); no-op when already present."""
    if attr in j.columns:
        return j
    dm = engine._live(engine.spark.read.parquet(engine.doc_map_path))
    src = dm if attr in dm.columns else docs
    if src is None or attr not in src.columns:
        raise ValueError(f"attribute {attr!r} not available")
    return j.join(src.select("doc_id", attr), "doc_id")


def weighted_avg_agg(engine, query: str, attr: str, weight_attr: str,
                     docs=None, mode: str = "or",
                     expand_fields: bool = False):
    """ES ``weighted_avg`` aggregation: Σ(value·weight) / Σweight over
    matching docs — the "mean rating weighted by review count" shape.
    Returns one row (n, vw_sum, w_sum, wavg). Integer attributes fold
    EXACTLY: the products and both sums aggregate in integer space
    (Spark long / DuckDB hugeint, both exact), only the final division
    runs in f64 — the same oracle-exactness discipline as ``stats_agg``.

    Spark shape: join + ONE partial-aggregated global Aggregate — a
    single (count, Σvw, Σw) partial per task."""
    j = _attr_matches(engine, query, attr, docs, mode, expand_fields)
    j = _resolve_attr(engine, j, weight_attr, docs)
    v, w = F.col(attr), F.col(weight_attr)
    return j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v * w).cast("double").alias("vw_sum"),
        F.sum(w).cast("double").alias("w_sum"),
        (F.sum(v * w).cast("double") / F.sum(w).cast("double"))
        .alias("wavg"),
    )


def matrix_stats_agg(engine, query: str, attrs: list[str], docs=None,
                     mode: str = "or", expand_fields: bool = False):
    """ES ``matrix_stats`` aggregation: pairwise covariance and Pearson
    correlation between numeric attributes of the matching docs (the
    "does doc length correlate with recency across this query's
    matches" panel). Returns one row per ordered pair attr_x < attr_y
    (input order): (attr_x, attr_y, n, mean_x, mean_y, var_x, var_y,
    cov, corr), moments e6-rounded; population (1/n) forms.

    Exactness contract: every raw sum (Σx, Σx², Σxy) folds in integer
    space when the attributes are integers — exact in both engines —
    and the f64 derivations use ONE fixed expression shape
    (``Σxx/n − (Σx/n)²`` etc.) mirrored literally in the DuckDB oracle,
    so IEEE determinism makes the rounded values identical. Overflow
    bound: Spark's long sums wrap silently, so integer exactness holds
    while n·max(v)² < 2⁶³ — e.g. 10¹² docs × values up to ~3M. For
    wider-range attributes at corpus scale, pre-center/rescale the
    attribute (moments are translation-covariant) or cast it to double
    upstream (trading last-bit oracle identity for range).

    Spark shape: the match set joins each attribute frame once, then
    ONE global Aggregate computes ALL moments in a single pass (a
    2R + R(R−1)/2-column partial per task); the per-pair output rows
    are column shuffles of that one aggregated row — no second scan."""
    if len(attrs) < 2:
        raise ValueError("matrix_stats needs at least two attributes")
    j = _attr_matches(engine, query, attrs[0], docs, mode, expand_fields)
    for a in attrs[1:]:
        j = _resolve_attr(engine, j, a, docs)
    exprs = [F.count("*").cast("long").alias("n")]
    for a in attrs:
        exprs.append(F.sum(F.col(a)).alias(f"s_{a}"))
        exprs.append(F.sum(F.col(a) * F.col(a)).alias(f"ss_{a}"))
    for i, ax in enumerate(attrs):
        for ay in attrs[i + 1:]:
            exprs.append(F.sum(F.col(ax) * F.col(ay))
                         .alias(f"sp_{ax}_{ay}"))
    one = j.agg(*exprs)
    out = None
    for i, ax in enumerate(attrs):
        for ay in attrs[i + 1:]:
            n = F.col("n").cast("double")
            mx = F.col(f"s_{ax}").cast("double") / n
            my = F.col(f"s_{ay}").cast("double") / n
            vx = F.col(f"ss_{ax}").cast("double") / n - mx * mx
            vy = F.col(f"ss_{ay}").cast("double") / n - my * my
            cov = F.col(f"sp_{ax}_{ay}").cast("double") / n - mx * my
            corr = F.when(vx * vy > 0, cov / F.sqrt(vx * vy))
            sel = one.select(
                F.lit(ax).alias("attr_x"), F.lit(ay).alias("attr_y"),
                F.col("n"),
                F.round(mx, 6).alias("mean_x"),
                F.round(my, 6).alias("mean_y"),
                F.round(vx, 6).alias("var_x"),
                F.round(vy, 6).alias("var_y"),
                F.round(cov, 6).alias("cov"),
                F.round(corr, 6).alias("corr"),
            )
            out = sel if out is None else out.unionByName(sel)
    return out.orderBy("attr_x", "attr_y")


def adjacency_matrix_agg(engine, query: str, filters: dict[str, str],
                         sep: str = "&", mode: str = "or",
                         expand_fields: bool = False):
    """ES ``adjacency_matrix`` aggregation: named filter buckets PLUS
    every pairwise intersection — the co-occurrence grid ("docs matching
    both the 'error' and the 'timeout' saved filters") a drill-down UI
    draws. Keys are the filter name for singles and ``a&b`` (name-sorted)
    for pairs; like ES, only non-empty buckets return. Rows (key, n),
    key asc.

    Spark shape: the tagged union of sub-query match sets (one
    multi-child job, as ``filters_agg``) joins the main match set once;
    singles are a groupBy(name), pairs come from a doc_id self-join of
    the tagged frame — each doc carries ≤|filters| tags, so the join
    emits ≤ C(|filters|,2) rows per doc, bounded by construction, and
    both folds are partial-aggregated. Nothing corpus-sized
    centralizes."""
    if not filters:
        raise ValueError("adjacency_matrix needs at least one named filter")
    for name in filters:
        if sep in name:
            raise ValueError(
                f"filter name {name!r} contains the pair separator {sep!r}")
    hits = engine.match_df(query, mode=mode,
                           expand_fields=expand_fields).select("doc_id")
    tagged = None
    for name in sorted(filters):
        sub = (engine.match_df(filters[name], mode=mode,
                               expand_fields=expand_fields)
               .select("doc_id", F.lit(name).alias("name")))
        tagged = sub if tagged is None else tagged.unionByName(sub)
    t = tagged.join(hits, "doc_id")
    singles = (t.groupBy(F.col("name").alias("key"))
               .agg(F.count("*").cast("long").alias("n")))
    a = t.select("doc_id", F.col("name").alias("na"))
    b = t.select("doc_id", F.col("name").alias("nb"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("na") < F.col("nb"))
        .select(F.concat_ws(sep, "na", "nb").alias("key"))
        .groupBy("key").agg(F.count("*").cast("long").alias("n"))
    )
    return (singles.unionByName(pairs)
            .where(F.col("n") > 0)
            .orderBy(F.asc("key")))


def sampler_agg(engine, query: str, attr: str, shard_size: int = 100,
                docs=None, mode: str = "or", expand_fields: bool = False):
    """ES ``sampler`` aggregation: sub-aggregate over only the TOP
    ``shard_size`` highest-scoring matches — the "what sources dominate
    the best hits" cut that keeps an expensive sub-agg off the long
    tail. The sample here is the global top ``shard_size`` by the
    engine's exact (score desc, doc_id asc) order (ES samples per
    shard; one logical index ⇒ the global form, documented deviation),
    and the sub-aggregation is a terms count over ``attr``. Rows
    (key, n) ordered (n desc, key asc).

    Spark shape: the match set's top-``shard_size`` cut is a
    TakeOrderedAndProject (never a full sort), then the usual tiny
    join + partial-aggregated groupBy over ≤ shard_size rows."""
    sample = (engine.match_df(query, mode=mode,
                              expand_fields=expand_fields)
              .orderBy(F.desc("score"), F.asc("doc_id"))
              .limit(int(shard_size))
              .select("doc_id"))
    dm = engine._live(engine.spark.read.parquet(engine.doc_map_path))
    if attr in dm.columns:
        src = dm
    elif docs is not None and attr in docs.columns:
        src = docs
    else:
        raise ValueError(f"attribute {attr!r} not available")
    return (sample.join(src.select("doc_id", attr), "doc_id")
            .groupBy(F.col(attr).alias("key"))
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("key")))


class _MatchMemo:
    """Engine proxy sharing match sets across one multi-agg request: the
    first use of a (query, mode, expand_fields) match set runs plain; a
    SECOND use upgrades it to ``persist()`` so every further aggregation
    reuses the materialized candidate scan instead of re-running the
    scoring kernels (a once-used frame is never pinned). Everything else
    delegates to the real engine."""

    def __init__(self, engine):
        self._engine = engine
        self._dfs = {}

    def match_df(self, query, mode="or", expand_fields=False):
        key = (query, mode, bool(expand_fields))
        hit = self._dfs.get(key)
        if hit is not None:
            df, persisted = hit
            if not persisted:
                df = df.persist()
                self._dfs[key] = (df, True)
            return df
        df = self._engine.match_df(query, mode=mode,
                                   expand_fields=expand_fields)
        self._dfs[key] = (df, False)
        return df

    def release(self):
        for df, persisted in self._dfs.values():
            if persisted:
                df.unpersist(blocking=True)  # visible-now serving hygiene
        self._dfs.clear()

    def __getattr__(self, name):
        return getattr(self._engine, name)


def _with_pipelines(buckets, a: dict):
    """Apply an optional ``pipelines`` block of a histogram/date_histogram
    spec entry: {"derivative": bool, "cumulative": bool, "movingAvg": N}
    — the ES pipeline-agg (derivative / cumulative_sum / moving_fn)
    request nested under its parent bucket agg."""
    p = a.pop("pipelines", None)
    if not p:
        return buckets
    order = "bucket_epoch" if "bucket_epoch" in buckets.columns else "bucket"
    return pipeline_agg(
        buckets, order_col=order,
        derivative=bool(p.get("derivative", True)),
        cumulative=bool(p.get("cumulative", True)),
        moving_avg=p.get("movingAvg"))


def run_aggs(engine, query: str, spec: dict, mode: str = "or",
             expand_fields: bool = False, docs=None) -> dict:
    """ES multi-aggregation request body: every named entry of ``spec``
    (``{name: {"type": <agg>, ...params}}``) evaluated over ONE shared
    match set — the serving shape, where a dashboard asks for several
    summaries of the same query in one round-trip. The match set is
    lazily persisted on its second use (see :class:`_MatchMemo`) and
    released before returning, so a long-lived daemon leaks nothing.
    Returns ``{name: [row dicts...]}`` with each agg's documented order.
    """
    dispatch = {
        "stats": lambda a: stats_agg(
            memo, query, a["attr"], docs=docs, mode=mode,
            expand_fields=expand_fields),
        "terms": lambda a: terms_agg(
            memo, query, a["attr"], metric_attr=a.get("metric_attr"),
            size=a.get("size"), docs=docs, mode=mode,
            expand_fields=expand_fields),
        "histogram": lambda a: _with_pipelines(histogram_agg(
            memo, query, a["attr"], float(a["interval"]), docs=docs,
            mode=mode, expand_fields=expand_fields,
            min_doc_count=int(a.get("min_doc_count", 1))), a),
        "range": lambda a: range_agg(
            memo, query, a["attr"], list(a["edges"]), docs=docs,
            mode=mode, expand_fields=expand_fields),
        "date_histogram": lambda a: _with_pipelines(date_histogram_agg(
            memo, query, a["attr"], interval=a.get("interval", "1d"),
            docs=docs, mode=mode, expand_fields=expand_fields), a),
        "cardinality": lambda a: cardinality_agg(
            memo, query, a["attr"], exact=bool(a.get("exact", True)),
            rsd=float(a.get("rsd", 0.05)), docs=docs, mode=mode,
            expand_fields=expand_fields),
        "percentiles": lambda a: percentiles_agg(
            memo, query, a["attr"], qs=tuple(a.get("qs",
                (0.25, 0.5, 0.75, 0.95))),
            exact=bool(a.get("exact", True)),
            accuracy=int(a.get("accuracy", 10000)), docs=docs, mode=mode,
            expand_fields=expand_fields),
        "composite": lambda a: composite_agg(
            memo, query, list(a["sources"]), size=a.get("size", 10),
            after=tuple(a["after"]) if a.get("after") else None,
            docs=docs, mode=mode, expand_fields=expand_fields),
        "filters": lambda a: filters_agg(
            memo, query, dict(a["filters"]), mode=mode,
            expand_fields=expand_fields),
        "top_hits": lambda a: top_hits_agg(
            memo, query, a["attr"], size=int(a.get("size", 3)),
            docs=docs, mode=mode, expand_fields=expand_fields),
        "weighted_avg": lambda a: weighted_avg_agg(
            memo, query, a["attr"], a["weight_attr"], docs=docs,
            mode=mode, expand_fields=expand_fields),
        "matrix_stats": lambda a: matrix_stats_agg(
            memo, query, list(a["attrs"]), docs=docs, mode=mode,
            expand_fields=expand_fields),
        "adjacency_matrix": lambda a: adjacency_matrix_agg(
            memo, query, dict(a["filters"]), sep=a.get("sep", "&"),
            mode=mode, expand_fields=expand_fields),
        "sampler": lambda a: sampler_agg(
            memo, query, a["attr"],
            shard_size=int(a.get("shard_size", 100)), docs=docs,
            mode=mode, expand_fields=expand_fields),
    }
    memo = _MatchMemo(engine)
    out = {}
    try:
        for name in sorted(spec):
            a = dict(spec[name])
            typ = a.pop("type", None)
            fn = dispatch.get(typ)
            if fn is None:
                raise ValueError(
                    f"aggregation {name!r}: unknown type {typ!r} "
                    f"(supported: {sorted(dispatch)})")
            out[name] = [r.asDict() for r in fn(a).collect()]
    finally:
        memo.release()
    return out
