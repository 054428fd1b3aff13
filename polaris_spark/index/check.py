"""Index integrity verification — the Lucene CheckIndex analog.

The reference's indexes are guarded by Lucene's CheckIndex tool (segment
header/postings/stored-field verification before serving); this module is
the same offline assurance for our segmented parquet index: every posting
blob must decode to arrays congruent with its row's declared stats, and the
aux tables (dictionary/, completion/, fuzzy_ngrams/, doc_stats/, doc_map/)
must agree with the postings they were folded from.

All heavy checks run DISTRIBUTED: the per-row decode scan is a
``mapInPandas`` over the snapshot-gated postings frame (same published-chunk
view the engine serves — a torn in-flight append is invisible here exactly
as it is to queries), and the congruence checks are join-aggregates that
reduce to per-check violation COUNTS — nothing row-sized ever reaches the
driver. Like Lucene's CheckIndex, run it on a quiescent (published) index:
an append in flight between a table's delta write and the stats publish can
show transient mismatches.

Check inventory (fixed — the ``index_check`` gate hashes against the
constant all-zeros table in ``gate.INDEX_CHECKS``):

- ``decode_error``     a packed blob fails varint/zigzag decode
- ``df_len``           decoded array lengths ≠ the row's ``df``
- ``docs_sorted``      doc_ids not strictly increasing within a row
- ``tf_positive``      a tf < 1
- ``cf_sum``           Σ tfs ≠ the row's ``cf``
- ``bucket_key``       ``crc32(term) % n_buckets`` ≠ the row's bucket dir
- ``salted_shard``     a salted row carries a doc with ``doc % S ≠ shard``
- ``block_shape``      block_last/block_max missing, empty, or unequal length
- ``block_last``       block_last not nondecreasing or last ≠ last doc_id
- ``block_max_bound``  a stored impact outside (0, k1+1] (BM25 impact bound)
- ``positions``        position stream count/len/order ≠ (df, tf, sorted)
- ``dict_congruence``  dictionary (df, cf) per term ≠ postings aggregate
- ``doc_stats_n``      doc_stats row count ≠ stats N, or duplicate doc_ids
- ``sum_dl``           Σ doc_stats.dl ≠ stats sum_dl
- ``doc_map_n``        doc_map row count ≠ stats N, or duplicate doc_ids
- ``completion_subset`` a completion term absent from the dictionary
- ``fuzzy_subset``      a fuzzy_ngrams term absent from the dictionary
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd

ROW_CHECKS = (
    "decode_error", "df_len", "docs_sorted", "tf_positive", "cf_sum",
    "bucket_key", "salted_shard", "block_shape", "block_last",
    "block_max_bound", "positions",
)


def _scan_factory(n_buckets: int, n_shards: int, k1: float, has_pos: bool):
    """Per-row decode/congruence scan (runs inside mapInPandas)."""

    def scan(batches):
        from .codec import decode_ints, decode_positions

        for pdf in batches:
            v = dict.fromkeys(ROW_CHECKS, 0)
            for row in pdf.itertuples(index=False):
                try:
                    docs = decode_ints(row.doc_ids, delta=True)
                    tfs = decode_ints(row.tfs)
                    dls = decode_ints(row.dls)
                except Exception:
                    v["decode_error"] += 1
                    continue
                df = int(row.df)
                if not (len(docs) == len(tfs) == len(dls) == df and df > 0):
                    v["df_len"] += 1
                    continue
                # comparison, NOT np.diff: xxhash64 doc_ids span the full
                # signed-int64 range, so adjacent differences can overflow
                if len(docs) > 1 and not (docs[1:] > docs[:-1]).all():
                    v["docs_sorted"] += 1
                if (tfs < 1).any():
                    v["tf_positive"] += 1
                if int(tfs.sum()) != int(row.cf):
                    v["cf_sum"] += 1
                if zlib.crc32(row.term.encode("utf-8")) % n_buckets \
                        != int(row.bucket):
                    v["bucket_key"] += 1
                if bool(row.salted) and ((docs % n_shards)
                                         != int(row.shard)).any():
                    v["salted_shard"] += 1
                bl, bm = row.block_last, row.block_max
                if bl is None or bm is None or len(bl) == 0 \
                        or len(bl) != len(bm):
                    v["block_shape"] += 1
                else:
                    bl_a = np.asarray(bl, dtype=np.int64)
                    bm_a = np.asarray(bm, dtype=np.float64)
                    if (len(bl_a) > 1 and (bl_a[1:] < bl_a[:-1]).any()) \
                            or int(bl_a[-1]) != int(docs[-1]):
                        v["block_last"] += 1
                    # impact = tf(k1+1)/(tf+k1·norm) < k1+1 for any tf/norm>0
                    if not np.isfinite(bm_a).all() or (bm_a <= 0).any() \
                            or (bm_a > k1 + 1.0 + 1e-9).any():
                        v["block_max_bound"] += 1
                if has_pos and getattr(row, "pos", None) is not None:
                    try:
                        ps = decode_positions(bytes(row.pos), tfs)
                        ok = len(ps) == df and all(
                            len(p) == t for p, t in zip(ps, tfs.tolist())
                        )
                        # sub-tokens share their parent base token's slot,
                        # so positions are nondecreasing, not strict
                        ok = ok and all(
                            (np.asarray(p)[1:] >= np.asarray(p)[:-1]).all()
                            for p in ps if len(p) > 1
                        )
                        if not ok:
                            v["positions"] += 1
                    except Exception:
                        v["positions"] += 1
            yield pd.DataFrame({
                "chk": list(ROW_CHECKS),
                "violations": [v[c] for c in ROW_CHECKS],
            })

    return scan


def check_index(spark, index_dir: str) -> dict:
    """Verify an index end-to-end; returns ``{"ok": bool, "checks":
    {name: violation_count}}`` over the FIXED inventory in the module
    docstring (absent optional tables check vacuously clean — 0)."""
    from pyspark.sql import functions as F

    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, index_dir)
    stats = eng.stats
    posts = eng._posts
    has_pos = "pos" in posts.columns and bool(stats.get("positions"))
    cols = ["term", "bucket", "shard", "salted", "df", "cf",
            "doc_ids", "tfs", "dls", "block_last", "block_max"]
    if has_pos:
        cols.append("pos")
    scan = _scan_factory(int(stats["n_buckets"]), int(stats["n_shards"]),
                         float(stats["k1"]), has_pos)
    rowrep = (
        posts.select(*cols)
        .mapInPandas(scan, "chk string, violations long")
        .groupBy("chk").agg(F.sum("violations").alias("violations"))
        .collect()
    )
    checks: dict[str, int] = dict.fromkeys(ROW_CHECKS, 0)
    for r in rowrep:
        checks[r["chk"]] = int(r["violations"])

    # dictionary ≡ postings aggregate (per term, across generations)
    dic = (
        spark.read.parquet(eng.dict_path)
        .groupBy("term")
        .agg(F.sum("df").alias("df_d"), F.sum("cf").alias("cf_d"))
    )
    pagg = posts.groupBy("term").agg(
        F.sum("df").alias("df_p"), F.sum("cf").alias("cf_p")
    )
    checks["dict_congruence"] = int(
        dic.join(pagg, "term", "full_outer")
        .where(
            F.coalesce("df_d", F.lit(-1)) != F.coalesce("df_p", F.lit(-1))
        )
        .count()
        + dic.join(pagg, "term", "inner")
        .where(F.col("cf_d") != F.col("cf_p"))
        .count()
    )

    n = int(stats["N"])
    ds = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    n_ds = ds.count()
    checks["doc_stats_n"] = int(n_ds != n) + int(
        ds.select("doc_id").distinct().count() != n_ds
    )
    sum_dl = int(ds.agg(F.sum("dl")).collect()[0][0] or 0)
    checks["sum_dl"] = int(sum_dl != int(stats["sum_dl"]))

    dm = spark.read.parquet(eng.doc_map_path)
    n_dm = dm.count()
    checks["doc_map_n"] = int(n_dm != n) + int(
        dm.select("doc_id").distinct().count() != n_dm
    )

    dic_terms = dic.select("term")
    for name, sub in (("completion_subset", "completion"),
                      ("fuzzy_subset", "fuzzy_ngrams")):
        p = os.path.join(index_dir, sub)
        checks[name] = (
            int(spark.read.parquet(p).select("term").distinct()
                .join(dic_terms, "term", "left_anti").count())
            if eng.fs.exists(p) else 0
        )

    return {"ok": all(x == 0 for x in checks.values()), "checks": checks}
