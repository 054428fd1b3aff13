"""Driver-condition gate rehearsal: run EVERY ``queries()``/``oracle_sql()``
pair from ``__spark_entry__`` side-by-side with DuckDB at a chosen scale
factor — rows + columns + order-insensitive rounded values — the same
comparison the round driver applies at sf0.01.

Why it exists: sf0.001 unit fixtures miss 6th-decimal float issues that
sf0.01 surfaces (e.g. float32 multiply before the double cast in cosine
kernels); a full rehearsal takes ~10 min at sf0.01/local[16] and catches
them before the round gate does.

Run: python tools/gate_rehearsal.py [--sf /root/testdata/sf0.01]
     [--cpus 16] [--only gate1,gate2]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Driver-faithful canonical form: the round driver hashes STRINGIFIED
    values, so ``123`` (int64) vs ``123.0`` (float64) must compare UNEQUAL
    here too — Python's ``123 == 123.0`` let exactly that class escape in
    round 3 (token_budget).  Floats are rounded to 9 decimals first (same
    tolerance as before) but keep their float repr."""
    if v is None:
        return "None"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(norm(x) for x in v) + "]"
    if hasattr(v, "tolist") and getattr(v, "ndim", 0):  # ndarray via .df()
        return norm(v.tolist())
    if hasattr(v, "item"):  # numpy scalar out of DuckDB
        return norm(v.item())
    if isinstance(v, bool):  # before int: bool is an int subclass
        return str(v)
    if v != v:  # NaN / NaT → same spelling as a null
        return "None"
    if isinstance(v, float):
        return str(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--only", default=None,
                    help="comma-separated gate subset")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    os.chdir(REPO)
    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        # code-cache headroom for 135 gates of codegen through one JVM
        # (bench.py measured the full suite peaking ~125 MB — inside the
        # 240 MB JVM default — so this is margin, not a fix)
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs, oracles = m.queries(), m.oracle_sql()
    names = sorted(oracles)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    fails = []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # Fetch via pandas like the round driver does: DuckDB HUGEINT
            # (e.g. a windowed sum over BIGINT) becomes float64 THERE, not
            # in fetchall() — that dtype coercion is the r3 escape class.
            ddf = con.execute(oracles[name]).df()
            dcols = list(ddf.columns)
            drows = list(ddf.itertuples(index=False, name=None))
            ok = (sorted(scols) == sorted(dcols)
                  and len(srows) == len(drows)
                  and canon(srows, scols) == canon(drows, dcols))
            print(("PASS" if ok else "FAIL"), name, len(srows), flush=True)
            if not ok:
                fails.append(name)
        except Exception as e:  # a gate crash is a gate fail
            print("ERROR", name, type(e).__name__, str(e)[:200], flush=True)
            fails.append(name)
    print(json.dumps({"total": len(names), "fails": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
