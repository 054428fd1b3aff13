"""End-to-end training-data recipe (round 5): curate → temperature mix →
epoch upsample → global shuffle → pack → materialize, composed as ONE
job and gated against ONE DuckDB oracle — proves the pipeline ops
compose without divergence between stages."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def _canon(rows):
    return sorted(
        (r[0], r[1], r[2], tuple(r[3]), tuple(r[4]), r[5]) for r in rows)


def test_recipe_matches_single_oracle(spark, docs, con):
    from pyspark.sql import functions as F

    from polaris_spark.ops.recipe import duckdb_recipe_sql, training_recipe

    got = training_recipe(
        docs, bench=docs.where(F.col("doc_id") % 7 == 0),
        alpha=0.5, target_frac=0.7, repeats={"src1": 2}, capacity=512,
        seed=3)
    want = con.execute(duckdb_recipe_sql(
        bench_where="doc_id % 7 = 0", alpha=0.5, target_frac=0.7,
        repeats={"src1": 2}, capacity=512, seed=3)).fetchall()
    grows = [(r["bin_id"], r["n_docs"], r["n_tokens"],
              tuple(r["doc_ids"]), tuple(r["offsets"]), r["text"])
             for r in got.collect()]
    assert _canon(grows) == _canon(want)
    assert len(grows) > 3  # non-trivial: multiple bins survived


def test_recipe_partition_invariance(spark, docs):
    """The composed pipeline is a pure function of the data — identical
    across input partitionings (each stage's determinism survives
    composition)."""
    from polaris_spark.ops.recipe import training_recipe

    a = training_recipe(docs, alpha=0.7, target_frac=0.5,
                        capacity=256, seed=1)
    b = training_recipe(docs.repartition(13), alpha=0.7, target_frac=0.5,
                        capacity=256, seed=1)
    ka = _canon([(r["bin_id"], r["n_docs"], r["n_tokens"],
                  tuple(r["doc_ids"]), tuple(r["offsets"]), r["text"])
                 for r in a.collect()])
    kb = _canon([(r["bin_id"], r["n_docs"], r["n_tokens"],
                  tuple(r["doc_ids"]), tuple(r["offsets"]), r["text"])
                 for r in b.collect()])
    assert ka == kb and len(ka) > 0


def test_recipe_cli_smoke(spark, tmp_path):
    """`recipe` subcommand end-to-end (in-process): bins parquet with the
    trainer-manifest schema and conserved token mass."""
    import json

    from polaris_spark.cli import main

    out = str(tmp_path / "bins.parquet")
    rc = main(["recipe", "--input", f"{SF}/documents.parquet",
               "--output", out, "--alpha", "0.7", "--target-frac", "0.5",
               "--epochs", "src1=2", "--capacity", "256", "--seed", "1"])
    assert rc in (0, None)
    res = spark.read.parquet(out)
    assert set(res.columns) == {"bin_id", "n_docs", "n_tokens", "doc_ids",
                                "offsets", "text"}
    rows = res.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_docs"] == len(r["doc_ids"]) == len(r["offsets"])
        assert r["offsets"][0] == 0
        assert r["n_tokens"] == len(r["text"].split())
