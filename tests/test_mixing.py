"""Data-mixing ops (training-pipeline): deterministic stratified sampling,
token-budget mixture, sequence packing — semantics + Spark↔DuckDB parity
(the same cross-engine-exact arithmetic the gates hash)."""

import duckdb
import pytest

from polaris_spark.ops.mixing import (_MOD, _MULT1, _MULT2, _RES,
                                      duckdb_budget_sql, duckdb_pack_sql,
                                      duckdb_sample_sql, pack_sequences,
                                      stratified_sample, token_budget)

DOCS = [
    # (doc_id, source, text) — token counts 3/5/2/1 per doc crafted so
    # budget/pack boundaries land mid-group
    (0, "a", "x y z"),
    (1, "a", "one two three four five"),
    (2, "a", "p  q"),
    (3, "a", "solo"),
    (4, "b", "a b c d e"),
    (5, "b", "f g h"),
    (6, "b", "i"),
    (7, "c", "j k l m n"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE fixture (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    c.executemany("INSERT INTO fixture VALUES (?, ?, ?)", DOCS)
    return c


def _py_hash(i, seed):
    h = (i + seed) % _MOD
    for m in (_MULT1, _MULT2):
        h = ((h ^ (h >> 15)) * m) % _MOD
    h = h ^ (h >> 16)
    return h % _RES


def test_sample_spec_and_parity(docs, con):
    rates = {"a": 0.5, "c": 0.0}
    out = {r["doc_id"]: (r["mix_u"], r["kept"])
           for r in stratified_sample(docs, rates, default_rate=1.0,
                                      seed=42).collect()}
    # spec: draw is the pure id hash; thresholds per source
    for i, src, _t in DOCS:
        u = _py_hash(i, 42)
        rate = rates.get(src, 1.0)
        assert out[i] == (u, u < round(rate * _RES)), i
    # default 1.0 keeps everything in b; rate 0.0 drops all of c
    assert all(out[i][1] for i in (4, 5, 6))
    assert not out[7][1]
    # DuckDB mirror is value-identical
    want = {r[0]: (r[2], r[3]) for r in con.execute(
        duckdb_sample_sql(rates, 1.0, seed=42, table="fixture")).fetchall()}
    assert want == out


def test_sample_is_partitioning_invariant(docs):
    a = stratified_sample(docs, {"a": 0.5}, seed=1).collect()
    b = stratified_sample(docs.repartition(7), {"a": 0.5}, seed=1).collect()
    assert {(r["doc_id"], r["kept"]) for r in a} \
        == {(r["doc_id"], r["kept"]) for r in b}


def test_token_budget_semantics(docs, con):
    # group a counts: 3,5,2,1 → cum 3,8,10,11; budget 10 keeps ids 0,1,2
    out = {r["doc_id"]: (r["cum_tokens"], r["kept"])
           for r in token_budget(docs, {"a": 10}, default_budget=6).collect()}
    assert out[0] == (3, True) and out[1] == (8, True)
    assert out[2] == (10, True) and out[3] == (11, False)
    # group b (default 6): cum 5,8,9 → only id 4 kept
    assert out[4][1] and not out[5][1] and not out[6][1]
    want = {r[0]: (r[3], r[4]) for r in con.execute(
        duckdb_budget_sql({"a": 10}, 6, table="fixture")).fetchall()}
    assert want == out


def test_pack_semantics(docs, con):
    # capacity 5, group a: excl cums 0,3,8,10 → bins 0,0,1,2
    out = {r["doc_id"]: r["bin_id"]
           for r in pack_sequences(docs, 5).collect()}
    assert [out[i] for i in (0, 1, 2, 3)] == [0, 0, 1, 2]
    # group b: excl 0,5,8 → bins 0,1,1; singleton group c → bin 0
    assert [out[i] for i in (4, 5, 6)] == [0, 1, 1]
    assert out[7] == 0
    want = {r[0]: r[3] for r in con.execute(
        duckdb_pack_sql(5, table="fixture")).fetchall()}
    assert want == out


def test_pack_oversized_doc_gets_own_bin_progression(docs, con):
    # capacity 2: doc 1 (5 tokens) straddles but starts in bin 1 (excl=3);
    # doc 2 starts at excl=8 → bin 4 — bins skip, docs never split
    out = {r["doc_id"]: r["bin_id"]
           for r in pack_sequences(docs, 2).collect()}
    assert [out[i] for i in (0, 1, 2, 3)] == [0, 1, 4, 5]
    want = {r[0]: r[3] for r in con.execute(
        duckdb_pack_sql(2, table="fixture")).fetchall()}
    assert want == out


def test_sample_hash_spark_matches_python(docs):
    got = {r["doc_id"]: r["mix_u"]
           for r in stratified_sample(docs, {}, seed=7).collect()}
    assert got == {i: _py_hash(i, 7) for i, _s, _t in DOCS}


def test_cli_mix_pipeline(spark, docs, tmp_path):
    """`mix` subcommand end-to-end (in-process; spark-submit packaging is
    covered by test_cli_spark_submit's shared build/query path)."""
    import json

    from polaris_spark.cli import main

    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "mixed.parquet")
    docs.write.parquet(inp)
    rc = main(["mix", "--input", inp, "--output", out,
               "--rates", "c=0.0", "--default-rate", "1.0", "--seed", "1",
               "--budgets", "a=10", "--default-budget", "6",
               "--capacity", "5"])
    assert rc in (0, None)
    res = spark.read.parquet(out)
    ids = {r["doc_id"] for r in res.collect()}
    # c dropped by rate 0; budgets keep a:{0,1,2} (cum 3,8,10) and b:{4}
    assert ids == {0, 1, 2, 4}
    assert "bin_id" in res.columns


# ------------------------------------------------------------ split_assign

def test_split_disjoint_exhaustive_and_parity(docs, con):
    from polaris_spark.ops.mixing import duckdb_split_sql, split_assign

    out = split_assign(docs, {"val": 0.25, "test": 0.25}, seed=3).collect()
    assert len(out) == len(DOCS)  # one split per row, no dupes/drops
    assert all(r["split"] in ("train", "val", "test") for r in out)
    # draw is the shared sample hash — same as stratified_sample's mix_u
    assert {r["doc_id"]: r["split_u"] for r in out} == \
        {i: _py_hash(i, 3) for i, _s, _t in DOCS}
    want = {r[0]: r[2] for r in con.execute(duckdb_split_sql(
        {"val": 0.25, "test": 0.25}, seed=3, table="fixture")).fetchall()}
    assert want == {r["doc_id"]: r["split"] for r in out}


def test_split_monotone_growth_of_name_first_split(docs):
    """Growing the name-first split's fraction (name-earlier fractions
    vacuously fixed) yields a superset of its previous membership."""
    from polaris_spark.ops.mixing import split_assign

    small = {r["doc_id"] for r in
             split_assign(docs, {"eval": 0.2}, seed=5).collect()
             if r["split"] == "eval"}
    big = {r["doc_id"] for r in
           split_assign(docs, {"eval": 0.6}, seed=5).collect()
           if r["split"] == "eval"}
    assert small <= big and len(big) > len(small)


def test_split_is_partition_invariant(docs):
    from polaris_spark.ops.mixing import split_assign

    a = {(r["doc_id"], r["split"]) for r in
         split_assign(docs, {"val": 0.3}, seed=9).collect()}
    b = {(r["doc_id"], r["split"]) for r in
         split_assign(docs.repartition(7), {"val": 0.3}, seed=9).collect()}
    assert a == b


def test_temperature_rates_formula():
    from polaris_spark.ops.mixing import temperature_rates

    counts = {"a": 4, "b": 3, "c": 1}
    # alpha=1 -> natural proportions: every source keeps target_frac
    r1 = temperature_rates(counts, alpha=1.0, target_frac=0.5)
    assert all(abs(v - 0.5) < 1e-12 for v in r1.values())
    # alpha=0 -> uniform over sources: rate_s = target*N/(S*n_s)
    r0 = temperature_rates(counts, alpha=0.0, target_frac=0.5)
    assert abs(r0["a"] - 0.5 * 8 / (3 * 4)) < 1e-12
    assert abs(r0["c"] - min(1.0, 0.5 * 8 / (3 * 1))) < 1e-12
    # small source saturates at 1.0 (cap), bigger ones stay below
    rs = temperature_rates(counts, alpha=0.0, target_frac=0.9)
    assert rs["c"] == 1.0 and rs["a"] < 1.0
    # alpha between: small sources get boosted relative to natural
    rh = temperature_rates(counts, alpha=0.5, target_frac=0.5)
    assert rh["c"] > rh["a"]
    assert temperature_rates({}, 0.5, 0.5) == {}


def test_temperature_sample_parity_and_shape(docs, con):
    from polaris_spark.ops.mixing import (duckdb_temperature_sql,
                                          temperature_sample)

    got = {(r["doc_id"], r["mix_u"], r["kept"]) for r in
           temperature_sample(docs, alpha=0.5, target_frac=0.6,
                              seed=3).select(
               "doc_id", "mix_u", "kept").collect()}
    want = {(i, u, bool(k)) for i, _s, u, k in con.execute(
        duckdb_temperature_sql(alpha=0.5, target_frac=0.6, seed=3,
                               table="fixture")).fetchall()}
    assert {(i, u, bool(k)) for i, u, k in got} == want
    # partitioning invariance (the hash decides, not the layout)
    again = {(r["doc_id"], r["kept"]) for r in
             temperature_sample(docs.repartition(5), alpha=0.5,
                                target_frac=0.6, seed=3)
             .select("doc_id", "kept").collect()}
    assert again == {(i, k) for i, _u, k in got}


def test_upsample_epochs_semantics(docs, con):
    from polaris_spark.ops.mixing import (duckdb_upsample_sql,
                                          upsample_epochs)

    rep = {"a": 2, "b": 0}
    out = upsample_epochs(docs, rep, default_repeat=1).select(
        "doc_id", "source", "copy_idx").collect()
    rows = sorted((r["doc_id"], r["copy_idx"]) for r in out)
    # a-docs twice (copy 0,1), b-docs gone, c-doc once
    assert rows == [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1),
                    (3, 0), (3, 1), (7, 0)]
    want = sorted(con.execute(
        duckdb_upsample_sql(rep, default_repeat=1,
                            table="fixture")).fetchall())
    assert sorted((i, s, c) for i, s, c in
                  ((r["doc_id"], r["source"], r["copy_idx"])
                   for r in out)) == want


def test_materialize_bins_semantics_and_parity(docs, con):
    from polaris_spark.ops.mixing import (duckdb_bins_sql,
                                          materialize_bins,
                                          pack_sequences)

    out = {(r["source"], r["bin_id"]):
           (r["n_docs"], r["n_tokens"], tuple(r["doc_ids"]),
            tuple(r["offsets"]), r["text"])
           for r in materialize_bins(docs, capacity=6).collect()}
    # consistency with pack_sequences' assignment
    packed = pack_sequences(docs, capacity=6).collect()
    want_members = {}
    for r in sorted(packed, key=lambda r: r["doc_id"]):
        want_members.setdefault((r["source"], r["bin_id"]),
                                []).append(r["doc_id"])
    assert {k: list(v[2]) for k, v in out.items()} == want_members
    # offsets: first 0, strictly increasing by member token counts; the
    # bin text is the member texts joined in id order
    by_id = {d: t for d, _s, t in DOCS}
    ntok = {d: len(t.split()) for d, t in by_id.items()}
    for (_s, _b), (n_docs, n_tokens, ids, offs, text) in out.items():
        assert offs[0] == 0 and n_docs == len(ids)
        for j in range(1, len(ids)):
            assert offs[j] == offs[j - 1] + ntok[ids[j - 1]]
        assert n_tokens == sum(ntok[i] for i in ids)
        assert text == " ".join(by_id[i] for i in ids)
    # DuckDB mirror parity
    want = {(s, b): (nd, nt, tuple(di), tuple(of), tx)
            for s, b, nd, nt, di, of, tx in con.execute(
                duckdb_bins_sql(capacity=6, table="fixture")).fetchall()}
    assert out == want


# ------------------------------------------- scale-safe cumsum (round 5)

def test_budget_pack_partition_invariance_large_groups(spark, con):
    """The two-pass global cumsum (`_global_keyed_cumsum`) must be a pure
    function of the data — identical across input partitionings and
    shuffle-partition counts, with each source SPANNING many partitions
    (the 100×-scale shape a per-source window can't reach) — and equal
    to the single-window DuckDB oracle."""
    from polaris_spark.ops.mixing import pack_sequences, token_budget

    rows = [(i, "s%d" % (i % 3), "w " * (1 + i % 7)) for i in range(300)]
    big = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    con.execute("CREATE OR REPLACE TABLE big AS SELECT * FROM (VALUES %s)"
                " t(doc_id, source, text)" % ",".join(
                    "(%d, '%s', '%s')" % r for r in rows))
    want_budget = {r[0]: (r[3], r[4]) for r in con.execute(
        duckdb_budget_sql({"s0": 120}, 150, table="big")).fetchall()}
    want_pack = {r[0]: r[3] for r in con.execute(
        duckdb_pack_sql(40, table="big")).fetchall()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for npart, shuf in ((1, "5"), (7, "32"), (64, prev)):
            spark.conf.set("spark.sql.shuffle.partitions", shuf)
            df = big.repartition(npart)
            got_b = {r["doc_id"]: (r["cum_tokens"], r["kept"]) for r in
                     token_budget(df, {"s0": 120}, 150).collect()}
            assert got_b == want_budget, (npart, shuf)
            got_p = {r["doc_id"]: r["bin_id"] for r in
                     pack_sequences(df, 40).collect()}
            assert got_p == want_pack, (npart, shuf)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_copy_idx_tiebreak_determinism(spark, docs, con):
    """After upsample_epochs, budget/pack order by (id, copy_idx) — the
    tie order among copies is deterministic across partitionings and
    mirrored by the order_by-extended DuckDB SQL (ADVICE r4 medium)."""
    from polaris_spark.ops.mixing import (pack_sequences, token_budget,
                                          upsample_epochs)

    up = upsample_epochs(docs, {"a": 3, "b": 2}, default_repeat=1)
    con.execute("CREATE OR REPLACE TABLE up AS SELECT f.doc_id, gs.copy_idx"
                "::INT AS copy_idx, f.source, f.text FROM fixture f, "
                "LATERAL (SELECT unnest(range(0, CASE WHEN f.source='a' "
                "THEN 3 WHEN f.source='b' THEN 2 ELSE 1 END)) AS copy_idx)"
                " gs")
    want_b = {(r[0], r[1]): (r[4], r[5]) for r in con.execute(
        duckdb_budget_sql({"a": 20}, 8, table="up",
                          order_by=("doc_id", "copy_idx"))).fetchall()}
    want_p = {(r[0], r[1]): r[4] for r in con.execute(
        duckdb_pack_sql(6, table="up",
                        order_by=("doc_id", "copy_idx"))).fetchall()}
    for npart in (1, 7):
        df = up.repartition(npart)
        got_b = {(r["doc_id"], r["copy_idx"]): (r["cum_tokens"], r["kept"])
                 for r in token_budget(df, {"a": 20}, 8).collect()}
        assert got_b == want_b, npart
        got_p = {(r["doc_id"], r["copy_idx"]): r["bin_id"]
                 for r in pack_sequences(df, 6).collect()}
        assert got_p == want_p, npart
    # copies of one id take consecutive cum steps in copy order
    cums = {(r["doc_id"], r["copy_idx"]): r["cum_tokens"]
            for r in token_budget(up, {"a": 20}, 8).collect()}
    assert cums[(0, 0)] < cums[(0, 1)] < cums[(0, 2)]


def test_materialize_bins_with_copies_matches_oracle(spark, docs, con):
    """materialize_bins after an upsample: member lists carry duplicate
    ids in (id, copy) order; oracle via order_by-extended bins SQL."""
    from polaris_spark.ops.mixing import (duckdb_bins_sql, materialize_bins,
                                          upsample_epochs)

    up = upsample_epochs(docs, {"a": 2}, default_repeat=1)
    con.execute("CREATE OR REPLACE TABLE up2 AS SELECT f.doc_id, gs.copy_"
                "idx::INT AS copy_idx, f.source, f.text FROM fixture f, "
                "LATERAL (SELECT unnest(range(0, CASE WHEN f.source='a' "
                "THEN 2 ELSE 1 END)) AS copy_idx) gs")
    got = {(r["source"], r["bin_id"]): (tuple(r["doc_ids"]),
                                        tuple(r["offsets"]), r["text"])
           for r in materialize_bins(up, capacity=7).collect()}
    want = {(s, b): (tuple(di), tuple(of), tx)
            for s, b, _nd, _nt, di, of, tx in con.execute(
                duckdb_bins_sql(capacity=7, table="up2",
                                order_by=("doc_id", "copy_idx"))
            ).fetchall()}
    assert got == want


def test_temperature_null_key_parity(spark, con):
    """NULL-source rows: Spark keeps them with kept=false (default thr
    0); the oracle's LEFT JOIN + coalesce now matches instead of
    dropping them (ADVICE r4 low)."""
    from polaris_spark.ops.mixing import (duckdb_temperature_sql,
                                          temperature_sample)

    rows = [(0, "a", "x"), (1, None, "y"), (2, "a", "z"), (3, None, "w")]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    con.execute("CREATE OR REPLACE TABLE nt (doc_id BIGINT, source "
                "VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO nt VALUES (?, ?, ?)", rows)
    got = sorted((r["doc_id"], r["mix_u"], bool(r["kept"])) for r in
                 temperature_sample(df, alpha=0.5, target_frac=1.0,
                                    seed=2).select(
                     "doc_id", "mix_u", "kept").collect())
    want = sorted((i, u, bool(k)) for i, _s, u, k in con.execute(
        duckdb_temperature_sql(alpha=0.5, target_frac=1.0, seed=2,
                               table="nt")).fetchall())
    assert got == want and len(got) == 4
    assert all(not k for i, _u, k in got if i in (1, 3))


def test_budget_null_key_group(spark, con):
    """NULL-source rows form their own budget group (window semantics
    preserved by the two-pass cumsum: pandas groupby(dropna=False) +
    per-(partition, key) offsets keyed by None)."""
    rows = [(0, None, "a b c"), (1, "s", "d e"), (2, None, "f g"),
            (3, "s", "h")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["cum_tokens"], r["kept"]) for r in
           token_budget(df, {}, default_budget=4).collect()}
    # null group cums: 3, 5 → kept, cut; s group: 2, 3 → kept, kept
    assert out == {0: (3, True), 2: (5, False), 1: (2, True), 3: (3, True)}
    con.execute("CREATE OR REPLACE TABLE nk (doc_id BIGINT, source "
                "VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO nk VALUES (?, ?, ?)", rows)
    want = {r[0]: (r[3], r[4]) for r in con.execute(
        duckdb_budget_sql({}, 4, table="nk")).fetchall()}
    assert want == out
