"""Training-data ops: Spark implementation vs DuckDB mirror on real testdata
(sf0.001 documents/embeddings) — a local rehearsal of the driver's gate."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return c


def _cmp(spark_df, duck_rows, key=None):
    got = sorted(map(tuple, spark_df.collect()))
    exp = sorted(map(tuple, duck_rows))
    assert len(got) == len(exp), f"{len(got)} vs {len(exp)}"
    assert got == exp


def test_exact_dup_groups(spark, docs, con):
    from polaris_spark.ops.dedup import exact_dup_groups

    _cmp(
        exact_dup_groups(docs),
        con.execute(
            "SELECT md5(text) fp, count(*) n, min(doc_id) k FROM documents GROUP BY 1"
        ).fetchall(),
    )


def test_minhash_signatures(spark, docs, con):
    from polaris_spark.ops.dedup import duckdb_minhash_sql, minhash_signatures

    _cmp(
        minhash_signatures(docs, k=8),
        con.execute(duckdb_minhash_sql("documents", "doc_id", "text", k=8)).fetchall(),
    )


def test_jaccard_pairs_runs(spark, docs):
    from polaris_spark.ops.dedup import jaccard_pairs

    # synthetic corpus has no near-dups at this threshold; assert plumbing
    out = jaccard_pairs(docs, threshold=0.8).collect()
    assert isinstance(out, list)


def test_lsh_candidates_subset_consistency(spark, docs):
    from polaris_spark.ops.dedup import jaccard_pairs, lsh_candidate_pairs

    # every truly-identical pair must be an LSH candidate (here: none exist,
    # so just check the op runs and yields no self-pairs)
    cands = lsh_candidate_pairs(docs.limit(100)).collect()
    assert all(r["doc_a"] < r["doc_b"] for r in cands)


def test_cosine_topk_vs_duckdb(spark, con):
    from polaris_spark.ops.similarity import cosine_topk, duckdb_cosine_topk_sql

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = con.execute("SELECT embedding FROM embeddings WHERE vec_id = 0").fetchone()[0]
    got = [(r["vec_id"], r["sim"]) for r in cosine_topk(emb, q, k=10).collect()]
    exp = con.execute(duckdb_cosine_topk_sql("embeddings", "vec_id", "embedding", q, 10)).fetchall()
    assert got == [tuple(r) for r in exp]


def test_ivf_full_probe_equals_bruteforce(spark, con, tmp_path):
    from polaris_spark.ops.similarity import build_ivf, cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = con.execute("SELECT embedding FROM embeddings WHERE vec_id < 4 ORDER BY vec_id").fetchall()
    centroids = [list(r[0]) for r in rows]
    q = centroids[1]
    d = str(tmp_path / "ivf")
    build_ivf(spark, emb, d, centroids=centroids)
    brute = [(r["vec_id"], r["sim"]) for r in cosine_topk(emb, q, k=10).collect()]
    full = [(r["vec_id"], r["sim"]) for r in ivf_topk(spark, d, q, k=10, nprobe=4).collect()]
    assert brute == full
    # reduced probe returns a subset ranking, same ordering rules
    part = [(r["vec_id"], r["sim"]) for r in ivf_topk(spark, d, q, k=10, nprobe=1).collect()]
    assert len(part) <= 10 and part == sorted(part, key=lambda t: (-t[1], t[0]))


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """The probe must read only nprobe centroid_id= partitions —
    PartitionFilters at file-listing time, no inline re-assignment."""
    from polaris_spark.ops.similarity import build_ivf, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = str(tmp_path / "ivf")
    build_ivf(spark, emb, d, n_centroids=4, seed=7)
    q = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    df = ivf_topk(spark, d, q, k=5, nprobe=1)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    assert df.count() <= 5


def test_kmeans_centroids_deterministic(spark):
    from polaris_spark.ops.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    b = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    assert a == b
    assert len(a) == 4 and all(len(c) == 64 for c in a)
    import numpy as np

    for c in a:  # spherical k-means → unit-norm centroids
        assert abs(np.linalg.norm(c) - 1.0) < 1e-9


def test_kmeans_hash_sample_unbiased_and_recall_invariant(spark, tmp_path):
    """The seeded hash-sample (not first-N-by-id) draws from the whole id
    range; a different seed draws a different sample (→ different
    centroids), yet nprobe=all IVF results stay exactly brute-force."""
    from polaris_spark.ops.similarity import (
        build_ivf,
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    b = kmeans_centroids(emb, n_centroids=4, seed=8, sample_n=200)
    assert a != b  # sample (and thus centroids) depend on the seed
    q = [float(x) for x in
         emb.where("vec_id = 0").select("embedding").collect()[0][0]]
    brute = [(r["vec_id"], r["sim"]) for r in cosine_topk(emb, q, k=10).collect()]
    for seed, cents in ((7, a), (8, b)):
        d = str(tmp_path / f"ivf_s{seed}")
        build_ivf(spark, emb, d, centroids=cents)
        full = [(r["vec_id"], r["sim"])
                for r in ivf_topk(spark, d, q, k=10, nprobe=4).collect()]
        assert full == brute, seed


def test_quality_and_langid_and_fp_vs_duckdb(spark, docs, con):
    from pyspark.sql import functions as F

    from polaris_spark.ops.text import (
        duckdb_fingerprint_sql,
        duckdb_langid_sql,
        duckdb_quality_sql,
        fingerprint_col,
        langid_col,
        quality_cols,
    )

    got = docs.select(F.col("doc_id"), *quality_cols(F.col("text")),
                      langid_col(F.col("text")).alias("lang_pred"),
                      fingerprint_col(F.col("text")).alias("fp"))
    exp = con.execute(
        f"SELECT doc_id, {duckdb_quality_sql('text')}, {duckdb_langid_sql('text')} AS lang_pred, "
        f"{duckdb_fingerprint_sql('text')} AS fp FROM documents"
    ).fetchall()
    _cmp(got, exp)


def test_langid_widened_tables(spark):
    """The 10-language tables classify plain sentences in each language
    (and still return 'und' on stopword-free text)."""
    from pyspark.sql import functions as F

    from polaris_spark.ops.text import LANGS, langid_col

    sents = {
        "en": "the cat sat on the mat and it was happy with that",
        "de": "der hund ist nicht mit der katze auf dem sofa und das ist gut",
        "fr": "le chat est sur la table avec les livres pour le professeur",
        "es": "el perro está en la casa con los niños y es muy feliz",
        "it": "il gatto è sulla tavola con il libro e non si muove più",
        "pt": "o cachorro não está em casa com os meninos mas é muito feliz",
        "nl": "de hond is niet met de kat op de bank en dat is ook goed",
        "sv": "jag är i huset och det är mycket bra att du kan vara här nu",
        "pl": "to jest bardzo dobre i nie trzeba się już tak bardzo bać",
        "id": "saya akan pergi ke pasar dengan mereka untuk membeli yang ini",
        "und": "zzz qqq xxx vvv kkk",
    }
    df = spark.createDataFrame(list(sents.items()), "lang string, text string")
    got = {r["lang"]: r["pred"]
           for r in df.select("lang", langid_col(F.col("text")).alias("pred")).collect()}
    assert got == {L: L for L in sents}
    assert set(LANGS) == set(sents) - {"und"}


def test_token_counts_vs_duckdb(spark, docs, con):
    from pyspark.sql import functions as F

    from polaris_spark.ops.text import duckdb_ws_tokens, token_count_cols
    from polaris_spark.tokenizer import duckdb_tokens_sql

    got = docs.select("doc_id", *token_count_cols(F.col("text")))
    exp = con.execute(
        f"SELECT doc_id, len({duckdb_ws_tokens('text')}) AS n_ws_tokens, "
        f"len({duckdb_tokens_sql('text')}) AS n_terms FROM documents"
    ).fetchall()
    _cmp(got, exp)


def test_simhash_runs(spark, docs):
    from pyspark.sql import functions as F

    from polaris_spark.ops.dedup import simhash_col

    rows = docs.limit(20).select("doc_id", simhash_col(F.col("text")).alias("sh")).collect()
    assert all(len(r["sh"]) == 4 for r in rows)  # 16 bits → 4 hex nibbles


def test_dup_clusters_chain_and_duckdb_mirror(spark):
    """Connected components: chain needs >1 propagation round; result equals
    the DuckDB recursive-CTE transitive closure on the same edges."""
    import duckdb

    from polaris_spark.ops.dedup import dup_clusters, duckdb_dup_clusters_sql

    pairs = [(10, 20), (20, 30), (30, 40),   # chain → one cluster, min=10
             (100, 200),                      # pair
             (7, 5), (5, 9)]                  # min in middle position
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pdf).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 10,
                   100: 100, 200: 100, 7: 5, 5: 5, 9: 5}

    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = duckdb_dup_clusters_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(doc_a, doc_b)"
    )
    oracle = dict(duckdb.sql(sql).fetchall())
    assert got == oracle


def test_dup_clusters_star_agrees_on_long_chain(spark):
    """Large-star/small-star (the adversarial-graph path) must agree with
    min-label propagation on a chain whose diameter forces >3 propagation
    rounds, and on a mixed multi-component graph."""
    from polaris_spark.ops.dedup import dup_clusters, dup_clusters_star

    # 21-node path graph: diameter 20 ⇒ min-label needs ~20 rounds
    chain = [(i * 3 + 1, (i + 1) * 3 + 1) for i in range(20)]  # 1-4-7-...-61
    extra = [(1000, 2000), (2000, 1500), (9, 6)]  # disjoint components
    pdf = spark.createDataFrame(chain + extra, "doc_a long, doc_b long")
    a = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pdf, max_iter=30).collect()}
    b = {r["doc_id"]: r["cluster_id"] for r in dup_clusters_star(pdf).collect()}
    assert a == b
    # whole chain collapses to min node 1
    assert all(a[i * 3 + 1] == 1 for i in range(21))
    assert b[1500] == 1000 and b[9] == 6


def test_dup_clusters_star_on_lsh_candidates(spark, docs):
    """Star CC must reproduce min-label labels on the real LSH candidate
    graph (the gate's input shape)."""
    from polaris_spark.ops.dedup import (
        dup_clusters,
        dup_clusters_star,
        lsh_candidate_pairs,
    )

    pairs = lsh_candidate_pairs(docs, k=8, bands=4).cache()
    a = sorted(tuple(r) for r in dup_clusters(pairs).collect())
    b = sorted(tuple(r) for r in dup_clusters_star(pairs).collect())
    assert a == b and a


def test_decontaminate_semantics(spark):
    """GPT-3 13-gram rule semantics on a hand-built corpus: a doc sharing a
    bench n-gram is flagged (with the distinct-gram count), an unrelated doc
    is clean, a short doc is flagged only on exact full-text match."""
    from polaris_spark.ops.dedup import decontaminate

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "tiny text")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # contains the bench 3-grams "alpha beta gamma" + "beta gamma delta"
            (10, "zero alpha beta gamma delta more words here"),
            (11, "totally unrelated words only nothing shared at all"),
            (12, "tiny text"),          # exact short match (fallback gram)
            (13, "tiny text extended"), # 3 tokens -> gram "tiny text extended", no hit
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_hit_ngrams"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    assert out == {10: (2, True), 11: (0, False), 12: (1, True), 13: (0, False)}


def test_decontaminate_broadcasts_bench(spark):
    """Plan evidence for the scale claim: the bench n-gram join must be a
    BroadcastHashJoin (map-only corpus pass, no corpus shuffle on gram)."""
    from polaris_spark.ops.dedup import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pyspark.sql import functions as F

    plan = decontaminate(docs, docs.where(F.col("doc_id") % 7 == 0), n=13) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_knn_join_bucketed_subset_of_exact(spark):
    """The SRP-bucketed knn_join must return rows that exist in the exact
    brute-force result with identical cosines, descending per vec_id (the
    documented recall<1 trade never invents or mis-scores a neighbor)."""
    from polaris_spark.ops.similarity import knn_join, srp_candidate_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where("vec_id < 120")
    exact_all = {
        (r["vec_id"], r["neighbor_id"]): r["cos"]
        for r in knn_join(emb, k=119).collect()
    }
    cand = srp_candidate_pairs(emb, n_bits=8, seed=3)
    got = knn_join(emb, k=3, candidates=cand).collect()
    assert got, "bucketed path returned nothing"
    by_vec = {}
    for r in got:
        assert exact_all[(r["vec_id"], r["neighbor_id"])] == r["cos"]
        by_vec.setdefault(r["vec_id"], []).append((r["rank"], r["cos"]))
    for ranks in by_vec.values():
        ranks.sort()
        assert [c for _, c in ranks] == sorted(
            (c for _, c in ranks), reverse=True)


def test_cli_decontam(spark, docs, tmp_path):
    """`decontam` subcommand end-to-end (in-process), flag + drop modes:
    drop output rows == flag output minus contaminated ids."""
    import json

    from polaris_spark.cli import main

    inp, bench = str(tmp_path / "docs.parquet"), str(tmp_path / "bench.parquet")
    flags_out = str(tmp_path / "flags.parquet")
    clean_out = str(tmp_path / "clean.parquet")
    docs.write.parquet(inp)
    docs.where("doc_id % 7 = 0").write.parquet(bench)
    assert main(["decontam", "--input", inp, "--bench", bench,
                 "--output", flags_out]) in (0, None)
    assert main(["decontam", "--input", inp, "--bench", bench,
                 "--output", clean_out, "--drop"]) in (0, None)
    flags = spark.read.parquet(flags_out)
    clean_ids = {r["doc_id"] for r in spark.read.parquet(clean_out).collect()}
    bad_ids = {r["doc_id"] for r in flags.where("contaminated").collect()}
    all_ids = {r["doc_id"] for r in flags.collect()}
    assert bad_ids and clean_ids == all_ids - bad_ids
    assert {"n_hit_ngrams", "contaminated"} <= set(flags.columns)


def test_hard_negatives_filter_then_rank(spark):
    """hard_negatives must (a) never return a same-label neighbor, and
    (b) rank AFTER the label filter — equivalent to dropping same-label
    rows from the per-anchor exact similarity ORDER, not from its top-k
    (a same-label near-dup must not consume a rank)."""
    from polaris_spark.ops.similarity import hard_negatives, knn_join

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where("vec_id < 120")
    labels = {r["vec_id"]: r["label"]
              for r in emb.select("vec_id", "label").collect()}
    got = hard_negatives(emb, k=3).collect()
    assert got
    for r in got:
        assert labels[r["vec_id"]] != labels[r["neighbor_id"]]
    # oracle: full exact order per anchor, filtered, then cut to 3
    full = knn_join(emb, k=119).collect()
    by_vec = {}
    for r in sorted(full, key=lambda r: (r["vec_id"], r["rank"])):
        if labels[r["vec_id"]] != labels[r["neighbor_id"]]:
            by_vec.setdefault(r["vec_id"], []).append(
                (r["neighbor_id"], r["cos"]))
    want = {(v, nb, c, i + 1)
            for v, lst in by_vec.items()
            for i, (nb, c) in enumerate(lst[:3])}
    assert {(r["vec_id"], r["neighbor_id"], r["cos"], r["rank"])
            for r in got} == want
    # rank-then-filter would differ somewhere on this corpus (non-vacuous)
    naive = {(r["vec_id"], r["neighbor_id"], r["cos"])
             for r in knn_join(emb, k=3).collect()
             if labels[r["vec_id"]] != labels[r["neighbor_id"]]}
    assert naive != {(v, nb, c) for v, nb, c, _ in want}


def test_hard_negatives_bucketed_subset(spark):
    """The SRP-candidates scale path mines only genuine negatives whose
    cosines match the exact path (recall<1, never wrong)."""
    from polaris_spark.ops.similarity import (hard_negatives,
                                              srp_candidate_pairs)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where("vec_id < 120")
    labels = {r["vec_id"]: r["label"]
              for r in emb.select("vec_id", "label").collect()}
    exact = {(r["vec_id"], r["neighbor_id"]): r["cos"]
             for r in hard_negatives(emb, k=119).collect()}
    cand = srp_candidate_pairs(emb, n_bits=8, seed=3)
    got = hard_negatives(emb, k=3, candidates=cand).collect()
    assert got
    for r in got:
        assert labels[r["vec_id"]] != labels[r["neighbor_id"]]
        assert exact[(r["vec_id"], r["neighbor_id"])] == r["cos"]


def test_knn_join_candidate_dedup_and_self_pair_semantics(spark):
    """knn_join's candidates path (round 5: norms once per vector,
    orient-to-(min,max)-then-distinct-then-symmetrize) must rank a
    duplicated / already-symmetrized / reversed candidate pair exactly
    once per direction — identical output however the caller spells the
    same pair set."""
    from polaris_spark.ops.similarity import knn_join, srp_candidate_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where("vec_id < 80")
    cand = srp_candidate_pairs(emb, n_bits=4, seed=3, n_tables=4)
    want = sorted(map(tuple, knn_join(emb, k=3, candidates=cand).collect()))
    from pyspark.sql import functions as F

    # same pair set spelled redundantly: both orientations + a dup union
    messy = (cand.select(F.col("vec_b").alias("vec_a"),
                         F.col("vec_a").alias("vec_b"))
             .union(cand).union(cand))
    got = sorted(map(tuple, knn_join(emb, k=3, candidates=messy).collect()))
    assert got == want


def test_knn_srp_multitable_recall_dial(spark):
    """Multi-table SRP is the recall dial: recall@3 vs exact kNN rises
    with table count L (deterministic seeds — values pinned just under
    the measured 0.141 / 0.696 / 0.907 on this corpus)."""
    from polaris_spark.ops.similarity import knn_join, srp_candidate_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {(r["vec_id"], r["neighbor_id"])
             for r in knn_join(emb, k=3).collect()}

    def recall(n_bits, n_tables):
        cand = srp_candidate_pairs(emb, n_bits=n_bits, seed=42,
                                   n_tables=n_tables)
        got = {(r["vec_id"], r["neighbor_id"])
               for r in knn_join(emb, k=3, candidates=cand).collect()}
        return len(got & exact) / len(exact)

    r1, r8, r16 = recall(4, 1), recall(4, 8), recall(4, 16)
    assert r1 < r8 < r16
    assert r8 >= 0.6 and r16 >= 0.85


def test_ivf_many_matches_single_query_probes(spark, tmp_path):
    """ivf_topk_many must be bit-identical per query to Q separate
    ivf_topk calls at the same nprobe — batching changes the job count,
    never the results (including the pruned nprobe < n_centroids path)."""
    from polaris_spark.ops.similarity import build_ivf, ivf_topk, ivf_topk_many

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = str(tmp_path / "ivf")
    build_ivf(spark, emb, d, n_centroids=4, seed=7)
    qs = [[float(x) for x in r["embedding"]]
          for r in emb.where("vec_id IN (3, 4)").orderBy("vec_id").collect()]
    for nprobe in (1, 4):
        many = {}
        for r in ivf_topk_many(spark, d, qs, k=5, nprobe=nprobe).collect():
            many.setdefault(r["qid"], []).append(
                (r["rank"], r["vec_id"], r["sim"]))
        for qid, q in enumerate(qs):
            single = [(i + 1, r["vec_id"], r["sim"]) for i, r in
                      enumerate(ivf_topk(spark, d, q, k=5, nprobe=nprobe).collect())]
            assert sorted(many[qid]) == single


def test_cli_neighbors(spark, tmp_path):
    """`neighbors` subcommand: exact mode equals the library op; SRP mode
    rows are a subset with identical cosines."""
    import json

    from polaris_spark.cli import main
    from polaris_spark.ops.similarity import knn_join

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where("vec_id < 80")
    inp = str(tmp_path / "emb.parquet")
    out_e = str(tmp_path / "nn_exact.parquet")
    out_s = str(tmp_path / "nn_srp.parquet")
    emb.write.parquet(inp)
    assert main(["neighbors", "--input", inp, "--output", out_e,
                 "-k", "2"]) in (0, None)
    got = sorted(map(tuple, spark.read.parquet(out_e).collect()))
    want = sorted(map(tuple, knn_join(emb, k=2).collect()))
    assert got == want
    assert main(["neighbors", "--input", inp, "--output", out_s, "-k", "2",
                 "--srp-bits", "4", "--srp-tables", "8"]) in (0, None)
    exact_cos = {(r["vec_id"], r["neighbor_id"]): r["cos"]
                 for r in knn_join(emb, k=79).collect()}
    for r in spark.read.parquet(out_s).collect():
        assert exact_cos[(r["vec_id"], r["neighbor_id"])] == r["cos"]


def test_quality_percentile_per_group_semantics(spark):
    """Per-group percentile: the kept set within each source is exactly
    the quality-descending prefix at pct_rank <= keep_frac, and no group
    loses all rows (its rank-0 best is always kept)."""
    from polaris_spark.ops.text import quality_percentile_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = quality_percentile_filter(docs, keep_frac=0.3).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert set(by_grp) == {r["source"] for r in docs.select("source").distinct().collect()}
    for grp, rows in by_grp.items():
        rows.sort(key=lambda r: (-r["quality"], r["doc_id"]))
        kept_flags = [r["kept"] for r in rows]
        # kept is a PREFIX of the quality-desc ordering (no holes)
        assert kept_flags == sorted(kept_flags, reverse=True)
        assert kept_flags[0] == 1  # the group's best is always kept
        frac = sum(kept_flags) / len(rows)
        assert frac <= 0.3 + 1.0 / len(rows)  # ceil slack of one row


def test_quantize_embeddings_semantics(spark):
    """int8 symmetric quantization: |q| <= 127, dequant error <= scale/2,
    zero vector -> zeros with scale 0, and round-half-up at the boundary."""
    from polaris_spark.ops.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25]), (1, [0.0, 0.0]), (2, [-2.0, 2.0])],
        "vec_id long, embedding array<float>")
    rows = quantize_embeddings(emb, bits=8).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], {})[r["dim"]] = (r["q"], r["scale"])
    # vec 0: mx=1.0, scale=1/127; q = round(v*127) half-up
    assert [by_vec[0][d][0] for d in range(3)] == [127, -63, 32]
    # zero vector: all-zero q, scale 0 (no div-by-zero NaN/Inf)
    assert [by_vec[1][d] for d in range(2)] == [(0, 0.0), (0, 0.0)]
    # symmetric extremes hit +/-qmax exactly... -2/scale+0.5 floors to -127
    assert [by_vec[2][d][0] for d in range(2)] == [-127, 127]
    # dequant error bound over the real embeddings table
    emb2 = spark.read.parquet(f"{SF}/embeddings.parquet")
    from pyspark.sql import functions as F
    q = quantize_embeddings(emb2, bits=8)
    orig = emb2.select("vec_id", F.posexplode(
        F.transform("embedding", lambda x: x.cast("double"))).alias("dim", "x"))
    j = q.join(orig, ["vec_id", "dim"])
    bad = j.where(
        (F.abs(F.col("q") * F.col("scale") - F.col("x")) > F.col("scale") / 2 + 1e-12)
        | (F.abs("q") > 127)).count()
    assert bad == 0


def test_kmeans_refine_matches_numpy_and_improves(spark):
    """One distributed Lloyd's iteration == the same iteration in numpy
    (assign by cosine argmax w/ lowest-id ties, mean, renormalize); the
    spherical k-means objective (mean best-centroid cosine) never
    degrades over refinement; an empty cluster keeps its old centroid."""
    import numpy as np

    from polaris_spark.ops.similarity import kmeans_refine

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    x = np.array([list(r["embedding"]) for r in
                  emb.orderBy("vec_id").collect()], dtype=np.float64)
    init = [row.tolist() for row in x[:3]]

    def np_iter(c):
        cn = np.array(c)
        sims = (x @ cn.T) / (
            np.linalg.norm(x, axis=1, keepdims=True)
            * np.linalg.norm(cn, axis=1))
        a = np.argmax(sims, axis=1)  # argmax takes the FIRST (lowest cid)
        out = []
        for j in range(len(c)):
            m = x[a == j]
            if len(m):
                v = m.mean(axis=0)
                out.append((v / max(np.linalg.norm(v), 1e-12)).tolist())
            else:
                out.append(c[j])
        return out, sims.max(axis=1).mean()

    got1 = kmeans_refine(emb, init, n_iter=1)
    want1, obj0 = np_iter(init)
    assert np.allclose(got1, want1, atol=1e-9)
    got2 = kmeans_refine(emb, init, n_iter=2)
    want2, obj1 = np_iter(want1)
    assert np.allclose(got2, want2, atol=1e-9)
    assert obj1 >= obj0 - 1e-12  # Lloyd's monotonicity
    # empty cluster: a centroid orthogonal-ish to everything with a rival
    # identical to a data point keeps itself only if nothing assigns to it
    far = [0.0] * (x.shape[1] - 1) + [-1.0]
    c = kmeans_refine(emb, [x[0].tolist(), far], n_iter=1)
    if not np.allclose(c[1], far):  # something assigned to it — fine
        pass
    else:
        assert c[1] == far  # preserved verbatim, not renormalized garbage


def test_ivf_refined_centroids_keep_full_probe_identity(spark, tmp_path):
    """build_ivf(refine_iters=1): centroids CHANGE (full-data Lloyd's
    moved them off the sampled init) but nprobe=all results stay exactly
    brute force — centroid quality is recall-only, never correctness."""
    from polaris_spark.ops.similarity import (
        build_ivf,
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    d = str(tmp_path / "ivf_r")
    refined = build_ivf(spark, emb, d, n_centroids=4, seed=7,
                        refine_iters=1)
    assert refined != base  # the refinement actually moved them
    q = [float(x) for x in
         emb.where("vec_id = 0").collect()[0]["embedding"]]
    brute = [(r["vec_id"], r["sim"]) for r in
             cosine_topk(emb, q, k=10).collect()]
    full = [(r["vec_id"], r["sim"]) for r in
            ivf_topk(spark, d, q, k=10, nprobe=4).collect()]
    assert brute == full


def test_ivf_append_equals_union_build(spark, tmp_path):
    """append_ivf: build on half the vectors, append the other half —
    every probe (full and pruned) returns exactly what one build over the
    union returns with the SAME centroids (fixed-centroid contract)."""
    from polaris_spark.ops.similarity import (
        append_ivf,
        build_ivf,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    half_a, half_b = emb.where("vec_id % 2 = 0"), emb.where("vec_id % 2 = 1")
    d_inc = str(tmp_path / "ivf_inc")
    build_ivf(spark, half_a, d_inc, centroids=cents)
    append_ivf(spark, half_b, d_inc)
    d_all = str(tmp_path / "ivf_all")
    build_ivf(spark, emb, d_all, centroids=cents)
    q = [float(x) for x in
         emb.where("vec_id = 3").collect()[0]["embedding"]]
    for nprobe in (4, 1):
        inc = [(r["vec_id"], r["sim"]) for r in
               ivf_topk(spark, d_inc, q, k=10, nprobe=nprobe).collect()]
        full = [(r["vec_id"], r["sim"]) for r in
                ivf_topk(spark, d_all, q, k=10, nprobe=nprobe).collect()]
        assert inc == full


def test_ivf_sq_probe_rescore(spark, tmp_path):
    """SQ-IVF with exact rescore: window=None + nprobe=all is EXACTLY
    brute force (rescoring everything removes the quantization error);
    a finite window returns exactly-scored rows whose approximate
    ordering was close (quantization error bound scale/2 per dim)."""
    from polaris_spark.ops.similarity import (
        build_ivf,
        build_ivf_quantized,
        cosine_topk,
        ivf_topk_sq,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    d = str(tmp_path / "ivf_sq")
    build_ivf(spark, emb, d, centroids=cents)
    build_ivf_quantized(spark, emb, d)
    q = [float(x) for x in
         emb.where("vec_id = 0").collect()[0]["embedding"]]
    brute = [(r["vec_id"], r["sim"]) for r in
             cosine_topk(emb, q, k=10).collect()]
    exact_all = [(r["vec_id"], r["sim"]) for r in
                 ivf_topk_sq(spark, d, q, k=10, nprobe=4,
                             window=None).collect()]
    assert exact_all == brute
    # finite window: every returned sim is the EXACT cosine (it came from
    # the rescore), rows ordered (sim desc, vec_id asc), high overlap
    win = [(r["vec_id"], r["sim"]) for r in
           ivf_topk_sq(spark, d, q, k=10, nprobe=4, window=32).collect()]
    assert win == sorted(win, key=lambda t: (-t[1], t[0]))
    exact_map = dict(brute)
    for vid, s in win:
        if vid in exact_map:
            assert s == exact_map[vid]
    assert len(set(dict(win)) & set(exact_map)) >= 8  # recall@10 >= 0.8


def test_maxsim_late_interaction(spark):
    """ColBERT MaxSim: score(doc) = sum over query tokens of the max
    per-doc-token cosine — checked against a full numpy replay on the
    real embeddings table grouped into 20 'docs' of 25 token vectors,
    plus the self-retrieval property (a query made of a doc's own
    vectors ranks that doc first with score = |q|)."""
    import numpy as np
    from pyspark.sql import functions as F

    from polaris_spark.ops.similarity import maxsim_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    X = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    docs_of = np.asarray([r["vec_id"] // 25 for r in rows])
    qs = [list(map(float, X[i])) for i in (0, 1, 2)]
    Qn = Xn[[0, 1, 2]]
    sims = Xn @ Qn.T  # (n_vec, 3)
    want = {}
    for d in np.unique(docs_of):
        want[int(d)] = round(float(sims[docs_of == d].max(axis=0).sum()), 6)
    top = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:7]
    got = [(r["doc"], r["maxsim"]) for r in maxsim_topk(
        emb.withColumn("doc_id", F.floor(F.col("vec_id") / 25)
                       .cast("long")),
        qs, k=7).collect()]
    assert [(d, pytest.approx(s, abs=2e-6)) for d, s in top] == got
    # self-retrieval: query vectors 0,1,2 all live in doc 0 (vec_id//25),
    # so doc 0's score is exactly 3.0 and it ranks first
    assert got[0][0] == 0 and got[0][1] == pytest.approx(3.0, abs=1e-6)
    with pytest.raises(ValueError, match="at least one"):
        maxsim_topk(emb, [], k=5)


def test_semantic_decontaminate(spark, con):
    """Max-cosine-vs-bench flags: numpy replay over the real embeddings,
    self-containment (bench members flag at cos 1.0), empty-bench guard,
    and the DuckDB mirror (the gate shape) agrees row-for-row."""
    import numpy as np

    from polaris_spark.ops.similarity import (
        duckdb_semantic_decontam_sql,
        semantic_decontaminate,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = semantic_decontaminate(
        emb, emb.where("vec_id % 40 = 7"), threshold=0.95)
    got = {r["vec_id"]: (r["bench_cos"], r["contaminated"])
           for r in out.collect()}
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    X = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    bench_ids = [r["vec_id"] for r in rows if r["vec_id"] % 40 == 7]
    B = Xn[[i for i, r in enumerate(rows) if r["vec_id"] % 40 == 7]]
    mc = (Xn @ B.T).max(axis=1)
    for i, r in enumerate(rows):
        want = round(float(mc[i]), 6)
        assert got[r["vec_id"]][0] == pytest.approx(want, abs=2e-6)
    for b in bench_ids:  # a bench member matches itself at cos 1.0
        assert got[b] == (1.0, 1)
    n_flagged = sum(c for _s, c in got.values())
    assert n_flagged >= len(bench_ids)  # at least the bench itself
    _cmp(out, con.execute(duckdb_semantic_decontam_sql(
        "embeddings", "vec_id", "embedding",
        bench_pred="vec_id % 40 = 7", threshold=0.95)).fetchall())
    with pytest.raises(ValueError, match="bench set is empty"):
        semantic_decontaminate(emb, emb.where("vec_id < 0"))


import pytest as _pytest


@_pytest.mark.parametrize("n_bits,n_tables", [(4, 8), (1, 1), (16, 1), (1, 6)])
def test_srp_signatures_udf_matches_expression_form(spark, n_bits, n_tables):
    """The Arrow-batched SRP signature UDF (the hot path) must emit
    buckets BIT-identical to the pure-expression spec form
    (srp_signature_col) — the UDF replicates _dot's strict left-fold
    accumulation order, so even knife-edge signs agree. Guards the
    driver-side plan-build optimization (2048 py4j literal nodes → one
    closure matrix) against silent drift."""
    import numpy as np
    from pyspark.sql import functions as F

    from polaris_spark.ops.similarity import (srp_signature_col,
                                              srp_signatures_udf)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where("vec_id < 200")
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(42)
    cols = [
        srp_signature_col(F.col("embedding"),
                          rng.standard_normal((n_bits, dim)))
        for _ in range(n_tables)
    ]
    old = {r["vec_id"]: list(r["sigs"]) for r in
           emb.select("vec_id", F.array(*cols).alias("sigs")).collect()}
    # one (T*B, dim) draw == T sequential (B, dim) draws (row-major fill)
    udf = srp_signatures_udf(
        np.random.default_rng(42).standard_normal((n_tables * n_bits, dim)),
        n_tables, n_bits)
    new = {r["vec_id"]: list(r["sigs"]) for r in
           emb.select("vec_id", udf(F.col("embedding")).alias("sigs"))
           .collect()}
    assert old == new
