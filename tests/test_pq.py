"""IVF-PQ: product-quantization sidecar + ADC probe with exact rescore
(FAISS IndexIVFPQ-with-refine analog; Jégou et al. 2011). The identity
contract mirrors the SQ sidecar's: window=None + nprobe=all rescores every
probed row, so the result is EXACTLY brute force."""

import json

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def pq_index(spark, emb, tmp_path_factory):
    from polaris_spark.ops.similarity import (
        build_ivf,
        build_ivf_pq,
        kmeans_centroids,
    )

    d = str(tmp_path_factory.mktemp("ivf") / "pq_idx")
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    build_ivf(spark, emb, d, centroids=cents)
    build_ivf_pq(spark, d, m=8, nbits=4, seed=7)
    return d


def _q(emb, vid=0):
    return [float(x) for x in
            emb.where(f"vec_id = {vid}").collect()[0]["embedding"]]


def test_pq_train_deterministic_and_shaped(emb):
    from polaris_spark.ops.similarity import train_pq

    b1 = train_pq(emb, m=8, nbits=4, seed=7, sample_n=200)
    b2 = train_pq(emb, m=8, nbits=4, seed=7, sample_n=200)
    assert b1 == b2  # fully seeded -> bit-reproducible
    assert len(b1) == 8 and len(b1[0]) == 16 and len(b1[0][0]) == 8
    b3 = train_pq(emb, m=8, nbits=4, seed=8, sample_n=200)
    assert b3 != b1  # the seed actually reaches the init


def test_pq_dim_guard(emb):
    from polaris_spark.ops.similarity import train_pq

    with pytest.raises(ValueError, match="not divisible"):
        train_pq(emb, m=7, nbits=4, seed=7, sample_n=200)


def test_pq_codes_match_numpy(spark, emb, pq_index):
    """The Arrow encoder's codes equal a per-row numpy argmin replay."""
    import numpy as np

    meta = json.loads(open(f"{pq_index}/_pq.json").read())
    cb = [np.asarray(b) for b in meta["codebooks"]]
    m, sub = len(cb), len(cb[0][0])
    rows = (spark.read.parquet(f"{pq_index}/vectors_pq")
            .orderBy("vec_id").limit(50).collect())
    vecs = {r["vec_id"]: np.asarray(list(r["embedding"]), dtype=np.float64)
            for r in emb.where("vec_id < 50").collect()}
    for r in rows:
        x = vecs[r["vec_id"]]
        want = [int(np.argmin(((x[s * sub:(s + 1) * sub] - cb[s]) ** 2)
                              .sum(axis=1)))
                for s in range(m)]
        assert list(r["codes"]) == want


def test_pq_identity_window_none_nprobe_all(spark, emb, pq_index):
    from polaris_spark.ops.similarity import cosine_topk, ivf_topk_pq

    q = _q(emb, 0)
    brute = [(r["vec_id"], r["sim"]) for r in
             cosine_topk(emb, q, k=10).collect()]
    got = [(r["vec_id"], r["sim"]) for r in
           ivf_topk_pq(spark, pq_index, q, k=10, nprobe=4,
                       window=None).collect()]
    assert got == brute


def test_pq_finite_window_exact_scores_and_recall(spark, emb, pq_index):
    """Finite window: every returned sim is the EXACT cosine (it came
    from the rescore), ordering is (sim desc, vec_id asc), and a
    64-wide window over 500 random vectors keeps recall@10 high."""
    from polaris_spark.ops.similarity import cosine_topk, ivf_topk_pq

    q = _q(emb, 3)
    brute = dict((r["vec_id"], r["sim"])
                 for r in cosine_topk(emb, q, k=10).collect())
    win = [(r["vec_id"], r["sim"]) for r in
           ivf_topk_pq(spark, pq_index, q, k=10, nprobe=4,
                       window=64).collect()]
    assert win == sorted(win, key=lambda t: (-t[1], t[0]))
    for vid, s in win:
        if vid in brute:
            assert s == brute[vid]
    assert len(set(dict(win)) & set(brute)) >= 6  # recall@10 >= 0.6


def test_pq_sidecar_is_small(spark, pq_index):
    """The codes sidecar stores m smallints per vector — schema-level
    proof of the 16-32x scan cut the probe docstring claims."""
    df = spark.read.parquet(f"{pq_index}/vectors_pq")
    assert [f.name for f in df.schema if f.name != "centroid_id"] == \
        ["vec_id", "codes"]
    el = dict(df.dtypes)["codes"]
    assert el == "array<smallint>"
    n = df.count()
    assert n == 500 and df.where("size(codes) = 8").count() == n


def test_append_keeps_quantized_sidecars_complete(spark, emb, tmp_path):
    """append_ivf after SQ/PQ sidecar builds must extend the sidecars
    too — a stale sidecar would make quantized probes silently miss
    appended vectors (the rescore only sees ids the approx scan
    surfaced). Probes at nprobe=all + window=None must equal brute
    force over the UNION after the append."""
    from polaris_spark.ops.similarity import (
        append_ivf,
        build_ivf,
        build_ivf_pq,
        build_ivf_quantized,
        cosine_topk,
        ivf_topk_pq,
        ivf_topk_sq,
        kmeans_centroids,
    )

    half_a = emb.where("vec_id < 250")
    half_b = emb.where("vec_id >= 250")
    d = str(tmp_path / "ivf_app")
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    build_ivf(spark, half_a, d, centroids=cents)
    build_ivf_quantized(spark, half_a, d, bits=8)
    build_ivf_pq(spark, d, m=8, nbits=4, seed=7)
    append_ivf(spark, half_b, d)

    n = spark.read.parquet(f"{d}/vectors").count()
    assert n == 500
    assert spark.read.parquet(f"{d}/vectors_q").count() == n
    assert spark.read.parquet(f"{d}/vectors_pq").count() == n

    q = _q(emb, 7)
    brute = [(r["vec_id"], r["sim"]) for r in
             cosine_topk(emb, q, k=10).collect()]
    sq = [(r["vec_id"], r["sim"]) for r in
          ivf_topk_sq(spark, d, q, k=10, nprobe=4, window=None).collect()]
    pq = [(r["vec_id"], r["sim"]) for r in
          ivf_topk_pq(spark, d, q, k=10, nprobe=4, window=None).collect()]
    assert sq == brute
    assert pq == brute
    # the appended half is actually reachable through the approx scans
    assert any(v >= 250 for v, _ in brute), "query must hit half B"


def test_adc_udf_path_parity(spark, emb, pq_index, monkeypatch):
    """The large-codebook ADC path (LUTs in the Arrow UDF closure
    instead of literal arrays — ADVICE r3 codegen-limit fix) returns
    byte-identical probe results to the codegen fold."""
    import polaris_spark.ops.similarity as sim

    q = _q(emb, 3)
    lut = [(r["vec_id"], r["sim"]) for r in
           sim.ivf_topk_pq(spark, pq_index, q, k=10, nprobe=4,
                           window=16).collect()]
    monkeypatch.setattr(sim, "_ADC_LUT_MAX", 0)  # force the UDF path
    udf = [(r["vec_id"], r["sim"]) for r in
           sim.ivf_topk_pq(spark, pq_index, q, k=10, nprobe=4,
                           window=16).collect()]
    assert udf == lut


def test_append_pending_marker_blocks_probes(spark, emb, tmp_path):
    """Crash between float and sidecar appends (simulated via the intent
    marker): quantized probes refuse to serve, rebuild_sidecars re-derives
    the sidecars from the float table and clears the marker, after which
    probes serve the complete union again (ADVICE r3 atomicity)."""
    import json
    import os

    from polaris_spark.ops.similarity import (
        append_ivf,
        build_ivf,
        build_ivf_pq,
        build_ivf_quantized,
        cosine_topk,
        ivf_topk_pq,
        ivf_topk_sq,
        kmeans_centroids,
        rebuild_sidecars,
    )

    half_a = emb.where("vec_id < 250")
    half_b = emb.where("vec_id >= 250")
    d = str(tmp_path / "ivf_crash")
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    build_ivf(spark, half_a, d, centroids=cents)
    build_ivf_quantized(spark, half_a, d, bits=8)
    build_ivf_pq(spark, d, m=8, nbits=4, seed=7)
    append_ivf(spark, half_b, d)

    # simulate the crash: marker present (as if sidecar writes never ran)
    with open(os.path.join(d, "_append_pending.json"), "w") as f:
        json.dump({"phase": "appending"}, f)
    q = _q(emb, 7)
    with pytest.raises(RuntimeError, match="rebuild_sidecars"):
        ivf_topk_sq(spark, d, q, k=10, nprobe=4, window=None).collect()
    with pytest.raises(RuntimeError, match="rebuild_sidecars"):
        ivf_topk_pq(spark, d, q, k=10, nprobe=4, window=None).collect()
    # a second append must also refuse (re-running duplicates float rows)
    with pytest.raises(RuntimeError, match="rebuild_sidecars"):
        append_ivf(spark, half_b.limit(1), d)

    rebuild_sidecars(spark, d)
    assert not os.path.exists(os.path.join(d, "_append_pending.json"))
    brute = [(r["vec_id"], r["sim"]) for r in
             cosine_topk(emb, q, k=10).collect()]
    assert [(r["vec_id"], r["sim"]) for r in
            ivf_topk_sq(spark, d, q, k=10, nprobe=4,
                        window=None).collect()] == brute
    assert [(r["vec_id"], r["sim"]) for r in
            ivf_topk_pq(spark, d, q, k=10, nprobe=4,
                        window=None).collect()] == brute


def test_check_ivf_clean_and_violations(spark, emb, tmp_path):
    """check_ivf (vector-side CheckIndex): clean on a healthy SQ+PQ
    index; flags a pending marker, a count mismatch after a simulated
    partial append, and recovers to clean after rebuild_sidecars."""
    import json
    import os

    from polaris_spark.ops.similarity import (
        build_ivf,
        build_ivf_pq,
        build_ivf_quantized,
        check_ivf,
        kmeans_centroids,
        rebuild_sidecars,
    )

    half_a = emb.where("vec_id < 250")
    half_b = emb.where("vec_id >= 250")
    d = str(tmp_path / "ivf_chk")
    cents = kmeans_centroids(emb, n_centroids=4, seed=7, sample_n=200)
    build_ivf(spark, half_a, d, centroids=cents)
    build_ivf_quantized(spark, half_a, d, bits=8)
    build_ivf_pq(spark, d, m=8, nbits=4, seed=7)
    assert check_ivf(spark, d)["ok"]

    # simulated crash: float rows appended, sidecars NOT (bypass
    # append_ivf's own bracketing by writing directly)
    from polaris_spark.ops.similarity import assign_centroids

    (assign_centroids(half_b, cents).repartition("centroid_id")
     .write.mode("append").partitionBy("centroid_id")
     .parquet(os.path.join(d, "vectors")))
    with open(os.path.join(d, "_append_pending.json"), "w") as f:
        json.dump({"phase": "appending"}, f)

    rep = check_ivf(spark, d)
    assert not rep["ok"]
    kinds = {v["check"] for v in rep["violations"]}
    assert "append_pending" in kinds
    assert any(k.endswith("_count") for k in kinds)

    rebuild_sidecars(spark, d)
    assert check_ivf(spark, d)["ok"]


def test_check_ivf_empty_vectors_reports_not_crashes(spark, tmp_path):
    """ADVICE r4: an empty float table degrades to an `empty_vectors`
    violation, never a TypeError (checker parity with check_index)."""
    import os

    from polaris_spark.ops.similarity import check_ivf

    d = str(tmp_path / "ivf_empty")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, centroid_id int"
    ).write.parquet(os.path.join(d, "vectors"))
    rep = check_ivf(spark, d)
    assert not rep["ok"]
    assert any(v["check"] == "empty_vectors" for v in rep["violations"])
