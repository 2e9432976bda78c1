"""Round-5 additions: WoE/IV feature audit (encoding.woe_iv — q213),
exact-integer k-means (similarity.kmeans_lloyd_exact — q214), and
isotonic calibration's registry companions live in
test_evaluation_ops.py."""

from __future__ import annotations

import math

from occupation_wage_etl_spark.operators import encoding, similarity

# ---------------------------------------------------------------- WoE/IV


def test_woe_matches_hand_computation(spark):
    # cat A: 8 pos / 2 neg; cat B: 2 pos / 8 neg; P = N = 10
    rows = [("A", 1)] * 8 + [("A", 0)] * 2 + [("B", 1)] * 2 + [("B", 0)] * 8
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in encoding.woe_iv(df, "c", "y").collect()}
    woe_a = round(math.log((2 * 8 + 1) * 10 / ((2 * 2 + 1) * 10)), 6)
    assert out["A"]["woe"] == woe_a
    assert out["A"]["n_pos"] == 8 and out["A"]["n_neg"] == 2
    # symmetric layout: WoE(B) = -WoE(A)
    assert out["B"]["woe"] == -woe_a
    # separating categories carry positive IV contributions
    assert out["A"]["iv_term"] > 0 and out["B"]["iv_term"] > 0


def test_woe_uninformative_category_is_zero(spark):
    rows = [("A", 1)] * 5 + [("A", 0)] * 5 + [("B", 1)] * 3 + [("B", 0)] * 3
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in encoding.woe_iv(df, "c", "y").collect()}
    # pos/neg balanced globally and per category -> WoE = ln(1) = 0
    assert out["A"]["woe"] == 0.0 and out["B"]["woe"] == 0.0
    assert out["A"]["iv_term"] == 0.0


def test_woe_empty_cell_stays_finite(spark):
    rows = [("A", 1)] * 6 + [("B", 0)] * 6
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in encoding.woe_iv(df, "c", "y").collect()}
    assert math.isfinite(out["A"]["woe"]) and math.isfinite(out["B"]["woe"])
    assert out["A"]["woe"] > 0 > out["B"]["woe"]


# --------------------------------------------------------------- k-means


def _blob_rows(n_per=40, d=4):
    # three tight separated blobs on axis 0; ids interleave the blobs so
    # the k-smallest-ids seeding starts from mixed points
    rows = []
    centers = [0.0, 0.45, 0.9]
    for i in range(n_per * 3):
        c = centers[i % 3]
        vec = [c + 0.001 * ((i * 7919) % 11 - 5)] + [0.0] * (d - 1)
        rows.append((i, [float(v) for v in vec]))
    return rows


def test_kmeans_separates_clean_blobs(spark):
    df = spark.createDataFrame(
        _blob_rows(), "vec_id long, embedding array<float>"
    )
    out = similarity.kmeans_lloyd_exact(df, k=3, iters=4).collect()
    sizes = sorted(r["n_vecs"] for r in out)
    assert sizes == [40, 40, 40]
    # tight blobs: within-cluster inertia is tiny vs between-blob spread
    assert all(r["inertia"] < 40 * (0.01 * 10**4) ** 2 * 2 for r in out)


def test_kmeans_partitioning_invariant(spark):
    rows = _blob_rows(n_per=20)
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df7 = df1.repartition(7)
    a = sorted(map(tuple, similarity.kmeans_lloyd_exact(df1, k=3).collect()))
    b = sorted(map(tuple, similarity.kmeans_lloyd_exact(df7, k=3).collect()))
    assert a == b


def test_kmeans_single_cluster_centroid_is_floored_mean(spark):
    rows = [(i, [0.1 * i, 0.0]) for i in range(5)]  # k=1: all one cluster
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kmeans_lloyd_exact(df, k=1, iters=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_vecs"] == 5
    # dim0 quantized: floor(0.1*i*1e4) for float32 0.1*i; centroid is the
    # truncated integer mean of those five values
    import numpy as np

    xs = [math.floor(float(np.float32(0.1 * i)) * 10**4) for i in range(5)]
    mean = sum(xs)
    mean = -((-mean) // 5) if mean < 0 else mean // 5
    assert r["centroid_sum"] == mean  # dim1 contributes 0
