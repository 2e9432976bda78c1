"""Tests for the moment-matrix operators (stats.covariance_matrix,
stats.multi_ols — q179-q180) and categorical target encodings
(operators/encoding.py — q181-q182)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import encoding, stats


# ------------------------------------------------------- covariance

def test_covariance_matrix_hand_computed(spark):
    xs = [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 7.0)]
    df = spark.createDataFrame(xs, "a double, b double")
    out = {
        (r["col_x"], r["col_y"]): r
        for r in stats.covariance_matrix(df, ["a", "b"]).collect()
    }
    assert set(out) == {("a", "a"), ("a", "b"), ("b", "b")}
    ma = sum(x for x, _ in xs) / 4
    mb = sum(y for _, y in xs) / 4
    cov_ab = sum((x - ma) * (y - mb) for x, y in xs) / 3
    var_a = sum((x - ma) ** 2 for x, _ in xs) / 3
    var_b = sum((y - mb) ** 2 for _, y in xs) / 3
    assert abs(out[("a", "b")]["cov"] - cov_ab) < 1e-9
    assert abs(out[("a", "a")]["cov"] - var_a) < 1e-9
    corr = cov_ab / math.sqrt(var_a * var_b)
    assert abs(out[("a", "b")]["corr"] - corr) < 1e-9
    assert abs(out[("a", "a")]["corr"] - 1.0) < 1e-12
    assert out[("a", "b")]["n_rows"] == 4


def test_covariance_matrix_drops_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (3.0, 3.0)], "a double, b double"
    )
    out = stats.covariance_matrix(df, ["a", "b"]).collect()
    assert all(r["n_rows"] == 2 for r in out)


# -------------------------------------------------------------- OLS

def test_multi_ols_exact_fit(spark):
    # y = 2 + 3*x1 - 1*x2 exactly -> coefficients recovered, r2 == 1
    rows = [
        (float(2 + 3 * x1 - x2), float(x1), float(x2))
        for x1 in range(5)
        for x2 in range(4)
    ]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = stats.multi_ols(df, "y", ["x1", "x2"]).collect()[0]
    assert abs(out["b0"] - 2) < 1e-9
    assert abs(out["b1"] - 3) < 1e-9
    assert abs(out["b2"] + 1) < 1e-9
    assert abs(out["r2"] - 1.0) < 1e-9


def test_multi_ols_matches_numpy_tier(spark):
    import numpy as np

    rows = [
        (float(1 + 2 * x1 + 0.5 * x2 + (x1 * x2) % 3), float(x1), float(x2))
        for x1 in range(6)
        for x2 in range(5)
    ]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    cramer = stats.multi_ols(df, "y", ["x1", "x2"]).collect()[0]
    y = np.array([r[0] for r in rows])
    X = np.column_stack(
        [np.ones(len(rows)), [r[1] for r in rows], [r[2] for r in rows]]
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    for got, want in zip((cramer["b0"], cramer["b1"], cramer["b2"]), beta):
        assert abs(got - want) < 1e-9


def test_multi_ols_numpy_tier_three_features(spark):
    rows = [
        (
            float(1 + x1 - 2 * x2 + 3 * x3),
            float(x1),
            float(x2),
            float(x3),
        )
        for x1 in range(3)
        for x2 in range(3)
        for x3 in range(3)
    ]
    df = spark.createDataFrame(
        rows, "y double, x1 double, x2 double, x3 double"
    )
    out = stats.multi_ols(df, "y", ["x1", "x2", "x3"]).collect()[0]
    assert abs(out["b0"] - 1) < 1e-9
    assert abs(out["b1"] - 1) < 1e-9
    assert abs(out["b2"] + 2) < 1e-9
    assert abs(out["b3"] - 3) < 1e-9
    assert abs(out["r2"] - 1.0) < 1e-9


# --------------------------------------------------- target encoding

def test_target_encode_shrinks_to_global_mean(spark):
    rows = [("a", 10.0)] * 8 + [("b", 20.0)] * 2
    df = spark.createDataFrame(rows, "c string, y double")
    out = {
        r["category"]: r["target_enc"]
        for r in encoding.target_encode(df, "c", "y", m=10.0).collect()
    }
    gm = (8 * 10 + 2 * 20) / 10  # 12
    assert abs(out["a"] - (80 + 10 * gm) / 18) < 1e-9
    assert abs(out["b"] - (40 + 10 * gm) / 12) < 1e-9
    # the rare category sits closer to the global mean
    assert abs(out["b"] - gm) < abs(20.0 - gm)


def test_kfold_target_encode_excludes_own_fold(spark):
    # category 'a' in folds 0 and 1 with different targets: fold 0's
    # encoding must use ONLY fold 1's rows (plus smoothing)
    rows = [("a", 10.0, 0)] * 4 + [("a", 30.0, 1)] * 4 + [("b", 50.0, 0)] * 4
    df = spark.createDataFrame(rows, "c string, y double, f int")
    out = {
        (r["category"], r["fold"]): r["target_enc"]
        for r in encoding.kfold_target_encode(
            df, "c", "y", "f", m=0.0
        ).collect()
    }
    # m=0: enc(a, fold 0) = mean of a's rows outside fold 0 = 30
    assert abs(out[("a", 0)] - 30.0) < 1e-9
    assert abs(out[("a", 1)] - 10.0) < 1e-9
    # b only exists in fold 0 -> out-of-fold n is 0 and m=0 -> NULL/NaN
    enc_b = out[("b", 0)]
    assert enc_b is None or math.isnan(enc_b)


def test_kfold_target_encode_smoothed_matches_hand_calc(spark):
    rows = [("a", 10.0, 0)] * 4 + [("a", 30.0, 1)] * 4 + [("b", 50.0, 1)] * 2
    df = spark.createDataFrame(rows, "c string, y double, f int")
    m = 2.0
    out = {
        (r["category"], r["fold"]): r["target_enc"]
        for r in encoding.kfold_target_encode(df, "c", "y", "f", m=m).collect()
    }
    # enc(a,0): out-of-fold a rows = 4x30 (S=120,n=4); gm_0 = mean of all
    # rows outside fold 0 = (120+100)/6
    gm0 = (4 * 30 + 2 * 50) / 6
    assert abs(out[("a", 0)] - (120 + m * gm0) / (4 + m)) < 1e-9
    # enc(a,1): out-of-fold a rows = 4x10; gm_1 = fold-0 mean = 10
    assert abs(out[("a", 1)] - (40 + m * 10.0) / (4 + m)) < 1e-9
