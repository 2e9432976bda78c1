"""Tests for in-engine model fitting/selection: logistic-regression
training (curation.train_logreg — q188) and the one-pass decision
threshold sweep (evaluation.best_threshold — q189)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import curation, evaluation


# ------------------------------------------------------------ logreg

def test_train_logreg_separable_improves_and_is_deterministic(spark):
    # perfectly separable in centered x: positives at x > 0
    rows = [(i % 2, (0.1 if i % 2 else -0.1) + (i % 7) * 0.01) for i in
            range(400)]
    df = spark.createDataFrame(rows, "label int, x double")
    a = curation.train_logreg(df, ["x"], "label", lr=2.0, iters=5).collect()[
        0
    ]
    b = curation.train_logreg(df, ["x"], "label", lr=2.0, iters=5).collect()[
        0
    ]
    assert a == b  # exact-decimal gradients: bit-stable reruns
    assert a["n_rows"] == 400
    assert a["w1"] > 0  # positive slope toward the positive class
    assert a["train_accuracy"] >= 0.9


def test_train_logreg_matches_manual_gradient_steps(spark):
    rows = [(1, 1.0), (0, -1.0), (1, 0.5), (0, -0.5)]
    df = spark.createDataFrame(rows, "label int, x double")
    out = curation.train_logreg(df, ["x"], "label", lr=1.0, iters=2).collect()[
        0
    ]
    # replay the same updates in python (same rounding discipline)
    w = [0.0, 0.0]
    for _ in range(2):
        g = [0.0, 0.0]
        for yl, x in rows:
            z = w[0] * 1.0 + w[1] * x
            r = round(yl - 1.0 / (1.0 + math.exp(-z)), 6)
            g[0] += round(1.0 * r, 12)
            g[1] += round(x * r, 12)
        w = [w[j] + 1.0 * (g[j] / 4.0) for j in range(2)]
    assert abs(out["w0"] - w[0]) < 1e-9
    assert abs(out["w1"] - w[1]) < 1e-9


def test_train_logreg_balanced_data_keeps_zero_weights(spark):
    # symmetric labels at the same x -> every gradient is exactly 0
    rows = [(1, 1.0), (0, 1.0)] * 10
    df = spark.createDataFrame(rows, "label int, x double")
    out = curation.train_logreg(df, ["x"], "label", iters=3).collect()[0]
    assert out["w0"] == 0.0 and out["w1"] == 0.0
    assert out["train_accuracy"] == 0.5  # z==0 -> predict 1 for all


# ---------------------------------------------------- best threshold

def test_best_threshold_separable(spark):
    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = evaluation.best_threshold(df, "s", "y").collect()[0]
    assert out["threshold"] == 5.0
    assert (out["tp"], out["fp"], out["tn"], out["fn"]) == (5, 0, 5, 0)
    assert out["accuracy"] == 1.0 and out["f1"] == 1.0


def test_best_threshold_hand_computed_with_noise(spark):
    # scores: pos at 3, 1; neg at 2 -> t=3: acc 2/3; t=1: acc 2/3
    # (2 tp, 1 fp); tie broken by higher TP -> t=1
    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 0), (1.0, 1)], "s double, y int"
    )
    out = evaluation.best_threshold(df, "s", "y").collect()[0]
    assert out["threshold"] == 1.0
    assert (out["tp"], out["fp"]) == (2, 1)
    assert abs(out["accuracy"] - 2 / 3) < 1e-12
    assert abs(out["f1"] - 4 / 5) < 1e-12


def test_best_threshold_no_global_sort_in_plan(spark):
    # The 100 TB shape (forced two-level scan — at test scale the r12
    # small-input resolver legitimately picks the single-window form;
    # its bit-equality is pinned in test_evaluation_ops).
    df = spark.range(10000).select(
        (F.col("id") % 997).cast("double").alias("s"),
        (F.col("id") % 2).alias("y"),
    )
    spark.conf.set("spark.graft.distCumWindowMaxRows", "0")
    try:
        plan = evaluation.best_threshold(df, "s", "y")._jdf.queryExecution() \
            .executedPlan().toString()
    finally:
        spark.conf.unset("spark.graft.distCumWindowMaxRows")
    # rank machinery must be range-partitioned, never a single global sort
    assert "rangepartitioning" in plan.lower()
