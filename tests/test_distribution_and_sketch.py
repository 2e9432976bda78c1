"""Tests for the round-4 distribution/evaluation additions: average
precision, confusion matrix, Cohen's kappa (operators/evaluation.py),
Gini / Chao1 / Zipf (operators/profile.py, text_analysis.py), and the
oracle-replayable HLL / Count-Min sketches (operators/sketch.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import (
    evaluation,
    profile,
    sketch,
    text_analysis,
)


# ------------------------------------------------------------------- AP

def test_average_precision_hand_computed(spark):
    # thresholds desc: s=3 -> tp=1 fp=0 term=(1/2)(1/1); s=2 -> tp=2
    # fp=1 dTP=1 term=(1/2)(2/3); s=1 -> dTP=0.  AP = 1/2 + 1/3 = 5/6
    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)], "s double, y int"
    )
    r = evaluation.average_precision(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert abs(r["ap"] - 5.0 / 6.0) < 2e-12  # fixed-point floor quantization


def test_average_precision_perfect_and_rare_positive(spark):
    n, p = 10_000, 10
    df = spark.range(n).select(
        F.col("id").cast("double").alias("s"),
        F.when(F.col("id") >= n - p, 1).otherwise(0).alias("y"),
    )
    r = evaluation.average_precision(df, "s", "y").collect()[0]
    assert abs(r["ap"] - 1.0) < 1e-9  # perfect ranking -> AP 1
    # reversed ranking of a rare positive: AP collapses (the property
    # that distinguishes it from AUC)
    rev = df.select((-F.col("s")).alias("s"), "y")
    r2 = evaluation.average_precision(rev, "s", "y").collect()[0]
    assert r2["ap"] < 0.01


def test_average_precision_no_positives_is_null(spark):
    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], "s double, y int")
    assert evaluation.average_precision(df, "s", "y").collect()[0]["ap"] is None


# ------------------------------------------------------------ confusion

def test_confusion_at_threshold_degenerate_nulls(spark):
    df = spark.createDataFrame([(1.0, 0), (0.0, 0)], "s double, y int")
    r = evaluation.confusion_at_threshold(df, "s", "y", 0.5).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 1, 0, 1)
    assert r["recall"] is None  # no positives
    assert r["accuracy"] == 0.5


# ---------------------------------------------------------------- kappa

def test_cohens_kappa_perfect_and_chance(spark):
    same = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("a", "a")], "ra string, rb string"
    )
    assert evaluation.cohens_kappa(same, "ra", "rb").collect()[0]["kappa"] == 1.0
    # statistically independent raters with matching marginals: the
    # 2x2 balanced case n=4, agree=2, e=8 -> kappa = (8-8)/(16-8) = 0
    indep = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")],
        "ra string, rb string",
    )
    assert evaluation.cohens_kappa(indep, "ra", "rb").collect()[0]["kappa"] == 0.0


# ----------------------------------------------------------------- gini

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gini_uniform_zero_and_hand_value(spark):
    # every type occurs exactly twice -> perfect equality -> gini 0
    uniform = _docs(spark, ["aa bb cc", "aa bb cc"])
    r = profile.gini_token_frequencies(uniform, "text").collect()[0]
    assert (r["n_types"], r["n_tokens"], r["gini"]) == (3, 6, 0.0)
    # frequencies [1, 3]: 2S = 1*1*(0+1+1) + 3*1*(2+1+1) = 2+12 = 14
    # gini = (14 - 3*4) / (2*4) = 2/8 = 0.25
    skewed = _docs(spark, ["xx yy yy yy"])
    r2 = profile.gini_token_frequencies(skewed, "text").collect()[0]
    assert (r2["n_types"], r2["n_tokens"], r2["gini"]) == (2, 4, 0.25)


def test_chao1_hand_value(spark):
    # freqs: a->1, b->1, c->2, d->3: D=4 f1=2 f2=1
    # chao1 = 4 + 2*1/(2*2) = 4.5
    docs = _docs(spark, ["a b c c d d d"])
    r = profile.chao1_vocab_richness(docs, "text").collect()[0]
    assert (r["n_types"], r["f1"], r["f2"], r["chao1"]) == (4, 2, 1, 4.5)


# ----------------------------------------------------------------- zipf

def test_zipf_fit_recovers_exact_power_law(spark):
    # corpus whose rank-frequency is exactly f = 720/r at ranks 1..6:
    # every (ln r, ln f) point lies ON the line y = ln 720 - 1*x
    freqs = {f"w{r}": 720 // r for r in range(1, 7)}
    text = " ".join(" ".join([w] * f) for w, f in freqs.items())
    docs = _docs(spark, [text])
    r = text_analysis.zipf_fit(docs, "text", top_k=100).collect()[0]
    assert r["n_ranks"] == 6
    assert abs(r["slope"] - (-1.0)) < 1e-9
    assert abs(r["intercept"] - math.log(720.0)) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-12


# ------------------------------------------------------------------ hll

def test_hll_small_range_correction_is_tight(spark):
    df = spark.range(40).select(F.col("id").cast("string").alias("v"))
    r = sketch.hll_distinct(df, F.col("v")).collect()[0]
    assert r["n_empty_registers"] > 0
    assert abs(r["estimate"] - 40) / 40 < 0.15


def test_hll_error_within_sketch_bounds(spark):
    n = 50_000
    df = spark.range(n).select(F.col("v").alias("v") if False else F.col("id").cast("string").alias("v"))
    r = sketch.hll_distinct(df, F.col("v")).collect()[0]
    # m=256 -> standard error ~6.5%; allow 4 sigma
    assert abs(r["estimate"] - n) / n < 0.26
    # duplicates must not move the registers at all
    dup = df.union(df)
    r2 = sketch.hll_distinct(dup, F.col("v")).collect()[0]
    assert r2["estimate"] == r["estimate"]


# ------------------------------------------------------------------ cms

def test_cms_estimates_upper_bound_and_order(spark):
    rows = (
        [("alpha",)] * 100 + [("beta",)] * 60 + [("gamma",)] * 30
        + [(f"noise{i}",) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "v string")
    out = sketch.cms_heavy_hitters(df, F.col("v"), k=3).collect()
    assert [r["value"] for r in out] == ["alpha", "beta", "gamma"]
    for r in out:
        assert r["cms_estimate"] >= r["true_count"]  # CM never undercounts
        # depth-4 min over 1024-wide rows: collisions with 500 singleton
        # noise tokens should stay tiny
        assert r["cms_estimate"] <= r["true_count"] + 10
