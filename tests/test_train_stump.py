"""Tests for the exact best-split decision stump
(operators/curation.py:train_stump)."""

from __future__ import annotations

from occupation_wage_etl_spark.operators import curation


def test_stump_finds_perfect_split(spark):
    rows = []
    for x1, lab in [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]:
        rows += [(x1, 5.0, lab)] * 3  # x2 constant -> no candidate there
    df = spark.createDataFrame(rows, "x1 double, x2 double, label int")
    out = curation.train_stump(df, ["x1", "x2"], "label").collect()
    assert len(out) == 1
    r = out[0]
    assert r["feature"] == "x1" and r["threshold"] == 2.0
    assert r["n_left"] == 6 and r["pos_left"] == 0
    assert r["n_right"] == 6 and r["pos_right"] == 6
    assert r["gini"] == 0.0


def test_stump_weighted_gini_value(spark):
    # x1 <= 1 -> 3 neg / 1 pos ; x1 > 1 -> 2 pos. G_left = 1-(9+1)/16,
    # weighted mean = (4*G_left + 2*0)/6 = (4*(6/16))/6 = 0.25
    rows = [(1.0, 0), (1.0, 0), (1.0, 0), (1.0, 1), (2.0, 1), (3.0, 1)]
    df = spark.createDataFrame(rows, "x1 double, label int")
    r = curation.train_stump(df, ["x1"], "label").collect()[0]
    assert r["threshold"] == 1.0
    assert abs(r["gini"] - 0.25) < 1e-12
    assert r["n_left"] == 4 and r["pos_left"] == 1
    assert r["n_right"] == 2 and r["pos_right"] == 2


def test_stump_tie_breaks_on_feature_name(spark):
    # identical columns -> identical gini; 'xa' wins lexically
    rows = [(1.0, 1.0, 0), (2.0, 2.0, 1)] * 2
    df = spark.createDataFrame(rows, "xa double, xb double, label int")
    r = curation.train_stump(df, ["xb", "xa"], "label").collect()[0]
    assert r["feature"] == "xa" and r["gini"] == 0.0
