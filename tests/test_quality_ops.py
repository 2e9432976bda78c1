"""Unit tests for batch-3 round-2 operators: grouped MAD, Benford
deviation, RRF fusion, constraint suite, deterministic mode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import profile, retrieval, stats


def test_grouped_mad_known_values(spark):
    # 1..9 plus an outlier 1000: med=5.5, adevs of 1..9 around it →
    # mad = median(|v-5.5|) over ten values.
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = stats.grouped_mad(df, "g", "v", k=3.0).collect()[0]
    assert r.n_rows == 10
    assert r.med == 5.5
    # |v-5.5| = 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5 → p50 = 2.5
    assert r.mad == 2.5
    # threshold = 3*1.4826*2.5 = 11.1195 → only 1000 flags
    assert r.n_outliers == 1


def test_benford_uniform_vs_benford_like(spark):
    # numbers 1..999 have a first-digit distribution far from Benford →
    # chi2 large; powers-of-2-ish data is closer.  Just sanity + counts.
    df = spark.createDataFrame(
        [("u", float(i)) for i in range(1, 1000)], "g string, v double"
    )
    r = profile.benford_deviation(df, "g", "v").collect()[0]
    assert r.n == 999
    # 111 numbers start with each digit in 1..999
    assert all(getattr(r, f"c{d}") == 111 for d in range(1, 10))
    assert r.chi2 > 100  # uniform digits are very non-Benford


def test_benford_excludes_sub_one_values(spark):
    df = spark.createDataFrame(
        [("g", 0.5), ("g", 12.0)], "g string, v double"
    )
    r = profile.benford_deviation(df, "g", "v").collect()[0]
    assert r.n == 1 and r.c1 == 1


def test_rrf_fuse_order_and_absentees(spark):
    r1 = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank long"
    )
    out = retrieval.rrf_fuse([r1, r2], id_col="doc_id", c=60, k=10).collect()
    scores = {r.doc_id: r.rrf for r in out}
    # doc 2 appears in both lists → highest fused score
    assert max(scores, key=scores.get) == 2
    assert scores[2] == (0.0 + 1.0 / 62) + 1.0 / 61
    assert scores[1] == (0.0 + 1.0 / 61) + 0.0  # absent from list 2
    assert set(scores) == {1, 2, 3, 4}


def test_check_constraints_values_and_shape(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, None), (2, -3.0)], "k long, v double"
    )
    out = profile.check_constraints(
        df,
        [
            ("n_rows", F.count(F.lit(1))),
            ("null_v", F.sum(F.col("v").isNull().cast("int"))),
            ("neg_v", F.sum((F.col("v") < 0).cast("int"))),
            ("dup_k", F.count(F.lit(1)) - F.count_distinct(F.col("k"))),
        ],
    ).collect()
    got = {r.check_name: r.value for r in out}
    assert got == {"n_rows": 3, "null_v": 1, "neg_v": 1, "dup_k": 1}


def test_grouped_mode_tiebreak_largest_value(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", "b"), ("g", "c"), ("g", "c")],
        "g string, v string",
    )
    r = stats.grouped_mode(df, "g", "v").collect()[0]
    assert (r.mode_value, r.mode_count) == ("c", 2)  # tie b/c → larger
