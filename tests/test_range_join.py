"""Bucket-grid range join: must equal the naive BETWEEN join (including
overlapping intervals) while planning as an equi-join, not a nested loop."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import range_join


def _intervals(spark):
    return spark.createDataFrame(
        [
            ("a", 0.0, 10.0),
            ("b", 5.0, 25.0),  # overlaps a and c
            ("c", 20.0, 20.0),  # degenerate single-point interval
            ("d", 90.0, 95.0),
        ],
        "band string, lo double, hi double",
    )


def test_range_join_equals_naive_between(spark):
    pts = spark.range(0, 100).select((F.col("id") * F.lit(1.0)).alias("v"))
    iv = _intervals(spark)
    naive = pts.join(
        iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
    ).select("v", "band")
    got = range_join.range_join(pts, "v", iv, bucket_width=7.0).select("v", "band")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_range_join_no_duplicate_pairs_and_inner_drop(spark):
    pts = spark.createDataFrame([(7.0,), (22.0,), (50.0,)], "v double")
    out = range_join.range_join(pts, "v", _intervals(spark), bucket_width=3.0)
    pairs = sorted((r["v"], r["band"]) for r in out.collect())
    # 7 -> a,b; 22 -> b; 50 -> nothing (inner); each pair exactly once
    assert pairs == [(7.0, "a"), (7.0, "b"), (22.0, "b")]


def test_range_join_plans_equi_join_not_nested_loop(spark):
    pts = spark.range(0, 100).select((F.col("id") * F.lit(1.0)).alias("v"))
    out = range_join.range_join(pts, "v", _intervals(spark), bucket_width=10.0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "NestedLoop" not in plan


def test_range_join_rejects_bad_width(spark):
    pts = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        range_join.range_join(pts, "v", _intervals(spark), bucket_width=0.0)


def test_interval_overlap_join_exactly_once(spark):
    from occupation_wage_etl_spark.operators.range_join import interval_overlap_join

    # left interval spans many cells; pairs must appear exactly once.
    left = spark.createDataFrame(
        [(1, 0.0, 100.0), (2, 5.0, 6.0), (3, 200.0, 210.0)],
        "l_id long, a_lo double, a_hi double",
    )
    right = spark.createDataFrame(
        [(10, 50.0, 150.0),   # overlaps 1 across many shared cells
         (11, 100.0, 120.0),  # touches 1 exactly at the endpoint (inclusive)
         (12, 5.5, 5.6),      # inside 2
         (13, 211.0, 300.0)], # disjoint from everything
        "r_id long, b_lo double, b_hi double",
    )
    rows = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=10.0
        ).collect()
    )
    assert rows == [(1, 10), (1, 11), (1, 12), (2, 12)]

    # brute-force equivalence on a denser random-ish grid
    l2 = spark.range(40).select(
        F.col("id").alias("l_id"),
        (F.col("id") * 7 % 50).cast("double").alias("a_lo"),
        ((F.col("id") * 7 % 50) + (F.col("id") % 13)).cast("double").alias("a_hi"),
    )
    r2 = spark.range(35).select(
        F.col("id").alias("r_id"),
        (F.col("id") * 11 % 45).cast("double").alias("b_lo"),
        ((F.col("id") * 11 % 45) + (F.col("id") % 9)).cast("double").alias("b_hi"),
    )
    fast = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            l2, r2, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=5.0
        ).collect()
    )
    naive = sorted(
        (r["l_id"], r["r_id"])
        for r in l2.crossJoin(r2)
        .filter((F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi")))
        .collect()
    )
    assert fast == naive
