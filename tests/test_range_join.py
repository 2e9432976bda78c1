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
