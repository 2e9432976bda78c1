"""Salted-join correctness: results must equal the plain equi-join, with
the hot key spread across salt replicas."""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import skew


def test_salted_join_equals_plain_join(spark):
    # heavily skewed probe: 900 of 1000 rows share key 7
    probe = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("rowid"),
    )
    build = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    plain = probe.join(build, "k").select("rowid", "k", "payload")
    salted = skew.salted_join(probe, build, "k", salt=8).select("rowid", "k", "payload")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_semantics(spark):
    probe = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "tag"])
    build = spark.createDataFrame([(1, 10.0)], ["k", "v"])
    out = skew.salted_join(probe, build, "k", salt=4, how="left").collect()
    got = {r["tag"]: r["v"] for r in out}
    assert got == {"a": 10.0, "b": None}
    assert len(out) == 2  # left rows never duplicated by the salt replicas
