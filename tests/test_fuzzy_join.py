"""Losslessness and semantics of the q-gram edit-distance join."""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators.fuzzy_join import edit_distance_join


def _naive(spark, left, right, d):
    l = left.select(F.col("id").alias("l_id"), F.col("s").alias("l_s"))
    r = right.select(F.col("id").alias("r_id"), F.col("s").alias("r_s"))
    return (
        l.crossJoin(r)
        .withColumn("dist", F.levenshtein("l_s", "r_s"))
        .filter(F.col("dist") <= d)
        .select("l_id", "r_id", "dist")
    )


def test_matches_naive_on_corrupted_parts(spark, sf_tiny):
    part = spark.read.parquet(f"{sf_tiny}/part.parquet").limit(200)
    clean = part.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("s"))
    pos = (F.col("p_partkey") % 10 + 3).cast("int")
    dirty = part.select(
        F.col("p_partkey").alias("id"),
        F.concat(
            F.substring(F.col("p_name"), F.lit(1), pos - 1),
            F.substring(F.col("p_name"), pos + 1, F.length("p_name")),
        ).alias("s"),
    )
    got = sorted(
        map(
            tuple,
            edit_distance_join(
                dirty, clean, "id", "id", "s", "s", max_dist=2
            ).toDF("l_id", "r_id", "dist").collect(),
        )
    )
    want = sorted(map(tuple, _naive(spark, dirty, clean, 2).collect()))
    assert got == want and len(got) >= 200  # every dirty row finds its original


def test_short_string_fallback_is_complete(spark):
    # "ab" vs "cd" share ZERO 2-grams yet dist=2 — only the short-string
    # broadcast pass can find it.
    left = spark.createDataFrame([(1, "ab"), (2, "abcdefgh")], "id long, s string")
    right = spark.createDataFrame([(10, "cd"), (11, "abcdefxx")], "id long, s string")
    got = {
        (r[0], r[1], r[2])
        for r in edit_distance_join(
            left, right, "id", "id", "s", "s", max_dist=2
        ).collect()
    }
    assert (1, 10, 2) in got      # short x short, zero shared grams
    assert (2, 11, 2) in got      # long x long via inverted index
