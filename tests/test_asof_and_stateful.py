"""As-of join semantics + custom stateful streaming operator tests."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import asof_join
from occupation_wage_etl_spark.streaming import stateful


def _ts(h, m=0):
    return datetime.datetime(2026, 1, 1, h, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "p1"),
            (1, _ts(12), "p2"),
            (1, _ts(9), "p0"),   # before any right row → NULL match
            (2, _ts(10), "p3"),  # key with no right rows at all
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(9, 30), 100.0),
            (1, _ts(10), 200.0),   # exactly coincident with p1 → matches (>=)
            (1, _ts(11), 300.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    got = {r["tag"]: r["price"] for r in asof_join.asof_join(left, right).collect()}
    assert got == {"p0": None, "p1": 200.0, "p2": 300.0, "p3": None}


def test_asof_join_suffixes_collisions(spark):
    left = spark.createDataFrame([(1, _ts(10), 1.0)], "user_id long, ts timestamp, v double")
    right = spark.createDataFrame([(1, _ts(9), 2.0)], "user_id long, ts timestamp, v double")
    out = asof_join.asof_join(left, right)
    assert set(out.columns) == {"user_id", "ts", "v", "v_r"}
    row = out.first()
    assert (row["v"], row["v_r"]) == (1.0, 2.0)


def test_asof_join_single_shuffle_plan(spark):
    """The union-merge formulation must plan exactly one exchange per
    side feeding one sort — not a range join."""
    left = spark.createDataFrame([(1, _ts(10), "x")], "user_id long, ts timestamp, t string")
    right = spark.createDataFrame([(1, _ts(9), 1.0)], "user_id long, ts timestamp, p double")
    plan = asof_join.asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # union shuffles once


def test_running_user_totals_stream(spark, tmp_path):
    rows = [
        (1, 10.0), (1, 20.0), (2, 5.0), (2, None), (3, 7.5),
    ]
    df = spark.createDataFrame(
        [(u, v, _ts(9, i)) for i, (u, v) in enumerate(rows)],
        "user_id long, value double, ts timestamp",
    )
    src = str(tmp_path / "ev")
    df.repartition(2).write.parquet(src)

    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(src)
    q = (
        stateful.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user == batch aggregate
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("running_totals").collect()
    }
    want = {
        r["user_id"]: (r["n_events"], pytest.approx(r["total_value"]))
        for r in stateful.user_totals_batch(df).collect()
    }
    assert got == want
    assert got[2] == (2, pytest.approx(5.0))  # NULL value counted, sums as 0


def test_streaming_heavy_hitters(spark, tmp_path):
    """With <= k distinct items per shard, SpaceSaving is exact: the
    final sketch rows must equal batch groupBy counts per shard."""
    rows = []
    for i in range(300):
        rows.append((i % 7, ["click", "view", "purchase"][i % 3], _ts(9, i % 50)))
    # skew one item so ranking is meaningful
    rows += [(1, "click", _ts(10, i % 50)) for i in range(100)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    src = str(tmp_path / "hh")
    df.repartition(3).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(src)
    q = (
        stateful.streaming_heavy_hitters(stream, k=8, n_shards=4)
        .writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {}
    for r in spark.table("hh").collect():
        got[(r.shard, r.item)] = r.count_est  # later rows overwrite earlier

    want_df = (
        df.select(
            (F.crc32(F.col("user_id").cast("string").cast("binary")) % 4)
            .cast("long")
            .alias("shard"),
            F.col("event_type").alias("item"),
        )
        .groupBy("shard", "item")
        .count()
    )
    want = {(r.shard, r.item): r["count"] for r in want_df.collect()}
    assert got == want
    # global merge ranks the skewed item first
    totals = {}
    for (_, item), n in got.items():
        totals[item] = totals.get(item, 0) + n
    assert max(totals, key=totals.get) == "click"


def test_streaming_record_highs_matches_batch(spark, tmp_path):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [  # (user, event_id, value): records interleaved across keys
        (1, 0, 5.0), (1, 1, 7.0), (1, 2, 7.0), (1, 3, 6.0), (1, 4, 9.0),
        (2, 5, 3.0), (2, 6, 2.0), (2, 7, 4.0), (2, 8, None),
    ]
    df = spark.createDataFrame(
        [(u, e, v, _ts(9, i)) for i, (u, e, v) in enumerate(rows)],
        "user_id long, event_id long, value double, ts timestamp",
    )
    src = str(tmp_path / "rh")
    df.repartition(3).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, event_id long, value double, ts timestamp"
    ).parquet(src)
    q = (
        stateful.streaming_record_highs(stream)
        .writeStream.format("memory")
        .queryName("rec_highs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["key"], r["seq"], r["value"], r["prev_max"])
        for r in spark.table("rec_highs").collect()
    )
    # batch oracle: per-key strict running max over event_id order
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = (
        df.filter(F.col("value").isNotNull())
        .withColumn("prev_max", F.max("value").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
    )
    want = sorted(
        (r["user_id"], r["event_id"], r["value"], r["prev_max"])
        for r in batch.collect()
    )
    assert got == want
    assert (1, 2, 7.0, 7.0) not in got  # ties are not records


def test_streaming_record_highs_multi_chunk(spark, tmp_path):
    """A hot key whose micro-batch spans MANY Arrow chunks (tiny
    maxRecordsPerBatch) with rows arriving in shuffled seq order must
    fold identically to the batch operator — the concat-then-sort
    contract across chunk boundaries."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # 400 rows for key 1 in a deterministic shuffled order, plus a
    # small second key; values chosen so records are scattered
    seqs = [(i * 173) % 400 for i in range(400)]  # permutation of 0..399
    rows = [(1, s, float((s * 37) % 101)) for s in seqs]
    rows += [(2, 1000 + i, float(i % 13)) for i in range(40)]
    df = spark.createDataFrame(
        [(u, e, v, _ts(9, i % 59)) for i, (u, e, v) in enumerate(rows)],
        "user_id long, event_id long, value double, ts timestamp",
    )
    src = str(tmp_path / "rh_chunks")
    df.coalesce(1).write.parquet(src)  # one file -> one micro-batch

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        stream = spark.readStream.schema(
            "user_id long, event_id long, value double, ts timestamp"
        ).parquet(src)
        q = (
            stateful.streaming_record_highs(stream)
            .writeStream.format("memory")
            .queryName("rec_highs_chunks")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    got = sorted(
        (r["key"], r["seq"], r["value"], r["prev_max"])
        for r in spark.table("rec_highs_chunks").collect()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = (
        df.filter(F.col("value").isNotNull())
        .withColumn("prev_max", F.max("value").over(w))
        .filter(
            F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max"))
        )
    )
    want = sorted(
        (r["user_id"], r["event_id"], r["value"], r["prev_max"])
        for r in batch.collect()
    )
    assert got == want
    assert len([1 for k, *_ in got if k == 1]) > 1  # non-vacuous
