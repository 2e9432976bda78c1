"""Structured Streaming tests: file source → memory sink with
``trigger(availableNow=True)``, asserting streaming results equal the
batch plan on the same data (the module's core contract: one
transformation, two execution modes)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from occupation_wage_etl_spark.streaming import events as SE


def _ts(h, m=0, s=0):
    return datetime.datetime(2026, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    rows = [
        ("u1", "click", 1.0, _ts(9, 0)),
        ("u1", "click", 2.0, _ts(9, 10)),
        ("u1", "view", 3.0, _ts(10, 5)),
        ("u1", "click", 4.0, _ts(12, 0)),  # > 30 min gap → new session
        ("u2", "click", 5.0, _ts(9, 59)),
        ("u2", "click", 5.0, _ts(9, 59)),  # exact duplicate row
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, value double, ts timestamp")
    path = str(tmp_path_factory.mktemp("events_stream"))
    df.repartition(2).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if sdf.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _read_stream(spark, path):
    schema = "user_id string, event_type string, value double, ts timestamp"
    return spark.readStream.schema(schema).parquet(path)


def test_windowed_counts_stream_equals_batch(spark, event_dir):
    batch = SE.windowed_counts(spark.read.parquet(event_dir), "1 hour")
    stream = SE.windowed_counts(_read_stream(spark, event_dir), "1 hour", streaming=True)
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want
    # (9h, click) n=4 [u1×2 + u2×2], (10h, view) n=1, (12h, click) n=1
    assert len(want) == 3
    assert want[(_ts(9), "click")][0] == 4


def test_sessionize_stream_matches_batch_sessions(spark, event_dir):
    """Session membership must agree between the native session_window
    (streaming) and the lag/cumsum reformulation (batch).  session_window
    ends at last_event+gap by definition, so compare (user, start,
    n_events) — not end."""
    batch = SE.sessionize(spark.read.parquet(event_dir), gap="30 minutes")
    stream = SE.sessionize(_read_stream(spark, event_dir), gap="30 minutes", streaming=True)
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("sessions").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.collect()
    }
    assert got == want
    # u1: {9:00 ×2-event... wait 9:00→9:10 (gap 10m) then 10:05 (55m → new)}
    u1_sessions = sorted(n for (u, _s, n) in want if u == "u1")
    assert u1_sessions == [1, 1, 2]


def test_streaming_dedup(spark, event_dir):
    stream = SE.streaming_dedup(
        _read_stream(spark, event_dir), ["user_id", "event_type", "value", "ts"]
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("deduped")
    assert got.count() == 5  # 6 rows - 1 exact duplicate
    assert got.filter((F.col("user_id") == "u2")).count() == 1


def test_stream_to_lake_sink(spark, event_dir, tmp_path):
    from occupation_wage_etl_spark.streaming import sinks

    out_root = str(tmp_path / "stream_lake")
    ckpt = str(tmp_path / "ckpt")
    stream = _read_stream(spark, event_dir).filter(F.col("event_type") == "click")
    q = sinks.stream_to_lake(stream, out_root, "clicks", ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out_root}/clicks")
    assert got.count() == 5  # the 5 click rows (incl. the duplicate pair)
    assert "__batch_id" in got.columns
    # restart with the same checkpoint: no new data → no duplicates
    q2 = sinks.stream_to_lake(
        _read_stream(spark, event_dir).filter(F.col("event_type") == "click"),
        out_root, "clicks", ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out_root}/clicks").count() == 5


def test_approx_count_distinct_tolerance(spark, event_dir):
    """Approximate aggregates (HLL sketch): must land within rsd of exact.
    No oracle pair (engine-specific sketch) — tolerance-checked here."""
    df = spark.read.parquet(event_dir)
    exact = df.select(F.countDistinct("user_id")).first()[0]
    approx = df.select(F.approx_count_distinct("user_id", rsd=0.05)).first()[0]
    assert abs(approx - exact) <= max(1, exact * 0.15)


def test_interval_join_stream_equals_batch(spark, event_dir):
    # left = clicks, right = views/conversions within 15 min after
    clicks_b = spark.read.parquet(event_dir).filter(F.col("event_type") == "click")
    views_b = spark.read.parquet(event_dir).filter(F.col("event_type") != "click")
    batch = SE.interval_join(clicks_b, views_b, max_delay="1 hour")
    want = sorted(tuple(r) for r in batch.collect())

    clicks_s = _read_stream(spark, event_dir).filter(F.col("event_type") == "click")
    views_s = _read_stream(spark, event_dir).filter(F.col("event_type") != "click")
    stream = SE.interval_join(
        clicks_s, views_s, max_delay="1 hour", watermark="2 hours", streaming=True
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("ij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("ij").collect())
    assert got == want
    assert len(got) == 1  # u1 view@10:05 attributes to click@9:10 (55 min)


def test_enrich_with_dimension_stream_equals_batch(spark, event_dir):
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "basic"), ("u9", "never-matches")],
        "user_id string, tier string",
    )
    batch = SE.enrich_with_dimension(spark.read.parquet(event_dir), dim)
    want = sorted(tuple(r) for r in batch.collect())
    assert len(want) == 6  # every fixture event has a dim row

    stream = SE.enrich_with_dimension(_read_stream(spark, event_dir), dim)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("enriched").collect())
    assert got == want


def test_stream_apply_cdc(spark, tmp_path):
    """CDC stream → lake: upserts merge in place, deletes disappear,
    inserts append — end state equals applying the delta in batch."""
    from occupation_wage_etl_spark.sources import lake
    from occupation_wage_etl_spark.streaming import sinks

    root = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 11)], "k long, v long"
    )
    lake.write_snapshot(base, root, "tbl", "2026-01-01")

    cdc_dir = str(tmp_path / "cdc")
    spark.createDataFrame(
        [
            (2, 99, "update"),
            (11, 110, "insert"),
            (5, None, "delete"),
        ],
        "k long, v long, change_type string",
    ).write.parquet(cdc_dir)

    stream = spark.readStream.schema("k long, v long, change_type string").parquet(cdc_dir)
    q = sinks.stream_apply_cdc(
        stream, root, "tbl", "k", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        r.k: r.v
        for r in spark.read.parquet(f"{root}/tbl").select("k", "v").collect()
    }
    assert got[2] == 99          # update applied in place
    assert got[11] == 110        # insert appended
    assert 5 not in got          # delete removed
    assert len(got) == 10


def test_windowed_funnel_deadline(spark):
    import datetime as dt
    from occupation_wage_etl_spark.streaming import events as SE
    t = dt.datetime(2024, 1, 1, 9, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1 completes all 3 within the hour
        (1, 1, t, "view"), (2, 1, t + 5 * m, "click"), (3, 1, t + 10 * m, "purchase"),
        # user 2: purchase OUTSIDE the 60-min window from first view
        (4, 2, t, "view"), (5, 2, t + 5 * m, "click"), (6, 2, t + 90 * m, "purchase"),
        # user 3: out-of-order (purchase before click) → stops at click? no:
        # click precedes, purchase before click's min → not counted
        (7, 3, t, "view"), (8, 3, t + 2 * m, "purchase"), (9, 3, t + 5 * m, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r.level: r.n_users for r in SE.windowed_funnel(
        ev, ["view", "click", "purchase"], window_minutes=60).collect()}
    # level1: users 1,2,3 viewed; level2: all clicked after view;
    # level3: only user 1 purchased after click within deadline
    assert out == {1: 3, 2: 3, 3: 1}


def test_heavy_hitters_batch_equals_stream_final(spark, event_dir):
    """The batch SpaceSaving run must equal the streaming sketch's final
    state on the same data (exact regime: ≤ k distinct items/shard)."""
    from occupation_wage_etl_spark.streaming import stateful

    shard = (F.crc32(F.col("user_id").cast("string").cast("binary")) % 2).cast("long")
    batch = {
        (r["shard"], r["item"]): r["count_est"]
        for r in stateful.heavy_hitters_batch(
            spark.read.parquet(event_dir), shard, "event_type", k=8
        ).collect()
    }
    stream = stateful.streaming_heavy_hitters(
        spark.readStream.schema(
            "user_id string, event_type string, value double, ts timestamp"
        ).parquet(event_dir),
        item_col="event_type",
        shard_col="user_id",
        k=8,
        n_shards=2,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emitted row per (shard, item) is the final sketch state
    rows = spark.table("hh").collect()
    got = {(r["shard"], r["item"]): r["count_est"] for r in rows}
    assert got == batch
    # exact regime: counts equal plain groupBy counts
    exact = {
        (r["s"], r["event_type"]): r["n"]
        for r in spark.read.parquet(event_dir)
        .groupBy(shard.alias("s"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert batch == exact


def test_dedup_events_batch_keeps_earliest(spark):
    import datetime as dt

    rows = [
        (3, dt.datetime(2026, 1, 1, 9, 5), 1, "click"),
        (1, dt.datetime(2026, 1, 1, 9, 0), 1, "click"),   # earliest → kept
        (2, dt.datetime(2026, 1, 1, 9, 0), 1, "click"),   # same ts, higher id
        (4, dt.datetime(2026, 1, 1, 9, 9), 2, "view"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["event_id"]
        for r in SE.dedup_events_batch(e, ["user_id", "event_type"]).collect()
    }
    assert got == {1, 4}
