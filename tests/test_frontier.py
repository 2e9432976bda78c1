"""Frontier politeness gate (streaming/frontier.py): batch-fold
recurrence, default-delay fallback, and stream==batch equivalence
with multi-micro-batch splits."""

from __future__ import annotations

from occupation_wage_etl_spark.streaming import frontier


def _delays(spark):
    return spark.createDataFrame(
        [("a.com", 10), ("b.com", 5)], "domain string, delay_s long"
    )


def _requests(spark):
    rows = [
        # a.com: back-to-back burst → each waits a full delay slot
        ("a.com", 0, 100, "http://a.com/0"),
        ("a.com", 1, 101, "http://a.com/1"),
        ("a.com", 2, 102, "http://a.com/2"),
        # quiet gap → next request is NOT delayed
        ("a.com", 3, 500, "http://a.com/3"),
        # b.com: arrivals slower than the delay → never queued
        ("b.com", 0, 100, "http://b.com/0"),
        ("b.com", 1, 120, "http://b.com/1"),
        # unknown domain → default_delay_s
        ("z.com", 0, 100, "http://z.com/0"),
        ("z.com", 1, 100, "http://z.com/1"),
    ]
    return spark.createDataFrame(
        rows, "domain string, seq long, ts long, url string"
    )


def test_batch_recurrence(spark):
    out = {
        (r.domain, r.seq): r
        for r in frontier.politeness_gate_batch(
            _requests(spark), _delays(spark), default_delay_s=2
        ).collect()
    }
    assert [out[("a.com", k)].scheduled_ts for k in range(4)] == [
        100, 110, 120, 500,
    ]
    assert out[("a.com", 3)].wait_s == 0
    assert [out[("b.com", k)].scheduled_ts for k in range(2)] == [
        100, 120,
    ]
    # default-delay domain: same-instant arrivals space 2s apart,
    # (ts, seq) ordering breaks the tie
    assert [out[("z.com", k)].scheduled_ts for k in range(2)] == [
        100, 102,
    ]


def test_streaming_change_rate_equals_batch(spark, tmp_path):
    from occupation_wage_etl_spark.sources import cdx as cdxmod

    rows = [
        # (surt_key, url, ts14, digest) — k1 changes once, k2 never
        ("com,a)/", "http://a.com/", "20240101000000", "d1"),
        ("com,a)/", "http://a.com/", "20240111000000", "d1"),
        ("com,a)/", "http://a.com/", "20240121000000", "d2"),
        ("com,b)/", "http://b.com/", "20240105000000", "x"),
        ("com,b)/", "http://b.com/", "20240115000000", "x"),
    ]
    schema = (
        "surt_key string, url string, cdx_timestamp string, "
        "digest string"
    )
    caps = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "captures")
    # two ts-ordered slices → two micro-batches
    caps.filter("cdx_timestamp < '20240112'").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    caps.filter("cdx_timestamp >= '20240112'").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        frontier.streaming_change_rate(stream)
        .writeStream.format("memory")
        .queryName("cr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("cr_stream").collect()
    # latest emission per key supersedes earlier ones
    latest = {}
    for r in emitted:
        if (r.surt_key not in latest
                or r.n_captures > latest[r.surt_key].n_captures):
            latest[r.surt_key] = r
    want = {
        r.surt_key: r
        for r in cdxmod.cdx_change_rate(caps).collect()
    }
    assert set(latest) == set(want)
    for k in want:
        got, exp = latest[k], want[k]
        assert (
            got.url, got.n_captures, got.n_changes, got.span_s,
            got.mean_interval_s, got.est_change_interval_s,
        ) == (
            exp.url, exp.n_captures, exp.n_changes, exp.span_s,
            exp.mean_interval_s, exp.est_change_interval_s,
        ), k


def test_stream_equals_batch(spark, tmp_path):
    reqs = _requests(spark)
    path = str(tmp_path / "frontier_reqs")
    # one file per (domain-ordered) arrival slice → several
    # micro-batches under maxFilesPerTrigger=1, each in arrival order
    for i, cond in enumerate(["ts <= 101", "ts > 101 AND ts <= 120",
                              "ts > 120"]):
        reqs.filter(cond).coalesce(1).write.mode("append").parquet(path)
    stream = spark.readStream.schema(
        "domain string, seq long, ts long, url string"
    ).option("maxFilesPerTrigger", 1).parquet(path)
    gated = frontier.streaming_politeness_gate(
        stream, _delays(spark), default_delay_s=2
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("frontier_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.domain, r.seq): (r.ts, r.scheduled_ts, r.wait_s)
        for r in spark.table("frontier_gate").collect()
    }
    want = {
        (r.domain, r.seq): (r.ts, r.scheduled_ts, r.wait_s)
        for r in frontier.politeness_gate_batch(
            _requests(spark), _delays(spark), default_delay_s=2
        ).collect()
    }
    assert got == want
