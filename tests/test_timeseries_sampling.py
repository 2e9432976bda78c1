"""Property tests for gaps-and-islands streaks, Markov transitions,
and weighted A-ES sampling (operators/timeseries.py, operators/splits.py).
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import splits, timeseries


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )


def test_streaks_islands_and_gaps(spark):
    t = dt.datetime(2024, 1, 1, 12, 0)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: days 0,1,2 then gap then 5,6  → streaks of 3 and 2
        *[(1, t + day * d, "click", d) for d in (0, 1, 2, 5, 6)],
        # user 2: two events same day → one 1-day streak
        (2, t, "view", 100),
        (2, t + dt.timedelta(hours=3), "view", 101),
    ]
    out = timeseries.activity_streaks(_events(spark, rows), "user_id", "ts")
    got = {
        (r.user_id, r.streak_start.isoformat(), r.streak_days)
        for r in out.collect()
    }
    assert got == {
        (1, "2024-01-01", 3),
        (1, "2024-01-06", 2),
        (2, "2024-01-01", 1),
    }


def test_streaks_cross_midnight_events_split_by_date(spark):
    # 23:50 and next-day 00:10 are consecutive DATES → one 2-day streak.
    rows = [
        (1, dt.datetime(2024, 3, 1, 23, 50), "click", 1),
        (1, dt.datetime(2024, 3, 2, 0, 10), "click", 2),
    ]
    out = timeseries.activity_streaks(_events(spark, rows), "user_id", "ts")
    assert [(r.streak_days,) for r in out.collect()] == [(2,)]


def test_transition_matrix_counts_and_rows_sum_to_one(spark):
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    # user 1: a->b->a->b ; user 2: a->b  → a->b: 3, b->a: 1
    rows = [
        (1, t + s * i, st, i)
        for i, st in enumerate(["a", "b", "a", "b"])
    ] + [(2, t + s * i, st, 10 + i) for i, st in enumerate(["a", "b"])]
    out = timeseries.transition_matrix(
        _events(spark, rows), "user_id", "event_type", "ts", "event_id"
    ).collect()
    got = {(r.from_state, r.to_state): (r.n, r.p) for r in out}
    assert got == {("a", "b"): (3, 1.0), ("b", "a"): (1, 1.0)}
    # row-normalization: per from_state the probabilities sum to 1
    sums: dict[str, float] = {}
    for r in out:
        sums[r.from_state] = sums.get(r.from_state, 0.0) + r.p
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())


def test_transition_matrix_ties_break_on_tiebreak_col(spark):
    # Two events at the SAME ts: order must follow event_id, giving
    # x->y (not y->x).
    t = dt.datetime(2024, 1, 1)
    rows = [(1, t, "x", 1), (1, t, "y", 2)]
    out = timeseries.transition_matrix(
        _events(spark, rows), "user_id", "event_type", "ts", "event_id"
    ).collect()
    assert [(r.from_state, r.to_state) for r in out] == [("x", "y")]


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("source"),
        # weights 1..4: id%4==3 gets weight 4 (heavily favored)
        (F.col("id") % 4 + 1).alias("n_chars"),
    )


def test_weighted_sample_exactly_k_per_group_and_deterministic(spark):
    df = _docs(spark)
    out = splits.weighted_sample(df, "source", "n_chars", 3, "doc_id")
    rows = out.collect()
    per = {}
    for r in rows:
        per[r.source] = per.get(r.source, 0) + 1
    assert set(per.values()) == {3}
    # rerun on a different partitioning → identical rows
    out2 = splits.weighted_sample(
        df.repartition(7), "source", "n_chars", 3, "doc_id"
    )
    assert {r.doc_id for r in rows} == {r.doc_id for r in out2.collect()}


def test_weighted_sample_matches_python_replay(spark):
    """The A-ES keystream replayed row-for-row in pure Python picks the
    same winners (engine-independence of the md5-uniform + ln score)."""
    import hashlib

    df = _docs(spark, n=80)
    out = splits.weighted_sample(df, "source", "n_chars", 2, "doc_id")
    got = {(r.source, r.doc_id) for r in out.collect()}

    scored: dict[str, list] = {}
    for i in range(80):
        src, w = str(i % 5), i % 4 + 1
        h = int(hashlib.md5(f"wsamp:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        score = round(math.log(u) / float(w), 9)
        scored.setdefault(src, []).append((-score, i))
    exp = {
        (src, i)
        for src, lst in scored.items()
        for _, i in sorted(lst)[:2]
    }
    assert got == exp


def test_weighted_sample_bias_toward_heavy_weights(spark):
    # weight 1000 vs 1: the heavy rows should dominate the sample.
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("g").alias("source"),
        F.when(F.col("id") < 40, 1000).otherwise(1).alias("n_chars"),
    )
    out = splits.weighted_sample(df, "source", "n_chars", 20, "doc_id")
    heavy = sum(1 for r in out.collect() if r.doc_id < 40)
    assert heavy >= 15  # 40 heavy rows carry ~99% of total weight
