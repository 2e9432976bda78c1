"""Property tests for percent-rank calibration, duplicated-n-gram
coverage, vocabulary novelty, grouped OLS, cluster representatives, and
time-weighted average (the q105–q110 registry surface).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import (
    curation,
    stats,
    text_analysis,
    timeseries,
)


def test_percent_rank_ties_and_singleton(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 10.0), (3, "a", 20.0), (4, "b", 99.0)],
        "id long, grp string, v double",
    )
    out = {
        r.id: r.pct
        for r in stats.grouped_percent_rank(df, "grp", "v", "id").collect()
    }
    # ties share rank; (rank-1)/(n-1) with n=3 → 0, 0, 1; singleton → 0
    assert out == {1: 0.0, 2: 0.0, 3: 1.0, 4: 0.0}


def test_dup_ngram_coverage_counts_cross_doc_grams(spark):
    shared = "one two three four"
    docs = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "five six seven eight")],
        "doc_id long, text string",
    )
    out = {
        r.id: (r.n_grams, r.n_dup, r.dup_frac)
        for r in text_analysis.dup_ngram_coverage(docs, n=4).collect()
    }
    # docs 1/2 share their single 4-gram; doc 3's gram is unique
    assert out == {1: (1, 1, 1.0), 2: (1, 1, 1.0), 3: (1, 0, 0.0)}


def test_vocab_novelty_first_slice_owns_shared_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "s1", "alpha beta"), (2, "s2", "beta gamma")],
        "doc_id long, source string, text string",
    )
    out = {
        r.source: (r.n_tokens, r.n_new)
        for r in text_analysis.vocab_novelty(docs, "source").collect()
    }
    # s1 introduces alpha+beta; s2 uses beta (seen) + gamma (new)
    assert out == {"s1": (2, 2), "s2": (2, 1)}


def test_grouped_ols_recovers_exact_line(spark):
    # y = 3x + 7 exactly → slope 3, intercept 7, r² 1
    rows = [(1, float(x), 3.0 * x + 7.0) for x in range(10)]
    df = spark.createDataFrame(rows, "k long, x double, y double")
    out = stats.grouped_ols(
        df, "k", F.col("x"), F.col("y"),
        x_decimal="decimal(18,0)", y_decimal="decimal(18,2)",
    ).collect()[0]
    assert out.n == 10
    assert abs(out.slope - 3.0) < 1e-12
    assert abs(out.intercept - 7.0) < 1e-12
    assert abs(out.r2 - 1.0) < 1e-12


def test_grouped_ols_zero_variance_gives_nulls(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (1, 5.0, 2.0)], "k long, x double, y double"
    )
    out = stats.grouped_ols(df, "k", F.col("x"), F.col("y")).collect()[0]
    assert out.slope is None and out.intercept is None and out.r2 is None


def test_cluster_representatives_elects_best_quality_min_id_ties(spark):
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1)],
        "doc_id long, score double",
    )
    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200)],
        "doc_id long, cluster_id long",
    )
    out = {
        r.cluster_id: (r.size, r.rep_id, r.rep_score)
        for r in curation.cluster_representatives(
            docs, clusters, F.col("score")
        ).collect()
    }
    assert out == {100: (3, 2, 0.9), 200: (1, 4, 0.1)}


def test_time_weighted_avg_trapezoid(spark):
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    # value 10 for 1s ramping to 20, then 20 ramping to 20 for 3s
    ev = spark.createDataFrame(
        [(1, t, 1, 10.0), (1, t + s, 2, 20.0), (1, t + 4 * s, 3, 20.0),
         (2, t, 4, 5.0)],  # single observation → dropped
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = timeseries.time_weighted_avg(
        ev, "user_id", "ts", "value", "event_id"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1 and r.n_intervals == 2
    assert r.span_us == 4_000_000
    # ((10+20)*1 + (20+20)*3) / (2*4) = (30 + 120)/8 = 18.75
    assert r.twa == 18.75


def test_session_paths_counts_and_order(spark):
    t = dt.datetime(2024, 1, 1, 9, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, session 1: view>click ; session 2 (big gap): view>click
        (1, 1, t, "view"), (2, 1, t + m, "click"),
        (3, 1, t + 120 * m, "view"), (4, 1, t + 121 * m, "click"),
        # user 2: single view
        (5, 2, t, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {(r.path, r.n_sessions, r.rank)
           for r in timeseries.session_paths(ev, gap_minutes=30, k=5).collect()}
    assert out == {("view>click", 2, 1), ("view", 1, 2)}


def test_cusum_changepoint_finds_level_shift(spark):
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    vals = [10.0] * 5 + [20.0] * 5   # shift after index 5
    ev = spark.createDataFrame(
        [(1, t + i * s, i, v) for i, v in enumerate(vals)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    r = timeseries.cusum_changepoint(
        ev, "user_id", "ts", "value", "event_id"
    ).collect()[0]
    assert r.n == 10
    assert r.cp_index == 5      # deviation peaks at the last low point
    # peak = |n*prefix - k*S|/n = |10*50 - 5*150|/10 = 25
    assert r.peak == 25.0


def test_rfm_scores_are_quantile_ranks(spark):
    t = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = []
    # 5 users: user i purchases i times, value 10*i, most recent = later for higher i
    eid = 0
    for u in range(1, 6):
        for j in range(u):
            rows.append((eid, u, t + u * day + j * dt.timedelta(hours=1),
                         "purchase", 10.0 * u))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    out = {r.user_id: (r.r, r.f, r.m, r.segment)
           for r in timeseries.rfm_segments(ev).collect()}
    # user 5: most recent, most frequent, biggest spender → 1,1,1
    assert out[5] == (1, 1, 1, "111")
    # user 1: least of everything → bucket 5
    assert out[1] == (5, 5, 5, "555")


def test_weighted_median_rank_statistic(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 100.0, 10.0),
         ("b", 5.0, 3.0)],
        "g string, v double, w double",
    )
    out = {r.g: (r.total_weight, r.wmedian)
           for r in stats.grouped_weighted_median(df, "g", "v", "w").collect()}
    # group a: W=12, half=6 → first value with 2*cum>=12 is 100.0
    assert out["a"] == (12.0, 100.0)
    assert out["b"] == (3.0, 5.0)


def test_weighted_median_equal_weights_is_lower_median(spark):
    df = spark.createDataFrame(
        [("g", float(v), 1.0) for v in (1, 2, 3, 4)],
        "g string, v double, w double",
    )
    r = stats.grouped_weighted_median(df, "g", "v", "w").collect()[0]
    assert r.wmedian == 2.0   # lower median of 1,2,3,4


def test_cluster_safe_split_keeps_clusters_together(spark):
    from occupation_wage_etl_spark.operators import splits as SP
    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    clusters = spark.createDataFrame(
        [(i, i // 10 * 10) for i in range(50)],  # 5 clusters of 10
        "doc_id long, cluster_id long",
    )
    out = SP.cluster_safe_split(
        docs, clusters, {"train": 8, "val": 1, "test": 1}
    ).collect()
    assert len(out) == 100
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_key, set()).add(r.split)
    # every cluster maps to exactly one split
    assert all(len(s) == 1 for s in by_cluster.values())
    # all three splits appear over 55 distinct keys
    assert {s for r in out for s in [r.split]} == {"train", "val", "test"}


def test_denoising_pairs_deterministic_and_partition(spark):
    from occupation_wage_etl_spark.operators import chunking as CH
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in CH.denoising_pairs(docs, mask_pct=30).collect()}
    r1 = out[1]
    assert r1.n_tokens == 8
    assert r1.n_tokens == r1.n_masked + len(r1.input_text.split()) if r1.input_text else True
    # masked entries carry their original 0-based positions
    for entry in (r1.target_text.split() if r1.target_text else []):
        pos, tok = entry.split(":", 1)
        assert ["alpha","beta","gamma","delta","epsilon","zeta","eta","theta"][int(pos)] == tok
    # rerun is identical (no RNG)
    again = {r.id: r for r in CH.denoising_pairs(docs, mask_pct=30).collect()}
    assert again[1].input_text == r1.input_text
    assert again[1].target_text == r1.target_text


def test_temperature_mix_upweights_small_slices(spark):
    from occupation_wage_etl_spark.operators import splits as SP
    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = SP.temperature_mix(df, "source", budget=200, alpha=0.5).collect()
    n_big = sum(1 for r in kept if r.source == "big")
    n_small = sum(1 for r in kept if r.source == "small")
    # proportional would keep 180/20; α=0.5 shifts toward 150/50
    assert n_small / max(n_big, 1) > 100 / 900
    assert abs(len(kept) - 200) < 60   # binomial concentration


def test_out_of_order_depth(spark):
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    # arrival order (event_id): ts goes 0, 10, 5, 20 → one late event (5 < 10)
    ev = spark.createDataFrame(
        [(1, t, 1), (1, t + 10 * s, 2), (1, t + 5 * s, 3), (1, t + 20 * s, 4)],
        "user_id long, ts timestamp, event_id long",
    )
    r = timeseries.out_of_order_depth(ev, "user_id", "ts", "event_id").collect()[0]
    assert (r.n_events, r.n_late, r.max_disorder_us) == (4, 1, 5_000_000)
    assert r.p_late == 0.25


def test_int8_quantize_roundtrip_error_bound(spark):
    from occupation_wage_etl_spark.operators import similarity as SIM
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0, 255.0]), (2, [7.0, 7.0, 7.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.id: r for r in SIM.int8_quantize_stats(emb).collect()}
    # scale = 1.0: codes are exact integers → zero reconstruction error
    assert out[1].scale_factor == 1.0 and out[1].mse == 0.0
    # constant vector: lossless by convention
    assert out[2].scale_factor == 0.0 and out[2].mse == 0.0


def test_compaction_plan_contiguous_groups(spark):
    from occupation_wage_etl_spark.sources import lake as LK
    sizes = spark.createDataFrame(
        [(d, 40) for d in range(10)], "part_day int, est_bytes long"
    )
    out = sorted(
        LK.compaction_plan(sizes, "part_day", "est_bytes", 100).collect(),
        key=lambda r: r.file_group,
    )
    # cumulative-before thresholds at 100, 200, 300: groups of 3,2,3,2? —
    # prefix sums 0,40,...: group = floor(before/100) → sizes 3,2,3,2
    assert [r.n_parts for r in out] == [3, 2, 3, 2]
    # contiguity: each group's range doesn't overlap the next
    for a, b in zip(out, out[1:]):
        assert a.last_part < b.first_part


def test_resample_lerp_interpolates_interior_gaps(spark):
    t = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    obs = spark.createDataFrame(
        [(1, t, 10.0), (1, t + 3 * day, 40.0)],
        "k long, slot timestamp, v double",
    )
    out = {r.slot.day: (r.v, r.is_filled)
           for r in timeseries.resample_lerp(obs, "k", "slot", "v").collect()}
    assert out[1] == (10.0, False)
    assert out[2] == (20.0, True)   # 10 + (40-10) * 1/3
    assert out[3] == (30.0, True)
    assert out[4] == (40.0, False)
