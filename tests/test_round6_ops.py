"""Round-6 operators: grouped HLL (q218), Theil-Sen trend (q219),
readability (q220), split-conformal intervals (q221)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import (
    evaluation,
    sketch,
    text_analysis,
    timeseries,
)


# -------------------------------------------------------- grouped HLL


def test_grouped_hll_tracks_exact_and_merges_by_max(spark):
    rows = [("a", f"tok{i % 300}") for i in range(3000)]
    rows += [("b", f"tok{i}") for i in range(40)]  # small-range branch
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["g"]: r for r in sketch.grouped_hll_distinct(
        df, "g", F.col("v")).collect()}
    assert out["a"]["exact_distinct"] == 300
    assert out["b"]["exact_distinct"] == 40
    for r in out.values():  # b=8 -> ~6.5% std error; allow 4 sigma
        assert abs(r["rel_error"]) < 0.30
    # duplicate-invariance (register max): re-unioning the same data
    # changes NOTHING (the mergeability property in sketch form)
    doubled = {r["g"]: r for r in sketch.grouped_hll_distinct(
        df.unionAll(df), "g", F.col("v")).collect()}
    for g in out:
        assert doubled[g]["estimate"] == out[g]["estimate"]


# ---------------------------------------------------------- Theil-Sen


def _ts(day, i=0):
    return datetime.datetime(2024, 1, 1, 6, i % 50) + datetime.timedelta(
        days=day
    )


def test_theil_sen_recovers_clean_slope_and_resists_outlier(spark):
    # group "up": value = 2*day + noiseless duplicates; one wild
    # outlier day that would wreck OLS moves the median slope barely
    rows = []
    for d in range(30):
        for i in range(3):
            rows.append(("up", _ts(d, i), 2.0 * d + 10))
    rows.append(("up", _ts(30), 1e6))  # outlier day
    for d in range(20):
        rows.append(("flat", _ts(d), 7.0))
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r["g"]: r for r in timeseries.theil_sen_trend(
        df, "g", "ts", "v").collect()}
    assert out["flat"]["theil_sen_slope"] == 0.0
    assert abs(out["up"]["theil_sen_slope"] - 2.0) < 0.05
    assert out["up"]["n_days"] == 31
    assert out["up"]["n_pairs"] == 31 * 30 // 2


def test_theil_sen_partitioning_invariant(spark):
    rows = [("g", _ts(d, i), float((d * 13 + i * 7) % 29))
            for d in range(25) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    a = sorted(map(tuple, timeseries.theil_sen_trend(
        df, "g", "ts", "v").collect()))
    b = sorted(map(tuple, timeseries.theil_sen_trend(
        df.repartition(11), "g", "ts", "v").collect()))
    assert a == b


# --------------------------------------------------------- readability


def test_readability_flesch_hand_example(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, "no sentence punctuation here"),
         (3, "!!!")],  # no words -> dropped
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           text_analysis.readability_scores(df).collect()}
    assert set(out) == {1, 2}
    r = out[1]
    assert (r["n_words"], r["n_sentences"]) == (6, 2)
    # vowel groups: e,a,a,e,o,a  -> The(1) cat(1) sat(1) The(1) dog(1) ran(1)
    assert r["n_syllables"] == 6
    assert abs(r["flesch"] - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-12
    assert out[2]["n_sentences"] == 1  # floored


# ----------------------------------------------------------- conformal


def test_split_conformal_coverage_guarantee(spark):
    # symmetric deterministic residuals around a group mean: coverage
    # must land at or above the 0.9 target up to quantization
    rows = [(i, "g", 100.0 + ((i * 37) % 21) - 10) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, g string, y double")
    out = evaluation.split_conformal_interval(df, "g", "y", "k").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_calib"] + r["n_test"] == 2000
    assert 0 < r["qhat"] <= 10.0
    assert r["coverage"] >= 0.85  # finite-sample guarantee ~>= target
    assert r["target"] == 0.9


def test_split_conformal_qhat_is_calibration_order_statistic(spark):
    rows = [(i, "g", float(i % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, y double")
    r = evaluation.split_conformal_interval(df, "g", "y", "k").collect()[0]
    # replay: same hash split, same mean, k-th smallest |resid|
    from occupation_wage_etl_spark.operators.splits import hash_bucket

    cal = df.withColumn("__b", hash_bucket(F.col("k"))).filter(
        F.col("__b") < 50
    )
    mu_rows = cal.agg(
        (F.sum(F.col("y").cast("decimal(18,2)")).cast("string")
         .cast("double") / F.count(F.lit(1))).alias("mu")
    ).collect()
    mu = mu_rows[0]["mu"]
    resids = sorted(abs(x["y"] - mu) for x in cal.collect())
    n = len(resids)
    k = min(-(-((n + 1) * 9) // 10), n)
    assert r["n_calib"] == n
    assert r["qhat"] == resids[k - 1]


# ----------------------------------------------------- BH-FDR / chi2 GoF


def test_chi2_gof_uniform_slice_scores_high_p(spark):
    from occupation_wage_etl_spark.operators import hypothesis

    # five slices mirror the pooled distribution -> chi2 ~ 0, p high;
    # one SMALL slice concentrated in a single hash bucket -> tiny p
    # (small so it barely moves the pooled expectation)
    rows = [(f"same{s}", f"c{i % 9}") for s in range(5) for i in range(900)]
    rows += [("skew", "c0")] * 90
    df = spark.createDataFrame(rows, "t string, c string")
    out = {r["t"]: r for r in hypothesis.chi2_gof_even_dof_pvalues(
        df, "t", "c", 3).collect()}
    assert out["skew"]["p_value"] < 1e-6
    assert out["same0"]["p_value"] > 0.01
    assert out["same0"]["n_rows"] == 900
    # dof-2 closed form: p == round(exp(-chi2/2), 12)
    import math

    for r in out.values():
        assert r["p_value"] == round(math.exp(-r["chi2"] / 2.0), 12)


def test_bh_fdr_step_up_hand_example(spark):
    from occupation_wage_etl_spark.operators import hypothesis

    # classic BH at alpha=0.05, m=5: thresholds k/100 = .01,.02,.03,...
    ps = [("t1", 0.005), ("t2", 0.015), ("t3", 0.035), ("t4", 0.2),
          ("t5", 0.9)]
    # k=1: .005<=.01 T; k=2: .015<=.02 T; k=3: .035>.03 F; k*=2 ->
    # reject t1,t2 only
    df = spark.createDataFrame(ps, "t string, p double")
    out = {r["t"]: r for r in hypothesis.bh_fdr(
        df, "t", "p", 1, 20).collect()}
    assert [out[t]["rejected"] for t in ("t1", "t2", "t3", "t4", "t5")] == [
        True, True, False, False, False]
    assert out["t3"]["bh_rank"] == 3


def test_bh_fdr_no_rejections_and_all_rejections(spark):
    from occupation_wage_etl_spark.operators import hypothesis

    none = spark.createDataFrame(
        [(f"t{i}", 0.5 + i / 100) for i in range(10)], "t string, p double"
    )
    assert all(not r["rejected"] for r in hypothesis.bh_fdr(
        none, "t", "p").collect())
    allr = spark.createDataFrame(
        [(f"t{i}", 0.0001) for i in range(10)], "t string, p double"
    )
    assert all(r["rejected"] for r in hypothesis.bh_fdr(
        allr, "t", "p").collect())


# ----------------------------------------------------------- Kneser-Ney


def test_kneser_ney_hand_model(spark):
    import math

    from occupation_wage_etl_spark.operators import text_analysis

    # corpus: doc1 "a b a b", doc2 "a c" ->
    # bigrams: d1: (a,b)x2? no — consecutive: (a,b),(b,a),(a,b) ; d2: (a,c)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           text_analysis.kneser_ney_doc_scores(df).collect()}
    assert out[1]["n_bigrams"] == 3 and out[1]["n_bigram_types"] == 2
    assert out[2]["n_bigrams"] == 1
    # model by hand: types {(a,b):2,(b,a):1,(a,c):1}; cv(a)=3 fwd(a)=2;
    # cv(b)=1 fwd(b)=1; bwd(b)=1 bwd(a)=1 bwd(c)=1; nall=3
    D = 0.75
    p_ab = (2 - D) / 3 + D * 2 / 3 * (1 / 3)
    p_ba = (1 - D) / 1 + D * 1 / 1 * (1 / 3)
    p_ac = (1 - D) / 3 + D * 2 / 3 * (1 / 3)
    want1 = -(2 * round(math.log(p_ab), 12)
              + 1 * round(math.log(p_ba), 12)) / 3
    want2 = -round(math.log(p_ac), 12) / 1
    assert abs(out[1]["kn_cross_entropy"] - want1) < 1e-12
    assert abs(out[2]["kn_cross_entropy"] - want2) < 1e-12


def test_kneser_ney_flags_alien_transitions(spark):
    from occupation_wage_etl_spark.operators import text_analysis

    # many docs share the same fluent bigrams; one doc uses the same
    # VOCABULARY in never-seen-elsewhere transitions -> higher CE
    fluent = [(i, "the cat sat on the mat") for i in range(20)]
    salad = [(99, "mat the on sat cat the")]
    df = spark.createDataFrame(fluent + salad, "doc_id long, text string")
    out = {r["doc_id"]: r["kn_cross_entropy"]
           for r in text_analysis.kneser_ney_doc_scores(df).collect()}
    assert out[99] > out[0]


# --------------------------------------------------------- Jaro-Winkler


def test_jaro_winkler_reference_values(spark):
    from occupation_wage_etl_spark.operators.fuzzy_join import _jaro_winkler

    # classic textbook values (Winkler's Census examples)
    assert abs(_jaro_winkler("MARTHA", "MARHTA") - 0.961111111111) < 1e-9
    assert abs(_jaro_winkler("DIXON", "DICKSONX") - 0.813333333333) < 1e-9
    assert abs(_jaro_winkler("DUANE", "DWAYNE") - 0.84) < 1e-9
    assert _jaro_winkler("abc", "abc") == 1.0
    assert _jaro_winkler("abc", "") == 0.0
    assert _jaro_winkler("ab", "ba") == 0.0  # window too small to match
    # boost gated above 0.7: shared prefix but low jaro -> NO boost
    j = _jaro_winkler("prefixaaaa", "prefzzzzzz")
    assert j == 0.6  # plain jaro, boost suppressed


def test_jaro_winkler_pairs_blocked_join(spark):
    from occupation_wage_etl_spark.operators import fuzzy_join

    rows = [
        (1, "martha stone", "B1"),
        (2, "marhta stone", "B1"),   # transposition: high JW
        (3, "zzz unrelated", "B1"),
        (4, "martha stone", "B2"),   # other block: never paired with 1
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    out = fuzzy_join.jaro_winkler_pairs(
        df, "id", "name", ["blk"], threshold=0.8, k=10
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jw"] for r in out}
    assert (1, 2) in got and got[(1, 2)] > 0.95
    assert all(4 not in pair for pair in got)  # blocking respected
    assert all(a < b for a, b in got)  # canonical orientation


# -------------------------------------------- sequential pair support


def test_sequential_pair_support_gap_allowed(spark):
    rows = [
        # user 1: A .. C .. B  (A->B with a gap; transition_matrix
        # would only see A->C and C->B)
        (1, _ts(0), "A"), (1, _ts(1), "C"), (1, _ts(2), "B"),
        # user 2: B then A (reverse order)
        (2, _ts(0), "B"), (2, _ts(1), "A"),
        # user 3: A only
        (3, _ts(0), "A"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, i string")
    out = {(r["item_a"], r["item_b"]): r for r in
           timeseries.sequential_pair_support(df, "u", "ts", "i").collect()}
    assert out[("A", "B")]["support"] == 1
    assert out[("B", "A")]["support"] == 1
    assert out[("A", "C")]["support"] == 1
    assert ("A", "A") not in out
    assert abs(out[("A", "B")]["support_frac"] - 1 / 3) < 1e-12


def test_sequential_pair_strict_precedence(spark):
    # same timestamp -> NOT a sequential pair (strict <)
    rows = [(1, _ts(0), "A"), (1, _ts(0), "B")]
    df = spark.createDataFrame(rows, "u long, ts timestamp, i string")
    out = timeseries.sequential_pair_support(df, "u", "ts", "i").collect()
    assert out == []


# ------------------------------------------------------------ B-cubed


def test_bcubed_perfect_and_textbook(spark):
    ids = list(range(6))
    same = spark.createDataFrame(
        [(i, f"c{i % 2}") for i in ids], "id long, cluster string"
    )
    gold = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in ids], "id long, truth string"
    )
    r = evaluation.bcubed_clustering_eval(same, gold).collect()[0]
    assert (r["bcubed_precision"], r["bcubed_recall"], r["bcubed_f1"]) == (
        1.0, 1.0, 1.0)
    # all-in-one predicted cluster vs 2 gold classes of 3:
    # P(i) = 3/6 for all i -> precision 0.5; R(i) = 1 -> recall 1
    one = spark.createDataFrame([(i, "all") for i in ids],
                                "id long, cluster string")
    r = evaluation.bcubed_clustering_eval(one, gold).collect()[0]
    assert abs(r["bcubed_precision"] - 0.5) < 1e-9
    assert r["bcubed_recall"] == 1.0
    # singletons predicted: precision 1, recall 1/3
    singles = spark.createDataFrame([(i, f"s{i}") for i in ids],
                                    "id long, cluster string")
    r = evaluation.bcubed_clustering_eval(singles, gold).collect()[0]
    assert r["bcubed_precision"] == 1.0
    assert abs(r["bcubed_recall"] - 1 / 3) < 1e-9


# ----------------------------------------------------- stratified ATE


def test_stratified_ate_hand_computation(spark):
    # stratum X: treated mean 10, control mean 4 -> effect 6 (4 rows)
    # stratum Y: treated mean 3, control mean 1 -> effect 2 (4 rows)
    # ATE = .5*6 + .5*2 = 4; a one-armed stratum Z must be excluded
    rows = [
        ("X", True, 12.0), ("X", True, 8.0), ("X", False, 4.0),
        ("X", False, 4.0),
        ("Y", True, 3.0), ("Y", True, 3.0), ("Y", False, 1.0),
        ("Y", False, 1.0),
        ("Z", True, 99.0), ("Z", True, 99.0),
    ]
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    r = evaluation.stratified_ate(df, F.col("t"), "y", "s").collect()[0]
    assert r["n_strata"] == 2
    assert r["n_treated"] == 4 and r["n_control"] == 4
    assert abs(r["ate"] - 4.0) < 1e-9


def test_stratified_ate_confounding_correction(spark):
    # classic Simpson setup: naive diff is NEGATIVE, stratified ATE
    # positive — the whole point of adjustment
    rows = []
    # stratum A (cheap orders): mostly treated, effect +1 (ctl 1 -> trt 2)
    rows += [("A", True, 2.0)] * 90 + [("A", False, 1.0)] * 10
    # stratum B (expensive): mostly control, effect +1 (ctl 10 -> trt 11)
    rows += [("B", True, 11.0)] * 10 + [("B", False, 10.0)] * 90
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    naive_rows = df.groupBy("t").agg(F.avg("y").alias("m")).collect()
    naive = {r["t"]: r["m"] for r in naive_rows}
    assert naive[True] - naive[False] < 0  # Simpson reversal
    r = evaluation.stratified_ate(df, F.col("t"), "y", "s").collect()[0]
    assert abs(r["ate"] - 1.0) < 1e-9


# --------------------------------------------------------- Wasserstein


def test_wasserstein_1d_shifted_uniform(spark):
    from occupation_wage_etl_spark.operators import hypothesis

    # identical shapes shifted by +5 -> W1 exactly 5; same dist -> 0
    rows = [("a", float(i % 10)) for i in range(500)]
    rows += [("b", float(i % 10) + 5.0) for i in range(500)]
    rows += [("c", float(i % 10)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = hypothesis.wasserstein_1d(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (500, 500)
    assert abs(r["wasserstein"] - 5.0) < 1e-9
    z = hypothesis.wasserstein_1d(df, "v", "g", "a", "c").collect()[0]
    assert z["wasserstein"] == 0.0  # unequal sizes, same distribution


def test_wasserstein_1d_hand_value_and_partitioning(spark):
    from occupation_wage_etl_spark.operators import hypothesis

    # a = {0, 1}, b = {1}: F_a-F_b differs by 1/2 on [0, 1) -> W1 = 0.5
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 1.0), ("b", 1.0)], "g string, v double"
    )
    r = hypothesis.wasserstein_1d(df, "v", "g", "a", "b").collect()[0]
    assert abs(r["wasserstein"] - 0.5) < 1e-12
    big = spark.createDataFrame(
        [("a", float((i * 37) % 101)) for i in range(400)]
        + [("b", float((i * 53) % 97)) for i in range(300)],
        "g string, v double",
    )
    one = hypothesis.wasserstein_1d(big, "v", "g", "a", "b").collect()
    many = hypothesis.wasserstein_1d(
        big.repartition(17), "v", "g", "a", "b"
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


# ------------------------------------------------ LOGO OLS sensitivity


def test_logo_ols_matches_literal_refits(spark):
    from occupation_wage_etl_spark.operators import stats

    rows = []
    for i in range(120):
        g = f"g{i % 3}"
        x1, x2 = float(i % 13), float((i * 7) % 5)
        noise = ((i * 31) % 11 - 5) / 10.0
        bias = {"g0": 0.0, "g1": 4.0, "g2": -2.0}[g]
        rows.append((g, 2.0 + 3.0 * x1 - 1.5 * x2 + bias + noise, x1, x2))
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    out = {r["g"]: r for r in stats.logo_ols_sensitivity(
        df, "y", ["x1", "x2"], "g").collect()}
    for g in ("g0", "g1", "g2"):
        lit_fit = stats.multi_ols(
            df.filter(F.col("g") != g), "y", ["x1", "x2"]
        ).collect()[0]
        assert out[g]["n_rows_loo"] == lit_fit["n_rows"]
        # bit-equal to literally refitting without the group
        assert out[g]["b1_loo"] == lit_fit["b1"]
        assert out[g]["b2_loo"] == lit_fit["b2"]


def test_logo_ols_flags_load_bearing_group(spark):
    from occupation_wage_etl_spark.operators import stats

    rows = []
    for i in range(200):  # bulk: y = x1 exactly
        rows.append(("bulk", float(i % 17), float(i % 17), float(i % 3)))
    for i in range(40):   # skew group pulls the slope away
        rows.append(("skew", 100.0, float(i % 17), float(i % 3)))
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    out = {r["g"]: r for r in stats.logo_ols_sensitivity(
        df, "y", ["x1", "x2"], "g").collect()}
    # dropping the skew group restores the clean slope exactly
    assert abs(out["skew"]["b1_loo"] - 1.0) < 1e-9
    assert abs(out["skew"]["delta_b1"]) > abs(out["bulk"]["delta_b1"])


# -------------------------------------------------- forecast backtest


def test_forecast_backtest_perfect_weekly_pattern(spark):
    from occupation_wage_etl_spark.operators import timeseries as T2

    # pure period-7 series: seasonal-naive error 0 -> MASE 0, sMAPE 0
    rows = [("a", _ts(d), float([5, 9, 4, 8, 2, 7, 6][d % 7]))
            for d in range(35)]
    # noisy non-seasonal series: MASE near 1 (naive ~ seasonal)
    rows += [("b", _ts(d), float((d * 37) % 23)) for d in range(35)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r["g"]: r for r in T2.forecast_backtest(
        df, "g", "ts", "v").collect()}
    assert out["a"]["n_scored"] == 28
    assert out["a"]["mae_seasonal"] == 0.0
    assert out["a"]["mase"] == 0.0 and out["a"]["smape"] == 0.0
    assert out["a"]["mae_naive"] > 0
    assert out["b"]["mae_seasonal"] > 0
    assert out["b"]["mase"] > 0.5  # no seasonal structure to exploit


def test_forecast_backtest_daily_totals_and_short_series(spark):
    from occupation_wage_etl_spark.operators import timeseries as T2

    # multiple rows per day fold into the daily total BEFORE scoring;
    # series shorter than the season produce no scored rows
    rows = [("a", _ts(d, i), 1.0) for d in range(10) for i in range(3)]
    rows += [("tiny", _ts(d), float(d)) for d in range(5)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r["g"]: r for r in T2.forecast_backtest(
        df, "g", "ts", "v").collect()}
    assert "tiny" not in out  # < 8 observed days -> unscored
    assert out["a"]["n_scored"] == 3  # days 7..9
    assert out["a"]["mae_seasonal"] == 0.0  # constant daily total 3.0
    assert out["a"]["mase"] is None  # no naive scale on a constant series
    assert out["a"]["smape"] == 0.0


# ---------------------------------------------------- cross-correlation


def test_cross_correlation_detects_known_lead(spark):
    from occupation_wage_etl_spark.operators import timeseries as T2

    # b follows a with a 2-day lag exactly: corr at lag +2 is 1.0
    vals = [float(v) for v in (5, 9, 2, 8, 1, 7, 3, 6, 4, 8, 2, 9,
                               1, 5, 7, 3, 8, 2, 6, 4)]
    rows = [("a", _ts(d), vals[d]) for d in range(20)]
    rows += [("b", _ts(d + 2), vals[d]) for d in range(20)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r["lag"]: r for r in T2.cross_correlation(
        df, "a", "b", "g", "ts", "v", max_lag=4).collect()}
    assert abs(out[2]["corr"] - 1.0) < 1e-12
    assert all(abs(out[k]["corr"]) < 0.99 for k in out if k != 2)
    assert out[2]["n_days"] == 20


def test_cross_correlation_guards_degenerate_variance(spark):
    from occupation_wage_etl_spark.operators import timeseries as T2

    rows = [("a", _ts(d), 5.0) for d in range(10)]  # constant series
    rows += [("b", _ts(d), float(d)) for d in range(10)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = T2.cross_correlation(df, "a", "b", "g", "ts", "v", 2).collect()
    assert out and all(r["corr"] is None for r in out)  # no variance in a


def test_wasserstein_1d_absent_group_yields_null(spark):
    from occupation_wage_etl_spark.operators import hypothesis

    # a group with no rows makes the n_a*n_b denominator 0: the result
    # must be an explicit NULL (undefined distance), not IEEE NaN/Inf
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(5)], "g string, v double"
    )
    r = hypothesis.wasserstein_1d(df, "v", "g", "a", "b").collect()
    assert len(r) == 1
    assert r[0]["n_b"] == 0
    assert r[0]["wasserstein"] is None


def test_repeated_tile_spans(spark):
    from occupation_wage_etl_spark.operators import dedup

    # 16-char tiles; docs share a 3-tile (48-char) middle at different
    # aligned offsets, plus doc 3 shares nothing
    t = {
        "u1": "aaaabbbbccccdddd",
        "u2": "eeeeffffgggghhhh",
        "u3": "iiiijjjjkkkkllll",
        "s0": "mmmmnnnnoooopppp",
        "s1": "qqqqrrrrsssstttt",
        "s2": "uuuuvvvvwwwwxxxx",
        "u4": "yyyyzzzzyyyyzzzz",
    }
    rows = [
        (1, t["u1"] + t["s0"] + t["s1"] + t["s2"]),
        (2, t["u2"] + t["u3"] + t["s0"] + t["s1"] + t["s2"] + t["u4"]),
        (3, "0000111122223333" * 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.repeated_tile_spans(df, min_tiles=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.n_tiles == 3 and r.span_chars == 48
    assert r.a_start == 16 and r.b_start == 32
    # min_tiles gate: a single shared tile is not a span
    rows2 = [(1, t["u1"] + t["s0"]), (2, t["u2"] + t["s0"])]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    assert dedup.repeated_tile_spans(df2, min_tiles=2).count() == 0
    assert dedup.repeated_tile_spans(df2, min_tiles=1).count() == 1
    # two DISJOINT shared runs stay two spans (different diagonals)
    rows3 = [
        (1, t["s0"] + t["s1"] + t["u1"] + t["s2"] + t["u3"]),
        (2, t["s0"] + t["s1"] + t["u2"] + t["u4"] + t["s2"] + t["u3"]),
    ]
    df3 = spark.createDataFrame(rows3, "doc_id long, text string")
    got3 = sorted(
        dedup.repeated_tile_spans(df3, min_tiles=2).collect(),
        key=lambda r: r.a_start,
    )
    assert [(r.a_start, r.b_start, r.n_tiles) for r in got3] == [
        (0, 0, 2), (48, 64, 2),
    ]


def test_cut_longest_repeated_span(spark):
    from occupation_wage_etl_spark.operators import dedup
    import hashlib

    u1 = "aaaabbbbccccdddd"; u2 = "eeeeffffgggghhhh"
    s0 = "mmmmnnnnoooopppp"; s1 = "qqqqrrrrsssstttt"; s2 = "uuuuvvvvwwwwxxxx"
    rows = [
        (1, u1 + s0 + s1 + s2),            # canonical (min id) — kept
        (2, u2 + s0 + s1 + s2 + u1[:16]),  # higher id — span cut
        (3, "0000111122223333"),           # no spans
    ]
    # doc 2 also shares u1 with doc 1? u1 appears as tile 0 of doc1 and
    # tile 4 of doc2 -> a 1-tile run, below min_tiles=2 -> not a span
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dedup.repeated_tile_spans(df, min_tiles=2)
    got = {
        r.doc_id: r
        for r in dedup.cut_longest_repeated_span(df, spans).collect()
    }
    assert got[1].cut_chars == 0 and got[1].n_after == 64
    assert got[2].cut_chars == 48
    assert got[2].n_before == 80 and got[2].n_after == 32
    expected2 = u2 + u1  # s0..s2 removed from offset 16
    assert got[2].new_text_md5 == hashlib.md5(
        expected2.encode()
    ).hexdigest()
    assert got[3].cut_chars == 0
    assert got[3].new_text_md5 == hashlib.md5(
        rows[2][1].encode()
    ).hexdigest()


def test_span_dedup_passes_fixed_point(spark):
    """Two bounded find→cut rounds: pass 1 removes each doc's longest
    repeated span, pass 2 catches the shadowed next-longest; the
    min-id copy of every span stays canonical and a third pass would
    be a no-op on this plant (fixed point reached)."""
    import hashlib

    from occupation_wage_etl_spark.operators import dedup

    def t(seed, n=1):
        return "".join(
            hashlib.md5(f"{seed}{j}".encode()).hexdigest()[:16]
            for j in range(n)
        )

    docs = [
        (d, t(f"{d}p", 1 + d % 3) + t("gxm", 3) + t(f"{d}u", 1)
            + t("hym", 2) + t(f"{d}s", 1))
        for d in range(4)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_before, r.n_after, r.cut_chars_total, r.n_cuts)
        for r in dedup.span_dedup_passes(df, passes=2).collect()
    }
    # doc 0 is min of both groups: untouched
    for d in range(4):
        n0 = 16 * (8 + d % 3)
        want = (n0, n0, 0, 0) if d == 0 else (n0, n0 - 80, 80, 2)
        assert got[d] == want, (d, got[d])
    # a third pass changes nothing (fixed point)
    got3 = {
        r.doc_id: (r.cut_chars_total, r.n_cuts)
        for r in dedup.span_dedup_passes(df, passes=3).collect()
    }
    assert got3 == {0: (0, 0), 1: (80, 2), 2: (80, 2), 3: (80, 2)}
    # passes=0 is the identity audit
    got0 = dedup.span_dedup_passes(df, passes=0).collect()
    assert all(r.n_cuts == 0 and r.n_before == r.n_after for r in got0)
