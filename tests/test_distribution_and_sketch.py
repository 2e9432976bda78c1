"""Tests for the round-4 distribution/evaluation additions: average
precision, confusion matrix, Cohen's kappa (operators/evaluation.py),
Gini / Chao1 / Zipf (operators/profile.py, text_analysis.py), and the
oracle-replayable HLL / Count-Min sketches (operators/sketch.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import (
    evaluation,
    profile,
    sketch,
    text_analysis,
)


# ------------------------------------------------------------------- AP

def test_average_precision_hand_computed(spark):
    # thresholds desc: s=3 -> tp=1 fp=0 term=(1/2)(1/1); s=2 -> tp=2
    # fp=1 dTP=1 term=(1/2)(2/3); s=1 -> dTP=0.  AP = 1/2 + 1/3 = 5/6
    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)], "s double, y int"
    )
    r = evaluation.average_precision(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert abs(r["ap"] - 5.0 / 6.0) < 2e-12  # fixed-point floor quantization


def test_average_precision_perfect_and_rare_positive(spark):
    n, p = 10_000, 10
    df = spark.range(n).select(
        F.col("id").cast("double").alias("s"),
        F.when(F.col("id") >= n - p, 1).otherwise(0).alias("y"),
    )
    r = evaluation.average_precision(df, "s", "y").collect()[0]
    assert abs(r["ap"] - 1.0) < 1e-9  # perfect ranking -> AP 1
    # reversed ranking of a rare positive: AP collapses (the property
    # that distinguishes it from AUC)
    rev = df.select((-F.col("s")).alias("s"), "y")
    r2 = evaluation.average_precision(rev, "s", "y").collect()[0]
    assert r2["ap"] < 0.01


def test_average_precision_no_positives_is_null(spark):
    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], "s double, y int")
    assert evaluation.average_precision(df, "s", "y").collect()[0]["ap"] is None


# ------------------------------------------------------------ confusion

def test_confusion_at_threshold_degenerate_nulls(spark):
    df = spark.createDataFrame([(1.0, 0), (0.0, 0)], "s double, y int")
    r = evaluation.confusion_at_threshold(df, "s", "y", 0.5).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 1, 0, 1)
    assert r["recall"] is None  # no positives
    assert r["accuracy"] == 0.5


# ---------------------------------------------------------------- kappa

def test_cohens_kappa_perfect_and_chance(spark):
    same = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("a", "a")], "ra string, rb string"
    )
    assert evaluation.cohens_kappa(same, "ra", "rb").collect()[0]["kappa"] == 1.0
    # statistically independent raters with matching marginals: the
    # 2x2 balanced case n=4, agree=2, e=8 -> kappa = (8-8)/(16-8) = 0
    indep = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")],
        "ra string, rb string",
    )
    assert evaluation.cohens_kappa(indep, "ra", "rb").collect()[0]["kappa"] == 0.0


# ----------------------------------------------------------------- gini

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gini_uniform_zero_and_hand_value(spark):
    # every type occurs exactly twice -> perfect equality -> gini 0
    uniform = _docs(spark, ["aa bb cc", "aa bb cc"])
    r = profile.gini_token_frequencies(uniform, "text").collect()[0]
    assert (r["n_types"], r["n_tokens"], r["gini"]) == (3, 6, 0.0)
    # frequencies [1, 3]: 2S = 1*1*(0+1+1) + 3*1*(2+1+1) = 2+12 = 14
    # gini = (14 - 3*4) / (2*4) = 2/8 = 0.25
    skewed = _docs(spark, ["xx yy yy yy"])
    r2 = profile.gini_token_frequencies(skewed, "text").collect()[0]
    assert (r2["n_types"], r2["n_tokens"], r2["gini"]) == (2, 4, 0.25)


def test_chao1_hand_value(spark):
    # freqs: a->1, b->1, c->2, d->3: D=4 f1=2 f2=1
    # chao1 = 4 + 2*1/(2*2) = 4.5
    docs = _docs(spark, ["a b c c d d d"])
    r = profile.chao1_vocab_richness(docs, "text").collect()[0]
    assert (r["n_types"], r["f1"], r["f2"], r["chao1"]) == (4, 2, 1, 4.5)


# ----------------------------------------------------------------- zipf

def test_zipf_fit_recovers_exact_power_law(spark):
    # corpus whose rank-frequency is exactly f = 720/r at ranks 1..6:
    # every (ln r, ln f) point lies ON the line y = ln 720 - 1*x
    freqs = {f"w{r}": 720 // r for r in range(1, 7)}
    text = " ".join(" ".join([w] * f) for w, f in freqs.items())
    docs = _docs(spark, [text])
    r = text_analysis.zipf_fit(docs, "text", top_k=100).collect()[0]
    assert r["n_ranks"] == 6
    assert abs(r["slope"] - (-1.0)) < 1e-9
    assert abs(r["intercept"] - math.log(720.0)) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-12


# ------------------------------------------------------------------ hll

def test_hll_small_range_correction_is_tight(spark):
    df = spark.range(40).select(F.col("id").cast("string").alias("v"))
    r = sketch.hll_distinct(df, F.col("v")).collect()[0]
    assert r["n_empty_registers"] > 0
    assert abs(r["estimate"] - 40) / 40 < 0.15


def test_hll_error_within_sketch_bounds(spark):
    n = 50_000
    df = spark.range(n).select(F.col("v").alias("v") if False else F.col("id").cast("string").alias("v"))
    r = sketch.hll_distinct(df, F.col("v")).collect()[0]
    # m=256 -> standard error ~6.5%; allow 4 sigma
    assert abs(r["estimate"] - n) / n < 0.26
    # duplicates must not move the registers at all
    dup = df.union(df)
    r2 = sketch.hll_distinct(dup, F.col("v")).collect()[0]
    assert r2["estimate"] == r["estimate"]


# ------------------------------------------------------------------ cms

def test_cms_estimates_upper_bound_and_order(spark):
    rows = (
        [("alpha",)] * 100 + [("beta",)] * 60 + [("gamma",)] * 30
        + [(f"noise{i}",) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "v string")
    out = sketch.cms_heavy_hitters(df, F.col("v"), k=3).collect()
    assert [r["value"] for r in out] == ["alpha", "beta", "gamma"]
    for r in out:
        assert r["cms_estimate"] >= r["true_count"]  # CM never undercounts
        # depth-4 min over 1024-wide rows: collisions with 500 singleton
        # noise tokens should stay tiny
        assert r["cms_estimate"] <= r["true_count"] + 10


# --------------------------------------------- curation II / BPE encode

def test_unigram_cross_entropy_uniform_corpus(spark):
    from occupation_wage_etl_spark.operators import curation

    # 4 equally frequent types -> every doc's CE = ln 4 regardless of mix
    docs = _docs(spark, ["a b", "c d", "a b c d"])
    out = {
        r["doc_id"]: r
        for r in curation.unigram_cross_entropy(docs, "text").collect()
    }
    for r in out.values():
        assert abs(r["cross_entropy"] - math.log(4.0)) < 1e-9
    assert out[2]["n_tokens"] == 4 and out[2]["n_types"] == 4


def test_unigram_cross_entropy_flags_divergent_doc(spark):
    from occupation_wage_etl_spark.operators import curation

    common = ["the quick brown fox jumps over the lazy dog again"] * 20
    weird = ["zxqv wvzk qqzz xkcd zzzz zxqv wvzk qqzz xkcd zzzz"]
    docs = _docs(spark, common + weird)
    rows = curation.unigram_cross_entropy(docs, "text").collect()
    weird_ce = [r for r in rows if r["doc_id"] == 20][0]["cross_entropy"]
    normal_ce = [r for r in rows if r["doc_id"] == 0][0]["cross_entropy"]
    assert weird_ce > normal_ce + 1.0  # rare-type doc scores clearly higher


def test_ngram_repetition_ratio_detects_loops(spark):
    from occupation_wage_etl_spark.operators import curation

    looped = " ".join(["spam ham eggs"] * 10)          # trigram loop
    prose = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [looped, prose])
    out = {
        r["doc_id"]: r
        for r in curation.ngram_repetition_ratio(docs, "text", n=3).collect()
    }
    assert out[0]["top_ngram"] == "spam ham eggs"
    assert out[0]["repetition_ratio"] > 0.3
    assert out[1]["top_count"] == 1
    assert abs(out[1]["repetition_ratio"] - 1.0 / out[1]["n_ngrams"]) < 1e-15


def test_bpe_token_counts_matches_hand_merge(spark):
    from occupation_wage_etl_spark.operators import vocab

    # corpus "aaab aaab ab" (q144's fixture): after 4 rounds the merges
    # are (a,a)->aa, (aa,a)->aaa? -- assert against a direct recompute:
    # encode must be consistent with bpe_merges' learned sequence
    docs = _docs(spark, ["aaab aaab ab"])
    merges = [
        (r["merge_left"], r["merge_right"])
        for r in vocab.bpe_merges(docs, rounds=4).collect()
    ]

    def apply_merges(word):
        syms = list(word)
        for l, r in merges:
            out, prev = [], ""
            for x in syms:
                if prev == l and x == r:
                    out.append(l + r)
                    prev = ""
                elif prev == "":
                    prev = x
                else:
                    out.append(prev)
                    prev = x
            if prev:
                out.append(prev)
            syms = out
        return syms

    expected = {}
    for word, freq in (("aaab", 2), ("ab", 1)):
        for s in apply_merges(word):
            n, c = expected.get(s, (0, 0))
            expected[s] = (n + 1, c + freq)
    got = {
        r["token"]: (r["n_positions"], r["token_count"])
        for r in vocab.bpe_token_counts(docs, rounds=4).collect()
    }
    assert got == expected


# --------------------------------------------- brier / ece / spearman

def test_brier_score_hand_value_and_decimal_exactness(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (0.1, 0), (0.8, 1), (0.3, 0)], "s double, y int"
    )
    r = evaluation.brier_score(df, "s", "y").collect()[0]
    assert (r["n_rows"], r["brier"]) == (4, 0.0375)  # exact, not approx
    # perfect forecaster -> 0
    perfect = spark.createDataFrame([(1.0, 1), (0.0, 0)], "s double, y int")
    assert evaluation.brier_score(perfect, "s", "y").collect()[0]["brier"] == 0.0


def test_expected_calibration_error_hand_value(spark):
    df = spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(
            [(0.1, 0), (0.3, 0), (0.8, 1), (0.9, 1)]
        )],
        "id long, s double, y int",
    )
    r = evaluation.expected_calibration_error(df, "s", "y", "id", bins=2)
    row = r.collect()[0]
    # bin0 {0.1,0.3}: |0 - 0.2| * 2; bin1 {0.8,0.9}: |1 - 0.85| * 2
    assert row["bins"] == 2 and row["n_rows"] == 4
    assert abs(row["ece"] - (0.4 + 0.3) / 4) < 1e-15


def test_spearman_monotone_ties_and_constant(spark):
    mono = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 25.0)], "x double, y double"
    )
    assert abs(
        evaluation.spearman_corr(mono, "x", "y").collect()[0]["rho"] - 1.0
    ) < 1e-12
    rev = spark.createDataFrame(
        [(1.0, 30.0), (2.0, 20.0), (3.0, 10.0)], "x double, y double"
    )
    assert abs(
        evaluation.spearman_corr(rev, "x", "y").collect()[0]["rho"] + 1.0
    ) < 1e-12
    # tie-heavy independence: x {1,1,2,2}, y {5,7,6,6} -> rho exactly 0
    ties = spark.createDataFrame(
        [(1.0, 5.0), (1.0, 7.0), (2.0, 6.0), (2.0, 6.0)], "x double, y double"
    )
    assert evaluation.spearman_corr(ties, "x", "y").collect()[0]["rho"] == 0.0
    # constant side -> NULL
    const = spark.createDataFrame(
        [(1.0, 5.0), (1.0, 6.0)], "x double, y double"
    )
    assert evaluation.spearman_corr(const, "x", "y").collect()[0]["rho"] is None


def test_spearman_matches_scipy_formula_on_distinct_ranks(spark):
    # no ties -> rho = 1 - 6*sum(d^2)/(n(n^2-1)); check on a permutation
    perm = [3, 1, 4, 0, 2]
    df = spark.createDataFrame(
        [(float(i), float(perm[i])) for i in range(5)], "x double, y double"
    )
    n = 5
    d2 = sum((i - perm[i]) ** 2 for i in range(n))
    expected = 1 - 6 * d2 / (n * (n * n - 1))
    got = evaluation.spearman_corr(df, "x", "y").collect()[0]["rho"]
    assert abs(got - expected) < 1e-12
