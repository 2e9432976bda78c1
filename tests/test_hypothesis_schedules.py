"""Tests for the hypothesis-test operators (operators/hypothesis.py —
q167-q170), ACF (timeseries.acf — q171), graph link prediction /
label propagation (graph.adamic_adar, graph.label_propagation —
q172-q173), retrieval + agreement metrics (evaluation.mrr_recall_at_k,
fleiss_kappa, mcnemar — q174-q176), and training schedules
(splits.epoch_shuffle_batches, curriculum_interleave — q177-q178)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import (
    evaluation,
    graph,
    hypothesis,
    splits,
    timeseries,
)


# ------------------------------------------------------------------ KS

def test_ks_identical_distributions_zero(spark):
    rows = [(float(i % 10), g) for i in range(100) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    out = hypothesis.ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert (out["n_a"], out["n_b"], out["ks_stat"]) == (100, 100, 0.0)


def test_ks_disjoint_distributions_one(spark):
    rows = [(float(i), "a") for i in range(10)] + [
        (float(i + 100), "b") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    assert (
        hypothesis.ks_two_sample(df, "v", "g", "a", "b").collect()[0][
            "ks_stat"
        ]
        == 1.0
    )


def test_ks_hand_computed(spark):
    # a = {1,2}, b = {2,3}: CDFs at 1: (0.5, 0), at 2: (1, 0.5),
    # at 3: (1, 1) -> D = 0.5
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b")],
        "v double, g string",
    )
    assert (
        hypothesis.ks_two_sample(df, "v", "g", "a", "b").collect()[0][
            "ks_stat"
        ]
        == 0.5
    )


# ------------------------------------------------------- chi-square

def test_chi_square_independent_is_zero(spark):
    # perfectly proportional table -> chi2 == 0, V == 0
    rows = []
    for r, nr in (("x", 2), ("y", 4)):
        for c, nc in (("u", 3), ("v", 6)):
            rows += [(r, c)] * (nr * nc)
    df = spark.createDataFrame(rows, "r string, c string")
    out = hypothesis.chi_square_independence(df, "r", "c").collect()[0]
    assert out["chi2"] == 0.0 and out["cramers_v"] == 0.0
    assert out["dof"] == 1


def test_chi_square_hand_computed(spark):
    # 2x2 table [[10, 20], [30, 40]]: chi2 = n(ad-bc)^2/(r1 r2 c1 c2)
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 30 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = hypothesis.chi_square_independence(df, "r", "c").collect()[0]
    expect = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert abs(out["chi2"] - expect) < 1e-9
    assert abs(out["cramers_v"] - math.sqrt(expect / 100)) < 1e-9


# ----------------------------------------------------------- Welch t

def test_welch_t_equal_groups_zero(spark):
    rows = [(v, g) for v in (1.0, 2.0, 3.0) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    out = hypothesis.welch_t_test(df, "v", "g", "a", "b").collect()[0]
    assert out["t_stat"] == 0.0 and out["mean_a"] == out["mean_b"] == 2.0


def test_welch_t_hand_computed(spark):
    a, b = [1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [(v, "a") for v in a] + [(v, "b") for v in b], "v double, g string"
    )
    out = hypothesis.welch_t_test(df, "v", "g", "a", "b").collect()[0]
    ma, mb = sum(a) / 4, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 3
    vb = sum((x - mb) ** 2 for x in b) / 2
    t = (ma - mb) / math.sqrt(va / 4 + vb / 3)
    wdf = (va / 4 + vb / 3) ** 2 / (
        (va / 4) ** 2 / 3 + (vb / 3) ** 2 / 2
    )
    assert abs(out["t_stat"] - t) < 1e-12
    assert abs(out["welch_df"] - wdf) < 1e-12


# ----------------------------------------------------- Kruskal-Wallis

def test_kruskal_wallis_identical_groups_zero(spark):
    rows = [(float(v), g) for v in range(1, 5) for g in ("a", "b", "c")]
    df = spark.createDataFrame(rows, "v double, g string")
    out = hypothesis.kruskal_wallis(df, "v", "g").collect()[0]
    # identical per-group rank sums -> H == 0 (up to the float fold)
    assert abs(out["h_stat"]) < 1e-9
    assert out["n_groups"] == 3


def test_kruskal_wallis_hand_computed_no_ties(spark):
    # groups a={1,2}, b={3,4}: ranks 1..4; Ra=3, Rb=7
    # H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 0.6*29/... compute directly
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")],
        "v double, g string",
    )
    out = hypothesis.kruskal_wallis(df, "v", "g").collect()[0]
    h = 12.0 / (4 * 5) * (3**2 / 2 + 7**2 / 2) - 3 * 5
    assert abs(out["h_stat"] - h) < 1e-9
    assert out["tie_correction"] == 1.0
    assert abs(out["h_adjusted"] - h) < 1e-9


# ---------------------------------------------------------------- ACF

def test_acf_constant_series_null_and_alternating(spark):
    rows = [("c", i, 5) for i in range(10)] + [
        ("alt", i, 1 if i % 2 == 0 else 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, t int, x int")
    out = {
        (r["g"], r["lag"]): r["acf"]
        for r in timeseries.acf(df, "g", "t", "x", max_lag=2).collect()
    }
    # constant series: zero variance -> NULL acf
    assert out[("c", 1)] is None
    # alternating 1,0,...: lag-1 strongly negative, lag-2 positive
    assert out[("alt", 1)] <= -0.9
    assert out[("alt", 2)] > 0.7


def test_acf_matches_numpy_definition(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "g string, t int, x int"
    )
    out = {
        r["lag"]: r["acf"]
        for r in timeseries.acf(df, "g", "t", "x", max_lag=3).collect()
    }
    n, m = len(xs), sum(xs) / len(xs)
    den = sum((x - m) ** 2 for x in xs)
    for k in (1, 2, 3):
        num = sum(
            (xs[t] - m) * (xs[t + k] - m) for t in range(n - k)
        )
        assert abs(out[k] - num / den) < 1e-12


# --------------------------------------------------------- Adamic-Adar

def test_adamic_adar_square_graph(spark):
    # square 1-2-3-4-1: non-adjacent diagonals (1,3) and (2,4), each
    # with two common neighbors of degree 2 -> AA = 2/ln(2)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "id_a int, id_b int"
    )
    out = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["aa_score"])
        for r in graph.adamic_adar(edges).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    expect = round(2 / math.log(2), 6)
    assert out[(1, 3)] == (2, expect) and out[(2, 4)] == (2, expect)


def test_adamic_adar_excludes_adjacent_and_caps_hubs(spark):
    # star: hub 0 connected to 1..5; all leaf pairs share only the hub.
    # with max_degree >= 5 every leaf pair scores 1/ln(5); with
    # max_degree < 5 the hub is dropped and NO pairs remain.
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a int, id_b int"
    )
    full = graph.adamic_adar(edges, max_degree=10).collect()
    assert len(full) == 10  # C(5,2) leaf pairs
    assert all(r["aa_score"] == round(1 / math.log(5), 6) for r in full)
    assert graph.adamic_adar(edges, max_degree=4).count() == 0


def test_adamic_adar_canonicalizes_messy_edges(spark):
    # the same square graph, but with reversed duplicates and a
    # self-loop: defensive canonicalization must make the output
    # identical to the clean edge list (no adjacent pair reported as a
    # predicted link, no double-counted wedges)
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (1, 4), (2, 2)],
        "id_a int, id_b int",
    )
    out = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["aa_score"])
        for r in graph.adamic_adar(messy).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    expect = round(2 / math.log(2), 6)
    assert out[(1, 3)] == (2, expect) and out[(2, 4)] == (2, expect)


# --------------------------------------------------- label propagation

def test_label_propagation_path_graph(spark):
    # path 1-2-3-4-5, seed 1 -> label 7: one round labels node 2,
    # two rounds reach 3, three reach 4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a int, id_b int"
    )
    nodes = spark.createDataFrame(
        [(i, 7 if i == 1 else None) for i in range(1, 6)],
        "node int, seed_label int",
    )
    for rounds, expect_nodes in ((1, {1, 2}), (3, {1, 2, 3, 4})):
        got = {
            r["node"]: (r["label"], r["seeded"])
            for r in graph.label_propagation(
                nodes, edges, rounds=rounds
            ).collect()
        }
        assert set(got) == expect_nodes
        assert all(v[0] == 7 for v in got.values())
        assert got[1][1] is True and got[2][1] is False


def test_label_propagation_majority_and_tiebreak(spark):
    # node 0 has neighbors seeded 1,1,2 -> majority 1;
    # node 9 has neighbors seeded 1,2 -> tie -> smallest label 1
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (9, 4), (9, 5)], "id_a int, id_b int"
    )
    nodes = spark.createDataFrame(
        [(0, None), (1, 1), (2, 1), (3, 2), (9, None), (4, 1), (5, 2)],
        "node int, seed_label int",
    )
    got = {
        r["node"]: r["label"]
        for r in graph.label_propagation(nodes, edges, rounds=1).collect()
    }
    assert got[0] == 1 and got[9] == 1


# ----------------------------------------------------- MRR / recall@k

def test_mrr_recall_hand_computed(spark):
    ranked = spark.createDataFrame(
        [(1, 0.0), (2, 1.0), (3, 0.0), (4, 1.0)], "rank int, rel double"
    )
    tot = spark.createDataFrame([(5,)], "n_rel long")
    out = evaluation.mrr_recall_at_k(ranked, "rank", "rel", 3, tot).collect()[
        0
    ]
    assert out["first_rel_rank"] == 2
    assert out["mrr"] == 0.5
    assert out["hits_at_k"] == 1  # only rank 2 within top 3
    assert out["recall_at_k"] == 1 / 5


def test_mrr_no_relevant_zero(spark):
    ranked = spark.createDataFrame([(1, 0.0), (2, 0.0)], "rank int, rel double")
    tot = spark.createDataFrame([(0,)], "n_rel long")
    out = evaluation.mrr_recall_at_k(ranked, "rank", "rel", 2, tot).collect()[
        0
    ]
    assert out["mrr"] == 0.0 and out["recall_at_k"] == 0.0


# --------------------------------------------------------- Fleiss kappa

def test_fleiss_kappa_perfect_agreement(spark):
    df = spark.createDataFrame(
        [(1, 1, 1)] * 5 + [(0, 0, 0)] * 5, "r1 int, r2 int, r3 int"
    )
    out = evaluation.fleiss_kappa(df, ["r1", "r2", "r3"]).collect()[0]
    assert out["p_bar"] == 1.0 and out["kappa"] == 1.0


def test_fleiss_kappa_hand_computed(spark):
    # rows of vote counts n1 (category-1 votes of 3): 1,2,2,3 ->
    # sum_sq = (1+4)+(4+1)+(4+1)+(9+0) = 24; N=4, m=3
    df = spark.createDataFrame(
        [(1, 0, 0), (1, 1, 0), (0, 1, 1), (1, 1, 1)],
        "r1 int, r2 int, r3 int",
    )
    out = evaluation.fleiss_kappa(df, ["r1", "r2", "r3"]).collect()[0]
    p_bar = (24 - 12) / (4 * 3 * 2)
    t1 = 1 + 2 + 2 + 3
    t0 = 12 - t1
    p_e = (t0 / 12) ** 2 + (t1 / 12) ** 2
    assert abs(out["p_bar"] - p_bar) < 1e-12
    assert abs(out["p_e"] - p_e) < 1e-12
    assert abs(out["kappa"] - (p_bar - p_e) / (1 - p_e)) < 1e-12


# ------------------------------------------------------------- McNemar

def test_mcnemar_hand_computed(spark):
    # b (A right, B wrong) = 3; c (A wrong, B right) = 1
    rows = (
        [(1, 0, 1)] * 3 + [(0, 1, 1)] * 1 + [(1, 1, 1)] * 4 + [(0, 0, 1)] * 2
    )
    df = spark.createDataFrame(rows, "pred_a int, pred_b int, label int")
    out = evaluation.mcnemar(df, "pred_a", "pred_b", "label").collect()[0]
    assert (out["b_count"], out["c_count"]) == (3, 1)
    assert out["mcnemar_stat"] == (3 - 1) ** 2 / 4


# ------------------------------------------------------ epoch shuffle

def test_epoch_shuffle_batches_partition_of_input(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = splits.epoch_shuffle_batches(
        df, "doc_id", epoch=1, batch_size=256
    ).collect()
    assert sum(r["n_rows"] for r in out) == 1000
    assert sum(r["id_checksum"] for r in out) == 1000 * 999 // 2
    sizes = {r["batch"]: r["n_rows"] for r in out}
    assert sizes == {0: 256, 1: 256, 2: 256, 3: 232}


def test_epoch_shuffle_differs_by_epoch_but_is_stable(spark):
    df = spark.range(512).select(F.col("id").alias("doc_id"))
    a1 = {
        r["batch"]: r["id_checksum"]
        for r in splits.epoch_shuffle_batches(df, "doc_id", 1, 128).collect()
    }
    a1b = {
        r["batch"]: r["id_checksum"]
        for r in splits.epoch_shuffle_batches(df, "doc_id", 1, 128).collect()
    }
    a2 = {
        r["batch"]: r["id_checksum"]
        for r in splits.epoch_shuffle_batches(df, "doc_id", 2, 128).collect()
    }
    assert a1 == a1b  # reproducible
    assert a1 != a2  # epoch salt permutes


# -------------------------------------------------------- curriculum

def test_curriculum_interleave_round_robin(spark):
    df = spark.range(80).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("difficulty")
    )
    out = splits.curriculum_interleave(
        df, "doc_id", "difficulty", n_buckets=8, head=16
    ).collect()
    assert [r["schedule_pos"] for r in out] == list(range(16))
    # the first 8 schedule slots hit each difficulty tier exactly once
    assert [r["bucket"] for r in out[:8]] == list(range(8))
    # difficulty = 10*id with 80 rows -> tier b holds ids 10b..10b+9
    for r in out:
        assert r["id"] // 10 == r["bucket"]
