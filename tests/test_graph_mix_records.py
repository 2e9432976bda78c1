"""Round-5 additions: HITS hubs/authorities (graph.hits — q206), degree
assortativity (graph.assortativity — q207), record-high detection
(timeseries.record_highs — q208), PMI tables (text_analysis.pmi_table —
q209), and temperature-scaled source mixing weights
(curation.source_mixing_weights — q210)."""

from __future__ import annotations

import math

from occupation_wage_etl_spark.operators import (
    curation,
    graph,
    text_analysis,
    timeseries,
)

# ------------------------------------------------------------------ HITS


def test_hits_star_concentrates_authority(spark):
    # hubs 1..3 all point at authority 10; hub 1 also points at 11.
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11)], "src int, dst int"
    )
    out = {
        (r["side"], r["node"]): r["score"]
        for r in graph.hits(edges, rounds=2).collect()
    }
    # round 1: a(10)=3, a(11)=1; h(1)=4, h(2)=h(3)=3
    # round 2: a(10)=h1+h2+h3=10, a(11)=h1=4; h(1)=14, h(2)=h(3)=10
    assert out[("authority", 10)] == 10
    assert out[("authority", 11)] == 4
    assert out[("hub", 1)] == 14
    assert out[("hub", 2)] == 10 and out[("hub", 3)] == 10


def test_hits_dedups_parallel_edges(spark):
    dup = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10)], "src int, dst int"
    )
    clean = spark.createDataFrame([(1, 10), (2, 10)], "src int, dst int")
    got = sorted(map(tuple, graph.hits(dup, rounds=1).collect()))
    want = sorted(map(tuple, graph.hits(clean, rounds=1).collect()))
    assert got == want


# -------------------------------------------------------- assortativity


def test_assortativity_star_is_negative_one(spark):
    # a star is maximally disassortative: r = -1 exactly
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a int, id_b int"
    )
    row = graph.assortativity(edges).collect()[0]
    assert row["m_directed"] == 10
    assert abs(row["assortativity"] - (-1.0)) < 1e-12


def test_assortativity_regular_graph_is_null(spark):
    # a cycle is degree-regular: zero variance -> NULL coefficient
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "id_a int, id_b int"
    )
    row = graph.assortativity(edges).collect()[0]
    assert row["m_directed"] == 8
    assert row["assortativity"] is None


def test_assortativity_canonicalizes_messy_edges(spark):
    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (0, 3), (0, 4), (0, 5), (3, 3)],
        "id_a int, id_b int",
    )
    row = graph.assortativity(messy).collect()[0]
    assert row["m_directed"] == 10
    assert abs(row["assortativity"] - (-1.0)) < 1e-12


# ---------------------------------------------------------- record highs


def test_record_highs_strict_records_only(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 7.0), (4, 6.0), (5, 9.0)],
        "k int, v double",
    )
    out = {r["k"]: r["prev_max"] for r in
           timeseries.record_highs(df, "k", "v").collect()}
    # k=3 ties the max (not strict), k=4 is below -> only 1, 2, 5
    assert set(out) == {1, 2, 5}
    assert out[1] is None and out[2] == 5.0 and out[5] == 7.0


def test_record_highs_matches_window_oracle(spark):
    import pyspark.sql.functions as F

    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.abs(F.hash(F.col("id").cast("string"))) % 1000)
        .cast("double")
        .alias("v"),
    )
    got = sorted(
        (r["k"], r["v"]) for r in
        timeseries.record_highs(df, "k", "v").collect()
    )
    rows = sorted((r["k"], r["v"]) for r in df.collect())
    best, want = None, []
    for k, v in rows:
        if best is None or v > best:
            want.append((k, v))
            best = v
    assert got == want


# -------------------------------------------------------------- PMI


def test_pmi_independent_columns_score_zero(spark):
    # perfectly independent 2x2 layout: every cell PMI = 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = text_analysis.pmi_table(df, "a", "b").collect()
    assert len(out) == 4
    assert all(r["pmi"] == 0.0 for r in out)
    assert all(r["n_both"] == 10 for r in out)


def test_pmi_exclusive_pairing_is_log_k(spark):
    # a1 only ever with b1, a2 only with b2 -> PMI = ln(2) for both cells
    rows = [("a1", "b1")] * 8 + [("a2", "b2")] * 8
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r["a"], r["b"]): r["pmi"]
           for r in text_analysis.pmi_table(df, "a", "b").collect()}
    assert out == {
        ("a1", "b1"): round(math.log(2), 6),
        ("a2", "b2"): round(math.log(2), 6),
    }


# ------------------------------------------------------- mixing weights


def test_mixing_weights_tempering_flattens_shares(spark):
    rows = [("big",)] * 90 + [("small",)] * 10
    df = spark.createDataFrame(rows, "source string")
    out = {r["source"]: r for r in
           curation.source_mixing_weights(df, "source").collect()}
    z = math.sqrt(90) + math.sqrt(10)
    assert abs(out["big"]["weight"] - math.sqrt(90) / z) < 1e-12
    assert abs(out["small"]["weight"] - math.sqrt(10) / z) < 1e-12
    # tempering moves both weights toward the middle vs raw shares
    assert out["big"]["weight"] < out["big"]["raw_share"]
    assert out["small"]["weight"] > out["small"]["raw_share"]
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-12


def test_hits_rejects_zero_rounds(spark):
    import pytest

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="rounds"):
        graph.hits(e, rounds=0)
