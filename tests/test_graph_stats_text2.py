"""Unit tests for batch-2 round-2 operators: fixed-point PageRank,
winsorize/apply_buckets, rolling anomalies, char entropy, co-occurrence.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import text as T
from occupation_wage_etl_spark.operators import graph, stats, text_analysis, timeseries

SCALE = 10**12


def test_pagerank_star_hub_dominates_and_mass_conserved(spark):
    # star: 0 -- {1..4}; hub must outrank leaves; leaves tie exactly.
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    out = {r.node: r.rank_scaled for r in graph.pagerank(edges).collect()}
    assert out[0] > out[1]
    assert len({out[i] for i in range(1, 5)}) == 1  # bit-identical leaves
    # fixed-point floor loses < deg*1e-12 per round; total stays ~ scale
    assert abs(sum(out.values()) - SCALE) < 1000

    # python replay of the integer recurrence (3 iters, d=17/20)
    deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
    n = 5
    r = {v: SCALE // n for v in deg}
    nbrs = {0: [1, 2, 3, 4], 1: [0], 2: [0], 3: [0], 4: [0]}
    for _ in range(3):
        contrib = {v: r[v] // deg[v] for v in deg}
        r = {
            v: (SCALE * 3) // (20 * n)
            + (17 * sum(contrib[u] for u in nbrs[v])) // 20
            for v in deg
        }
    assert out == r


def test_pagerank_partitioning_invariant(spark):
    edges = spark.range(40).select(
        (F.col("id") % 13).alias("id_a"), (F.col("id") % 7 + 13).alias("id_b")
    )
    a = {r.node: r.rank_scaled for r in graph.pagerank(edges).collect()}
    b = {
        r.node: r.rank_scaled
        for r in graph.pagerank(edges.repartition(11)).collect()
    }
    assert a == b


def test_winsorize_clips_to_exact_percentiles(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "g string, v double"
    )
    out = stats.winsorize(df, "g", "v", 0.05, 0.95)
    got = {r.v: r.v_wins for r in out.collect()}
    # p05 of 1..100 = 1 + 0.05*99 = 5.95 ; p95 = 1 + 0.95*99 = 95.05
    assert got[1.0] == 5.95 and got[3.0] == 5.95
    assert got[100.0] == 95.05 and got[99.0] == 95.05
    assert got[50.0] == 50.0  # interior untouched
    assert len(got) == 100  # winsorize keeps every row


def test_apply_buckets_assigns_every_fitted_row_once(spark):
    df = spark.createDataFrame(
        [("g", i, float(i % 37)) for i in range(200)],
        "g string, id long, v double",
    )
    hist = stats.equi_depth_histogram(df, "g", "v", buckets=4)
    out = stats.apply_buckets(df, hist, "g", "v")
    assert out.count() == 200  # exactly-once: buckets partition the values
    # bucket of each value agrees with the fit-side assignment
    per_bucket = {
        r.bucket: (r.lo, r.hi) for r in hist.collect()
    }
    for r in out.select("v", "bucket").distinct().collect():
        lo, hi = per_bucket[r.bucket]
        assert lo <= r.v <= hi


def test_rolling_anomalies_flags_spike_not_baseline(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + dt.timedelta(hours=i), 10.0 + (i % 3) * 0.5)
        for i in range(20)
    ]
    rows.append((99, 1, t0 + dt.timedelta(hours=21), 500.0))  # spike
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).select(
        "event_id", "user_id", "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    out = timeseries.rolling_anomalies(
        df, "user_id", "ts", "v", window_sec=86400, z_thresh=3.0, min_n=5
    )
    assert [r.event_id for r in out.collect()] == [99]


def test_char_entropy_closed_forms(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, "????")],
        "id long, s string",
    )
    got = {
        r.id: r.e
        for r in df.select("id", T.char_entropy(F.col("s")).alias("e")).collect()
    }
    assert got[1] == 0.0                      # single symbol
    assert got[2] == round(math.log(2), 6)    # two equiprobable symbols
    assert got[3] is None                     # empty text
    assert got[4] is None                     # nothing in the alphabet


def test_cooccurrence_counts_and_prune(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "alpha beta"),
            (4, "alpha delta"),
        ],
        "doc_id long, text string",
    )
    out = text_analysis.cooccurrence_pairs(
        docs, "doc_id", "text", min_df=2, k=10
    ).collect()
    got = {(r.t1, r.t2): (r.pair_docs, r.support) for r in out}
    # gamma (df=1) and delta (df=1) pruned before pair formation
    assert got == {("alpha", "beta"): (3, 0.75)}


def test_token_f1_pairs_hand_computed(spark):
    from occupation_wage_etl_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [
            (1, "a b b c"),
            (2, "b b c d"),
            (3, "x y"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (4, 4)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in text_analysis.token_f1_pairs(docs, pairs).collect()
    }
    assert len(got) == 5  # empty-doc pairs survive, not dropped
    # one side token-less (doc 4: NULL text) -> n_b 0, overlap 0, f1 0
    assert (got[(1, 4)]["n_a"], got[(1, 4)]["n_b"]) == (4, 0)
    assert got[(1, 4)]["overlap"] == 0 and got[(1, 4)]["f1"] == 0.0
    # both sides token-less -> f1 NULL
    assert (got[(4, 4)]["n_a"], got[(4, 4)]["n_b"]) == (0, 0)
    assert got[(4, 4)]["f1"] is None
    # docs 1/2: shared multiset {b:2, c:1} -> overlap 3, f1 = 6/8
    assert got[(1, 2)]["overlap"] == 3
    assert got[(1, 2)]["f1"] == 0.75
    assert (got[(1, 2)]["n_a"], got[(1, 2)]["n_b"]) == (4, 4)
    # disjoint vocab -> overlap 0, f1 0
    assert got[(1, 3)]["overlap"] == 0
    assert got[(1, 3)]["f1"] == 0.0
    assert got[(2, 3)]["overlap"] == 0
