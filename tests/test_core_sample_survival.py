"""Tests for the round-3 additions: k-core decomposition, exact
stratified sampling, Fellegi-Sunter record linkage, Kaplan-Meier
survival (operators/graph.py, splits.py, fuzzy_join.py,
timeseries.py — the q139-q142 registry surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import (
    fuzzy_join,
    graph,
    splits,
    timeseries,
)


# ----------------------------------------------------------------- k-core

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_k_core_triangle_with_tail(spark):
    # triangle {1,2,3} + pendant 4: the 2-core is exactly the triangle,
    # every member with core-degree 2
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["node"]: r["core_degree"] for r in graph.k_core(e, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_path_fully_peels(spark):
    # a path has no 2-core; the peel must unravel it end-by-end (depth
    # = path length / 2 — exercises the multi-round loop)
    e = _edges(spark, [(i, i + 1) for i in range(1, 8)])
    assert graph.k_core(e, k=2).count() == 0


def test_k_core_k1_keeps_everything(spark):
    e = _edges(spark, [(1, 2), (3, 4)])
    got = {r["node"] for r in graph.k_core(e, k=1).collect()}
    assert got == {1, 2, 3, 4}


# ------------------------------------------------- stratified exact sample

def test_stratified_exact_sample_counts(spark):
    rows = [(i, "a" if i < 7 else "b") for i in range(12)]  # 7 a, 5 b
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = splits.stratified_exact_sample(df, "lang", "doc_id", 1, 3)
    by_stratum = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # ceil(7/3)=3, ceil(5/3)=2 — EXACT, not rate-based
    assert by_stratum == {"a": 3, "b": 2}


def test_stratified_exact_sample_is_stable_per_stratum(spark):
    # adding a new stratum must not change an existing stratum's picks
    rows = [(i, "a") for i in range(9)]
    df1 = spark.createDataFrame(rows, "doc_id long, lang string")
    df2 = spark.createDataFrame(
        rows + [(100 + i, "b") for i in range(4)], "doc_id long, lang string"
    )
    pick = lambda df: {
        r["doc_id"]
        for r in splits.stratified_exact_sample(df, "lang", "doc_id", 1, 3)
        .filter(F.col("lang") == "a")
        .collect()
    }
    assert pick(df1) == pick(df2)


# ------------------------------------------------------- record linkage

def test_record_linkage_weights_and_nullsafe(spark):
    a = spark.createDataFrame(
        [(1, "B1", "t1", 5), (2, "B1", None, 9), (3, "B2", "t9", 1)],
        "pk long, brand string, typ string, size int",
    )
    b = spark.createDataFrame(
        [(10, "B1", "t1", 5), (11, "B1", None, 9), (12, "B9", "t9", 1)],
        "pk long, brand string, typ string, size int",
    )
    out = {
        (r["a_pk"], r["b_pk"]): (r["score_milli"], r["n_agree"])
        for r in fuzzy_join.record_linkage_scores(
            a, b, "brand", {"typ": (1000, -500), "size": (700, -300)},
            "pk", "pk", min_score=-10_000,
        ).collect()
    }
    # blocking: only B1 pairs exist (3/B2 vs 12/B9 never meet)
    assert set(out) == {(1, 10), (1, 11), (2, 10), (2, 11)}
    assert out[(1, 10)] == (1700, 2)          # both fields agree
    assert out[(2, 11)] == (1700, 2)          # NULL == NULL (null-safe)
    assert out[(1, 11)] == (-500 + -300, 0)   # both differ
    assert out[(2, 10)] == (-500 + -300, 0)   # NULL vs value = disagree


def test_record_linkage_min_score_filters(spark):
    a = spark.createDataFrame([(1, "B", "x")], "pk long, brand string, typ string")
    b = spark.createDataFrame([(2, "B", "y")], "pk long, brand string, typ string")
    out = fuzzy_join.record_linkage_scores(
        a, b, "brand", {"typ": (1000, -500)}, "pk", "pk", min_score=0
    )
    assert out.count() == 0


# ---------------------------------------------------------- Kaplan-Meier

def test_kaplan_meier_closed_form(spark):
    # durations: 1(event) 2(censor) 3(event) 3(event) 4(censor)
    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0)], "duration long, event int"
    )
    rows = {r["t"]: r for r in timeseries.kaplan_meier(df, "duration", "event").collect()}
    assert set(rows) == {1, 3}  # event times only
    assert (rows[1]["n_risk"], rows[1]["n_events"]) == (5, 1)
    assert (rows[3]["n_risk"], rows[3]["n_events"]) == (3, 2)
    s1 = 1.0 * (1.0 - 1 / 5)
    s3 = s1 * (1.0 - 2 / 3)
    assert rows[1]["survival"] == s1
    assert rows[3]["survival"] == s3


def test_kaplan_meier_all_censored(spark):
    df = spark.createDataFrame([(5, 0), (7, 0)], "duration long, event int")
    assert timeseries.kaplan_meier(df, "duration", "event").count() == 0


# ------------------------------------------------------------- winnowing

def test_winnowing_pairs_guarantee_and_udf_parity(spark):
    from pyspark.sql import functions as F

    from occupation_wage_etl_spark.functions import text as T
    from occupation_wage_etl_spark.operators import dedup

    shared = "the identical stretch of text long enough to survive"
    docs = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " tail alpha"),
            (2, "a different beginning " + shared + " other end"),
            (3, "completely unrelated content with nothing in common zzz"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in dedup.winnowing_pairs(docs, k=8, w=8, min_shared=2).collect()
    }
    # winnowing guarantee: a shared substring of length >= w+k-1 forces
    # common selected fingerprints -> (1,2) must pair; 3 must not
    assert (1, 2) in got
    assert not any(3 in p for p in got)

    # the Arrow-batched selection must agree with the SQL expression
    # tier (functions/text.py:winnowing_fingerprints) hash-for-hash
    expr_sel = {
        r["doc_id"]: sorted(
            {s["h"] for s in r["sel"]}
        )
        for r in docs.select(
            "doc_id",
            T.winnowing_fingerprints(F.col("text"), 8, 8).alias("sel"),
        ).collect()
    }
    udf_rows = dedup.winnowing_pairs(docs, k=8, w=8, min_shared=1)
    # recompute the per-doc hash sets through the operator's internal
    # explode by re-deriving from the expression tier and comparing the
    # pair counts: identical selections => identical n_shared
    expr_pairs = {}
    ids = sorted(expr_sel)
    for i in ids:
        for j in ids:
            if i < j:
                n = len(set(expr_sel[i]) & set(expr_sel[j]))
                if n >= 1:
                    expr_pairs[(i, j)] = n
    got_counts = {
        (r.id_a, r.id_b): r.n_shared for r in udf_rows.collect()
    }
    assert got_counts == expr_pairs


def test_winnowing_pairs_non_ascii_matches_expression_tier(spark):
    # grams are k CHARACTERS: multi-byte text must select the same
    # hashes through the Arrow path as through the SQL expression tier
    # (a byte-sliced gram would shift every boundary after the first é).
    from pyspark.sql import functions as F

    from occupation_wage_etl_spark.functions import text as T
    from occupation_wage_etl_spark.operators import dedup

    shared = "déjà vu — l'été über straße naïve"
    docs = spark.createDataFrame(
        [
            (1, "préfixe un " + shared + " queue alpha"),
            (2, "un autre début " + shared + " autre fin"),
        ],
        "doc_id long, text string",
    )
    expr_sel = {
        r["doc_id"]: {s["h"] for s in r["sel"]}
        for r in docs.select(
            "doc_id",
            T.winnowing_fingerprints(F.col("text"), 8, 8).alias("sel"),
        ).collect()
    }
    expected = len(expr_sel[1] & expr_sel[2])
    got = dedup.winnowing_pairs(docs, k=8, w=8, min_shared=1).collect()
    assert [(r.id_a, r.id_b, r.n_shared) for r in got] == [(1, 2, expected)]


def test_winnowing_pairs_max_df_drops_boilerplate(spark):
    # 6 docs share ONLY a boilerplate footer; docs 1,2 also share real
    # content.  With max_df below the footer's df, footer-only pairs
    # disappear while the substantive (1,2) overlap survives.
    from occupation_wage_etl_spark.operators import dedup

    footer = "standard license footer text appended to every document here"
    real = "the genuinely shared plagiarized passage of this pair"
    distinct_bodies = [
        "quick brown foxes jump over lazy dogs repeatedly",
        "sphinx of black quartz judge my vow tonight",
        "pack my box with five dozen liquor jugs",
        "how vexingly daft zebras quack and waltz",
    ]
    docs = spark.createDataFrame(
        [(1, f"alpha {real} one {footer}"), (2, f"beta {real} two {footer}")]
        + [(i + 3, f"{body} {footer}") for i, body in enumerate(distinct_bodies)],
        "doc_id long, text string",
    )
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.winnowing_pairs(docs, min_shared=2).collect()
    }
    assert (3, 4) in uncapped  # footer alone pairs everyone
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.winnowing_pairs(docs, min_shared=2, max_df=5).collect()
    }
    assert (1, 2) in capped
    assert all(a <= 2 and b <= 2 for a, b in capped)


# ------------------------------------------------------------------ BPE

def test_bpe_merges_known_corpus(spark):
    from occupation_wage_etl_spark.operators import vocab

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab")], "doc_id long, text string"
    )
    rows = [
        (r["round"], r["merge_left"], r["merge_right"], r["merged"],
         r["pair_count"])
        for r in vocab.bpe_merges(docs, rounds=4).collect()
    ]
    # round 1: (a,a) count 4 (two per 'aaab' x freq 2) beats (a,b) 3
    # round 2: after merge 'aaab'->[aa,a,b], (a,b) 3 beats (aa,a) 2
    # round 3: words are [aa,ab] x2 and [ab]: (aa,ab) 2
    # round 4: no adjacent pairs left -> loop stops early
    assert rows == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]
