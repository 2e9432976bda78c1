"""In-engine Naive Bayes (operators/classify.py): hand-computed
posterior check, resubstitution accuracy, deterministic tie-break."""

from __future__ import annotations

import math

from occupation_wage_etl_spark.operators import classify


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )


def test_hand_computed_posteriors(spark):
    docs = _df(
        spark,
        [
            (1, "a a b", "c0"),
            (2, "a b", "c0"),
            (3, "x x y", "c1"),
        ],
    )
    out = {
        r.doc_id: r
        for r in classify.naive_bayes_self_score(docs).collect()
    }
    assert all(out[i].pred_label == out[i].true_label for i in (1, 2, 3))
    # doc 1 under c0: counts a=3,b=2,t=5,V=4 -> ln(2/3) + 2·ln(4/9) + ln(3/9)
    want = (
        round(math.log(2 / 3), 12)
        + 2 * round(math.log(4 / 9), 12)
        + round(math.log(3 / 9), 12)
    )
    assert abs(out[1].score - round(want, 6)) < 1e-9
    # the winning score must beat the losing class's posterior
    lose = (
        round(math.log(1 / 3), 12)
        + 3 * round(math.log(1 / 7), 12)
    )
    assert out[1].score > round(lose, 6)


def test_resubstitution_recovers_planted_classes(spark):
    rows = []
    vocab = ["alpha alpha beta", "gamma gamma delta", "eps eps zeta"]
    for i in range(60):
        c = i % 3
        extra = " filler" if i % 2 == 0 else ""
        rows.append((i, vocab[c] + " common" + extra, f"c{c}"))
    out = classify.naive_bayes_self_score(_df(spark, rows)).collect()
    assert len(out) == 60
    assert all(r.pred_label == r.true_label for r in out)


def test_train_apply_split_with_oov(spark):
    train = _df(
        spark,
        [
            (1, "a a b", "c0"),
            (2, "a b", "c0"),
            (3, "x x y", "c1"),
            (4, "x y", "c1"),
        ],
    )
    held = spark.createDataFrame(
        [(10, "a b zzz"), (11, "x zzz zzz")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in classify.naive_bayes_score(train, held).collect()
    }
    assert out[10].pred_label == "c0" and out[11].pred_label == "c1"
    assert out[10].n_oov == 1 and out[11].n_oov == 2
    # OOV contribution equals the smoothing default ln(1/(t_c+V)):
    # doc 10 under c0: counts a=3,b=2,t=5,V=4
    import math
    want = (
        round(math.log(2 / 4), 12)           # prior 2/4
        + round(math.log(4 / 9), 12)          # a
        + round(math.log(3 / 9), 12)          # b
        + round(math.log(1 / 9), 12)          # zzz (OOV)
    )
    assert abs(out[10].score - round(want, 6)) < 1e-9


def test_score_keeps_tokenless_docs(spark):
    """Empty/whitespace/NULL text must not drop the row: the scored
    document gets the prior-only prediction (argmax class prior,
    score = 6dp log-prior, n_oov = 0)."""
    import math

    train = _df(
        spark,
        [(1, "a", "c0"), (2, "a", "c0"), (3, "x", "c1")],
    )
    held = spark.createDataFrame(
        [(10, ""), (11, "   "), (12, None), (13, "a")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in classify.naive_bayes_score(train, held).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    for i in (10, 11, 12):
        assert out[i].pred_label == "c0"  # majority prior 2/3
        assert out[i].n_oov == 0
        assert abs(
            out[i].score - round(round(math.log(2 / 3), 12), 6)
        ) < 1e-9
    assert out[13].pred_label == "c0" and out[13].n_oov == 0


def test_tie_breaks_by_label_desc(spark):
    # perfectly symmetric two-class corpus: every posterior ties, so
    # the struct-argmax must deterministically pick the max label
    docs = _df(spark, [(1, "a", "c0"), (2, "a", "c1")])
    out = {
        r.doc_id: r
        for r in classify.naive_bayes_self_score(docs).collect()
    }
    assert out[1].pred_label == "c1" and out[2].pred_label == "c1"
    assert out[1].score == out[2].score
