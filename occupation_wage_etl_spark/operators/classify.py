"""In-engine text classification — the quality/spam-filter training
step of an LLM data pipeline, expressed as DataFrame aggregates (no
MLlib, no driver-side training loop).

A 100-TB curation pipeline trains lightweight classifiers (fastText /
Naive-Bayes-class models) to score documents for quality, spam, or
domain membership.  The multinomial Naive Bayes here is the
map-reduce-native member of that family: training IS one counting
aggregate (class × token), scoring IS a token-keyed join plus a
log-sum — both shapes Spark executes as hash-aggregates and
shuffle joins with no iteration.

Determinism contract (the repo's oracle rules, see queries.py):
per-token log-likelihoods are rounded to 12dp and cast to DECIMAL so
the per-document sum is EXACT and order-independent (float sums
commute only in decimal space); the final score is surfaced as a
6dp-rounded double.  Tie-breaks are (score desc, label desc) —
deterministic struct-argmax, no window.

Reference parity: the reference engine has no classifier tier — this
is north-star LLM-pipeline scope (same family as the Gopher-rule and
KN-cross-entropy quality scores in operators/text_analysis.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log-likelihoods are exact-summed in decimal space; 20 digits of
# precision keeps n·loglik products inside DECIMAL(38) after Spark's
# multiplication widening (20 + 8 + 1 = 29 < 38, scale stays 12)
_DEC = "decimal(20,12)"


def _tokens(
    docs: DataFrame, id_col: str, text_col: str, *extra: str
) -> DataFrame:
    return docs.select(
        id_col,
        *extra,
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")


def _nb_model(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    alpha: int,
    doc_tok: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(dense, priors, defaults) for a multinomial NB with add-alpha
    smoothing: ``dense`` is the (tok, cls, loglik) grid over the
    training vocabulary (zero counts included), ``priors`` the
    (cls, logprior) rows, ``defaults`` the per-class OOV
    log-likelihood log(alpha / (t_c + alpha·V)) — what a token never
    seen in training contributes under each class.  All log values
    12dp-rounded into DECIMAL (exact, order-independent sums).

    Pass ``doc_tok`` (per-(doc, label, token) counts with column
    ``n``) when the caller already aggregated it: the class×token
    model then FOLDS from that aggregate (sum of per-doc counts —
    Spark reuses the doc_tok exchange) instead of re-tokenizing the
    corpus a second time."""
    if doc_tok is not None:
        cls_tok = doc_tok.groupBy(label_col, "tok").agg(
            F.sum("n").alias("cnt")
        )
    else:
        toks = _tokens(docs, id_col, text_col, label_col)
        cls_tok = toks.groupBy(label_col, "tok").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    cls_tot = cls_tok.groupBy(label_col).agg(F.sum("cnt").alias("t"))
    vocab = cls_tok.select("tok").distinct()
    v_size = vocab.agg(F.count(F.lit(1)).alias("v"))
    classes = docs.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_all = docs.agg(F.count(F.lit(1)).alias("n_all"))
    denom = (F.col("t") + alpha * F.col("v")).cast("double")
    dense = (
        vocab.crossJoin(
            F.broadcast(classes.select(F.col(label_col).alias("cls")))
        )
        .join(
            cls_tok.select(
                F.col(label_col).alias("cls"), "tok", "cnt"
            ),
            ["tok", "cls"],
            "left",
        )
        .join(
            F.broadcast(
                cls_tot.select(F.col(label_col).alias("cls"), "t")
            ),
            "cls",
        )
        .crossJoin(F.broadcast(v_size))
        .select(
            "tok",
            "cls",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + alpha).cast(
                        "double"
                    )
                    / denom
                ),
                12,
            )
            .cast(_DEC)
            .alias("loglik"),
        )
    )
    defaults = (
        cls_tot.crossJoin(F.broadcast(v_size))
        .select(
            F.col(label_col).alias("cls"),
            F.round(F.log(F.lit(float(alpha)) / denom), 12)
            .cast(_DEC)
            .alias("oov_loglik"),
        )
    )
    priors = classes.crossJoin(F.broadcast(n_all)).select(
        F.col(label_col).alias("cls"),
        F.round(
            F.log(
                F.col("n_docs").cast("double")
                / F.col("n_all").cast("double")
            ),
            12,
        )
        .cast(_DEC)
        .alias("logprior"),
    )
    return dense, priors, defaults


def _nb_argmax(scores: DataFrame, id_col: str, *carry: str) -> DataFrame:
    best = scores.groupBy(id_col, *carry).agg(
        F.max(F.struct("score", "cls")).alias("__b")
    )
    return best.select(
        id_col,
        *carry,
        F.col("__b.cls").alias("pred_label"),
        F.col("__b.score").alias("score"),
    )


def naive_bayes_self_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    alpha: int = 1,
) -> DataFrame:
    """Train a multinomial Naive Bayes classifier with add-``alpha``
    smoothing on ``docs`` (whitespace tokens of ``text_col``, classes
    from ``label_col``) and score the SAME corpus (resubstitution —
    the in-pipeline self-consistency audit; there is no OOV path by
    construction).  Returns (id, true_label, pred_label, score) with
    ``score`` the winning class's 6dp-rounded log-posterior.

    Plan shape, built for |docs| ≫ |vocab| ≫ |classes|:

    - ``doc_tok``: per-(doc, token) counts — one hash-agg (the only
      data-sized shuffle on the scoring side);
    - model: class×token counts fold FROM doc_tok (operator reuse, no
      second scan); the dense (vocab × class) grid is a broadcast
      nested-loop against the |C|-row class list, NEVER vocab×vocab;
    - class totals / vocab size / priors are parameter-sized —
      broadcast scalar attaches (the audited 1-row crossJoin pattern);
    - scoring: doc_tok ⋈ model on token (model side is |V|·|C|-keyed,
      shuffle join — no broadcast assumption at 100 TB), one
      (doc, class) hash-agg, struct-argmax per doc.
    """
    doc_tok = _tokens(docs, id_col, text_col, label_col).groupBy(
        id_col, label_col, "tok"
    ).agg(F.count(F.lit(1)).alias("n"))
    dense, priors, _ = _nb_model(
        docs, id_col, text_col, label_col, alpha, doc_tok=doc_tok
    )
    scores = (
        doc_tok.join(dense, "tok")
        .groupBy(id_col, label_col, "cls")
        .agg(
            F.sum(
                F.col("n").cast("decimal(8,0)") * F.col("loglik")
            ).alias("ll")
        )
        .join(F.broadcast(priors), "cls")
        .select(
            id_col,
            label_col,
            "cls",
            F.round(
                (F.col("ll") + F.col("logprior")).cast("double"), 6
            ).alias("score"),
        )
    )
    out = _nb_argmax(scores, id_col, label_col)
    return out.withColumnRenamed(label_col, "true_label")


def naive_bayes_score(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    alpha: int = 1,
) -> DataFrame:
    """The production train/apply split: fit the model on ``train``
    (labeled), score ``score`` (unlabeled) — tokens never seen in
    training contribute the per-class OOV likelihood
    log(alpha / (t_c + alpha·V)), the same smoothing mass an unseen
    count gets, so a scored document NEVER drops rows or fails — a
    document with NO tokens at all (empty/whitespace/NULL text) gets
    the prior-only prediction (argmax class prior, score = its
    6dp-rounded log-prior, n_oov = 0) via a left join against the
    scored ids.  Returns (id, pred_label, score, n_oov) — ``n_oov`` counts the
    scored document's out-of-vocabulary token occurrences (the
    drift/quality signal a curation pipeline monitors: rising OOV
    means the model is stale for the incoming crawl).

    Plan shape: scoring tokens cross the |C|-row class list
    (broadcast nested-loop), LEFT-join the dense model on
    (tok, cls) — shuffle equi-join, model side |V|·|C| — and
    coalesce misses with the broadcast per-class default.  One
    (doc, class) hash-agg, struct-argmax."""
    dense, priors, defaults = _nb_model(
        train, id_col, text_col, label_col, alpha
    )
    doc_tok = _tokens(score, id_col, text_col).groupBy(
        id_col, "tok"
    ).agg(F.count(F.lit(1)).alias("n"))
    per_cls = (
        doc_tok.crossJoin(F.broadcast(priors.select("cls")))
        .join(dense, ["tok", "cls"], "left")
        .join(F.broadcast(defaults), "cls")
        .groupBy(id_col, "cls")
        .agg(
            F.sum(
                F.col("n").cast("decimal(8,0)")
                * F.coalesce(F.col("loglik"), F.col("oov_loglik"))
            ).alias("ll"),
            F.sum(
                F.when(F.col("loglik").isNull(), F.col("n")).otherwise(
                    F.lit(0)
                )
            ).alias("n_oov"),
        )
        .join(F.broadcast(priors), "cls")
        .select(
            id_col,
            "cls",
            F.round(
                (F.col("ll") + F.col("logprior")).cast("double"), 6
            ).alias("score"),
            "n_oov",
        )
    )
    best = per_cls.groupBy(id_col).agg(
        F.max(F.struct("score", "cls")).alias("__b"),
        F.max("n_oov").alias("n_oov"),
    ).select(
        id_col,
        F.col("__b.cls").alias("pred_label"),
        F.col("__b.score").alias("score"),
        F.col("n_oov").cast("long").alias("n_oov"),
    )
    # prior-only fallback: 1-row broadcast scalar attach (argmax of
    # the |C|-row priors), so token-less documents keep their row
    prior_best = priors.agg(
        F.max(
            F.struct(
                F.round(F.col("logprior").cast("double"), 6)
                .alias("score"),
                F.col("cls"),
            )
        ).alias("__p")
    )
    return (
        score.select(id_col)
        .join(best, id_col, "left")
        .crossJoin(F.broadcast(prior_best))
        .select(
            id_col,
            F.coalesce("pred_label", F.col("__p.cls")).alias(
                "pred_label"
            ),
            F.coalesce("score", F.col("__p.score")).alias("score"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        )
    )
