"""Categorical feature encodings for training pipelines: smoothed
target encoding and its leakage-free k-fold variant.

Target encoding (replacing a category with the smoothed mean of the
target over that category) is the classic high-cardinality categorical
feature for quality classifiers — and the classic LEAKAGE bug when the
row's own target contributes to its encoding.  Both operators here are
pure hash-aggregate + broadcast-join shapes:

- sums are exact DECIMAL(18,2) (order-independent), stringly-cast to
  double (the q49 discipline) so encodings are bit-equal across
  engines and partition layouts;
- the k-fold variant computes each (category, fold) encoding from
  TOTALS MINUS THE FOLD'S OWN CONTRIBUTION — one aggregate at
  (category, fold) grain, category totals and the global mean joined
  back broadcast; no per-row window, no second scan.

Reference analogue: none (the reference trains nothing);
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _dbl_exact(col: F.Column) -> F.Column:
    # decimal -> STRING -> double; see q49's scale note in queries.py.
    return col.cast("string").cast("double")


def target_encode(
    df: DataFrame,
    cat_col: str,
    y_col: str,
    m: float = 100.0,
) -> DataFrame:
    """Smoothed target encoding per category:

        enc(c) = (S_c + m * global_mean) / (n_c + m)

    — the empirical-Bayes shrinkage toward the global mean, weight
    ``m`` in pseudo-observations (rare categories shrink hard, big
    ones barely move).

    One aggregate at category grain + a broadcast 1-row global attach.
    Returns (category, n_rows, target_enc).
    """
    base = df.filter(
        F.col(cat_col).isNotNull() & F.col(y_col).isNotNull()
    )
    per_cat = base.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dbl_exact(F.sum(_dec2(y_col))).alias("s_c"),
    )
    glob = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_all"),
        _dbl_exact(F.sum(_dec2(y_col))).alias("s_all"),
    )
    return per_cat.crossJoin(F.broadcast(glob)).select(
        "category",
        "n_rows",
        (
            (F.col("s_c") + F.lit(m) * (F.col("s_all") / F.col("n_all")))
            / (F.col("n_rows").cast("double") + F.lit(m))
        ).alias("target_enc"),
    )


def kfold_target_encode(
    df: DataFrame,
    cat_col: str,
    y_col: str,
    fold_col: str,
    m: float = 100.0,
) -> DataFrame:
    """Leakage-free k-fold target encoding: rows of fold f are encoded
    from every OTHER fold's statistics,

        enc(c, f) = ((S_c - S_cf) + m * gm_f) / ((n_c - n_cf) + m)
        gm_f      = (S - S_f) / (n - n_f)      (out-of-fold global mean)

    so a row's own target never flows into its feature — the totals-
    minus-own-fold identity turns "recompute per fold" into one
    (category, fold)-grain aggregate plus two broadcast marginal
    joins (category totals, fold totals).  Fold count is
    config-bounded, so every join side beyond the first aggregate is
    tiny.

    Returns (category, fold, n_rows, target_enc) — n_rows is the
    encoded fold's own row count at that category.
    """
    base = df.filter(
        F.col(cat_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(fold_col).isNotNull()
    )
    cf = base.groupBy(
        F.col(cat_col).alias("category"), F.col(fold_col).alias("fold")
    ).agg(
        F.count(F.lit(1)).alias("n_cf"),
        _dbl_exact(F.sum(_dec2(y_col))).alias("s_cf"),
    )
    # category totals come from the same exact decimal path as the
    # (category, fold) sums — NOT by re-summing the per-fold doubles,
    # which would be order-dependent
    cat_tot = base.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_c"),
        _dbl_exact(F.sum(_dec2(y_col))).alias("s_c"),
    )
    fold_tot = base.groupBy(F.col(fold_col).alias("fold")).agg(
        F.count(F.lit(1)).alias("n_f"),
        _dbl_exact(F.sum(_dec2(y_col))).alias("s_f"),
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("n_all"),
        _dbl_exact(F.sum(_dec2(y_col))).alias("s_all"),
    )
    # try_divide: a category confined to one fold with m == 0 has no
    # out-of-fold evidence (divisor 0) -> NULL encoding, not an ANSI
    # error; registry data never hits it, so oracle parity is unchanged
    gm = F.try_divide(
        F.col("s_all") - F.col("s_f"),
        (F.col("n_all") - F.col("n_f")).cast("double"),
    )
    return (
        cf.join(F.broadcast(cat_tot), "category")
        .join(F.broadcast(fold_tot), "fold")
        .crossJoin(F.broadcast(glob))
        .select(
            "category",
            "fold",
            F.col("n_cf").alias("n_rows"),
            F.try_divide(
                (F.col("s_c") - F.col("s_cf")) + F.lit(m) * gm,
                (F.col("n_c") - F.col("n_cf")).cast("double") + F.lit(m),
            ).alias("target_enc"),
        )
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str,
) -> DataFrame:
    """Weight of evidence + information value per category — the
    credit-scoring-standard readout of how much a categorical feature
    separates a binary label (here: which corpus slices carry the
    quality signal).  Complements :func:`target_encode` (which outputs
    a smoothed rate for MODELING; WoE outputs a log-odds-ratio for
    FEATURE AUDIT).

    Half-count (Laplace ½) adjustment keeps empty cells finite, and
    keeps the log argument a ratio of exact integers:

        WoE_c = ln( (2·pos_c + 1)·N  /  ((2·neg_c + 1)·P) )

    (P/N = global positive/negative totals).  ``ln`` is not correctly-
    rounded-mandated, so WoE and the IV term are 6dp-rounded (repo
    policy for transcendental tails); the adjusted shares are single
    IEEE divisions of exact integers.

        iv_term_c = (pos_share_c − neg_share_c) · WoE_c,
        pos_share_c = (2·pos_c + 1) / (2·P)

    Shape: one category hash-aggregate + a 1-row totals broadcast —
    category-axis output, nothing data-sized past the first aggregate.
    Returns (category, n_pos, n_neg, woe, iv_term).
    """
    y = F.col(label_col).cast("long")
    cells = df.filter(F.col(cat_col).isNotNull() & y.isNotNull()).groupBy(
        F.col(cat_col).alias("category")
    ).agg(
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    tot = cells.agg(
        F.sum("n_pos").alias("p"), F.sum("n_neg").alias("n")
    )
    woe = F.round(
        F.log(
            ((2 * F.col("n_pos") + 1) * F.col("n")).cast("double")
            / ((2 * F.col("n_neg") + 1) * F.col("p")).cast("double")
        ),
        6,
    )
    sp = (2 * F.col("n_pos") + 1).cast("double") / (
        2 * F.col("p")
    ).cast("double")
    sn = (2 * F.col("n_neg") + 1).cast("double") / (
        2 * F.col("n")
    ).cast("double")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n_pos",
            "n_neg",
            woe.alias("woe"),
            F.round((sp - sn) * woe, 6).alias("iv_term"),
        )
    )
