"""Model-quality evaluation operators: exact ROC-AUC and calibration.

A training-data pipeline that learns quality filters (the hashed-linear
classifier in ``operators/curation.py``, heuristic scores in
``functions/text.py``) needs to EVALUATE them at corpus scale: AUC
against a labeled slice, calibration (does score 0.8 mean 80%?).  Both
operators are exact and engine-portable:

- AUC uses the rank-sum (Mann-Whitney U) identity with AVERAGE ranks
  over score ties, kept in integer arithmetic until one final double
  division — bit-identical in any engine, any partition order.
- Calibration bins are exact-rank deciles (integer bucket math, never
  an IEEE ``ntile`` surprise); per-bin mean score sums 6dp-rounded
  scores as DECIMAL (order-independent exact), mean label is an
  integer ratio.

Reference analogue: none (the reference has no model evaluation);
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` ranking ``label_col`` (0/1).

    Rank-sum identity: ``AUC = (R_pos - P(P+1)/2) / (P*N)`` with
    ``R_pos`` the sum of positives' ranks under ascending score,
    average-rank tie handling (the exact trapezoidal ROC area).
    Computed over the per-distinct-score histogram:

        2*R_pos = sum_g p_g * (2*cum_before_g + sz_g + 1)

    — every term a BIGINT (halves cancel by carrying 2R), so the single
    closing division ``(2R - P(P+1)) / (2PN)`` is the only float op.

    Scale shape: one hash aggregate to distinct scores, one ordered
    window over the score histogram (distinct-value-sized), one final
    aggregate.  Returns one row (n_pos, n_neg, auc).
    """
    s, y = F.col(score_col), F.col(label_col).cast("long")
    g = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("__s"))
        .agg(
            F.sum(y).alias("p"),
            F.sum(F.lit(1) - y).alias("n"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "__cumb",
        F.coalesce(F.sum(F.col("p") + F.col("n")).over(w), F.lit(0)),
    )
    agg = ranked.agg(
        F.sum("p").alias("P"),
        F.sum("n").alias("N"),
        F.sum(
            F.col("p")
            * (F.lit(2) * F.col("__cumb") + F.col("p") + F.col("n") + F.lit(1))
        ).alias("twoR"),
    )
    auc = (
        (F.col("twoR") - F.col("P") * (F.col("P") + 1)).cast("double")
        / (F.lit(2).cast("long") * F.col("P") * F.col("N")).cast("double")
    )
    return agg.select(
        F.col("P").alias("n_pos"),
        F.col("N").alias("n_neg"),
        auc.alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability table: exact-rank score deciles vs observed positive
    rate — the calibration readout (a well-calibrated scorer has
    mean_score ≈ pos_rate per bin).

    Binning is integer rank math — ``bin = (rank-1)*bins div total``
    over (score, id)-ordered ranks — so bins have deterministic
    membership and near-equal sizes with no IEEE boundary surprises.
    ``mean_score`` sums the 6dp-rounded scores as DECIMAL(18,6)
    (6dp doubles are exactly representable → order-independent exact
    sum); ``pos_rate`` is an integer ratio.

    Returns (bin, n_rows, n_pos, pos_rate, mean_score), bin 0-based.
    """
    s, y = F.col(score_col), F.col(label_col).cast("long")
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("__s"), y.alias("__y"), F.col(id_col).alias("__id")
    )
    binned = base.select(
        "__s",
        "__y",
        F.expr(
            f"(CAST((row_number() OVER (ORDER BY __s, __id) - 1) AS BIGINT)"
            f" * {bins}) div count(*) OVER ()"
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__y").alias("n_pos"),
            (
                F.sum("__y").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("pos_rate"),
            (
                F.sum(F.round(F.col("__s"), 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_score"),
        )
        .orderBy("bin")
    )


def ndcg_at_k(
    ranked: DataFrame,
    rank_col: str,
    rel_col: str,
    k: int,
) -> DataFrame:
    """NDCG@k over a ranked relevance table (rank 1-based, graded
    relevance) — the retrieval-quality readout for the ANN/BM25/MMR
    stack.  ``NDCG = DCG / IDCG`` with ``DCG = Σ rel_r / log2(r+1)``
    and IDCG the same sum over relevance sorted descending.

    Engine-portability: the ``1/log2(r+1)`` discounts are PRE-COMPUTED
    Python doubles inlined as literals (engine ``log`` implementations
    differ in the last ULP; a literal parses to the identical double in
    any engine), and both sums are sequential rank-ordered folds over
    the ≤ k collected rows — bit-identical everywhere, no rounding.

    Returns one row (k, n_ranked, dcg, idcg, ndcg); ndcg NULL when no
    relevant item exists (IDCG 0).
    """
    import math

    discs = [1.0 / math.log2(r + 1) for r in range(1, k + 1)]
    disc_arr = F.array(*[F.lit(d) for d in discs])
    one = (
        ranked.filter(F.col(rank_col) <= k)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(rank_col).cast("int").alias("r"),
                        F.col(rel_col).cast("double").alias("rel"),
                    )
                )
            ).alias("arr")
        )
        .select("arr", disc_arr.alias("discs"))
    )
    dcg = F.expr(
        """
        aggregate(arr, CAST(0.0 AS DOUBLE),
                  (acc, s) -> acc + s.rel * element_at(discs, s.r))
        """
    )
    idcg = F.expr(
        """
        aggregate(
          CASE WHEN size(arr) = 0 THEN array()
               ELSE sequence(1, size(arr)) END,
          CAST(0.0 AS DOUBLE),
          (acc, i) -> acc
            + element_at(array_sort(transform(arr, s -> -s.rel)), i) * -1.0
              * element_at(discs, i))
        """
    )
    return one.select(
        F.lit(k).alias("k"),
        F.size("arr").alias("n_ranked"),
        dcg.alias("dcg"),
        idcg.alias("idcg"),
        F.when(idcg > 0, dcg / idcg).alias("ndcg"),
    )
