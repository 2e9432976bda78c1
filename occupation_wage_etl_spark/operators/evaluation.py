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

Both need a GLOBAL prefix sum over a totally-ordered column — the one
primitive a naive window (``ORDER BY`` with no ``PARTITION BY``) turns
into a single-partition sort of the whole input, the classic Spark
scale cliff.  :func:`_dist_cum_before` computes the identical integers
with the two-level distributed scan instead: range-partition on the
order key, per-partition cumulative sums (parallel spillable sorts),
and a partition-offset table of ≤ ``spark.sql.shuffle.partitions``
rows — the ONLY globally-ordered window in either plan runs over that
config-bounded table, never over data-sized input.

Reference analogue: none (the reference has no model evaluation);
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators._cache import cached


def _dist_cum_before(
    df: DataFrame,
    order_cols: list[str],
    weight: F.Column,
) -> tuple[DataFrame, DataFrame]:
    """Distributed exclusive prefix sum: append ``__cumb`` = sum of
    ``weight`` over all rows STRICTLY BEFORE each row in ``order_cols``
    order (which must be a total order — no duplicate keys).

    Two-level scan, the textbook parallel prefix shape:

    1. ``repartitionByRange`` on the order key → partition *i* holds a
       contiguous key range below partition *i+1*'s.  The shuffled
       frame is persisted (:func:`cached`) because range boundaries
       come from SAMPLING — two independent evaluations could pick
       different boundaries, so both consumers below must read the same
       materialization for the offsets to line up.
    2. within each partition, a window ordered by the key — parallel
       per-partition external sorts, never a global one.
    3. per-partition totals (≤ shuffle-partitions rows) get their own
       exclusive prefix sum via an ordered window over ``__pid`` — the
       only unpartitioned window, over a CONFIG-bounded row count —
       and broadcast back as offsets.

    Returns (rows + ``__cumb``, the 1-row grand-total frame) — the
    total rides along so callers don't rescan the input for ``n``.
    """
    sp = df.sparkSession
    n_parts = int(sp.conf.get("spark.sql.shuffle.partitions"))
    parted = cached(
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__w", weight)
    )
    totals = parted.groupBy("__pid").agg(F.sum("__w").alias("__pt"))
    w_p = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__pt").over(w_p), F.lit(0)).alias("__off"),
    )
    total = totals.agg(F.sum("__pt").alias("__total"))
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        parted.withColumn(
            "__cin", F.coalesce(F.sum("__w").over(w_in), F.lit(0))
        )
        .join(F.broadcast(offsets), "__pid")
        .withColumn("__cumb", F.col("__cin") + F.col("__off"))
        .drop("__pid", "__w", "__cin", "__off")
    )
    return out, total


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

    Scale shape: one hash aggregate to distinct scores, then the
    distributed two-level prefix sum (:func:`_dist_cum_before`) for
    each score's cumulative-before count — no globally-ordered window
    over data-sized input, so raw double scores (distinct ≈ rows) cost
    the same plan as coarse ones.  Returns one row (n_pos, n_neg, auc).
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
    ranked, _ = _dist_cum_before(g, ["__s"], F.col("p") + F.col("n"))
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
    The rank comes from the distributed two-level prefix count
    (:func:`_dist_cum_before`; ``rank-1`` = rows strictly before under
    the (score, id) total order), NOT from a global ``row_number``
    window — every sort in the plan is per-range-partition.
    ``mean_score`` sums the 6dp-rounded scores as DECIMAL(18,6)
    (6dp doubles are exactly representable → order-independent exact
    sum); ``pos_rate`` is an integer ratio.

    Returns (bin, n_rows, n_pos, pos_rate, mean_score), bin 0-based.
    """
    s, y = F.col(score_col), F.col(label_col).cast("long")
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("__s"), y.alias("__y"), F.col(id_col).alias("__id")
    )
    ranked, total = _dist_cum_before(base, ["__s", "__id"], F.lit(1))
    binned = ranked.crossJoin(F.broadcast(total)).select(
        "__s",
        "__y",
        F.expr(f"(__cumb * {bins}) div __total").alias("bin"),
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
