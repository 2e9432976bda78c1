"""Market-basket association rules and item-item collaborative filtering.

The engine's curation suite scores documents individually; a corpus (or
a retail lake like TPC-H's orders/lineitem) also carries CO-OCCURRENCE
signal: which items appear together in a basket, and which items are
bought by the same users.  Two classic operators expose it:

- :func:`association_rules` — A-priori frequent-pair mining lifted to
  directional rules (antecedent -> consequent) with support,
  confidence, and lift.  The basket self-join is the canonical
  "pairs within group" shape (same skeleton as
  ``text_analysis.cooccurrence_pairs``), but rules add the directional
  conditional probabilities, which is what a curation policy actually
  consumes ("docs with boilerplate X also carry boilerplate Y with
  p=0.93 -> drop both").
- :func:`item_item_cf` — item-item cosine similarity over the binary
  user x item incidence matrix (Sarwar et al., WWW'01), the
  co-purchase recommender.  cos(a,b) = |U(a) ∩ U(b)| / sqrt(|U(a)|·|U(b)|)
  on binary data, so the whole computation is exact integer counting
  with one final float division — bit-stable for the oracle.

Scale shape (both operators):

- **A-priori prune first**: items below the support floor are removed
  BEFORE the pair join, shrinking the self-join input — the classic
  downward-closure cut.
- **Basket cap**: the pair join emits d² pairs per basket; a power-law
  basket (one user who bought everything, one doc carrying every
  shingle) would dominate the shuffle.  Baskets larger than
  ``max_basket`` are DROPPED (the standard noise rule — a basket that
  big carries no pairwise signal), bounding per-key fan-out exactly
  like the winnowing df cap in ``dedup.winnowing_pairs``.
- Everything else is hash-aggregate + equi-join: pair counts shuffle
  on (a, b), marginals on the item key, and the final top-k is a
  TakeOrderedAndProject / per-item bounded window — no global sort of
  the pair space.

Reference analogue: none; training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators._cache import cached
from occupation_wage_etl_spark.operators._conf import broadcast_row_bound


def _counted_hint(keep: DataFrame):
    """Decide broadcast-vs-AQE for the cached pruned marginal with one
    COUNTED bound instead of either an unbounded forced hint (the
    round-4 OOM mode) or a bare AQE guess (which planned these
    item-type-sized sides as sort-merge at every audited scale —
    AQE only converts when its size *statistics* clear the threshold,
    and a fresh cache has none).

    The count is cheap — ``keep`` is cached and feeds 3-4 downstream
    joins, so the count materializes work those joins need anyway — and
    the returned hint function is ``F.broadcast`` iff the counted rows
    fit under :func:`~.._conf.broadcast_row_bound` (narrow key+count
    rows, default 4M ≈ 100 MB serialized).  Above the bound the plan is
    left to AQE: no OOM mode exists at any size.
    """
    if keep.count() <= broadcast_row_bound(keep.sparkSession):
        return F.broadcast
    return lambda d: d


def _capped_items(
    df: DataFrame, basket_col: str, item_col: str, max_basket: int
) -> DataFrame:
    """Distinct (basket, item) with oversized baskets dropped.

    One ``collect_set`` hash-aggregate does dedup + size-cap in a
    single shuffle (sets partially merge map-side), and the explode
    back to rows is narrow — so every downstream consumer (marginals,
    the pair self-join on ``b``) inherits HashPartitioning(b) from the
    cached aggregate and the pair join needs NO further exchange.
    The naive distinct + groupBy-size + join-back shape costs three
    shuffles and re-exchanges both self-join sides; this one was
    measured 3x faster at sf0.1.
    """
    return cached(
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .groupBy("b")
        .agg(F.collect_set("i").alias("iset"))
        .filter(F.size("iset") <= max_basket)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 3,
    k: int = 50,
    max_basket: int = 1000,
) -> DataFrame:
    """Directional association rules from frequent item pairs.

    Returns the top-``k`` rules by lift (ties: antecedent, consequent)
    with columns (antecedent, consequent, pair_baskets, confidence,
    lift).  Both directions of every frequent pair are emitted —
    confidence is asymmetric.

    confidence = P(consequent | antecedent) = pair / n(antecedent)
    lift       = confidence / P(consequent) = pair·N / (n(a)·n(c))

    Exact-arithmetic note: both ratios are a single int64->double
    division (the numerator product stays in int64), so Spark and any
    ANSI oracle produce bit-identical doubles.
    """
    sets = _capped_items(df, basket_col, item_col, max_basket)
    # N as a broadcast scalar, not a driver .count(): keeps the whole
    # rule computation one lazy plan / one job (the count would
    # materialize the cache in a separate job just for one number).
    nb = sets.agg(F.count(F.lit(1)).alias("__n_baskets"))
    items = sets.select("b", F.explode("iset").alias("i"))
    marg = items.groupBy("i").agg(F.count(F.lit(1)).alias("n_item"))
    # A-priori downward closure: a pair reaching min_pair_support needs
    # both marginals to reach it too — prune before the self-join.
    # Cached: the marginal feeds both self-join sides and both rule
    # endpoints (4 consumers), and it is small (item-type-sized).
    keep = cached(marg.filter(F.col("n_item") >= min_pair_support))
    # counted-bound broadcast decision (see _counted_hint): hint iff
    # the pruned marginal's actual row count fits the config bound,
    # else leave AQE to plan it — no unbounded-OOM mode either way.
    hint = _counted_hint(keep)
    pruned = items.join(hint(keep.select("i")), "i").select("b", "i")
    lhs = pruned.select("b", F.col("i").alias("ia"))
    rhs = pruned.select("b", F.col("i").alias("ic"))
    pair = (
        lhs.join(rhs, "b")
        .filter(F.col("ia") != F.col("ic"))
        .groupBy("ia", "ic")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_pair_support)
    )
    ma = hint(keep.select(F.col("i").alias("ia"), F.col("n_item").alias("na")))
    mc = hint(keep.select(F.col("i").alias("ic"), F.col("n_item").alias("nc")))
    scored = (
        pair.join(ma, "ia")
        .join(mc, "ic")
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("ia").alias("antecedent"),
            F.col("ic").alias("consequent"),
            "pair_baskets",
            (F.col("pair_baskets").cast("double") / F.col("na")).alias(
                "confidence"
            ),
            (
                (F.col("pair_baskets") * F.col("__n_baskets")).cast("double")
                / (F.col("na") * F.col("nc")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    ).limit(k)


def item_item_cf(
    df: DataFrame,
    user_col: str,
    item_col: str,
    min_users: int = 5,
    n_neighbors: int = 3,
    max_basket: int = 1000,
) -> DataFrame:
    """Item-item cosine neighbors over binary user-item incidence.

    Returns (item, neighbor, n_both, cosine, rank) — the
    ``n_neighbors`` most-similar items per item, cosine on the binary
    purchase vectors:

        cos(a, b) = |U(a) ∩ U(b)| / sqrt(|U(a)| · |U(b)|)

    Per-item ranking is a window PARTITIONED on the item key (bounded
    per-partition work, no global sort); ties break on neighbor id so
    the result is deterministic.  The user self-join is capped by
    ``max_basket`` (see module docstring) — the binary/cap variant of
    DIMSUM's probabilistic row cap.
    """
    sets = _capped_items(df, user_col, item_col, max_basket)
    items = sets.select("b", F.explode("iset").alias("i"))
    marg = items.groupBy("i").agg(F.count(F.lit(1)).alias("n_users"))
    keep = cached(marg.filter(F.col("n_users") >= min_users))
    # counted-bound broadcast decision, same contract as
    # association_rules (see _counted_hint)
    hint = _counted_hint(keep)
    pruned = items.join(hint(keep.select("i")), "i")
    lhs = pruned.select("b", F.col("i").alias("item"))
    rhs = pruned.select("b", F.col("i").alias("neighbor"))
    both = (
        lhs.join(rhs, "b")
        .filter(F.col("item") != F.col("neighbor"))
        .groupBy("item", "neighbor")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = hint(
        keep.select(F.col("i").alias("item"), F.col("n_users").alias("na"))
    )
    nb = hint(
        keep.select(
            F.col("i").alias("neighbor"), F.col("n_users").alias("nb")
        )
    )
    scored = (
        both.join(na, "item")
        .join(nb, "neighbor")
        .select(
            "item",
            "neighbor",
            "n_both",
            (
                F.col("n_both").cast("double")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cosine"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_neighbors)
        .select(
            "item",
            "neighbor",
            "n_both",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )
