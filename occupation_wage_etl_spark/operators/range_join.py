"""Range join: points joined into [lo, hi] intervals without a
nested-loop plan.

Spark plans a raw ``p.v BETWEEN i.lo AND i.hi`` join as
BroadcastNestedLoopJoin (O(points x intervals) comparisons) — fine for
a handful of intervals, fatal at scale.  The bucket-grid decomposition
turns it into an equi-join:

  points:    cell = floor(v / W)                       [projection]
  intervals: explode cells floor(lo/W) .. floor(hi/W)  [projection]
  equi-join on cell, then exact BETWEEN filter          [one shuffle]

Each point lands in exactly one cell, so a matching (point, interval)
pair meets exactly once — no dedup needed.  ``bucket_width`` trades
interval replication (hi-lo)/W per interval against join selectivity;
set it near the median interval width so replication stays O(1).
Intervals may overlap; points matching nothing are dropped (inner).

Reference analogue: none (the reference has only one equi-join,
views.sql:27); this is extension surface alongside the as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner-join each point row to every interval containing it.

    Returns all point columns + all interval columns.  ``bucket_width``
    must be positive; interval bounds are inclusive.

    ``broadcast_intervals`` (default True) pins the build side: a local
    interval list has no stats, and without the hint Spark may pick
    BuildLeft and try to broadcast the POINTS side — fatal when points
    is the fact table.  Pass False for interval sets too large to
    broadcast (falls back to a shuffled equi-join on the cell key).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))
    p = points.withColumn("_cell", F.floor(F.col(value_col) / w))
    i = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    return (
        p.join(F.broadcast(i) if broadcast_intervals else i, "_cell")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("_cell")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    broadcast_right: bool = False,
) -> DataFrame:
    """Interval x interval OVERLAP join (inclusive bounds: pairs with
    ``l.lo <= r.hi AND r.lo <= l.hi``) as a bucket-grid equi-join —
    the big-big sibling of :func:`range_join`.

    Both sides explode into the grid cells they cover; a pair of
    overlapping intervals shares every cell between max(lo) and
    min(hi), so to avoid a distinct we emit each pair ONLY in its
    first shared cell: ``cell == greatest(floor(l.lo/W), floor(r.lo/W))``
    (floor is monotone, so that equals floor(max(lo)/W), which both
    sides cover iff they overlap).  Exactly-once without dedup, one
    shuffle on the cell key.

    Column names must be disjoint across the two inputs.  Replication
    per row is (hi-lo)/W — pick ``bucket_width`` near the median
    interval width, same guidance as range_join.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))

    def _gridded(df: DataFrame, lo: str, hi: str, tag: str) -> DataFrame:
        return df.withColumn(f"_locell{tag}", F.floor(F.col(lo) / w)).withColumn(
            "_cell",
            F.explode(
                F.sequence(F.col(f"_locell{tag}"), F.floor(F.col(hi) / w))
            ),
        )

    l = _gridded(left, left_lo, left_hi, "_l")
    r = _gridded(right, right_lo, right_hi, "_r")
    return (
        l.join(F.broadcast(r) if broadcast_right else r, "_cell")
        .filter(
            (F.col("_cell") == F.greatest(F.col("_locell_l"), F.col("_locell_r")))
            & (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
        )
        .drop("_cell", "_locell_l", "_locell_r")
    )
