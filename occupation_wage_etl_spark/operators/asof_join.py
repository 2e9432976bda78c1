"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

Semantics: for each left row, attach the single most recent right row of
the same key with ``right.ts <= left.ts`` (left-join flavor: unmatched
left rows keep NULL right columns).  The standard tool for
"price/feature as of event time" lookups.

Plan shape (the scalable formulation — NOT a range self-join):

    union(left tagged 1, right tagged 0)
      → single shuffle+sort on (key, ts, side)
      → running ``last(right_payload, ignorenulls)`` window
      → filter side=1

One exchange + one sort, O(n log n) per key, no matter how wide the time
range — a naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` +
row_number explodes quadratically within hot keys at 100 TB.  The window
frame is rowsBetween(unboundedPreceding, current), which Spark evaluates
as a streaming running accumulator over the sorted partition (no frame
re-scan per row).

Ties: right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
exactly-coincident right row matches (``>=`` semantics, like DuckDB's
ASOF JOIN).  Multiple right rows at one (key, ts) are nondeterministic —
pre-aggregate the right side to unique (key, ts) first (as the q27 query
does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time left join: latest right row with ``right[on] <=
    left[on]`` per ``by`` key.  Right payload columns keep their names,
    ``suffix``-ed when they collide with a left column."""
    l_pay = [c for c in left.columns if c not in (by, on)]
    r_pay = [c for c in right.columns if c not in (by, on)]

    l_struct_t = left.select(F.struct(*l_pay).alias("s")).schema["s"].dataType
    r_struct_t = right.select(F.struct(*r_pay).alias("s")).schema["s"].dataType

    l2 = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        F.struct(*l_pay).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    r2 = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        F.struct(*r_pay).alias("__r"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(on, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        l2.unionByName(r2)
        .withColumn("__rm", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_r = [
        F.col(f"__rm.{c}").alias(c + suffix if c in left.columns else c)
        for c in r_pay
    ]
    return merged.select(F.col(by), F.col(on), *[F.col(f"__l.{c}").alias(c) for c in l_pay], *out_r)
