"""Snapshot diff / change-data-capture operators.

A lakehouse ingesting periodic full snapshots (the reference's monthly
OEWS re-scrape is exactly this shape — ``pipeline/load_data.py`` writes
a dated snapshot per run, reference ``load_data.py:150-166``) needs the
*delta* between two snapshots: which keys appeared, disappeared, or
changed, and which columns changed.  Downstream that delta drives
incremental warehouse loads (append only the changes, not the world)
and training-data refresh (re-embed only changed documents).

Scale design: one full outer join co-partitioned on the key — the only
shuffle.  Column comparison happens join-side in codegen via null-safe
equality (``<=>``); no row is materialized unless it changed.  At 100 TB
both snapshots are bucketed by key in the lake (``sources/lake.py:
write_bucketed``), which turns the exchange into a zipped local join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level delta between two keyed snapshots.

    Returns (key, change_type, changed_cols):
      - ``insert``: key only in ``new``;
      - ``delete``: key only in ``old``;
      - ``update``: key in both with ≥1 differing compare column —
        ``changed_cols`` is the comma-joined sorted list of them.
    Unchanged keys are dropped join-side (never materialized).

    Null-safe semantics: a column counts as changed iff
    ``NOT (old <=> new)`` — NULL→value and value→NULL are changes,
    NULL→NULL is not.
    """
    o = old.select(
        F.col(key_col).alias("k"),
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(True).alias("in_new"),
    )
    joined = o.join(n, "k", "full_outer")
    changed = [
        F.when(
            ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
        ).otherwise(F.lit(None))
        for c in sorted(compare_cols)
    ]
    changed_cols = F.concat_ws(
        ",", F.array_compact(F.array(*changed))
    )
    return (
        joined.select(
            F.col("k").alias(key_col),
            F.when(F.col("in_old").isNull(), F.lit("insert"))
            .when(F.col("in_new").isNull(), F.lit("delete"))
            .when(changed_cols != "", F.lit("update"))
            .otherwise(F.lit(None))
            .alias("change_type"),
            F.when(
                F.col("in_old").isNotNull() & F.col("in_new").isNotNull(),
                changed_cols,
            ).otherwise(F.lit("")).alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )
