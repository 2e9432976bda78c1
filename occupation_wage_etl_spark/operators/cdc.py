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


def delta_rows(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    cols: list[str],
) -> DataFrame:
    """Row-image CDC delta: one row per changed key with BOTH images.

    Returns (key, change_type, old_<c>..., new_<c>...) — the feed an
    incremental consumer (warehouse merge, aggregate maintenance,
    re-embedding queue) needs, where :func:`snapshot_diff` only names
    the changed columns.  Same single co-partitioned full-outer join;
    unchanged keys are dropped join-side.
    """
    o = old.select(
        F.col(key_col).alias("k"),
        *[F.col(c).alias(f"old_{c}") for c in cols],
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        *[F.col(c).alias(f"new_{c}") for c in cols],
        F.lit(True).alias("in_new"),
    )
    any_change = None
    for c in cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        any_change = d if any_change is None else (any_change | d)
    return (
        o.join(n, "k", "full_outer")
        .withColumn(
            "change_type",
            F.when(F.col("in_old").isNull(), F.lit("insert"))
            .when(F.col("in_new").isNull(), F.lit("delete"))
            .when(any_change, F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(
            F.col("k").alias(key_col),
            "change_type",
            *[F.col(f"old_{c}") for c in cols],
            *[F.col(f"new_{c}") for c in cols],
        )
    )


def apply_delta_to_agg(
    old_agg: DataFrame,
    delta: DataFrame,
    group_col: str,
    val_col: str,
    cnt_col: str = "n_rows",
    sum_col: str = "total",
) -> DataFrame:
    """Incremental maintenance of a grouped (count, sum) aggregate —
    the materialized-view path: refresh the aggregate from old state +
    CDC delta WITHOUT rescanning the base table.

    ``old_agg``: (group, cnt, sum) from the previous snapshot.
    ``delta``: output of :func:`delta_rows` over (group_col, val_col) —
    columns (key, change_type, old_/new_ group + val).

    Algebra per delta row (sums must be over an exact type — pass
    decimals, never floats, so the result is bit-identical to a full
    recompute in any engine):
      insert →                (+1, +new_val) @ new_group
      delete → (−1, −old_val) @ old_group
      update → (−1, −old_val) @ old_group AND (+1, +new_val) @ new_group
        (covers in-place value changes and group moves uniformly).
    Groups whose maintained count reaches 0 are dropped, matching a
    recompute.  One shuffle on the group key for the contribution
    aggregate + one co-partitioned outer join against the old state.
    """
    og, ov = f"old_{group_col}", f"old_{val_col}"
    ng, nv = f"new_{group_col}", f"new_{val_col}"
    is_ins = F.col("change_type") == "insert"
    is_del = F.col("change_type") == "delete"
    neg = F.when(
        ~is_ins,
        F.struct(
            F.col(og).alias("g"),
            F.lit(-1).cast("long").alias("dc"),
            (-F.col(ov)).alias("dv"),
        ),
    )
    pos = F.when(
        ~is_del,
        F.struct(
            F.col(ng).alias("g"),
            F.lit(1).cast("long").alias("dc"),
            F.col(nv).alias("dv"),
        ),
    )
    contrib = (
        delta.select(
            F.explode(F.array_compact(F.array(neg, pos))).alias("c")
        )
        .select(F.col("c.g").alias("g"), "c.dc", "c.dv")
        .groupBy("g")
        .agg(F.sum("dc").alias("dc"), F.sum("dv").alias("dv"))
    )
    merged = (
        old_agg.select(
            F.col(group_col).alias("g"),
            F.col(cnt_col).alias("oc"),
            F.col(sum_col).alias("ov"),
        )
        .join(contrib, "g", "full_outer")
        .select(
            F.col("g").alias(group_col),
            (F.coalesce(F.col("oc"), F.lit(0)) + F.coalesce(F.col("dc"), F.lit(0)))
            .cast("long")
            .alias(cnt_col),
            # sum of an all-NULL delta group is NULL, not 0 — coalesce
            # against the other side's type to keep decimal precision
            F.when(
                F.col("ov").isNotNull() & F.col("dv").isNotNull(),
                F.col("ov") + F.col("dv"),
            )
            .otherwise(F.coalesce(F.col("ov"), F.col("dv")))
            .alias(sum_col),
        )
    )
    return merged.filter(F.col(cnt_col) > 0)


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event stream:
    one row per (key, attribute run) with [valid_from, valid_to) bounds,
    valid_to NULL on the current version — the lakehouse dimension-table
    builder (Kimball SCD2) expressed as two windows, no self-join.

    Consecutive events carrying the SAME attribute value collapse into
    one version (change detection via lag); ``tiebreak_col`` must make
    (key, ts, tiebreak) unique so version order is deterministic.
    Both windows partition BY KEY — never a global sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # first-row detection must be positional (row_number), not "lag is
    # NULL" — a genuinely-NULL attribute would alias with the boundary
    changes = (
        df.withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col("__prev").eqNullSafe(F.col(attr_col))
        )
        .drop("__prev", "__rn")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        key_col,
        F.col(attr_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )
