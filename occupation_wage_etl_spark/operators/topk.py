"""Top-k operators.

- global top-k → ``orderBy(...).limit(k)``: Spark plans
  TakeOrderedAndProject (per-partition heap fold + driver merge of k
  rows per partition — no global sort shuffle).  Reference analogue:
  ``analysis.ipynb`` cell 4 sort+head, which the reference runs
  client-side on the full table.
- per-group top-k → window ``row_number`` over partitionBy(group): one
  shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k.  Pass fully deterministic ``order_by`` (include a
    tiebreaker key) — at scale, nondeterministic ties make reruns differ."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
) -> DataFrame:
    """Top-k within each group via row_number window (adds ``rank`` col)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
