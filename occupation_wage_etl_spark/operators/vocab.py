"""Corpus vocabulary building (document frequency -> token ids).

Plan shape at 100 TB:

  scan -> project tokens -> array_distinct -> explode   [no shuffle]
  groupBy(token) count                                   [one shuffle,
      map-side partial agg collapses each partition to its distinct
      token set first -- for natural-language vocabularies that is
      O(vocab) per partition, not O(corpus)]
  global top-N by (df desc, token asc)                   [single-partition
      window over <= N * partitions pre-truncated rows]

The final ranking pre-truncates each partition to its local top-N
before the single-partition global sort, so the driver-side stage sees
at most N * shuffle_partitions rows regardless of corpus size.

Reference analogue: none; training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Top-N tokens by document frequency with dense ids.

    Returns (token, doc_freq, token_id); token_id is 1-based in
    (doc_freq desc, token asc) order — fully deterministic, so the
    DuckDB oracle reproduces ids exactly.
    """
    tok = (
        df.select(
            F.explode(
                F.array_distinct(F.split(F.col(text_col), r"\s+"))
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    # local top-N per partition first: the global (unpartitioned) window
    # then ranks at most N rows per input partition instead of the full
    # vocabulary.
    order = [F.desc("doc_freq"), F.asc("token")]
    local = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    pruned = (
        tok.withColumn("_lr", F.row_number().over(local))
        .filter(F.col("_lr") <= top_n)
        .drop("_lr")
    )
    w = Window.orderBy(*order)
    return (
        pruned.withColumn("token_id", F.row_number().over(w))
        .filter(F.col("token_id") <= top_n)
    )
