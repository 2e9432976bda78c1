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


def encode_corpus(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = 0,
) -> DataFrame:
    """Encode every document into its token-id sequence using ``vocab``
    (output of :func:`build_vocab`) — the step that turns a curated
    corpus into trainer-ready integer sequences.

    Returns (id, n_tokens, n_oov, ids) with ``ids`` the comma-joined
    id sequence in token order; out-of-vocabulary tokens map to
    ``unk_id``.  NULL-text docs keep a row with 0/0/''.

    Plan: posexplode keeps each token's position scan-side; the vocab
    (bounded at top-N rows by construction) broadcast-joins onto the
    token stream — no shuffle carries text except the one hash-agg that
    reassembles (position, id) pairs per doc, and that shuffle carries
    fixed-width integers only.  ``array_sort`` on (pos, id) structs
    restores order deterministically (collect_list alone is
    partition-order-dependent).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda x: x != ""
            )
        ).alias("pos", "token"),
    )
    mapped = toks.join(F.broadcast(vocab.select("token", "token_id")),
                       "token", "left").select(
        "id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(unk_id)).alias("tid"),
    )
    enc = mapped.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tid") == unk_id, 1).otherwise(0)).alias("n_oov"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tid")))
                ),
                lambda s: s.getField("tid").cast("string"),
            ),
        ).alias("ids"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(enc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce(F.col("ids"), F.lit("")).alias("ids"),
        )
    )
