"""Streaming sinks: micro-batch writes into the engine's snapshot lake.

``foreachBatch`` is the bridge between Structured Streaming and batch
sinks that have no native streaming writer (JDBC, dynamic-partition
parquet, MERGE targets).  Each micro-batch arrives as a plain DataFrame
with a monotonically increasing ``batch_id``; exactly-once then rests on
(sink idempotency per batch_id) × (checkpointed source offsets) — the
lake's overwrite-by-partition gives the former when partitioned by
batch, and the query checkpoint gives the latter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_to_lake(
    stream: DataFrame,
    root: str,
    dataset: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Write a streaming DataFrame into ``root/dataset`` partitioned by
    micro-batch id (idempotent per batch: a replayed batch overwrites its
    own partition only, so recovery never duplicates)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(f"{root}/{dataset}")
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
