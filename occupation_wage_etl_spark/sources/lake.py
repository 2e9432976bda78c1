"""Date-partitioned parquet snapshot lake.

Reference contract (``pipeline/load_data.py:248-254``, README.md:58-62):
one snapshot dir per dataset per day, ``data/<dataset>/<YYYY-MM-DD>/``.
Here the date is a real hive partition column (``snapshot_date``), so

- writes are idempotent per snapshot (dynamic partition overwrite
  replaces ONLY the written date — re-running a day never duplicates,
  fixing the reference's append-duplication, SURVEY.md §4),
- reads with a date predicate are partition-pruned (Catalyst skips
  other days' files entirely — at 100 TB, the difference between
  scanning one day and scanning all of history).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "snapshot_date"


def today() -> str:
    """Driver-side snapshot date (reference ``datetime.today_date()``,
    load_data.py:239-246 — without the stdlib-shadowing class)."""
    return _dt.date.today().isoformat()


def write_snapshot(
    df: DataFrame,
    root: str,
    dataset: str,
    snapshot_date: str | None = None,
) -> str:
    """Write one dataset snapshot, overwrite-by-partition (idempotent).

    Uses dynamic partition overwrite so only the target date's partition
    is replaced; other snapshots are untouched.
    """
    date = snapshot_date or today()
    path = f"{root}/{dataset}"
    (
        df.withColumn(PARTITION_COL, F.lit(date))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )
    return f"{path}/{PARTITION_COL}={date}"


def read_snapshot(
    spark: SparkSession,
    root: str,
    dataset: str,
    snapshot_date: str | None = None,
) -> DataFrame:
    """Read a dataset; with ``snapshot_date`` the filter is a partition
    predicate → Catalyst prunes to that one directory."""
    df = spark.read.parquet(f"{root}/{dataset}")
    if snapshot_date is not None:
        df = df.filter(F.col(PARTITION_COL) == snapshot_date)
    return df


def latest_snapshot(spark: SparkSession, root: str, dataset: str) -> DataFrame:
    """Read only the most recent snapshot (partition-pruned)."""
    df = spark.read.parquet(f"{root}/{dataset}")
    latest = df.select(F.max(PARTITION_COL).alias("d")).first()["d"]
    return df.filter(F.col(PARTITION_COL) == latest)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist a catalog table bucketed (and optionally sorted) by a join
    key.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT an exchange on either side — at 100 TB this turns the
    nightly fact⋈fact join from the dominant shuffle into a local merge
    per bucket.  Bucket counts must be chosen once per key domain
    (power of two; ≈ target parallelism) because only equal counts (or
    exact multiples, with ``spark.sql.bucketing.coalesceBucketsInJoin``)
    co-locate.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)
