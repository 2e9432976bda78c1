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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


def delete_by_key(
    spark: SparkSession,
    root: str,
    dataset: str,
    key_col: str,
    keys_df: DataFrame,
) -> int:
    """Targeted row deletion (GDPR-style): remove rows whose ``key_col``
    appears in ``keys_df`` and rewrite ONLY the partitions that contained
    them.

    Plain parquet has no row-level delete, so deletion is a partition
    rewrite — the scalable shape is:

      1. semi-join to find which snapshot partitions hold any victim row
         (partition-pruned scan of just the key + partition columns);
      2. anti-join those partitions' rows against the key set (broadcast
         when small);
      3. dynamic-partition-overwrite the survivors back — untouched
         partitions are never read or written.

    Returns the number of partitions rewritten.  (Table formats with
    delete files — Iceberg/Delta — replace step 3 at the metadata layer;
    the plan shape of steps 1-2 is identical.)
    """
    path = f"{root}/{dataset}"
    keys = keys_df.select(F.col(key_col)).distinct()
    df = spark.read.parquet(path)
    hit_parts = [
        r["p"]
        for r in df.join(F.broadcast(keys), key_col, "semi")
        .select(F.col(PARTITION_COL).alias("p"))
        .distinct()
        .collect()
    ]
    if not hit_parts:
        return 0
    # materialize survivors before overwriting the path they were read
    # from (Spark rejects lazy self-overwrite); cluster variant: stage to
    # a temp prefix and swap.
    survivors = (
        df.filter(F.col(PARTITION_COL).isin(hit_parts))
        .join(F.broadcast(keys), key_col, "anti")
        .localCheckpoint()
    )
    (
        survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )
    return len(hit_parts)


def merge_upsert(
    spark: SparkSession,
    root: str,
    dataset: str,
    key_col: str,
    updates_df: DataFrame,
    insert_snapshot: str | None = None,
) -> tuple[int, int]:
    """MERGE INTO on plain parquet: upsert ``updates_df`` by ``key_col``.

    Semantics (matched → UPDATE in place, unmatched → INSERT):

      1. broadcast-semi-join the update keys against the lake to find
         which snapshot partitions hold a matched row — only those
         partitions are ever read in full or rewritten;
      2. matched keys keep their original partition: hit partitions are
         rewritten as (old rows minus matched keys) ∪ (updates for keys
         living there), via dynamic partition overwrite;
      3. unmatched update rows are appended to the ``insert_snapshot``
         partition (default: today).

    Returns ``(n_partitions_rewritten, n_inserted)``.  Untouched
    partitions are never read or written — the same partition-pruned
    rewrite shape as :func:`delete_by_key`; Iceberg/Delta replace step 2
    with delete files but keep this plan shape.
    """
    path = f"{root}/{dataset}"
    date = insert_snapshot or today()
    lake = spark.read.parquet(path)
    # key → owning partition map; distinct keys only (latest-wins within
    # a batch is the caller's contract, enforced here defensively).
    updates = updates_df.dropDuplicates([key_col])
    owner = (
        lake.join(F.broadcast(updates.select(key_col)), key_col, "semi")
        .select(key_col, F.col(PARTITION_COL).alias("_owner_part"))
        .distinct()
    )
    matched = updates.join(F.broadcast(owner), key_col, "inner")
    # materialize inserts up front: their plan reads the lake (for the
    # anti-join) and must not re-read it after the overwrite below.
    inserts = (
        updates.join(F.broadcast(owner.select(key_col)), key_col, "anti")
        .withColumn(PARTITION_COL, F.lit(date))
        .localCheckpoint()
    )
    hit_parts = [
        r["_owner_part"]
        for r in matched.select("_owner_part").distinct().collect()
    ]
    n_inserted = inserts.count()
    if hit_parts:
        keep = (
            lake.filter(F.col(PARTITION_COL).isin(hit_parts))
            .join(F.broadcast(updates.select(key_col)), key_col, "anti")
        )
        replaced = matched.withColumn(
            PARTITION_COL, F.col("_owner_part")
        ).drop("_owner_part")
        # materialize before overwriting the source path (see delete_by_key)
        merged = keep.unionByName(replaced).localCheckpoint()
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .parquet(path)
        )
    if n_inserted:
        inserts.write.mode("append").partitionBy(PARTITION_COL).parquet(path)
    return len(hit_parts), n_inserted


def compact_partition(
    spark: SparkSession,
    root: str,
    dataset: str,
    snapshot_date: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite one snapshot partition into ~target-sized parquet files.

    Streaming sinks and incremental appends leave many small files;
    at scale the fix is per-partition coalesce to
    ceil(partition_bytes / target) files — computed from the actual
    on-disk size, not guessed.  Returns the new file count.
    """
    part_dir = f"{root}/{dataset}/{PARTITION_COL}={snapshot_date}"
    jvm = spark._jvm  # noqa: SLF001 — py4j filesystem access, driver-side
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(
        spark._jsc.hadoopConfiguration()  # noqa: SLF001
    )
    statuses = fs.listStatus(jvm.org.apache.hadoop.fs.Path(part_dir))
    total_bytes = sum(
        s.getLen()
        for s in statuses
        if s.getPath().getName().endswith(".parquet")
    )
    n_files = max(1, -(-total_bytes // target_file_bytes))
    # localCheckpoint materializes the partition BEFORE the overwrite —
    # Spark refuses (or corrupts) a lazy read-then-overwrite of the same
    # path.  On a cluster, write-to-temp + rename is the durable variant.
    compacted = (
        read_snapshot(spark, root, dataset, snapshot_date)
        .drop(PARTITION_COL)
        .coalesce(int(n_files))
        .localCheckpoint()
    )
    compacted.write.mode("overwrite").parquet(part_dir)
    return int(n_files)


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of ``len(cols)`` numeric columns into
    one sortable long.

    Each column is rank-normalized by the CALLER (pass values already
    scaled to [0, 2^bits)); this expression just interleaves the bit
    patterns: bit j of column i lands at position ``j * n_cols + i``.
    Pure codegen bit arithmetic — no UDF, no shuffle of its own.
    """
    n = len(cols)
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for j in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, j).bitwiseAND(F.lit(1)), j * n + i
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on the
    Z-order (Morton) curve over ``zorder_cols`` — multi-column data
    skipping without Hive partitioning.

    Why it works: parquet stores per-file and per-row-group min/max for
    every column.  Sorting the write by an interleaved-bit curve makes
    files cover small HYPER-RECTANGLES of the key space, so a scan
    filtered on ANY prefix-subset of the clustered columns prunes most
    files on footer stats alone — the same mechanism as Delta/Iceberg
    OPTIMIZE ZORDER BY, built from repartitionByRange + sortWithinPartitions.

    Columns are min/max-scaled to ``bits``-bit integers with a single
    tiny stats aggregate (one extra job over the input, scan-only).  At
    100 TB swap the exact min/max for stored table stats; the plan shape
    is unchanged.  NULLs sort to curve position 0.
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in zorder_cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in zorder_cols],
    ).collect()[0]
    scale = (1 << bits) - 1
    scaled = []
    for c in zorder_cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        rng = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
        scaled.append(
            F.coalesce(
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(rng) * scale
                ).cast("long"),
                F.lit(0),
            )
        )
    keyed = df.withColumn("_zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    n_files: int | None = None,
    fpp: float = 0.01,
    ndv: int | None = None,
) -> None:
    """Write parquet with native bloom filters on ``bloom_cols`` —
    point-lookup file/row-group skipping for high-cardinality keys that
    min/max stats can't prune (hashes, ids scattered across the range).

    Parquet bloom filters live in the file footer; Spark's vectorized
    reader consults them for equality predicates automatically, so a
    ``WHERE key = x`` scan skips every row group whose filter rules the
    value out — no index service, no extra files, works on any parquet
    client.  Complements Z-ordering (range predicates) the way a hash
    index complements a btree.
    """
    w = df.repartition(n_files).write if n_files else df.write
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.fpp#{c}", str(fpp))
        if ndv is not None:
            w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
    w.mode("overwrite").parquet(path)


def compaction_plan(
    sizes: DataFrame,
    part_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planning as a pure query: assign CONTIGUOUS
    runs of (sorted) partitions to output file groups so each group's
    byte total lands near ``target_bytes`` — the planning half of
    OPTIMIZE/compact jobs, kept contiguous so partition-range pruning
    still works on the compacted files.

    Greedy prefix-sum bucketing: group(p) = cumulative_bytes_before(p)
    div target over partitions sorted by key.  The cumulative sum runs
    on the two-level distributed prefix scan
    (:func:`~occupation_wage_etl_spark.operators.evaluation.
    _dist_cum_before`) — the size table is one row per partition, which
    at lake scale is itself a large axis, so no single-task window.
    Exact integer arithmetic (integer ``div``, never a double quotient).

    Returns (file_group, n_parts, group_bytes, first_part, last_part).
    """
    from occupation_wage_etl_spark.operators.evaluation import (
        _dist_cum_before,
    )

    summed, _ = _dist_cum_before(
        sizes, [part_col], F.col(size_col).cast("long")
    )
    assigned = summed.select(
        F.col(part_col),
        F.col(size_col),
        F.expr(f"__cumb div {int(target_bytes)}").alias("file_group"),
    )
    return assigned.groupBy("file_group").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(size_col).cast("long").alias("group_bytes"),
        F.min(part_col).alias("first_part"),
        F.max(part_col).alias("last_part"),
    )


def write_snapshot_orc(
    df: DataFrame,
    root: str,
    dataset: str,
    snapshot_date: str | None = None,
) -> str:
    """ORC variant of :func:`write_snapshot` — same hive-partitioned,
    overwrite-by-date contract, ORC file format (zlib default).

    ORC is the interchange format for Hive/Presto-era warehouses; a
    user migrating from the reference whose downstream reads ORC flips
    one call.  Predicate pushdown and column pruning work exactly as
    for parquet (Spark's OrcScan reports PushedFilters the same way);
    bloom filters per column are available via
    ``option("orc.bloom.filter.columns", ...)``.
    """
    date = snapshot_date or today()
    path = f"{root}/{dataset}"
    (
        df.withColumn(PARTITION_COL, F.lit(date))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COL)
        .orc(path)
    )
    return f"{path}/{PARTITION_COL}={date}"


def read_snapshot_orc(
    spark: SparkSession,
    root: str,
    dataset: str,
    snapshot_date: str | None = None,
) -> DataFrame:
    """ORC variant of :func:`read_snapshot` (partition-pruned reads)."""
    df = spark.read.orc(f"{root}/{dataset}")
    if snapshot_date is not None:
        df = df.filter(F.col(PARTITION_COL) == snapshot_date)
    return df
