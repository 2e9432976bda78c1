"""CSV source with enforced schema and corrupt-record quarantine.

The reference ingests HTML/Excel only (``pipeline/load_data.py``); CSV
is the adjacent interchange format every warehouse export and public
dataset drop still uses.  Built on Spark's native distributed CSV
reader with the same production policies as :mod:`sources.jsonl`:

- **schema ENFORCED, never inferred** — inference costs an extra full
  pass and silently retypes a column when one shard goes all-null;
- **corrupt-record quarantine** (PERMISSIVE +
  ``columnNameOfCorruptRecord``): a torn or ragged line lands in the
  quarantine frame instead of killing the 100 TB job;
- **header/separator/quote options** surfaced explicitly so ingest
  configs are code-reviewable, not environment defaults.

Scale notes: plain ``.csv`` files ARE splittable (unlike ``.csv.gz``,
one gzip member = one task — shard dumps into many members);
multiline-quoted CSV (``multiLine=True``) disables splitting too, so
avoid it in corpus layouts.  Column pruning pushes into the parse —
Univocity skips unrequested fields — and partition-directory layouts
prune exactly as for parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
    quote: str = '"',
) -> tuple[DataFrame, DataFrame]:
    """Read CSV with an enforced schema; returns ``(good, quarantine)``.

    ``good`` has exactly the ``schema`` columns with malformed rows
    removed; ``quarantine`` holds each malformed row's raw line for
    counting/inspection/sinking.  One distributed read feeds both.

    The parsed frame is persisted through the tracked registry
    (``operators/_cache.py``) — Spark refuses a query whose pruned
    read schema is ONLY the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN; the
    documented workaround is caching the parsed frame), and the cache
    also makes good + quarantine one parse instead of two.  Release
    with ``release_cached()`` / ``cached_scope()`` after the sink
    action, like any operator-internal persist.
    """
    from occupation_wage_etl_spark.operators._cache import cached

    full = cached(
        spark.read.schema(f"{schema}, {CORRUPT_COL} STRING")
        .option("header", header)
        .option("sep", sep)
        .option("quote", quote)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    good = full.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = full.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    sep: str = ",",
) -> None:
    """Write a CSV export (one file per partition; coalesce upstream if
    a single file is required — a 100 TB export should NOT be one file)."""
    (
        df.write.mode("overwrite")
        .option("header", header)
        .option("sep", sep)
        .csv(path)
    )
