"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``occupation_wage_etl_spark`` (see SURVEY.md
for the operator blueprint and queries.py for determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from occupation_wage_etl_spark.queries import ORACLE_SQL, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    scan→broadcast-join→group-avg→top-k lifecycle (SURVEY.md §3.3) on
    the lineitem/part tables."""
    return SPARK_QUERIES["q02_top_parts_by_avg_price"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data extension operators)."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every registry entry has one
    (the approximate operators q21–q24/q57 use md5-seeded deterministic
    constructions precisely so DuckDB can replay their funnels
    bit-exactly)."""
    return dict(ORACLE_SQL)
