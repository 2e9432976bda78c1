"""The reference's two warehouse views + the notebook top-k analysis.

Reference ``airflow_pipeline/views.sql`` and ``notebooks/analysis.ipynb``:

- ``vw_oews_avg_over_onet`` (views.sql:3-14): CTE adds
  ``split_part(onet_soc_code,'.',1)``; GROUP BY it with four
  ``ROUND(AVG(x), 2)`` aggregates.
- ``vw_onet_closest_oews`` (views.sql:18-27): same CTE inner-joined to
  ``oews_by_state`` on the prefix = ``soc_code``.
- notebook cell 4: top-10 ``title`` by mean ``annual_mean_wage`` over the
  join view.

Scale notes: the agg is a partial+final hash aggregate (map-side combine
shrinks the shuffle to #groups×4 doubles).  The join build side is the
OEWS table (736 rows/snapshot) — explicitly broadcast, so the 62k-row
(at 100 TB: billions-row) probe side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from occupation_wage_etl_spark.plans.onet import with_soc_prefix


def oews_avg_over_onet(onet: DataFrame) -> DataFrame:
    """``vw_oews_avg_over_onet`` (views.sql:3-14): per SOC-prefix rounded
    means of data_value / standard_error / CI bounds."""
    return (
        with_soc_prefix(onet)
        .groupBy("split_onet_soc_code")
        .agg(
            F.round(F.avg("data_value"), 2).alias("mean_data_value"),
            F.round(F.avg("standard_error"), 2).alias("mean_standard_error"),
            F.round(F.avg("lower_ci_bound"), 2).alias("mean_lower_ci_bound"),
            F.round(F.avg("upper_ci_bound"), 2).alias("mean_upper_ci_bound"),
        )
    )


def onet_closest_oews(onet: DataFrame, oews: DataFrame) -> DataFrame:
    """``vw_onet_closest_oews`` (views.sql:18-27): inner prefix equi-join.

    The reference's ``SELECT *`` keeps both sides' columns; Spark requires
    unique names to register a view, so OEWS columns that collide get an
    ``oews_`` prefix (deliberate, documented deviation).
    """
    left = with_soc_prefix(onet)
    taken = set(left.columns)
    right = oews.select(
        *[F.col(c).alias(f"oews_{c}" if c in taken else c) for c in oews.columns]
    )
    return left.join(
        F.broadcast(right),
        left["split_onet_soc_code"] == right["soc_code"],
        "inner",
    )


def top_titles_by_wage(joined: DataFrame, k: int = 10) -> DataFrame:
    """notebook analysis.ipynb cell 4: group by title, mean annual wage,
    top-k desc.  Spark plans TakeOrderedAndProject — only k rows reach the
    driver (the reference pulls the whole view into the client first).

    Ties broken by title so the result is deterministic.
    """
    return (
        joined.groupBy("title")
        .agg(F.avg("annual_mean_wage").alias("annual_mean_wage"))
        .orderBy(F.desc("annual_mean_wage"), F.asc("title"))
        .limit(k)
    )


def register_views(spark: SparkSession, onet: DataFrame, oews: DataFrame) -> None:
    """Register both views in the session catalog (V1), mirroring
    ``CREATE OR REPLACE VIEW`` in views.sql."""
    oews_avg_over_onet(onet).createOrReplaceTempView("vw_oews_avg_over_onet")
    onet_closest_oews(onet, oews).createOrReplaceTempView("vw_onet_closest_oews")
