"""O*NET skills cleaning pipeline.

Reference: ``SkillsDataLoader.clean_skills_data``
(``pipeline/load_data.py:221-233``): snake_case headers (P2), parse
``date`` from ``MM/YYYY`` (F5), null-normalize.  Types arrive
pandas-inferred from Excel (FIXTURES.md §3) and pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import cleaning


def clean_onet(raw: DataFrame) -> DataFrame:
    """Raw O*NET Skills sheet → cleaned (snake_case names, typed date)."""
    renamed = raw.toDF(*[cleaning.clean_onet_column_name(c) for c in raw.columns])
    if "date" in renamed.columns:
        renamed = renamed.withColumn("date", cleaning.parse_month_year(F.col("date")))
    return renamed


def with_soc_prefix(onet: DataFrame, code_col: str = "onet_soc_code") -> DataFrame:
    """Add the derived join key ``split_onet_soc_code`` =
    ``split_part(onet_soc_code, '.', 1)`` (views.sql:4-7,19-22 CTE)."""
    return onet.withColumn("split_onet_soc_code", cleaning.soc_prefix(F.col(code_col)))
