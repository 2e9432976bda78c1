"""occupation_wage_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the reference ETL pipeline ``Darshan813/occupation-wage-etl``
(see SURVEY.md): cleaning-expression library, date-partitioned parquet
snapshot lake, SOC-prefix joins, grouped-average views, top-k analytics —
plus the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns).

Everything is expressed as lazy DataFrame plans optimized by Catalyst;
no RDDs, no driver-side loops in the hot path.
"""

from occupation_wage_etl_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
