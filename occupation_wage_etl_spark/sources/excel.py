"""Excel source (reference S3: ``pd.read_excel(Skills.xlsx)``,
``pipeline/load_data.py:282-286``).

OSS PySpark has no first-class Excel reader; the idiomatic shape is a
thin driver-side pandas read → ``createDataFrame`` (Arrow-accelerated).
Workbooks are small config/dimension artifacts — if Excel ever became a
big-data source the right move is converting to parquet at the edge, not
parallelizing xlsx parsing.

Gated on openpyxl availability (not installed in this container): tests
exercise the DataFrame path via ``from_pandas``; ``read_excel`` raises a
clear error when the engine is missing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """pandas → Spark DataFrame (Arrow path), normalizing pandas NA→NULL."""
    import pandas as pd

    return spark.createDataFrame(pdf.where(pd.notna(pdf), None))


def read_excel(spark: SparkSession, path: str, sheet_name: int | str = 0) -> DataFrame:
    """Read an Excel sheet into a DataFrame.  Requires openpyxl."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, engine="openpyxl")
    except ImportError as e:  # pragma: no cover - openpyxl absent in CI image
        raise NotImplementedError(
            "Excel ingestion requires openpyxl; convert the workbook to "
            "parquet/csv at the edge or install openpyxl"
        ) from e
    return from_pandas(spark, pdf)
