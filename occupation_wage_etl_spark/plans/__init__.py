"""Logical plans reproducing the reference's pipelines and views.

- ``oews``  — OEWS wage-table cleaning pipeline (reference transform chain)
- ``onet``  — O*NET skills cleaning pipeline
- ``views`` — the two SQL views + notebook top-k analysis
"""

from occupation_wage_etl_spark.plans import oews, onet, views

__all__ = ["oews", "onet", "views"]
