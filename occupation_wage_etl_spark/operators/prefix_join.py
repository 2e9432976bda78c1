"""Derived-key dimension equi-join — the generalized form of the
reference's SOC-prefix join (views.sql:24-27, SURVEY.md §2.5 J1).

The pattern: a huge fact table whose join key is *derived* (a prefix,
``split_part``, an expression) joined to a small dimension.  The derived
key is computed scan-side (projection, no pass of its own), the dimension
is broadcast — so the fact side never shuffles.  At 100 TB this is the
only join shape that avoids repartitioning the big table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def derived_key_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key_expr: Column,
    dim_key: str,
    derived_name: str = "derived_key",
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to broadcast ``dim`` on a derived fact-side key.

    ``fact_key_expr`` is any Column expression over fact columns (e.g.
    ``F.split_part(col, lit('.'), lit(1))``).  The derived key is kept in
    the output under ``derived_name`` (matching the reference's CTE,
    views.sql:4-7).
    """
    left = fact.withColumn(derived_name, fact_key_expr)
    return left.join(F.broadcast(dim), left[derived_name] == dim[dim_key], how)
