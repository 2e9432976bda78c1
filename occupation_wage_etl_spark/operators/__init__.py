"""Relational + training-data-pipeline operators.

- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity`` — brute-force and LSH-bucketed nearest-neighbor search
- ``topk``       — top-k global and per-group
- ``prefix_join``— derived-key dimension equi-join (broadcast)
- ``text_analysis`` — whole-table text ops (explode + codegen aggregate)
"""

from occupation_wage_etl_spark.operators import (
    dedup,
    prefix_join,
    similarity,
    text_analysis,
    topk,
)

__all__ = ["dedup", "similarity", "topk", "prefix_join", "text_analysis"]
