"""Relational + training-data-pipeline operators.

- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity`` — brute-force and LSH-bucketed nearest-neighbor search
- ``topk``       — top-k global and per-group
- ``prefix_join``— derived-key dimension equi-join (broadcast)
- ``text_analysis`` — whole-table text ops (explode + codegen aggregate)
- ``asof_join``  — point-in-time join (union-merge, one shuffle+sort)
- ``curation``   — quality→lang→dedup corpus funnel as one plan
- ``multimodal`` — binary media columns: sniff/decode/resize/features
"""

from occupation_wage_etl_spark.operators import (
    asof_join,
    curation,
    decontaminate,
    dedup,
    multimodal,
    prefix_join,
    similarity,
    skew,
    text_analysis,
    topk,
)

__all__ = [
    "asof_join",
    "curation",
    "decontaminate",
    "dedup",
    "multimodal",
    "similarity",
    "skew",
    "topk",
    "prefix_join",
    "text_analysis",
]
