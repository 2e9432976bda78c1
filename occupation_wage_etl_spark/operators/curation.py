"""Corpus curation pipeline — the training-data funnel as ONE lazy plan.

Composes the engine's text operators in the order a 100 TB pre-training
pipeline runs them (cheapest filter first, so each stage scans less):

    quality score (scan-side exprs)           — drops low-signal docs
    → language ID (explode + codegen agg)     — keeps target languages
    → exact dedup (hash groupBy + semi-join)  — one canonical doc per
                                                 normalized content

Everything stays one Catalyst plan: the quality filter is a scan-side
predicate, lang-ID shuffles (id, 5 counters) rows, dedup shuffles
(digest, id) pairs — full text never enters an exchange; the final
semi-joins re-attach payloads by id.  Every stage is individually
oracle-checked (q17, q18, q12); the composition is q34.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import text as T
from occupation_wage_etl_spark.operators import dedup, text_analysis


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    langs: Sequence[str] | None = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter → lang-gate → dedup; returns the surviving rows of ``df``
    plus ``quality`` and ``pred_lang`` columns.

    Dedup keeps the min-id member of each exact-duplicate group *among
    the survivors* (filters first: a high-quality copy must not be
    dropped because a junk copy of the same text had a lower id... the
    junk copy was already gone)."""
    scored = df.withColumn("quality", T.quality_score(F.col(text_col)))
    kept = scored.filter(F.col("quality") >= min_quality)
    if langs:
        lang = text_analysis.lang_id_table(kept, text_col=text_col, id_col=id_col)
        kept = kept.join(
            lang.filter(F.col("pred_lang").isin(list(langs))), id_col, "inner"
        )
    return dedup.exact_dedup(kept, text_col=text_col, id_col=id_col)
