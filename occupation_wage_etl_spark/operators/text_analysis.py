"""Whole-table text-analysis operators.

The sibling expressions in ``functions.text`` (quality_score, lang_id, …)
are per-row Column forms; higher-order array functions there are
interpreted per element.  For whole-table runs over billions of docs the
operators here restructure the hot ones as explode → whole-stage-codegen
hash-aggregate: map-side partial aggregation collapses each partition to
one row per doc before any exchange, so the shuffle carries ~#docs rows
regardless of document length (same design as
``operators.dedup.simhash_fingerprints``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import text as T


def lang_id_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pred_lang) for every row — same semantics as
    ``functions.text.lang_id`` (stopword-hit argmax; zero hits or ties →
    'und'), restructured for throughput.

    Plan: explode tokens → per-doc conditional counts per language (one
    codegen aggregate with ``IN <10 literals>`` predicates) → argmax.
    ``tokens`` never yields an empty array (blank text → [""]), so no doc
    drops out of the aggregate.
    """
    codes = sorted(T.LANG_STOPWORDS)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(T.tokens(F.col(text_col))).alias("t"),
    )
    counts = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("t").isin(T.LANG_STOPWORDS[c]), 1).otherwise(0)
            ).alias(f"h_{c}")
            for c in codes
        ]
    )
    best = F.greatest(*[F.col(f"h_{c}") for c in codes])
    n_best = sum(
        (F.when(F.col(f"h_{c}") == best, 1).otherwise(0) for c in codes),
        start=F.lit(0),
    )
    argmax = F.lit(None).cast("string")
    # first match in sorted code order — only reached when the max is unique
    for c in reversed(codes):
        argmax = F.when(F.col(f"h_{c}") == best, F.lit(c)).otherwise(argmax)
    return counts.select(
        F.col("id").alias(id_col),
        F.when(best == 0, F.lit("und"))
        .when(n_best > 1, F.lit("und"))
        .otherwise(argmax)
        .alias("pred_lang"),
    )
