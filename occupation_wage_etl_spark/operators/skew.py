"""Skew-resistant join: explicit key salting.

AQE's skew-join splitting (on in ``session.ENGINE_CONF``) handles most
runtime skew, but it only kicks in when a sort-merge join's partition
stats cross thresholds.  For *known* pathological keys (the null key, a
celebrity user, a default enum) explicit salting is the deterministic
fix: replicate the build side ``salt`` times and spread the probe side
across replicas, so one hot key occupies ``salt`` tasks instead of one.

Cost model: build side bytes × salt (only acceptable for dimension-ish
build sides); probe side gets one extra narrow column.  For broadcast
joins salting is pointless (no shuffle to skew) — this is for the
shuffle-join regime where the build side is too big to broadcast but
small enough to replicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join on ``key`` with ``salt``-way key splitting.

    ``salt_source`` picks the probe row's replica; default is a
    deterministic spread by xxhash64 of the key plus monotonically
    increasing id is NOT used (non-deterministic across runs) — instead
    we hash the probe's whole row of join-irrelevant entropy via
    ``F.rand`` alternatives: callers wanting exact determinism pass e.g.
    ``F.col("some_unique_id")``.  Default: xxhash64 over all probe
    columns, which is deterministic for a given dataset.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        # right/full outer would emit every unmatched BUILD row once per
        # salt replica — silently corrupt. De-salting those would need a
        # post-join dedup keyed on the build side; not worth it here.
        raise ValueError(
            f"salted_join supports inner/left-ish joins only, got {how!r}: "
            "the build side is replicated `salt` times, so right/full outer "
            "joins would duplicate unmatched build rows"
        )
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in probe.columns])
    p = probe.withColumn("__salt", F.pmod(salt_source, F.lit(salt)).cast("int"))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = p.join(b, [key, "__salt"], how)
    return out.drop("__salt")


def key_histogram(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Join-key skew diagnosis: the top-k heaviest keys with their row
    counts and share of the table — the measurement that decides whether
    a join needs :func:`salted_join` (and what ``salt`` to use).

    One map-side-combined count aggregate; the global total rides along
    via a 1-row broadcast, and the top-k is TakeOrderedAndProject —
    nothing driver-side, nothing quadratic.  ``share`` is an exact
    integer ratio (single double division, engine-portable).
    """
    counts = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "cnt",
            (F.col("cnt") / F.col("total")).alias("share"),
        )
        .orderBy(F.desc("cnt"), F.asc(key_col))
        .limit(k)
    )
