"""Small shared config readers for operator internals."""

from __future__ import annotations


def shuffle_partitions(spark) -> int:
    """``spark.sql.shuffle.partitions`` as an int.

    Falls back to ``sparkContext.defaultParallelism`` when the conf
    value is not a plain integer literal (some AQE setups configure it
    as ``'auto'``) — the distributed prefix-scan primitives only need a
    reasonable partition COUNT, not the exact conf semantics, and a
    plan-build-time ValueError would take down every metric built on
    them (roc_auc, AP, best_threshold, spearman, KW, SNB, schedules).
    """
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        return int(spark.sparkContext.defaultParallelism)
