"""Tracked operator-internal caching.

Several operators persist an intermediate (shingle tables, IVF cell
assignments, graph edge lists) because the SAME frame feeds two or more
downstream branches of the returned plan.  The persist must outlive the
function (the caller's action is what populates and reads it), so the
operator can't unpersist it itself — and a long-running session that
executes hundreds of such plans (the bench loop, a notebook, a
multi-query job) would otherwise accumulate dead cached blocks that
evict each other or spill.

``cached(df)`` persists AND registers the frame; harnesses call
``release_cached()`` after each query's terminal action (bench.py and
tools/oracle_check.py both do, in addition to ``clearCache`` where they
want a truly cold cache).  Registration holds weak references so a
released DataFrame doesn't leak driver memory either.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[weakref.ref] = []


def cached(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` and register it for bulk release.

    Returns the same DataFrame (persist is in-place on the plan)."""
    df.persist(level)
    _TRACKED.append(weakref.ref(df))
    return df


def release_cached() -> int:
    """Unpersist every tracked frame still alive; returns the count.

    Safe to call at any point: unpersisting a frame that a NOT-YET-RUN
    plan references only costs recomputation, never correctness."""
    n = 0
    for ref in _TRACKED:
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                n += 1
            except Exception:  # session already stopped
                pass
    _TRACKED.clear()
    return n
