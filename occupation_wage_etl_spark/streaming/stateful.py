"""Custom stateful streaming operator via ``applyInPandasWithState``.

When the built-in stateful operators (windowed agg, session_window,
dropDuplicatesWithinWatermark) can't express the semantics — running
per-key accumulators, custom eviction, cross-batch machine state — the
blessed Spark shape is ``groupBy(key).applyInPandasWithState``: state is
a typed tuple per key, partitioned by the grouping key across executors,
checkpointed with the query, and evicted by timeout.  Arrow batches keep
the Python boundary columnar.

Scale notes: state volume is O(#live keys × state row width) spread over
executors; with ``ProcessingTimeTimeout`` idle keys are dropped, so
unbounded key spaces (user ids at 100 TB) stay bounded by the active
set.  The same transformation has a trivial batch equivalent
(``user_totals_batch``) — the correctness oracle for tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Running (n_events, total_value) per user, one updated row per key
    per micro-batch.  With ``idle_timeout_ms``, keys idle longer than the
    timeout emit a final row and release their state."""

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [uid], "n_events": [n], "total_value": [total]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [uid], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )


def user_totals_batch(
    events: DataFrame, user_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Batch equivalent of ``running_user_totals``'s final state — the
    oracle for streaming tests."""
    return events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col(value_col), F.lit(0.0))).alias("total_value"),
    )


HH_OUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("item", StringType()),
        StructField("count_est", LongType()),
    ]
)
HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _spacesaving_merge(sketch: dict, items: pd.Series, k: int) -> dict:
    """Fold a batch of items into a SpaceSaving sketch of ≤ k slots
    (Metwally et al.): known item → add; free slot → insert; full →
    evict the min slot, inheriting its count (counts become upper
    bounds, exact while the key space seen is ≤ k)."""
    for item, n in items.value_counts().items():
        n = int(n)
        if item in sketch:
            sketch[item] += n
        elif len(sketch) < k:
            sketch[item] = n
        else:  # SpaceSaving eviction: inherit the min count
            min_item = min(sketch, key=lambda x: (sketch[x], x))
            sketch[item] = sketch.pop(min_item) + n
    return sketch


def heavy_hitters_batch(
    events: DataFrame,
    shard_expr,
    item_col: str = "event_type",
    k: int = 8,
) -> DataFrame:
    """Batch run of the SAME SpaceSaving sketch that
    :func:`streaming_heavy_hitters` keeps as typed state — one sketch
    per shard over the full input via ``applyInPandas`` (Arrow batches,
    the sketch dict is the only per-shard memory: O(k) slots).

    ``shard_expr`` is the shard-assignment Column (the registry query
    uses a portable md5 hash so a SQL oracle can replay it; the
    streaming sibling defaults to crc32).  Whenever a shard sees ≤ k
    distinct items the sketch is EXACT — equal to the per-shard
    groupBy count — which is the regime the oracle checks (and tests
    assert the stream==batch equality on the same data).
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        sketch = _spacesaving_merge({}, pdf["item"], k)
        items = sorted(sketch, key=lambda x: (-sketch[x], x))
        return pd.DataFrame(
            {
                "shard": pdf["shard"].iloc[:1].repeat(len(items)).values,
                "item": items,
                "count_est": [sketch[i] for i in items],
            }
        )

    sharded = events.select(
        shard_expr.cast("long").alias("shard"),
        F.col(item_col).alias("item"),
    )
    return sharded.groupBy("shard").applyInPandas(fold, HH_OUT_SCHEMA)


def streaming_heavy_hitters(
    events: DataFrame,
    item_col: str = "event_type",
    shard_col: str = "user_id",
    k: int = 8,
    n_shards: int = 8,
) -> DataFrame:
    """Streaming top-k frequent items via per-shard SpaceSaving sketches.

    Each shard (hash of ``shard_col`` mod ``n_shards``) keeps at most
    ``k`` (item, count) slots as typed state; when a new item arrives at
    a full sketch it evicts the minimum slot and inherits its count
    (Metwally et al.'s SpaceSaving — counts become upper bounds with
    error ≤ min-slot, and EXACT whenever the shard sees ≤ k distinct
    items).  Emits the shard's current sketch every micro-batch; readers
    take the latest rows per shard and merge.

    Scale: state is O(n_shards · k) slots TOTAL, independent of stream
    length or key cardinality — the property that makes top-k feasible
    on unbounded streams where exact groupBy counts cannot be.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts = state.get
            sketch = dict(zip(list(items), list(counts)))
        else:
            sketch = {}
        for pdf in pdfs:
            sketch = _spacesaving_merge(sketch, pdf["item"], k)
        items = sorted(sketch, key=lambda x: (-sketch[x], x))
        state.update((items, [sketch[i] for i in items]))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "item": items,
                "count_est": [sketch[i] for i in items],
            }
        )

    sharded = events.select(
        (F.crc32(F.col(shard_col).cast("string").cast("binary")) % n_shards)
        .cast("long")
        .alias("shard"),
        F.col(item_col).alias("item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        HH_OUT_SCHEMA,
        HH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


RH_OUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("seq", LongType()),
        StructField("value", DoubleType()),
        StructField("prev_max", DoubleType()),
    ]
)
RH_STATE_SCHEMA = StructType([StructField("cur_max", DoubleType())])


def streaming_record_highs(
    events: DataFrame,
    key_col: str = "user_id",
    seq_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of :func:`~occupation_wage_etl_spark.operators.
    timeseries.record_highs`, per key: emit a row the moment a key's
    value STRICTLY exceeds everything it has streamed before (alerting
    on new all-time highs without re-scanning history).

    State per key is ONE double (the running max) — the cheapest
    possible stateful operator; within each micro-batch rows fold in
    ``seq_col`` order so batch boundaries never change which rows are
    records (same totals-order contract as the batch operator).  Emits
    (key, seq, value, prev_max) per new record, ``prev_max`` NULL for
    a key's first row.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        (cur,) = state.get if state.exists else (None,)
        out: list[tuple[int, float, float | None]] = []
        # A key's micro-batch may arrive split across multiple Arrow
        # chunks (arrow.maxRecordsPerBatch) in arbitrary row order —
        # concatenate first, THEN sort, so the seq_col fold contract
        # holds across chunk boundaries.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(seq_col)
            for seq, v in zip(pdf[seq_col], pdf[value_col]):
                if v is None or pd.isna(v):
                    continue
                v = float(v)
                if cur is None or v > cur:
                    out.append((int(seq), v, cur))
                    cur = v
        state.update((cur,))
        if out:
            yield pd.DataFrame(
                {
                    "key": [k] * len(out),
                    "seq": [s for s, _, _ in out],
                    "value": [v for _, v, _ in out],
                    "prev_max": [p for _, _, p in out],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        RH_OUT_SCHEMA,
        RH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
