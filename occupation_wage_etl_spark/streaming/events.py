"""Event-stream operators (Structured Streaming + batch-equivalent plans).

Every operator has the same signature in batch and streaming mode (the
transformation is identical DataFrame code — the only difference is
whether the input came from ``read`` or ``readStream``).  Batch mode is
what the correctness oracle checks; streaming mode is exercised by tests
with a file source + memory sink.

Operators: tumbling/sliding window aggregation with watermarks,
sessionization (gap-based session windows), streaming dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling (or sliding) window counts + value sum per event_type.

    Streaming mode adds a watermark so state for windows older than
    ``watermark`` is evicted — the thing that keeps unbounded streams
    bounded-memory at scale.  Late rows within the watermark still update
    their window; beyond it they're dropped.
    """
    df = events
    if streaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        df.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    streaming: bool = False,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization.

    Streaming: native ``session_window`` (stateful, watermark-evicted).
    Batch: the classic lag/cumsum reformulation — window over user,
    session boundary where gap exceeded, running sum → session id.  Both
    produce (user_id, session_start, session_end, n_events).
    """
    if streaming:
        sw = F.session_window(F.col(ts_col), gap)
        return (
            events.withWatermark(ts_col, watermark)
            .groupBy(sw.alias("w"), F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col(user_col),
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    from pyspark.sql import Window

    gap_expr = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(user_col).orderBy(ts_col)
    boundary = (
        F.when(
            F.col(ts_col) > F.lag(ts_col).over(w) + gap_expr, 1
        ).otherwise(0)
    )
    with_session = (
        events.withColumn("__new_session", F.coalesce(boundary, F.lit(0)))
        .withColumn("__session_id", F.sum("__new_session").over(w))
    )
    return (
        with_session.groupBy(user_col, "__session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__session_id")
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (``dropDuplicatesWithinWatermark`` keeps state bounded)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def dedup_events_batch(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Deterministic batch analogue of :func:`streaming_dedup`'s final
    table: one row per key, keeping the EARLIEST event (event-time asc,
    id asc tie-break).  ``dropDuplicatesWithinWatermark`` keeps the
    first-ARRIVING row; replaying a log in event-time order makes that
    the earliest one, which is what this computes — so stream and batch
    agree on ordered replays (asserted in tests) and the batch form is
    fully oracle-checkable.

    Plan: one window ranked per key — the shuffle carries only the key
    columns as partition keys; no global sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "15 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Stream-stream inner join: right events within ``max_delay`` AFTER
    the matching left event (click -> conversion attribution shape).

    In streaming mode both sides carry watermarks and the join condition
    bounds the event-time range, which is what lets Spark evict join
    state: a left row older than watermark + max_delay can never match
    again and is dropped.  Without the time bound the state store grows
    unboundedly -- the join would be rejected by Spark for exactly that
    reason.  Batch mode runs the identical condition for oracle checks.
    """
    lt, rt = f"l_{ts_col}", f"r_{ts_col}"
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias(lt),
        F.col("event_type").alias("l_type"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias(rt),
        F.col("event_type").alias("r_type"),
    )
    if streaming:
        l = l.withWatermark(lt, watermark)
        r = r.withWatermark(rt, watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col(rt) > F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l_key").alias(key),
        F.col(lt).alias("left_ts"),
        "l_type",
        F.col(rt).alias("right_ts"),
        "r_type",
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of ``events`` is
    joined to the (batch) dimension table ``dim``.

    Stream-static inner joins are stateless -- no watermark or state
    store needed, the static side is simply looked up per batch -- so
    this is the cheapest enrichment shape at scale.  With
    ``broadcast_dim`` the dimension ships to executors once per batch
    (right for catalog-sized dims); large dims fall back to a shuffled
    hash join on the key.  The identical expression works in batch mode
    for oracle checks.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, key, "inner")


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: how many users completed each step AFTER
    completing the previous one (classic view→click→purchase product
    analytics, generalized to any step list).

    Step semantics: a user counts for step i iff they have a step-i
    event at-or-after their earliest qualifying step-(i-1) moment
    (earliest-continuation recursion — the standard strict-order funnel).

    Plan: one filtered min-aggregate per step, each joined to the
    previous step's per-user frontier — i small fixed joins on
    (user, ts), no window over the whole event stream.  Counts and the
    step-over-step rate are integers and one exact division.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t"))
    )
    counts = [frontier.agg(F.count(F.lit(1)).alias("n0"))]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("u"), F.col(ts_col).alias("ts2"))
            .join(frontier, "u")
            .filter(F.col("ts2") >= F.col("t"))
            .groupBy("u")
            .agg(F.min("ts2").alias("t"))
        )
        counts.append(nxt.agg(F.count(F.lit(1)).alias(f"n{i}")))
        frontier = nxt
    wide = counts[0]
    for c in counts[1:]:
        wide = wide.crossJoin(c)
    step_rows = []
    for i, step in enumerate(steps):
        rate = (
            F.lit(None).cast("double")
            if i == 0
            else F.col(f"n{i}").cast("double") / F.col(f"n{i-1}").cast("double")
        )
        step_rows.append(
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"n{i}").alias("n_users"),
                rate.alias("conversion_from_prev"),
            )
        )
    return wide.select(F.explode(F.array(*step_rows)).alias("s")).select("s.*")


def cohort_retention(
    events: DataFrame,
    max_offset_weeks: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: group users by the epoch-week of their
    first event, then measure what fraction of each cohort is active
    0..N weeks later — the standard growth-analytics retention matrix.

    Weeks are integer epoch-week indexes (floor(unix_ts / 604800)), not
    calendar date_trunc — portable across engines and timezones by
    construction.  Two aggregates and one join, all on (user, week)
    integers; the retention rate is one exact integer division.
    """
    wk = F.floor(F.col(ts_col).cast("long") / F.lit(604800)).cast("long")
    ev = events.select(F.col(user_col).alias("u"), wk.alias("w"))
    first = ev.groupBy("u").agg(F.min("w").alias("cw"))
    act = (
        ev.join(first, "u")
        .select("cw", (F.col("w") - F.col("cw")).alias("off"), "u")
        .filter(F.col("off") <= max_offset_weeks)
        .distinct()
    )
    ret = act.groupBy("cw", "off").agg(F.count(F.lit(1)).alias("n_active"))
    size = first.groupBy("cw").agg(F.count(F.lit(1)).alias("cohort_size"))
    return ret.join(size, "cw").select(
        F.col("cw").alias("cohort_week"),
        F.col("off").alias("weeks_later"),
        "cohort_size",
        "n_active",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double"))
        .alias("retention"),
    )


def windowed_funnel(
    events: DataFrame,
    steps: list[str],
    window_minutes: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-bounded ordered funnel (the ``windowFunnel`` analytics
    primitive): per user, anchor at the EARLIEST step-1 event and count
    how many of ``steps`` complete in order within ``window_minutes`` of
    that anchor; report how many users reached each level.

    Differs from :func:`funnel_conversion` (unbounded step-over-step
    conversion) by the hard deadline — "viewed→carted→bought within an
    hour" is a different product question from "eventually bought".
    Anchoring at the earliest step-1 keeps the result deterministic and
    engine-replayable (greedy multi-anchor variants depend on scan
    order).

    Plan: per step one filtered min-aggregate joined to the previous
    frontier (same shape as funnel_conversion) with the anchor deadline
    carried along — len(steps) small hash joins on the user key, no
    windows over the raw stream.  Returns (level, step, n_users) with
    level 1..len(steps); n_users is users whose furthest step is ≥ level.
    """
    us = F.unix_micros(F.col(ts_col))
    bound = window_minutes * 60 * 1_000_000
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .select(F.col(user_col).alias("u"), us.alias("t"))
        .groupBy("u")
        .agg(F.min("t").alias("t"))
        .withColumn("anchor", F.col("t"))
    )
    counts = [frontier.agg(F.count(F.lit(1)).alias("c0"))]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("u"), us.alias("t2"))
            .join(frontier, "u")
            .filter(
                (F.col("t2") >= F.col("t"))
                & (F.col("t2") <= F.col("anchor") + F.lit(bound))
            )
            .groupBy("u", "anchor")
            .agg(F.min("t2").alias("t"))
            .select("u", "t", "anchor")
        )
        counts.append(nxt.agg(F.count(F.lit(1)).alias(f"c{i}")))
        frontier = nxt
    wide = counts[0]
    for c in counts[1:]:
        wide = wide.crossJoin(c)
    rows = [
        F.struct(
            F.lit(i + 1).cast("long").alias("level"),
            F.lit(step).alias("step"),
            F.col(f"c{i}").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
