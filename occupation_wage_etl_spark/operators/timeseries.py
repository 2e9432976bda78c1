"""Time-series regularization: dense resampling with forward-fill.

Sensor/metric feeds (and the reference's monthly snapshot cadence —
a sparse time series per occupation, ``load_data.py`` snapshot dates)
arrive with gaps; training pipelines and dashboards want a DENSE grid
per key where missing slots carry the last observation forward
(pandas ``asfreq`` + ``ffill``, SQL ``GAP FILL``).

Scale shape: the grid is generated per key from that key's own
[min, max] span (``sequence`` + ``explode`` — a projection, no
shuffle), the observation join is an equi-join on (key, slot), and
the fill is ``last(value, ignorenulls)`` over a window PARTITIONED BY
KEY — never a global sort.  Span explosion is bounded by each key's
own range; keys with pathological spans (years of empty grid) should
be range-capped upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    obs: DataFrame,
    key_col: str,
    slot_col: str,
    val_col: str,
    step: str = "interval 1 day",
) -> DataFrame:
    """Densify (key, slot, value) observations onto a regular grid and
    forward-fill missing values.

    ``obs`` must hold ONE row per (key, slot) — pre-aggregate first
    (use an order-independent aggregate like max/count so results are
    engine-portable).  ``slot_col`` is a timestamp; ``step`` is a SQL
    interval literal matching the slotting used upstream.  Returns
    (key, slot, value, is_filled); the first slot of every key is an
    observation by construction, so no leading NULLs survive.
    """
    span = obs.groupBy(key_col).agg(
        F.min(slot_col).alias("__lo"), F.max(slot_col).alias("__hi")
    )
    grid = span.select(
        key_col,
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(slot_col),
    )
    joined = grid.join(obs, [key_col, slot_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(slot_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        slot_col,
        F.last(val_col, ignorenulls=True).over(w).alias(val_col),
        F.col(val_col).isNull().alias("is_filled"),
    )
