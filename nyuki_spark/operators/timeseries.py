"""Time-series regularization: resample to a fixed grid + gap-fill.

The hypertable/rollup pattern: raw events are irregular; training and
monitoring want a dense per-key time grid. ``gapfill_locf`` buckets to the
grid, generates the missing buckets per key with ``sequence`` (JVM-side,
no driver loop, no cross join against a global calendar — each key only
materializes ITS OWN [min, max] span), and fills gaps by
last-observation-carried-forward over a per-key window.

Scale shape: one hash agg (bucketing), one tiny agg (per-key bounds), one
explode (the grid — output-sized, not input-sized), one left join and one
per-key window — every stage partitioned by key; nothing global anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_locf"]


def gapfill_locf(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    agg: str = "avg",
    round_to: int = 4,
) -> DataFrame:
    """Dense per-``key`` grid at ``step`` resolution over each key's own
    [min, max] span; ``value_col`` aggregated per bucket (``agg``), gaps
    carried forward. Output: (key, h, v, v_filled) — ``v`` is NULL on
    generated rows, ``v_filled`` the LOCF value (NULL only before a key's
    first observation).
    """
    unit = step.split()[-1]
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("h")
    agg_fn = getattr(F, agg)
    hourly = (
        df.groupBy(F.col(key), bucket)
        .agg(F.round(agg_fn(value_col), round_to).cast("double").alias("v"))
    )
    bounds = hourly.groupBy(key).agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence("h0", "h1", F.expr(f"INTERVAL {step}"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, [key, "h"], "left").withColumn(
        "v_filled", F.last("v", ignorenulls=True).over(w)
    )
