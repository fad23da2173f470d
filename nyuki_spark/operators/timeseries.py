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

__all__ = ["gapfill_locf", "interpolate_linear"]


def _grid_unit(step: str) -> str:
    """Validate ``step`` and return its date_trunc unit.

    The grid strides with ``INTERVAL step`` but anchors buckets at
    ``date_trunc(unit, ...)``, so only '1 <unit>' steps keep the two
    aligned: '15 minutes' would date_trunc to a whole minute yet stride
    15 — grid points land off the bucket lattice and the left join goes
    silently empty ('minutes' is not even a valid date_trunc unit: NULL
    buckets). Fail loudly instead (r4 ADVICE).
    """
    parts = step.split()
    units = ("second", "minute", "hour", "day", "week", "month", "year")
    assert len(parts) == 2 and parts[0] == "1" and parts[1] in units, (
        f"step must be '1 <unit>' with unit in {units}, got {step!r} — "
        "multi-unit or plural steps misalign the date_trunc bucket "
        "lattice with the generated grid"
    )
    return parts[1]


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
    unit = _grid_unit(step)
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


def interpolate_linear(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    agg: str = "avg",
    round_to: int = 4,
) -> DataFrame:
    """Dense per-``key`` grid like :func:`gapfill_locf`, but gaps are
    LINEARLY interpolated between the surrounding observations instead of
    carried forward; strict semantics — NULL before a key's first and
    after its last observation. Output: (key, h, v, v_interp).

    The interpolation fraction uses the grid ROW INDEX, not timestamp
    epochs: grid rows are exactly ``step`` apart by construction, so
    (i - prev_i) / (next_i - prev_i) is the time fraction — integer
    arithmetic that sidesteps epoch extraction entirely (the fixtures'
    TIMESTAMP_NTZ refuses double casts) and is bit-identical across
    engines. Same scale shape as gapfill: everything key-partitioned.
    """
    unit = _grid_unit(step)
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("h")
    agg_fn = getattr(F, agg)
    hourly = df.groupBy(F.col(key), bucket).agg(
        F.round(agg_fn(value_col), round_to).cast("double").alias("v")
    )
    bounds = hourly.groupBy(key).agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        key,
        F.explode(F.sequence("h0", "h1", F.expr(f"INTERVAL {step}"))).alias("h"),
    )
    wall = Window.partitionBy(key).orderBy("h")
    base = (
        grid.join(hourly, [key, "h"], "left")
        .withColumn("i", F.row_number().over(wall))
    )
    wp = wall.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = wall.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_i = F.when(F.col("v").isNotNull(), F.col("i"))
    # Interpolate in scaled-INTEGER space: the surrounding values are
    # round_to-dp decimals, so round(v * 10^round_to) recovers them as
    # exact BIGINTs on any engine; the single final division then runs on
    # bit-identical integer operands, making the output double itself
    # bit-identical — no output rounding step, hence no rounding-MODE
    # divergence (a naive round(pv + frac*(nv-pv), k) lands on exact
    # decimal halves for every midpoint and Spark/DuckDB half-rounding
    # disagrees there).
    scale = 10 ** round_to
    pv4 = F.round(F.last("v", ignorenulls=True).over(wp) * scale, 0).cast("bigint")
    pi = F.last(obs_i, ignorenulls=True).over(wp)
    nv4 = F.round(F.first("v", ignorenulls=True).over(wn) * scale, 0).cast("bigint")
    ni = F.first(obs_i, ignorenulls=True).over(wn)
    v_interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        (pv4 * (ni - F.col("i")) + nv4 * (F.col("i") - pi))
        / ((ni - pi) * F.lit(float(scale)))
    )
    return base.withColumn("v_interp", v_interp).drop("i")
