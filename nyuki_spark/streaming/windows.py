"""Windowed aggregations that run identically on batch and streaming input.

Each helper takes any DataFrame (batch or streaming) — Structured
Streaming's core guarantee is that the same declarative plan produces the
same result either way, and these helpers are how the engine leans on it:
tests assert ``f(batch) == run_to_table(f(stream))``.

Scale notes: tumbling/sliding aggs shuffle once on (window, keys) with
map-side partial aggregation; session windows shuffle on keys then merge
sessions in the state store (streaming) or via sort-based merging (batch).
Watermarks bound state: without one, a 100 TB stream accretes state forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_agg", "sliding_agg", "session_agg"]


def _apply_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def _finish(out: DataFrame, keys: list[str], start_alias: str) -> DataFrame:
    agg_cols = [c for c in out.columns if c != "__w" and c not in keys]
    return out.select(
        F.col("__w.start").alias(start_alias), *keys, *agg_cols
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, duration), *keys).agg(...).

    Emits ``win_start`` (epoch-aligned window start) + keys + aggs.
    """
    g = _apply_watermark(df, ts_col, watermark).groupBy(
        F.window(ts_col, duration).alias("__w"), *keys
    )
    return _finish(g.agg(*aggs), keys, "win_start")


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    g = _apply_watermark(df, ts_col, watermark).groupBy(
        F.window(ts_col, duration, slide).alias("__w"), *keys
    )
    return _finish(g.agg(*aggs), keys, "win_start")


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (gap-based): sessions merge while events arrive
    within ``gap`` of the session window. Emits ``sess_start`` = first
    event time of the session."""
    g = _apply_watermark(df, ts_col, watermark).groupBy(
        F.session_window(ts_col, gap).alias("__w"), *keys
    )
    out = g.agg(*aggs)
    agg_cols = [c for c in out.columns if c != "__w" and c not in keys]
    return out.select(*keys, F.col("__w.start").alias("sess_start"), *agg_cols)
