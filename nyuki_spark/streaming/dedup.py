"""Streaming deduplication.

The reference's bus delivers at-least-once (persistence buffer replays on
reconnect; upstream `nyuki/bus/persistence/` — mount empty, SURVEY.md §0),
so consumers dedup. Two engine strategies:

- ``dedup_exact``: keep the first row per key — unbounded state, exact.
  On batch input this is plain ``dropDuplicates`` semantics.
- ``dedup_within_watermark``: state bounded by the watermark horizon —
  the 100 TB-stream answer: duplicates are only ever replayed within the
  buffer window, so state for older keys is safely evicted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["dedup_exact", "dedup_within_watermark"]


def dedup_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """First row per key; works on batch and streaming (append mode)."""
    return df.dropDuplicates(keys)


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Dedup with state evicted past the watermark (streaming only).

    Guarantees no duplicates among events whose times are within ``delay``
    of each other — the at-least-once replay window contract.
    """
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
