"""Deterministic sampling & source mixing for training-data pipelines.

``df.sample(fraction)`` is seeded per-run and per-partition-layout: the
same row can be in today's sample and out of tomorrow's, which poisons
incremental corpus builds (yesterday's shard re-samples differently after
a repartition). Hash sampling fixes that: a row's fate is a pure function
of its key — ``md5(key)``'s first 8 hex digits read as a uniform draw in
[0, 1) — so samples are reproducible across runs, engines, cluster sizes,
and partition layouts, and nested rates compose (a 10% sample is a strict
subset of a 20% sample of the same key+salt).

Everything is pure Column arithmetic (md5 + substring + conv): JVM-side,
codegen'd, pushdown-friendly, and bit-for-bit reproducible in the DuckDB
oracle (``('0x' || SUBSTR(MD5(k), 1, 8))::BIGINT / 16^8``).

Scale: a sample is a scan-time filter — no shuffle, no state, and at
100 TB the filter runs inside the same whole-stage-codegen span as the
parquet reader, emitting only kept rows downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_fraction", "deterministic_sample", "mix_sources"]

_HEX_SPAN = float(16**8)  # first 8 md5 hex chars -> uniform in [0, 1)


def hash_fraction(key: Column | str, salt: str = "") -> Column:
    """Uniform [0, 1) draw that is a pure function of (salt, key).

    Different ``salt`` values give independent draws for the same key —
    use one salt per sampling decision (train/val split vs. downsampling)
    so the decisions don't correlate.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), k.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HEX_SPAN))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (reproducible)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_fraction(key, salt) < F.lit(fraction))


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    key: str,
    group: str = "source",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Weighted source mixing: keep each group at its configured rate.

    The standard corpus-composition step ("100% wiki, 30% web, 5% crawl
    tail") as one scan-time filter. ``rates`` maps group value -> keep
    fraction; groups absent from ``rates`` keep ``default_rate``. The rate
    lookup compiles to a literal CASE chain in the plan — no join, no
    broadcast table, safe for any corpus size (but keep ``rates`` to
    thousands of entries, not millions; past that, broadcast-join a rate
    table instead).
    """
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(group) == F.lit(value), F.lit(float(r))).otherwise(rate)
    return df.where(hash_fraction(key, salt) < rate)
