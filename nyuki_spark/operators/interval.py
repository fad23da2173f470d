"""Interval / band join: pairs of rows within a time window of each other.

Declared form (SURVEY.md Appendix A, ``join_interval_overlap``) is an
equi-key join plus range predicates — Catalyst executes that as a hash join
on the key with the range condition as a post-filter, which is fine when
keys are selective (every user's events fit a task). At 100 TB, keys with
huge per-key cardinality make the per-key cross product explode; the
``banded`` strategy bucketises time into fixed bands and equi-joins on
(key, band) + (key, band+1), turning the join into two co-partitioned hash
joins whose probe sets are bounded by the band width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    extra_cond: Column | None = None,
    banded: bool = True,
) -> DataFrame:
    """Join rows with ``left.ts < right.ts <= left.ts + max_gap``, same key.

    ``banded=True`` adds a time-band equi-key so the shuffle co-partitions
    on (key, band): each left row joins only bands b and b+1, preserving
    exact semantics (the range predicates are re-checked) while bounding the
    per-task probe volume at scale.
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    range_cond = (rt > lt) & (rt <= lt + F.expr(f"INTERVAL {max_gap_seconds} SECOND"))
    cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & range_cond
    if extra_cond is not None:
        cond = cond & extra_cond

    if not banded:
        return left.alias("l").join(right.alias("r"), cond)

    band = lambda c: (F.unix_timestamp(c) / max_gap_seconds).cast("long")  # noqa: E731
    l_b = left.withColumn("__band", band(F.col(left_ts)))
    r_b = right.withColumn("__band", band(F.col(right_ts)))
    # A right row within (0, gap] of a left row lands in the same band or
    # the next one; probe both with an explode of [band, band+1] on the left.
    l_exp = l_b.withColumn(
        "__probe", F.explode(F.array(F.col("__band"), F.col("__band") + 1))
    )
    joined = l_exp.alias("l").join(
        r_b.alias("r"),
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l.__probe") == F.col("r.__band"))
        & range_cond
        & (extra_cond if extra_cond is not None else F.lit(True)),
    )
    return joined.drop("__band", "__probe")
