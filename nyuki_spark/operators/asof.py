"""As-of join: for each row, the latest prior event per key.

Spark SQL has no native ASOF JOIN. The declared semantic contract is the
correlated form (SURVEY.md Appendix A, ``join_asof_emulated``)::

    SELECT e.event_id,
           (SELECT MAX(s.ts) FROM events s
             WHERE s.user_id = e.user_id AND s.event_type = 'signup'
               AND s.ts <= e.ts) AS last_signup_ts
    FROM events e WHERE e.event_type = 'purchase'

Catalyst decorrelates the non-equi correlation into a nested-loop-shaped
join: 209 s at sf0.1 vs 0.63 s for the running-window rewrite below, which
was verified row-identical at sf0.1 (BASELINE.md note 1). The rewrite is a
single shuffle on the key + one sort — the plan that survives a 100x
scale-up, because work is O(n log n) per key-partition instead of
O(left x right) per key.

We use a RANGE frame (``ORDER BY ts RANGE UNBOUNDED PRECEDING .. CURRENT
ROW``) rather than a ROWS frame so that a reference event carrying exactly
the same timestamp as the probe row is included — matching the ``<= ts``
contract even on ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "last_event_asof", "nearest_event_asof"]


def last_event_asof(
    events: DataFrame,
    key: str,
    ts: str,
    ref_predicate: Column,
    probe_predicate: Column,
    value: Column | None = None,
    out_col: str = "asof_value",
) -> DataFrame:
    """Single-table as-of: latest ``value`` among rows matching
    ``ref_predicate`` with ``ts`` <= the probe row's ``ts``, per ``key``;
    returns only rows matching ``probe_predicate`` with ``out_col`` added.

    One shuffle (hash-partition on ``key``) + one within-partition sort;
    the running MAX is computed in a single pass by WindowExec.
    """
    if value is None:
        value = F.col(ts)
    w = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.max(F.when(ref_predicate, value)).over(w).alias(out_col)
    return events.withColumn(out_col, running).where(probe_predicate)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """General two-table as-of join (latest right row with
    ``right_ts <= left_ts`` per key), via union + running window.

    Instead of a non-equi join (nested loop at scale), we union the two
    sides tagged by origin, sort once per key partition, carry the right
    side's values forward with ``last(..., ignorenulls=True)`` over a
    growing frame, and keep the left rows. Cost: one shuffle over
    |left| + |right| rows — the same strategy databases use for MERGE ASOF.

    Ties: right rows sort before left rows at an equal timestamp, so a
    right row at exactly ``left_ts`` is matched (<= semantics).
    """
    lcols = left.columns
    tag = F.lit(1)
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        tag.alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__rv_{v}") for v in right_values],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("__lrow"),
        *[F.col(v).alias(f"__rv_{v}") for v in right_values],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows (__side=0) order before left rows at equal __ts -> inclusive.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__lrow",
        *[
            F.last(f"__rv_{v}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in right_values
        ],
    )
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"{v}{suffix}") for v in right_values],
    )
    return out


def nearest_event_asof(
    events: DataFrame,
    key: str,
    ts: str,
    ref_predicate: Column,
    probe_predicate: Column,
    out_col: str = "nearest_ts",
) -> DataFrame:
    """Nearest-in-time as-of: for each probe row, the reference row's ``ts``
    minimising the absolute time distance per ``key`` (either direction);
    ties break toward the EARLIER reference (the backward candidate).

    Backward-only as-of is one running window (``last_event_asof``); the
    nearest variant needs both directions, which is still one shuffle: the
    same key-partitioned sort feeds two frames — a running max over
    ``(unbounded preceding, current)`` and a running min over ``(current,
    unbounded following)`` — and a scalar comparison picks the closer
    candidate. RANGE frames (not ROWS) so a reference sharing the probe's
    exact timestamp is seen by both frames as distance 0.

    Distances compare as day-time intervals (timestamp subtraction —
    microsecond-exact, and well-typed for TIMESTAMP_NTZ columns, which
    Spark refuses to cast to double); the declared twin is the correlated
    ``ORDER BY ABS(...) LIMIT 1`` form, which decorrelates to a
    nested-loop shape — this rewrite is the plan that survives scale.
    """
    w_back = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ref_ts = F.when(ref_predicate, F.col(ts))
    back = F.max(ref_ts).over(w_back)
    fwd = F.min(ref_ts).over(w_fwd)
    here = F.col(ts)
    nearest = (
        F.when(back.isNull(), fwd)
        .when(fwd.isNull(), back)
        .when(here - back <= fwd - here, back)
        .otherwise(fwd)
    )
    return events.withColumn(out_col, nearest).where(probe_predicate)
