"""Skew mitigation: salting for hot keys.

AQE's skew-join handling covers sort-merge joins at runtime; salting is
the complementary *planned* technique for skewed aggregations and joins
the engine controls directly (SURVEY.md §4). A key carrying 1% of 100 TB
lands 1 TB on one reducer without it.

- ``salted_aggregate``: two-phase aggregation — partial agg on
  (key, salt) spreads a hot key over ``n_salts`` reducers, final agg on
  key merges the partials. Works for any algebraic aggregate (sum, count,
  min, max) and the composites built from them (avg = sum/count).
- ``salted_join``: replicate the small side ``n_salts`` times with an
  explicit salt column, salt the big side randomly-but-deterministically
  (hash of a row id), equi-join on (key, salt). Every hot key's rows
  spread over ``n_salts`` tasks.

Both are semantically transparent — `llm_salted_agg` in the registry
proves it against the DuckDB oracle, which just runs the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_join"]


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. ``salt_on`` (default: whole-row hash) only
    affects row-to-reducer placement, never results.
    """
    _partial = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for out, (_, fn) in aggs.items():
        assert fn in _partial, f"{out}: non-algebraic fn {fn}"
    salt_src = (
        F.col(salt_on) if isinstance(salt_on, str) else salt_on
        if salt_on is not None
        else F.concat_ws("\x00", *[F.col(c).cast("string") for c in df.columns])
    )
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_partial[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_merge[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side.

    The small side grows n_salts x (it was broadcast-sized anyway); the
    big side's hottest key now hash-spreads over n_salts tasks. Result is
    row-identical to ``big.join(small, key, how)`` — which is only true for
    join types that keep at most one copy of each small-side row: in a
    right/full outer join, unmatched small-side rows would surface once per
    salt replica, so those types are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftsemi", "left_semi", "semi"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would replicate "
            "unmatched small-side rows n_salts times"
        )
    big_cols, small_cols = big.columns, [c for c in small.columns if c != key]
    b = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.concat_ws("\x00", *[F.col(c).cast("string") for c in big_cols])),
            F.lit(n_salts),
        ),
    )
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = b.join(s, on=[key, "__salt"], how=how)
    return out.select(*big_cols, *small_cols)
