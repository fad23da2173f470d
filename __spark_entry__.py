"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in :mod:`nyuki_spark.queries` (declared 61 from SURVEY.md
§2/Appendix A + extensions); this module just adapts the registry to the
driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The 4-way star join + decimal aggregation (``join_multiway``):
    broadcast joins on the dimensions, hash aggregation with map-side
    partials — exercises catalog, ns-timestamp shim, joins, and aggs.
    """
    from nyuki_spark.queries import REGISTRY

    return REGISTRY["join_multiway"].run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nyuki_spark.queries import REGISTRY

    return {qid: q.runner() for qid, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-checkable query in ``queries()``.

    Queries without an entry here (streaming-live, approximate/LSH ops) get
    the driver's weaker rows-only check by design.
    """
    from nyuki_spark.queries import REGISTRY

    return {
        qid: q.oracle_sql
        for qid, q in sorted(REGISTRY.items())
        if q.oracle_sql is not None
    }
