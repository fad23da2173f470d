"""Bucketed-table co-located joins: shuffle-free repeated joins on a key.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Writing the tables bucketed (hash-partitioned into a fixed number of
files per bucket) on the join key moves that shuffle to WRITE time, once:
every later join on the key reads matching buckets pairwise and performs a
SortMergeJoin with NO Exchange on either side. ``sortBy`` at write time
additionally lets the reader skip the per-bucket sort for small bucket
counts per task.

This is Spark's native answer to the reference's partitioned-topic
co-location (bus consumers reading aligned partitions): the bucket id IS
the topic partition, persisted in the table layout.

Caveats encoded here rather than left to footguns:
- both sides must agree on bucket COUNT and KEY, or Spark re-shuffles the
  mismatched side;
- bucketed writes require ``saveAsTable`` (catalog-tracked); a plain
  ``.parquet(path)`` write silently drops bucketing metadata. We register
  external tables (explicit ``path``) so no managed warehouse is assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external bucketed table on ``key``.

    One full shuffle now (the write clusters rows into buckets) buys every
    subsequent equi-join/aggregation on ``key`` a shuffle-free plan.
    """
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs the optimizer plans SortMergeJoin with zero
    Exchange (asserted in tests/test_bucketing.py) — reading bucket i of
    the left against bucket i of the right, which on a cluster schedules as
    co-located pairwise tasks.
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
