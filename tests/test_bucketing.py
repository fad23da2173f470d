"""Bucketed co-located join: the plan must contain NO shuffle.

The point of bucketing is paying the join shuffle once at write time; if
either side still exchanges at read time the technique buys nothing. The
assertion is on the executed plan, not timings, so it holds at any scale.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.operators.bucketing import bucketed_join, write_bucketed


@contextmanager
def no_broadcast(spark):
    """Force SortMergeJoin so the Exchange assertion is meaningful.

    Must wrap only the join (not the load): ``load_table`` runs
    ``configure_session`` which re-applies the engine's broadcast
    threshold.
    """
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "b_orders", "o_custkey", str(tmp_path / "bo"), n_buckets=8)
    write_bucketed(customer, "b_customer", "o_custkey", str(tmp_path / "bc"), n_buckets=8)
    try:
        with no_broadcast(spark):
            joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey").select(
                "o_orderkey", "c_name"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan[:1200]
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1200]}"
            got = sorted(map(tuple, joined.collect()))
        # Same rows as the plain (shuffling) join.
        want = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
        assert got == sorted(map(tuple, want.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_aggregation_has_no_exchange(spark, sf_dir, tmp_path):
    """groupBy on the bucket key also reuses the bucket clustering."""
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(orders, "b_orders_agg", "o_custkey", str(tmp_path / "ba"), n_buckets=8)
    try:
        out = (
            orders.sparkSession.table("b_orders_agg")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan[:1200]}"
        assert out.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_agg")
