"""Scale-technique operators: salting must be semantically invisible.

The oracle query ``agg_salted_skew`` checks salted aggregation against
DuckDB; these check the join variant and the row-placement independence
(any salt count, same results).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.operators.skew import salted_aggregate, salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_invariant_to_salt_count(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    results = []
    for n_salts in (1, 4, 32):
        out = salted_aggregate(
            events,
            keys=["user_id"],
            aggs={"n": ("event_id", "count"), "mx": ("value", "max")},
            n_salts=n_salts,
        ).orderBy("user_id")
        results.append([tuple(r) for r in out.collect()])
    assert results[0] == results[1] == results[2]
