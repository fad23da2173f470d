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


def test_salted_join_rejects_outer_joins(spark, sf_dir):
    """right/full outer would surface unmatched small-side rows once per
    salt replica — the operator must refuse rather than silently multiply."""
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, customer, "o_custkey", how=how)


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


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + partition pruning: a filter on the
    partition column must reach the scan as a PartitionFilter and read
    only matching directories — at 100 TB this is the difference between
    scanning one day and scanning three years."""
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    events.write.partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    q = back.where(F.col("event_type") == "purchase").select("event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan[:800]
    want = events.where(F.col("event_type") == "purchase").count()
    assert q.count() == want


def test_percentile_sketch_tolerance(spark, sf_dir):
    """percentile_approx within 1% relative of exact median (SURVEY §4
    approx-sketch tier)."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.median("l_extendedprice")).head()[0]
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 10000)
    ).head()[0]
    assert abs(approx - exact) / exact <= 0.01, (approx, exact)


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE's runtime skew handling (OptimizeSkewedJoin) must fire on a
    planted 90%-one-key join — the engine's answer to skew the salting
    operators don't pre-treat. Thresholds are lowered so the ~tens-of-MB
    test partition qualifies; at production scale the defaults (256 MB)
    do the same job."""
    n = 400_000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pay"),
    )
    dim = spark.range(5000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("name")
    )
    old = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": None,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for key in old:
        old[key] = spark.conf.get(key, None)
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        # Force a shuffle join: a broadcast join has no skewed shuffle to fix.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = skewed.join(dim, "k")
        # Execute THIS DataFrame's plan (count() would plan a separate
        # query; AQE finalizes a plan only by running it).
        n_rows = len(joined.toArrow())
        # k=7 matches dim for 9n/10 rows; the id-keyed tenth matches only
        # ids < 5000 (every 10th id -> 500 rows).
        assert n_rows == n * 9 // 10 + 500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "skewed" in plan, plan[:2000]
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)
