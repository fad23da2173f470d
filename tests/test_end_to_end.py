"""End-to-end: the reference's full event loop on Structured Streaming.

Subscribe to a bus topic -> decode JSON payloads with a per-topic schema ->
run a compiled workflow pipeline (condition filter + transforms) -> publish
results to an output topic -> a second subscriber reads them. This is the
whole nyuki lifecycle (SURVEY.md §3.1 entry point 1) in one test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.plans.spec import compile_pipeline
from nyuki_spark.sources.bus import publish_rows, register_bus


def test_bus_to_pipeline_to_bus(spark, tmp_path):
    register_bus(spark)
    root = str(tmp_path / "bus")
    cp = str(tmp_path / "cp")

    publish_rows(
        root,
        "orders",
        [
            {"order_id": 1, "amount": 500.0, "status": "new"},
            {"order_id": 2, "amount": 90.0, "status": "new"},
            {"order_id": 3, "amount": 700.0, "status": "cancelled"},
        ],
    )

    pipeline = compile_pipeline(
        {
            "name": "route-big-orders",
            "version": 1,
            "steps": [
                {"op": "filter", "condition": "amount > 100.0 and status == 'new'"},
                {"op": "set", "field": "route", "value": "billing"},
                {"op": "select", "fields": ["order_id", "amount", "route"]},
            ],
        }
    )

    payload_schema = "order_id long, amount double, status string"

    def process(batch_df, _batch_id):
        decoded = batch_df.select(
            F.from_json("payload", payload_schema).alias("p")
        ).select("p.*")
        out = pipeline(decoded)
        rows = out.collect()
        if rows:
            publish_rows(
                root,
                "billing",
                [{"order_id": r.order_id, "amount": r.amount, "route": r.route} for r in rows],
            )

    q = (
        spark.readStream.format("nyuki_bus")
        .option("path", root)
        .option("topic", "orders")
        .load()
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # A downstream subscriber sees exactly the routed results.
    billing = (
        spark.read.format("nyuki_bus")
        .option("path", root)
        .option("topic", "billing")
        .load()
        .select(F.from_json("payload", "order_id long, route string").alias("p"))
        .select("p.*")
    )
    got = sorted((r.order_id, r.route) for r in billing.collect())
    assert got == [(1, "billing")], got
