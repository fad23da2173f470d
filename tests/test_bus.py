"""Bus source/sink tests: subscribe, publish, replay-from-checkpoint.

The replay test is the reference's core bus guarantee (store-and-forward:
missed messages are delivered after reconnect, nothing is delivered
twice): restarting the subscription from its checkpoint must consume
exactly the segments published while it was down.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.sources.bus import publish_rows, register_bus


def _drain(spark, root, checkpoint, topic=None):
    """Run the bus subscription to exhaustion; return collected rows.

    foreachBatch sink: unlike the memory sink it supports restart from an
    existing checkpoint, which is exactly what the replay test exercises.
    """
    reader = spark.readStream.format("nyuki_bus").option("path", root)
    if topic:
        reader = reader.option("topic", topic)
    collected = []
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda df, _id: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_batch_read_and_topic_filter(spark, tmp_path):
    register_bus(spark)
    root = str(tmp_path / "bus")
    publish_rows(root, "orders", [{"id": 1}, {"id": 2}])
    publish_rows(root, "alerts", [{"sev": "hi"}])
    df = spark.read.format("nyuki_bus").option("path", root).load()
    assert df.count() == 3
    assert df.where(F.col("topic") == "orders").count() == 2
    only = spark.read.format("nyuki_bus").option("path", root).option("topic", "alerts").load()
    assert [r.topic for r in only.collect()] == ["alerts"]


def test_stream_replay_from_checkpoint(spark, tmp_path):
    register_bus(spark)
    root = str(tmp_path / "bus")
    cp = str(tmp_path / "cp")
    publish_rows(root, "orders", [{"id": 1}, {"id": 2}])
    first = _drain(spark, root, cp)
    assert len(first) == 2

    # Broker keeps receiving while the consumer is down...
    publish_rows(root, "orders", [{"id": 3}])
    publish_rows(root, "alerts", [{"sev": "low"}])
    # ...and on reconnect, exactly the missed segments are delivered.
    second = _drain(spark, root, cp)
    assert len(second) == 2
    payloads = sorted(r.payload for r in second)
    assert payloads == ['{"id": 3}', '{"sev": "low"}']


def test_publish_via_writer_roundtrip(spark, tmp_path):
    register_bus(spark)
    root = str(tmp_path / "bus")
    df = spark.createDataFrame(
        [("orders", '{"id": 9}'), ("alerts", '{"sev": "mid"}')], "topic string, payload string"
    )
    df.write.format("nyuki_bus").option("path", root).mode("append").save()
    back = spark.read.format("nyuki_bus").option("path", root).load()
    assert sorted((r.topic, r.payload) for r in back.collect()) == [
        ("alerts", '{"sev": "mid"}'),
        ("orders", '{"id": 9}'),
    ]
