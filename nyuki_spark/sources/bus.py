"""Message-bus source/sink as a Spark 4 Python DataSource.

The reference subscribes to broker topics (MQTT/XMPP) and publishes JSON
events; a persistence buffer replays missed messages after reconnect
(upstream `nyuki/bus/` — mount empty, SURVEY.md §0). This module maps that
surface onto Structured Streaming's source contract:

- transport: a directory of immutable JSON-lines segment files per topic
  (``<root>/<topic>/<seq>.jsonl``) — a stand-in broker any test can write
  to; swap Kafka in production (same downstream pipeline code).
- subscription: ``spark.readStream.format("nyuki_bus")`` — the stream
  reader's offset is the count of segment files consumed per topic, so
  restart-from-checkpoint replays exactly the unseen segments: the
  reference's store-and-forward replay IS the offset contract here.
- publish: ``df.write.format("nyuki_bus")`` appends new segments (one per
  partition, commit-numbered) — at-least-once per partition, deduped
  downstream by :mod:`nyuki_spark.streaming.dedup` like any bus consumer.

Rows: (topic string, payload string) — payloads stay schema-less JSON
strings exactly as on the reference bus; pipelines apply ``from_json``
with their per-topic schema at the edge (SURVEY.md §1.1).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = ["BusDataSource", "register_bus", "publish_rows"]

SCHEMA = "topic string, payload string"


def _topic_segments(root: str) -> dict[str, list[str]]:
    """topic -> sorted segment filenames. Segment names are monotonic
    (time-prefixed), so within a topic the sorted order is publish order
    and a count is a valid offset — per-topic, exactly like Kafka
    partition offsets, so a topic appearing later can't shift another
    topic's consumed prefix."""
    out: dict[str, list[str]] = {}
    if os.path.isdir(root):
        for topic in sorted(os.listdir(root)):
            tdir = os.path.join(root, topic)
            if os.path.isdir(tdir):
                out[topic] = sorted(f for f in os.listdir(tdir) if f.endswith(".jsonl"))
    return out


def _segments(root: str) -> list[str]:
    """All segment files as topic-relative paths (batch-read order)."""
    return [
        os.path.join(topic, f)
        for topic, files in _topic_segments(root).items()
        for f in files
    ]


def _segment_name() -> str:
    """Monotonic segment filename: files published after a directory
    listing always sort after everything in that listing."""
    return f"{time.time_ns():020d}_{uuid.uuid4().hex[:8]}.jsonl"


def _read_segment(root: str, rel: str):
    topic = rel.split(os.sep, 1)[0]
    with open(os.path.join(root, rel), encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line:
                yield (topic, line)


class _SegmentPartition(InputPartition):
    def __init__(self, rel: str):
        self.rel = rel


class _BusBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["path"]
        self.topic = options.get("topic")

    def partitions(self):
        segs = _segments(self.root)
        if self.topic:
            segs = [s for s in segs if s.split(os.sep, 1)[0] == self.topic]
        return [_SegmentPartition(s) for s in segs] or [_SegmentPartition("")]

    def read(self, partition):
        if partition.rel:
            yield from _read_segment(self.root, partition.rel)


class _BusStreamReader(DataSourceStreamReader):
    """Offset = {"topics": {topic: consumed-segment-count}} — per-topic
    counters over immutable, monotonically-named segments: the same
    contract as Kafka per-partition offsets. A topic created after the
    subscription started enters the offset map at 0 and replays fully.
    """

    def __init__(self, options):
        self.root = options["path"]
        self.topic = options.get("topic")

    def _counts(self) -> dict[str, list[str]]:
        segs = _topic_segments(self.root)
        if self.topic:
            segs = {t: f for t, f in segs.items() if t == self.topic}
        return segs

    def initialOffset(self):
        return {"topics": {}}

    def latestOffset(self):
        return {"topics": {t: len(fs) for t, fs in self._counts().items()}}

    def partitions(self, start: dict, end: dict):
        segs = self._counts()
        out = []
        start_t = start.get("topics", {})
        for topic, n_end in end.get("topics", {}).items():
            n_start = start_t.get(topic, 0)
            for fname in segs.get(topic, [])[n_start:n_end]:
                out.append(_SegmentPartition(os.path.join(topic, fname)))
        return out

    def read(self, partition):
        yield from _read_segment(self.root, partition.rel)

    def commit(self, end: dict) -> None:
        # Checkpoint WAL owns progress; the transport needs no ack. The
        # reference's broker-side buffer trim happens here for a real bus.
        pass


class _BusCommit(WriterCommitMessage):
    def __init__(self, rel: str | None):
        self.rel = rel


class _BusWriter(DataSourceWriter):
    def __init__(self, options):
        self.root = options["path"]
        self.default_topic = options.get("topic", "events")

    def write(self, iterator):
        # One segment per task, staged under a uuid name; commit renames
        # nothing (files are already final) — publishes are at-least-once,
        # consumers dedup, matching the reference bus contract.
        rows = list(iterator)
        if not rows:
            return _BusCommit(None)
        by_topic: dict[str, list[str]] = {}
        for row in rows:
            topic = getattr(row, "topic", None) or self.default_topic
            payload = getattr(row, "payload")
            by_topic.setdefault(topic, []).append(payload)
        rel = None
        for topic, payloads in by_topic.items():
            tdir = os.path.join(self.root, topic)
            os.makedirs(tdir, exist_ok=True)
            rel = os.path.join(tdir, _segment_name())
            with open(rel, "w", encoding="utf-8") as fh:
                fh.write("\n".join(payloads) + "\n")
        return _BusCommit(rel)

    def commit(self, messages):
        pass

    def abort(self, messages):
        for m in messages:
            if m is not None and m.rel and os.path.exists(m.rel):
                os.remove(m.rel)


class BusDataSource(DataSource):
    """``format("nyuki_bus")`` — options: path (root dir), topic (filter)."""

    @classmethod
    def name(cls) -> str:
        return "nyuki_bus"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType):
        return _BusBatchReader(self.options)

    def streamReader(self, schema: StructType):
        return _BusStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return _BusWriter(self.options)


def register_bus(spark) -> None:
    spark.dataSource.register(BusDataSource)


def publish_rows(root: str, topic: str, payloads: list[dict]) -> str:
    """Driver-side publish helper (the test double's 'broker client')."""
    tdir = os.path.join(root, topic)
    os.makedirs(tdir, exist_ok=True)
    path = os.path.join(tdir, _segment_name())
    with open(path, "w", encoding="utf-8") as fh:
        for p in payloads:
            fh.write(json.dumps(p) + "\n")
    return path
