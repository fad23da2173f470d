"""Progress/metrics reporting — the reference's workflow instance reports.

The reference pushes per-instance progress over websocket/REST and
persists per-task reports (SURVEY.md §2.9); the engine equivalent is a
StreamingQueryListener: every micro-batch emits a progress event with
rows/sec, batch duration, and state-store metrics, which this listener
collects into queryable rows — observability as a table, consistent with
everything else in the engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["MetricsListener"]


@dataclass
class _Progress:
    query_id: str
    name: str | None
    batch_id: int
    num_input_rows: int
    batch_duration_ms: int


class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress for every streaming query on the session.

    Attach with ``spark.streams.addListener(listener)``; read
    ``listener.progress`` (list) or ``listener.to_df(spark)`` (DataFrame —
    report-as-a-table, joinable/aggregatable like any other source).
    """

    def __init__(self) -> None:
        self.progress: list[_Progress] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            _Progress(
                query_id=str(p.id),
                name=p.name,
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                batch_duration_ms=(p.durationMs or {}).get("triggerExecution", 0),
            )
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def to_df(self, spark: SparkSession) -> DataFrame:
        schema = "query_id string, name string, batch_id long, num_input_rows long, batch_duration_ms long"
        rows = [
            (p.query_id, p.name, p.batch_id, p.num_input_rows, p.batch_duration_ms)
            for p in self.progress
        ]
        return spark.createDataFrame(rows, schema=schema)
