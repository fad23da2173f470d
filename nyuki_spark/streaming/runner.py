"""Run a finite streaming query to completion and hand back a batch result.

``availableNow`` processes every pending micro-batch then stops — the
Structured Streaming idiom for "drain the backlog". Used by tests, by the
live declared queries, and by the trigger router's unit mode.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["run_to_table"]


def run_to_table(
    sdf: DataFrame,
    mode: str = "complete",
    name: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute streaming DataFrame ``sdf`` with an availableNow trigger into
    an in-memory sink; returns the sink table as a batch DataFrame.

    ``complete`` mode keeps full aggregate state and rewrites the sink each
    batch — on a finite replay the final table equals the batch answer
    (stream/batch parity). ``append`` emits only watermark-closed results:
    the right mode to *observe* eviction semantics.
    """
    spark = SparkSession.getActiveSession()
    if name is None:
        name = f"nyuki_sink_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        # Reading the sink now would return a silently-partial result;
        # stop the query and fail loudly instead (r4 code review).
        q.stop()
        raise TimeoutError(
            f"streaming drain exceeded {timeout_sec}s for sink {name}"
        )
    return spark.table(name)
