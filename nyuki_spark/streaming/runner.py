"""Run a finite streaming query to completion and hand back a batch result.

``availableNow`` processes every pending micro-batch then stops — the
Structured Streaming idiom for "drain the backlog". Used by tests, by the
live declared queries, and by the trigger router's unit mode.
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["run_to_table", "run_append_foreach_batch", "stream_parallelism"]


@contextlib.contextmanager
def stream_parallelism(spark: SparkSession):
    """Optionally pin the state-store partition count for the duration of
    a streaming START (r12, guide §2.6 — MEASURED, then parameterised).

    Stateful operators hash-partition their state by
    ``spark.sql.shuffle.partitions`` AT QUERY START (AQE never re-plans a
    streaming stage), so this is the one knob that sizes the state fold.
    The r12 A/B at sf0.1 (BENCH_full_r12_before vs subset_after1) showed
    that deriving it from ``defaultParallelism`` (32 on the bench rig) is
    a LOSS at test scale: every extra state partition pays a state-store
    load+commit per micro-batch (stream_tumbling_live 2.8 -> 9.1 s,
    stream_session_live 3.7 -> 10.1 s at 8 -> 32 partitions) while the
    Python CEP folds it was meant to widen moved within noise — per-key
    work, not fold parallelism, is their cost. So the default is to
    leave the session conf alone (results are partitioning-independent
    either way: state is keyed, per-key folds see the same rows); a real
    cluster deployment, where per-partition commit cost amortises over
    far more data per batch, sets NYUKI_STREAM_PARTITIONS explicitly
    (~1-2x total cores) and gets the pinned width for exactly one START.
    """
    n = os.environ.get("NYUKI_STREAM_PARTITIONS")
    if not n:
        yield
        return
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


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
    # The conf stays pinned through the drain: a streaming query captures
    # shuffle-partition count when its FIRST batch is constructed, which
    # happens asynchronously after start() — restoring only after
    # termination removes the race.
    with stream_parallelism(spark):
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


def run_append_foreach_batch(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain a streaming DataFrame in APPEND mode through a foreachBatch
    parquet sink and return the written rows as a batch DataFrame.

    This is the production-shaped counterpart of :func:`run_to_table`'s
    complete-mode memory sink: only watermark-closed results are emitted,
    each exactly once, and they land in files — the path whose throughput
    actually matters at scale (complete mode rewrites O(state) rows per
    micro-batch by construction; append writes O(emitted)).
    """
    spark = SparkSession.getActiveSession()

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"append drain exceeded {timeout_sec}s -> {out_dir}")
    return spark.read.parquet(out_dir)
