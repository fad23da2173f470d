"""File-replay streaming source.

Replays a batch DataFrame as a Structured Streaming source by writing it to
a scratch parquet directory in ``n_chunks`` files and reading it back with
``maxFilesPerTrigger=1`` — n micro-batches, arbitrary arrival order (the
chunks are hash-partitioned, so event-time order is NOT preserved across
batches: exactly the out-of-order delivery a bus gives you, which is what
watermarks are for).

This is the test double for the bus source (nyuki's MQTT/XMPP subscription;
upstream `nyuki/bus/mqtt.py` — mount empty, SURVEY.md §0). The production
path is the same code reading Kafka or the Python DataSource in
:mod:`nyuki_spark.sources.bus`.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

__all__ = ["replay_stream"]


def replay_stream(
    spark: SparkSession,
    df: DataFrame,
    n_chunks: int = 4,
    scratch_dir: str | None = None,
    flush_df: DataFrame | list[DataFrame] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Return a streaming DataFrame that replays ``df`` in ``n_chunks``
    micro-batches. ``scratch_dir`` (a fresh temp dir by default) holds the
    replay files; caller owns cleanup.

    ``flush_df`` (optional) is appended as EXTRA FINAL micro-batches, one
    per DataFrame (a single DataFrame is one batch): each gets a strictly
    later modification time, and the file source admits oldest-first, so
    they arrive in order after every replay chunk. Use a far-future
    sentinel row here to drive the watermark past all real event time —
    the standard finite-replay trick that lets APPEND-mode queries emit
    (and thus verify) every window instead of holding the tail in state
    forever. Pass a LIST for operators that need one more micro-batch
    AFTER the watermark has advanced (event-time TIMERS are evaluated
    against the watermark computed at the END of the previous batch, so
    a timer armed below sentinel-1's event time only fires while
    processing sentinel-2).

    ``order_col`` (optional, r12) switches the replay from hash-chunked
    out-of-order delivery to EVENT-TIME-ORDERED delivery: chunks are
    range-split on that column (``ntile`` over its sort order) and
    admitted oldest-first via ascending file mtimes — the
    roughly-ordered arrival a real bus gives a live consumer, which is
    what lets mid-stream event-time timers (epoch TTLs, incremental
    horizon closes) fire while the stream is still running instead of
    only at the flush sentinels. Disorder is bounded by one chunk span.
    """
    if scratch_dir is None:
        scratch_dir = tempfile.mkdtemp(prefix="nyuki-replay-")
    path = f"{scratch_dir}/replay"
    if order_col is not None:
        import os
        import time as _time

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        chunked = df.withColumn(
            "___chunk",
            F.ntile(n_chunks).over(Window.orderBy(order_col)),
        ).cache()
        try:
            base = _time.time() - 86_400
            for i in range(1, n_chunks + 1):
                import glob

                before = set(glob.glob(f"{path}/part-*"))
                (
                    chunked.where(F.col("___chunk") == i)
                    .drop("___chunk")
                    .coalesce(1)
                    .write.mode("append")
                    .parquet(path)
                )
                t = base + i
                for f in set(glob.glob(f"{path}/part-*")) - before:
                    os.utime(f, (t, t))
        finally:
            chunked.unpersist()
    else:
        df.repartition(n_chunks).write.mode("overwrite").parquet(path)
    if flush_df is not None:
        import glob
        import os
        import time

        flushes = flush_df if isinstance(flush_df, list) else [flush_df]
        for step, fdf in enumerate(flushes, start=1):
            before = set(glob.glob(f"{path}/part-*"))
            fdf.coalesce(1).write.mode("append").parquet(path)
            late = time.time() + 120 * step
            for f in set(glob.glob(f"{path}/part-*")) - before:
                os.utime(f, (late, late))
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
