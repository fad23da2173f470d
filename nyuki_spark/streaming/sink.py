"""Exactly-once ``foreachBatch`` sinks.

``foreachBatch`` gives at-least-once by itself: after a crash between the
user function and the checkpoint commit, Structured Streaming re-runs the
batch with the SAME ``batch_id``. Exactly-once is recovered by making the
write idempotent on that id — the standard public pattern (Structured
Streaming programming guide, "foreachBatch" section): write each batch to
a ``batch_id=N``-keyed location, skip ids already committed, let readers
see only committed data.

At 100 TB this shape also solves file management: each micro-batch is one
directory whose size tracks the trigger interval, and downstream
:func:`nyuki_spark.sources.layout.compact` folds cold batch dirs into
target-size files.
"""

from __future__ import annotations

import os

__all__ = ["idempotent_parquet_sink", "committed_batches"]


def idempotent_parquet_sink(out_dir: str):
    """A ``foreachBatch`` function writing each micro-batch to
    ``out_dir/batch_id=N/`` exactly once.

    Replayed batch ids are skipped iff the previous attempt fully committed
    (Spark's ``_SUCCESS`` marker); a partially-written dir from a crashed
    attempt is simply overwritten. Reading ``out_dir`` with
    ``spark.read.parquet`` sees ``batch_id`` as a partition column — an
    audit trail for free.
    """

    def write(df, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # this id already committed: replay after a crash
        df.write.mode("overwrite").parquet(target)

    return write


def committed_batches(out_dir: str) -> list[int]:
    """Batch ids with a completed commit under ``out_dir``."""
    out = []
    if not os.path.isdir(out_dir):
        return out
    for d in os.listdir(out_dir):
        if d.startswith("batch_id=") and os.path.exists(
            os.path.join(out_dir, d, "_SUCCESS")
        ):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)
