"""Streaming scale probe at sf1 with state-store evidence (r5 VERDICT #6).

Runs the four append-mode Structured Streaming replays (the production
output path: watermark eviction, foreachBatch parquet sink) at sf1
(1M events — 10x the bench scale), with the MetricsListener attached, and
reports per-query:

- end-to-end rows/sec (replayed input rows / wall time),
- peak state rows + state memory from the per-batch progress events,
- rows dropped by the watermark (eviction actually happening),

then re-runs the tumbling replay under the RocksDB state-store provider
and records whether the provider is available in this Spark build and
its wall time (HDFS-backed map store is the default; RocksDB is the
large-state production choice).

Usage: python scripts/streaming_sf1_probe.py [sf_dir]  (default testdata_sf1)
Emits a BASELINE.md-ready markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "stream_tumbling_live_append",
    "stream_sliding_live_append",
    "stream_session_live_append",
    "stream_dedup_live_append",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    from nyuki_spark.queries import REGISTRY
    from nyuki_spark.session import get_session
    from nyuki_spark.streaming.listener import MetricsListener

    spark = get_session("nyuki-streaming-sf1", master="local[32]")
    listener = MetricsListener()
    spark.streams.addListener(listener)

    from nyuki_spark.catalog import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    print(f"# streaming sf1 probe: {n_events} events, append mode")
    print(
        "| query | sec | rows/s | peak state rows | peak state MB |"
        " wm-dropped | out rows |"
    )
    print("|---|---|---|---|---|---|---|")

    def run_one(qid: str) -> None:
        listener.progress.clear()
        t0 = time.perf_counter()
        out = REGISTRY[qid].run(spark, sf_dir)
        n_out = out.count()
        dt = time.perf_counter() - t0
        # listener events arrive asynchronously; give the bus a moment.
        time.sleep(2)
        peak_rows = max((p.state_rows for p in listener.progress), default=0)
        peak_mb = max(
            (p.state_memory_bytes for p in listener.progress), default=0
        ) / 1e6
        dropped = sum(
            p.state_rows_dropped_by_watermark for p in listener.progress
        )
        print(
            f"| {qid} | {dt:.1f} | {n_events / dt:.0f} | {peak_rows} |"
            f" {peak_mb:.1f} | {dropped} | {n_out} |"
        )

    for qid in PROBES:
        run_one(qid)

    # RocksDB provider availability: set the conf, re-run the tumbling
    # replay, restore. If the JNI/provider class is missing this build,
    # record that honestly instead of failing the probe.
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, rocks)
        t0 = time.perf_counter()
        out = REGISTRY["stream_tumbling_live_append"].run(spark, sf_dir)
        n_out = out.count()
        dt = time.perf_counter() - t0
        print(
            f"\nRocksDB state store: AVAILABLE — tumbling append replay"
            f" {dt:.1f}s ({n_events / dt:.0f} rows/s, {n_out} out rows)"
        )
    except Exception as exc:  # noqa: BLE001 — availability probe
        print(f"\nRocksDB state store: UNAVAILABLE — {type(exc).__name__}:"
              f" {str(exc)[:200]}")
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
