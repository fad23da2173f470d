"""Streaming semantics smoke tests (SURVEY.md §2.9): watermark late-data
drop, trigger routing, sub-workflow invocation, approx-sketch tolerance.

Temporal behaviors have no batch oracle by construction — each test
builds the exact arrival order it needs and asserts the semantic directly.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.plans.spec import compile_pipeline
from nyuki_spark.streaming.router import TriggerRouter
from nyuki_spark.streaming.windows import tumbling_agg

# Every test here drains a real Structured Streaming query (seconds each);
# the default run skips them (see conftest) — NYUKI_RUN_SLOW=1 runs all.
pytestmark = pytest.mark.slow

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _write_chunk(spark, base, n, rows):
    """One parquet file = one micro-batch (maxFilesPerTrigger=1)."""
    spark.createDataFrame(rows, "key string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(f"{base}/chunk={n}")


def test_watermark_drops_late_data(spark, tmp_path):
    """Once the watermark closes a window (append mode emits it), a late
    straggler for that window is dropped — never re-emitted, state never
    reopened. That's the guarantee that bounds state at 100 TB.

    NB: Spark's drop guarantee is about *closed* windows — a late row
    arriving while the window state is still live is merged (observed on
    4.1.2, consistent with the docs' "too-late = window below evicted
    watermark"). So the straggler is delivered on a checkpoint restart
    after the window closed, like a real bus replay would.
    """
    base = str(tmp_path / "stream")
    cp = str(tmp_path / "cp")

    def drain() -> list:
        sdf = (
            spark.readStream.schema("key string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", True)
            .parquet(base)
        )
        agg = tumbling_agg(
            sdf, "ts", "5 minutes", ["key"], [F.count(F.lit(1)).alias("n")],
            watermark="10 minutes",
        )
        rows: list = []
        q = (
            agg.writeStream.foreachBatch(lambda df, _i: rows.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    # Window [12:00,12:05) gets 2 on-time events; the next batch advances
    # event time 2h, pushing the watermark far past the window end.
    _write_chunk(spark, base, 0, [Row(key="a", ts=T0), Row(key="a", ts=T0 + timedelta(minutes=1))])
    _write_chunk(spark, base, 1, [Row(key="a", ts=T0 + timedelta(hours=2))])
    first = drain()
    assert {(r.win_start, r.n) for r in first} == {(T0, 2)}, first

    # Straggler for the closed window arrives after restart: dropped.
    _write_chunk(spark, base, 2, [Row(key="a", ts=T0 + timedelta(minutes=2))])
    second = drain()
    assert [r for r in second if r.win_start == T0] == [], second


def test_trigger_router_fans_out_per_topic(spark, sf_dir):
    """nyuki trigger semantics: each topic's events run that topic's
    pipeline only (batch mode — the streaming path is the same function
    via foreachBatch)."""
    events = load_table(spark, sf_dir, "events")
    router = TriggerRouter()
    router.add_trigger("purchase", lambda df: df.select("event_id", F.lit("billing").alias("route")))
    router.add_trigger("error", lambda df: df.select("event_id", F.lit("alerts").alias("route")))
    sunk: dict[str, list] = {}
    router.route_batch(events, "event_type", lambda topic, df: sunk.setdefault(topic, df.collect()))
    n_purchase = events.where(F.col("event_type") == "purchase").count()
    n_error = events.where(F.col("event_type") == "error").count()
    assert len(sunk["purchase"]) == n_purchase and len(sunk["error"]) == n_error
    assert all(r.route == "billing" for r in sunk["purchase"])


def test_subworkflow_invocation(spark, sf_dir):
    """The reference's trigger_workflow task: a pipeline hands its output
    to a second compiled pipeline (same artifact, chained)."""
    parent = compile_pipeline(
        {
            "name": "parent",
            "steps": [
                {"op": "filter", "condition": "event_type == 'purchase'"},
                {"op": "set", "field": "stage", "value": "parent-done"},
            ],
        }
    )
    child = compile_pipeline(
        {
            "name": "child",
            "steps": [
                {"op": "filter", "condition": "value > 250.0"},
                {"op": "set", "field": "stage", "value": "child-done"},
                {"op": "select", "fields": ["event_id", "stage"]},
            ],
        }
    )
    events = load_table(spark, sf_dir, "events")
    out = child(parent(events)).collect()
    want = events.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 250.0)
    ).count()
    assert len(out) == want
    assert all(r.stage == "child-done" for r in out)


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """HLL++ sketch within 5% of exact (SURVEY §2.4 smoke tier)."""
    events = load_table(spark, sf_dir, "events")
    exact = events.select(F.countDistinct("user_id")).head()[0]
    approx = events.select(F.approx_count_distinct("user_id", rsd=0.02)).head()[0]
    assert abs(approx - exact) / exact <= 0.05, f"approx {approx} vs exact {exact}"


def test_dedup_within_watermark_live(spark, tmp_path):
    """Bus at-least-once contract: duplicates replayed within the
    watermark horizon are suppressed; state is bounded by the horizon."""
    from nyuki_spark.streaming.dedup import dedup_within_watermark

    base = str(tmp_path / "dupstream")
    _write_chunk(spark, base, 0, [Row(key="a", ts=T0), Row(key="b", ts=T0 + timedelta(seconds=30))])
    # Redelivery of 'a' (same key, same event) in a later micro-batch.
    _write_chunk(spark, base, 1, [Row(key="a", ts=T0), Row(key="c", ts=T0 + timedelta(minutes=1))])
    sdf = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(base)
    )
    out = dedup_within_watermark(sdf, ["key"], "ts", "30 minutes")
    rows: list = []
    q = (
        out.writeStream.foreachBatch(lambda df, _i: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.key for r in rows) == ["a", "b", "c"]


def test_session_window_matches_gaps_and_islands_on_random_streams(spark):
    """Property test (SURVEY §5.4): session_window() must agree with the
    classic gaps-and-islands SQL on arbitrary event streams."""
    import random

    rng = random.Random(1234)
    for trial in range(3):
        rows = []
        for uid in range(1, 6):
            t = T0
            for _ in range(rng.randint(1, 40)):
                t = t + timedelta(minutes=rng.randint(1, 70))
                rows.append(Row(user_id=uid, ts=t))
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        from nyuki_spark.streaming.windows import session_agg

        got = sorted(
            (r.user_id, r.sess_start, r.n)
            for r in session_agg(df, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]).collect()
        )
        df.createOrReplaceTempView("rand_events")
        want = sorted(
            (r.user_id, r.sess_start, r.n)
            for r in spark.sql(
                """
                WITH marked AS (
                  SELECT user_id, ts, CASE WHEN ts > LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts) + INTERVAL '30' MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_sess FROM rand_events),
                sess AS (
                  SELECT user_id, ts, SUM(new_sess) OVER
                    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
                  FROM marked)
                SELECT user_id, MIN(ts) AS sess_start, COUNT(*) AS n
                FROM sess GROUP BY user_id, sid
                """
            ).collect()
        )
        assert got == want, f"trial {trial}: session_window != gaps-and-islands"
