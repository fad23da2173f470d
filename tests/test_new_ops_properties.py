"""Property tests for the round-4 operators: semantic invariants that the
single-fixture oracle comparison can't cover (invariance to partitioning
choices, equality with the naive quadratic form on adversarial data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table


def _direct_agg(ev):
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vdec").alias("s"),
        F.min("vdec").alias("mn"),
        F.max("vdec").alias("mx"),
    )


def test_incremental_merge_invariant_to_split(spark, sf_dir):
    """Partial-state merge must equal the direct aggregate for ANY way of
    splitting the input into base+delta — the correctness core of
    incremental view maintenance (mv_incremental_agg fixes one split; the
    invariant is what makes the pattern safe in production)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "vdec", F.col("value").cast("decimal(18,2)")
    )
    direct = {r["event_type"]: r for r in _direct_agg(ev).collect()}
    for mod, residue in [(2, 0), (7, 3), (13, 12)]:
        base = ev.filter(F.col("event_id") % mod != residue)
        delta = ev.filter(F.col("event_id") % mod == residue)
        merged = (
            _direct_agg(base)
            .unionByName(_direct_agg(delta))
            .groupBy("event_type")
            .agg(
                F.sum("n").alias("n"),
                F.sum("s").alias("s"),
                F.min("mn").alias("mn"),
                F.max("mx").alias("mx"),
            )
        )
        for r in merged.collect():
            d = direct[r["event_type"]]
            assert (r["n"], r["s"], r["mn"], r["mx"]) == (
                d["n"],
                d["s"],
                d["mn"],
                d["mx"],
            ), (mod, residue, r["event_type"])


def test_range_grid_equals_naive_range_join(spark):
    """The grid-cell rewrite must emit exactly the pairs the naive range
    predicate would, including boundary values (points exactly at lo and
    at hi, intervals straddling cell boundaries)."""
    cell = 8.0
    pts = spark.range(2000).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 37) % 1000 / 10.0).alias("x"),  # 0.0 .. 99.9
    )
    iv = spark.range(60).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 13) % 95).cast("double").alias("lo"),
        (((F.col("id") * 13) % 95) + 1 + (F.col("id") % 7)).cast("double").alias("hi"),
    )
    naive = pts.crossJoin(iv).filter(
        (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    )
    cells = iv.select(
        "iid",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / cell).cast("long"),
                F.floor(F.col("hi") / cell).cast("long"),
            )
        ).alias("cell"),
    )
    grid = (
        pts.withColumn("cell", F.floor(F.col("x") / cell).cast("long"))
        .join(F.broadcast(cells), "cell")
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
    )
    a = sorted((r.pid, r.iid) for r in naive.select("pid", "iid").collect())
    b = sorted((r.pid, r.iid) for r in grid.select("pid", "iid").collect())
    assert a == b and len(a) > 0


def test_stream_cdc_merge_independent_of_chunking(spark, sf_dir):
    """The last-write-wins merge is an associative argmax, so the final
    state must not depend on how the replay chunks the data (2 vs 4 vs 8
    micro-batches, hash-partitioned differently each time)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from nyuki_spark.streaming.replay import replay_stream

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def run(n_chunks: int):
        scratch = tempfile.mkdtemp(prefix="nyuki-cdc-prop-")
        try:
            sdf = replay_stream(spark, events, n_chunks, scratch_dir=scratch)
            state = {"path": None}

            def upsert(batch, batch_id):
                new = (
                    batch.select("user_id", "ts", "event_id", "value")
                    .withColumn("rn", F.row_number().over(w))
                    .where(F.col("rn") == 1)
                    .drop("rn")
                )
                both = (
                    spark.read.parquet(state["path"]).unionByName(new)
                    if state["path"]
                    else new
                )
                merged = (
                    both.withColumn("rn", F.row_number().over(w))
                    .where(F.col("rn") == 1)
                    .drop("rn")
                )
                out = os.path.join(scratch, f"s{batch_id}")
                merged.write.mode("overwrite").parquet(out)
                state["path"] = out

            q = (
                sdf.writeStream.foreachBatch(upsert)
                .option(
                    "checkpointLocation", os.path.join(scratch, "ckpt")
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300), "CDC replay drain timed out"
            rows = sorted(
                (r.user_id, r.ts, r.event_id)
                for r in spark.read.parquet(state["path"]).collect()
            )
            return rows
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    r2, r4 = run(2), run(4)
    assert r2 == r4 and len(r2) > 0
