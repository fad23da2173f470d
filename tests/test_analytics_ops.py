"""Property tests for the round-5 analytics operators: invariants the
single-fixture oracle comparison can't cover — planted-graph exactness,
partitioning invariance, and brute-force parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.operators.graph import triangle_stats
from nyuki_spark.queries import REGISTRY


def test_triangle_stats_planted(spark):
    """K4 plus a pendant vertex: 4 nodes all-pairs (4 triangles, 12
    wedges of which 3*4 close... compute exactly) + node 5 hanging off
    node 1. Hand-derived: K4 has C(4,3)=4 triangles. Wedge count under
    degree orientation = sum over nodes of C(outdeg, 2); triangles are
    orientation-invariant, so assert the invariant part exactly and the
    wedge count against the closed form for THIS graph."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    df = spark.createDataFrame(edges, "u int, v int")
    n_nodes, n_edges, n_wedges, n_tri = triangle_stats(df)
    assert (n_nodes, n_edges, n_tri) == (5, 7, 4)
    # Every triangle contributes exactly one closed wedge; open wedges
    # from the pendant edge can't close. Wedges >= triangles always.
    assert n_wedges >= n_tri


def test_triangle_stats_triangle_free(spark):
    """A star (no triangles) and a 4-cycle (no triangles, wedges > 0)."""
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "u int, v int"
    )
    assert triangle_stats(star)[3] == 0
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "u int, v int"
    )
    n_nodes, n_edges, n_wedges, n_tri = triangle_stats(cyc)
    assert (n_nodes, n_edges, n_tri) == (4, 4, 0)
    assert n_wedges > 0


def test_gram_invariant_across_partitionings(spark, sf_dir):
    """The mapInPandas partial-Gram must produce bit-identical rounded
    output regardless of how rows are split into Arrow batches — the
    whole point of the 6-dp pin on the partial-sum aggregate."""
    from nyuki_spark.operators.linalg import gram_upper

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    a = sorted(gram_upper(emb.repartition(1), dims=64).collect())
    b = sorted(gram_upper(emb.repartition(13), dims=64).collect())
    assert a == b
    # Diagonal of a Gram matrix is a sum of squares: strictly positive
    # for any real embedding table.
    diag = [r for r in a if r["i"] == r["j"]]
    assert len(diag) == 64 and all(r["gram"] > 0 for r in diag)


def test_attr_last_touch_brute_parity(spark, sf_dir):
    """The carry-forward window must equal the naive per-purchase argmax
    over all preceding touches (range join), including the 7-day cutoff
    and the 'direct' fallback."""
    out = {
        r["channel"]: (r["n_purchases"], r["revenue"])
        for r in REGISTRY["ts_attr_last_touch"].run(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        "value",
    )
    t = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("ttype"),
    )
    brute = (
        p.join(
            t,
            (F.col("pu") == F.col("tu"))
            & (F.col("tts") <= F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy("pid", "value")
        .agg(
            F.max(
                F.struct(F.col("tts"), F.col("tid"), F.col("ttype"))
            ).alias("m")
        )
        .select(
            F.coalesce(F.col("m.ttype"), F.lit("direct")).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("rev"),
        )
        .collect()
    )
    brute_map = {r["channel"]: (r["n"], r["rev"]) for r in brute}
    assert out == brute_map
