"""Graph-structure operators over edge-list DataFrames.

Triangle counting uses degree-ordered orientation (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW'11): orient
each undirected edge from its lower-(deg, node) endpoint to the higher,
so every triangle is counted exactly once and the per-node wedge fanout
is bounded by out-degree <= O(sqrt(|E|)) even under hub skew. The total
order is the (deg, node) TUPLE comparison itself — no rank table, no
global row-number window (the r5-advice scale fix: the old node-rank
window was a SinglePartition sort over the whole vertex set). All joins
are key-partitioned equi-joins over narrow integer rows, and the whole
computation is ONE lazy plan, so the registry plan sweep sees every
operator it executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_summary", "triangle_stats"]


def triangle_summary(backbone: DataFrame) -> DataFrame:
    """1-row DataFrame ``(n_nodes, n_edges, n_wedges, n_triangles,
    clustering)`` for an undirected simple graph given as one row per
    edge with columns ``u``, ``v`` (each pair present once, in either
    orientation, no self-loops).

    ``n_wedges`` is the TOTAL wedge (2-path) count sum C(deg, 2) over the
    undirected degree table, and ``clustering`` = 3 * triangles / wedges
    is the standard global clustering coefficient (transitivity) — each
    triangle closes three of those wedges, so the ratio is <= 1. The
    oriented wedge set (bounded fanout) is used only to FIND triangles;
    using its size as the denominator triple-counts (r5 advice).

    Fully lazy: the caller's plan contains the orientation joins, the
    wedge self-join, the closing semi-join, and four 1-row aggregates
    combined by 1-row broadcast crossJoins — every stage visible to plan
    inspection, nothing eager, no driver round-trips.
    """
    und = backbone.unionByName(
        backbone.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # Orient each edge by the (deg, node) tuple order: lower endpoint ->
    # higher. A strict total order (node ids are unique), so every
    # triangle yields exactly one oriented wedge + closing edge, and the
    # out-degree of any node is O(sqrt(|E|)) regardless of hub skew.
    o = (
        und.join(deg.select(F.col("u"), F.col("deg").alias("ds")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("dt")),
            "v",
        )
        .where(
            (F.col("ds") < F.col("dt"))
            | ((F.col("ds") == F.col("dt")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("s"), F.col("v").alias("t"), "dt")
    )
    e1 = o.select(F.col("s"), F.col("t").alias("a"), F.col("dt").alias("da"))
    e2 = o.select(F.col("s"), F.col("t").alias("b"), F.col("dt").alias("db"))
    # Two out-edges of the same source, ordered by the same tuple order,
    # form the oriented wedge; the closing edge (if any) must run a -> b.
    wedges = (
        e1.join(e2, "s")
        .where(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
    )
    tri = wedges.join(
        o.select(F.col("s").alias("a"), F.col("t").alias("b")),
        ["a", "b"],
        "semi",
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ne = backbone.agg(F.count(F.lit(1)).alias("n_edges"))
    # deg*(deg-1) is always even; DIV keeps the per-row term exact in
    # int64 (a double /2 would lose exactness past 2^53 at scale).
    nw = deg.agg(
        F.coalesce(
            F.sum(F.expr("deg * (deg - 1) DIV 2")), F.lit(0)
        ).alias("n_wedges")
    )
    nt = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        nn.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(nw))
        .crossJoin(F.broadcast(nt))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
                )
            )
            .cast("double")
            .alias("clustering"),
        )
    )


def triangle_stats(backbone: DataFrame) -> tuple[int, int, int, int]:
    """Convenience tuple ``(n_nodes, n_edges, n_wedges, n_triangles)``
    — one collect of the 1-row :func:`triangle_summary`."""
    r = triangle_summary(backbone).head()
    return r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]
