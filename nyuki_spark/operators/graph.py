"""Graph-structure operators over edge-list DataFrames.

Triangle counting uses degree-ordered orientation (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW'11): orient
each undirected edge from its lower-(deg, node) endpoint to the higher,
so every triangle is counted exactly once and the per-node wedge fanout
is bounded by out-degree <= O(sqrt(|E|)) even under hub skew. All joins
are key-partitioned equi-joins over narrow integer rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["triangle_stats"]


def triangle_stats(backbone: DataFrame) -> tuple[int, int, int, int]:
    """(n_nodes, n_edges, n_wedges, n_triangles) for an undirected simple
    graph given as one row per edge with columns ``u``, ``v`` (each pair
    present once, in either orientation, no self-loops).

    The node-rank window is node-count-sized (one row per node), so its
    single partition is bounded by the vertex set, not the data volume —
    the same contract as operators/rank.py's small-side phase.
    """
    und = backbone.unionByName(
        backbone.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    rank = deg.select(
        "u", F.row_number().over(Window.orderBy("deg", "u")).alias("ord")
    )
    oriented = (
        und.join(rank, "u")
        .join(
            rank.select(F.col("u").alias("v"), F.col("ord").alias("ord_v")),
            "v",
        )
        .where(F.col("ord") < F.col("ord_v"))
        .select(F.col("ord").alias("lo"), F.col("ord_v").alias("hi"))
    )
    # Four count() actions follow; pin the edge-list-sized intermediates so
    # none replays the upstream lineage per action.
    backbone = backbone.persist()
    oriented = oriented.persist()
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = (
        e1.join(
            e2,
            (F.col("e1.lo") == F.col("e2.lo"))
            & (F.col("e1.hi") < F.col("e2.hi")),
        )
        .select(F.col("e1.hi").alias("lo"), F.col("e2.hi").alias("hi"))
        .persist()
    )
    tri = wedges.join(oriented, ["lo", "hi"], "semi")
    try:
        n_nodes = deg.count()
        n_edges = backbone.count()
        n_wedges = wedges.count()
        n_tri = tri.count()
    finally:
        for df in (wedges, oriented, backbone):
            df.unpersist()
    return n_nodes, n_edges, n_wedges, n_tri
