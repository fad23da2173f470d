"""Backbone-densification probe for the graph family (r8 verdict #5).

The graph queries (net_triangles, net_common_neighbors, net_adamic_adar,
net_local_clustering, ...) all run on the 95th-percentile strong-tie
supplier backbone (queries/analytics.py:_supplier_backbone). The r6
analysis claims the percentile threshold bounds the working graph as the
raw co-occurrence graph densifies with data volume; this probe makes the
claim empirical: at each available scale factor it measures

- raw co-occurrence pairs (what an UNthresholded graph pass would carry),
- backbone edges / nodes (the working set every wedge join sees),
- wedge count sum(C(deg,2)) over the backbone (the common-neighbor /
  triangle join's true fanout),
- triangle-summary wall time on the backbone.

Prints a markdown table for BASELINE.md.

Usage: python scripts/graph_backbone_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyuki_spark.queries.analytics import _supplier_backbone
from nyuki_spark.operators.graph import triangle_summary
from nyuki_spark.session import get_session

SF_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/testdata_sf1"),
    ("sf3", "/root/repo/testdata_sf3"),
]


def main() -> None:
    os.environ.setdefault("NYUKI_SHUFFLE_PARTITIONS", "32")
    spark = get_session("graph-backbone-probe", master="local[32]")
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    print(
        "| sf | lineitem rows | raw co-occur pairs | backbone edges |"
        " backbone nodes | wedges sum C(deg,2) | triangle pass (s) |"
    )
    print("|---|---|---|---|---|---|---|")
    for label, sf_dir in SF_DIRS:
        if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
            print(f"| {label} | (missing {sf_dir}) | | | | | |")
            continue
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        n_li = li.count()
        per_order = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_suppkey")).alias("ss")
        )
        raw_pairs = (
            per_order.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ss, (x, i) ->"
                        " transform(slice(ss, i + 2, size(ss)),"
                        " y -> struct(x AS u, y AS v))))"
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
            .distinct()
            .count()
        )
        backbone = _supplier_backbone(spark, sf_dir).localCheckpoint(eager=True)
        n_edges = backbone.count()
        und = backbone.unionByName(
            backbone.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        n_nodes = deg.count()
        wedges = deg.agg(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
        ).head()["w"]
        t0 = time.perf_counter()
        triangle_summary(backbone).collect()
        t_tri = time.perf_counter() - t0
        print(
            f"| {label} | {n_li} | {raw_pairs} | {n_edges} | {n_nodes} |"
            f" {int(wedges)} | {t_tri:.1f} |"
        )
        spark.catalog.clearCache()
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
