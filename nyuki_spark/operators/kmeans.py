"""Deterministic fixed-iteration Lloyd k-means over an embedding column.

Semantic dedup / corpus curation pipelines (e.g. SemDeDup-style pruning)
cluster document embeddings and then reason per cluster. MLlib's KMeans is
the full library answer, but its k-means|| init and early-stopping are both
seeded/iteration-count nondeterministic, which makes cross-engine oracle
verification impossible. This operator is the *deterministic* core: fixed
init (the embeddings of the ``k`` smallest ids) and a fixed number of Lloyd
iterations, so two independent engines produce bit-identical assignments —
the property the oracle harness needs, and in practice what a reproducible
data pipeline wants anyway.

Scale shape per iteration (embeddings N x d, k centroids):

- assignment: broadcast the k-row centroid table, crossJoin (map-side,
  k x N narrow rows, no shuffle of the big side), squared distance as a
  ``zip_with``+``aggregate`` fold (JVM codegen, left-to-right so the fp
  sum order is pinned), then ONE hash aggregate ``min(struct(dist, cid))``
  per vec — argmin with deterministic tie-break, partial-agg friendly;
- update: ``posexplode`` the assigned vectors, ONE (cluster, dim) hash
  aggregate of avg, re-assemble with ``sort_array(collect_list(...))`` over
  k*d tiny rows. Centroid components are rounded to 6 decimals so the
  aggregation order of the avg (engine-dependent) cannot leak into the
  next iteration's distances.

Only the k-row centroid table is ever collected to the driver (to seed the
next iteration's broadcast literal); the N-row side stays distributed
throughout. k and ``iters`` are compile-time small, so the whole run is
``iters`` shuffle rounds over narrow rows — the 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans_fit"]


def _sq_dist(a, b):
    """Sum of squared differences, folded left-to-right (order-pinned)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cluster_id) after ``iters`` Lloyd iterations from the
    deterministic seed (vectors of the ``k`` smallest ids, cid by id order).
    """
    assigned, _cent = _kmeans_core(emb, k, iters, id_col, vec_col)
    return assigned


def _kmeans_core(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
    )
    # Seed: TakeOrderedAndProject fetches the k smallest ids (no global
    # sort, no single-partition window), then a bounded k-row collect
    # assigns cids by id order — same k-row driver hop the update step
    # already takes.
    seed = e.orderBy(id_col).limit(k).collect()
    cent = emb.sparkSession.createDataFrame(
        [(i, list(r["e"])) for i, r in enumerate(seed)],
        "cid int, c array<double>",
    )
    assigned = None
    for it in range(iters):
        scored = e.crossJoin(F.broadcast(cent)).select(
            id_col,
            "e",
            F.struct(
                _sq_dist(F.col("e"), F.col("c")).alias("dist"),
                F.col("cid").alias("cid"),
            ).alias("dc"),
        )
        assigned = scored.groupBy(id_col, "e").agg(
            F.min("dc").getField("cid").alias("cluster_id")
        )
        if it == iters - 1:
            break
        # Update step: mean per (cluster, dim), rounded so the engine's fp
        # aggregation order cannot alter the next iteration; materialised to
        # a k-row literal (the ONLY driver collect — bounded by k) so each
        # iteration's plan starts from data, not from replayed lineage.
        cent_rows = (
            assigned.select(
                "cluster_id", F.posexplode("e").alias("dim", "val")
            )
            .groupBy("cluster_id", "dim")
            .agg(F.round(F.avg("val"), 6).alias("v"))
            .groupBy("cluster_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "v"))
                ).alias("dv")
            )
            .select(
                F.col("cluster_id").alias("cid"),
                F.transform("dv", lambda s: s.getField("v")).alias("c"),
            )
            .collect()
        )
        cent = emb.sparkSession.createDataFrame(
            cent_rows, "cid int, c array<double>"
        )
    assert assigned is not None
    return assigned.select(id_col, "cluster_id"), cent


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(assignments, centroids): like :func:`kmeans_assign` but also
    returns the codebook the final assignment used — the (cid,
    c array<double>) table of the last centroid update (rounded to 6
    decimals, k rows). This is what a product-quantization ADC search
    needs: distances are computed against the codebook, not the data.
    """
    return _kmeans_core(emb, k, iters, id_col, vec_col)
