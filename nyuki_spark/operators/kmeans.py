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

Scale shape per iteration (embeddings N x d, k centroids) — r12 replan
(guide §2.4 "remove shuffles outright"):

- assignment: the k centroids are ALWAYS driver-side literals (the seed is
  a bounded k-row collect; each update ends in the same k-row collect the
  old code already took), so the argmin is a PURE MAP —
  ``array_min(array(struct(dist_0, 0), .., struct(dist_{k-1}, k-1)))`` over
  k literal-centroid distance folds, whole-stage codegen, ZERO shuffle.
  The pre-r12 shape (broadcast crossJoin to k x N rows, then a hash
  aggregate ``min(struct(dist, cid))`` keyed on (id, vector)) shuffled N
  rows WITH their embedding payload per iteration — at 100 TB that is an
  embedding-sized exchange per Lloyd round that the literal form simply
  deletes. The arithmetic is unchanged operation for operation: the same
  ``zip_with``+``aggregate`` left-to-right fp fold per centroid, and
  ``array_min`` over (dist, cid) structs is the same
  lexicographic argmin/tie-break ``min(struct(dist, cid))`` computed —
  per row instead of per shuffled group — so assignments are bit-identical
  (re-verified against the DuckDB twins for every kmeans-backed query).
- update: ``posexplode`` the assigned vectors, ONE (cluster, dim) hash
  aggregate of avg over narrow (int, int, double) rows — now the ONLY
  shuffle in the loop — re-assembled with ``sort_array(collect_list(...))``
  over k*d tiny rows. Centroid components are rounded to 6 decimals so the
  aggregation order of the avg (engine-dependent) cannot leak into the
  next iteration's distances.

Only the k-row centroid table is ever collected to the driver (to seed the
next iteration's literal expressions — the same bounded hop the old
broadcast literal took). k and ``iters`` are compile-time small, so the
whole run is ``iters - 1`` narrow shuffle rounds plus map-only assignment —
the 100 TB plan, now one exchange cheaper per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmeans_assign",
    "kmeans_fit",
    "assign_with_centroids",
    "centroid_update",
]


def _sq_dist(a, b):
    """Sum of squared differences, folded left-to-right (order-pinned)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _lit_vec(vals) -> F.Column:
    """array<double> literal for one centroid."""
    return F.array(*[F.lit(float(v)) for v in vals])


def assign_with_centroids(vec_col, centroids) -> F.Column:
    """Argmin cluster id of ``vec_col`` (array<double> Column) against
    ``centroids`` — a list of (cid, components) pairs — as a pure map
    Column: ``array_min`` over per-centroid (dist, cid) structs is the
    deterministic argmin with the cid tie-break (struct ordering compares
    dist first, then cid), identical to the grouped
    ``min(struct(dist, cid))`` the pre-r12 crossJoin form computed, with
    the same left-to-right squared-distance fold per centroid. No
    shuffle, no join: the centroid table is compile-time small by
    contract, so it rides in the plan as literals (the broadcast of a
    k-row table, without the exchange machinery)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _sq_dist(vec_col, _lit_vec(c)).alias("dist"),
                    F.lit(int(cid)).cast("int").alias("cid"),
                )
                for cid, c in centroids
            ]
        )
    )["cid"]


def centroid_update(assigned: DataFrame, round_to: int = 6) -> list:
    """Mean per (cluster, dim) of the assigned vectors, rounded so the
    engine's fp aggregation order cannot alter the next iteration;
    returned as the (cid, components) list the literal assignment
    consumes — the ONLY driver collect in the loop, bounded by k rows.
    ``assigned`` needs columns (cluster_id, e array<double>)."""
    rows = (
        assigned.select("cluster_id", F.posexplode("e").alias("dim", "val"))
        .groupBy("cluster_id", "dim")
        .agg(F.round(F.avg("val"), round_to).alias("v"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "v"))).alias("dv"))
        .select(
            F.col("cluster_id").alias("cid"),
            F.transform("dv", lambda s: s.getField("v")).alias("c"),
        )
        .collect()
    )
    return [(int(r["cid"]), list(r["c"])) for r in rows]


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
    cent: list = [(i, list(r["e"])) for i, r in enumerate(seed)]
    for _ in range(iters - 1):
        assigned = e.select(
            id_col, "e", assign_with_centroids(F.col("e"), cent).alias("cluster_id")
        )
        cent = centroid_update(assigned)
    final = e.select(
        F.col(id_col),
        assign_with_centroids(F.col("e"), cent).alias("cluster_id"),
    )
    cent_df = emb.sparkSession.createDataFrame(
        [(cid, c) for cid, c in cent], "cid int, c array<double>"
    )
    return final, cent_df


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
