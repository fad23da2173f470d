"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k, Arrow-vectorized — the whole embedding
matrix streams through a pandas UDF in Arrow batches, each batch scored with
one BLAS matvec (`M @ q`). This is embarrassingly parallel (no shuffle until
the final top-k, which is a TakeOrderedAndProject — per-partition heaps then
a k-row merge on the driver), so it scales linearly with executors.

Scale path: ``knn_cosine_lsh`` buckets vectors with MLlib's
BucketedRandomProjectionLSH (random hyperplanes) and only scores the probe's
buckets — sublinear candidate sets at the cost of recall (tested >= 0.9
against brute force in tests/test_similarity.py).

``label_centroids`` computes per-label mean embeddings JVM-side with
``posexplode`` + hash aggregation — no Python in the loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "cosine_scores",
    "knn_cosine",
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "label_centroids",
    "embedding_candidates_lsh",
    "build_ivf_index",
    "knn_cosine_ivf_indexed",
]


def cosine_scores(df: DataFrame, query_vec: list[float], emb_col: str = "embedding") -> DataFrame:
    """Add a ``sim`` column: cosine similarity of ``emb_col`` to ``query_vec``.

    float64 math (matches DuckDB's LIST_COSINE_SIMILARITY bit-for-bit on the
    fixture vectors after ROUND(.,4) — verified in the t2 harness).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def _cos(batch: pd.Series) -> pd.Series:
        m = np.stack(batch.to_numpy()).astype(np.float64)
        sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
        return pd.Series(sims)

    return df.withColumn("sim", _cos(F.col(emb_col)))


def knn_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Brute-force top-k by cosine similarity; ties broken by ``id_col``.

    The ``orderBy().limit(k)`` plans as TakeOrderedAndProject: each
    partition keeps a k-row heap, the driver merges heaps — no global sort,
    no full shuffle, O(k) driver memory.
    """
    scored = cosine_scores(df, query_vec, emb_col)
    sim = F.round(F.col("sim"), round_to) if round_to is not None else F.col("sim")
    return (
        scored.select(F.col(id_col), sim.cast("double").alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_cosine_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane bucketing (MLlib LSH).

    For unit-normalised vectors, Euclidean NN order == cosine NN order
    (||a-b||^2 = 2 - 2cos), so BucketedRandomProjectionLSH's
    approxNearestNeighbors gives cosine neighbours. Returns the same schema
    as :func:`knn_cosine` (id, sim) for drop-in comparison.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    vecs = df.select(id_col, array_to_vector(F.col(emb_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    q = Vectors.dense([float(x) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    nn = model.approxNearestNeighbors(vecs, q, k)
    # distCol is Euclidean; convert back to cosine for a comparable score.
    sim = (F.lit(1.0) - F.col("distCol") * F.col("distCol") / (2.0 * qn * qn))
    return nn.select(F.col(id_col), F.round(sim, 4).cast("double").alias("sim")).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    emb_col: str = "embedding",
    dims: list[int] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Per-label centroid components, entirely JVM-side (no UDF).

    ``dims=None`` averages every component via posexplode (one shuffle,
    partial aggregation map-side); an explicit ``dims`` list averages only
    those components with plain column arithmetic.
    """
    if dims is not None:
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.round(F.avg(F.col(emb_col)[d]), round_to).cast("double").alias(f"c{d}")
            for d in dims
        ]
        return df.groupBy(label_col).agg(*aggs).orderBy(label_col)
    exploded = df.select(label_col, F.posexplode(F.col(emb_col)).alias("dim", "v"))
    return (
        exploded.groupBy(label_col, "dim")
        .agg(F.round(F.avg("v"), round_to).cast("double").alias("c"))
        .groupBy(label_col)
        .agg(F.map_from_entries(F.sort_array(F.collect_list(F.struct("dim", "c")))).alias("centroid"))
        .orderBy(label_col)
    )


def embedding_candidates_lsh(
    df: DataFrame,
    sim_floor: float = 0.3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs with cosine >= ``sim_floor``, via LSH.

    The scale path for pair search: random-projection bucketing turns the
    all-pairs problem into an equi-join on (hash-table, bucket) keys —
    candidate volume scales with bucket collisions, not |corpus|^2. For
    unit-normalised embeddings ``d^2 = 2 - 2*cos``, so a cosine floor maps
    exactly to a Euclidean radius for ``approxSimilarityJoin`` (which also
    verifies the TRUE distance on candidates, discarding false positives).

    Recall is probabilistic (seeded, hence deterministic per run): a true
    pair is missed only if it collides in none of ``num_hash_tables``
    tables. At the defaults the fixture corpora lose no pair above the
    floor (asserted against brute force in tests/test_similarity.py); on a
    real near-dup corpus the interesting pairs sit far above any sane
    floor, where collision probability is highest.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    # Cosine floor -> Euclidean radius on the unit sphere.
    radius = float(np.sqrt(max(2.0 - 2.0 * sim_floor, 0.0)))
    vecs = df.select(F.col(id_col).alias("id"), array_to_vector(F.col(emb_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, radius, distCol="_d")
    return (
        joined.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(F.col("datasetA.id").alias("id_a"), F.col("datasetB.id").alias("id_b"))
        .distinct()
    )


def knn_cosine_ivf(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    Classic IVF-flat (Jegou et al., public): k-means learns ``n_cells``
    coarse centroids; every vector is assigned to its nearest cell (one
    narrow pass); a query scores only the ``n_probe`` cells whose
    centroids are most similar — at scale the cell id becomes a partition
    key, so a probe touches n_probe/n_cells of the data and the rest is
    never read (partition pruning on the parquet layout).

    Deterministic for a fixed seed. Same output schema as
    :func:`knn_cosine` for drop-in recall comparison.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(id_col, F.col(emb_col), array_to_vector(F.col(emb_col)).alias("features"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs)

    q = np.asarray(query_vec, dtype=np.float64)
    centroids = [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    by_sim = sorted(
        range(len(centroids)),
        key=lambda i: -(
            float(np.dot(centroids[i], q))
            / ((np.linalg.norm(centroids[i]) * np.linalg.norm(q)) or 1.0)
        ),
    )
    probe_cells = by_sim[:n_probe]
    # Cell-pruned exact scoring: only n_probe cells cross the Arrow boundary.
    pool = assigned.where(F.col("cell").isin(probe_cells)).drop("features", "cell")
    return knn_cosine(pool, query_vec, k=k, id_col=id_col, emb_col=emb_col)


def _probe_cells(centroids: list[tuple[int, list[float]]], query_vec: list[float], n_probe: int) -> list[int]:
    """The ``n_probe`` cell ids whose centroids are most cosine-similar."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0

    def sim(c: list[float]) -> float:
        v = np.asarray(c, dtype=np.float64)
        return float(np.dot(v, q) / ((np.linalg.norm(v) or 1.0) * qn))

    return [cell for cell, c in sorted(centroids, key=lambda t: -sim(t[1]))][:n_probe]


def build_ivf_index(
    df: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Fit-once IVF index build: the expensive step, run once and persisted.

    K-means learns ``n_cells`` coarse centroids; every vector is written to
    ``{index_dir}/vectors`` **partitioned by its cell id**, centroids to
    ``{index_dir}/centroids``. Queries then read only their probed cells'
    directories — real partition pruning at the parquet layout level, so a
    probe touches ~n_probe/n_cells of a 100 TB corpus and the rest is never
    scanned. (Round-1 version re-fit KMeans inside every query call — the
    classic IVF anti-pattern this split removes.)
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = df.sparkSession
    vecs = df.select(F.col(id_col), F.col(emb_col), array_to_vector(F.col(emb_col)).alias("features"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell").fit(vecs)
    assigned = model.transform(vecs).drop("features")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{index_dir}/vectors")
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark.createDataFrame(cents, "cell int, centroid array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/centroids")


def knn_cosine_ivf_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Query a prebuilt IVF index (:func:`build_ivf_index`) — no fitting.

    Reads the (tiny) centroid table, picks ``n_probe`` cells driver-side,
    then scans only those cells' partitions: the ``cell IN (...)`` filter
    prunes at the directory level (`PartitionFilters` in the plan), so
    unprobed cells cost zero I/O. Exact scoring on the pool via
    :func:`knn_cosine`.
    """
    centroids = [
        (int(r["cell"]), list(r["centroid"]))
        for r in spark.read.parquet(f"{index_dir}/centroids").collect()
    ]
    cells = _probe_cells(centroids, query_vec, n_probe)
    pool = (
        spark.read.parquet(f"{index_dir}/vectors")
        .where(F.col("cell").isin(cells))
        .drop("cell")
    )
    return knn_cosine(pool, query_vec, k=k, id_col=id_col, emb_col=emb_col)
