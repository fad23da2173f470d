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

__all__ = ["cosine_scores", "knn_cosine", "knn_cosine_lsh", "knn_cosine_ivf", "label_centroids"]


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
