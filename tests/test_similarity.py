"""Similarity-search tests: ANN recall vs brute force.

The brute-force path is oracle-checked (llm_knn_cosine vs DuckDB
LIST_COSINE_SIMILARITY); here we measure the approximate tier against it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.operators.similarity import knn_cosine, knn_cosine_lsh


def test_lsh_knn_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    qv = [float(x) for x in q]
    pool = emb.where(F.col("vec_id") != 0)
    exact = [r.vec_id for r in knn_cosine(pool, qv, k=10).collect()]
    approx = [r.vec_id for r in knn_cosine_lsh(pool, qv, k=10).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.9, f"LSH kNN recall {recall:.2f} vs brute force"


def test_ivf_knn_recall(spark, sf_dir):
    from nyuki_spark.operators.similarity import knn_cosine_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    qv = [float(x) for x in q]
    pool = emb.where(F.col("vec_id") != 0)
    exact = [r.vec_id for r in knn_cosine(pool, qv, k=10).collect()]
    approx = [r.vec_id for r in knn_cosine_ivf(pool, qv, k=10, n_cells=8, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.7, f"IVF kNN recall {recall:.2f} vs brute force"
    # Determinism: same seed, same result set.
    again = [r.vec_id for r in knn_cosine_ivf(pool, qv, k=10, n_cells=8, n_probe=4).collect()]
    assert approx == again
