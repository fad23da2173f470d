"""Distributed dense linear algebra over embedding columns.

The Gram/second-moment matrix is the input to PCA whitening, covariance
drift monitoring, and ZCA decorrelation. The implementation is the
treeAggregate shape: each Arrow batch computes its partial d x d Gram
with one BLAS matmul inside ``mapInPandas`` and emits d^2 narrow
(i, j, partial) rows, so the only shuffle is a d^2-key partial-sum
aggregate whose volume is O(partitions x d^2) — independent of row
count. At 100 TB the reduce side stays a constant few MB while the scan
stays map-only. A per-row explode would shuffle d^2 times the data
volume; a driver-side collect would not be distributed at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_upper"]


def gram_upper(vectors: DataFrame, dims: int, decimals: int = 6) -> DataFrame:
    """Upper-triangular Gram matrix of ``vectors`` (one ``array<double>``
    column named ``v``): rows (i, j, gram) with 1-based i <= j and
    gram = sum over rows of v[i]*v[j], rounded to ``decimals``.

    FP: partials are float64 BLAS sums; cross-partitioning order
    differences are ~1e-13 relative, pinned by the round so output is
    bit-identical across batch splits.
    """
    import numpy as np
    import pandas as pd

    # Emit only the upper triangle from each partial (the matrix is
    # symmetric), so the shuffle carries d*(d+1)/2 keys instead of d^2 —
    # halving both exchange volume and aggregate state (r5 advice).
    def partial_gram(batches):
        iu, ju = np.triu_indices(dims)
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            g = v.T @ v
            yield pd.DataFrame(
                {
                    "i": iu.astype(np.int64) + 1,
                    "j": ju.astype(np.int64) + 1,
                    "s": g[iu, ju],
                }
            )

    return (
        vectors.select("v")
        .mapInPandas(partial_gram, "i long, j long, s double")
        .groupBy("i", "j")
        .agg(F.round(F.sum("s"), decimals).cast("double").alias("gram"))
        .orderBy("i", "j")
    )
