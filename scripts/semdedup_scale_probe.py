"""SemDeDup cell-scaling probe (r8 verdict #2).

llm_semdedup's k is a rows-per-cell target over DISTINCT-embedding
representatives (k = max(8, ceil(n_reps/250))), and the quantizer runs
over reps only. This probe shows WHY the contract matters at scale.

Two parts:

1. **Committed fixtures** (sf0.1 / sf1 / sf3): raw rows grow 10x/30x but
   the fixtures replicate the same 2000 distinct vectors, so the exact
   tier absorbs the growth and the rep-level pair stage stays constant —
   the duplicate-collapse discipline doing its job.
2. **Synthetic distinct corpus** (2k/20k/60k genuinely distinct vectors,
   hash-derived so the probe is deterministic): within-cell pair count
   and end-to-end time under (a) the parameterized k and (b) the old
   fixed k=8. Fixed k gives pair growth ~ n^2/k (quadratic); the
   rows-per-cell k keeps expected cell size constant, so pairs grow
   ~ n * rows_per_cell / 2 (linear). Assignment cost is n x k map-only
   distance folds — reported so the two-level-quantizer escape hatch
   has a measured trigger point.

Prints markdown tables for BASELINE.md.

Usage: python scripts/semdedup_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyuki_spark.operators.kmeans import kmeans_assign
from nyuki_spark.queries.llm import SEMDEDUP_ROWS_PER_CELL, _semdedup_fn
from nyuki_spark.session import get_session

SF_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/testdata_sf1"),
    ("sf3", "/root/repo/testdata_sf3"),
]


def synth(spark, n: int):
    """n distinct 64-dim vectors, hash-derived (deterministic)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (F.pmod(F.hash(F.col("id"), i), F.lit(1000)) / 1000.0).cast(
                "float"
            ),
        ).alias("embedding"),
    )


def cell_pairs_and_time(spark, reps, k: int) -> tuple[int, float]:
    """(sum over cells of C(m,2), assignment wall time) at cell count k."""
    t0 = time.perf_counter()
    asg = kmeans_assign(reps, k=k, iters=2).localCheckpoint(eager=True)
    t_asg = time.perf_counter() - t0
    per_cell = asg.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("m"))
    row = per_cell.agg(
        F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("p")
    ).head()
    return int(row["p"] or 0), t_asg


def main() -> None:
    os.environ.setdefault("NYUKI_SHUFFLE_PARTITIONS", "32")
    spark = get_session("semdedup-scale-probe", master="local[32]")
    print("loadavg", [round(x, 2) for x in os.getloadavg()])

    print("\n## committed fixtures (duplicate-collapse absorbs the growth)\n")
    print("| sf | raw rows | distinct reps | k | semdedup e2e (s) |")
    print("|---|---|---|---|---|")
    for label, sf_dir in SF_DIRS:
        if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
            print(f"| {label} | (missing {sf_dir}) | | | |")
            continue
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        n_reps = emb.select("embedding").distinct().count()
        k = max(8, -(-n_reps // SEMDEDUP_ROWS_PER_CELL))
        t0 = time.perf_counter()
        _semdedup_fn(spark, sf_dir).collect()
        t = time.perf_counter() - t0
        print(f"| {label} | {n} | {n_reps} | {k} | {t:.1f} |")
        spark.catalog.clearCache()

    print("\n## synthetic distinct corpus (k growth exercised)\n")
    print(
        "| n distinct | k (rows/cell) | cell pairs @k | assign (s) @k | "
        "cell pairs @fixed k=8 | assign (s) @8 |"
    )
    print("|---|---|---|---|---|---|")
    for n in (2_000, 20_000, 60_000):
        reps = synth(spark, n).localCheckpoint(eager=True)
        k = max(8, -(-n // SEMDEDUP_ROWS_PER_CELL))
        p_k, t_k = cell_pairs_and_time(spark, reps, k)
        p_8, t_8 = cell_pairs_and_time(spark, reps, 8)
        print(f"| {n} | {k} | {p_k} | {t_k:.1f} | {p_8} | {t_8:.1f} |")
        spark.catalog.clearCache()
    print("\nloadavg_end", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
