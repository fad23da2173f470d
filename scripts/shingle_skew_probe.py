"""Hot-shingle skew probe for the Jaccard pair funnel (r6 verdict #3).

Scenario: a viral boilerplate phrase (10 tokens) is prepended to k
otherwise-distinct documents on top of the sf0.1 corpus. Every pure-boiler
3-gram then has document frequency k, so the UNCAPPED shingle self-join
nominates all C(k,2) boilerplate pairs — quadratic in the duplication
factor even though none of those pairs is a true near-dup (each synthetic
doc carries 12 unique tail tokens, so cross-pair Jaccard = 8/32 = 0.25,
under the 0.5 threshold). The df-capped tier (``df_cap=50`` — above the corpus's true max df of 25,
far below viral df) prunes the
hot shingles from NOMINATION only; verification uses full shingle sets,
so on this corpus capped and uncapped emit IDENTICAL results (asserted at
k=1000) while capped cost stays flat in k.

Prints a markdown table for BASELINE.md. Runs the uncapped nomination
count at every k (that IS the quadratic term) but the full uncapped
pipeline only at k <= 1000 (at k=10^4 its verification join alone is
~10^9 rows — the bug this cap exists to prevent).

Usage: python scripts/shingle_skew_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyuki_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs
from nyuki_spark.session import get_session

BOILER = "all rights reserved unauthorized reproduction of this page is prohibited"


def skewed_corpus(spark, sf_dir: str, k: int):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    if k == 0:
        return docs
    syn = spark.range(k).select(
        (F.lit(10_000_000) + F.col("id")).alias("doc_id"),
        F.concat(
            F.lit(BOILER + " "),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(11)),
                    lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("_"), j),
                ),
            ),
        ).alias("text"),
    )
    return docs.unionByName(syn)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("NYUKI_SHUFFLE_PARTITIONS", "32")
    spark = get_session("shingle-skew-probe", master="local[32]")
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    print("| k (boiler dups) | uncapped nominated pairs | uncapped full (s) | capped full (s) | capped pairs out | cont uncapped (s) | cont capped (s) | cont pairs out |")
    print("|---|---|---|---|---|---|---|---|")
    for k in (0, 1_000, 10_000):
        corpus = skewed_corpus(spark, sf_dir, k).localCheckpoint(eager=True)
        # Quadratic term: distinct pairs the uncapped self-join must nominate.
        from nyuki_spark.functions.text import word_ngrams

        sh = word_ngrams(corpus, n=3)
        t0 = time.perf_counter()
        a, b = sh.alias("a"), sh.alias("b")
        nom_uncapped = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )
        t_nom = time.perf_counter() - t0
        if k <= 1_000:
            t0 = time.perf_counter()
            full_uncapped = ngram_jaccard_pairs(corpus, threshold=0.5, n=3)
            rows_uncapped = full_uncapped.count()
            t_unc = f"{time.perf_counter() - t0:.1f}"
        else:
            rows_uncapped = None
            t_unc = "skipped (verification join ~1e9 rows)"
        t0 = time.perf_counter()
        capped = ngram_jaccard_pairs(corpus, threshold=0.5, n=3, df_cap=50)
        rows_capped = capped.count()
        t_cap = time.perf_counter() - t0
        if rows_uncapped is not None:
            assert rows_capped == rows_uncapped, (
                f"cap lost pairs at k={k}: {rows_capped} vs {rows_uncapped}"
            )
        # Containment funnel (r7 verdict #1): same cap, bound evaluated at
        # containment's threshold test. Synthetic docs share only the 8
        # pure-boiler shingles out of min 20 per doc (containment 0.4 <
        # 0.8), so capped and uncapped emit identical pairs here too.
        if k <= 1_000:
            t0 = time.perf_counter()
            rows_cont_unc = containment_pairs(corpus, threshold=0.8, n=3).count()
            t_cont_unc = f"{time.perf_counter() - t0:.1f}"
        else:
            rows_cont_unc = None
            t_cont_unc = "skipped"
        t0 = time.perf_counter()
        rows_cont_cap = containment_pairs(
            corpus, threshold=0.8, n=3, df_cap=50
        ).count()
        t_cont_cap = time.perf_counter() - t0
        if rows_cont_unc is not None:
            assert rows_cont_cap == rows_cont_unc, (
                f"containment cap lost pairs at k={k}: "
                f"{rows_cont_cap} vs {rows_cont_unc}"
            )
        print(
            f"| {k} | {nom_uncapped} ({t_nom:.1f}s) | {t_unc} | "
            f"{t_cap:.1f} | {rows_capped} | {t_cont_unc} | "
            f"{t_cont_cap:.1f} | {rows_cont_cap} |"
        )
        corpus.unpersist()
        spark.catalog.clearCache()
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    spark.stop()


if __name__ == "__main__":
    main()
