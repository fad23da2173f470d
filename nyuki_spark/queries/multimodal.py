"""Multimodal decode queries: REAL codec round trips, oracle-verified.

These upgrade the multimodal story past byte plumbing: the engine encodes
standards-conformant media (8-bit BMP images, 16-bit PCM WAV audio — the
two formats decodable with zero external libraries), decodes them back
through magic-byte dispatch and real header/palette/padding parsing
(:mod:`nyuki_spark.functions.codecs`), and aggregates stats from the
DECODED pixel/sample arrays. The DuckDB oracle recomputes the same stats
from the closed-form payload definition — a header-parsing bug, palette
mixup, row-padding error, or bottom-up/top-down flip all change the
decoded values and hash-fail the compare.

Scale shape: one Arrow-batched ``mapInPandas`` encode stage and one decode
stage, both map-only (no shuffle until the final small aggregate); payload
bytes never cross the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.functions.multimodal import attach_synthetic_media, decode_media_stats
from nyuki_spark.queries.registry import register


def _mm_image_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    decoded = decode_media_stats(attach_synthetic_media(docs, kind="image"))
    return decoded.select(
        "doc_id",
        "kind",
        "width",
        "height",
        "n_values",
        F.round("mean_val", 6).alias("mean_px"),
    ).orderBy("doc_id")


register(
    "mm_image_stats",
    engine_fn=_mm_image_fn,
    oracle=(
        "SELECT d.doc_id, 'bmp' AS kind,\n"
        "  CAST(16 + d.doc_id % 8 AS INT) AS width,\n"
        "  CAST(8 + d.doc_id % 5 AS INT) AS height,\n"
        "  COUNT(*) AS n_values,\n"
        "  CAST(ROUND(AVG((3*x.i + 7*y.j + 11*d.doc_id) % 251), 6) AS DOUBLE) AS mean_px\n"
        "FROM documents d\n"
        "JOIN range(24) x(i) ON x.i < 16 + d.doc_id % 8\n"
        "JOIN range(13) y(j) ON y.j < 8 + d.doc_id % 5\n"
        "WHERE d.doc_id < 48\n"
        "GROUP BY d.doc_id ORDER BY d.doc_id"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL image decode round trip: engine encodes 8-bit BMPs "
        "(palette, 4-byte row padding, bottom-up rows), re-decodes them, "
        "and stats the PIXELS; oracle recomputes from the closed-form "
        "pixel definition"
    ),
)


def _mm_audio_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    decoded = decode_media_stats(attach_synthetic_media(docs, kind="audio"))
    return decoded.select(
        "doc_id",
        "kind",
        "sample_rate",
        F.col("n_values").alias("n_samples"),
        F.round("mean_val", 6).alias("mean_sample"),
    ).orderBy("doc_id")


register(
    "mm_audio_stats",
    engine_fn=_mm_audio_fn,
    oracle=(
        "SELECT d.doc_id, 'wav' AS kind, CAST(16000 AS INT) AS sample_rate,\n"
        "  COUNT(*) AS n_samples,\n"
        "  CAST(ROUND(AVG((t.i*(1 + d.doc_id % 13)) % 251 - 125), 6) AS DOUBLE) AS mean_sample\n"
        "FROM documents d\n"
        "JOIN range(880) t(i) ON t.i < 400 + (d.doc_id % 5)*80\n"
        "WHERE d.doc_id < 48\n"
        "GROUP BY d.doc_id ORDER BY d.doc_id"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL audio decode round trip: engine encodes 16-bit PCM WAVs "
        "(stdlib wave), re-decodes them, and stats the SAMPLES; oracle "
        "recomputes from the closed-form sample definition"
    ),
)


def _mm_png_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    decoded = decode_media_stats(attach_synthetic_media(docs, kind="png"))
    return decoded.select(
        "doc_id",
        "kind",
        "width",
        "height",
        "n_values",
        F.round("mean_val", 6).alias("mean_px"),
    ).orderBy("doc_id")


register(
    "mm_png_stats",
    engine_fn=_mm_png_fn,
    oracle=(
        "SELECT d.doc_id, 'png' AS kind,\n"
        "  CAST(12 + d.doc_id % 7 AS INT) AS width,\n"
        "  CAST(6 + d.doc_id % 6 AS INT) AS height,\n"
        "  COUNT(*) AS n_values,\n"
        "  CAST(ROUND(AVG((5*x.i + 3*y.j + 13*d.doc_id) % 241), 6) AS DOUBLE) AS mean_px\n"
        "FROM documents d\n"
        "JOIN range(19) x(i) ON x.i < 12 + d.doc_id % 7\n"
        "JOIN range(12) y(j) ON y.j < 6 + d.doc_id % 6\n"
        "WHERE d.doc_id < 48\n"
        "GROUP BY d.doc_id ORDER BY d.doc_id"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL PNG decode round trip (stdlib zlib codec): engine encodes "
        "8-bit grayscale PNGs with scanline filter doc_id%5 — exercising "
        "all five unfilter paths (None/Sub/Up/Average/Paeth) — re-decodes "
        "them, and stats the PIXELS; oracle recomputes from the "
        "closed-form pixel definition"
    ),
)


# -- perceptual-hash image near-dedup ----------------------------------------


def _mm_phash_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dedup via 64-bit pHash: encode a corpus of REAL BMPs in
    which each ``doc_id`` renders base pattern ``doc_id % 40`` plus a
    per-copy single-pixel perturbation, decode, pHash, and group. The
    DCT low-pass makes the hash invariant to the perturbation, so exact
    hash equality clusters the near-duplicate copies — image dedup
    without any pairwise comparison (for a Hamming-distance bound, band
    the 64 bits into four 16-bit keys exactly like the SimHash funnel).

    Rows-only tier: the DCT is float linear algebra no SQL oracle can
    reproduce bit-exactly; grouping invariants are asserted in
    tests/test_multimodal.py instead.

    Scale shape: two Arrow-batched map-only stages (encode, decode+hash),
    then one hash-keyed aggregate — payload bytes never shuffle, only the
    8-byte hashes do.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from nyuki_spark.functions.multimodal import _codecs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    enc, dec, ph = _codecs.encode_bmp_gray8, _codecs.decode_bmp, _codecs.phash64

    gen_schema = StructType(
        [StructField("doc_id", LongType()), StructField("phash", LongType())]
    )

    def gen(batches):
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                base = i % 40
                xs = np.arange(32)[None, :]
                ys = np.arange(32)[:, None]
                img = ((3 * xs + 7 * ys + 11 * base) % 251).astype(np.uint8)
                # per-copy noise: one pixel nudged by +1 (no wraparound)
                px, py = i % 32, (i * 7) % 32
                img[py, px] = min(int(img[py, px]) + 1, 250)
                ids.append(i)
                hashes.append(ph(dec(enc(img))))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    hashed = docs.select("doc_id").mapInPandas(gen, gen_schema)
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
            F.countDistinct((F.col("doc_id") % 40)).alias("n_bases"),
        )
        .orderBy("canonical_id")
    )


register(
    "mm_phash_groups",
    engine_fn=_mm_phash_fn,
    category="llm-multimodal",
    suite="extension",
    doc=(
        "image near-dedup: encode->decode->64-bit pHash (DCT low-pass) "
        "-> hash-keyed grouping collapses perturbed copies of the same "
        "image with no pairwise comparison; grouping invariants asserted "
        "in tests (rows-only: float DCT has no SQL oracle)"
    ),
)
