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
    which each ``doc_id`` renders base pattern ``doc_id % 40`` at 64x64
    plus dense per-copy noise, decode, pHash, and group. Exact hash
    equality clusters the near-duplicate copies — image dedup without any
    pairwise comparison (for a Hamming-distance bound, band the 64 bits
    into four 16-bit keys exactly like the SimHash funnel).

    The noise design makes the collapse EXACT (and thus oracle-checkable)
    instead of merely likely: each copy perturbs only odd-coordinate
    pixels of the 2x-oversampled render, i.e. detail strictly below the
    Nyquist rate of pHash's 32x32 nearest-neighbor thumbnail. The hash
    provably never sees it — the real-world robustness claim of
    perceptual hashing (thumbnails discard sub-sample detail), made
    bit-exact. The earlier single-pixel +1 nudge at sampled coordinates
    occasionally flipped a DCT bit whose coefficient sat near the median
    (42 groups for 40 bases at sf0.01), which forced a rows-only tier.

    The oracle is the closed-form payload rollup: copies of base b are
    exactly the doc_ids with ``doc_id % 40 == b``, so a GROUP BY on the
    base reproduces the engine's hash-keyed groups IF AND ONLY IF the
    whole encode->decode->DCT->hash pipeline neither splits a base
    (row-count mismatch) nor merges two bases (n_bases > 1 mismatch).

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

        xs = np.arange(64)[None, :]
        ys = np.arange(64)[:, None]
        # Odd-coordinate mask: pixels the 32x32 nearest-neighbor resample
        # (arange(32)*64//32 -> even indices) never reads.
        sub = ((xs % 2) + (ys % 2)) > 0
        for pdf in batches:
            ids, hashes = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                base = 2 + (3 * (xs // 2) + 7 * (ys // 2) + 11 * (i % 40)) % 251
                noise = ((i * (xs + 3 * ys)) % 5) - 2
                img = (base + np.where(sub, noise, 0)).astype(np.uint8)
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
        .select("n_copies", "canonical_id", "n_bases")
        .orderBy("canonical_id")
    )


register(
    "mm_phash_groups",
    engine_fn=_mm_phash_fn,
    oracle=(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_copies,\n"
        "  MIN(doc_id) AS canonical_id,\n"
        "  CAST(1 AS BIGINT) AS n_bases\n"
        "FROM documents WHERE doc_id < 400\n"
        "GROUP BY doc_id % 40 ORDER BY canonical_id"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "image near-dedup: encode->decode->64-bit pHash (DCT low-pass) "
        "-> hash-keyed grouping collapses noisy copies of the same image "
        "with no pairwise comparison; the noise is sub-sample detail the "
        "32x32 thumbnail provably discards, so the grouping is exact and "
        "the closed-form payload rollup is a full value oracle"
    ),
)


def _mm_wav_rms_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame RMS energy from REAL decoded WAV bytes: encode
    standards-conformant PCM, decode it back, frame at 160 samples
    (10 ms @ 16 kHz), emit exact integer (n, sum of squares) per frame
    and derive RMS engine-side — the framing/energy primitive every
    audio pipeline (VAD, silence trim, loudness norm) starts with. The
    oracle recomputes the frames from the closed-form sample definition,
    so a header bug, an off-by-one in framing, or a dropped final
    partial frame hash-fails."""
    from nyuki_spark.functions.multimodal import (
        attach_synthetic_media,
        decode_wav_frames,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    frames = decode_wav_frames(attach_synthetic_media(docs, kind="audio"))
    return frames.select(
        "doc_id",
        "frame_idx",
        "n_samples",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples").cast("double")), 6
        )
        .cast("double")
        .alias("rms"),
    ).orderBy("doc_id", "frame_idx")


register(
    "mm_wav_rms_frames",
    engine_fn=_mm_wav_rms_fn,
    oracle=(
        "SELECT d.doc_id, CAST(t.i // 160 AS INT) AS frame_idx,\n"
        "  CAST(COUNT(*) AS BIGINT) AS n_samples,\n"
        "  CAST(ROUND(SQRT(SUM(CAST(s AS BIGINT) * s)\n"
        "    / CAST(COUNT(*) AS DOUBLE)), 6) AS DOUBLE) AS rms\n"
        "FROM documents d\n"
        "JOIN range(880) t(i) ON t.i < 400 + (d.doc_id % 5)*80,\n"
        "LATERAL (SELECT (t.i*(1 + d.doc_id % 13)) % 251 - 125 AS s)\n"
        "WHERE d.doc_id < 48\n"
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL WAV decode -> 10 ms frame RMS energy (the audio feature-"
        "extraction primitive): map-only Arrow decode emitting exact "
        "integer (n, sum-of-squares) per frame, RMS from bit-identical "
        "operands; oracle recomputes from the closed-form samples"
    ),
)


def _mm_tiles_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction from REAL decoded BMP bytes: encode,
    decode, split into 8x8 tiles (edge tiles keep true size), emit exact
    integer (n, sum) per tile and derive the tile mean engine-side. The
    oracle recomputes every tile from the closed-form pixel definition —
    a padding/bottom-up/palette bug shifts pixels between tiles and
    hash-fails even when whole-image stats would still match."""
    from nyuki_spark.functions.multimodal import (
        attach_synthetic_media,
        decode_image_tiles,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    tiles = decode_image_tiles(attach_synthetic_media(docs, kind="image"))
    return tiles.select(
        "doc_id",
        "tile_y",
        "tile_x",
        "n_px",
        F.round(F.col("sum_px") / F.col("n_px").cast("double"), 6)
        .cast("double")
        .alias("mean_px"),
    ).orderBy("doc_id", "tile_y", "tile_x")


register(
    "mm_image_tiles",
    engine_fn=_mm_tiles_fn,
    oracle=(
        "SELECT d.doc_id, CAST(y.j // 8 AS INT) AS tile_y,\n"
        "  CAST(x.i // 8 AS INT) AS tile_x,\n"
        "  CAST(COUNT(*) AS BIGINT) AS n_px,\n"
        "  CAST(ROUND(SUM((3*x.i + 7*y.j + 11*d.doc_id) % 251)\n"
        "    / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS mean_px\n"
        "FROM documents d\n"
        "JOIN range(24) x(i) ON x.i < 16 + d.doc_id % 8\n"
        "JOIN range(13) y(j) ON y.j < 8 + d.doc_id % 5\n"
        "WHERE d.doc_id < 48\n"
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL BMP decode -> 8x8 patch extraction (ViT tokenization "
        "shape): map-only Arrow decode emitting exact integer (n, sum) "
        "per tile; tile-position-sensitive oracle catches pixel-layout "
        "bugs whole-image stats would miss"
    ),
)


def _mm_keyframes_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection from a REAL multi-frame video container
    (round 7): per doc the engine encodes 12 BMP frames of a synthetic
    scene — pixel(f, i, j) = (3i + 7j + 11*doc_id + 40*(f//4) + f%4)
    % 251, i.e. three 4-frame scenes with +1/frame drift inside a scene
    and a +40 brightness cut between scenes — CONCATENATES them into one
    binary blob, then a second map-only Arrow stage DEMUXES the blob by
    walking the BMP file-header size fields, decodes every frame, and
    computes the mean absolute pixel difference vs the previous frame.
    Keyframes are frame 0 plus every frame whose diff exceeds 10 (scene
    cuts land ~37, in-scene drift ~1 — wide margins on both sides). The
    oracle recomputes every per-pixel diff from the closed form, so a
    demux off-by-one, a header-size misread, or a frame-order bug
    hash-fails. Per-frame mad = integer-sum / 128 (a power of two), so
    the double is EXACT and carried unrounded — numpy's pairwise mean and
    SQL AVG agree bit-for-bit (a 6-dp round actually split the engines on
    the half boundary x.xxx3125 during bring-up).
    """
    import struct

    import numpy as np
    import pandas as pd

    from nyuki_spark.functions.codecs import decode_bmp, encode_bmp_gray8

    W, H, N_FRAMES = 16, 8, 12
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)

    def _encode(batches):
        jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        base = 3 * ii + 7 * jj
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                frames = [
                    encode_bmp_gray8(
                        ((base + 11 * int(d) + 40 * (f // 4) + f % 4) % 251).astype(
                            np.uint8
                        )
                    )
                    for f in range(N_FRAMES)
                ]
                rows.append((int(d), b"".join(frames)))
            yield pd.DataFrame(rows, columns=["doc_id", "video"])

    def _keyframes(batches):
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["video"]):
                # Demux: each BMP's total byte length sits in its file
                # header (offset 2, little-endian u32) — walk the blob.
                frames, off = [], 0
                while off < len(blob):
                    (size,) = struct.unpack_from("<I", blob, off + 2)
                    frames.append(decode_bmp(bytes(blob[off: off + size])))
                    off += size
                prev = None
                for f, img in enumerate(frames):
                    cur = img.astype(np.int64)
                    if prev is None:
                        out.append((int(d), f, None, True))
                    else:
                        # mad = integer-sum / 128 (2^7): EXACT in
                        # float64, so no rounding — a 6-dp round hit the
                        # .5 boundary (x.xxx3125) and split the engines'
                        # half-even vs half-away rules.
                        mad = float(np.abs(cur - prev).mean())
                        out.append((int(d), f, mad, mad > 10))
                    prev = cur
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_no", "mad", "is_keyframe"]
            )

    videos = docs.select("doc_id").mapInPandas(_encode, "doc_id long, video binary")
    return (
        videos.mapInPandas(
            _keyframes,
            "doc_id long, frame_no int, mad double, is_keyframe boolean",
        )
        .orderBy("doc_id", "frame_no")
    )


register(
    "mm_video_keyframes",
    engine_fn=_mm_keyframes_fn,
    oracle=(
        "WITH p AS (\n"
        "  SELECT d.doc_id, f.f, x.i, y.j,\n"
        "    (3*x.i + 7*y.j + 11*d.doc_id + 40*(f.f // 4) + f.f % 4) % 251"
        " AS px\n"
        "  FROM documents d, range(12) f(f), range(16) x(i), range(8) y(j)\n"
        "  WHERE d.doc_id < 48),\n"
        "m AS (SELECT a.doc_id, a.f AS frame_no,\n"
        "    AVG(ABS(a.px - b.px)) AS mad\n"
        "  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.i = b.i"
        " AND a.j = b.j AND b.f = a.f - 1\n"
        "  GROUP BY 1, 2)\n"
        "SELECT doc_id, CAST(frame_no AS INT) AS frame_no,\n"
        "  CAST(mad AS DOUBLE) AS mad, mad > 10 AS is_keyframe FROM m\n"
        "UNION ALL\n"
        "SELECT doc_id, 0, CAST(NULL AS DOUBLE), true FROM documents"
        " WHERE doc_id < 48\n"
        "ORDER BY doc_id, frame_no"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL video-container round trip: 12 concatenated BMP frames per "
        "doc, demuxed by walking file-header size fields, decoded, and "
        "keyframed by mean-abs-diff scene-cut detection (frame 0 + "
        "diff>10) — map-only Arrow stages, per-pixel-verified oracle"
    ),
)


# -- spectral audio features: DFT-bin power (round 9) ---------------------------


def _mm_goertzel_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT-bin power (the Goertzel single-bin analysis shape) at four
    whole-clip frequencies from REAL decoded WAV bytes — the tone/pitch
    feature a speech pipeline extracts per utterance (DTMF detection,
    hum removal QA, bandwidth classification) without paying a full FFT.

    Determinism at the fp level is engineered the repo's standard way:
    the trig weights are QUANTIZED to integers (round(cos * 1e6) as
    BIGINT — the fixed-point twiddle-factor table every embedded
    Goertzel uses), so the bin correlations re = sum(s*c), im = sum(s*sn)
    are EXACT int64 sums (order-independent, safe under any partitioning:
    |s| <= 125, |c| <= 1e6, n <= 880 -> |re| <= 1.1e11 << 2^63). Power
    then derives from those bit-identical integers with one pinned
    round. Decode is a map-only Arrow stage; the weights and aggregation
    are pure JVM column math — 4x row explode, one partial-agg shuffle.
    """
    import math

    from nyuki_spark.functions.multimodal import (
        attach_synthetic_media,
        decode_wav_samples,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    smp = decode_wav_samples(attach_synthetic_media(docs, kind="audio"))
    e = smp.select(
        "doc_id",
        "i",
        "n_total",
        "s",
        F.explode(
            F.array(F.lit(1), F.lit(3), F.lit(9), F.lit(27))
        ).alias("k"),
    )
    ang = (
        F.lit(2.0)
        * F.lit(math.pi)
        * F.col("k")
        * F.col("i")
        / F.col("n_total").cast("double")
    )
    c = F.round(F.cos(ang) * F.lit(1000000.0), 0).cast("long")
    sn = F.round(F.sin(ang) * F.lit(1000000.0), 0).cast("long")
    g = e.groupBy("doc_id", "k").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.col("s") * c).alias("re_q"),
        F.sum(F.col("s") * sn).alias("im_q"),
    )
    re_d = F.col("re_q") / F.lit(1000000.0)
    im_d = F.col("im_q") / F.lit(1000000.0)
    return g.select(
        "doc_id",
        F.col("k").cast("int").alias("k"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("re_q").cast("long").alias("re_q"),
        F.col("im_q").cast("long").alias("im_q"),
        F.round(
            (re_d * re_d + im_d * im_d)
            / (F.col("n_samples") * F.col("n_samples")).cast("double"),
            6,
        )
        .cast("double")
        .alias("power"),
    ).orderBy("doc_id", "k")


register(
    "mm_audio_goertzel",
    engine_fn=_mm_goertzel_fn,
    oracle=(
        "WITH smp AS (\n"
        "  SELECT d.doc_id, t.i,\n"
        "    400 + (d.doc_id % 5)*80 AS n,\n"
        "    (t.i*(1 + d.doc_id % 13)) % 251 - 125 AS s\n"
        "  FROM documents d\n"
        "  JOIN range(880) t(i) ON t.i < 400 + (d.doc_id % 5)*80\n"
        "  WHERE d.doc_id < 48),\n"
        "e AS (SELECT doc_id, i, n, s, k.k FROM smp\n"
        "  CROSS JOIN (VALUES (1), (3), (9), (27)) k(k)),\n"
        "q AS (SELECT doc_id, k, COUNT(*) AS ns,\n"
        "    SUM(s * CAST(ROUND(COS(2.0 * PI() * k * i\n"
        "      / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)) AS re_q,\n"
        "    SUM(s * CAST(ROUND(SIN(2.0 * PI() * k * i\n"
        "      / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)) AS im_q\n"
        "  FROM e GROUP BY 1, 2)\n"
        "SELECT doc_id, CAST(k AS INT) AS k,\n"
        "  CAST(ns AS BIGINT) AS n_samples,\n"
        "  CAST(re_q AS BIGINT) AS re_q, CAST(im_q AS BIGINT) AS im_q,\n"
        "  CAST(ROUND(((re_q / 1000000.0) * (re_q / 1000000.0)\n"
        "    + (im_q / 1000000.0) * (im_q / 1000000.0))\n"
        "    / CAST(ns * ns AS DOUBLE), 6) AS DOUBLE) AS power\n"
        "FROM q ORDER BY doc_id, k"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL WAV decode -> fixed-point Goertzel DFT-bin power at 4 "
        "whole-clip frequencies: integer-quantized twiddle factors make "
        "the bin correlations exact int64 sums, power derives from "
        "bit-identical operands; oracle recomputes from closed-form "
        "samples"
    ),
)


def _mm_resize_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail pipeline: encode real BMPs, decode -> nearest-neighbor
    2x downsample -> RE-ENCODE (functions/multimodal.py:resize_image_nn),
    then decode the RESIZED payloads and stat their pixels. The oracle
    recomputes the mean from the closed-form definition of the sampled
    grid (resized (x,y) = original (2x, 2y)), so a wrong anchor, a
    transposed subsample, or a resize-side encode bug all hash-fail."""
    from nyuki_spark.functions.multimodal import resize_image_nn

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    media = attach_synthetic_media(docs, kind="image")
    resized = resize_image_nn(media, factor=2)
    return decode_media_stats(resized).select(
        "doc_id",
        "kind",
        "width",
        "height",
        "n_values",
        F.round("mean_val", 6).alias("mean_px"),
    ).orderBy("doc_id")


register(
    "mm_image_resize",
    engine_fn=_mm_resize_fn,
    oracle=(
        "SELECT d.doc_id, 'bmp' AS kind,\n"
        "  CAST(CEIL((16 + d.doc_id % 8) / 2.0) AS INT) AS width,\n"
        "  CAST(CEIL((8 + d.doc_id % 5) / 2.0) AS INT) AS height,\n"
        "  COUNT(*) AS n_values,\n"
        "  CAST(ROUND(AVG((6*x.i + 14*y.j + 11*d.doc_id) % 251), 6)"
        " AS DOUBLE) AS mean_px\n"
        "FROM documents d\n"
        "JOIN range(12) x(i) ON x.i < CEIL((16 + d.doc_id % 8) / 2.0)\n"
        "JOIN range(7) y(j) ON y.j < CEIL((8 + d.doc_id % 5) / 2.0)\n"
        "WHERE d.doc_id < 48\n"
        "GROUP BY d.doc_id ORDER BY d.doc_id"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL image resize round trip: decode BMP -> nearest-neighbor "
        "2x downsample -> re-encode -> re-decode -> pixel stats; oracle "
        "recomputes from the sampled-grid closed form — map-only "
        "mapInPandas stages"
    ),
)


def _mm_downsample_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio preprocessing pipeline: encode real 16 kHz WAVs, decode ->
    2x decimate -> RE-ENCODE at 8 kHz (functions/multimodal.py:
    downsample_audio), then decode the resampled payloads and stat the
    samples. Oracle recomputes from the closed form of the decimated
    grid (s[t] = (2t * (1 + id % 13)) % 251 - 125); a wrong anchor,
    off-by-one sample count, or rate mishandling hash-fails."""
    from nyuki_spark.functions.multimodal import downsample_audio

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    media = attach_synthetic_media(docs, kind="audio")
    resampled = downsample_audio(media, factor=2)
    return decode_media_stats(resampled).select(
        "doc_id",
        "kind",
        "sample_rate",
        F.col("n_values").alias("n_samples"),
        F.round("mean_val", 6).alias("mean_sample"),
    ).orderBy("doc_id")


register(
    "mm_audio_downsample",
    engine_fn=_mm_downsample_fn,
    oracle=(
        "SELECT d.doc_id, 'wav' AS kind, CAST(8000 AS INT) AS sample_rate,\n"
        "  COUNT(*) AS n_samples,\n"
        "  CAST(ROUND(AVG((2 * t.i * (1 + d.doc_id % 13)) % 251 - 125),"
        " 6) AS DOUBLE) AS mean_sample\n"
        "FROM documents d\n"
        "JOIN range(440) t(i) ON t.i < (400 + (d.doc_id % 5) * 80) / 2\n"
        "WHERE d.doc_id < 48\n"
        "GROUP BY d.doc_id ORDER BY d.doc_id"
    ),
    category="llm-multimodal",
    suite="extension",
    doc=(
        "REAL audio downsample round trip: decode WAV -> 2x decimation "
        "-> re-encode at half rate -> re-decode -> sample stats; oracle "
        "recomputes from the decimated closed form — map-only "
        "mapInPandas stages"
    ),
)
