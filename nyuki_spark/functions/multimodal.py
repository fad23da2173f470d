"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media exactly as a 100 TB training pipeline should: the
bytes are an opaque ``binary`` column (parquet stores them untouched,
column pruning skips them unless projected), a ``media_meta`` struct
carries the typed facts (kind, dims, sample rate) that filters and joins
can push down, and all byte-touching work runs in Arrow-batched
``mapInPandas`` stages — one Python process per partition, whole batches
across the Arrow boundary, never a row at a time.

Two codec families decode FOR REAL with zero external libraries
(:mod:`nyuki_spark.functions.codecs`): uncompressed BMP (struct header +
raw rows, pure numpy) and PCM WAV (stdlib ``wave``).
:func:`attach_synthetic_media` emits standards-conformant payloads of both
and :func:`decode_media_stats` sniffs magic bytes and decodes them back to
pixel/sample arrays — verified end-to-end against closed-form DuckDB
oracles (``mm_image_stats``/``mm_audio_stats``).

Formats that genuinely require codec libraries (JPEG/MP3/MP4) remain
STUBBED: :func:`decode_media` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic byte-statistics "decode"
(clearly not a real codec; real deployments drop PIL/ffmpeg into the same
UDF body). Everything around the stub — schemas, batch shapes,
partitioning, explode fan-out — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "META_SCHEMA",
    "attach_fake_payload",
    "attach_synthetic_media",
    "decode_media",
    "decode_media_stats",
    "byte_features",
    "resize_media",
    "sample_frames",
]

# The codec helpers live in an un-installed repo module; Spark pickles
# closure globals by reference, so executors launched with a different
# working directory could fail to import them. Registering the module for
# by-value pickling ships the code inside the serialized closure instead.
def _codecs_by_value():
    from nyuki_spark.functions import codecs

    try:  # cloudpickle >= 2.0 (vendored in pyspark)
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(codecs)
    except Exception:
        pass
    return codecs


_codecs = _codecs_by_value()

META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def attach_fake_payload(df: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Test fixture: derive a deterministic binary payload + metadata from a
    text column (no media fixtures exist in the testdata)."""
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            (F.octet_length("payload") % 640).cast("int").alias("width"),
            (F.octet_length("payload") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.octet_length("payload") * 10).cast("int").alias("duration_ms"),
        ),
    )


def attach_synthetic_media(
    df: DataFrame,
    id_col: str = "doc_id",
    kind: str = "image",
) -> DataFrame:
    """Attach a REAL media payload derived deterministically from the id.

    ``kind='image'``: an 8-bit grayscale BMP, ``(16 + id%8) x (8 + id%5)``,
    pixel ``(x, y) = (3x + 7y + 11*id) % 251`` — any external BMP reader
    decodes it. ``kind='png'``: an 8-bit grayscale PNG, ``(12 + id%7) x
    (6 + id%6)``, pixel ``(x, y) = (5x + 3y + 13*id) % 241``, encoded with
    scanline filter ``id % 5`` so the corpus exercises every PNG unfilter
    path (None/Sub/Up/Average/Paeth). ``kind='audio'``: a mono 16 kHz PCM
    WAV of ``400 + (id%5)*80`` samples, ``sample[t] = (t*(1 + id%13)) %
    251 - 125``. The closed-form definitions are what the DuckDB oracles
    recompute, so an engine-side encode->decode round trip is verified
    bit-exactly end to end (integer pixel sums are exact in float64, so
    the means match to the last bit).
    """
    enc_bmp, enc_wav = _codecs.encode_bmp_gray8, _codecs.encode_wav_pcm16
    enc_png = _codecs.encode_png_gray8
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("payload", BinaryType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                if kind == "image":
                    w, h = 16 + i % 8, 8 + i % 5
                    xs = np.arange(w)[None, :]
                    ys = np.arange(h)[:, None]
                    img = (3 * xs + 7 * ys + 11 * i) % 251
                    payloads.append(enc_bmp(img.astype(np.uint8)))
                elif kind == "png":
                    w, h = 12 + i % 7, 6 + i % 6
                    xs = np.arange(w)[None, :]
                    ys = np.arange(h)[:, None]
                    img = (5 * xs + 3 * ys + 13 * i) % 241
                    payloads.append(enc_png(img.astype(np.uint8), filter_type=i % 5))
                else:
                    n = 400 + (i % 5) * 80
                    t = np.arange(n)
                    samples = (t * (1 + i % 13)) % 251 - 125
                    payloads.append(enc_wav(samples.astype(np.int16), 16000))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "payload": payloads})

    return df.select(id_col).mapInPandas(fn, out_schema)


def decode_media_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL decode: sniff magic bytes, parse BMP/WAV, emit decoded stats.

    Output: (id, kind, width, height, sample_rate, n_values, mean_val,
    std_val) where the numeric facts come from the DECODED pixel/sample
    arrays, not the raw bytes — headers, palettes, row padding, and
    bottom-up layout all have to be parsed correctly for the oracle
    comparison to hash-match. Unknown formats raise (the honest gate for
    codec formats lives in :func:`decode_media`).
    """
    dec_bmp, dec_wav, sniff = _codecs.decode_bmp, _codecs.decode_wav, _codecs.sniff_media_kind
    dec_png = _codecs.decode_png
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("kind", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_values", LongType()),
            StructField("mean_val", DoubleType()),
            StructField("std_val", DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in out_schema.fields}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                kind = sniff(b)
                if kind in ("bmp", "png"):
                    img = dec_bmp(b) if kind == "bmp" else dec_png(b)
                    vals = img.astype(np.float64).ravel()
                    h, w = img.shape
                    rate = None
                elif kind == "wav":
                    rate, samples = dec_wav(b)
                    vals = samples.astype(np.float64)
                    w = h = None
                else:
                    raise ValueError(f"undecodable payload for id {i}")
                rows[id_col].append(int(i))
                rows["kind"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sample_rate"].append(rate)
                rows["n_values"].append(int(vals.size))
                rows["mean_val"].append(float(vals.mean()))
                rows["std_val"].append(float(vals.std()))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Decode payloads -> (id, n_bytes, mean_byte, std_byte).

    Real decode requires PIL/soundfile/ffmpeg — absent here, so without
    ``fake=True`` this raises ``NotImplementedError`` at plan-build time
    (fail fast, not per executor task). The ``fake`` path computes byte
    statistics instead: a DETERMINISTIC STAND-IN, not a codec.
    """
    try:  # pragma: no cover — decode libs not in this container
        import PIL.Image  # noqa: F401

        have_codec = True
    except ImportError:
        have_codec = False
    if not have_codec and not fake:
        raise NotImplementedError(
            "no media codec libraries in this environment; pass fake=True "
            "for the deterministic byte-stats stand-in"
        )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("mean_byte", DoubleType()),
            StructField("std_byte", DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": [len(a) for a in arrs],
                    "mean_byte": [float(a.mean()) if len(a) else 0.0 for a in arrs],
                    "std_byte": [float(a.std()) if len(a) else 0.0 for a in arrs],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def byte_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
) -> DataFrame:
    """Fixed-dim feature vector from payload bytes (histogram projection).

    The shape of a real embedding-extraction stage: binary in, float
    vector out, Arrow-batched, schema declared up front so downstream ANN
    (:mod:`nyuki_spark.operators.similarity`) composes directly.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                a = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(a % dim, minlength=dim).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "features": feats})

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each payload into ``n_frames`` chunks -> one row per frame.

    The video-frame-sampling shape: per-input fan-out inside mapInPandas
    (cheaper than explode-after-UDF — the frames never materialize as one
    giant array row).
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                step = max(1, len(b) // n_frames)
                for k in range(n_frames):
                    chunk = b[k * step : (k + 1) * step]
                    if chunk:
                        ids.append(i)
                        nos.append(k)
                        frames.append(chunk)
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Resize stub: real codecs absent, same contract as :func:`decode_media`.

    The ``fake`` path emits a deterministic byte-subsample of the payload
    sized width*height (a stand-in with the right output SHAPE — binary of
    the target size — so downstream stages exercise real volumes). The
    updated ``media_meta`` carries the new dimensions, which is the part
    filters/joins actually consume.
    """
    try:  # pragma: no cover — decode libs not in this container
        import PIL.Image  # noqa: F401
    except ImportError:
        if not fake:
            raise NotImplementedError(
                "no media codec libraries in this environment; pass fake=True"
            )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload", BinaryType()),
            StructField("media_meta", META_SCHEMA),
        ]
    )
    target = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf[payload_col]:
                a = np.frombuffer(bytes(b), dtype=np.uint8)
                idx = (np.arange(target) * max(1, len(a)) // max(1, target)) % max(1, len(a))
                outs.append(a[idx].tobytes() if len(a) else b"")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload": outs,
                    "media_meta": [
                        {"kind": "image", "width": width, "height": height,
                         "sample_rate": None, "duration_ms": None}
                        for _ in outs
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def decode_wav_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 160,
) -> DataFrame:
    """REAL WAV decode -> per-frame energy rows: (id, frame_idx,
    n_samples, sum_sq) for every ``frame``-sample window (160 = 10 ms at
    16 kHz — the standard speech framing; the final partial frame is
    kept with its true length).

    This is the audio FEATURE-EXTRACTION primitive (framing + energy,
    the first stage of VAD / silence trimming / loudness normalization)
    as a map-only Arrow stage: payload bytes never leave the executor,
    output rows are four integers. ``sum_sq`` is an exact int64 (int16
    samples: frame * 32768^2 << 2^63), so the downstream RMS divides
    bit-identical operands on any engine — the oracle recomputes it from
    the closed-form sample definition.
    """
    dec_wav = _codecs.decode_wav
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("sum_sq", LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in out_schema.fields}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                _, samples = dec_wav(bytes(b))
                sq = samples.astype(np.int64) ** 2
                for fi in range(0, len(sq), frame):
                    chunk = sq[fi : fi + frame]
                    rows[id_col].append(int(i))
                    rows["frame_idx"].append(fi // frame)
                    rows["n_samples"].append(int(chunk.size))
                    rows["sum_sq"].append(int(chunk.sum()))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def decode_image_tiles(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    tile: int = 8,
) -> DataFrame:
    """REAL image decode -> per-tile rows: (id, tile_y, tile_x, n_px,
    sum_px) for every ``tile`` x ``tile`` patch (edge tiles keep their
    true size). Patch extraction is the vision-pipeline primitive (ViT
    tokenization, tile-level quality filters, thumbnail grids) as a
    map-only Arrow stage; sum_px is an exact int64 over uint8 pixels, so
    downstream tile means divide bit-identical operands on any engine.
    """
    dec_bmp = _codecs.decode_bmp
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("tile_y", IntegerType()),
            StructField("tile_x", IntegerType()),
            StructField("n_px", LongType()),
            StructField("sum_px", LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in out_schema.fields}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                img = dec_bmp(bytes(b)).astype(np.int64)
                h, w = img.shape
                for ty in range(0, h, tile):
                    for tx in range(0, w, tile):
                        patch = img[ty : ty + tile, tx : tx + tile]
                        rows[id_col].append(int(i))
                        rows["tile_y"].append(ty // tile)
                        rows["tile_x"].append(tx // tile)
                        rows["n_px"].append(int(patch.size))
                        rows["sum_px"].append(int(patch.sum()))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def decode_wav_samples(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL WAV decode -> per-sample rows: (id, i, n_total, s) with the
    sample index, the clip's total sample count, and the exact int16
    sample value. The per-sample layout (vs :func:`decode_wav_frames`'
    pre-aggregated frames) is for spectral operators that weight each
    sample individually (DFT-bin correlation, windowing): the decode
    stays a map-only Arrow stage on the executor, and everything
    downstream is JVM column math over exact integers.
    """
    dec_wav = _codecs.decode_wav
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("i", IntegerType()),
            StructField("n_total", IntegerType()),
            StructField("s", IntegerType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[np.ndarray] = []
            idxs: list[np.ndarray] = []
            ns: list[np.ndarray] = []
            vals: list[np.ndarray] = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                _, samples = dec_wav(bytes(b))
                n = samples.size
                ids.append(np.full(n, int(i), dtype=np.int64))
                idxs.append(np.arange(n, dtype=np.int32))
                ns.append(np.full(n, n, dtype=np.int32))
                vals.append(samples.astype(np.int32))
            if not ids:
                yield pd.DataFrame(
                    {k.name: [] for k in out_schema.fields}
                )
                continue
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids),
                    "i": np.concatenate(idxs),
                    "n_total": np.concatenate(ns),
                    "s": np.concatenate(vals),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def resize_image_nn(
    df: DataFrame,
    factor: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image downsample: decode the BMP payload, nearest-neighbor
    subsample every ``factor``-th pixel (rows and columns, anchored at
    (0,0) — the standard NN grid for an integer factor), re-encode as a
    standards-conformant BMP. The full round trip (decode -> resize ->
    ENCODE -> downstream re-decode) is what a production thumbnail /
    vision-preprocessing stage does; the closed-form pixel definition
    survives it (resized pixel (x,y) = original (factor*x, factor*y)),
    which is what the DuckDB twin recomputes. Map-only mapInPandas —
    payload bytes never cross the driver."""
    dec_bmp, enc_bmp = _codecs.decode_bmp, _codecs.encode_bmp_gray8
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("payload", BinaryType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf[payload_col]:
                img = dec_bmp(bytes(b))
                outs.append(enc_bmp(img[::factor, ::factor]))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "payload": outs}
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def downsample_audio(
    df: DataFrame,
    factor: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL audio decimation: decode the WAV payload, keep every
    ``factor``-th sample (anchor 0 — plain decimation without an AA
    filter, the cheapest resample tier), re-encode at sample_rate /
    factor. Same round-trip contract as :func:`resize_image_nn`: the
    closed-form sample definition survives (resampled s[t] = original
    s[factor*t]), which the DuckDB twin recomputes. Map-only."""
    dec_wav, enc_wav = _codecs.decode_wav, _codecs.encode_wav_pcm16
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("payload", BinaryType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf[payload_col]:
                rate, samples = dec_wav(bytes(b))
                outs.append(enc_wav(samples[::factor], rate // factor))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "payload": outs}
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)
