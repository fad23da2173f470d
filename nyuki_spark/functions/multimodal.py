"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media exactly as a 100 TB training pipeline should: the
bytes are an opaque ``binary`` column (parquet stores them untouched,
column pruning skips them unless projected), a ``media_meta`` struct
carries the typed facts (kind, dims, sample rate) that filters and joins
can push down, and all byte-touching work runs in Arrow-batched
``mapInPandas`` stages — one Python process per partition, whole batches
across the Arrow boundary, never a row at a time.

The actual codec step is STUBBED: this container has no image/audio
libraries, so :func:`decode_media` raises ``NotImplementedError`` unless
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
    "decode_media",
    "byte_features",
    "resize_media",
    "sample_frames",
]

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
