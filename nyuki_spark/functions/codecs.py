"""Pure-Python media codecs: real encode/decode with zero external libs.

The sandbox has no PIL/ffmpeg/soundfile, but two production formats need
none of them: uncompressed BMP is a struct header + raw pixel rows, and
PCM WAV is stdlib ``wave``. Implementing them for real upgrades the
multimodal story from "byte plumbing around a stub" to an actual
decode path: bytes that any external image viewer would accept go in,
pixel/sample arrays come out, and the pipeline stats computed from them
are verified against a closed-form DuckDB oracle
(``mm_image_stats``/``mm_audio_stats`` in queries/multimodal.py).

Codec formats that genuinely require external libraries (JPEG/PNG/MP3/MP4)
remain behind the honest ``NotImplementedError`` gate in
:func:`nyuki_spark.functions.multimodal.decode_media`.

These functions run inside Arrow-batched ``mapInPandas`` workers — plain
bytes/ndarray in and out, no Spark imports, so they pickle by value and
never require ``nyuki_spark`` on the executor's import path.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

__all__ = [
    "encode_bmp_gray8",
    "decode_bmp",
    "encode_wav_pcm16",
    "decode_wav",
    "sniff_media_kind",
]

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, filesize, res, res, pixel offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp_gray8(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as a standards-conformant 8-bit BMP.

    8 bpp with a 256-entry grayscale palette, rows bottom-up and padded to
    4-byte boundaries — the layout every BMP reader accepts.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"expected 2-D grayscale array, got shape {img.shape}")
    h, w = img.shape
    row_size = (w + 3) & ~3  # pad each row to a multiple of 4 bytes
    palette = bytearray()
    for i in range(256):
        palette += bytes((i, i, i, 0))  # B, G, R, reserved
    pixel_offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size + len(palette)
    image_size = row_size * h
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w] = img[::-1]  # bottom-up storage
    header = _BMP_FILE_HEADER.pack(b"BM", pixel_offset + image_size, 0, 0, pixel_offset)
    info = _BMP_INFO_HEADER.pack(40, w, h, 1, 8, 0, image_size, 2835, 2835, 256, 0)
    return header + info + bytes(palette) + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP to a 2-D uint8 grayscale array.

    Supports 8 bpp palette (returned via palette lookup, so non-gray
    palettes decode correctly) and 24 bpp BGR (returned as the integer
    mean of the three channels). Top-down files (negative height) are
    handled. Compressed BMPs raise ``ValueError``.
    """
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, pixel_offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    (
        hdr_size, w, h, _planes, bpp, compression, _img_size,
        _xres, _yres, n_colors, _important,
    ) = _BMP_INFO_HEADER.unpack_from(data, _BMP_FILE_HEADER.size)
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    top_down = h < 0
    h = abs(h)
    if bpp == 8:
        n_colors = n_colors or 256
        pal_off = _BMP_FILE_HEADER.size + hdr_size
        pal = np.frombuffer(data, dtype=np.uint8, count=n_colors * 4, offset=pal_off)
        pal = pal.reshape(-1, 4)[:, :3]  # B, G, R
        gray_lut = pal.mean(axis=1).round().astype(np.uint8)
        row_size = (w + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=pixel_offset)
        idx = rows.reshape(h, row_size)[:, :w]
        img = gray_lut[idx]
    elif bpp == 24:
        row_size = (w * 3 + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=pixel_offset)
        bgr = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
        img = bgr.mean(axis=2).round().astype(np.uint8)
    else:
        raise ValueError(f"{bpp} bpp BMP not supported (8/24 only)")
    return img if top_down else img[::-1]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D int16 array as a mono PCM WAV (stdlib ``wave``)."""
    samples = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV to ``(sample_rate, samples)``.

    Mono int16 comes back as-is; multi-channel is averaged to mono; 8-bit
    unsigned PCM is centred to signed. Compressed WAV raises ``wave.Error``.
    """
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise ValueError(f"{width*8}-bit WAV not supported (8/16 only)")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1).round().astype(np.int32)
    return rate, samples


def sniff_media_kind(data: bytes) -> str:
    """Classify a payload by magic bytes: 'bmp', 'wav', or 'unknown'."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"
