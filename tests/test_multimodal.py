"""Multimodal plumbing tests: binary round-trip, batch shapes, fan-out.

The codec itself is stubbed (no media libs in the container) — these
verify everything around it: parquet round-trips binary+struct unchanged,
the Arrow-batched stages produce the declared schemas, the stub refuses
to pretend it decoded anything, and frame fan-out is complete.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.functions.multimodal import (
    attach_fake_payload,
    byte_features,
    decode_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    return attach_fake_payload(docs)


def test_binary_parquet_roundtrip(spark, media, tmp_path):
    path = str(tmp_path / "media")
    media.write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["payload"] == "binary"
    orig = {r.doc_id: r for r in media.collect()}
    for r in back.collect():
        assert bytes(r.payload) == bytes(orig[r.doc_id].payload)
        assert r.media_meta.kind == "image"
        assert r.media_meta.duration_ms == len(bytes(r.payload)) * 10


def test_decode_stub_refuses_without_fake(media):
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_fake_decode_deterministic(media):
    a = {r.doc_id: r for r in decode_media(media, fake=True).collect()}
    b = {r.doc_id: r for r in decode_media(media, fake=True).collect()}
    assert a.keys() == b.keys() and len(a) == 50
    for k in a:
        assert a[k].n_bytes == b[k].n_bytes and a[k].mean_byte == b[k].mean_byte
        assert 0 < a[k].mean_byte < 255


def test_byte_features_shape(media):
    rows = byte_features(media, dim=16).collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9


def test_sample_frames_fanout(media):
    frames = sample_frames(media, n_frames=4)
    per_doc = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(per_doc) == 50
    assert all(r.n == 4 for r in per_doc)
    # Frames concatenate back into a prefix of the original payload.
    one = frames.where(F.col("doc_id") == per_doc[0].doc_id).orderBy("frame_no").collect()
    assert all(len(bytes(f.frame)) > 0 for f in one)


def test_resize_stub_shape_and_meta(media):
    from nyuki_spark.functions.multimodal import resize_media

    out = resize_media(media, width=8, height=4, fake=True).collect()
    assert len(out) == 50
    for r in out:
        assert len(bytes(r.payload)) == 32
        assert r.media_meta.width == 8 and r.media_meta.height == 4


def test_png_codec_all_filters_roundtrip():
    """Pure codec check: every PNG scanline filter (0-4) must round-trip
    bit-exactly, including edge shapes (1x1, single row/column)."""
    import numpy as np

    from nyuki_spark.functions.codecs import (
        decode_png,
        encode_png_gray8,
        sniff_media_kind,
    )

    rng = np.random.default_rng(11)
    for ft in range(5):
        for shape in [(1, 1), (1, 9), (9, 1), (7, 13), (32, 17)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            enc = encode_png_gray8(img, filter_type=ft)
            assert sniff_media_kind(enc) == "png"
            assert (decode_png(enc) == img).all(), (ft, shape)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")
    with pytest.raises(ValueError):
        encode_png_gray8(rng.integers(0, 256, (4, 4), dtype=np.uint8), filter_type=7)


def test_phash_groups_collapse_noisy_copies(spark, sf_dir):
    """mm_phash_groups invariants the rows-only tier can't check via
    oracle: (precision) no group mixes two base images; (recall) the
    per-copy single-pixel noise never splits a base into more than a
    couple of hash groups."""
    from nyuki_spark.queries.registry import REGISTRY

    out = REGISTRY["mm_phash_groups"].engine_fn(spark, sf_dir).collect()
    assert all(r.n_bases == 1 for r in out), "pHash merged distinct images"
    # The sub-sample noise design makes the collapse EXACT (the 32x32
    # thumbnail provably never reads the perturbed odd coordinates), so
    # the group count equals the number of distinct bases present — the
    # same invariant the closed-form oracle hash-checks at sf0.01.
    n_docs = sum(r.n_copies for r in out)
    n_bases = min(40, n_docs)
    assert len(out) == n_bases, (
        f"{len(out)} hash groups for {n_bases} base images — "
        "noise split or merged near-duplicate groups"
    )
