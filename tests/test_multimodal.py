"""Multimodal binary-column plumbing: schema, Arrow batches, stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.multimodal.media import (
    decode_media,
    extract_features,
    frame_sample,
    synthesize_media,
    _decode_payload,
)


def test_synthesize_and_decode_roundtrip(spark):
    media = synthesize_media(spark, n=32)
    decoded = decode_media(media).orderBy("media_id").collect()
    assert len(decoded) == 32
    r0 = decoded[0]
    assert r0.width == 16 and r0.kind == "image"
    assert r0.payload_bytes == 4 + 20 + 32
    assert len(r0.digest) == 64
    # decode is deterministic across runs
    again = decode_media(synthesize_media(spark, n=32)).orderBy("media_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in decoded]


def test_real_media_bytes_hit_stub(spark):
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n....")


def test_extract_features_shape(spark):
    feats = extract_features(synthesize_media(spark, n=8), dim=16).collect()
    assert len(feats) == 8
    assert all(len(r.feature) == 16 for r in feats)
    assert all(-1.0 <= v <= 1.0 for r in feats for v in r.feature)


def test_resize_images_only_touches_images(spark):
    from page_rank_mapreduce_java_spark.multimodal.media import resize_images

    media = synthesize_media(spark, n=16)
    resized = {r.media_id: r for r in resize_images(media, 8, 8).collect()}
    orig = {r.media_id: r for r in decode_media(media).collect()}
    for mid, r in resized.items():
        if r.kind == "image":
            assert (r.width, r.height) == (8, 8)
        else:
            assert (r.width, r.height) == (orig[mid].width, orig[mid].height)
    # resized payloads re-decode cleanly with the new header
    rr = decode_media(resize_images(media, 8, 8)).collect()
    assert all(r.width == 8 for r in rr if r.kind == "image")


def test_frame_sample_counts(spark):
    media = synthesize_media(spark, n=10)
    frames = frame_sample(media, every_ms=100)
    counts = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    durs = {r.media_id: r.meta.duration_ms for r in media.select("media_id", "meta").collect()}
    for mid, n in counts.items():
        assert n == durs[mid] // 100 + 1
