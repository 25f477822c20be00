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


def test_unsupported_container_raises(spark):
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n....")


def _tiny_bmp(w: int = 2, h: int = 2) -> bytes:
    """A real, viewer-openable 24bpp BMP built byte-by-byte."""
    import struct

    row = bytearray()
    for x in range(w):
        row += bytes((x * 40 % 256, 80, 160))  # BGR
    row += b"\x00" * ((4 - len(row) % 4) % 4)  # 4-byte row padding
    pixels = bytes(row) * h
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    off = 14 + 40
    filehdr = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    return filehdr + dib + pixels


def _tiny_wav(sr: int = 8000, ms: int = 250) -> bytes:
    """A real, player-openable 16-bit mono PCM WAV of silence."""
    import struct

    n_samples = sr * ms // 1000
    data = b"\x00\x00" * n_samples
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_bmp_and_wav_decode_through_map_in_pandas(spark):
    """Real (generated, no libraries) BMP and WAV bytes flow through the
    same mapInPandas decode path as the synthetic codec."""
    from page_rank_mapreduce_java_spark.multimodal.media import MEDIA_SCHEMA

    rows = [
        (1, "image", bytearray(_tiny_bmp(3, 2)), (3, 2, None, None)),
        (2, "audio", bytearray(_tiny_wav(8000, 250)), (None, None, 8000, None)),
    ]
    df = spark.createDataFrame(
        [(mid, kind, payload, None) for mid, kind, payload, _ in rows], MEDIA_SCHEMA
    )
    got = {r.media_id: r for r in decode_media(df).collect()}
    assert (got[1].width, got[1].height) == (3, 2)
    assert got[1].sample_rate is None
    assert got[2].sample_rate == 8000
    assert got[2].duration_ms == 250
    assert got[2].width is None


def test_bmp_top_down_and_core_header_variants(spark):
    import struct

    top_down = bytearray(_tiny_bmp(4, 3))
    struct.pack_into("<i", top_down, 22, -3)  # negative height = top-down
    w, h, _, _ = _decode_payload(bytes(top_down))
    assert (w, h) == (4, 3)


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


def test_real_bmp_resize_nearest_neighbor(spark):
    """A real 24bpp BMP resizes through mapInPandas: output is a valid
    BMP with the target dims and nearest-neighbor-selected pixels."""
    from page_rank_mapreduce_java_spark.multimodal.media import (
        _bmp_pixels,
        resize_images,
    )

    src = _tiny_bmp(4, 2)  # columns have BGR (x*40%256, 80, 160)
    df = spark.createDataFrame(
        [(1, "image", bytearray(src), (4, 2, None, None))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long>",
    )
    row = resize_images(df, 2, 1).collect()[0]
    assert (row.width, row.height) == (2, 1)
    out = bytes(row.payload)
    assert out[:2] == b"BM"
    px = _bmp_pixels(out)
    assert px.shape == (1, 2, 3)
    # nearest-neighbor x-indices for 4→2: cols 0 and 2 → B = 0, 80
    assert [int(p[0]) for p in px[0]] == [0, 80]
    assert all(int(p[1]) == 80 and int(p[2]) == 160 for p in px[0])


def test_audio_window_features_exact(spark):
    """Known PCM16 samples → exact per-window RMS/peak/zero-crossings."""
    import struct as st

    from page_rank_mapreduce_java_spark.multimodal.media import audio_window_features

    sr = 1000  # 100 ms windows → 100 samples per window
    first = [1000] * 100          # constant: rms=1000, peak=1000, zc=0
    second = [2000, -2000] * 50   # alternating: rms=2000, zc=99
    samples = first + second
    data = b"".join(st.pack("<h", s) for s in samples)
    fmt = st.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(data)) + data
    wav = b"RIFF" + st.pack("<I", len(body)) + body

    df = spark.createDataFrame(
        [(7, "audio", bytearray(wav), (None, None, sr, 200)),
         (8, "audio", bytearray(b"SYNM" + b"\x00" * 40), (None, None, 8000, 100))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long>",
    )
    rows = {r.window_idx: r for r in audio_window_features(df, 100).collect()}
    assert set(rows) == {0, 1}  # SYNM row contributes no windows
    assert (rows[0].rms, rows[0].peak, rows[0].zero_crossings) == (1000, 1000, 0)
    assert (rows[1].rms, rows[1].peak, rows[1].zero_crossings) == (2000, 2000, 99)
    assert rows[0].n_samples == rows[1].n_samples == 100


def test_audio_window_features_zero_sample_riff(spark):
    """A RIFF payload with an empty data chunk emits NO windows (ADVICE
    r7: the vectorized leg indexed starts[-1]/n_samp[-1] on empty
    arrays — IndexError — where the old per-row loop emitted nothing)."""
    import struct as st

    from page_rank_mapreduce_java_spark.multimodal.media import (
        audio_window_features,
    )

    sr = 1000
    fmt = st.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", 0)
    wav = b"RIFF" + st.pack("<I", len(body)) + body
    df = spark.createDataFrame(
        [(9, "audio", bytearray(wav), (None, None, sr, 0))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long>",
    )
    assert audio_window_features(df, 100).count() == 0
