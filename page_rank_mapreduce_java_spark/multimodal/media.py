"""Multimodal column plumbing (SURVEY.md §7 M5 / north-star).

Media (image/audio/video) is modeled as an opaque ``binary`` payload column
plus a typed metadata struct — the Spark-side schema, partitioning, Arrow
batch shapes, and UDF signatures are real and tested. The actual
pixel/sample decoding is STUBBED (image/audio libraries are not in this
container): a deterministic synthetic codec stands in, and feeding real
media bytes raises NotImplementedError at the marked point. Swapping in
PIL/ffmpeg later changes only the inside of ``_decode_payload``.

Everything runs through ``mapInPandas`` (Arrow-batched, partition-parallel,
no driver involvement) — the correct shape for 100 TB of blobs: one task
per input split, constant memory per batch, no per-row Python overhead.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # 'image' | 'audio'
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_MAGIC = b"SYNM"  # synthetic-media header


def synthesize_media(spark: SparkSession, n: int = 64, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table: payload = MAGIC + packed dims +
    sha-derived bytes. Generated distributed via spark.range (no driver
    materialization) so it scales like a real scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = "image" if mid % 2 == 0 else "audio"
                w, h = 16 + mid % 32, 16 + (mid * 7) % 32
                sr, dur = 8000 + (mid % 4) * 4000, 100 + mid % 900
                body = hashlib.sha256(str(mid).encode()).digest()
                payload = _MAGIC + struct.pack("<iiiq", w, h, sr, dur) + body
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w if kind == "image" else None,
                            "height": h if kind == "image" else None,
                            "sample_rate": sr if kind == "audio" else None,
                            "duration_ms": dur,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_bmp(payload: bytes) -> tuple[int, int, None, None]:
    """Real BMP decode (pure Python): BITMAPFILEHEADER ('BM', 14 bytes)
    then a DIB header whose first field is its own size; BITMAPINFOHEADER
    and later variants carry int32 width at 18 and int32 height at 22
    (negative height = top-down rows)."""
    if len(payload) < 26:
        raise ValueError("truncated BMP: no room for BITMAPINFOHEADER dims")
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size == 12:  # ancient BITMAPCOREHEADER: uint16 dims
        w, h = struct.unpack_from("<HH", payload, 18)
        return int(w), int(h), None, None
    w, h = struct.unpack_from("<ii", payload, 18)
    return int(w), abs(int(h)), None, None


def _decode_wav(payload: bytes) -> tuple[None, None, int, int]:
    """Real WAV (RIFF) decode (pure Python): walk the chunk list, read
    channels/rate/width from 'fmt ', duration from the 'data' size."""
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("RIFF payload is not WAVE")
    pos, sr, block_align, data_bytes = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt " and size >= 16:
            _fmt, n_ch, sr, _brate, block_align, _bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
        elif cid == b"data":
            data_bytes = size
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sr is None or data_bytes is None or not block_align:
        raise ValueError("WAV missing fmt or data chunk")
    duration_ms = data_bytes * 1000 // (sr * block_align)
    return None, None, int(sr), int(duration_ms)


def _decode_payload(payload: bytes) -> tuple[int | None, int | None, int | None, int | None]:
    """Decode a media payload's header into (width, height, sample_rate,
    duration_ms). Real formats handled in pure Python: BMP images and
    RIFF/WAV audio, plus the deterministic synthetic SYNM codec used by
    the generated fixtures. Other containers (PNG/JPEG/MP4/...) need
    codec libraries not present in this environment and raise
    NotImplementedError at this single extension point."""
    if payload[:4] == _MAGIC:
        return struct.unpack("<iiiq", payload[4:24])
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    raise NotImplementedError(
        "unsupported media container (supported: BMP, RIFF/WAV, SYNM); "
        "PNG/JPEG/MP4 decoding needs image/av libs not in this environment"
    )


DECODED_SCHEMA = (
    "media_id LONG, kind STRING, width INT, height INT, sample_rate INT, "
    "duration_ms LONG, payload_bytes LONG, digest STRING"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payload headers into typed columns (Arrow-batched)."""

    # iterrows() materializes a Series per row (measured 2-5x tax on the
    # fingerprint legs, PERF.md r6); columnar .tolist() + list
    # comprehensions keep the Python work to the decode itself.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"].tolist()]
            decoded = [_decode_payload(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].tolist(),
                    "kind": pdf["kind"].tolist(),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "sample_rate": [d[2] for d in decoded],
                    "duration_ms": [d[3] for d in decoded],
                    "payload_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic feature vectors from payload bytes (stand-in for a
    real embedding model; same Arrow plumbing, same output schema)."""
    schema = f"media_id LONG, feature ARRAY<FLOAT>"

    idx = [i % 32 for i in range(dim)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.sha256(bytes(p)).digest() for p in pdf["payload"].tolist()
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].tolist(),
                    "feature": [[(d[i] - 128) / 128.0 for i in idx] for d in digests],
                }
            )

    return df.mapInPandas(run, schema)


def _bmp_pixels(payload: bytes):
    """Decode an uncompressed 24bpp BITMAPINFOHEADER BMP into an
    (h, w, 3) uint8 BGR array (pure numpy — BMP rows are bottom-up unless
    height is negative, and padded to 4-byte boundaries)."""
    import numpy as np

    off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER pixel decode not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24bpp BMP (got {bpp}bpp/c{compression})")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
    px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return px if top_down else px[::-1]


def _encode_bmp(px) -> bytes:
    """Encode an (h, w, 3) uint8 BGR array as a bottom-up 24bpp BMP."""
    import numpy as np

    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    off = 14 + 40
    return struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off) + dib + pixels


def _resize_nearest(px, target_w: int, target_h: int):
    """Nearest-neighbor resample: index-map rows/cols (the PIL-free
    baseline every image pipeline starts from)."""
    import numpy as np

    h, w = px.shape[:2]
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    return px[yi][:, xi]


RESIZED_SCHEMA = (
    "media_id LONG, kind STRING, width INT, height INT, payload BINARY"
)


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize image rows to (target_w, target_h); non-image rows pass
    through untouched. REAL for 24bpp BMP payloads — decode to a numpy
    BGR array, nearest-neighbor resample, re-encode a valid BMP. The
    synthetic SYNM codec re-packs its header (its body is a digest, not
    pixels). Other containers (PNG/JPEG) would slot into the same two
    helpers once codec libs exist. Arrow-batched, partition-parallel,
    schema-stable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["kind"].tolist()
            widths, heights, payloads = [], [], []
            for kind, raw in zip(kinds, pdf["payload"].tolist()):
                payload = bytes(raw)
                w, h, sr, dur = _decode_payload(payload)
                if kind == "image" and payload[:2] == b"BM":
                    payload = _encode_bmp(
                        _resize_nearest(_bmp_pixels(payload), target_w, target_h)
                    )
                    w, h = target_w, target_h
                elif kind == "image" and payload[:4] == _MAGIC:
                    w, h = target_w, target_h
                    payload = _MAGIC + struct.pack("<iiiq", w, h, sr, dur) + payload[24:]
                widths.append(w)
                heights.append(h)
                payloads.append(payload)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].tolist(),
                    "kind": kinds,
                    "width": widths,
                    "height": heights,
                    "payload": payloads,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


def _wav_samples(payload: bytes):
    """Decode 16-bit PCM WAV samples to an (n, channels) int16 array."""
    import numpy as np

    pos, n_ch, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt " and size >= 16:
            fmt_tag, n_ch, _sr, _brate, _ba, bits = struct.unpack_from("<HHIIHH", payload, pos + 8)
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError("only 16-bit PCM WAV samples")
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    if n_ch is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, n_ch)


AUDIO_FEATURES_SCHEMA = (
    "media_id LONG, window_idx LONG, n_samples LONG, rms LONG, peak LONG, "
    "zero_crossings LONG"
)


def audio_window_features(df: DataFrame, window_ms: int = 100) -> DataFrame:
    """Per-window audio features over RIFF/WAV payloads: RMS (floor of
    the exact integer-sample RMS), absolute peak, and zero-crossing count
    per fixed window of the first channel. REAL decoding — pure numpy
    over PCM16 samples; non-WAV rows contribute no windows (the synthetic
    codec has a digest body, not samples). This is the feature-extraction
    stage of an audio training pipeline: one output row per window, Arrow
    batches, partition-parallel, integer-exact outputs."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            cols = {
                "media_id": [], "window_idx": [], "n_samples": [], "rms": [],
                "peak": [], "zero_crossings": [],
            }
            for mid, raw in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
                payload = bytes(raw)
                if payload[:4] != b"RIFF":
                    continue
                _w, _h, sr, _dur = _decode_payload(payload)
                mono = _wav_samples(payload)[:, 0].astype(np.int64)
                if len(mono) == 0:
                    # zero-sample RIFF: no windows (the per-row loop this
                    # replaced simply emitted nothing; starts[-1]/n_samp[-1]
                    # below would IndexError on the empty arrays)
                    continue
                step = max(1, sr * window_ms // 1000)
                nwin = math.ceil(len(mono) / step)
                starts = np.arange(nwin) * step
                # all windows full-size except a possibly-short tail
                n_samp = np.full(nwin, step, dtype=np.int64)
                n_samp[-1] = len(mono) - starts[-1]
                sq = np.add.reduceat(mono * mono, starts)
                peak = np.maximum.reduceat(np.abs(mono), starts)
                # zero crossings only between NEIGHBORS IN THE SAME WINDOW
                # (the per-chunk semantics of the original loop): pair i is
                # (sample i, i+1); keep pairs whose two ends share a window.
                sign = mono >= 0
                pair_idx = np.arange(len(mono) - 1)
                same_win = (pair_idx // step) == ((pair_idx + 1) // step)
                crossing = sign[:-1] != sign[1:]
                zc = np.bincount(
                    pair_idx[same_win & crossing] // step, minlength=nwin
                )
                cols["media_id"].extend([mid] * nwin)
                cols["window_idx"].extend(range(nwin))
                cols["n_samples"].extend(n_samp.tolist())
                cols["rms"].extend(
                    math.isqrt(int(s) // int(n)) for s, n in zip(sq, n_samp)
                )
                cols["peak"].extend(peak.tolist())
                cols["zero_crossings"].extend(zc.tolist())
            yield pd.DataFrame(cols)

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 100) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp —
    pure DataFrame ops (sequence + explode), no Python in the path."""
    return (
        df.select("media_id", F.col("meta.duration_ms").alias("dur"))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("dur"), F.lit(every_ms))).alias("frame_ms"),
        )
    )
