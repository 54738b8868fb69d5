"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct. The Spark-side contract — schema, partition-friendly
batch shape, Arrow-batched ``mapInPandas`` transforms — is real and tested,
and so is the image core: a dependency-free raw-RGB codec (Netpbm PPM "P6",
the classic uncompressed interchange format) plus a pure-numpy bilinear
resampler run inside the existing ``mapInPandas`` batches. Compressed
codecs (JPEG/PNG/H.264) need external libraries that are absent in this
environment; those payloads take the documented fallback paths below
(byte-level features; resize skips with a null output) instead of failing
the job — at 100 TB a poison payload must never kill the stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised when a payload's codec needs libraries absent here."""


# ---------------------------------------------------------------------------
# Raw-RGB codec (Netpbm PPM "P6") — dependency-free, public format
# ---------------------------------------------------------------------------


def decode_rgb(payload: bytes) -> np.ndarray:
    """Decode a binary PPM "P6" payload to an ``(h, w, 3)`` uint8 array.

    Full Netpbm header grammar: magic, ``#`` comments, arbitrary
    whitespace between tokens, maxval up to 255 (the 2-byte-per-sample
    >255 variant and every compressed codec raise
    :class:`DecodeNotAvailable`). Truncated pixel data raises
    ``ValueError`` — corrupt is not the same as unsupported.
    """
    if payload is None or len(payload) < 2 or bytes(payload[:2]) != b"P6":
        raise DecodeNotAvailable("not a raw-RGB (PPM P6) payload")
    buf = bytes(payload)
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments between header tokens
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            nl = buf.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tok = buf[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad PPM header token {tok!r}")
        fields.append(int(tok))
    width, height, maxval = fields
    if maxval > 255:
        raise DecodeNotAvailable("16-bit-per-sample PPM needs scaling tables")
    if width < 1 or height < 1:
        raise ValueError("non-positive PPM dimensions")
    pos += 1  # exactly ONE whitespace byte separates maxval from pixel data
    need = width * height * 3
    raster = buf[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)


def encode_rgb(img: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 array as a binary PPM "P6" payload."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) array")
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def bilinear_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Pure-numpy bilinear resample to ``(height, width, 3)`` uint8.

    Half-pixel sample centers (the OpenCV/Pillow ``align_corners=False``
    convention), edge clamping, and round-half-up quantization — fully
    vectorized (two gathers + three lerps per axis pair, no Python loop
    over pixels) and bit-deterministic for a given input.
    """
    h, w = img.shape[:2]
    if width < 1 or height < 1:
        raise ValueError("non-positive target size")
    src = img.astype(np.float64)

    def axis_coords(n_out: int, n_in: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        centers = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        lo_f = np.floor(centers)
        frac = centers - lo_f
        lo = np.clip(lo_f, 0, n_in - 1).astype(np.int64)
        hi = np.clip(lo_f + 1, 0, n_in - 1).astype(np.int64)
        return lo, hi, frac

    x0, x1, fx = axis_coords(width, w)
    y0, y1, fy = axis_coords(height, h)
    fx = fx[np.newaxis, :, np.newaxis]
    fy = fy[:, np.newaxis, np.newaxis]
    top = src[y0][:, x0] * (1.0 - fx) + src[y0][:, x1] * fx
    bot = src[y1][:, x0] * (1.0 - fx) + src[y1][:, x1] * fx
    out = top * (1.0 - fy) + bot * fy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _image_feature(img: np.ndarray) -> list[float]:
    """8-dim feature for a decoded image: dimensions, per-channel means,
    and luminance spread — the cheap corpus-curation signals (flat/blank
    detection, channel imbalance, resolution binning)."""
    h, w = img.shape[:2]
    px = img.astype(np.float64)
    means = px.mean(axis=(0, 1))
    luma = px @ np.array([0.299, 0.587, 0.114])
    return [
        float(w),
        float(h),
        round(float(means[0]), 4),
        round(float(means[1]), 4),
        round(float(means[2]), 4),
        round(float(luma.std()), 4),
        float(luma.min()),
        float(luma.max()),
    ]


def _byte_feature(payload: bytes) -> list[float]:
    """FALLBACK for non-decodable payloads (compressed codecs, text blobs):
    a deterministic 8-bin byte-value profile of the first 1 KiB, so every
    payload yields a comparable fixed-length vector and the pipeline never
    stalls on a codec it cannot open."""
    if payload is None:
        return []
    acc = [0.0] * 8
    for i, byt in enumerate(payload[:1024]):
        acc[i % 8] += byt / 255.0
    return [round(x, 4) for x in acc]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column via
    ``mapInPandas`` (the sanctioned slow-path shape: Python only where the
    JVM genuinely cannot express the work, and always batch-at-a-time).
    Raw-RGB payloads get real image statistics (:func:`_image_feature`);
    everything else gets the byte-profile fallback."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def feat(payload: bytes) -> list[float]:
            try:
                return _image_feature(decode_rgb(payload))
            except (DecodeNotAvailable, ValueError):
                return _byte_feature(payload)

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_digest": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [
                        feat(p) if p is not None else []
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def payload_stats(media: DataFrame) -> DataFrame:
    """JVM-only metadata pass (no decode): sizes and digests straight from
    Column expressions — the fast path for corpus accounting."""
    return media.select(
        "media_id",
        "media_type",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_digest"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to sample,
    computed from metadata only (``sequence`` over duration). Frame decode
    itself needs a video codec (absent here); planning stays JVM-side."""
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_at_ms"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("n_bytes_out", T.LongType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Arrow-batched image resize over the binary payload column
    (``mapInPandas`` — binary in, binary out): decode raw-RGB
    (:func:`decode_rgb`), :func:`bilinear_resize`, re-encode. Output:
    ``(media_id, width, height, resized, n_bytes_out)``.

    Same slow-path contract as :func:`extract_features`: Python touches
    each payload exactly once per batch, the plan stays narrow (no
    shuffle — output partitioning follows input), and at 100 TB the
    work is embarrassingly parallel per partition. Payloads whose codec
    we cannot open (compressed formats, corrupt rasters) yield a null
    ``resized`` instead of failing the stage — filter on
    ``resized IS NOT NULL`` downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes) -> bytes | None:
            if payload is None:
                return None
            try:
                return encode_rgb(bilinear_resize(decode_rgb(payload), width, height))
            except (DecodeNotAvailable, ValueError):
                return None

        for pdf in batches:
            resized = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "resized": resized,
                    "n_bytes_out": [len(r) if r is not None else 0 for r in resized],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)
