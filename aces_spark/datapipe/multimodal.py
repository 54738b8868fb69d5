"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct. The Spark-side contract — schema, partition-friendly
batch shape, Arrow-batched ``mapInPandas`` transforms — is real and tested;
the actual codec calls are stubbed (the decode libraries are not available
in this environment) behind ``DecodeNotAvailable`` or a deterministic fake,
clearly marked below.
"""

from __future__ import annotations

from collections.abc import Iterator

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
    """Raised by the real decode path when codec libraries are absent."""


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB — deterministic fake feature extractor.

    The real implementation would decode the payload (PIL/libav/etc., not
    installed here) and run a feature extractor. The fake hashes payload
    bytes into a fixed-length vector so the distributed plumbing (batch
    shapes, schema, partitioning) is exercised end-to-end and reproducibly.
    """
    if payload is None:
        return []
    acc = [0.0] * 8
    for i, byt in enumerate(payload[:1024]):
        acc[i % 8] += byt / 255.0
    return [round(x, 4) for x in acc]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column via
    ``mapInPandas`` (the sanctioned slow-path shape: Python only where the
    JVM genuinely cannot express the work, and always batch-at-a-time)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

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
                        _decode_stub(p, t)
                        for p, t in zip(pdf["payload"], pdf["media_type"])
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
    computed from metadata only (``sequence`` over duration). The actual
    frame decode is the stubbed slow path; planning stays JVM-side."""
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


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB — deterministic fake resize.

    The real implementation would decode (PIL/libvips, not installed
    here), resample to ``width × height``, and re-encode. The fake emits
    a reproducible byte string derived from the payload digest and target
    dims so the Arrow plumbing — binary in, binary out, batch shapes —
    is exercised end-to-end; swap this one function when codec libraries
    exist.
    """
    if payload is None:
        return None
    import hashlib

    seed = hashlib.md5(payload).digest()
    size = min(64, max(1, (width * height) // 1024))
    return (seed * (size // len(seed) + 1))[:size]


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Arrow-batched image resize over the binary payload column
    (``mapInPandas`` — binary in, binary out). Output:
    ``(media_id, width, height, resized, n_bytes_out)``.

    Same slow-path contract as :func:`extract_features`: Python touches
    each payload exactly once per batch, the plan stays narrow (no
    shuffle — output partitioning follows input), and at 100 TB the
    work is embarrassingly parallel per partition. The decode/resample
    core is honestly stubbed (``_resize_stub``); everything Spark-side
    is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resize_stub(p, width, height) for p in pdf["payload"]]
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
