"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (LLM-training-pipeline extension; no counterpart in the
reference, which is tabular-only).

The Spark-side plumbing — schema, Arrow batching through mapInPandas,
partition sizing for large blobs — is real and tested; the actual
codec work is pluggable because media libraries aren't available here:
``decoder=None`` routes to a clearly-marked NotImplementedError stub,
tests inject ``fake_image_decoder``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def real_image_decode(payload: bytes) -> list[float]:  # pragma: no cover - stub
    """Decode + feature-extract one image.  STUB: the container has no
    image codec libraries; plug a PIL/torchvision-backed callable into
    ``extract_features(decoder=...)`` in a real deployment."""
    raise NotImplementedError(
        "image decoding requires a codec library; inject decoder=... "
        "(e.g. PIL-based) into extract_features()"
    )


def fake_image_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in: 8 pseudo-features from the payload digest —
    exercises the full Arrow/batching path without a codec."""
    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_len: int = 8,
    media_type: str = "image",
) -> DataFrame:
    """binary payload -> features array<double> via Arrow-batched
    mapInPandas.  Rows of other media types pass through with NULL
    features (schema-stable)."""
    dec = decoder or real_image_decode
    out_schema = "media_id long, media_type string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                dec(p) if (t == media_type and p is not None) else None
                for t, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    # Blob columns dominate partition size: cap rows per partition via
    # maxRecordsPerBatch-style splitting upstream when payloads are large.
    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=out_schema
    )


def sample_frames(
    media: DataFrame,
    every_ms: int,
    frame_extractor: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video -> (media_id, frame_ts_ms, frame binary).  The timestamp grid
    comes from metadata (pure Spark: sequence + explode); the pixel work is
    the injected ``frame_extractor(payload, ts_ms)``."""
    grid = media.where(F.col("media_type") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    if frame_extractor is None:
        return grid.select("media_id", "frame_ts_ms")  # plan-only: no codec

    out_schema = "media_id long, frame_ts_ms long, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame": [
                        frame_extractor(p, int(t))
                        for p, t in zip(pdf["payload"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return grid.mapInPandas(run, schema=out_schema)
