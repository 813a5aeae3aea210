"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features derived from the bytes, clearly marked); the
Spark-side plumbing — schemas, batch iteration, partition-preserving
mapInPandas, metadata propagation — is real and tested. Swapping the stub
for PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _stub_decode_features(payload: bytes, dim: int = 16) -> list[float]:
    """STUB: deterministic fake embedding from the payload digest.

    A real deployment decodes here (PIL.Image.open / librosa.load /
    frame-sample) — the codecs are not installed in this container.
    """
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas keeps partitioning (no shuffle) and streams batches —
    at 100 TB the payload column never materializes on the driver and
    batch size is bounded by arrow.maxRecordsPerBatch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": pdf["payload"].map(lambda b: _stub_decode_features(b, dim)),
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.randrange(256) for _ in range(128 + (i % 64)))
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                payload,
                64 if modality != "audio" else None,
                48 if modality != "audio" else None,
                1000 * (i % 30) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through and rewrites metadata; the
    real implementation decodes + resamples in the same mapInPandas shape."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


# One row per sampled frame; payload is a stubbed frame image that the
# downstream extract_features / resize_stub operators accept unchanged.
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("modality", StringType()),  # always "image"
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def frame_sample(
    media: DataFrame,
    *,
    interval_ms: int = 1000,
    max_frames: int = 32,
) -> DataFrame:
    """Sample frames from video rows at a fixed interval — the one-to-many
    half of the multimodal plumbing (decode and feature-extract are
    one-to-one). Non-video rows are dropped; each video row expands to
    min(duration_ms // interval_ms + 1, max_frames) image rows whose
    schema matches MEDIA_SCHEMA plus (frame_index, frame_ts_ms), so the
    output feeds extract_features / resize_stub directly.

    STUB: the per-frame payload is a deterministic digest of
    (video payload, frame timestamp) — a real deployment seeks and
    decodes the container at frame_ts_ms here (pyav/ffmpeg not in this
    container). The Spark shape is the real one: mapInPandas expansion is
    narrow (no shuffle), output batch size is bounded because each input
    row yields ≤ max_frames rows, and the payload column streams through
    Arrow without driver materialization.
    """
    if interval_ms <= 0:
        raise ValueError("interval_ms must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["modality"] == "video"]
            if len(vids) == 0:
                continue
            out: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
            for row in vids.itertuples(index=False):
                duration = int(row.duration_ms or 0)
                n_frames = min(duration // interval_ms + 1, max_frames)
                src = bytes(row.payload or b"")
                for j in range(n_frames):
                    ts = j * interval_ms
                    out["media_id"].append(row.media_id)
                    out["frame_index"].append(j)
                    out["frame_ts_ms"].append(ts)
                    out["modality"].append("image")
                    out["mime_type"].append("image/x-stub-frame")
                    out["payload"].append(
                        hashlib.sha256(src + ts.to_bytes(8, "big")).digest()
                    )
                    out["width"].append(row.width)
                    out["height"].append(row.height)
                    out["duration_ms"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
