"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; decode / feature-extraction are Arrow-batched
mapInPandas stages. The decode itself is STUBBED (codec libraries are
not in this environment — `decode_image_batch` raises
NotImplementedError unless the deterministic fake decoder is chosen),
but everything Spark-side is real and tested: schema, batch shape,
partition behavior, UDF signature.

At scale the rules are: binary columns are never shuffled unless the
operator needs them (project them out before joins), batches are
bounded by spark.sql.execution.arrow.maxRecordsPerBatch to keep
executor memory flat, and per-file parallelism comes from the scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
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

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("width", IntegerType()),     # typed metadata
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("feature", ArrayType(FloatType())),  # extracted vector
])


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: payload =
    md5 digest bytes of the text (stable across runs/engines), metadata
    derived from doc stats. Stands in for an Iceberg media table."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.unhex(F.md5("text")).alias("payload"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
    )


def decode_image_batch(payloads: pd.Series, fake: bool = True) -> np.ndarray:
    """Decode a batch of encoded images to pixel arrays.

    REAL DECODE IS STUBBED: with fake=False this raises — PIL/ffmpeg
    are not available here. The deterministic fake maps each payload's
    bytes to a fixed-length feature so the pipeline shape is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/turbojpeg); "
            "wire it here — the Spark plumbing is already batch-shaped")
    return np.stack([
        np.frombuffer(hashlib.sha256(bytes(p)).digest()[:32], dtype=np.uint8)
        .astype(np.float32) / 255.0
        for p in payloads
    ])


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch of (media_id, kind, payload) yields
    (media_id, kind, n_bytes, feature[32]); the decode is vectorized
    per batch — one Python call per batch, never per row."""
    cols = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = decode_image_batch(pdf["payload"], fake=True)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "n_bytes": pdf["payload"].map(len).astype("int32").values,
                "feature": list(feats),
            })

    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 5) -> DataFrame:
    """Frame sampling for video rows: explode n_frames into sampled
    frame indices (pure relational — the heavy per-frame decode would
    hang off this skeleton as another mapInPandas stage)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )
