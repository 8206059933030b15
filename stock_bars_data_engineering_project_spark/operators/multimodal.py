"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched Pandas-UDF decode/feature stages.

Design for 100 TB of images/audio/video in parquet:

  * media travels as an opaque ``binary`` column NEXT TO typed metadata
    (media_type, width/height/duration, codec) so filters and joins
    prune on metadata without touching bytes — column pruning means a
    metadata-only query never reads a single payload byte;
  * decode / resize / frame-sample run in ``mapInPandas`` — per-batch
    Arrow transfer, one Python roundtrip per ~10k rows, not per row;
  * payload size is the partition-sizing hazard: repartition by a
    size-aware key before heavy decode so one task never holds a skewed
    batch of 100 MB videos.

The actual codec work (PIL/ffmpeg/torchaudio) is NOT in this container,
so ``decode_image_stub`` raises ``NotImplementedError`` at the exact
seam where a real decoder plugs in, and the tested path uses
``fake_feature_extractor`` — a deterministic bytes->features function
with the same signature, so the Spark-side plumbing (schema, batching,
partitioning) is fully exercised.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap rows into the media schema, using utf-8 bytes of ``text_col``
    as a stand-in payload (deterministic; real pipelines read the bytes
    from object storage)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """The real-decoder seam. A production build replaces this body with
    ``PIL.Image.open(io.BytesIO(payload))`` (or ffmpeg for video); the
    container has no image libs, so the plumbing is tested through
    :func:`fake_feature_extractor` instead."""
    raise NotImplementedError("image codec not available in this environment")


def fake_feature_extractor(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic bytes -> feature vector: md5-seeded, unit-scaled.
    Stands in for a real embedding model with an identical signature."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


FEATURES_FIELD = T.StructField("features", T.ArrayType(T.DoubleType()), True)
_OUT_SCHEMA = T.StructType(
    [f for f in MEDIA_SCHEMA.fields if f.name != "payload"] + [FEATURES_FIELD]
)


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, payload dropped on
    output (features replace bytes — the shuffle downstream moves 16
    doubles per row, not megabytes of media)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_feature_extractor)
            out = pdf.drop(columns=["payload"])
            out["features"] = feats
            yield out

    return df.mapInPandas(_extract, schema=_OUT_SCHEMA)


def media_metadata_only(df: DataFrame) -> DataFrame:
    """Metadata projection — the plan must NOT read the payload column
    (verified by tests via the scan's ReadSchema)."""
    return df.select("media_id", "media_type", "byte_len", "content_md5")
