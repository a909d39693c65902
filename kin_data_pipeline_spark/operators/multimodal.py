"""Multimodal column operators: opaque binary payloads + typed metadata.

Design for 100 TB: binary media live as ``BinaryType`` columns (or object-
store URIs) beside typed metadata structs; every transform is Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.
The actual codec work (image decode, audio resample, video frame-sample)
requires libraries not present in this container — those steps are STUBBED
behind ``require_codec`` with a deterministic fake used by tests; the Spark
plumbing (schemas, batching, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("feature_hash", LongType()),
    ]
)

def require_codec(name: str):
    """Import a media codec library or raise a clear stub error.

    The container ships no image/audio libs; production clusters would.
    """
    try:
        return __import__(name)
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            f"media codec '{name}' is not installed in this environment; "
            "decode steps are stubbed (see fake_decode_batch)"
        ) from exc

def attach_media_columns(
    df: DataFrame, id_col: str, payload_col: str, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Wrap an arbitrary source column as an opaque media payload with
    typed metadata — the ingestion edge of the multimodal pipeline.
    ``carry_cols`` ride along untouched (source/partition labels)."""
    content = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(content).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("checksum"),
        *carry_cols,
    )

def _fake_decode(content: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decoder: derives a stable
    (width, height, channels, feature_hash) from the payload bytes."""
    h = hashlib.sha256(content).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 4
    feature_hash = int.from_bytes(h[3:10], "big")
    return width, height, channels, feature_hash

def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow-batched decode. The real implementation
    swaps ``_fake_decode`` for PIL/libav calls — the batch shape, schema,
    and partition behavior stay identical."""
    for pdf in batches:
        decoded = pdf["content"].map(_fake_decode)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "width": decoded.map(lambda t: t[0]),
                "height": decoded.map(lambda t: t[1]),
                "n_channels": decoded.map(lambda t: t[2]),
                "feature_hash": decoded.map(lambda t: t[3]),
            }
        )

def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    Uses the deterministic fake decoder (container has no codecs); swap in
    a real decoder via ``require_codec`` on a production image.
    """
    return df.mapInPandas(fake_decode_batch, schema=DECODED_SCHEMA)

def frame_sample_plan(
    df: DataFrame, n_frames_col: str = "n_frames", sample_count: int = 8
) -> DataFrame:
    """Video frame-sampling plan: pick ``sample_count`` evenly-spaced frame
    indices per clip from its frame count — pure JVM array math
    (``sequence``/``transform``), one row per clip with the index array.
    The byte-level frame extraction consuming this plan is part of the
    stubbed codec step (``require_codec('av')`` on a production image).

    Clips shorter than ``sample_count`` keep every frame exactly once.
    """
    n = F.col(n_frames_col)
    take = F.least(n, F.lit(sample_count))
    # floor(i * n / take) for i in [0, take) — the standard uniform stride.
    idx = F.transform(
        F.sequence(F.lit(0), take - 1),
        lambda i: F.floor(i * n / take).cast("int"),
    )
    return df.select(
        "*",
        take.cast("int").alias("n_sampled"),
        F.when(n > 0, idx).otherwise(F.array().cast("array<int>")).alias(
            "frame_indices"
        ),
    )

def resize_plan(df: DataFrame, max_side: int) -> DataFrame:
    """Pure-metadata resize planning (aspect-preserving target dims) — stays
    JVM-side; the byte-level resample is part of the stubbed codec step."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return df.select(
        "*",
        (F.col("width") * scale).cast("int").alias("target_width"),
        (F.col("height") * scale).cast("int").alias("target_height"),
    )
