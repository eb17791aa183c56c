"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode/feature-extraction runs as Arrow-batched ``mapInPandas`` so the
Spark-side shape (schema, partitioning, batch signature) is real and
tested even though the actual codecs are NOT in this container — the
decode kernel is stubbed behind a deterministic fake (and raises
NotImplementedError when a real decode is requested).

At 100 TB the rules encoded here are: media bytes travel in their own
column (never exploded per-frame into rows until after sampling), the
decode stage is repartitioned by content hash before the Python pass
(CPU-bound, so partition count = cores, not bytes — see operators/fetch.py
for the same pattern), and metadata-only queries never touch the binary
column (column pruning does the rest).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

MEDIA_DOC = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

REAL_CODECS_AVAILABLE = False  # PIL/ffmpeg are not in this container


def _fake_decode_feature(payload: bytes | None, dims: int = 8) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: an md5-derived
    hash of the payload bytes, shaped like an embedding. md5 (rather than
    crc32) so a SQL oracle can recompute the identical fake features:
    DuckDB twin = ``('0x' || substr(md5(payload), 1, 15))::BIGINT`` then
    ``((h >> (i*3)) & 255) / 255.0`` per dim. Swap for the real kernel
    (PIL / torchvision / ffmpeg) where codecs exist."""
    import hashlib

    base = int(hashlib.md5(payload or b"").hexdigest()[:15], 16)
    return [((base >> (i * 3)) & 0xFF) / 255.0 for i in range(dims)]


def extract_features(
    media: DataFrame, dims: int = 8, real_decode: bool = False
) -> DataFrame:
    """Arrow-batched decode/feature pass over (media_id, payload, meta).

    ``real_decode=True`` requires actual codec libraries and raises
    NotImplementedError in this container — the stub keeps the Spark-side
    plumbing (schema, repartition, batch shape) fully exercised."""
    if real_decode and not REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "real media decode needs PIL/ffmpeg which are not installed; "
            "run with real_decode=False for the deterministic stub"
        )
    n_part = int(media.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # CPU-bound python stage: spread by id hash, not by byte size
    media = media.repartition(n_part, F.xxhash64("media_id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_feature(p, dims)
                for p in pdf["payload"].tolist()
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": [True] * len(pdf),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned sample timestamp,
    derived from metadata only (payload untouched → column pruning keeps
    the binary out of the scan)."""
    return (
        media.where(F.col("meta.media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )


def synth_media_docs(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        fmt = {"image": "png", "audio": "wav", "video": "mp4"}[mt]
        payload = bytes(f"media-{i}", "utf-8") * (4 + i % 7)
        rows.append(
            (
                f"m{i:05d}",
                payload,
                {
                    "media_type": mt,
                    "format": fmt,
                    "width": 64 + (i % 8) * 16 if mt == "image" else None,
                    "height": 64 + (i % 5) * 16 if mt == "image" else None,
                    "duration_ms": 1000 * (1 + i % 10) if mt != "image" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_DOC)
