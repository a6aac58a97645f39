"""Multimodal column plumbing: image/audio/video as opaque binary.

Treats media as ``binary`` payload columns with typed metadata structs.
The Spark-side plumbing — schema, partition strategy, Arrow batch shape,
mapInPandas signatures — is real and tested; the codec work itself is
STUBBED (this container ships no image/audio libraries): decode raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic synthetic decode so downstream stages stay testable.

At 100 TB scale the operative concerns are all here: binary stays
opaque to the JVM (no codegen over blobs), batches flow to Python via
Arrow once, features come back columnar, and partitioning is by
(modality, size-bucket) so one giant video cannot skew a partition.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),   # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),      # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.abs(F.xxhash64(F.col("id"), F.lit("m")))
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (h % 3 + 1).cast("int")
    )
    return df.select(
        F.col("id").alias("media_id"),
        modality.alias("modality"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
        F.when(modality != "audio", ((h % 640) + 16).cast("int")).alias("width"),
        F.when(modality != "audio", ((h % 480) + 16).cast("int")).alias("height"),
        F.when(modality != "image", ((h % 60000) + 100).cast("int")).alias("duration_ms"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
    )


def partition_media(df: DataFrame, buckets: int = 64) -> DataFrame:
    """Partition by (modality, size bucket): blobs of similar magnitude
    land together, so no partition mixes one huge payload with thousands
    of tiny ones.  The size bucket is log2-width (floor(log2(bytes))):
    doubling payload size moves one bucket, unlike a modulo which groups
    by remainder rather than magnitude."""
    size_bucket = F.floor(F.log2(F.greatest(F.length("payload"), F.lit(1))))
    return df.repartition(buckets, F.col("modality"), size_bucket)


def _make_fake_decode():
    def _fake_decode(payload: bytes, modality: str, dim: int) -> np.ndarray:
        """Deterministic stand-in for a real codec: hash-seeded vector."""
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(dim).astype(np.float32)
    return _fake_decode


# factory-made (<locals> qualname) → cloudpickle serializes it BY VALUE
# into the mapInPandas closure, so executors never import subont
_fake_decode = _make_fake_decode()


def extract_media_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary).

    ``fake=False`` raises NotImplementedError from the executors — the
    real codec is not available in this environment (stub contract)."""
    fake_decode = _fake_decode

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in this container"
                )
            feats = [
                fake_decode(p, m, dim).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": pdf["payload"].map(len).astype("int64").values,
                    "sha256": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()).values,
                    "feature": feats,
                }
            )

    return df.select("media_id", "modality", "payload").mapInPandas(scan, FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows JVM-side (sequence + explode); the frame *decode* is the same
    stubbed mapInPandas path as extract_media_features."""
    vids = df.filter(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
