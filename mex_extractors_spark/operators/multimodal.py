"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schemas, Arrow-batched mapInPandas, batch
shapes, partitioning); the codec step is a clearly-marked deterministic
stub because image/audio libraries are not in this container — swap
`_decode_stub` for PIL/librosa/ffmpeg calls on a real cluster and
nothing else changes.
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
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha256", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded hash bytes."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.to_binary(
        F.sha2(F.concat_ws("|", F.col("media_id"), F.lit(seed)), 256), F.lit("hex")
    )
    return df.select(
        "media_id",
        kind.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        payload.alias("payload"),
    )


def _decode_stub(payload: bytes | None, kind: str, dim: int = 8) -> list[float]:
    """STUB decoder: deterministic pseudo-feature from the payload hash.

    On a real cluster replace with e.g. PIL image decode + resize +
    channel means, or librosa MFCCs; the mapInPandas plumbing (Arrow
    batches in, Arrow batches out, one batch per partition slice) is
    exactly what a real codec would run inside.
    """
    if payload is None:
        raise NotImplementedError("real decode requires media libs; payload missing")
    h = hashlib.sha256(bytes(payload) + kind.encode()).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each executor receives pandas batches of (media_id,
    kind, payload) — the decode runs vectorized per batch, never per-row
    over py4j. Output schema is fixed (FEATURE_SCHEMA).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [
                        _decode_stub(p, k, dim)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (sequence + explode — pure expressions); the actual frame
    grab is the stubbed decode. Shows the fan-out shape a real sampler
    uses: rows multiply BEFORE the heavy decode so Spark can rebalance.
    """
    video = media.where(F.col("kind") == "video").withColumn(
        "duration_ms", F.coalesce(F.col("duration_ms"), F.lit(3000).cast("long"))
    )
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
