"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schemas, Arrow-batched mapInPandas, batch
shapes, partitioning) AND the codec step is real for the two container
formats the stdlib can parse without third-party libraries:

- 24-bit uncompressed BMP (``struct`` header parse + numpy pixel plane):
  width, height, per-channel means — the same features a PIL decode +
  resize + channel-mean pipeline produces;
- 16-bit mono WAV (stdlib ``wave``): sample count, duration, RMS,
  zero-crossing rate — the front half of an MFCC-style audio pipeline.

Payloads in any OTHER format still get the deterministic hash feature
(clearly separated in ``decode_features``); swap that branch for
PIL/librosa/ffmpeg on a real cluster and nothing else changes. All
decoding runs vectorized inside ``mapInPandas`` Arrow batches — never
per-row over py4j.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
from collections.abc import Iterator

import numpy as np
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


# ------------------------------------------------------- real codecs


def bmp_bytes(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> bytes:
    """Serialize (h, w) uint8 channel planes as a 24-bit uncompressed
    BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded
    to 4 bytes) — the format every image tool reads, built with nothing
    but ``struct`` + numpy."""
    h, w = r.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = np.stack([b, g, r], axis=-1).reshape(h, w * 3)
    return header + info + rows[::-1].tobytes()


def decode_bmp(payload: bytes) -> tuple[int, int, float, float, float]:
    """(width, height, mean_r, mean_g, mean_b) from a 24-bit BMP.

    Channel means over integer pixel values are exact in float64
    regardless of summation order, so an external oracle computing the
    same means in closed form matches bit-for-bit."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h}")
    row_size = (w * 3 + 3) & ~3
    # bound-check BEFORE frombuffer: a crafted header declaring huge
    # dimensions makes count overflow C ssize_t (OverflowError, which
    # is NOT a decode error and would leak past decode_features'
    # fall-through contract) — a truncated buffer is a ValueError here
    if pixel_off < 0 or pixel_off + row_size * h > len(payload):
        raise ValueError(
            f"BMP pixel data truncated (declared {w}x{h}, "
            f"need {row_size * h} bytes at offset {pixel_off})"
        )
    data = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=pixel_off
    ).reshape(h, row_size)
    if bottom_up:
        data = data[::-1]
    px = data[:, : w * 3].reshape(h, w, 3)  # file order is BGR
    return (
        w,
        h,
        float(px[..., 2].mean()),
        float(px[..., 1].mean()),
        float(px[..., 0].mean()),
    )


def wav_bytes(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Serialize int16 samples as mono 16-bit PCM WAV via stdlib
    ``wave`` (RIFF container, deterministic bytes)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, float, float, float, int]:
    """(n_samples, duration_s, rms, zero_crossing_rate, sample_rate)
    from a mono 16-bit PCM WAV — stdlib ``wave`` decode, numpy math.

    RMS sums integer squares (exact in float64 below 2**53) and the
    zero-crossing rate counts sign transitions of ``s >= 0``, so both
    are reproducible in closed form by an external oracle."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only mono 16-bit PCM WAV supported")
        sr = w.getframerate()
        if sr <= 0:
            # crafted header: wave reads framerate=0 without complaint,
            # but duration would divide by it
            raise ValueError(f"invalid WAV sample rate {sr}")
        n = w.getnframes()
        s = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.float64)
    duration = n / sr
    rms = math.sqrt(float((s * s).mean())) if n else 0.0
    if n > 1:
        sign = s >= 0
        zcr = float(np.count_nonzero(sign[1:] != sign[:-1])) / (n - 1)
    else:
        zcr = 0.0
    return n, duration, rms, zcr, sr


def decode_features(payload: bytes | None, kind: str, dim: int = 8) -> list[float]:
    """Fixed-length feature vector per payload, real decode first:

    - BMP magic ``BM`` → [width, height, mean_r, mean_g, mean_b, 3]
    - RIFF magic → [n_samples, duration_s, rms, zcr, sample_rate, 1]
    - anything else → deterministic hash pseudo-feature (the documented
      fallback for formats that need PIL/librosa/ffmpeg — swap this
      branch on a real cluster, the Arrow-batched plumbing is identical)

    Vectors are truncated/zero-padded to ``dim`` so the output schema
    is stable across modalities.

    The magic-byte sniff is a HINT, not a guarantee: arbitrary bytes
    can start with ``BM`` (1 payload in 65,536 does) and every RIFF
    container (WebP, AVI) shares the WAV magic. A failed decode of a
    sniffed payload therefore falls through to the hash branch instead
    of raising — one adversarial byte string must never kill a
    corpus-scale extract job on every task retry.
    """
    if payload is None:
        raise ValueError("cannot decode a NULL payload")
    raw = bytes(payload)
    feat = None
    if raw[:2] == b"BM":
        try:
            w, h, mr, mg, mb = decode_bmp(raw)
            feat = [float(w), float(h), mr, mg, mb, 3.0]
        except (ValueError, struct.error):
            feat = None  # not actually a parseable 24-bit BMP
    elif raw[:4] == b"RIFF":
        try:
            n, duration, rms, zcr, sr = decode_wav(raw)
            feat = [float(n), duration, rms, zcr, float(sr), 1.0]
        except (ValueError, wave.Error, EOFError):
            feat = None  # RIFF but not mono 16-bit PCM WAV
    if feat is None:
        digest = hashlib.sha256(raw + kind.encode()).digest()
        feat = [byte / 255.0 for byte in digest[:dim]]
    return feat[:dim] + [0.0] * max(0, dim - len(feat))


def synth_real_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL media table: even ids get a patterned 24-bit
    BMP, odd ids a pseudo-sawtooth mono WAV — all parameters are
    integer functions of the id, so an external oracle can state every
    decoded feature in closed form without touching the bytes.

    Payload synthesis runs inside mapInPandas (numpy per payload, Arrow
    batches) — at scale the id list is a distributed table and each
    executor renders only its own partition's payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 2 == 0:
                    w = 4 + mid % 5
                    h = 3 + mid % 4
                    y, x = np.mgrid[0:h, 0:w]
                    r = ((mid + 3 * x + 7 * y) % 256).astype(np.uint8)
                    g = ((2 * mid + 5 * x + y) % 256).astype(np.uint8)
                    b = ((mid + x + 13 * y + 11) % 256).astype(np.uint8)
                    rows.append(
                        (mid, "image", "image/bmp", w, h, None, bmp_bytes(r, g, b))
                    )
                else:
                    n = 400 + (mid % 5) * 100
                    i = np.arange(n, dtype=np.int64)
                    s = ((mid * 31 + i * 17) % 501) - 250
                    rows.append(
                        (
                            mid,
                            "audio",
                            "audio/wav",
                            None,
                            None,
                            n * 1000 // 8000,
                            wav_bytes(s),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return ids.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, MEDIA_SCHEMA
    )


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
                        decode_features(p, k, dim)
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
