"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schemas, Arrow-batched mapInPandas, batch
shapes, partitioning) AND the codec step is real for the two container
formats the stdlib can parse without third-party libraries:

- 24-bit uncompressed BMP (``struct`` header parse + numpy pixel plane):
  width, height, per-channel means — the same features a PIL decode +
  resize + channel-mean pipeline produces;
- 8-bit RGB PNG (stdlib ``zlib`` inflate + real scanline unfiltering:
  Sub/Up/Average/Paeth reversed per the PNG spec, chunk CRCs verified,
  decompression-bomb bounded) — a genuinely *compressed* image format;
- 16-bit mono WAV (stdlib ``wave``): sample count, duration, RMS,
  zero-crossing rate — the front half of an MFCC-style audio pipeline;
- uncompressed 24-bit AVI (RIFF ``struct`` walk: avih/strh/strf headers,
  ``movi`` ``00db`` DIB frames) — real VIDEO frame extraction, so the
  frame-sample plan's decode step is no longer a stub for this format.

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
import zlib
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


def _dib_pack_rows(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB, top-down → DIB pixel array bytes: bottom-up
    BGR rows padded to 4 bytes — the layout shared by 24-bit BMP bodies
    and uncompressed AVI '00db' frames (one packer so the two container
    writers can never diverge)."""
    h, w = rgb.shape[:2]
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = rgb[..., ::-1].reshape(h, w * 3)
    return rows[::-1].tobytes()


def _dib_unpack_rows(
    buf: bytes, offset: int, w: int, h: int, bottom_up: bool
) -> np.ndarray:
    """Inverse of _dib_pack_rows: DIB pixel array at ``offset`` →
    (h, w, 3) uint8 RGB, top-down. Caller bound-checks the buffer."""
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(buf, dtype=np.uint8, count=row_size * h, offset=offset)
    data = data.reshape(h, row_size)
    if bottom_up:
        data = data[::-1]
    return data[:, : w * 3].reshape(h, w, 3)[..., ::-1]


def _bih_pack(w: int, h: int, img_size: int) -> bytes:
    """24-bit uncompressed BITMAPINFOHEADER — ONE packer shared by the
    BMP info block and the AVI strf chunk, the same never-diverge rule
    as _dib_pack_rows: both containers carry the identical DIB layout,
    so its header must be spelled exactly once."""
    return struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )


def bmp_bytes(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> bytes:
    """Serialize (h, w) uint8 channel planes as a 24-bit uncompressed
    BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded
    to 4 bytes) — the format every image tool reads, built with nothing
    but ``struct`` + numpy."""
    h, w = r.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = _bih_pack(w, h, img_size)
    return header + info + _dib_pack_rows(np.stack([r, g, b], axis=-1))


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
    px = _dib_unpack_rows(payload, pixel_off, w, h, bottom_up)
    return (
        w,
        h,
        float(px[..., 0].mean()),
        float(px[..., 1].mean()),
        float(px[..., 2].mean()),
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
    if len(s) != n:
        # truncated data chunk: wave returns fewer frames than the
        # header declares WITHOUT raising. Trusting the header n would
        # emit NaN RMS over an empty array and mutually inconsistent
        # duration/RMS/ZCR — fail into decode_features' hash fallback
        raise ValueError(
            f"truncated WAV: header declares {n} frames, decoded {len(s)}"
        )
    duration = n / sr
    rms = math.sqrt(float((s * s).mean())) if n else 0.0
    if n > 1:
        sign = s >= 0
        zcr = float(np.count_nonzero(sign[1:] != sign[:-1])) / (n - 1)
    else:
        zcr = 0.0
    return n, duration, rms, zcr, sr


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# refuse to reconstruct more pixels than this no matter what the header
# claims — a 100-byte IDAT can inflate to gigabytes (zip bomb) and a
# crafted IHDR can declare 2^31 x 2^31; both must die as ValueError
# inside the decode contract, never as an allocation stall on a task
_PNG_MAX_PIXELS = 1 << 26


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 9.4): pick whichever of
    left/up/upper-left is closest to p = a + b - c, ties in that order."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_filter_row(ft: int, cur: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Apply PNG filter ``ft`` to one raw scanline (encode side, fully
    vectorized — bpp=3 so 'left' is the byte 3 positions back)."""
    c16, p16 = cur.astype(np.int16), prev.astype(np.int16)
    left = np.concatenate([np.zeros(3, np.int16), c16[:-3]])
    upleft = np.concatenate([np.zeros(3, np.int16), p16[:-3]])
    if ft == 0:
        out = c16
    elif ft == 1:
        out = c16 - left
    elif ft == 2:
        out = c16 - p16
    elif ft == 3:
        out = c16 - (left + p16) // 2
    elif ft == 4:
        out = c16 - _paeth_vec(left, p16, upleft)
    else:
        raise ValueError(f"unknown PNG filter type {ft}")
    return (out % 256).astype(np.uint8)


def _png_unfilter_row(ft: int, filt: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Reverse one scanline filter (decode side). None/Up/Sub are
    vectorized (Sub is a per-channel prefix sum mod 256); Average and
    Paeth carry a true left-to-right data dependence, so they run as a
    per-byte loop — fine for the stdlib-only path, and the swap-in point
    for PIL on a real cluster."""
    if ft == 0:
        return filt.copy()
    if ft == 2:
        return ((filt.astype(np.int16) + prev) % 256).astype(np.uint8)
    if ft == 1:
        out = filt.astype(np.int64).reshape(-1, 3)
        return (np.cumsum(out, axis=0) % 256).astype(np.uint8).reshape(-1)
    if ft not in (3, 4):
        raise ValueError(f"unknown PNG filter type {ft}")
    out = np.empty_like(filt)
    for i in range(len(filt)):
        left = int(out[i - 3]) if i >= 3 else 0
        up = int(prev[i])
        if ft == 3:
            val = int(filt[i]) + (left + up) // 2
        else:
            upleft = int(prev[i - 3]) if i >= 3 else 0
            val = int(filt[i]) + int(
                _paeth_vec(np.int16(left), np.int16(up), np.int16(upleft))
            )
        out[i] = val & 0xFF
    return out


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_bytes(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> bytes:
    """Serialize (h, w) uint8 channel planes as an 8-bit RGB PNG with
    nothing but ``struct`` + ``zlib``. Scanline filters cycle 0→4 by row
    so every decode exercises all five filter reconstructions — the
    decoded pixels are filter-independent, which keeps closed-form
    oracles valid while forcing the decoder to do real work."""
    h, w = r.shape
    px = np.stack([r, g, b], axis=-1).astype(np.uint8).reshape(h, w * 3)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        ft = y % 5
        raw.append(ft)
        raw += _png_filter_row(ft, px[y], prev).tobytes()
        prev = px[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, float, float, float]:
    """(width, height, mean_r, mean_g, mean_b) from an 8-bit RGB
    non-interlaced PNG: chunk walk with CRC verification, bounded zlib
    inflate, per-scanline unfiltering. Integer channel means are exact
    in float64, so an external oracle stating them in closed form
    matches bit-for-bit (same contract as decode_bmp)."""
    raw = bytes(payload)
    if raw[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    ihdr: bytes | None = None
    idat = bytearray()
    pos = 8
    while pos + 12 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(raw):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "only 8-bit non-interlaced RGB PNG supported "
            f"(depth={depth}, color_type={ctype}, interlace={interlace})"
        )
    if w == 0 or h == 0 or w * h > _PNG_MAX_PIXELS:
        raise ValueError(f"PNG dimensions {w}x{h} out of bounds")
    stride = w * 3
    expected = h * (stride + 1)
    dec = zlib.decompressobj()
    try:
        inflated = dec.decompress(bytes(idat), expected)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if len(inflated) != expected or dec.decompress(b"", 1):
        raise ValueError("PNG pixel data length mismatch")
    rows = np.frombuffer(inflated, dtype=np.uint8).reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.uint8)
    out = np.empty((h, stride), dtype=np.uint8)
    for y in range(h):
        prev = _png_unfilter_row(int(rows[y, 0]), rows[y, 1:], prev)
        out[y] = prev
    px = out.reshape(h, w, 3)
    return (
        int(w),
        int(h),
        float(px[..., 0].mean()),
        float(px[..., 1].mean()),
        float(px[..., 2].mean()),
    )


# ------------------------------------------------- uncompressed AVI

_AVI_MAX_PIXELS = 1 << 26  # per frame; same crafted-header stance as PNG
_AVI_MAX_FRAMES = 1 << 16


def _riff_chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _riff_list(list_type: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + payload)


def avi_bytes(frames: list[np.ndarray], fps: int = 5) -> bytes:
    """Serialize (h, w, 3) uint8 RGB frames as an uncompressed 24-bit
    AVI (RIFF 'AVI ': avih + strl(strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER) + movi of '00db' DIB chunks) — pure ``struct``,
    deterministic bytes, readable by any video tool."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all AVI frames must share one geometry")
    row_size = (w * 3 + 3) & ~3
    frame_size = row_size * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no AVIF_HASINDEX — this writer emits no idx1 chunk
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids",
        b"DIB ",
        0, 0, 0, 0,  # flags, priority, language, initial frames
        1,  # dwScale
        fps,  # dwRate (rate/scale = fps)
        0,  # dwStart
        len(frames),  # dwLength
        frame_size,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (default)
        0,  # dwSampleSize
        0, 0, w, h,  # rcFrame
    )
    strf = _bih_pack(w, h, frame_size)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(
        b"movi", b"".join(_riff_chunk(b"00db", _dib_pack_rows(f)) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, int, float, list[np.ndarray]]:
    """(width, height, fps, frames) from an uncompressed 24-bit AVI —
    frames come back as (h, w, 3) uint8 RGB arrays, top-down. Strict
    contract like decode_bmp/decode_png: anything but 24-bit
    biCompression=0 'vids' raises ValueError."""
    raw = bytes(payload)
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_len,) = struct.unpack_from("<I", raw, 4)
    end = min(len(raw), 8 + riff_len)
    w = h = None
    bottom_up = True
    fps = 0.0
    frames: list[np.ndarray] = []

    # iterative document-order LIST descent (explicit stack of resume
    # points): a crafted payload of thousands of nested LISTs must die
    # in the bounds checks as a ValueError, never as a RecursionError
    # escaping the dispatch fall-through contract in decode_features.
    # Document order matters: strf must be seen before the first frame.
    stack: list[tuple[int, int]] = [(12, end)]
    while stack:
        pos, stop = stack.pop()
        if pos + 8 > stop:
            continue
        tag = raw[pos : pos + 4]
        (length,) = struct.unpack_from("<I", raw, pos + 4)
        start = pos + 8
        if start + length > stop:
            raise ValueError(f"truncated RIFF chunk {tag!r}")
        # resume this level after the current chunk (pushed first so the
        # LIST descent below is popped — and fully walked — before it)
        stack.append((start + length + (length % 2), stop))
        if tag == b"LIST":
            if length < 4:
                raise ValueError("RIFF LIST shorter than its type tag")
            stack.append((start + 4, start + length))
        elif tag == b"strh" and length >= 56:
            fcc_type, _, _, _, _, _, scale, rate = struct.unpack_from(
                "<4s4sIHHIII", raw, start
            )
            if fcc_type == b"vids":
                if scale == 0 or rate == 0:
                    raise ValueError("AVI video stream has zero rate/scale")
                fps = rate / scale
        elif tag == b"strf" and length >= 40 and w is None:
            _, bw, bh, _, bpp = struct.unpack_from("<IiiHH", raw, start)
            (compression,) = struct.unpack_from("<I", raw, start + 16)
            if bpp != 24 or compression != 0:
                raise ValueError(
                    f"only 24-bit uncompressed AVI supported (bpp={bpp})"
                )
            if bw <= 0 or bh == 0 or bw * abs(bh) > _AVI_MAX_PIXELS:
                raise ValueError(f"AVI dimensions {bw}x{bh} out of bounds")
            # negative biHeight = top-down DIB, same as BMP
            w, h, bottom_up = bw, abs(bh), bh > 0
        elif tag in (b"00db", b"00dc"):
            if w is None:
                raise ValueError("AVI frame chunk before strf header")
            if len(frames) >= _AVI_MAX_FRAMES:
                raise ValueError("AVI frame count out of bounds")
            row_size = (w * 3 + 3) & ~3
            if length < row_size * h:
                raise ValueError("AVI frame chunk shorter than one frame")
            frames.append(_dib_unpack_rows(raw, start, w, h, bottom_up))
    if w is None or not frames:
        raise ValueError("AVI missing video stream or frames")
    if fps <= 0:
        raise ValueError("AVI missing video stream header (strh)")
    return int(w), int(h), float(fps), frames


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
    ]
)


def extract_frame_features(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """REAL video frame sampling + decode: for each ``kind='video'``
    payload, parse the AVI container, sample frames on an ``every_ms``
    stride (at least every frame), and emit per-frame channel means.

    Same Arrow-batched mapInPandas shape as extract_features — decode
    runs executor-side over pandas batches; at 100 TB the videos are a
    partitioned binary column and each executor decodes only its own
    split. Compose with frame_sample_plan when the fan-out must happen
    BEFORE the decode (seekable codecs); uncompressed AVI decodes the
    container once per payload, so sampling after parse is the cheaper
    plan here.

    Same corpus-safe contract as decode_features: a payload that is not
    a parseable 24-bit uncompressed AVI (or is NULL) yields zero rows
    for that media_id instead of raising — one adversarial byte string
    must never kill a corpus-scale job on every task retry."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAME_FEATURE_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    _, _, fps, frames = decode_avi(bytes(payload))
                except (ValueError, struct.error):
                    continue  # not a decodable AVI — skip, never raise
                stride = max(1, int(round(every_ms * fps / 1000.0)))
                for idx in range(0, len(frames), stride):
                    px = frames[idx].astype(np.float64)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(int(idx * 1000 // fps))
                    out["mean_r"].append(float(px[..., 0].mean()))
                    out["mean_g"].append(float(px[..., 1].mean()))
                    out["mean_b"].append(float(px[..., 2].mean()))
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, FRAME_FEATURE_SCHEMA)
    )


def decode_features(payload: bytes | None, kind: str, dim: int = 8) -> list[float]:
    """Fixed-length feature vector per payload, real decode first:

    - BMP magic ``BM`` → [width, height, mean_r, mean_g, mean_b, 3]
    - PNG magic → [width, height, mean_r, mean_g, mean_b, 4]
    - RIFF/WAVE → [n_samples, duration_s, rms, zcr, sample_rate, 1]
    - RIFF/AVI  → [n_frames, duration_s, width, height, fps, 2]
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
    elif raw[:8] == PNG_MAGIC:
        try:
            w, h, mr, mg, mb = decode_png(raw)
            feat = [float(w), float(h), mr, mg, mb, 4.0]
        except (ValueError, struct.error, zlib.error):
            feat = None  # PNG magic but not a parseable 8-bit RGB PNG
    elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        try:
            n, duration, rms, zcr, sr = decode_wav(raw)
            feat = [float(n), duration, rms, zcr, float(sr), 1.0]
        except (ValueError, wave.Error, EOFError):
            feat = None  # RIFF/WAVE but not mono 16-bit PCM WAV
    elif raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        try:
            w, h, fps, frames = decode_avi(raw)
            feat = [
                float(len(frames)),
                len(frames) / fps,
                float(w),
                float(h),
                fps,
                2.0,
            ]
        except (ValueError, struct.error):
            feat = None  # RIFF/AVI but not 24-bit uncompressed DIB video
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


def synth_png_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL PNG media table: every id gets an 8-bit RGB
    PNG whose pixels are integer functions of the id (w = 4 + id % 6,
    h = 3 + id % 5, channel c(x, y) patterns below) — so an external
    oracle states width/height/channel means in closed form while the
    engine must inflate + unfilter real compressed scanlines (the
    encoder cycles all five PNG filter types by row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = 4 + mid % 6
                h = 3 + mid % 5
                y, x = np.mgrid[0:h, 0:w]
                r = ((5 * mid + 2 * x + 3 * y) % 256).astype(np.uint8)
                g = ((mid + 7 * x + 2 * y) % 256).astype(np.uint8)
                b = ((3 * mid + x + y + 23) % 256).astype(np.uint8)
                rows.append(
                    (mid, "image", "image/png", w, h, None, png_bytes(r, g, b))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return ids.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, MEDIA_SCHEMA
    )


def synth_avi_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL video media table: every id gets an
    uncompressed 24-bit AVI at 2 fps with n = 2 + id % 4 frames of
    w = 4 + id % 4, h = 3 + id % 3 pixels; frame f's channels are
    integer functions of (id, f, x, y), so per-frame means are exactly
    computable in SQL while the engine must walk the RIFF container and
    decode real DIB frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w = 4 + mid % 4
                h = 3 + mid % 3
                nf = 2 + mid % 4
                y, x = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(nf):
                    r = (mid + 2 * f + 3 * x + 5 * y) % 256
                    g = (2 * mid + f + x + 7 * y + 3) % 256
                    b = (mid + 4 * f + 5 * x + y + 9) % 256
                    frames.append(
                        np.stack([r, g, b], axis=-1).astype(np.uint8)
                    )
                rows.append(
                    (
                        mid,
                        "video",
                        "video/x-msvideo",
                        w,
                        h,
                        nf * 1000 // 2,
                        avi_bytes(frames, fps=2),
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
                    # NULL payload -> NULL feature (sha is NULL too):
                    # one missing blob must never kill a corpus-scale
                    # job, same contract as the hash fallback branch
                    "feature": [
                        decode_features(p, k, dim) if p is not None else None
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
    # endpoint EXCLUSIVE: frames span [0, duration_ms), so the plan must
    # not schedule a grab at exactly duration_ms (a frame that does not
    # exist — the real sampler's range(0, len(frames), stride) never
    # emits it, and a join of plan vs decoded frames would dangle).
    # Zero-duration videos plan no frames (empty array explodes to
    # nothing) rather than tripping sequence's boundary check.
    seq = F.sequence(
        F.lit(0).cast("long"),
        F.col("duration_ms") - 1,
        F.lit(every_ms).cast("long"),
    )
    return video.select(
        "media_id",
        F.explode(
            F.when(F.col("duration_ms") > 0, seq).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("frame_ts_ms"),
    )
