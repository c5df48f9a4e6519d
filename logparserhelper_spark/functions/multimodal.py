"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested. Decode status per
modality (the accepted boundary for this image):

- audio/WAV: REAL decode via the stdlib ``wave`` module (``wav_decode``) —
  duration/channels/rate plus global and windowed RMS features.
- image/BMP: REAL decode via stdlib ``struct`` parsing (``bmp_decode``) —
  uncompressed 8/24/32-bit DIBs, bottom-up or top-down, row padding
  handled; features are dimensions + per-channel means + band luminances.
- other images, video, non-WAV audio: STUBBED — the sandbox ships no codec
  libraries (no PIL/cv2/imageio/librosa/av); ``fake_decode`` derives
  deterministic pseudo-features from the md5 of the payload so the
  plumbing is testable end-to-end (and oracle-checkable: the driver
  contract query ``media_features`` reproduces them in DuckDB). Swap in a
  real decoder by passing ``decode_fn`` in production.

The default ``auto_decode`` dispatches on container magic bytes: RIFF/WAVE
and BM payloads take the real paths, everything else the deterministic
fake.

At 100 TB: binary payloads dominate row size, so media tables must set
``spark.sql.files.maxPartitionBytes`` low enough that one Arrow batch of
rows (payload bytes x maxRecordsPerBatch) fits executor memory; the helper
``media_read_conf`` returns the suggested conf for a target batch budget.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats derived
    from the md5 of the payload. Replace with a real decode+embed in prod."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def wav_decode(payload: bytes) -> np.ndarray:
    """REAL audio decode for RIFF/WAVE payloads (stdlib ``wave``): FEATURE_DIM
    floats = [duration_s, n_channels, sample_rate/1e5, global RMS] + 12
    windowed RMS values. 8-bit and 16-bit PCM supported; anything else raises
    (callers fall back to fake_decode)."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        ch = w.getnchannels()
        sr = w.getframerate()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    dur = n / sr if sr else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    win_rms = [
        float(np.sqrt(np.mean(c * c))) if c.size else 0.0
        for c in np.array_split(x, FEATURE_DIM - 4)
    ]
    return np.array([dur, float(ch), sr / 1e5, rms] + win_rms, dtype=np.float32)


def bmp_decode(payload: bytes) -> np.ndarray:
    """REAL image decode for BMP payloads (pure stdlib ``struct``):
    uncompressed (BI_RGB) 8-bit grayscale-palette-free, 24-bit BGR, or
    32-bit BGRA DIBs; bottom-up (positive height) or top-down (negative),
    4-byte row padding. FEATURE_DIM floats =
    [width, height, bits-per-pixel, mean_B, mean_G, mean_R] + 10 horizontal
    band mean luminances ((B+G+R)/3/255, top band first). Anything the
    parser doesn't support raises (callers fall back to fake_decode)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32) or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h_abs = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, offset=data_off,
                       count=stride * h_abs)
    rows = px.reshape(h_abs, stride)[:, : w * nch]
    if not top_down:
        rows = rows[::-1]  # bottom-up storage -> top-first
    img = rows.reshape(h_abs, w, nch).astype(np.float64)
    if nch == 1:
        bgr = np.repeat(img, 3, axis=2)
    else:
        bgr = img[:, :, :3]  # drop alpha for 32-bit
    means = bgr.reshape(-1, 3).mean(axis=0) / 255.0
    lum = bgr.mean(axis=(1, 2)) / 255.0  # per-row luminance
    bands = [
        float(np.mean(c)) if c.size else 0.0
        for c in np.array_split(lum, FEATURE_DIM - 6)
    ]
    return np.array(
        [float(w), float(h_abs), float(bpp), means[0], means[1], means[2]]
        + bands,
        dtype=np.float32,
    )


def ppm_decode(payload: bytes) -> np.ndarray:
    """REAL image decode for binary PPM (P6) payloads: ASCII header
    (magic, width, height, maxval; '#' comments allowed) then raw RGB
    triplets. Same feature layout as bmp_decode —
    [width, height, bits-per-pixel(=24), mean_B, mean_G, mean_R] + 10 band
    luminances — so downstream consumers are container-agnostic."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # tokenize header: magic, width, height, maxval (comments to EOL)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM (w={w}, h={h}, maxval={maxval})")
    px = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=w * h * 3)
    img = px.reshape(h, w, 3).astype(np.float64) * (255.0 / maxval)
    rgb = img  # PPM stores RGB; features use the BGR mean order bmp uses
    means = rgb.reshape(-1, 3).mean(axis=0) / 255.0  # [R, G, B]
    lum = rgb.mean(axis=(1, 2)) / 255.0
    bands = [
        float(np.mean(c)) if c.size else 0.0
        for c in np.array_split(lum, FEATURE_DIM - 6)
    ]
    return np.array(
        [float(w), float(h), 24.0, means[2], means[1], means[0]] + bands,
        dtype=np.float32,
    )


def make_bmp(width: int, height: int, pixels_rgb) -> bytes:
    """Serialize a 24-bit bottom-up BMP from ``pixels_rgb`` — an iterable of
    rows (top-first) of (r, g, b) tuples. Deterministic; used by tests and
    the contract-query fixture (and doubles as the write path a real media
    sink would use)."""
    import struct

    rows = [list(r) for r in pixels_rgb]
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in row) + pad
        for row in reversed(rows)  # bottom-up
    )
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    return header + dib + body


def auto_decode(payload: bytes) -> np.ndarray:
    """Default decoder: dispatch on container magic. RIFF/WAVE -> real stdlib
    decode; other formats have no codec in this image -> deterministic fake."""
    if (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        try:
            return wav_decode(payload)
        except Exception:
            return fake_decode(payload)
    if payload is not None and len(payload) >= 54 and payload[:2] == b"BM":
        try:
            return bmp_decode(payload)
        except Exception:
            return fake_decode(payload)
    if payload is not None and payload[:2] == b"P6":
        try:
            return ppm_decode(payload)
        except Exception:
            return fake_decode(payload)
    return fake_decode(payload)


def extract_media_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """payload -> feature vector via mapInPandas. Output: (media_id, kind,
    n_bytes, features array<float>). Batches iterate lazily so only one Arrow
    batch of payloads is resident per worker at a time."""
    decode = decode_fn or auto_decode
    out_schema = "media_id long, kind string, n_bytes int, features array<float>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in decode(p)] if p is not None else None
                for p in pdf["payload"].tolist()
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(gen, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: expands each video row into one row per
    sampled frame offset (real decode NotImplemented; offsets computed from
    metadata so partition fan-out is realistic)."""
    out_schema = "media_id long, frame_ms int, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_ms": [], "frame": []}
            for mid, kind, dur in zip(pdf["media_id"], pdf["kind"], pdf["duration_ms"]):
                if kind != "video" or dur is None:
                    continue
                for off in range(0, int(dur), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ms"].append(off)
                    rows["frame"].append(None)  # real decoder would put frame bytes
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=out_schema)


def media_read_conf(avg_payload_bytes: int, budget_bytes: int = 256 << 20) -> dict:
    """Suggested confs so one scan partition of media rows fits the budget."""
    rows_per_batch = max(1, budget_bytes // max(1, avg_payload_bytes) // 4)
    return {
        "spark.sql.files.maxPartitionBytes": str(budget_bytes),
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(rows_per_batch),
    }
