"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested. Decode status per
modality (the accepted boundary for this image):

- audio/WAV: REAL decode via the stdlib ``wave`` module (``wav_decode``) —
  duration/channels/rate plus global and windowed RMS features.
- image, video, non-WAV audio: STUBBED — the sandbox ships no codec
  libraries (no PIL/cv2/imageio/librosa/av); ``fake_decode`` derives
  deterministic pseudo-features from the md5 of the payload so the
  plumbing is testable end-to-end (and oracle-checkable: the driver
  contract query ``media_features`` reproduces them in DuckDB). Swap in a
  real decoder by passing ``decode_fn`` in production.

The default ``auto_decode`` dispatches on container magic bytes: RIFF/WAVE
payloads take the real path, everything else the deterministic fake.

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
