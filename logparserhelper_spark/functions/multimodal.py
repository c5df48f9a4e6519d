"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested; the actual media decode
is STUBBED (the sandbox image ships no codec libraries). ``decode_fn``
defaults to a deterministic fake that derives "features" from the byte
content, so tests pin the plumbing end-to-end; swap in a real decoder
(PIL/librosa/av) by passing ``decode_fn`` in production.

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


def extract_media_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """payload -> feature vector via mapInPandas. Output: (media_id, kind,
    n_bytes, features array<float>). Batches iterate lazily so only one Arrow
    batch of payloads is resident per worker at a time."""
    decode = decode_fn or fake_decode
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
