"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode kernels themselves are STUBBED (image/audio libraries are not
in this environment): `decoder="fake"` produces deterministic features
from the bytes (sha-seeded), `decoder="real"` raises NotImplementedError
at the point where PIL/ffmpeg would be called.  Everything Spark-side —
schemas, batch iteration, partition sizing, UDF signatures — is real and
tested, so dropping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms long, payload binary"
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-features: bytes -> sha256 of the ASCII hex of
    the bytes -> unit-norm floats.  Stands in for a real embedding model;
    hashing the hex string (not the raw bytes) keeps the computation
    reproducible in engines whose hash functions only accept text
    (the DuckDB gate oracle mirrors it with sha256(varchar))."""
    h = hashlib.sha256((payload or b"").hex().encode("ascii")).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.float64(2**32)) - 0.5
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def decode_features(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id",
                    decoder: str = "fake") -> DataFrame:
    """binary payload -> feature vector (array<float>), Arrow-batched.
    -> (media_id, n_bytes, feature array<float>)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, not present in "
                    "this environment; use decoder='fake'"
                )
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).to_numpy(np.int64),
                    "feature": [
                        _fake_features(b if b is not None else b"").tolist()
                        for b in payloads
                    ],
                }
            )

    return df.mapInPandas(
        run, schema="media_id long, n_bytes long, feature array<float>"
    )


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  decoder: str = "fake") -> DataFrame:
    """Image resize stage: fake mode passes bytes through and records the
    target shape (the schema/partitioning contract a real PIL kernel
    would honor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("PIL not available; decoder='fake'")
            out = pdf.copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return df.mapInPandas(run, schema=df.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  payload_col: str = "payload",
                  id_col: str = "media_id",
                  duration_col: str = "duration_ms",
                  decoder: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp; fake
    mode emits a sha-derived frame token per timestamp.
    -> (media_id, ts_ms, frame binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("ffmpeg not available; decoder='fake'")
            ids, ts, frames = [], [], []
            for row in pdf.itertuples():
                dur = int(getattr(row, duration_col) or 0)
                payload = getattr(row, payload_col) or b""
                for t in range(0, max(dur, 1), every_ms):
                    ids.append(getattr(row, id_col))
                    ts.append(t)
                    frames.append(
                        hashlib.sha256(payload + t.to_bytes(8, "little")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "ts_ms": ts, "frame": frames}
            )

    return df.mapInPandas(
        run, schema="media_id long, ts_ms long, frame binary"
    )


def synth_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table in MEDIA_SCHEMA shape."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = [("image", "image/png"), ("audio", "audio/wav"),
             ("video", "video/mp4")]
    for i in range(n):
        kind, mime = kinds[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (
            1 + rng.randrange(4)
        )
        rows.append(
            (
                i, kind, mime,
                64 * (1 + i % 4) if kind != "audio" else None,
                64 * (1 + i % 3) if kind != "audio" else None,
                1000 * (1 + i % 5) if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
