"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

Decode kernels: `decoder="real"` uses the pure-stdlib codecs — PNG /
BMP / GIF pixels (imagecodec.py), baseline JPEG (jpegcodec.py,
Huffman + dequant + IDCT), WAV PCM samples (audiocodec.py), animated
GIF frame extraction — no PIL/ffmpeg needed.  Containers whose
decoding genuinely requires codec libraries absent from this
environment (progressive JPEG, MP3/FLAC/AAC audio frames, MP4/AVI
video) degrade to null rows / empty explodes, documented per kernel.
`decoder="fake"` produces deterministic sha-seeded features for
plumbing tests.  Everything Spark-side — schemas, batch iteration,
partition sizing, UDF signatures — is real and tested.
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


def _real_features(payload: bytes, dim: int = FEATURE_DIM):
    """Pixel-derived features via the pure-stdlib codecs: 8 shape/stat
    slots (w, h, channels, mean, std, min, max, aspect — all scaled to
    ~[0,1]) + an 8-bin mean-luminance histogram.  Returns None for
    payloads whose pixels are not stdlib-decodable (progressive JPEG,
    non-image bytes)."""
    from terrier_spark.datapipe.imagecodec import decode_image

    dec = decode_image(payload)
    if dec is None:
        return None
    arr, _fmt = dec
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    px = arr.astype(np.float64)
    lum = px if arr.ndim == 2 else px.mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    hist = hist / max(lum.size, 1)
    head = np.array([
        w / 4096.0, h / 4096.0, c / 4.0,
        float(px.mean()) / 255.0, float(px.std()) / 255.0,
        float(px.min()) / 255.0, float(px.max()) / 255.0,
        min(w / max(h, 1), 8.0) / 8.0,
    ])
    return np.concatenate([head, hist])[:dim].astype(np.float32)


def decode_features(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id",
                    decoder: str = "fake") -> DataFrame:
    """binary payload -> feature vector (array<float>), Arrow-batched.
    -> (media_id, n_bytes, feature array<float>).  decoder="real"
    decodes PNG/BMP/GIF/baseline-JPEG pixels and emits pixel-stat
    features; undecodable payloads get NULL features (kept, not
    dropped — curation filters on `feature IS NULL`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            if decoder == "real":
                feats = [
                    (lambda f: f.tolist() if f is not None else None)(
                        _real_features(b)
                    )
                    for b in payloads
                ]
            else:
                feats = [
                    _fake_features(b if b is not None else b"").tolist()
                    for b in payloads
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).to_numpy(np.int64),
                    "feature": feats,
                }
            )

    return df.mapInPandas(
        run, schema="media_id long, n_bytes long, feature array<float>"
    )


def image_pixel_stats(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id") -> DataFrame:
    """Real pixel decode -> per-image statistics, Arrow-batched.
    -> (media_id, format, width, height, channels, pix_sum, pix_min,
    pix_max); rows whose pixels are not stdlib-decodable yield nulls
    (kept, not dropped)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from terrier_spark.datapipe.imagecodec import decode_image

        for pdf in batches:
            recs = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                dec = decode_image(b)
                if dec is None:
                    recs.append((mid, None, None, None, None, None,
                                 None, None))
                    continue
                arr, fmt = dec
                h, w = arr.shape[:2]
                c = 1 if arr.ndim == 2 else arr.shape[2]
                recs.append((mid, fmt, w, h, c,
                             int(arr.sum(dtype=np.int64)),
                             int(arr.min()), int(arr.max())))
            out = pd.DataFrame(
                recs, columns=["media_id", "format", "width", "height",
                               "channels", "pix_sum", "pix_min", "pix_max"])
            for col in ("width", "height", "channels", "pix_min", "pix_max"):
                out[col] = pd.array(out[col], dtype="Int32")
            out["pix_sum"] = pd.array(out["pix_sum"], dtype="Int64")
            yield out

    return df.mapInPandas(
        run,
        schema="media_id long, format string, width int, height int, "
               "channels int, pix_sum long, pix_min int, pix_max int",
    )


def frame_pixel_stats(df: DataFrame, frame_col: str = "frame",
                      id_col: str = "media_id",
                      ts_col: str = "ts_ms") -> DataFrame:
    """Per-sampled-frame pixel statistics (the sample_frames companion):
    (media_id, ts_ms, frame) -> (media_id, ts_ms, width, height,
    pix_sum); undecodable frames yield nulls."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from terrier_spark.datapipe.imagecodec import decode_image

        for pdf in batches:
            recs = []
            for mid, t, b in zip(pdf[id_col], pdf[ts_col], pdf[frame_col]):
                dec = decode_image(b)
                if dec is None:
                    recs.append((mid, t, None, None, None))
                    continue
                arr, _fmt = dec
                h, w = arr.shape[:2]
                recs.append((mid, t, w, h, int(arr.sum(dtype=np.int64))))
            out = pd.DataFrame(
                recs, columns=["media_id", "ts_ms", "width", "height",
                               "pix_sum"])
            out["width"] = pd.array(out["width"], dtype="Int32")
            out["height"] = pd.array(out["height"], dtype="Int32")
            out["pix_sum"] = pd.array(out["pix_sum"], dtype="Int64")
            yield out

    return df.mapInPandas(
        run,
        schema="media_id long, ts_ms long, width int, height int, "
               "pix_sum long",
    )


def audio_pcm_stats(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """Real WAV PCM decode -> exact integer per-clip statistics,
    Arrow-batched.  -> (media_id, sample_rate, channels, n_frames,
    samp_sum, samp_min, samp_max, zero_cross); non-WAV payloads yield
    nulls (kept, not dropped)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from terrier_spark.datapipe.audiocodec import audio_stats, decode_audio

        for pdf in batches:
            recs = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                dec = decode_audio(b)
                if dec is None:
                    recs.append((mid,) + (None,) * 7)
                    continue
                samples, rate = dec
                s = audio_stats(samples.astype(np.int64)
                                if samples.dtype.kind == "i" else
                                np.round(samples * 32767).astype(np.int64))
                recs.append((mid, rate, s["channels"], s["n_frames"],
                             s["samp_sum"], s["samp_min"], s["samp_max"],
                             s["zero_cross"]))
            out = pd.DataFrame(
                recs, columns=["media_id", "sample_rate", "channels",
                               "n_frames", "samp_sum", "samp_min",
                               "samp_max", "zero_cross"])
            for col in ("sample_rate", "channels", "zero_cross"):
                out[col] = pd.array(out[col], dtype="Int32")
            for col in ("n_frames", "samp_sum", "samp_min", "samp_max"):
                out[col] = pd.array(out[col], dtype="Int64")
            yield out

    return df.mapInPandas(
        run,
        schema="media_id long, sample_rate int, channels int, "
               "n_frames long, samp_sum long, samp_min long, "
               "samp_max long, zero_cross int",
    )


def audio_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Real WAV decode -> float features for curation/similarity:
    duration_ms, RMS and peak of the [-1,1]-normalized channel-0
    signal, zero-crossing rate (per second), and the FFT spectral
    centroid in Hz.  Non-WAV payloads yield nulls."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from terrier_spark.datapipe.audiocodec import decode_audio

        for pdf in batches:
            recs = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                dec = decode_audio(b)
                if dec is None:
                    recs.append((mid,) + (None,) * 5)
                    continue
                samples, rate = dec
                x = samples[:, 0].astype(np.float64)
                if samples.dtype.kind == "i":
                    # normalize by the implied full-scale of the data
                    scale = float(max(np.abs(x).max(initial=1), 1))
                    x = x / scale
                dur = samples.shape[0] * 1000.0 / rate
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                peak = float(np.abs(x).max(initial=0.0))
                neg = x < 0
                zcr = (float(np.count_nonzero(neg[:-1] != neg[1:]))
                       * rate / max(x.size, 1))
                if x.size >= 2:
                    mag = np.abs(np.fft.rfft(x))
                    freqs = np.fft.rfftfreq(x.size, d=1.0 / rate)
                    tot = float(mag.sum())
                    centroid = float((freqs * mag).sum() / tot) if tot else 0.0
                else:
                    centroid = 0.0
                recs.append((mid, dur, rms, peak, zcr, centroid))
            out = pd.DataFrame(
                recs, columns=["media_id", "duration_ms", "rms", "peak",
                               "zcr_hz", "spectral_centroid_hz"])
            yield out

    return df.mapInPandas(
        run,
        schema="media_id long, duration_ms double, rms double, "
               "peak double, zcr_hz double, spectral_centroid_hz double",
    )


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  decoder: str = "fake") -> DataFrame:
    """Image resize stage.  decoder="real": decode PNG/BMP/GIF/JPEG pixels
    (imagecodec.py), nearest-neighbor resample to (width, height), and
    re-encode as PNG — payload/mime/dims all updated; rows whose pixels
    are not stdlib-decodable pass through unchanged (filter on
    mime != 'image/png' afterwards to find them).  Fake mode passes the
    bytes through and records the target shape (the original plumbing
    contract, kept for tests)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from terrier_spark.datapipe.imagecodec import (
            decode_image,
            encode_png,
            resize_nearest,
        )

        for pdf in batches:
            out = pdf.copy()
            if decoder == "real":
                new_payload, new_mime, new_w, new_h = [], [], [], []
                for b, mime, w0, h0 in zip(out[payload_col], out["mime"],
                                           out["width"], out["height"]):
                    dec = decode_image(b)
                    if dec is None:   # pass through, dims untouched
                        new_payload.append(b)
                        new_mime.append(mime)
                        new_w.append(w0)
                        new_h.append(h0)
                    else:
                        arr = resize_nearest(dec[0], width, height)
                        new_payload.append(bytearray(encode_png(arr)))
                        new_mime.append("image/png")
                        new_w.append(width)
                        new_h.append(height)
                out[payload_col] = new_payload
                out["mime"] = new_mime
                out["width"] = pd.array(new_w, dtype="Int32")
                out["height"] = pd.array(new_h, dtype="Int32")
            else:
                out["width"] = np.int32(width)
                out["height"] = np.int32(height)
            yield out

    return df.mapInPandas(run, schema=df.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  payload_col: str = "payload",
                  id_col: str = "media_id",
                  duration_col: str = "duration_ms",
                  decoder: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp
    -> (media_id, ts_ms, frame binary).

    decoder="real" decodes ANIMATED GIF payloads (the one video-ish
    container with a pure-stdlib path, imagecodec.decode_gif_frames):
    the frame visible at each sampled timestamp is composited and
    re-encoded as PNG.  Payloads that are not animated GIFs (MP4/AVI
    need real video codecs absent from this environment) produce ZERO
    rows — frame sampling is an explode, so "undecodable" is an empty
    explode; left-join against the input to find skipped media.
    Fake mode emits a sha-derived frame token per timestamp (plumbing
    tests)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from terrier_spark.datapipe.imagecodec import (
            decode_gif_frames,
            encode_png,
        )

        for pdf in batches:
            ids, ts, frames = [], [], []
            for row in pdf.itertuples():
                payload = getattr(row, payload_col) or b""
                if decoder == "real":
                    try:
                        seq = decode_gif_frames(bytes(payload))
                    except ValueError:
                        continue
                    starts = np.cumsum([0] + [d for d, _ in seq[:-1]])
                    total = int(starts[-1] + seq[-1][0])
                    png_cache: dict = {}
                    for t in range(0, max(total, 1), every_ms):
                        k = int(np.searchsorted(starts, t, side="right") - 1)
                        if k not in png_cache:
                            png_cache[k] = encode_png(seq[k][1])
                        ids.append(getattr(row, id_col))
                        ts.append(t)
                        frames.append(png_cache[k])
                else:
                    dur = int(getattr(row, duration_col) or 0)
                    for t in range(0, max(dur, 1), every_ms):
                        ids.append(getattr(row, id_col))
                        ts.append(t)
                        frames.append(
                            hashlib.sha256(
                                payload + t.to_bytes(8, "little")
                            ).digest()
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
