"""Multimodal operators: typed-binary media columns through Arrow-batched
pandas kernels (``mapInPandas`` — never per-row Python UDFs).

The media table is synthesized deterministically (no external data):
``(media_id, kind, payload binary, fmt, meta...)`` with real PPM images
and real WAV audio (core/media.py decodes both from scratch / stdlib),
plus fake-format video payloads exercising the same plumbing as a real
codec would (decode_video itself is NotImplementedError by policy —
no codec libs in this environment).

Scale notes: payloads ride the same salted url/media-id hash bucketing
as html blobs; decode kernels are per-batch numpy; Arrow's
maxRecordsPerBatch caps batch bytes the same way the extraction kernel
does.

These queries have no SQL oracle (binary payloads never reach DuckDB);
the value-level correctness gate is tests/test_multimodal.py, which
checks kernel outputs against per-payload expected values computed
sequentially — same golden structure as the extraction kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_ocr_spark.core import media as M

N_MEDIA = 120


def synth_media_rows(n: int = N_MEDIA, seed: int = 42) -> list[dict]:
    """Deterministic media corpus: cycles image/audio/video."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng((seed << 16) ^ i)
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            h, w = 16 + int(rng.integers(0, 48)), 16 + int(rng.integers(0, 48))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, fmt = M.encode_ppm(px), "ppm"
        elif kind == "audio":
            sr = 8000
            n_samp = int(rng.integers(1600, 8000))
            t = np.arange(n_samp)
            freq = float(rng.integers(100, 800))
            samples = (3000 * np.sin(2 * np.pi * freq * t / sr)).astype(np.int16)
            payload, fmt = M.encode_wav_pcm16(samples, sr), "wav"
        else:
            payload, fmt = (
                M.encode_fake_video(
                    4 + int(rng.integers(0, 4)), 8, 8, seed=(seed << 8) ^ i
                ),
                "fake-video",
            )
        rows.append(
            {"media_id": i, "kind": kind, "fmt": fmt, "payload": payload}
        )
    return rows


def media_df(spark: SparkSession, n: int = N_MEDIA) -> DataFrame:
    return spark.createDataFrame(
        [(r["media_id"], r["kind"], r["fmt"], r["payload"]) for r in synth_media_rows(n)],
        "media_id long, kind string, fmt string, payload binary",
    )


IMAGE_SCHEMA = (
    "media_id long, height int, width int, mean_r double, mean_g double, "
    "mean_b double, luma_hist array<int>, thumb_h int, thumb_w int, "
    "thumb bytes_placeholder string"
).replace(", thumb bytes_placeholder string", ", thumb binary")


def _image_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            px = M.decode_ppm(bytes(payload))
            feats = M.image_features(px)
            thumb = M.resize_nearest(px, 8, 8)
            out.append(
                {
                    "media_id": mid,
                    **{k: feats[k] for k in ("height", "width", "mean_r", "mean_g", "mean_b", "luma_hist")},
                    "thumb_h": thumb.shape[0],
                    "thumb_w": thumb.shape[1],
                    "thumb": M.encode_ppm(thumb),
                }
            )
        yield pd.DataFrame(out)


def image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode PPM images, extract features, emit 8x8 thumbnails."""
    imgs = media_df(spark).filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.repartition(8, "media_id").mapInPandas(_image_kernel, IMAGE_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, duration_ms int, "
    "rms double, n_windows int, n_sampled_frames int"
)


def _audio_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            samples, sr = M.decode_wav(bytes(payload))
            feats = M.audio_features(samples, sr)
            sampled = M.frame_sample(samples, every_n=10)
            out.append(
                {
                    "media_id": mid,
                    "sample_rate": feats["sample_rate"],
                    "n_samples": feats["n_samples"],
                    "duration_ms": feats["duration_ms"],
                    "rms": feats["rms"],
                    "n_windows": len(feats["rms_windows"]),
                    "n_sampled_frames": len(sampled),
                }
            )
        yield pd.DataFrame(out)


def audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode WAV audio, RMS features, frame decimation."""
    auds = media_df(spark).filter(F.col("kind") == "audio").select("media_id", "payload")
    return auds.repartition(8, "media_id").mapInPandas(_audio_kernel, AUDIO_SCHEMA)


VIDEO_SCHEMA = "media_id long, n_frames int, frame_h int, frame_w int, sampled_frames int, mean_px double"


def _video_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            payload = bytes(payload)
            # real codec path is NotImplementedError by policy; the fake
            # format exercises identical plumbing (schema/batch shape)
            if payload.startswith(M.FAKE_VIDEO_MAGIC):
                frames = M.fake_video_frames(payload)
            else:
                frames = M.decode_video(payload)  # raises: no codec here
            sampled = frames[::2]
            out.append(
                {
                    "media_id": mid,
                    "n_frames": frames.shape[0],
                    "frame_h": frames.shape[1],
                    "frame_w": frames.shape[2],
                    "sampled_frames": sampled.shape[0],
                    "mean_px": round(float(frames.mean()), 4),
                }
            )
        yield pd.DataFrame(out)


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample 'video' payloads (deterministic fake format; real
    decode is a NotImplementedError stub pending a codec library)."""
    vids = media_df(spark).filter(F.col("kind") == "video").select("media_id", "payload")
    return vids.repartition(8, "media_id").mapInPandas(_video_kernel, VIDEO_SCHEMA)


# binary payloads cannot reach the DuckDB views -> rows-only contract
ORACLES: dict[str, str] = {}

QUERIES = {
    "image_decode_features": image_decode_features,
    "audio_decode_features": audio_decode_features,
    "video_frame_sample": video_frame_sample,
}
