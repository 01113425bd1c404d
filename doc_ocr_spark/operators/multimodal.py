"""Multimodal operators: typed-binary media columns through Arrow-batched
pandas kernels (``mapInPandas`` — never per-row Python UDFs).

The media table is synthesized deterministically (no external data):
``(media_id, kind, payload binary, fmt, meta...)`` with real PNG images
(from-scratch stdlib-zlib codec, filters 0-4), legacy PPM every 4th
image, real WAV audio, and real MJPEG-in-AVI video (RIFF container +
per-frame baseline JPEG, both from scratch — core/avi.py, core/jpeg.py;
no external codec libraries involved).

Scale notes: payloads ride the same salted url/media-id hash bucketing
as html blobs; decode kernels are per-batch numpy; Arrow's
maxRecordsPerBatch caps batch bytes the same way the extraction kernel
does.

Correctness gate: every query output is scalar-celled (json/md5 for
aggregates of arrays/bytes) and ships a VALUES-literal DuckDB oracle
whose expected values are computed by an INDEPENDENT sequential path
(pure-Python feature math over the pre-encode pixel/sample arrays), so
the driver's hash compare covers decode + features end-to-end
(VERDICT r01 item 2).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_ocr_spark.core import media as M
from doc_ocr_spark.operators import values_oracle

N_MEDIA = 120
SEED = 42


def _synth_raw(i: int, seed: int = SEED) -> dict:
    """Pre-encode arrays for media item i — the input definition shared
    by the corpus builder and the independent oracle."""
    rng = np.random.default_rng((seed << 16) ^ i)
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        h, w = 16 + int(rng.integers(0, 48)), 16 + int(rng.integers(0, 48))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        return {"kind": kind, "px": px}
    if kind == "audio":
        sr = 8000
        n_samp = int(rng.integers(1600, 8000))
        t = np.arange(n_samp)
        freq = float(rng.integers(100, 800))
        samples = (3000 * np.sin(2 * np.pi * freq * t / sr)).astype(np.int16)
        return {"kind": kind, "samples": samples, "sr": sr}
    n_frames = 4 + int(rng.integers(0, 4))
    vrng = np.random.default_rng((seed << 8) ^ i)
    # 16x16 frames: one full 4:2:0 MCU, so both MJPEG wire variants
    # (444 single-segment / 420 + restart markers) are exercisable
    frames = vrng.integers(0, 256, size=(n_frames, 16, 16, 3), dtype=np.uint8)
    # interleaved mono PCM16 track (one slice per frame in the AVI) —
    # real videos carry audio; the video FEATURE oracle reads only the
    # frames, audio round-trip is unit-tested (test_multimodal.py)
    track = (2000 * np.sin(np.arange(n_frames * 800) / 23.0)).astype(np.int16)
    return {"kind": kind, "frames": frames, "audio": track}


JPEG_QUALITY = 90


def _jpeg_opts(i: int) -> dict:
    """Every second JPEG item carries the 4:2:0 + restart-interval wire
    variant so the Spark decode path exercises subsampling and RST
    resync; the others stay 4:4:4 single-segment.  JPEG slots fall on
    media ids i = 12k + 6 (always even — the image cycle is i%3==0 and
    the JPEG slot (i//3)%4==2), so the alternation keys on the JPEG
    ordinal k = i//12, not on i's parity.  Used by BOTH the corpus
    builder and the expected-row recomputation (same bytes on both
    sides)."""
    return {"subsampling": "420", "restart_interval": 2} if (i // 12) % 2 else {}


def _video_jpeg_opts(i: int) -> dict:
    """Per-video-item MJPEG frame variant: every second video item
    (video ordinal v = i // 3, videos fall on i % 3 == 2) carries the
    4:2:0 + restart-interval wire so the container path decodes both
    JPEG shapes.  Shared by the corpus builder and the expected-row
    recomputation."""
    return {"subsampling": "420", "restart_interval": 2} if (i // 3) % 2 else {}


def synth_media_rows(n: int = N_MEDIA, seed: int = SEED) -> list[dict]:
    """Deterministic media corpus: cycles image/audio/video; images
    cycle PNG / PNG / JPEG / PPM so all three decoders are exercised
    (JPEG is the lossy one — see _expected_image_rows)."""
    rows = []
    for i in range(n):
        raw = _synth_raw(i, seed)
        kind = raw["kind"]
        if kind == "image":
            slot = (i // 3) % 4
            if slot == 3:
                payload, fmt = M.encode_ppm(raw["px"]), "ppm"
            elif slot == 2:
                from doc_ocr_spark.core.jpeg import encode_jpeg

                payload, fmt = encode_jpeg(raw["px"], JPEG_QUALITY, **_jpeg_opts(i)), "jpeg"
            else:
                payload, fmt = M.encode_png(raw["px"]), "png"
        elif kind == "audio":
            payload, fmt = M.encode_wav_pcm16(raw["samples"], raw["sr"]), "wav"
        else:
            from doc_ocr_spark.core.avi import encode_avi_mjpeg

            payload = encode_avi_mjpeg(
                raw["frames"],
                JPEG_QUALITY,
                audio=raw["audio"],
                audio_rate=8000,
                **_video_jpeg_opts(i),
            )
            fmt = "mjpeg-avi"
        rows.append({"media_id": i, "kind": kind, "fmt": fmt, "payload": payload})
    return rows


MEDIA_SCHEMA = "media_id long, kind string, fmt string, payload binary"
_MEDIA_PART_FILES = 8  # part files in the materialized table
# bump whenever a codec/corpus change alters payload bytes — the cache
# key must change or a stale staged table would poison the parity gates
MEDIA_GEN_VERSION = 6  # v6: idx1 offsets fixed to the RIFF convention
# (v5: AVI video carries interleaved PCM audio)


def media_table_path(n: int = N_MEDIA, seed: int = SEED) -> str:
    """Materialize the deterministic media corpus as a PARQUET TABLE
    (VERDICT r02 item 4: the media table must be a scan like
    `documents`, not a driver-side createDataFrame list).  /root/testdata
    is read-only, so datagen writes the table once to the staging root
    (``staging.stage_root`` — env-overridable, per-user fallback) keyed
    by (generator version, n, seed).  The table is written as
    {_MEDIA_PART_FILES} part files; readers take their parallelism from
    file splits (at corpus scale, row groups), never from a hard-coded
    repartition."""
    import os

    from doc_ocr_spark import staging

    key = f"media_v{MEDIA_GEN_VERSION}_n{n}_s{seed}"

    def build(tmp: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = synth_media_rows(n, seed)
        os.makedirs(tmp, exist_ok=True)
        per = (len(rows) + _MEDIA_PART_FILES - 1) // _MEDIA_PART_FILES
        for k in range(_MEDIA_PART_FILES):
            chunk = rows[k * per : (k + 1) * per]
            table = pa.table(
                {
                    "media_id": pa.array([r["media_id"] for r in chunk], pa.int64()),
                    "kind": pa.array([r["kind"] for r in chunk], pa.string()),
                    "fmt": pa.array([r["fmt"] for r in chunk], pa.string()),
                    "payload": pa.array([r["payload"] for r in chunk], pa.binary()),
                }
            )
            pq.write_table(table, os.path.join(tmp, f"part-{k:03d}.parquet"))

    return staging.ensure_staged("media", key, build)


def media_df(spark: SparkSession, n: int = N_MEDIA) -> DataFrame:
    """Scan of the materialized media table — kind/fmt filters push down
    to the parquet reader, parallelism comes from file splits."""
    return spark.read.schema(MEDIA_SCHEMA).parquet(media_table_path(n))


# ---------------------------------------------------------------------------
# Image

IMAGE_SCHEMA = (
    "media_id long, height int, width int, mean_r double, mean_g double, "
    "mean_b double, hist_b0 int, hist_b1 int, hist_b2 int, hist_b3 int, "
    "thumb_h int, thumb_w int, thumb_md5 string"
)

IMAGE_COLS = [
    ("media_id", "BIGINT"),
    ("height", "INT"),
    ("width", "INT"),
    ("mean_r", "DOUBLE"),
    ("mean_g", "DOUBLE"),
    ("mean_b", "DOUBLE"),
    ("hist_b0", "INT"),
    ("hist_b1", "INT"),
    ("hist_b2", "INT"),
    ("hist_b3", "INT"),
    ("thumb_h", "INT"),
    ("thumb_w", "INT"),
    ("thumb_md5", "VARCHAR"),
]


def _image_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            px = M.decode_image(bytes(payload))
            feats = M.image_features(px)
            thumb = M.resize_nearest(px, 8, 8)
            h = feats["luma_hist"]
            out.append(
                {
                    "media_id": mid,
                    "height": feats["height"],
                    "width": feats["width"],
                    "mean_r": feats["mean_r"],
                    "mean_g": feats["mean_g"],
                    "mean_b": feats["mean_b"],
                    "hist_b0": h[0],
                    "hist_b1": h[1],
                    "hist_b2": h[2],
                    "hist_b3": h[3],
                    "thumb_h": thumb.shape[0],
                    "thumb_w": thumb.shape[1],
                    "thumb_md5": hashlib.md5(thumb.tobytes()).hexdigest(),
                }
            )
        yield pd.DataFrame(out)


def image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode PNG/PPM images, extract features, md5 the 8x8 thumbnail.
    Output is all-scalar (driver pandas canon requires hashable cells)."""
    imgs = media_df(spark).filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(_image_kernel, IMAGE_SCHEMA)


def _expected_image_rows() -> list[dict]:
    """Independent sequential recomputation: pure-Python feature math on
    the pre-encode pixels — no media.py decode/feature code involved, so
    a codec or feature bug on the Spark side hash-mismatches here.

    Exception: JPEG items are LOSSY, so their expected features are
    computed from the sequential decode of the payload (golden
    discipline — the codec's own correctness is unit-tested in
    tests/test_jpeg.py); the feature math stays independent."""
    rows = []
    for i in range(N_MEDIA):
        raw = _synth_raw(i)
        if raw["kind"] != "image":
            continue
        px = raw["px"]
        if (i // 3) % 4 == 2:  # JPEG slot, matching synth_media_rows
            from doc_ocr_spark.core.jpeg import decode_jpeg, encode_jpeg

            px = decode_jpeg(encode_jpeg(px, JPEG_QUALITY, **_jpeg_opts(i)))
        h, w = px.shape[0], px.shape[1]
        n = h * w
        sums = [0, 0, 0]
        hist = [0, 0, 0, 0]
        for y in range(h):
            for x in range(w):
                r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
                sums[0] += r
                sums[1] += g
                sums[2] += b
                luma = 0.299 * r + 0.587 * g + 0.114 * b
                hist[min(3, int(luma // 64.0))] += 1
        ridx = [min(h - 1, k * h // 8) for k in range(8)]
        cidx = [min(w - 1, k * w // 8) for k in range(8)]
        tb = bytearray()
        for ry in ridx:
            for cx in cidx:
                tb += bytes(
                    (int(px[ry, cx, 0]), int(px[ry, cx, 1]), int(px[ry, cx, 2]))
                )
        rows.append(
            {
                "media_id": i,
                "height": h,
                "width": w,
                "mean_r": round(sums[0] / n, 4),
                "mean_g": round(sums[1] / n, 4),
                "mean_b": round(sums[2] / n, 4),
                "hist_b0": hist[0],
                "hist_b1": hist[1],
                "hist_b2": hist[2],
                "hist_b3": hist[3],
                "thumb_h": 8,
                "thumb_w": 8,
                "thumb_md5": hashlib.md5(bytes(tb)).hexdigest(),
            }
        )
    return rows


# ---------------------------------------------------------------------------
# Audio

AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, duration_ms int, "
    "rms double, n_windows int, n_sampled_frames int"
)

AUDIO_COLS = [
    ("media_id", "BIGINT"),
    ("sample_rate", "INT"),
    ("n_samples", "INT"),
    ("duration_ms", "INT"),
    ("rms", "DOUBLE"),
    ("n_windows", "INT"),
    ("n_sampled_frames", "INT"),
]


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
    return auds.mapInPandas(_audio_kernel, AUDIO_SCHEMA)


def _expected_audio_rows() -> list[dict]:
    """Independent recomputation: exact-integer RMS math on the
    pre-encode samples (WAV decode is the code under test)."""
    rows = []
    for i in range(N_MEDIA):
        raw = _synth_raw(i)
        if raw["kind"] != "audio":
            continue
        samples, sr = raw["samples"], raw["sr"]
        n = len(samples)
        sq = sum(int(s) * int(s) for s in samples)
        win = sr * 100 // 1000
        rows.append(
            {
                "media_id": i,
                "sample_rate": sr,
                "n_samples": n,
                "duration_ms": n * 1000 // sr,
                "rms": round(math.sqrt(sq / n), 4),
                "n_windows": max(1, n // win),
                "n_sampled_frames": (n + 9) // 10,
            }
        )
    return rows


# ---------------------------------------------------------------------------
# Video

VIDEO_SCHEMA = "media_id long, n_frames int, frame_h int, frame_w int, sampled_frames int, mean_px double"

VIDEO_COLS = [
    ("media_id", "BIGINT"),
    ("n_frames", "INT"),
    ("frame_h", "INT"),
    ("frame_w", "INT"),
    ("sampled_frames", "INT"),
    ("mean_px", "DOUBLE"),
]


def _video_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            # real decode: RIFF/AVI container walk + per-frame baseline
            # JPEG (core/avi.py); the FVID fake format stays accepted
            # for plumbing tests
            frames = M.decode_video(bytes(payload))
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
    """Decode REAL MJPEG/AVI video payloads (RIFF container walk +
    per-frame baseline JPEG via the from-scratch codecs in core/avi.py
    and core/jpeg.py) and sample every 2nd frame."""
    vids = media_df(spark).filter(F.col("kind") == "video").select("media_id", "payload")
    return vids.mapInPandas(_video_kernel, VIDEO_SCHEMA)


def _expected_video_rows() -> list[dict]:
    """Independent sequential recomputation.  MJPEG is LOSSY, so frame
    pixels come from the sequential decode of each frame's OWN JPEG
    round-trip (same golden discipline as the JPEG still images; the
    codec itself is unit-tested in tests/test_jpeg.py) — but WITHOUT
    touching the AVI container code: the Spark side must walk the real
    container to reach the same bytes."""
    from doc_ocr_spark.core.jpeg import decode_jpeg, encode_jpeg

    rows = []
    for i in range(N_MEDIA):
        raw = _synth_raw(i)
        if raw["kind"] != "video":
            continue
        frames = raw["frames"]
        nf = frames.shape[0]
        opts = _video_jpeg_opts(i)
        dec = [
            decode_jpeg(encode_jpeg(frames[k], JPEG_QUALITY, **opts))
            for k in range(nf)
        ]
        total = sum(int(d.sum()) for d in dec)
        size = sum(d.size for d in dec)
        rows.append(
            {
                "media_id": i,
                "n_frames": nf,
                "frame_h": 16,
                "frame_w": 16,
                "sampled_frames": (nf + 1) // 2,
                "mean_px": round(total / size, 4),
            }
        )
    return rows


def _oracles() -> dict[str, str]:
    return {
        "image_decode_features": values_oracle(IMAGE_COLS, _expected_image_rows()),
        "audio_decode_features": values_oracle(AUDIO_COLS, _expected_audio_rows()),
        "video_frame_sample": values_oracle(VIDEO_COLS, _expected_video_rows()),
    }


ORACLES = _oracles  # lazy: see __spark_entry__.oracle_sql

QUERIES = {
    "image_decode_features": image_decode_features,
    "audio_decode_features": audio_decode_features,
    "video_frame_sample": video_frame_sample,
}
