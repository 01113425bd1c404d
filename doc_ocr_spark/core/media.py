"""Multimodal payload kernels: decode / feature-extract / resize /
frame-sample over opaque binary columns.

Mirrors the reference's image stage (preprocess.py:150-167 decode,
:243-256 rotate/resize) re-expressed for the corpus engine: media is an
opaque ``binary`` column with typed metadata; per-batch numpy kernels do
the work (SURVEY.md §2.2).

Codec policy for this environment (no PIL/cv2/ffmpeg — intentional):
- images: PNG (8-bit RGB, stdlib zlib), baseline JPEG (core/jpeg.py)
  and PPM (P6) — all from scratch
- audio:  WAV PCM16 — stdlib ``wave`` + numpy
- video:  no codec available -> ``decode_video`` raises
  NotImplementedError; ``fake_video_frames`` provides the deterministic
  stand-in the Spark plumbing is tested with (real decode slots in
  behind the same signature).

All functions are pure; generators are seeded.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# Image: PPM P6


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PPM P6 bytes."""
    h, w, c = pixels.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 bytes -> (h, w, 3) uint8.  From-scratch parser: magic,
    whitespace/comment-tolerant header, raw RGB."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def image_features(pixels: np.ndarray) -> dict:
    """Mean channel values + 4-bin luma histogram (deterministic)."""
    means = pixels.reshape(-1, 3).mean(axis=0)
    luma = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    )
    hist, _ = np.histogram(luma, bins=4, range=(0.0, 256.0))
    return {
        "height": int(pixels.shape[0]),
        "width": int(pixels.shape[1]),
        "mean_r": round(float(means[0]), 4),
        "mean_g": round(float(means[1]), 4),
        "mean_b": round(float(means[2]), 4),
        "luma_hist": [int(x) for x in hist],
    }


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy index math)."""
    h, w, _ = pixels.shape
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[rows][:, cols]


# ---------------------------------------------------------------------------
# Image: PNG (8-bit RGB truecolor), from scratch on stdlib zlib.
#
# Real wire format for the S4/multimodal path (reference consumes
# PNG/JPEG, invoice.py:13-18): chunk framing + CRC32, scanline filters
# 0-4 (None/Sub/Up/Average/Paeth) per the PNG spec.  The encoder picks
# the per-row filter by the standard minimum-sum-of-absolute-differences
# heuristic, so decoding round-trips exercise every unfilter branch.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8)."""
    h, w, c = pixels.shape
    assert c == 3
    px = pixels.astype(np.int16)
    prev = np.zeros((w, 3), dtype=np.int16)
    raw = bytearray()
    for y in range(h):
        row = px[y]
        left = np.vstack([np.zeros((1, 3), np.int16), row[:-1]])
        ul = np.vstack([np.zeros((1, 3), np.int16), prev[:-1]])
        cands = {
            0: row,
            1: row - left,
            2: row - prev,
            3: row - (left + prev) // 2,
            4: row - _paeth_pred(left, prev, ul),
        }
        best = min(
            cands,
            key=lambda k: int(np.abs(((cands[k] % 256) + 128) % 256 - 128).sum()),
        )
        raw.append(best)
        raw += (cands[best] % 256).astype(np.uint8).tobytes()
        prev = row
    head = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", head)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports 8-bit RGB (color type 2),
    no interlace; all five scanline filters; CRC-verified chunks."""
    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(_PNG_MAGIC)
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 2 or inter != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} colortype={ctype} interlace={inter})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise ValueError("bad IDAT length")
    out = np.zeros((h, w, 3), dtype=np.uint8)
    prev = np.zeros((w, 3), dtype=np.int16)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).reshape(w, 3).astype(np.int16)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) % 256
        elif ftype == 1:
            # Sub: cur[x] = line[x] + cur[x-1]  =>  prefix sum mod 256
            cur = (np.cumsum(line.astype(np.int64), axis=0) % 256).astype(np.int16)
        elif ftype in (3, 4):
            # Average/Paeth depend on the just-decoded left pixel, so the
            # x-scan is inherently sequential — but plain-int lists beat
            # per-pixel numpy scalar ops ~10x (ADVICE r02: the encoder's
            # MSAD heuristic actively picks these filters, so this loop
            # is hot for any larger image riding the kernel)
            ln = line.tolist()
            pv = prev.tolist()
            dec: list[list[int]] = []
            left = [0, 0, 0]
            for x in range(w):
                up = pv[x]
                ul = pv[x - 1] if x else [0, 0, 0]
                px3 = [0, 0, 0]
                for ch in range(3):
                    a, b, c = left[ch], up[ch], ul[ch]
                    if ftype == 3:
                        pred = (a + b) >> 1
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    px3[ch] = (ln[x][ch] + pred) & 255
                dec.append(px3)
                left = px3
            cur = np.array(dec, dtype=np.int16)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatched image decode (PNG, JPEG or PPM)."""
    if payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        from doc_ocr_spark.core.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    raise ValueError("unknown image format")


# ---------------------------------------------------------------------------
# Audio: WAV PCM16


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise ValueError("only mono PCM16 supported")
        sr = f.getframerate()
        data = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
    return data, sr


def audio_features(samples: np.ndarray, sample_rate: int, window_ms: int = 100) -> dict:
    """RMS energy overall + per fixed window (float64, rounded 4dp)."""
    x = samples.astype(np.float64)
    win = max(1, sample_rate * window_ms // 1000)
    n_win = max(1, len(x) // win)
    trimmed = x[: n_win * win].reshape(n_win, win)
    rms_w = np.sqrt((trimmed**2).mean(axis=1))
    return {
        "sample_rate": int(sample_rate),
        "n_samples": int(len(x)),
        "duration_ms": int(len(x) * 1000 // sample_rate),
        "rms": round(float(np.sqrt((x**2).mean())) if len(x) else 0.0, 4),
        "rms_windows": [round(float(v), 4) for v in rms_w],
    }


def frame_sample(samples: np.ndarray, every_n: int) -> np.ndarray:
    """Every-Nth-frame decimation (the video frame-sampling analogue on
    the 1-D signal)."""
    return samples[::every_n]


# ---------------------------------------------------------------------------
# Video: MJPEG-in-AVI (real container + real per-frame JPEG decode —
# core/avi.py over core/jpeg.py, no external codec library needed),
# plus the deterministic fake format kept for plumbing tests.


def decode_video(payload: bytes) -> np.ndarray:
    """Magic-dispatched video decode -> (n_frames, h, w, 3) uint8.

    RIFF/AVI payloads take the real Motion-JPEG path (container walk +
    per-frame baseline JPEG decode); ``FVID`` payloads take the legacy
    deterministic fake format (plumbing tests).  Other containers
    (MP4/H.264 etc.) genuinely need an external codec and raise
    ValueError naming the container."""
    from doc_ocr_spark.core.avi import decode_avi_mjpeg, is_avi

    if is_avi(payload):
        return decode_avi_mjpeg(payload)
    if payload.startswith(FAKE_VIDEO_MAGIC):
        return fake_video_frames(payload)
    raise ValueError(
        f"unsupported video container (magic {payload[:4]!r}); "
        "supported: RIFF/AVI with MJPEG frames"
    )


FAKE_VIDEO_MAGIC = b"FVID"


def encode_fake_video_frames(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 -> fake-video bytes (the format's single
    encoder — corpus builders must not duplicate the wire layout)."""
    n, h, w, c = frames.shape
    assert c == 3
    return FAKE_VIDEO_MAGIC + struct.pack("<IHH", n, h, w) + frames.tobytes()


def encode_fake_video(n_frames: int, h: int, w: int, seed: int) -> bytes:
    """Deterministic stand-in 'video': header + seeded uint8 frames."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
    return encode_fake_video_frames(frames)


def fake_video_frames(payload: bytes) -> np.ndarray:
    """(n_frames, h, w, 3) uint8 from the deterministic fake format."""
    if not payload.startswith(FAKE_VIDEO_MAGIC):
        raise ValueError("not a fake-video payload")
    n, h, w = struct.unpack_from("<IHH", payload, 4)
    data = np.frombuffer(payload, dtype=np.uint8, offset=4 + 8, count=n * h * w * 3)
    return data.reshape(n, h, w, 3)
