"""MJPEG-in-AVI video container codec, from scratch on core/jpeg.py.

Closes the repo's last media stub (VERDICT r03 item 4): the environment
has no codec libraries, but Motion-JPEG needs no new codec math — every
frame is a baseline JPEG the repo already encodes/decodes from the
public T.81 spec — so a RIFF/AVI container parser makes video decode
REAL.  The layout follows the public AVI RIFF format (Microsoft "AVI
RIFF File Reference" / OpenDML): ``RIFF('AVI ' LIST('hdrl' avih
LIST('strl' strh strf)) LIST('movi' 00dc...) idx1)``.

Reference tie-in: doc-ocr's content-type allowlist admits real media
containers (app/api/routes/invoice.py:13-18); this is the corpus-engine
equivalent for the video kind (SURVEY.md §2.2 S4).

Decoder tolerance (foreign writers): JUNK/unknown chunks skipped, frame
chunks may sit inside ``rec `` LISTs, odd-size chunks carry a pad byte,
``idx1`` is ignored (the movi walk is authoritative), and both ``xxdc``
(compressed) and ``xxdb`` frame ids are accepted.  Frames must agree on
dimensions — a mismatch raises rather than silently resampling.
"""

from __future__ import annotations

import struct

import numpy as np

from doc_ocr_spark.core.jpeg import decode_jpeg, encode_jpeg

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(ckid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return ckid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: np.ndarray,
    quality: int = 90,
    fps: int = 10,
    audio: np.ndarray | None = None,
    audio_rate: int = 8000,
    **jpeg_opts,
) -> bytes:
    """(n, h, w, 3) uint8 -> AVI bytes with one MJPEG video stream and,
    when ``audio`` (mono int16 samples) is given, an interleaved PCM
    audio stream (``01wb`` chunks, one slice per video frame — the
    standard interleave).

    ``jpeg_opts`` pass through to :func:`encode_jpeg` (subsampling,
    restart_interval), so the per-frame wire exercises the same JPEG
    variants as the still-image corpus.
    """
    n, h, w, c = frames.shape
    assert c == 3
    payloads = [encode_jpeg(frames[k], quality, **jpeg_opts) for k in range(n)]
    max_sz = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        2 if audio is not None else 1,  # dwStreams
        max_sz,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate
        0,  # dwStart
        n,  # dwLength
        max_sz,  # dwSuggestedBufferSize
        0xFFFFFFFF & -1,  # dwQuality (-1 = default)
        0,  # dwSampleSize
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        struct.unpack("<I", b"MJPG")[0],  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    strl_v = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))

    strl_a = b""
    audio_slices: list[bytes] = []
    if audio is not None:
        pcm = np.asarray(audio, dtype="<i2")
        per = (len(pcm) + n - 1) // n  # samples per video frame slice
        audio_slices = [
            pcm[k * per : (k + 1) * per].tobytes() for k in range(n)
        ]
        strh_a = struct.pack(
            "<4s4sI2H8I4h",
            b"auds",
            b"\x00\x00\x00\x00",
            0,
            0, 0,
            0,
            1,  # dwScale (1 sample)
            audio_rate,  # dwRate
            0,
            len(pcm),  # dwLength in samples
            per * 2,
            0xFFFFFFFF & -1,
            2,  # dwSampleSize (bytes per sample block)
            0, 0, 0, 0,
        )
        # WAVEFORMATEX, cbSize omitted (16-byte PCM form)
        strf_a = struct.pack(
            "<2H2I2H",
            1,  # wFormatTag = WAVE_FORMAT_PCM
            1,  # nChannels
            audio_rate,
            audio_rate * 2,  # nAvgBytesPerSec
            2,  # nBlockAlign
            16,  # wBitsPerSample
        )
        strl_a = _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a))

    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl_v + strl_a)
    movi_body = b"movi"
    idx_entries = []
    for k, p in enumerate(payloads):
        # idx1 offsets are relative to the START of the 'movi' fourcc
        # (RIFF/AVI convention: the first chunk header sits at offset 4,
        # just past the 4-byte fourcc).  movi_body begins with b"movi",
        # so len(movi_body) at append time IS the chunk-header offset;
        # the earlier ``- 4`` pointed every entry at the preceding
        # chunk's last dword (ADVICE r04 — external players that trust
        # AVIF_HASINDEX would mis-seek by 4 bytes per entry).
        idx_entries.append((b"00dc", len(movi_body), len(p)))
        movi_body += _chunk(b"00dc", p)
        if audio_slices and audio_slices[k]:
            idx_entries.append((b"01wb", len(movi_body), len(audio_slices[k])))
            movi_body += _chunk(b"01wb", audio_slices[k])
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            ckid + struct.pack("<3I", _AVIIF_KEYFRAME, off, sz)
            for ckid, off, sz in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (ckid, body_start, body_size); handles odd-size padding."""
    while pos + 8 <= end:
        ckid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"truncated AVI chunk {ckid!r}")
        yield ckid, body, size
        pos = body + size + (size % 2)


def _collect_frames(buf: bytes, pos: int, end: int, out: list) -> None:
    """Collect frame payload spans from a movi (or nested rec) body."""
    for ckid, body, size in _walk_chunks(buf, pos, end):
        if ckid == b"LIST" and buf[body : body + 4] == b"rec ":
            _collect_frames(buf, body + 4, body + size, out)
        elif ckid[2:4] in (b"dc", b"db") and ckid[:2].isdigit():
            out.append((body, size))
        # anything else inside movi (JUNK, subtitle streams) is skipped


def _audio_stream_info(payload: bytes, end: int) -> tuple[int, int] | None:
    """(stream_ordinal, sample_rate) of the first 'auds' stream, from
    the hdrl stream list; None when the file has no audio stream."""
    for ckid, body, size in _walk_chunks(payload, 12, end):
        if ckid != b"LIST" or payload[body : body + 4] != b"hdrl":
            continue
        ordinal = -1
        for ck2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
            if ck2 != b"LIST" or payload[b2 : b2 + 4] != b"strl":
                continue
            ordinal += 1
            fcc_type = None
            for ck3, b3, s3 in _walk_chunks(payload, b2 + 4, b2 + s2):
                if ck3 == b"strh":
                    fcc_type = payload[b3 : b3 + 4]
                elif ck3 == b"strf" and fcc_type == b"auds":
                    tag, nch, rate, _, _, bits = struct.unpack_from(
                        "<2H2I2H", payload, b3
                    )
                    if tag != 1 or nch != 1 or bits != 16:
                        raise ValueError(
                            f"unsupported AVI audio (tag={tag} ch={nch} bits={bits}); "
                            "only mono PCM16"
                        )
                    return ordinal, rate
    return None


def _collect_audio(buf: bytes, pos: int, end: int, ckid_want: bytes, out: list) -> None:
    for ckid, body, size in _walk_chunks(buf, pos, end):
        if ckid == b"LIST" and buf[body : body + 4] == b"rec ":
            _collect_audio(buf, body + 4, body + size, ckid_want, out)
        elif ckid == ckid_want:
            out.append((body, size))


def decode_avi_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> (mono int16 samples, sample_rate) from the first
    'auds' stream's interleaved ``NNwb`` chunks.  Raises ValueError on
    a non-AVI payload or a file without an audio stream."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)
    info = _audio_stream_info(payload, end)
    if info is None:
        raise ValueError("AVI has no audio stream")
    ordinal, rate = info
    want = b"%02dwb" % ordinal
    spans: list[tuple[int, int]] = []
    for ckid, body, size in _walk_chunks(payload, 12, end):
        if ckid == b"LIST" and payload[body : body + 4] == b"movi":
            _collect_audio(payload, body + 4, body + size, want, spans)
    pcm = b"".join(payload[b : b + s] for b, s in spans)
    return np.frombuffer(pcm, dtype="<i2"), rate


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """AVI bytes -> (n_frames, h, w, 3) uint8 via per-frame JPEG decode.

    The ``movi`` walk is authoritative (idx1 optional/ignored).  Raises
    ValueError on a non-AVI payload, a missing/empty movi list, or
    frames with inconsistent dimensions.
    """
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)
    spans: list[tuple[int, int]] = []
    for ckid, body, size in _walk_chunks(payload, 12, end):
        if ckid == b"LIST" and payload[body : body + 4] == b"movi":
            _collect_frames(payload, body + 4, body + size, spans)
    if not spans:
        raise ValueError("AVI has no movi frames")
    frames = [decode_jpeg(payload[b : b + s]) for b, s in spans]
    h, w = frames[0].shape[0], frames[0].shape[1]
    for k, f in enumerate(frames):
        if f.shape[0] != h or f.shape[1] != w:
            raise ValueError(
                f"frame {k} dims {f.shape[:2]} != stream dims {(h, w)}"
            )
    return np.stack(frames)
