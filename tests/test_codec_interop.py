"""Wire-format interop for the from-scratch codecs (VERDICT r02 item 5):
decode byte streams the repo's own encoders NEVER produce.

The PNG vectors come from an INDEPENDENT writer defined here (plain-int
filter math, stored/low-level deflate, split IDAT, ancillary chunks,
forced filter types — every one a shape encode_png never emits: the
encoder always writes one IDAT at zlib level 6 with MSAD-chosen
filters).  The JPEG vectors are post-processed streams exercising
T.81 wire freedoms (0xFF fill bytes before markers, standalone TEM)
plus malformed streams that must die with ValueError, not
KeyError/IndexError (ADVICE r02).
"""

from __future__ import annotations

import itertools
import struct
import zlib

import numpy as np
import pytest

from doc_ocr_spark.core.jpeg import decode_jpeg, encode_jpeg
from doc_ocr_spark.core.media import decode_png

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def write_png_independent(
    px: np.ndarray,
    filters: list[int],
    idat_split: int = 1,
    level: int = 0,
    ancillary: bool = False,
) -> bytes:
    """Minimal independent PNG writer: per-row filter forced from the
    ``filters`` cycle, deflate at the given level (0 = stored blocks),
    IDAT split across ``idat_split`` chunks, optional gAMA/tEXt chunks
    interleaved.  Shares no code with encode_png beyond the PNG spec."""
    h, w, _ = px.shape
    img = px.tolist()
    raw = bytearray()
    prev = [[0, 0, 0] for _ in range(w)]
    for y, f in zip(range(h), itertools.cycle(filters)):
        raw.append(f)
        row = img[y]
        left = [0, 0, 0]
        for x in range(w):
            up = prev[x]
            ul = prev[x - 1] if x else [0, 0, 0]
            for ch in range(3):
                v = row[x][ch]
                if f == 0:
                    fb = v
                elif f == 1:
                    fb = v - left[ch]
                elif f == 2:
                    fb = v - up[ch]
                elif f == 3:
                    fb = v - ((left[ch] + up[ch]) >> 1)
                else:
                    fb = v - _paeth(left[ch], up[ch], ul[ch])
                raw.append(fb & 255)
            left = row[x]
        prev = row
    comp = zlib.compressobj(level)
    data = comp.compress(bytes(raw)) + comp.flush()
    per = (len(data) + idat_split - 1) // idat_split
    out = PNG_MAGIC + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    )
    if ancillary:
        out += _chunk(b"gAMA", struct.pack(">I", 45455))
    for k in range(idat_split):
        out += _chunk(b"IDAT", data[k * per : (k + 1) * per])
        if ancillary and k == 0:
            out += _chunk(b"tEXt", b"Software\x00not-our-encoder")
    return out + _chunk(b"IEND", b"")


def _px(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "filters,split,level,anc",
    [
        ([0], 1, 0, False),          # stored deflate blocks
        ([1], 1, 9, False),          # all-Sub, max compression
        ([2], 3, 0, True),           # all-Up, split IDAT + ancillary
        ([3], 1, 1, False),          # all-Average
        ([4], 2, 0, True),           # all-Paeth, split + ancillary
        ([0, 1, 2, 3, 4], 4, 0, True),  # cycling filters, 4-way split
    ],
)
def test_png_decodes_foreign_wire_shapes(filters, split, level, anc):
    px = _px(13, 11)
    payload = write_png_independent(
        px, filters, idat_split=split, level=level, ancillary=anc
    )
    assert np.array_equal(decode_png(payload), px)


def test_png_gradient_exercises_every_filter_prediction():
    # smooth gradient: Sub/Average/Paeth predictions are non-trivial
    y, x = np.mgrid[0:20, 0:17]
    px = np.stack([(y * 7) % 256, (x * 11) % 256, (y + x) % 256], axis=2).astype(
        np.uint8
    )
    for f in range(5):
        payload = write_png_independent(px, [f], level=0)
        assert np.array_equal(decode_png(payload), px), f"filter {f}"


def test_png_bad_crc_raises():
    payload = bytearray(write_png_independent(_px(4, 4), [0]))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


# ---------------------------------------------------------------------------
# JPEG


def test_jpeg_fill_bytes_and_tem_markers_decode_identically():
    """T.81 B.1.1.2: fill bytes (0xFF) may precede any marker; TEM
    (0xFF01) is a standalone marker.  Our encoder never emits either —
    inject both and require bit-identical decode."""
    px = _px(24, 17, seed=3)
    enc = encode_jpeg(px, 85)
    base = decode_jpeg(enc)
    # after SOI: TEM marker, then a fill byte glued to the next marker
    variant = enc[:2] + b"\xff\x01" + b"\xff" + enc[2:]
    assert np.array_equal(decode_jpeg(variant), base)
    # fill bytes in front of EVERY pre-scan marker segment
    sos = enc.find(b"\xff\xda")
    head = enc[2:sos].replace(b"\xff", b"\xff\xff", 1)  # double first marker's FF
    assert np.array_equal(decode_jpeg(enc[:2] + head + enc[sos:]), base)


def test_jpeg_fill_bytes_with_restart_intervals():
    px = _px(32, 32, seed=5)
    enc = encode_jpeg(px, 85, subsampling="420", restart_interval=1)
    variant = enc[:2] + b"\xff\x01" + enc[2:]
    assert np.array_equal(decode_jpeg(variant), decode_jpeg(enc))


def _find_segment(enc: bytes, marker: bytes) -> tuple[int, int]:
    i = enc.find(marker)
    assert i >= 0
    (seglen,) = struct.unpack_from(">H", enc, i + 2)
    return i, 2 + seglen


def test_jpeg_missing_quant_table_is_valueerror():
    enc = encode_jpeg(_px(16, 16), 85)
    i, n = _find_segment(enc, b"\xff\xdb")
    with pytest.raises(ValueError, match="quant"):
        decode_jpeg(enc[:i] + enc[i + n :])


def test_jpeg_missing_huffman_table_is_valueerror():
    enc = bytearray(encode_jpeg(_px(16, 16), 85))
    i = enc.find(b"\xff\xda")
    enc[i + 6] = 0x33  # component 0 -> dc table 3 / ac table 3 (absent)
    with pytest.raises(ValueError, match="huffman"):
        decode_jpeg(bytes(enc))


def test_jpeg_invalid_dht_class_is_valueerror():
    # SOI + DHT whose table class is 2 (only 0/1 exist in baseline)
    with pytest.raises(ValueError, match="DHT"):
        decode_jpeg(b"\xff\xd8\xff\xc4\x00\x03\x20")


def test_jpeg_truncated_segment_is_valueerror():
    enc = encode_jpeg(_px(16, 16), 85)
    i, n = _find_segment(enc, b"\xff\xc0")
    with pytest.raises(ValueError):
        decode_jpeg(enc[: i + 6])  # SOF0 cut mid-segment


def test_jpeg_fill_bytes_to_eof_is_valueerror():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xff\xff")


# ---------------------------------------------------------------------------
# AVI/MJPEG container interop (VERDICT r03 item 4): foreign-structured
# RIFF files the repo's own encoder NEVER emits — encode_avi_mjpeg
# always writes hdrl(avih+strl) + one flat movi of '00dc' chunks + idx1.
# These vectors use a JUNK chunk, 'rec ' grouping LISTs, '00db' frame
# ids, stream number '01', an odd-sized chunk with pad byte, and NO
# idx1 at all.

from doc_ocr_spark.core.avi import decode_avi_mjpeg, encode_avi_mjpeg, is_avi


def _riff_chunk(ckid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return ckid + struct.pack("<I", len(body)) + body + pad


def _foreign_avi(frame_payloads: list[bytes], wrap_rec: bool, ckid: bytes) -> bytes:
    """Minimal foreign writer: JUNK before movi, optional 'rec ' LIST
    wrapping, foreign frame ckid, no hdrl detail beyond avih, no idx1."""
    avih = _riff_chunk(b"avih", struct.pack("<14I", *([0] * 14)))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + avih)
    junk = _riff_chunk(b"JUNK", b"\xab" * 7)  # odd size -> pad byte
    frames = b"".join(_riff_chunk(ckid, p) for p in frame_payloads)
    if wrap_rec:
        frames = _riff_chunk(b"LIST", b"rec " + frames)
    movi = _riff_chunk(b"LIST", b"movi" + junk + frames)
    body = b"AVI " + hdrl + junk + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mjpeg_frames(n: int, seed: int = 3) -> tuple[np.ndarray, list[bytes]]:
    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, size=(n, 16, 16, 3), dtype=np.uint8)
    return fr, [encode_jpeg(fr[k], 85) for k in range(n)]


def test_avi_foreign_layout_rec_lists_and_00db():
    fr, payloads = _mjpeg_frames(4)
    for wrap_rec in (False, True):
        for ckid in (b"00dc", b"00db", b"01dc"):
            avi = _foreign_avi(payloads, wrap_rec, ckid)
            got = decode_avi_mjpeg(avi)
            ref = np.stack([decode_jpeg(p) for p in payloads])
            assert np.array_equal(got, ref), (wrap_rec, ckid)


def test_avi_odd_sized_frame_chunk_pad_byte():
    # force an odd-length frame payload by appending a fill byte the
    # JPEG scanner tolerates before EOI handling (trailing garbage
    # after EOI is ignored by decode_jpeg's marker walk)
    fr, payloads = _mjpeg_frames(3)
    padded = [p + b"\x00" if len(p) % 2 == 0 else p for p in payloads]
    avi = _foreign_avi(padded, False, b"00dc")
    got = decode_avi_mjpeg(avi)
    ref = np.stack([decode_jpeg(p) for p in payloads])
    assert np.array_equal(got, ref)


def test_avi_roundtrip_both_jpeg_variants():
    fr, _ = _mjpeg_frames(5)
    for opts in ({}, {"subsampling": "420", "restart_interval": 2}):
        dec = decode_avi_mjpeg(encode_avi_mjpeg(fr, 90, **opts))
        ref = np.stack([decode_jpeg(encode_jpeg(fr[k], 90, **opts)) for k in range(5)])
        assert np.array_equal(dec, ref)


def test_avi_malformed_is_valueerror():
    assert not is_avi(b"RIFX1234AVI ")
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_mjpeg(b"\x89PNG\r\n\x1a\nnope")
    # RIFF/WAVE is RIFF but not AVI
    wav = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_mjpeg(wav)
    # AVI with an empty movi
    empty = _foreign_avi([], False, b"00dc")
    with pytest.raises(ValueError, match="no movi frames"):
        decode_avi_mjpeg(empty)
    # truncated chunk header inside movi
    fr, payloads = _mjpeg_frames(1)
    avi = _foreign_avi(payloads, False, b"00dc")
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(avi[:-10])


def test_avi_inconsistent_frame_dims_is_valueerror():
    rng = np.random.default_rng(5)
    a = encode_jpeg(rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), 85)
    b = encode_jpeg(rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8), 85)
    avi = _foreign_avi([a, b], False, b"00dc")
    with pytest.raises(ValueError, match="dims"):
        decode_avi_mjpeg(avi)


def test_avi_interleaved_audio_stream():
    """'01wb' PCM audio interleaved with the video frames: bit-exact
    audio round-trip, video decode unaffected, audio-less files raise."""
    from doc_ocr_spark.core.avi import decode_avi_audio

    fr, _ = _mjpeg_frames(5)
    audio = (2500 * np.sin(np.arange(4001) / 17.0)).astype(np.int16)
    avi = encode_avi_mjpeg(fr, 90, audio=audio, audio_rate=8000)
    samples, rate = decode_avi_audio(avi)
    assert rate == 8000 and np.array_equal(samples, audio)
    assert np.array_equal(decode_avi_mjpeg(avi), decode_avi_mjpeg(encode_avi_mjpeg(fr, 90)))
    with pytest.raises(ValueError, match="no audio stream"):
        decode_avi_audio(encode_avi_mjpeg(fr, 90))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_audio(b"nope")


def test_avi_foreign_audio_chunks_do_not_confuse_frame_walk():
    # foreign layout: audio-style '01wb' chunks interleaved in movi with
    # no hdrl audio declaration — frame collection must skip them
    fr, payloads = _mjpeg_frames(3)
    avih = _riff_chunk(b"avih", struct.pack("<14I", *([0] * 14)))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + avih)
    body = b""
    for p in payloads:
        body += _riff_chunk(b"00dc", p) + _riff_chunk(b"01wb", b"\x01\x02" * 33)
    movi = _riff_chunk(b"LIST", b"movi" + body)
    riff_body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    got = decode_avi_mjpeg(avi)
    ref = np.stack([decode_jpeg(p) for p in payloads])
    assert np.array_equal(got, ref)


def test_avi_idx1_offsets_follow_riff_convention():
    """ADVICE r04: idx1 offsets are relative to the 'movi' fourcc, so
    the FIRST chunk's offset is 4 (its header sits just past the
    4-byte fourcc) and every offset must land exactly on the chunk
    header its ckid names — external players that trust AVIF_HASINDEX
    seek through this table."""
    fr, _ = _mjpeg_frames(3)
    audio = np.arange(-300, 300, dtype=np.int16)
    buf = encode_avi_mjpeg(fr, 85, audio=audio)

    # walk the top-level RIFF body to find movi + idx1
    movi_fourcc_pos = idx1 = None
    pos, end = 12, 12 + struct.unpack_from("<I", buf, 4)[0] - 4
    while pos + 8 <= end:
        ckid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if ckid == b"LIST" and buf[body : body + 4] == b"movi":
            movi_fourcc_pos = body
        elif ckid == b"idx1":
            idx1 = buf[body : body + size]
        pos = body + size + (size % 2)
    assert movi_fourcc_pos is not None and idx1 is not None
    assert len(idx1) % 16 == 0 and len(idx1) // 16 == 6  # 3 video + 3 audio

    first_off = struct.unpack_from("<I", idx1, 8)[0]
    assert first_off == 4, "first chunk header sits at movi offset 4"
    for k in range(len(idx1) // 16):
        ckid = idx1[16 * k : 16 * k + 4]
        _flags, off, sz = struct.unpack_from("<3I", idx1, 16 * k + 4)
        hdr = movi_fourcc_pos + off
        assert buf[hdr : hdr + 4] == ckid, (k, ckid, off)
        assert struct.unpack_from("<I", buf, hdr + 4)[0] == sz
