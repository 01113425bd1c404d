"""Media kernels: codec round-trips, feature values, and the Spark
mapInPandas plumbing against sequentially-computed expectations."""

import numpy as np
import pytest

from doc_ocr_spark.core import media as M
from doc_ocr_spark.operators import multimodal as mm


def test_ppm_roundtrip():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(px)), px)


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError):
        M.decode_ppm(b"JFIF....")


def test_png_roundtrip_random_and_gradient():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (2, 3, 3), (16, 16, 3), (33, 47, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(M.decode_png(M.encode_png(px)), px)
    # smooth gradient drives the encoder to Sub/Up/Paeth filters
    g = (
        np.arange(40)[:, None, None] * 3
        + np.arange(50)[None, :, None] * 5
        + np.arange(3)[None, None, :]
    ).astype(np.uint8)
    enc = M.encode_png(g)
    assert np.array_equal(M.decode_png(enc), g)
    assert len(enc) < g.nbytes // 4  # filters + zlib actually compress


def test_png_decode_all_filter_types():
    """Hand-built PNG forcing every filter type 0-4 across rows."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8).astype(np.int16)
    raws = bytearray()
    prev = np.zeros((5, 3), np.int16)
    for y in range(6):
        f = y % 5
        row = px[y]
        left = np.vstack([np.zeros((1, 3), np.int16), row[:-1]])
        ul = np.vstack([np.zeros((1, 3), np.int16), prev[:-1]])
        filt = {
            0: row,
            1: row - left,
            2: row - prev,
            3: row - (left + prev) // 2,
            4: row - M._paeth_pred(left, prev, ul),
        }[f]
        raws.append(f)
        raws += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    head = struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0)
    png = (
        M._PNG_MAGIC
        + M._png_chunk(b"IHDR", head)
        + M._png_chunk(b"IDAT", zlib.compress(bytes(raws)))
        + M._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(M.decode_png(png), px.astype(np.uint8))


def test_png_rejects_corruption():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = bytearray(M.encode_png(px))
    with pytest.raises(ValueError):
        M.decode_png(b"\x89PNG\r\n\x1a\njunk")
    enc[20] ^= 0xFF  # flip a byte inside IHDR -> CRC must catch it
    with pytest.raises(ValueError):
        M.decode_png(bytes(enc))
    with pytest.raises(ValueError):
        M.decode_image(b"GIF89a....")


def test_resize_nearest_shape_and_determinism():
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = M.resize_nearest(px, 2, 2)
    assert small.shape == (2, 2, 3)
    assert np.array_equal(small, M.resize_nearest(px, 2, 2))
    # nearest-neighbour picks exact source pixels
    assert np.array_equal(small[0, 0], px[0, 0])


def test_wav_roundtrip_and_features():
    sr = 8000
    samples = (1000 * np.sin(np.arange(800) / 10.0)).astype(np.int16)
    back, sr2 = M.decode_wav(M.encode_wav_pcm16(samples, sr))
    assert sr2 == sr and np.array_equal(back, samples)
    feats = M.audio_features(back, sr)
    assert feats["n_samples"] == 800
    assert feats["duration_ms"] == 100
    assert feats["rms"] > 0


def test_video_decode_dispatch():
    """RIFF/AVI takes the real MJPEG path; FVID stays accepted for
    plumbing tests; genuinely unsupported containers raise ValueError
    naming the magic."""
    with pytest.raises(ValueError, match="unsupported video container"):
        M.decode_video(b"\x00\x01realvideo")
    payload = M.encode_fake_video(5, 4, 6, seed=7)
    frames = M.fake_video_frames(payload)
    assert frames.shape == (5, 4, 6, 3)
    assert np.array_equal(frames, M.decode_video(payload))

    from doc_ocr_spark.core.avi import encode_avi_mjpeg
    from doc_ocr_spark.core.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    fr = rng.integers(0, 256, size=(3, 16, 16, 3), dtype=np.uint8)
    dec = M.decode_video(encode_avi_mjpeg(fr, 90))
    ref = np.stack([decode_jpeg(encode_jpeg(fr[k], 90)) for k in range(3)])
    assert np.array_equal(dec, ref)


def test_synth_media_deterministic():
    a = mm.synth_media_rows(48)
    b = mm.synth_media_rows(48)
    assert [r["payload"] for r in a] == [r["payload"] for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}
    fmts = {r["fmt"] for r in a if r["kind"] == "image"}
    assert fmts == {"png", "jpeg", "ppm"}  # all three image decoders exercised


def test_image_kernel_matches_independent_oracle(spark):
    """Distributed kernel vs the pure-Python expected rows the VALUES
    oracle is built from (the same compare the driver runs)."""
    expected = {r["media_id"]: r for r in mm._expected_image_rows()}
    got = {r.media_id: r.asDict() for r in mm.image_decode_features(spark, "").collect()}
    assert set(expected) == set(got)
    for mid, f in expected.items():
        assert got[mid] == f


def test_audio_kernel_matches_sequential(spark):
    rows = [r for r in mm.synth_media_rows(30) if r["kind"] == "audio"]
    got = {r.media_id: r for r in mm.audio_decode_features(spark, "").collect()}
    for r in rows:
        samples, sr = M.decode_wav(r["payload"])
        f = M.audio_features(samples, sr)
        g = got[r["media_id"]]
        assert g.rms == f["rms"]
        assert g.n_samples == f["n_samples"]
        assert g.n_sampled_frames == len(M.frame_sample(samples, 10))


def test_video_kernel_plumbing(spark):
    got = mm.video_frame_sample(spark, "").collect()
    assert len(got) > 0
    for g in got:
        assert g.frame_h == 16 and g.frame_w == 16
        assert g.sampled_frames == (g.n_frames + 1) // 2
        assert 0.0 <= g.mean_px <= 255.0


def test_media_video_payloads_carry_decodable_audio():
    """Corpus video items are full AVI files: MJPEG frames AND an
    interleaved PCM16 audio track, both recoverable."""
    from doc_ocr_spark.core.avi import decode_avi_audio, decode_avi_mjpeg

    rows = [r for r in mm.synth_media_rows(24) if r["kind"] == "video"]
    assert rows and all(r["fmt"] == "mjpeg-avi" for r in rows)
    for r in rows:
        raw = mm._synth_raw(r["media_id"])
        frames = decode_avi_mjpeg(r["payload"])
        assert frames.shape[0] == raw["frames"].shape[0]
        samples, rate = decode_avi_audio(r["payload"])
        assert rate == 8000
        assert np.array_equal(samples, raw["audio"])
