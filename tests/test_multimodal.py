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


def test_video_decode_is_stubbed_fake_works():
    with pytest.raises(NotImplementedError):
        M.decode_video(b"\x00\x01realvideo")
    payload = M.encode_fake_video(5, 4, 6, seed=7)
    frames = M.fake_video_frames(payload)
    assert frames.shape == (5, 4, 6, 3)
    assert np.array_equal(frames, M.fake_video_frames(payload))


def test_synth_media_deterministic():
    a = mm.synth_media_rows(12)
    b = mm.synth_media_rows(12)
    assert [r["payload"] for r in a] == [r["payload"] for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def _expected_image(rows):
    out = {}
    for r in rows:
        if r["kind"] != "image":
            continue
        px = M.decode_ppm(r["payload"])
        f = M.image_features(px)
        out[r["media_id"]] = f
    return out


def test_image_kernel_matches_sequential(spark):
    rows = mm.synth_media_rows(30)  # prefix of the query's 120-row table
    expected = _expected_image(rows)
    got = {r.media_id: r for r in mm.image_decode_features(spark, "").collect()}
    assert set(expected) <= set(got)
    for mid, f in expected.items():
        g = got[mid]
        assert (g.height, g.width) == (f["height"], f["width"])
        assert g.mean_r == f["mean_r"] and g.luma_hist == f["luma_hist"]
        # thumbnails are valid PPMs of the declared size
        t = M.decode_ppm(bytes(g.thumb))
        assert t.shape == (g.thumb_h, g.thumb_w, 3) == (8, 8, 3)


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
        assert g.frame_h == 8 and g.frame_w == 8
        assert g.sampled_frames == (g.n_frames + 1) // 2
        assert 0.0 <= g.mean_px <= 255.0
