"""From-scratch baseline JPEG codec (core/jpeg.py): transform-layer
inverses, entropy-layer exactness, lossy-bound roundtrips, wire-format
conformance points, and error paths."""

import struct

import numpy as np
import pytest

from doc_ocr_spark.core import jpeg as J


def test_dct_idct_are_inverses():
    rng = np.random.default_rng(1)
    for _ in range(5):
        b = rng.uniform(-128, 127, size=(8, 8))
        assert np.abs(J._idct(J._fdct(b)) - b).max() < 1e-9


def test_zigzag_is_a_permutation_with_spec_prefix():
    assert sorted(J.ZIGZAG) == [(i, j) for i in range(8) for j in range(8)]
    # T.81 figure 5 first entries
    assert J.ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]


def test_huffman_tables_are_canonical_spec_codes():
    # Annex K.3.1: DC luminance category codes
    dc = J._ENC_TABLES[("dc", 0)]
    assert dc[0] == (0b00, 2)
    assert dc[1] == (0b010, 3)
    assert dc[5] == (0b110, 3)
    assert dc[11] == (0b111111110, 9)
    # K.3.2: AC luminance EOB=1010(4), ZRL=11111111001(11)
    ac = J._ENC_TABLES[("ac", 0)]
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)


def test_magnitude_category_and_extend_roundtrip():
    for v in [-255, -128, -1, 0, 1, 7, 8, 127, 255, -32, 1023]:
        s, bits = J._magnitude(v)
        assert J._extend(bits, s) == v


def test_flat_image_roundtrips_exactly():
    flat = np.full((16, 24, 3), 130, dtype=np.uint8)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(flat, 90)), flat)


def test_gradient_roundtrip_bounded_and_compresses():
    g = (
        np.arange(32)[:, None, None] * 4
        + np.arange(40)[None, :, None] * 3
        + np.arange(3)[None, None, :] * 10
    ).astype(np.uint8)
    enc = J.encode_jpeg(g, quality=95)
    dec = J.decode_jpeg(enc)
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 16
    assert len(enc) < g.nbytes // 2


def test_noise_roundtrip_nonmultiple_of_8_dims():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(noise, quality=90))
    assert dec.shape == noise.shape
    # q=90 keeps even worst-case noise within a loose bound
    assert np.abs(dec.astype(int) - noise.astype(int)).mean() < 12


def test_encoding_is_deterministic():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(19, 22, 3), dtype=np.uint8)
    assert J.encode_jpeg(px, 85) == J.encode_jpeg(px, 85)


def test_entropy_layer_is_lossless():
    """Decode must recover EXACTLY the quantized coefficients the
    encoder emitted: re-encoding a decoded image's Y plane DC values
    must be stable (decode(encode(decode(encode(x)))) == decode(encode(x))
    would still wobble through the color transform, so instead assert
    the stronger per-file property: encode -> decode -> encode with the
    same quality is a FIXED POINT of the pixel map)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    once = J.decode_jpeg(J.encode_jpeg(px, 90))
    twice = J.decode_jpeg(J.encode_jpeg(once, 90))
    thrice = J.decode_jpeg(J.encode_jpeg(twice, 90))
    # generation loss must converge (classic JPEG fixed-point behavior)
    assert np.abs(thrice.astype(int) - twice.astype(int)).max() <= np.abs(
        twice.astype(int) - once.astype(int)
    ).max()


def _entropy_roundtrip(blocks: list[list[int]], tclass: int) -> list[list[int]]:
    """Huffman-encode a sequence of zigzagged coefficient blocks and
    decode them back (the encoder/decoder primitives directly)."""
    w = J._BitWriter()
    pred = 0
    for zz in blocks:
        pred = J._encode_block(w, zz, pred, tclass)
    w.flush()
    r = J._BitReader(bytes(w.out))
    dc_tab = J._DEC_TABLES[("dc", tclass)]
    ac_tab = J._DEC_TABLES[("ac", tclass)]
    out = []
    pred = 0
    for _ in blocks:
        s = J._decode_huff(r, dc_tab)
        pred += J._extend(r.read_bits(s), s)
        zz = [0] * 64
        zz[0] = pred
        k = 1
        while k < 64:
            rs = J._decode_huff(r, ac_tab)
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += rs >> 4
            zz[k] = J._extend(r.read_bits(rs & 0xF), rs & 0xF)
            k += 1
        out.append(zz)
    return out


def test_entropy_layer_roundtrips_adversarial_blocks():
    """The Huffman/DPCM/RLE layer must be EXACTLY lossless for any
    coefficient content: long zero runs (ZRL), trailing zeros (EOB),
    max-magnitude values, a lone coefficient at index 63, and random
    sparse blocks — for both table classes."""
    rng = np.random.default_rng(11)
    cases = [
        [0] * 64,                                  # all-zero (EOB right away)
        [5] + [0] * 63,                            # DC only
        [0] * 63 + [3],                            # wait: DC=0, AC63 nonzero
        [-1023] + [0] * 62 + [7],                  # big DC diff + last AC
        [1] + [0] * 16 + [2] + [0] * 16 + [-2] + [0] * 29,  # ZRL runs
        [0, 1] + [0] * 62,
    ]
    cases[2] = [0] * 64
    cases[2][0] = 0
    cases[2][63] = 3
    for _ in range(20):
        zz = [0] * 64
        for idx in rng.choice(64, size=rng.integers(1, 12), replace=False):
            zz[int(idx)] = int(rng.integers(-1023, 1024))
        cases.append(zz)
    for tclass in (0, 1):
        got = _entropy_roundtrip(cases, tclass)
        assert got == cases, f"entropy roundtrip mismatch (class {tclass})"


def test_wire_format_markers():
    enc = J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), 90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in enc[:30]
    # SOF0 present with 8-bit precision, 3 components, 4:4:4
    i = enc.find(b"\xff\xc0")
    assert i > 0
    prec, h, w, nc = enc[i + 4], *struct.unpack_from(">HH", enc, i + 5), enc[i + 9]
    assert (prec, h, w, nc) == (8, 8, 8, 3)
    # no bare 0xFF bytes inside the entropy scan (byte stuffing)
    sos = enc.find(b"\xff\xda")
    scan = enc[sos + 14 : -2]
    j = 0
    while j < len(scan) - 1:
        if scan[j] == 0xFF:
            assert scan[j + 1] == 0x00, "unstuffed 0xFF in scan"
            j += 2
        else:
            j += 1


def test_error_paths():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x89PNG....")
    flat = J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), 90)
    with pytest.raises(ValueError):
        J.decode_jpeg(flat[:30])  # truncated mid-segment
    with pytest.raises(ValueError):
        J.decode_jpeg(flat[:-40])  # truncated scan


def test_media_dispatch_and_corpus_include_jpeg():
    from doc_ocr_spark.core import media as M
    from doc_ocr_spark.operators import multimodal as mm

    px = np.full((8, 8, 3), 99, dtype=np.uint8)
    assert np.array_equal(M.decode_image(J.encode_jpeg(px, 90)), px)
    fmts = {r["fmt"] for r in mm.synth_media_rows(48) if r["kind"] == "image"}
    assert fmts == {"png", "jpeg", "ppm"}


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 5 % 256), (y * 3 % 256), ((x + y) * 2 % 256)], axis=2)
    return (px // 4 + 100).astype(np.uint8)


def test_subsampled_roundtrip_bounded():
    """4:2:0 / 4:2:2 on smooth content: box-mean downsample +
    replication upsample keeps the reconstruction within a couple of
    levels; dims that aren't MCU multiples exercise the padding."""
    px = _smooth(37, 29)
    for sub in ("422", "420"):
        dec = J.decode_jpeg(J.encode_jpeg(px, 95, subsampling=sub))
        assert dec.shape == px.shape
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 4


def test_sof_declares_sampling_factors():
    enc = J.encode_jpeg(_smooth(16, 16), 90, subsampling="420")
    sof = enc.find(b"\xff\xc0")
    # first component (Y): id=1, hv byte 0x22 for 2x2
    assert enc[sof + 11] == 0x22
    assert enc[sof + 14] == 0x11  # Cb 1x1


def test_restart_markers_roundtrip_and_wire():
    px = _smooth(48, 40)
    enc = J.encode_jpeg(px, 95, restart_interval=3)
    assert b"\xff\xdd" in enc  # DRI segment
    assert b"\xff\xd0" in enc  # at least RST0 (30 MCUs / 3 > 8 wraps)
    assert b"\xff\xd7" in enc  # sequence wraps 0..7
    dec = J.decode_jpeg(enc)
    # restart resets predictors — result must equal the no-restart decode
    assert np.array_equal(dec, J.decode_jpeg(J.encode_jpeg(px, 95)))


def test_restart_out_of_sequence_raises():
    enc = J.encode_jpeg(_smooth(32, 32), 90, restart_interval=2)
    i = enc.find(b"\xff\xd0")
    bad = enc[: i + 1] + bytes([0xD5]) + enc[i + 2 :]
    with pytest.raises(ValueError, match="out of sequence"):
        J.decode_jpeg(bad)


def test_default_path_unchanged_by_generalization():
    """The generalized MCU encoder at defaults must keep emitting the
    exact historical 4:4:4 single-block-MCU stream (corpus oracles
    depend on encode determinism)."""
    px = _smooth(17, 23)
    enc = J.encode_jpeg(px, 85)
    sof = enc.find(b"\xff\xc0")
    assert enc[sof + 11] == 0x11 and b"\xff\xdd" not in enc
    assert np.array_equal(J.decode_jpeg(enc), J.decode_jpeg(J.encode_jpeg(px, 85)))


def test_invalid_subsampling_and_truncated_dri_raise_valueerror():
    px = _smooth(8, 8)
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_jpeg(px, 90, subsampling="411")
    enc = J.encode_jpeg(px, 90, restart_interval=4)
    i = enc.find(b"\xff\xdd")
    # shrink the DRI segment to an empty body (declared len 2)
    bad = enc[:i + 2] + b"\x00\x02" + enc[i + 6:]
    with pytest.raises(ValueError, match="truncated DRI"):
        J.decode_jpeg(bad)


def test_media_corpus_carries_both_jpeg_wire_variants():
    from doc_ocr_spark.operators import multimodal as mm

    jp = [r["payload"] for r in mm.synth_media_rows(120) if r["fmt"] == "jpeg"]
    with_dri = [p for p in jp if b"\xff\xdd" in p]
    assert with_dri and len(with_dri) < len(jp)
