"""Baseline JPEG (ITU-T T.81) encoder/decoder from scratch — numpy +
stdlib only.

Closes the S4 media-format gap (the reference consumes PNG/JPEG,
app/services/pipelines/invoice.py:13-18): with PNG (media.py) this
covers both reference wire formats.  Scope: baseline sequential DCT,
8-bit, 3-component YCbCr at 4:4:4, 4:2:2 or 4:2:0 (box-mean
downsample, replication upsample), one interleaved scan, restart
intervals (DRI + RST0-7), the Annex-K quantization and Huffman
tables.  The encoder and decoder
are exact inverses of each other's ENTROPY layer (Huffman/DPCM/RLE are
lossless); the DCT+quantization layer is lossy by design, so pixel
round-trips are tolerance-checked and the corpus oracle for JPEG items
is built from the sequential decode (golden discipline), not the
pre-encode pixels.

Everything is deterministic: float64 DCT with fixed summation order,
half-away-from-zero quantization, no wall clock, no randomness.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants (ITU-T T.81 Annex K)

# K.1 luminance / K.2 chrominance quantization tables (natural order)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(ij)
    return order


ZIGZAG = _zigzag_order()

# K.3 standard Huffman tables: (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2: value -> (code, length), canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_TABLES = {
    ("dc", 0): _build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
    ("dc", 1): _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ("ac", 0): _build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
    ("ac", 1): _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
}

# decoder lookup: (length, code) -> value
def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {(l, c): v for v, (c, l) in _build_codes(bits, vals).items()}


_DEC_TABLES = {
    ("dc", 0): _build_decode(DC_LUMA_BITS, DC_LUMA_VALS),
    ("dc", 1): _build_decode(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ("ac", 0): _build_decode(AC_LUMA_BITS, AC_LUMA_VALS),
    ("ac", 1): _build_decode(AC_CHROMA_BITS, AC_CHROMA_VALS),
}

# DCT basis (float64, computed once, fixed order)
_DCT_C = np.array(
    [[np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)] for u in range(8)]
)
_DCT_A = np.array([1 / np.sqrt(2)] + [1.0] * 7)


def _fdct(block: np.ndarray) -> np.ndarray:
    """8x8 forward DCT (matrix form: A . b . A^T with normalization)."""
    t = _DCT_C @ block @ _DCT_C.T
    return 0.25 * np.outer(_DCT_A, _DCT_A) * t


def _idct(coef: np.ndarray) -> np.ndarray:
    t = 0.25 * np.outer(_DCT_A, _DCT_A) * coef
    return _DCT_C.T @ t @ _DCT_C


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr, float64."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (markers are never stuffed)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _magnitude(v: int) -> tuple[int, int]:
    """DPCM/AC magnitude category (SSSS) + raw extra bits."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(
    w: _BitWriter, coef_zz: list[int], pred: int, tclass: int
) -> int:
    """Huffman-encode one zigzagged quantized block; returns new DC pred."""
    dc = coef_zz[0]
    diff = dc - pred
    s, bits = _magnitude(diff)
    code, length = _ENC_TABLES[("dc", tclass)][s]
    w.write(code, length)
    if s:
        w.write(bits, s)
    run = 0
    ac_tab = _ENC_TABLES[("ac", tclass)]
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = coef_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_tab[0xF0]  # ZRL
            w.write(zc, zl)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        run = 0
    if last_nz != 63:
        ec, el = ac_tab[0x00]  # EOB
        w.write(ec, el)
    return dc


_SAMPLINGS = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def _quantize(block: np.ndarray, q: np.ndarray) -> list[int]:
    # half-away-from-zero rounding (deterministic)
    coef = _fdct(block)
    qc = (np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)).astype(np.int32)
    return [int(qc[ZIGZAG[k]]) for k in range(64)]


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JPEG bytes.

    ``subsampling``: "444" (default; byte-identical to the original
    single-path encoder), "422", or "420" (box-mean chroma
    downsampling).  ``restart_interval`` > 0 emits a DRI segment and a
    byte-aligned RSTn marker every that many MCUs with DC-predictor
    reset — the wire feature real encoders use so a corrupted scan
    loses one restart segment, not the rest of the image.
    """
    h, wid, c = px.shape
    assert c == 3
    if subsampling not in _SAMPLINGS:
        raise ValueError(f"unsupported subsampling {subsampling!r} (444/422/420)")
    factors = _SAMPLINGS[subsampling]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    qts = [_quality_scale(QT_LUMA, quality), _quality_scale(QT_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(px) - 128.0  # level shift
    # pad to whole MCUs by edge replication
    ph = (h + 8 * vmax - 1) // (8 * vmax) * (8 * vmax)
    pw = (wid + 8 * hmax - 1) // (8 * hmax) * (8 * hmax)
    padded = np.zeros((ph, pw, 3))
    padded[:h, :wid] = ycc
    if ph > h:
        padded[h:, :wid] = ycc[h - 1 : h, :]
    if pw > wid:
        padded[:, wid:] = padded[:, wid - 1 : wid]
    # per-component planes, chroma box-mean downsampled to its factor
    planes = []
    for ci, (fh, fv) in enumerate(factors):
        plane = padded[:, :, ci]
        ry, rx = vmax // fv, hmax // fh
        if ry > 1 or rx > 1:
            plane = plane.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        planes.append(plane)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        zz = bytes(int(qt[ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, wid, 3)
    for comp, ((fh, fv), tq) in enumerate(zip(factors, (0, 1, 1))):
        out += struct.pack("BBB", comp + 1, (fh << 4) | fv, tq)
    for tclass, tid, bits, vals in [
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]:
        body = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(body), (tclass << 4) | tid) + body
    if restart_interval > 0:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for comp, tabs in [(1, 0x00), (2, 0x11), (3, 0x11)]:
        out += struct.pack("BB", comp, tabs)
    out += bytes([0, 63, 0])  # Ss, Se, Ah/Al

    w = _BitWriter()
    preds = [0, 0, 0]
    mcu_idx = 0
    rst = 0
    for my in range(ph // (8 * vmax)):
        for mx in range(pw // (8 * hmax)):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                w.restart(rst)
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            for comp, (fh, fv) in enumerate(factors):
                tc = 0 if comp == 0 else 1
                for vy in range(fv):
                    for vx in range(fh):
                        by = (my * fv + vy) * 8
                        bx = (mx * fh + vx) * 8
                        block = planes[comp][by : by + 8, bx : bx + 8]
                        zz = _quantize(block, qts[tc])
                        preds[comp] = _encode_block(w, zz, preds[comp], tc)
            mcu_idx += 1
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG scan")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(f"unexpected marker 0xff{marker:02x} in scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expected: int) -> None:
        """Discard pad bits, consume the byte-aligned RSTn marker, and
        verify its sequence number (T.81 E.1.4)."""
        self.nbits = 0  # drop 1-padding of the finished segment
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated JPEG scan at restart")
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        if self.data[self.pos + 1] - 0xD0 != expected:
            raise ValueError("restart marker out of sequence")
        self.pos += 2


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB.  Supports 8-bit,
    3-component baseline sequential with any sampling factors whose
    ratios to Hmax/Vmax are integral (covers 4:4:4, 4:2:2, 4:2:0),
    one interleaved scan, and restart intervals (DRI + RST0-7 with
    sequence verification).  Raises ValueError on anything else
    (progressive, 16-bit tables, 4-component, ...)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = wid = None
    comp_q: dict[int, int] = {}
    comp_hv: dict[int, tuple[int, int]] = {}
    comp_tabs: dict[int, tuple[int, int]] = {}
    comp_order: list[int] = []
    restart_interval = 0
    scan_start = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them (foreign encoders legally emit them)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (fill bytes to EOF)")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn
            pos += 2  # standalone markers carry no length field
            continue
        if marker == 0x00:
            raise ValueError("stuffed byte outside entropy-coded scan")
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2:
            raise ValueError("invalid JPEG segment length")
        if pos + 2 + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k in range(64):
                    tbl[ZIGZAG[k]] = body[i + 1 + k]
                qts[tq] = tbl
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF0 segment")
            prec, h, wid, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline supported")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 segment")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comp_hv[cid] = (hv >> 4, hv & 0xF)
                comp_q[cid] = tq
                comp_order.append(cid)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0xF
                if tclass > 1 or i + 17 > len(body):
                    raise ValueError("invalid DHT segment")
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                if i + 17 + nvals > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[i + 17 : i + 17 + nvals])
                tab = _build_decode(bits, vals)
                (dc_tabs if tclass == 0 else ac_tabs)[tid] = tab
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                comp_tabs[cid] = (tabs >> 4, tabs & 0xF)
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if scan_start is None or h is None:
        raise ValueError("missing SOS/SOF0")
    # validate every referenced table id BEFORE entropy decode — a
    # malformed stream must die with ValueError, not KeyError (ADVICE r02)
    for cid in comp_order:
        if comp_q.get(cid) not in qts:
            raise ValueError(f"component {cid} references missing quant table")
        if cid not in comp_tabs:
            raise ValueError(f"component {cid} missing from SOS")
        dct, act = comp_tabs[cid]
        if dct not in dc_tabs or act not in ac_tabs:
            raise ValueError(f"component {cid} references missing huffman table")

    hmax = max(fh for fh, _ in comp_hv.values())
    vmax = max(fv for _, fv in comp_hv.values())
    for cid, (fh, fv) in comp_hv.items():
        if fh < 1 or fv < 1 or hmax % fh or vmax % fv:
            raise ValueError(f"unsupported sampling factors {fh}x{fv}")

    r = _BitReader(payload[scan_start:])
    mcux = (wid + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_planes = {
        cid: np.zeros((mcuy * 8 * fv, mcux * 8 * fh))
        for cid, (fh, fv) in comp_hv.items()
    }
    preds = {cid: 0 for cid in comp_order}
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                r.sync_restart(rst)
                rst = (rst + 1) & 7
                preds = {cid: 0 for cid in comp_order}
            for cid in comp_order:
                fh, fv = comp_hv[cid]
                dct, act = comp_tabs[cid]
                qt = qts[comp_q[cid]]
                plane = comp_planes[cid]
                for vy in range(fv):
                    for vx in range(fh):
                        s = _decode_huff(r, dc_tabs[dct])
                        diff = _extend(r.read_bits(s), s)
                        preds[cid] += diff
                        zz = [0] * 64
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_tabs[act])
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(r.read_bits(size), size)
                            k += 1
                        coef = np.zeros((8, 8))
                        for k2 in range(64):
                            coef[ZIGZAG[k2]] = zz[k2] * qt[ZIGZAG[k2]]
                        by = (my * fv + vy) * 8
                        bx = (mx * fh + vx) * 8
                        plane[by : by + 8, bx : bx + 8] = _idct(coef)
            mcu_idx += 1
    full = np.zeros((mcuy * 8 * vmax, mcux * 8 * hmax, 3))
    for ci, cid in enumerate(comp_order):
        fh, fv = comp_hv[cid]
        plane = comp_planes[cid]
        if fv != vmax or fh != hmax:  # upsample by replication
            plane = np.repeat(np.repeat(plane, vmax // fv, axis=0), hmax // fh, axis=1)
        full[:, :, ci] = plane
    ycc = full[:h, :wid] + 128.0
    return _ycbcr_to_rgb(ycc)
