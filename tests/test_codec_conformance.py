"""External conformance fixtures for the JPEG and FLAC decoders.

Every other JPEG/FLAC test round-trips the repo's OWN encoders, so a bug
shared by encoder and decoder (swapped chroma planes, wrong zigzag,
off-by-one IDCT normalization, mis-ordered MCU assembly) would pass all
of them (VERDICT r5 #1).  The fixtures here are assembled bit-by-bit in
this file straight from the PUBLIC specs — ITU-T T.81 (JPEG: marker
layout, Annex K standard Huffman tables, Annex C canonical code
assignment, A.3.3 IDCT definition) and the FLAC format spec (frame
headers, CRC-8/16 polynomials, Rice coding, stereo decorrelation) — and
the expected outputs are computed ANALYTICALLY (closed-form cosines for
the IDCT, hand-worked predictor recurrences for FLAC), never by running
repo code.  The builders below share no code with
tcdb_spark/sources/multimodal.py: independent bit writers, independent
CRC implementations, independent Huffman code derivation.  Notably the
repo's own JPEG encoder emits all-one-length Huffman tables, so the
Annex K tables here exercise decoder code paths (variable-length
canonical codes) the round-trip tests never touch.
"""

import math
import struct

import numpy as np
import pytest

from tcdb_spark.sources.multimodal import decode_flac, decode_jpeg

# --------------------------------------------------------------------------
# independent bit-level builders
# --------------------------------------------------------------------------


class _JpegBits:
    """MSB-first bit accumulator for JPEG entropy data: pads the final
    byte with 1-bits (T.81 F.1.2.3) and stuffs 0x00 after any 0xFF."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc, self.n = 0, 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)
                self.acc, self.n = 0, 0

    def pad_align(self) -> None:
        while self.n:
            self.put(1, 1)

    def raw_marker(self, byte2: int) -> None:
        assert self.n == 0
        self.bytes += bytes([0xFF, byte2])


def _canon_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """T.81 Annex C canonical code assignment: {symbol: (length, code)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits (T.81 F.1.2.1.1/F.12)."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


# T.81 Annex K.3 standard Huffman table specifications (public constants)
_K_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_LUM_VALS = bytes(range(12))
_K_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_K_DC_CHR_VALS = bytes(range(12))
_K_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_LUM_VALS = bytes.fromhex(
    "010203000411051221314106135161072271143281914208"
    "a1b1c109233352f0156272d10a162434e125f11718191a26"
    "2728292a35363738393a434445464748494a535455565758"
    "595a636465666768696a737475767778797a838485868788"
    "898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5"
    "b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1"
    "e2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9fa"
)
_K_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_K_AC_CHR_VALS = bytes.fromhex(
    "000102031104052131061241510761711322328108144291"
    "a1b1c109233352f0156272d10a162434e125f11718191a26"
    "2728292a35363738393a434445464748494a535455565758"
    "595a636465666768696a737475767778797a828384858687"
    "88898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4"
    "b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9da"
    "e2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9fa"
)

# natural (row-major) index of each zigzag position — T.81 Figure A.6
_ZZ_TO_NATURAL = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _spec_idct(coef_zigzag: dict[int, float]) -> np.ndarray:
    """T.81 A.3.3 inverse DCT computed straight from the closed-form
    cosine sum (no matrix tricks shared with the decoder), +128 level
    shift.  ``coef_zigzag`` maps zigzag index -> DEQUANTIZED value."""
    F = np.zeros((8, 8))  # [v][u] = vertical, horizontal frequency
    for zz, val in coef_zigzag.items():
        nat = _ZZ_TO_NATURAL[zz]
        F[nat // 8][nat % 8] = val
    out = np.zeros((8, 8))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = inv_sqrt2 if u == 0 else 1.0
                    cv = inv_sqrt2 if v == 0 else 1.0
                    s += (
                        cu * cv * F[v][u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y][x] = s / 4.0 + 128.0
    return out


def _assert_rounded(decoded: np.ndarray, analytic: np.ndarray) -> None:
    """decoded must be the correctly-rounded analytic value; fixture
    values are chosen to sit > 0.02 away from any .5 tie so the check
    is exact, not tolerance-washed."""
    frac = np.abs(analytic - np.floor(analytic) - 0.5)
    assert (frac > 0.02).all(), "fixture lands on a rounding tie — rechoose"
    np.testing.assert_array_equal(
        decoded.astype(np.int64), np.rint(analytic).astype(np.int64)
    )


def test_annex_k_table_anchors():
    """Spot-anchor the derived canonical codes against hand-derivable
    literals (T.81 Annex K.3.1/K.3.2): protects the table constants
    above from transcription slips."""
    dc = _canon_codes(_K_DC_LUM_BITS, _K_DC_LUM_VALS)
    assert dc[0] == (2, 0b00)
    assert dc[4] == (3, 0b101)
    assert dc[7] == (5, 0b11110)
    ac = _canon_codes(_K_AC_LUM_BITS, _K_AC_LUM_VALS)
    assert ac[0x00] == (4, 0b1010)  # EOB
    assert ac[0x01] == (2, 0b00)
    assert ac[0xF0] == (11, 0b11111111001)  # ZRL
    acc = _canon_codes(_K_AC_CHR_BITS, _K_AC_CHR_VALS)
    assert acc[0x00] == (2, 0b00)  # chroma EOB


# --------------------------------------------------------------------------
# JPEG fixtures
# --------------------------------------------------------------------------


def _jpeg_headers_gray(w: int, h: int, qtab_zz: list[int]) -> bytes:
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dqt = _seg(0xDB, bytes([0x00]) + bytes(qtab_zz))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_K_DC_LUM_BITS) + _K_DC_LUM_VALS
        + bytes([0x10]) + bytes(_K_AC_LUM_BITS) + _K_AC_LUM_VALS,
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos


def test_jpeg_dc_only_flat_block():
    """8x8 grayscale, single DC coefficient: every pixel must be
    round(dc * q0 / 8) + 128 = 144 exactly (T.81 A.3.3 with only F(0,0)
    set) — pins DC decode, dequantization, IDCT DC gain, level shift."""
    qtab = [16] + [i + 2 for i in range(63)]  # distinct, only q0 used
    dc_codes = _canon_codes(_K_DC_LUM_BITS, _K_DC_LUM_VALS)
    ac_codes = _canon_codes(_K_AC_LUM_BITS, _K_AC_LUM_VALS)
    bits = _JpegBits()
    s, mag = _mag_bits(8)  # DC diff = +8
    length, code = dc_codes[s]
    bits.put(code, length)
    bits.put(mag, s)
    length, code = ac_codes[0x00]  # EOB
    bits.put(code, length)
    bits.pad_align()
    payload = _jpeg_headers_gray(8, 8, qtab) + bytes(bits.bytes) + b"\xff\xd9"

    out = decode_jpeg(payload)
    assert (out["width"], out["height"]) == (8, 8)
    px = out["pixels"]
    assert px.shape == (8, 8, 1)
    assert (px == 144).all()  # 8 * 16 / 8 + 128


def test_jpeg_single_ac_vertical_cosine():
    """8x8 grayscale, DC + one AC coefficient at ZIGZAG index 2 (natural
    position v=1,u=0: vertical frequency).  The decoded block must be a
    vertical half-cosine ramp, constant along each row — a transposed
    IDCT or a zigzag mix-up produces a horizontal ramp instead.  The
    quantization table entries are all distinct so any DQT index-order
    bug changes the dequantized value and fails the pin too."""
    qtab = [16, 99, 11] + [i + 101 for i in range(61)]  # zz0=16, zz2=11
    dc_codes = _canon_codes(_K_DC_LUM_BITS, _K_DC_LUM_VALS)
    ac_codes = _canon_codes(_K_AC_LUM_BITS, _K_AC_LUM_VALS)
    bits = _JpegBits()
    s, mag = _mag_bits(5)  # DC diff = +5 -> dequant 5*16 = 80
    length, code = dc_codes[s]
    bits.put(code, length)
    bits.put(mag, s)
    s, mag = _mag_bits(12)  # AC val 12 after a run of 1 -> symbol 0x14
    assert s == 4
    length, code = ac_codes[0x14]
    bits.put(code, length)
    bits.put(mag, s)
    length, code = ac_codes[0x00]  # EOB
    bits.put(code, length)
    bits.pad_align()
    payload = _jpeg_headers_gray(8, 8, qtab) + bytes(bits.bytes) + b"\xff\xd9"

    out = decode_jpeg(payload)["pixels"][..., 0]
    analytic = _spec_idct({0: 5 * 16, 2: 12 * 11})
    # constant along rows, strictly varying down the column
    assert (out == out[:, :1]).all()
    assert len(set(out[:, 0].tolist())) == 8
    _assert_rounded(out, analytic)


def test_jpeg_420_color_quadrants_and_chroma_identity():
    """16x16 YCbCr 4:2:0, one MCU: four flat Y blocks with DIFFERENT
    DCs (exercises in-MCU block order TL,TR,BL,BR and the DC predictor
    chain) + flat Cb=+24, Cr=-12 (exercises chroma upsample and the
    JFIF conversion; swapped Cb/Cr planes invert the red/blue shifts
    and fail).  Expected RGB computed from the public JFIF formula."""
    dqt = _seg(
        0xDB,
        bytes([0x00]) + bytes([16] + [i + 2 for i in range(63)])
        + bytes([0x01]) + bytes([8] + [i + 2 for i in range(63)]),
    )
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 16, 16)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_K_DC_LUM_BITS) + _K_DC_LUM_VALS
        + bytes([0x10]) + bytes(_K_AC_LUM_BITS) + _K_AC_LUM_VALS
        + bytes([0x01]) + bytes(_K_DC_CHR_BITS) + _K_DC_CHR_VALS
        + bytes([0x11]) + bytes(_K_AC_CHR_BITS) + _K_AC_CHR_VALS,
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_l = _canon_codes(_K_DC_LUM_BITS, _K_DC_LUM_VALS)
    ac_l = _canon_codes(_K_AC_LUM_BITS, _K_AC_LUM_VALS)
    dc_c = _canon_codes(_K_DC_CHR_BITS, _K_DC_CHR_VALS)
    ac_c = _canon_codes(_K_AC_CHR_BITS, _K_AC_CHR_VALS)

    bits = _JpegBits()

    def put_block(diff: int, dc_codes, ac_codes) -> None:
        s, mag = _mag_bits(diff)
        length, code = dc_codes[s]
        bits.put(code, length)
        if s:
            bits.put(mag, s)
        length, code = ac_codes[0x00]
        bits.put(code, length)

    # Y DCs -16, 0, +16, +32 (x q0/8 = x2 -> offsets -32, 0, +32, +64),
    # differentially coded: -16, +16, +16, +16
    put_block(-16, dc_l, ac_l)
    put_block(16, dc_l, ac_l)
    put_block(16, dc_l, ac_l)
    put_block(16, dc_l, ac_l)
    put_block(24, dc_c, ac_c)  # Cb: +24 * 8 / 8 = +24
    put_block(-12, dc_c, ac_c)  # Cr: -12
    bits.pad_align()
    payload = b"\xff\xd8" + dqt + sof + dht + sos + bytes(bits.bytes) + b"\xff\xd9"

    out = decode_jpeg(payload)
    px = out["pixels"]
    assert px.shape == (16, 16, 3)
    y_quadrant = {(0, 0): 96.0, (0, 1): 128.0, (1, 0): 160.0, (1, 1): 192.0}
    cb, cr = 24.0, -12.0
    for (qy, qx), yv in y_quadrant.items():
        # JFIF YCbCr -> RGB (public constants)
        exp = np.rint(
            np.array(
                [
                    yv + 1.402 * cr,
                    yv - 0.344136 * cb - 0.714136 * cr,
                    yv + 1.772 * cb,
                ]
            )
        ).astype(np.uint8)
        block = px[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8]
        assert (block == exp).all(), (qy, qx, block[0, 0], exp)
    # hand-computed literal anchor for the TL quadrant (Y=96):
    # R = 96 - 16.824 -> 79, G = 96 - 8.259 + 8.570 -> 96, B = 96 + 42.528 -> 139
    assert px[0, 0].tolist() == [79, 96, 139]


def test_jpeg_restart_markers_reset_predictor():
    """8x16 grayscale, DRI=1: an RST0 between the two MCUs byte-aligns
    the reader and RESETS the DC predictor, so the second block's diff
    is absolute (T.81 F.2.1.3.1) — a decoder that fails to reset
    produces 192 instead of 176."""
    qtab = [16] + [i + 2 for i in range(63)]
    dc_codes = _canon_codes(_K_DC_LUM_BITS, _K_DC_LUM_VALS)
    ac_codes = _canon_codes(_K_AC_LUM_BITS, _K_AC_LUM_VALS)
    dri = _seg(0xDD, struct.pack(">H", 1))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
    dqt = _seg(0xDB, bytes([0x00]) + bytes(qtab))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_K_DC_LUM_BITS) + _K_DC_LUM_VALS
        + bytes([0x10]) + bytes(_K_AC_LUM_BITS) + _K_AC_LUM_VALS,
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bits = _JpegBits()

    def put_block(diff: int) -> None:
        s, mag = _mag_bits(diff)
        length, code = dc_codes[s]
        bits.put(code, length)
        if s:
            bits.put(mag, s)
        length, code = ac_codes[0x00]
        bits.put(code, length)

    put_block(8)  # block 1: 8*2 + 128 = 144
    bits.pad_align()
    bits.raw_marker(0xD0)  # RST0
    put_block(24)  # predictor reset: 24*2 + 128 = 176 (not 192)
    bits.pad_align()
    payload = (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(bits.bytes) + b"\xff\xd9"
    )

    px = decode_jpeg(payload)["pixels"][..., 0]
    assert px.shape == (8, 16)
    assert (px[:, :8] == 144).all()
    assert (px[:, 8:] == 176).all()


# --------------------------------------------------------------------------
# FLAC fixtures
# --------------------------------------------------------------------------


class _FlacBits:
    def __init__(self):
        self.bytes = bytearray()
        self.acc, self.n = 0, 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                self.acc, self.n = 0, 0

    def align(self) -> None:
        while self.n:
            self.put(0, 1)


def _crc8_spec(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — per the
    FLAC format spec; fresh shift-register implementation."""
    reg = 0
    for b in data:
        reg ^= b
        for _ in range(8):
            reg = ((reg << 1) ^ 0x07) & 0xFF if reg & 0x80 else (reg << 1) & 0xFF
    return reg


def _crc16_spec(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    reg = 0
    for b in data:
        reg ^= b << 8
        for _ in range(8):
            reg = ((reg << 1) ^ 0x8005) & 0xFFFF if reg & 0x8000 else (reg << 1) & 0xFFFF
    return reg


def _flac_streaminfo(blocksize: int, rate: int, nch: int, bps: int, total: int) -> bytes:
    w = _FlacBits()
    w.put(blocksize, 16)  # min blocksize
    w.put(blocksize, 16)  # max blocksize
    w.put(0, 24)  # min framesize unknown
    w.put(0, 24)  # max framesize unknown
    w.put(rate, 20)
    w.put(nch - 1, 3)
    w.put(bps - 1, 5)
    w.put(total, 36)
    body = bytes(w.bytes) + b"\x00" * 16  # md5 unset
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + body


def _flac_frame(
    frame_no: int, blocksize: int, chan_code: int, subframes, bps: int = 16
) -> bytes:
    """One frame: header (bs_code 6: 8-bit blocksize-1; rate from
    STREAMINFO; bps coded 16-bit) + CRC-8, subframes, pad, CRC-16.
    ``subframes`` is a list of callables taking the bit writer."""
    w = _FlacBits()
    w.put(0x3FFE, 14)  # sync
    w.put(0, 1)  # reserved
    w.put(0, 1)  # fixed blocking strategy
    w.put(6, 4)  # blocksize: 8-bit value follows
    w.put(0, 4)  # sample rate: from STREAMINFO
    w.put(chan_code, 4)
    w.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
    w.put(0, 1)  # reserved
    assert frame_no < 0x80
    w.put(frame_no, 8)  # UTF-8 coded frame number, single byte
    w.put(blocksize - 1, 8)
    hdr = bytes(w.bytes)
    w.put(_crc8_spec(hdr), 8)
    for sub in subframes:
        sub(w)
    w.align()
    frame = bytes(w.bytes)
    w.put(_crc16_spec(frame), 16)
    return bytes(w.bytes)


def _sub_constant(value: int, bps: int = 16):
    def go(w: _FlacBits) -> None:
        w.put(0, 1)  # padding
        w.put(0, 6)  # CONSTANT
        w.put(0, 1)  # no wasted bits
        w.put(value & ((1 << bps) - 1), bps)

    return go


def _sub_verbatim(samples: list[int], bps: int = 16):
    def go(w: _FlacBits) -> None:
        w.put(0, 1)
        w.put(1, 6)  # VERBATIM
        w.put(0, 1)
        for s in samples:
            w.put(s & ((1 << bps) - 1), bps)

    return go


def _put_rice(w: _FlacBits, residuals: list[int], param: int) -> None:
    for r in residuals:
        u = (r << 1) if r >= 0 else (-r << 1) - 1  # zigzag fold
        q = u >> param
        w.put(0, q)  # q zero bits ...
        w.put(1, 1)  # ... then the terminating 1
        if param:
            w.put(u & ((1 << param) - 1), param)


def _sub_fixed2(warmup: list[int], residuals: list[int], param: int, bps: int = 16):
    def go(w: _FlacBits) -> None:
        w.put(0, 1)
        w.put(8 + 2, 6)  # FIXED, order 2
        w.put(0, 1)
        for s in warmup:
            w.put(s & ((1 << bps) - 1), bps)
        w.put(0, 2)  # residual method 0 (4-bit rice params)
        w.put(0, 4)  # partition order 0
        w.put(param, 4)
        _put_rice(w, residuals, param)

    return go


def test_flac_constant_subframe():
    """Mono CONSTANT frame: all 16 samples must equal -3/32768 exactly
    — pins STREAMINFO parse, frame-header CRC-8, the 16-bit signed
    read, frame CRC-16, and normalization."""
    payload = _flac_streaminfo(16, 8000, 1, 16, 16) + _flac_frame(
        0, 16, 0, [_sub_constant(-3)]
    )
    out = decode_flac(payload)
    assert out["sample_rate"] == 8000 and out["n_channels"] == 1
    np.testing.assert_array_equal(out["samples"], np.full((16, 1), -3.0 / 32768.0))


def test_flac_fixed_order2_rice():
    """Mono FIXED order-2 frame, hand-worked recurrence: warmup [3, 5],
    residuals [1,-1,-1,1,3,-3] under s[n] = 2 s[n-1] - s[n-2] + e[n]
    give exactly [3, 5, 8, 10, 11, 13, 18, 20] — pins the fixed
    predictor coefficients, Rice zigzag-unfold, and unary direction
    (q zero bits then a 1)."""
    want = [3, 5, 8, 10, 11, 13, 18, 20]
    payload = _flac_streaminfo(8, 8000, 1, 16, 8) + _flac_frame(
        0, 8, 0, [_sub_fixed2([3, 5], [1, -1, -1, 1, 3, -3], param=1)]
    )
    out = decode_flac(payload)
    np.testing.assert_array_equal(
        out["samples"][:, 0], np.array(want) / 32768.0
    )


def test_flac_stereo_decorrelation_mid_side_and_left_side():
    """Two frames: MID-SIDE (chan 10) then LEFT-SIDE (chan 8), expected
    channels hand-worked from the spec reconstruction — a decoder that
    swaps which slot carries the +1-bit side channel, or flips the
    mid/side algebra, fails.  mid = (L+R)>>1, side = L-R:
      L=[100,101,102,103], R=[40,38,36,34] -> mid=[70,69,69,68],
      side=[60,63,66,69]; then L=[50,52], R=[20,19] -> side=[30,33]."""
    f0 = _flac_frame(
        0,
        4,
        10,  # mid/side: side subframe carries bps+1
        [_sub_verbatim([70, 69, 69, 68], 16), _sub_verbatim([60, 63, 66, 69], 17)],
    )
    f1 = _flac_frame(
        1,
        2,
        8,  # left/side
        [_sub_verbatim([50, 52], 16), _sub_verbatim([30, 33], 17)],
    )
    payload = _flac_streaminfo(4, 8000, 2, 16, 6) + f0 + f1
    out = decode_flac(payload)
    assert out["n_channels"] == 2
    left = np.array([100, 101, 102, 103, 50, 52]) / 32768.0
    right = np.array([40, 38, 36, 34, 20, 19]) / 32768.0
    np.testing.assert_array_equal(out["samples"][:, 0], left)
    np.testing.assert_array_equal(out["samples"][:, 1], right)


def test_flac_rice_partitions_and_escape():
    """Mono FIXED order-0 frame (prediction = 0, so samples ARE the
    residuals), partition order 1: first partition Rice param 0, second
    partition the raw-bits ESCAPE (param 15, 6-bit width) — pins the
    partition split n = (blocksize >> po) - (order if first) and the
    escape path against hand-written bits."""
    vals = [1, -2, 0, 3, -17, 25, -9, 14]

    def sub(w: _FlacBits) -> None:
        w.put(0, 1)
        w.put(8 + 0, 6)  # FIXED order 0
        w.put(0, 1)
        w.put(0, 2)  # method 0
        w.put(1, 4)  # partition order 1 -> two partitions of 4
        w.put(0, 4)  # partition 1: rice param 0
        _put_rice(w, vals[:4], 0)
        w.put(15, 4)  # partition 2: escape
        w.put(6, 5)  # raw residual width: 6 bits
        for v in vals[4:]:
            w.put(v & 0x3F, 6)

    payload = _flac_streaminfo(8, 8000, 1, 16, 8) + _flac_frame(0, 8, 0, [sub])
    out = decode_flac(payload)
    np.testing.assert_array_equal(out["samples"][:, 0], np.array(vals) / 32768.0)


def test_flac_header_crc_actually_guards():
    """Flipping one bit in the frame header must fail the CRC-8 check
    (proves the fixture CRCs are real, not vacuously matching)."""
    payload = bytearray(
        _flac_streaminfo(16, 8000, 1, 16, 16) + _flac_frame(0, 16, 0, [_sub_constant(-3)])
    )
    payload[42 + 2] ^= 0x04  # inside the frame header region
    with pytest.raises(ValueError, match="CRC|sync|reserved|truncated"):
        decode_flac(bytes(payload))


def test_jpeg_truncated_at_restart_boundary_raises_value_error():
    """Cutting the stream exactly where the RST marker should be must
    raise the catchable ValueError, not IndexError from the marker-scan
    loop (review finding r6: the bounds check must run BEFORE each
    read, and the progressive twin needs it too)."""
    qtab = [16] + [i + 2 for i in range(63)]
    dc_codes = _canon_codes(_K_DC_LUM_BITS, _K_DC_LUM_VALS)
    ac_codes = _canon_codes(_K_AC_LUM_BITS, _K_AC_LUM_VALS)
    dri = _seg(0xDD, struct.pack(">H", 1))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
    dqt = _seg(0xDB, bytes([0x00]) + bytes(qtab))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_K_DC_LUM_BITS) + _K_DC_LUM_VALS
        + bytes([0x10]) + bytes(_K_AC_LUM_BITS) + _K_AC_LUM_VALS,
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bits = _JpegBits()
    s, mag = _mag_bits(8)
    length, code = dc_codes[s]
    bits.put(code, length)
    bits.put(mag, s)
    length, code = ac_codes[0x00]
    bits.put(code, length)
    bits.pad_align()
    # first MCU only — the stream ends where RST0 should begin
    payload = b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(bits.bytes)
    with pytest.raises(ValueError, match="truncated JPEG"):
        decode_jpeg(payload)
