"""Sequential + progressive JPEG (ITU-T T.81 / ISO 10918-1) — pure
numpy + stdlib.

The reference pipeline's own corpus is PNG (its parser emits PNGs), but a
real 100 TB multimodal corpus is mostly JPEG — including ~10% progressive
streams — so this closes the engine's highest-value decode refusals.
Everything here is public spec:

- :func:`decode_jpeg` is a GENERAL decoder for sequential (SOF0/SOF1)
  AND progressive (SOF2) streams: marker walk (SOI / APPn / COM / DQT /
  SOF / DHT / DRI / SOS / RSTn / EOI), canonical Huffman decode with
  byte-unstuffing, multi-scan architecture (every scan decodes into
  per-component quantized-coefficient buffers; pixels render once at
  EOI), DC differential prediction with restart-interval resets,
  progressive spectral selection + successive approximation (T.81 §G:
  EOB run-length coding, AC refinement correction bits), vectorized
  dequantize + dezigzag + einsum IDCT with pinned round-half-up,
  sampling-factor upsampling (4:4:4 / 4:2:2 / 4:2:0 by pixel
  replication), and libjpeg-style FIXED-POINT integer YCbCr→RGB
  (jdcolor.c's public 16-bit constants) so the color stage is
  integer-exact and therefore SQL-expressible. Arithmetic coding,
  lossless/hierarchical SOFs, 12-bit precision, >2 sampling factors,
  and incomplete scan sets raise typed ``UnsupportedImageError``-family
  errors — honest refusals, never garbage pixels.

- :func:`encode_jpeg_progressive` is the progressive ENCODER TWIN: the
  same pinned color convert / DCT / quantization as the baseline twin
  (so the coefficient arrays are identical), transmitted through a
  pinned scan script covering every progressive path — interleaved DC
  first pass at Al=1, per-component AC first passes with a split luma
  band, then DC/AC refinement to Al=0 with EOBRUN + buffered correction
  bits. Progressive transmission is a REORDERING of the same data, so
  decoded pixels must equal the baseline stream's decode bit-for-bit —
  the differential test that validates both directions at once.

- :func:`encode_jpeg_baseline` is the deterministic ENCODER TWIN (the
  audiocodec.encode_wav / imagecodec.encode_png_filtered pattern): Annex
  K quantization tables (chroma DC pinned to 16 — see JPEG_QUANT_CHROMA)
  and Annex K typical Huffman tables, integer-pinned RGB→YCbCr (scaled
  JFIF coefficients, floor-division — no float rounding ambiguity),
  float64 forward DCT with the DC term replaced by its EXACT closed form
  (sum/8 — mathematically identical, but float-tie-free), and
  round-half-away-from-zero quantization. Every rounding decision in the
  encode→decode chain is thereby a deterministic integer function, which
  is what lets a DuckDB oracle recompute decoded pixels of constant
  8x8 blocks end-to-end (the m14 driver query).

Why constant blocks close the loop exactly: the DCT of a constant block
has only the DC coefficient; with the luminance/chrominance DC quantum
pinned to 16, the dequantized DC is a multiple of 16, so the ideal IDCT
output is the EVEN INTEGER dequant/8 — float64 IDCT lands within 1e-12
of it and the pinned round-half-up can never flip. The whole chain
(pinned color-convert → DC quantize → dequant → IDCT → fixed-point
color-convert) is then closed-form per channel.

Scale shape: decode runs inside Arrow-batched mapInPandas stages
(multimodal.extract_features with real_decode) — per-row Python, the
same boundary every decode library crosses; the engine-side plumbing
(repartition before the Python stage, on_error='report' row isolation,
decoded-size bounds) is what matters at 100 TB.
"""

from __future__ import annotations

import numpy as np

from .imagecodec import UnsupportedImageError

JPEG_MAX_DECODED_BYTES = 256 << 20

# ---------------------------------------------------------------------------
# Tables — ITU T.81 Annex K (public spec)
# ---------------------------------------------------------------------------

# zigzag position -> raster index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K Table K.1 (luminance). DC quantum is 16.
JPEG_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K Table K.2 (chrominance) with the DC quantum pinned 17 → 16:
# a dequantized DC that is a multiple of 16 makes the DC-only IDCT an
# exact even integer (dequant/8), eliminating the x.5 float round-tie a
# 17-multiple can hit — the property the closed-form oracle rests on.
# Encoders may use any tables (they travel in DQT); this is a pinned
# choice of OUR twin, not a spec deviation.
JPEG_QUANT_CHROMA = np.array([
    16, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K "typical" Huffman tables: (bits[1..16] counts, symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: F = C @ f @ C.T ; f = C.T @ F @ C
_x = np.arange(8)
_C = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_C[0, :] /= np.sqrt(2.0)


def _canonical_codes(bits: list[int], symbols: list[int]):
    """counts-per-length + symbol list → {symbol: (code, length)} via
    the canonical assignment of T.81 Annex C."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], symbols: list[int]):
    """{(length, code): symbol} for the bit-at-a-time decoder."""
    return {
        (ln, code): sym
        for sym, (code, ln) in _canonical_codes(bits, symbols).items()
    }


# ---------------------------------------------------------------------------
# Pinned integer color conversion (both directions SQL-expressible)
# ---------------------------------------------------------------------------


def rgb_to_ycbcr_int(arr: np.ndarray) -> np.ndarray:
    """ENCODER color convert — JFIF coefficients scaled by 1e6 with
    floor division (Python-// semantics, mirrored by DuckDB
    floor(x/1e6)), so every output is a deterministic integer function
    of (R, G, B). Clamped to [0, 255]."""
    rgb = arr.astype(np.int64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = (299000 * r + 587000 * g + 114000 * b + 500000) // 1000000
    cb = 128 + (-168736 * r - 331264 * g + 500000 * b + 500000) // 1000000
    cr = 128 + (500000 * r - 418688 * g - 81312 * b + 500000) // 1000000
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def ycbcr_to_rgb_fixed(ycc: np.ndarray) -> np.ndarray:
    """DECODER color convert — libjpeg jdcolor.c's public 16-bit
    fixed-point constants (1.40200/0.34414/0.71414/1.77200 × 65536),
    floor-shift semantics. Integer-exact, so the oracle reproduces it
    with floor(x/65536)."""
    ycc = ycc.astype(np.int64)
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128, ycc[..., 2] - 128
    r = y + (91881 * cr + 32768) // 65536
    g = y - (22554 * cb + 46802 * cr + 32768) // 65536
    b = y + (116130 * cb + 32768) // 65536
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder twin
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _ssss(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _quantize_rha(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero quantization — the deterministic
    integer rule the oracle mirrors (sign * floor(|x|/q + 0.5))."""
    return (np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)).astype(
        np.int64
    )


def _fdct_block(block: np.ndarray) -> np.ndarray:
    """Forward DCT of a level-shifted block, with the DC term replaced
    by its exact value sum/8 (mathematically identical; float-tie-free
    for the constant-block closed form)."""
    f = block.astype(np.float64)
    F = _C @ f @ _C.T
    F[0, 0] = f.sum() / 8.0
    return F


def _encode_block(
    w: _BitWriter,
    coefs_zz: np.ndarray,
    prev_dc: int,
    dc_codes,
    ac_codes,
) -> int:
    diff = int(coefs_zz[0]) - prev_dc
    s = _ssss(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(coefs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]
            w.write(zc, zl)
            run -= 16
        s = _ssss(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ec, el = ac_codes[0x00]
        w.write(ec, el)
    return int(coefs_zz[0])


def _pad_edge(plane: np.ndarray, mult: int, mult_w: int | None = None):
    """Edge-replicate pad to multiples of (mult, mult_w or mult)."""
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % (mult_w if mult_w is not None else mult)
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + (
        payload
    )


def _component_planes(arr: np.ndarray, subsample):
    """Shared encoder front half: RGB → padded per-component sample
    planes [(cid, hs, vs, tq, plane)]. ``subsample`` False → 4:4:4;
    True or "420" → 4:2:0 with pinned floor((a+b+c+d+2)/4) chroma
    averaging; "422" → 4:2:2 with pinned horizontal floor((a+b+1)/2)
    averaging (the interlace-era broadcast sampling — decoder exercises
    hmax=2/vmax=1 upsampling)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("JPEG encoder expects (H, W, 3) uint8")
    if subsample not in (False, True, "420", "422"):
        raise ValueError(f"subsample must be False/True/'420'/'422',"
                         f" got {subsample!r}")
    ycc = rgb_to_ycbcr_int(arr).astype(np.int64)
    if subsample == "422":
        y_plane = _pad_edge(ycc[..., 0], 8, 16)
        cbf = _pad_edge(ycc[..., 1], 8, 16)
        crf = _pad_edge(ycc[..., 2], 8, 16)
        cb = (cbf[:, 0::2] + cbf[:, 1::2] + 1) // 2
        cr = (crf[:, 0::2] + crf[:, 1::2] + 1) // 2
        return [
            (1, 2, 1, 0, y_plane),
            (2, 1, 1, 1, cb),
            (3, 1, 1, 1, cr),
        ]
    if subsample:
        y_plane = _pad_edge(ycc[..., 0], 16)
        cbf = _pad_edge(ycc[..., 1], 16)
        crf = _pad_edge(ycc[..., 2], 16)
        cb = (
            cbf[0::2, 0::2] + cbf[0::2, 1::2] + cbf[1::2, 0::2]
            + cbf[1::2, 1::2] + 2
        ) // 4
        cr = (
            crf[0::2, 0::2] + crf[0::2, 1::2] + crf[1::2, 0::2]
            + crf[1::2, 1::2] + 2
        ) // 4
        return [
            (1, 2, 2, 0, y_plane),
            (2, 1, 1, 1, cb),
            (3, 1, 1, 1, cr),
        ]
    return [
        (1, 1, 1, 0, _pad_edge(ycc[..., 0], 8)),
        (2, 1, 1, 1, _pad_edge(ycc[..., 1], 8)),
        (3, 1, 1, 1, _pad_edge(ycc[..., 2], 8)),
    ]


def encode_jpeg_baseline(
    arr: np.ndarray, subsample: bool = False
) -> bytes:
    """Deterministic baseline JFIF encoder twin: (H, W, 3) uint8 RGB →
    single-scan SOF0 bytes. 4:4:4 by default; ``subsample=True`` emits
    4:2:0 with pinned floor((a+b+c+d+2)/4) chroma averaging. All tables
    and every rounding rule are pinned (module docstring) so decoded
    pixels of constant blocks are a closed-form integer function of the
    input color."""
    h, w = arr.shape[:2]
    comps = _component_planes(arr, subsample)
    qtabs = [JPEG_QUANT_LUMA, JPEG_QUANT_CHROMA]
    dc_enc = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_enc = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    )
    for tq, q in enumerate(qtabs):
        out += _marker(0xDB, bytes([tq]) + bytes(q[ZIGZAG].tolist()))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, hs, vs, tq, _ in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _marker(0xC0, bytes(sof))
    for tc_th, (bits, syms) in (
        (0x00, _DC_LUMA), (0x10, _AC_LUMA),
        (0x01, _DC_CHROMA), (0x11, _AC_CHROMA),
    ):
        out += _marker(
            0xC4, bytes([tc_th]) + bytes(bits) + bytes(syms)
        )
    sos = bytearray([len(comps)])
    for cid, _, _, tq, _ in comps:
        sos += bytes([cid, (tq << 4) | tq])  # luma→tables 0, chroma→1
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, bytes(sos))

    bw = _BitWriter()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (comps[0][4].shape[1] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (comps[0][4].shape[0] + 8 * vmax - 1) // (8 * vmax)
    prev_dc = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, hs, vs, tq, plane) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8] - 128
                        F = _fdct_block(block)
                        qz = _quantize_rha(
                            F.reshape(64)[ZIGZAG],
                            qtabs[tq][ZIGZAG].astype(np.float64),
                        )
                        prev_dc[ci] = _encode_block(
                            bw, qz, prev_dc[ci],
                            dc_enc[tq], ac_enc[tq],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# General baseline decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; RSTn markers surface via :meth:`at_restart`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.end = False

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            self.end = True
            raise UnsupportedImageError("JPEG: truncated entropy data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                # a real marker inside the scan: rewind and signal
                self.pos -= 1
                self.end = True
                raise UnsupportedImageError(
                    "JPEG: entropy data ended at marker "
                    f"0xFF{nxt:02X}" if nxt is not None else
                    "JPEG: truncated entropy data"
                )
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise UnsupportedImageError("JPEG: missing restart marker")


def _decode_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedImageError("JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a sequential (SOF0/SOF1) or PROGRESSIVE (SOF2) JFIF/JPEG
    blob → (H, W, 3) uint8 RGB. Grayscale replicates to 3 channels.

    Multi-scan architecture (T.81 §E/§G): every scan decodes into
    per-component quantized-coefficient buffers (zigzag order); pixels
    render once at the end (vectorized dequant + IDCT). This covers
    single-scan baseline, sequential non-interleaved multi-scan (one
    scan per component), progressive spectral selection (DC scan +
    per-component AC bands with EOB run-length coding), and progressive
    successive approximation (Al-shifted first passes, then DC/AC
    refinement scans with correction bits).

    Raises :class:`UnsupportedImageError` on arithmetic/hierarchical/
    12-bit streams, unknown Huffman codes, truncation, incomplete scan
    sets (a component with no DC scan), or decoded sizes over
    JPEG_MAX_DECODED_BYTES — never returns garbage pixels."""
    blob = bytes(blob)
    if blob[:3] != b"\xff\xd8\xff":
        raise UnsupportedImageError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    coeffs: list[np.ndarray] = []
    dc_seen: list[bool] = []
    restart_interval = 0
    n_scans = 0
    pos = 2
    while pos + 1 < len(blob):
        if blob[pos] != 0xFF:
            raise UnsupportedImageError("JPEG: marker sync lost")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them so the real tag byte is not misread as a
        # segment length by the generic skip below
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        tag = blob[pos + 1]
        if tag == 0xD8 or tag == 0x01 or 0xD0 <= tag <= 0xD7:
            # SOI / TEM / stray RSTn: standalone markers, no length field
            pos += 2
            continue
        if tag == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(blob[pos + 2:pos + 4], "big")
        seg = blob[pos + 4:pos + 2 + seg_len]
        if tag == 0xDB:  # DQT: possibly several tables per segment
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise UnsupportedImageError(
                        "JPEG: 16-bit quant tables unsupported"
                    )
                zz = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = zz
                qtabs[tq] = q.reshape(8, 8)
                i += 65
        elif tag in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progr.
            if sof is not None:
                raise UnsupportedImageError("JPEG: multiple SOF markers")
            prec = seg[0]
            if prec != 8:
                raise UnsupportedImageError(
                    f"JPEG: {prec}-bit precision unsupported"
                )
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise UnsupportedImageError(
                    f"JPEG: {ncomp} components unsupported"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise UnsupportedImageError(
                        f"JPEG: sampling {hs}x{vs} unsupported"
                    )
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            if h * w * 3 > JPEG_MAX_DECODED_BYTES:
                raise UnsupportedImageError(
                    f"JPEG: decoded size {h * w * 3} exceeds bound"
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # full (MCU-padded) block grid — what interleaved scans
                # cover — and the TRUE component grid non-interleaved
                # scans cover (T.81 A.2.2: ceil of the scaled dims)
                c["bh"] = mcus_y * c["v"]
                c["bw"] = mcus_x * c["h"]
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["nb_x"] = -(-cw // 8)
                c["nb_y"] = -(-ch // 8)
            sof = {
                "h": h, "w": w, "comps": comps,
                "progressive": tag == 0xC2,
                "hmax": hmax, "vmax": vmax,
                "mcus_x": mcus_x, "mcus_y": mcus_y,
            }
            coeffs = [
                np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
                for c in comps
            ]
            dc_seen = [False] * ncomp
        elif tag in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"JPEG: SOF 0x{tag:02X} (lossless/arithmetic/"
                "hierarchical) unsupported"
            )
        elif tag == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nsym = sum(bits)
                syms = list(seg[i + 17:i + 17 + nsym])
                htabs[(tc, th)] = _decode_table(bits, syms)
                i += 17 + nsym
        elif tag == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif tag == 0xDA:  # SOS
            if sof is None:
                raise UnsupportedImageError("JPEG: SOS before SOF")
            ns = seg[0]
            if not 1 <= ns <= len(sof["comps"]):
                raise UnsupportedImageError(
                    f"JPEG: scan with {ns} components"
                )
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                hit = [
                    (i, x) for i, x in enumerate(sof["comps"])
                    if x["id"] == cid
                ]
                if not hit:
                    raise UnsupportedImageError(
                        f"JPEG: scan references unknown component {cid}"
                    )
                ci, comp = hit[0]
                scan.append((ci, comp, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if not sof["progressive"] and (ss, se, ah, al) != (0, 63, 0, 0):
                raise UnsupportedImageError(
                    "JPEG: sequential scan with progressive parameters"
                )
            pos = _decode_scan_coeffs(
                blob, pos + 2 + seg_len, sof, scan, htabs,
                restart_interval, coeffs, ss, se, ah, al, dc_seen,
            )
            n_scans += 1
            continue
        # APPn / COM / DNL / others: skip
        pos += 2 + seg_len
    if sof is None or n_scans == 0:
        raise UnsupportedImageError("JPEG: no scan data found")
    missing = [
        c["id"] for c, seen in zip(sof["comps"], dc_seen) if not seen
    ]
    if missing:
        raise UnsupportedImageError(
            f"JPEG: no DC scan for component(s) {missing} — "
            "incomplete scan set"
        )
    return _render_coeffs(sof, coeffs, qtabs)


def _scan_tables(htabs, td, ta, need_dc, need_ac):
    dc_tab = ac_tab = None
    if need_dc:
        dc_tab = htabs.get((0, td))
        if dc_tab is None:
            raise UnsupportedImageError(f"JPEG: missing DC table {td}")
    if need_ac:
        ac_tab = htabs.get((1, ta))
        if ac_tab is None:
            raise UnsupportedImageError(f"JPEG: missing AC table {ta}")
    return dc_tab, ac_tab


def _decode_scan_coeffs(
    blob, start, sof, scan, htabs, restart_interval,
    coeffs, ss, se, ah, al, dc_seen,
):
    """Decode ONE scan's entropy-coded segment into the coefficient
    buffers; returns the position of the next marker after the scan.
    Handles all five scan shapes: sequential full-band, progressive DC
    first / DC refine (interleaved), progressive AC first / AC refine
    (single-component, EOBRUN + correction bits — T.81 G.1.2)."""
    progressive = sof["progressive"]
    dc_band = ss == 0
    if progressive:
        if dc_band and se != 0:
            raise UnsupportedImageError(
                "JPEG: progressive DC scan with Se != 0"
            )
        if not dc_band and len(scan) != 1:
            raise UnsupportedImageError(
                "JPEG: progressive AC scan must be single-component"
            )
        if se > 63 or ss > se:
            raise UnsupportedImageError("JPEG: bad spectral band")
        if ah and ah != al + 1:
            raise UnsupportedImageError(
                "JPEG: successive approximation must refine one bit"
            )
    br = _BitReader(blob, start)

    if len(scan) > 1:
        def mcu_iter():
            for my in range(sof["mcus_y"]):
                for mx in range(sof["mcus_x"]):
                    yield [
                        (ci, comp, td, ta,
                         my * comp["v"] + by, mx * comp["h"] + bx)
                        for (ci, comp, td, ta) in scan
                        for by in range(comp["v"])
                        for bx in range(comp["h"])
                    ]
    else:
        ci0, comp0, td0, ta0 = scan[0]
        def mcu_iter():
            for by in range(comp0["nb_y"]):
                for bx in range(comp0["nb_x"]):
                    yield [(ci0, comp0, td0, ta0, by, bx)]

    tabs = {
        ci: _scan_tables(
            htabs, td, ta,
            need_dc=(not progressive or (dc_band and ah == 0)),
            need_ac=(not progressive or not dc_band),
        )
        for ci, comp, td, ta in scan
    }
    preds = {ci: 0 for ci, *_ in scan}
    eobrun = 0
    mcu_count = 0
    for blocks in mcu_iter():
        if restart_interval and mcu_count and (
            mcu_count % restart_interval == 0
        ):
            br.restart()
            preds = {ci: 0 for ci in preds}
            eobrun = 0
        for ci, comp, td, ta, by, bx in blocks:
            dc_tab, ac_tab = tabs[ci]
            zz = coeffs[ci][by, bx]
            if not progressive:
                s = _decode_huff(br, dc_tab)
                diff = _extend(br.receive(s), s) if s else 0
                preds[ci] += diff
                blk = np.zeros(64, dtype=np.int64)
                blk[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _decode_huff(br, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise UnsupportedImageError(
                            "JPEG: AC index overrun"
                        )
                    blk[k] = _extend(br.receive(s), s)
                    k += 1
                coeffs[ci][by, bx] = blk
                dc_seen[ci] = True
            elif dc_band and ah == 0:  # DC first
                s = _decode_huff(br, dc_tab)
                diff = _extend(br.receive(s), s) if s else 0
                preds[ci] += diff
                zz[0] = preds[ci] << al
                dc_seen[ci] = True
            elif dc_band:  # DC refine: one raw bit per block
                if br.read_bit():
                    zz[0] = int(zz[0]) | (1 << al)
            elif ah == 0:  # AC first
                eobrun = _ac_first_block(br, zz, ac_tab, ss, se, al,
                                         eobrun)
            else:  # AC refine
                eobrun = _ac_refine_block(br, zz, ac_tab, ss, se, al,
                                          eobrun)
        mcu_count += 1

    # entropy data done; find the next marker (skip stuffing and RSTn)
    p = br.pos
    while p + 1 < len(blob):
        if (
            blob[p] == 0xFF
            and blob[p + 1] != 0x00
            and not (0xD0 <= blob[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return len(blob)


def _ac_first_block(br, zz, ac_tab, ss, se, al, eobrun):
    """Progressive AC first pass for one block (T.81 G.1.2.2): values
    arrive Al-shifted; EOBn codes (s=0, r<15) start a run of
    (1<<r)+bits end-of-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            return eobrun
        k += r
        if k > se:
            raise UnsupportedImageError("JPEG: AC band overrun")
        zz[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, zz, ac_tab, ss, se, al, eobrun):
    """Progressive AC refinement for one block (T.81 G.1.2.3): newly
    nonzero coefficients arrive as ±(1<<Al) (s must be 1); every
    already-nonzero coefficient traversed costs one correction bit
    (two's-complement test against the Al bit — Python ints share C's
    semantics here); EOBn covers the rest of this block plus following
    whole blocks, correction bits still consumed during traversal."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # ZRL: skip 16 zero-history slots (val stays 0)
            else:
                if s != 1:
                    raise UnsupportedImageError(
                        "JPEG: refinement magnitude must be 1"
                    )
                val = p1 if br.read_bit() else m1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _render_coeffs(sof, coeffs, qtabs) -> np.ndarray:
    """Coefficient buffers → pixels: vectorized dezigzag, dequantize,
    einsum IDCT over all blocks at once, pinned round-half-up,
    replication upsampling, fixed-point color convert."""
    h, w = sof["h"], sof["w"]
    comps = sof["comps"]
    hmax, vmax = sof["hmax"], sof["vmax"]
    planes = []
    for comp, cf in zip(comps, coeffs):
        q = qtabs.get(comp["tq"])
        if q is None:
            raise UnsupportedImageError(
                f"JPEG: missing quant table {comp['tq']}"
            )
        nat = np.zeros_like(cf)
        nat[:, :, ZIGZAG] = cf
        by, bx = cf.shape[:2]
        deq = nat.reshape(by, bx, 8, 8).astype(np.float64) * q
        blk = np.einsum("ij,abjk,kl->abil", _C.T, deq, _C)
        planes.append(blk.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    # pinned round-half-up after level shift, then clamp
    pix = [
        np.clip(np.floor(p + 128.5), 0, 255).astype(np.int64)
        for p in planes
    ]
    full = []
    for c, p in zip(comps, pix):
        ry, rx = vmax // c["v"], hmax // c["h"]
        up = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        g = full[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return ycbcr_to_rgb_fixed(np.stack(full, axis=-1))


# ---------------------------------------------------------------------------
# Progressive encoder twin
# ---------------------------------------------------------------------------


def _flat_table(symbols):
    """All-same-length canonical Huffman table over ``symbols`` — valid
    (n codes of length L is canonical whenever n <= 2^L - 1),
    deliberately uncompressed: the progressive twin optimizes for
    decoder-path coverage (it needs EOBn symbols Annex K tables lack),
    not for size."""
    syms = list(symbols)
    length = max(2, (len(syms) + 1).bit_length())
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, syms


_PROG_DC = _flat_table(range(12))
# EOBn (r<15, s=0), ZRL, and (r, s=1..10): everything the progressive
# scan types can emit
_PROG_AC = _flat_table(
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


class _ProgScanWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with
    the EOBRUN accumulator and the buffered-correction-bit (BE) queue
    that EOB codes carry (T.81 G.1.2.3 / figure G.7 semantics)."""

    def __init__(self, dc_codes, ac_codes) -> None:
        self.bw = _BitWriter()
        self.dc = dc_codes
        self.ac = ac_codes
        self.eobrun = 0
        self.be: list[int] = []

    def sym_ac(self, rs: int) -> None:
        code, ln = self.ac[rs]
        self.bw.write(code, ln)

    def bits(self, bits: list[int]) -> None:
        for b in bits:
            self.bw.write(b, 1)

    def flush_eob(self) -> None:
        if self.eobrun:
            rr = self.eobrun.bit_length() - 1
            self.sym_ac(rr << 4)
            if rr:
                self.bw.write(self.eobrun - (1 << rr), rr)
            self.bits(self.be)
            self.be = []
            self.eobrun = 0

    def finish(self) -> bytes:
        self.flush_eob()
        self.bw.flush()
        return bytes(self.bw.out)

    def restart(self, n: int) -> None:
        """Emit an RSTn boundary: pending EOB state flushes (the
        decoder resets EOBRUN at a restart), bits byte-align, and the
        marker lands UNSTUFFED in the stream."""
        self.flush_eob()
        self.bw.flush()
        self.bw.out += bytes([0xFF, 0xD0 + n % 8])


def _emit_dc_diff(w: _ProgScanWriter, diff: int) -> None:
    s = _ssss(diff)
    code, ln = w.dc[s]
    w.bw.write(code, ln)
    if s:
        w.bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _emit_ac_first(w: _ProgScanWriter, zz, ss, se, al) -> None:
    """One block of an AC first pass: Al-shifted magnitudes (truncation
    toward zero), run-length + EOBRUN accumulation."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        vals.append(a if v >= 0 else -a)
    if not any(vals):
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eob()
        return
    w.flush_eob()
    r = 0
    for v in vals:
        if v == 0:
            r += 1
            continue
        while r > 15:
            w.sym_ac(0xF0)
            r -= 16
        s = _ssss(v)
        w.sym_ac((r << 4) | s)
        w.bw.write(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if r:
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eob()


def _emit_ac_refine(w: _ProgScanWriter, zz, ss, se, al) -> None:
    """One block of an AC refinement pass: newly-nonzero coefficients
    (|v|>>Al == 1) as RS codes with s=1 + a sign bit; already-nonzero
    coefficients contribute one correction bit each, buffered and
    emitted with the NEXT RS/ZRL/EOB code (stream order must match the
    decoder's traversal — see _ac_refine_block)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_pos = -1  # band-relative index of the last newly-nonzero coef
    for i, a in enumerate(absv):
        if a == 1:
            eob_pos = i
    r = 0
    br: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eob_pos:
            w.flush_eob()
            w.sym_ac(0xF0)
            r -= 16
            w.bits(br)
            br = []
        if a > 1:  # history coefficient: one correction bit
            br.append(a & 1)
            continue
        # newly nonzero
        w.flush_eob()
        w.sym_ac((r << 4) | 1)
        w.bw.write(1 if int(zz[ss + i]) > 0 else 0, 1)
        w.bits(br)
        br = []
        r = 0
    if r > 0 or br:
        w.eobrun += 1
        w.be.extend(br)
        if w.eobrun == 0x7FFF or len(w.be) > 900:
            w.flush_eob()


def encode_jpeg_progressive(
    arr: np.ndarray, subsample=False, restart_interval: int = 0
) -> bytes:
    """Deterministic PROGRESSIVE JFIF encoder twin: (H, W, 3) uint8 RGB
    → SOF2 bytes with a pinned scan script exercising every progressive
    decode path — interleaved DC first pass at Al=1, per-component AC
    first passes at Al=1 (the luma band split 1-5 / 6-63 to exercise
    spectral selection), then DC and AC refinement passes down to Al=0.

    Same pinned color convert / DCT / quantization as
    :func:`encode_jpeg_baseline`, so the final coefficient arrays are
    IDENTICAL — progressive transmission is a reordering, and decoded
    pixels must equal the baseline stream's decode bit-for-bit (the
    differential test in tests/test_jpegcodec.py).

    ``restart_interval`` > 0 emits DRI + RSTn boundaries every that
    many MCUs in every scan (blocks, for the non-interleaved AC
    scans), resetting DC predictors and EOB runs — exercising the
    decoder's progressive restart resets."""
    h, w = arr.shape[:2]
    planes = _component_planes(arr, subsample)
    qtabs = [JPEG_QUANT_LUMA, JPEG_QUANT_CHROMA]

    # quantized zigzag coefficient arrays per component (full padded
    # grid — identical arithmetic to the baseline encoder's inner loop)
    coeff = []
    for cid, hs, vs, tq, plane in planes:
        by, bx = plane.shape[0] // 8, plane.shape[1] // 8
        cf = np.zeros((by, bx, 64), dtype=np.int64)
        qzz = qtabs[tq][ZIGZAG].astype(np.float64)
        for yb in range(by):
            for xb in range(bx):
                block = plane[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] - 128
                cf[yb, xb] = _quantize_rha(
                    _fdct_block(block).reshape(64)[ZIGZAG], qzz
                )
        coeff.append(cf)

    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")
    out += _marker(0xE0, b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0]))
    for tq, q in enumerate(qtabs):
        out += _marker(0xDB, bytes([tq]) + bytes(q[ZIGZAG].tolist()))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for cid, hs, vs, tq, _ in planes:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _marker(0xC2, bytes(sof))  # SOF2: progressive
    for tc_th, (bits, syms) in ((0x00, _PROG_DC), (0x10, _PROG_AC)):
        out += _marker(0xC4, bytes([tc_th]) + bytes(bits) + bytes(syms))
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    dc_codes = _canonical_codes(*_PROG_DC)
    ac_codes = _canonical_codes(*_PROG_AC)

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        hdr = bytearray([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])  # DC table 0 / AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        return _marker(0xDA, bytes(hdr))

    def nb_grid(ci):
        _, hs, vs, _, _ = planes[ci]
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        return -(-ch // 8), -(-cw // 8)

    # --- scan 1: interleaved DC first pass, Al=1
    wtr = _ProgScanWriter(dc_codes, ac_codes)
    preds = [0] * len(planes)
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and (
                mcu_no % restart_interval == 0
            ):
                wtr.restart(mcu_no // restart_interval - 1)
                preds = [0] * len(planes)
            for ci, (cid, hs, vs, tq, _) in enumerate(planes):
                for yb in range(vs):
                    for xb in range(hs):
                        v = int(
                            coeff[ci][my * vs + yb, mx * hs + xb, 0]
                        ) >> 1  # arithmetic shift: T.81 DC point transform
                        _emit_dc_diff(wtr, v - preds[ci])
                        preds[ci] = v
            mcu_no += 1
    out += sos_header([p[0] for p in planes], 0, 0, 0, 1)
    out += wtr.finish()

    # --- AC first passes, Al=1 (luma band split for spectral selection)
    ac_first_bands = [(0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)]
    for ci, ss, se in ac_first_bands:
        wtr = _ProgScanWriter(dc_codes, ac_codes)
        nby, nbx = nb_grid(ci)
        blk_no = 0
        for yb in range(nby):
            for xb in range(nbx):
                if restart_interval and blk_no and (
                    blk_no % restart_interval == 0
                ):
                    wtr.restart(blk_no // restart_interval - 1)
                _emit_ac_first(wtr, coeff[ci][yb, xb], ss, se, 1)
                blk_no += 1
        out += sos_header([planes[ci][0]], ss, se, 0, 1)
        out += wtr.finish()

    # --- DC refinement to Al=0 (raw bits, interleaved)
    wtr = _ProgScanWriter(dc_codes, ac_codes)
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and (
                mcu_no % restart_interval == 0
            ):
                wtr.restart(mcu_no // restart_interval - 1)
            for ci, (cid, hs, vs, tq, _) in enumerate(planes):
                for yb in range(vs):
                    for xb in range(hs):
                        bit = int(
                            coeff[ci][my * vs + yb, mx * hs + xb, 0]
                        ) & 1
                        wtr.bw.write(bit, 1)
            mcu_no += 1
    out += sos_header([p[0] for p in planes], 0, 0, 1, 0)
    out += wtr.finish()

    # --- AC refinement to Al=0, one scan per component
    for ci in range(len(planes)):
        wtr = _ProgScanWriter(dc_codes, ac_codes)
        nby, nbx = nb_grid(ci)
        blk_no = 0
        for yb in range(nby):
            for xb in range(nbx):
                if restart_interval and blk_no and (
                    blk_no % restart_interval == 0
                ):
                    wtr.restart(blk_no // restart_interval - 1)
                _emit_ac_refine(wtr, coeff[ci][yb, xb], 1, 63, 0)
                blk_no += 1
        out += sos_header([planes[ci][0]], 1, 63, 1, 0)
        out += wtr.finish()

    out += b"\xff\xd9"
    return bytes(out)
