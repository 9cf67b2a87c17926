"""WebP LOSSLESS (VP8L) codec — pure stdlib/numpy, from the public
"WebP Lossless Bitstream Specification" (RFC 9649 §3) only: RIFF
container walk, LSB-first bit reading, canonical prefix codes (simple
two-symbol and code-length-coded forms, DEFLATE-style canonical
assignment), meta prefix groups, color cache, LZ77 backward references,
and the four transforms (predictor — all 14 modes, color transform,
subtract-green, color-indexing with sub-byte pixel bundling).

LZ77 distance codes 1..120 (the spec's "close neighbor" 2-D offsets,
``_DIST_CODES``) decode fully since r11: the literal table is pinned
THREE ways — against the spec's equivalent generative sort rule,
against libwebp's inverse ``plane_to_code_lut``, and differentially
via ``encode_webp_lossless(close_distances=True)`` round-trips — so a
transcription slip in any one representation is caught by the others.
Lossy VP8 stays a typed refusal in
:func:`..operators.imagecodec.sniff`'s dispatch (a real DCT codec is
out of stdlib scope).

:func:`encode_webp_lossless` is the deterministic encoder twin
(``build_pdf``/``encode_gif`` pattern): real, complete-Kraft prefix
codes (flat-complete length assignment — compression ratio is
irrelevant for a twin, validity is not), optional subtract-green /
constant-mode predictor / palette(+bundling) / color-cache / LZ77-run
paths so every decoder branch is differentially testable.

Like the other codecs, the per-pixel Python cost is quarantined to the
Arrow-batched decode stage (operators/multimodal real_decode) — at
100 TB the parallelism is per-IMAGE.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import UnsupportedImageError


class WebpError(UnsupportedImageError):
    """Malformed/unsupported VP8L content, typed with the real reason."""


# ---------------------------------------------------------------- bits


class _BitReader:
    """LSB-first bit reader (VP8L convention: within each byte the
    least-significant bit comes first).

    r15-opt (guide §4.2): ``read`` decodes the whole span with one
    ``int.from_bytes`` + shift instead of a per-bit loop — 2.1 M calls
    / 2.3 s of the single-core m21 pass. Identical bit semantics and
    the same typed truncation error."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        end_bit = p + n
        last_byte = (end_bit - 1) >> 3
        if last_byte >= len(self.data):
            raise WebpError("VP8L bitstream truncated")
        self.pos = end_bit
        chunk = int.from_bytes(self.data[p >> 3 : last_byte + 1], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)


class _BitWriter:
    """r15-opt: whole-byte flush through one ``int.to_bytes`` per write
    (was: one Python list append PER BIT plus a per-bit assembly loop
    in ``bytes()``) — identical LSB-first layout."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        acc = self.acc | ((value & ((1 << n) - 1)) << self.nbits)
        nbits = self.nbits + n
        nbytes = nbits >> 3
        if nbytes:
            self.buf += (acc & ((1 << (nbytes << 3)) - 1)).to_bytes(
                nbytes, "little"
            )
            acc >>= nbytes << 3
            nbits &= 7
        self.acc = acc
        self.nbits = nbits

    def bit_len(self) -> int:
        return (len(self.buf) << 3) + self.nbits

    def bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.nbits:
            out += bytes([self.acc])  # zero-padded final partial byte
        return out


# ------------------------------------------------------- prefix codes

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15]
_MAX_CODE_LEN = 15


class _PrefixCode:
    """Canonical prefix code: decode walks bit-by-bit accumulating
    MSB-first (the DEFLATE/VP8L tree-walk convention); codes assigned
    canonically (by length, then symbol order)."""

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise WebpError("prefix code with no symbols")
        if len(used) == 1:
            # single-symbol code: consumes 0 bits
            self.single = used[0][1]
            self.map = {}
            return
        self.single = None
        kraft = sum(2 ** (_MAX_CODE_LEN - l) for l, _ in used)
        if kraft != 1 << _MAX_CODE_LEN:
            raise WebpError(
                f"prefix code is not complete (kraft {kraft} != 2^15)"
            )
        self.map: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for l, s in sorted(used):
            code <<= (l - prev_len)
            self.map[(l, code)] = s
            code += 1
            prev_len = l

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # r15-opt: inline the per-bit pulls (this is the per-symbol hot
        # loop — 1.9 M calls); same MSB-first walk, same typed errors
        data = br.data
        ndata = len(data)
        p = br.pos
        acc = 0
        get = self.map.get
        for l in range(1, _MAX_CODE_LEN + 1):
            byte = p >> 3
            if byte >= ndata:
                raise WebpError("VP8L bitstream truncated")
            acc = (acc << 1) | ((data[byte] >> (p & 7)) & 1)
            p += 1
            s = get((l, acc))
            if s is not None:
                br.pos = p
                return s
        raise WebpError("invalid prefix code in bitstream")

    @staticmethod
    def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
        """symbol -> (code, length) under the same canonical rule (the
        encoder's side of the contract)."""
        used = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
        out: dict[int, tuple[int, int]] = {}
        code = 0
        prev_len = 0
        for l, s in used:
            code <<= (l - prev_len)
            out[s] = (code, l)
            code += 1
            prev_len = l
        return out


def _flat_complete_lengths(symbols: list[int], n: int) -> list[int]:
    """Complete-Kraft code lengths covering exactly ``symbols`` out of
    an ``n``-symbol alphabet: with k symbols, the first 2^L - k get
    length L-1 and the rest L (L = ceil(log2 k)) — always a valid,
    complete canonical code; optimality is not the twin's job."""
    k = len(symbols)
    lengths = [0] * n
    if k == 1:
        lengths[symbols[0]] = 1  # handled as simple/single by readers
        return lengths
    L = max(1, (k - 1).bit_length())
    shorter = (1 << L) - k
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = L - 1 if i < shorter and L > 1 else L
    return lengths


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl = _PrefixCode(
        cl_lengths if sum(1 for x in cl_lengths if x) > 1 else cl_lengths
    ) if sum(1 for x in cl_lengths if x) != 1 else None
    single = None
    if cl is None:
        single = next(i for i, x in enumerate(cl_lengths) if x)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    symbol = 0
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = single if cl is None else cl.decode(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol >= alphabet:
                    raise WebpError("code-length repeat overruns alphabet")
                lengths[symbol] = prev
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        elif s == 18:
            symbol += 11 + br.read(7)
        else:
            raise WebpError(f"invalid code-length symbol {s}")
    if symbol > alphabet:
        raise WebpError("code lengths overrun alphabet")
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet
        if first >= alphabet:
            raise WebpError("simple-code symbol outside alphabet")
        if num_symbols == 1:
            lengths[first] = 1
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.single = first
            pc.map = {}
            return pc
        second = br.read(8)
        if second >= alphabet:
            raise WebpError("simple-code symbol outside alphabet")
        if first == second:
            raise WebpError("simple code repeats a symbol")
        lengths[first] = lengths[second] = 1
        return _PrefixCode(lengths)
    lengths = _read_code_lengths(br, alphabet)
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) == 1:
        pc = _PrefixCode.__new__(_PrefixCode)
        pc.single = nz[0]
        pc.map = {}
        return pc
    return _PrefixCode(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix bucket → value (spec §3.7.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _write_prefix_value(bw: _BitWriter, value: int) -> int:
    """Inverse of :func:`_prefix_value` minus the extra bits (returns
    the bucket; caller emits the bucket through the prefix code, then
    this writes the extra bits). Buckets 0..39 cover values ≤ 2^20."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    bits = v.bit_length() - 2
    base = v >> bits
    code = 2 * bits + (base - 2) + 2
    extra = v - (base << bits)
    return code, extra, bits


# ------------------------------------------------------------ decoder

_CACHE_MULT = 0x1E35A7BD


def _cache_index(argb: int, bits: int) -> int:
    return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_image_stream(
    br: _BitReader, w: int, h: int, is_level0: bool
):
    """Decode one entropy-coded ARGB image (spec §3.7): optional
    transforms (level 0 only — handled by the caller), optional color
    cache, optional meta prefix groups (level 0 only), 5 prefix codes
    per group, literals + cache hits + LZ77 backrefs."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"color-cache bits {cache_bits} out of range")
    meta_ids = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = 2 + br.read(3)
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_image_stream(br, meta_w, mh, False)
        meta_ids = ((meta >> 8) & 0xFFFF).astype(np.int64).flatten()
        n_groups = int(meta_ids.max()) + 1
    cache_alpha = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_alpha)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    cache = [0] * cache_alpha
    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    i = 0
    while i < n:
        if meta_ids is not None:
            x, y = i % w, i // w
            g = int(
                meta_ids[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            )
            if g >= n_groups:
                raise WebpError("meta prefix group out of range")
        else:
            g = 0
        green_c, red_c, blue_c, alpha_c, dist_c = groups[g]
        s = green_c.decode(br)
        if s < 256:
            r = red_c.decode(br)
            b = blue_c.decode(br)
            a = alpha_c.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[i] = px
            if cache_bits:
                cache[_cache_index(px, cache_bits)] = px
            i += 1
        elif s < 280:
            length = _prefix_value(s - 256, br)
            d_code = _prefix_value(dist_c.decode(br), br)
            if d_code < 1:
                raise WebpError("LZ77 distance code must be >= 1")
            if d_code <= 120:
                # close neighborhood: (dx, dy) offset → scan-line
                # distance, clamped to 1 (spec: "if dist < 1, dist=1")
                dx, dy = _DIST_CODES[d_code - 1]
                d = max(1, dy * w + dx)
            else:
                d = d_code - 120
            if d < 1 or d > i:
                raise WebpError("LZ77 distance outside decoded window")
            for _ in range(length):
                if i >= n:
                    raise WebpError("LZ77 copy overruns the image")
                px = int(out[i - d])
                out[i] = px
                if cache_bits:
                    cache[_cache_index(px, cache_bits)] = px
                i += 1
        else:
            idx = s - 280
            if idx >= cache_alpha:
                raise WebpError("color-cache symbol without cache")
            out[i] = cache[idx]
            i += 1
    return out.reshape(h, w)


#: RFC 9649 §4.2.2: LZ77 distance codes 1..120 address a close 2-D
#: pixel neighborhood as (dx, dy) offsets; the scan-line distance is
#: dy*width + dx, clamped to >= 1; codes > 120 are direct distances
#: minus 120. The spec prints the list literally; it is equivalently
#: the neighborhood {dy 1..7, dx -7..8} ∪ {dy 0, dx 1..8} sorted by
#: (dx²+dy², larger dy first, positive dx before negative) — the
#: pytest pins this literal against BOTH that generative rule and
#: libwebp's inverse plane_to_code_lut, so a transcription slip in any
#: one representation is caught by the other two.
_DIST_CODES: list[tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

_DIST_TO_CODE = {off: i + 1 for i, off in enumerate(_DIST_CODES)}


def _dist_to_code(dist: int, w: int) -> int:
    """Inverse mapping for the encoder (libwebp VP8LDistanceToPlaneCode
    shape): a scan-line distance decomposes as (x, y) = (dist %% w,
    dist // w); it is a close code if (x, y) is in the neighborhood, or
    (x - w, y + 1) is (the negative-dx wrap); otherwise dist + 120."""
    y, x = divmod(dist, w)
    code = _DIST_TO_CODE.get((x, y))
    if code is None:
        code = _DIST_TO_CODE.get((x - w, y + 1))
    return code if code is not None else dist + 120


def _avg2(a, b):
    return (a + b) // 2


def _predict(mode: int, L, T, TL, TR):
    """One predictor (spec §3.5.1) over uint16 ARGB channel 4-vectors;
    shared verbatim by encoder and decoder so every mode is
    differentially testable."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int64)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        pa = int(np.abs(L - TL).sum())  # = Σ|p - T|, p = L+T-TL
        pb = int(np.abs(T - TL).sum())  # = Σ|p - L|
        return T if pa <= pb else L
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        ave = _avg2(L, T)
        d = ave - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))  # C truncation
        return np.clip(ave + half, 0, 255)
    raise WebpError(f"invalid predictor mode {mode}")


def _split_argb(px: int) -> np.ndarray:
    return np.array(
        [(px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF,
         px & 0xFF],
        dtype=np.int64,
    )


def _join_argb(v) -> int:
    return (
        (int(v[0]) & 0xFF) << 24 | (int(v[1]) & 0xFF) << 16
        | (int(v[2]) & 0xFF) << 8 | (int(v[3]) & 0xFF)
    )


def _apply_predictor_inverse(img: np.ndarray, modes: np.ndarray,
                             size_bits: int) -> np.ndarray:
    h, w = img.shape
    out = np.zeros_like(img)
    mw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = int(
                    (modes[y >> size_bits, x >> size_bits] >> 8) & 0xFF
                )
            L = _split_argb(int(out[y, x - 1])) if x else None
            T = _split_argb(int(out[y - 1, x])) if y else None
            TL = _split_argb(int(out[y - 1, x - 1])) if x and y else (
                T if y else None
            )
            # TR uses contiguous-buffer addressing (libwebp
            # data[pos-width+1]): on the rightmost column it wraps to
            # the LEFTMOST reconstructed pixel of the CURRENT row, not T.
            TR = (
                _split_argb(int(out[y - 1, x + 1]))
                if y and x + 1 < w
                else (_split_argb(int(out[y, 0])) if y else None)
            )
            pred = _predict(mode, L, T, TL, TR)
            res = _split_argb(int(img[y, x]))
            out[y, x] = _join_argb((res + pred) & 0xFF)
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product >> 5 (arithmetic)."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _apply_color_transform_inverse(img: np.ndarray, cte: np.ndarray,
                                   size_bits: int) -> np.ndarray:
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            e = int(cte[y >> size_bits, x >> size_bits])
            g2r = e & 0xFF
            g2b = (e >> 8) & 0xFF
            r2b = (e >> 16) & 0xFF
            px = int(out[y, x])
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def decode_webp(blob: bytes) -> np.ndarray:
    """Decode a lossless WebP (VP8L chunk) to (H, W, 3) uint8 (alpha
    dropped, like the other decoders). Lossy 'VP8 ' chunks raise the
    typed refusal; 'VP8X' extended containers are walked to find a
    VP8L chunk."""
    blob = bytes(blob)
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise WebpError("not a WebP RIFF container")
    pos = 12
    payload = None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag == b"VP8 ":
            raise WebpError(
                "lossy WebP (VP8 DCT codec) is out of stdlib scope;"
                " only VP8L lossless decodes"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise WebpError("WebP container has no VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise WebpError("VP8L version != 0")

    transforms = []  # applied in reverse order after main decode
    cur_w = w
    seen = set()
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise WebpError(f"transform {t} repeated")
        seen.add(t)
        if t == 0:  # predictor
            size_bits = 2 + br.read(3)
            mw = (cur_w + (1 << size_bits) - 1) >> size_bits
            mh = (h + (1 << size_bits) - 1) >> size_bits
            data = _decode_image_stream(br, mw, mh, False)
            transforms.append(("predictor", size_bits, data))
        elif t == 1:  # color transform
            size_bits = 2 + br.read(3)
            mw = (cur_w + (1 << size_bits) - 1) >> size_bits
            mh = (h + (1 << size_bits) - 1) >> size_bits
            data = _decode_image_stream(br, mw, mh, False)
            transforms.append(("color", size_bits, data))
        elif t == 2:
            transforms.append(("subtract_green",))
        else:  # color indexing
            psize = br.read(8) + 1
            pal_img = _decode_image_stream(br, psize, 1, False)
            # palette entries are DELTA-coded componentwise
            pal = np.zeros(psize, dtype=np.uint32)
            prev = 0
            for i in range(psize):
                cur = _join_argb(
                    (_split_argb(int(pal_img[0, i]))
                     + _split_argb(prev)) & 0xFF
                )
                pal[i] = cur
                prev = cur
            if psize <= 2:
                xbits = 3
            elif psize <= 4:
                xbits = 2
            elif psize <= 16:
                xbits = 1
            else:
                xbits = 0
            transforms.append(("palette", xbits, pal, psize))
            cur_w = (cur_w + (1 << xbits) - 1) >> xbits
    img = _decode_image_stream(br, cur_w, h, True)
    for tr in reversed(transforms):
        if tr[0] == "palette":
            _, xbits, pal, psize = tr
            if xbits:
                per = 1 << xbits
                bits = 8 >> xbits
                mask = (1 << bits) - 1
                idx = np.zeros((h, w), dtype=np.int64)
                greens = (img >> 8) & 0xFF
                for x in range(w):
                    packed = greens[:, x >> xbits]
                    idx[:, x] = (packed >> (bits * (x % per))) & mask
            else:
                idx = ((img >> 8) & 0xFF).astype(np.int64)
                idx = idx[:, :w]
            if int(idx.max()) >= psize:
                raise WebpError("palette index out of range")
            img = pal[idx]
        elif tr[0] == "subtract_green":
            g = (img >> 8) & 0xFF
            r = (((img >> 16) & 0xFF) + g) & 0xFF
            b = ((img & 0xFF) + g) & 0xFF
            img = (img & 0xFF00FF00) | (r << 16) | b
        elif tr[0] == "predictor":
            img = _apply_predictor_inverse(img, tr[2], tr[1])
        elif tr[0] == "color":
            img = _apply_color_transform_inverse(img, tr[2], tr[1])
    out = np.zeros((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = (img >> 16) & 0xFF
    out[:, :, 1] = (img >> 8) & 0xFF
    out[:, :, 2] = img & 0xFF
    return out


# ------------------------------------------------------------ encoder


def _emit_symbol(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, length = codes[sym]
    # canonical bits, MSB first — one LSB-first write of the
    # bit-reversed code is the identical stream (r15-opt: was one
    # write call PER BIT)
    rev = 0
    for _ in range(length):
        rev = (rev << 1) | (code & 1)
        code >>= 1
    bw.write(rev, length)


def _write_code(bw: _BitWriter, used: list[int], alphabet: int) -> dict:
    """Emit one prefix-code definition; return symbol → (code, len)
    (zero-length for the single-symbol case)."""
    used = sorted(set(used))
    if len(used) == 1 and used[0] <= 255:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit form
        bw.write(used[0], 8)
        return {used[0]: (0, 0)}
    if len(used) == 2 and used[1] <= 255:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        bw.write(1, 1)
        bw.write(used[0], 8)
        bw.write(used[1], 8)
        lengths = [0] * alphabet
        lengths[used[0]] = lengths[used[1]] = 1
        return _PrefixCode.canonical_codes(lengths)
    # normal: flat-complete lengths, code-length-coded verbatim
    bw.write(0, 1)
    lengths = _flat_complete_lengths(used, alphabet)
    cl_used = sorted(set(lengths))
    cl_lengths = _flat_complete_lengths(cl_used, 19) if len(
        cl_used) > 1 else [0] * 19
    if len(cl_used) == 1:
        cl_lengths[cl_used[0]] = 1
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19
    for s in _CLC_ORDER:
        bw.write(cl_lengths[s], 3)
    bw.write(0, 1)  # no max-symbol shortcut
    if len(cl_used) == 1:
        # single-symbol CL code: zero bits per entry, nothing to emit
        pass
    else:
        cl_codes = _PrefixCode.canonical_codes(cl_lengths)
        for l in lengths:
            _emit_symbol(bw, cl_codes, l)
    if len([s for s in used if lengths[s] > 0]) == 1:
        return {used[0]: (0, 0)}
    return _PrefixCode.canonical_codes(lengths)


def _write_entropy_image(bw: _BitWriter, img: np.ndarray,
                         is_level0: bool = False) -> None:
    """Emit one entropy-coded ARGB image: no cache, no meta, literal
    pixels only, flat-complete codes per channel."""
    h, w = img.shape
    alphas = sorted({int(p) >> 24 & 0xFF for p in img.flat})
    reds = sorted({int(p) >> 16 & 0xFF for p in img.flat})
    greens = sorted({int(p) >> 8 & 0xFF for p in img.flat})
    blues = sorted({int(p) & 0xFF for p in img.flat})
    bw.write(0, 1)  # no color cache
    if is_level0:
        bw.write(0, 1)  # no meta prefix image
    gc = _write_code(bw, greens, 256 + 24)
    rc = _write_code(bw, reds, 256)
    bc = _write_code(bw, blues, 256)
    ac = _write_code(bw, alphas, 256)
    dc = _write_code(bw, [0], 40)
    for p in img.flat:
        p = int(p)
        _emit_symbol(bw, gc, (p >> 8) & 0xFF)
        _emit_symbol(bw, rc, (p >> 16) & 0xFF)
        _emit_symbol(bw, bc, p & 0xFF)
        _emit_symbol(bw, ac, (p >> 24) & 0xFF)
    _ = dc


def encode_webp_lossless(
    arr: np.ndarray,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    close_distances: bool = False,
) -> bytes:
    """(H, W, 3) uint8 → a real lossless WebP file. Options exercise
    the decoder's branches differentially: ``subtract_green``, a
    constant-``predictor_mode`` transform (any of the 14 modes — the
    transform image is a zero-bit single-symbol stream), ``palette``
    (color indexing, with sub-byte bundling when ≤16 colors),
    ``cache_bits`` (color cache hits), and ``lz77`` (identical-pixel
    runs as backrefs with DIRECT distance codes — the close-code table
    is never needed). Options compose with the spec's forward order
    (predictor, then subtract-green); palette excludes the others."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    if not (1 <= w <= (1 << 14)) or not (1 <= h <= (1 << 14)):
        raise ValueError(
            f"VP8L dimensions {w}x{h} outside 1..16384 (14-bit fields)"
        )
    img = (
        np.full((h, w), 0xFF000000, dtype=np.uint64)
        | (arr[:, :, 0].astype(np.uint64) << 16)
        | (arr[:, :, 1].astype(np.uint64) << 8)
        | arr[:, :, 2].astype(np.uint64)
    )
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    if palette:
        if subtract_green or predictor_mode is not None:
            raise ValueError("palette excludes the other transforms")
        colors = sorted({int(p) for p in img.flat})
        psize = len(colors)
        if psize > 256:
            raise ValueError(f"{psize} distinct colors exceed a palette")
        lookup = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(psize - 1, 8)
        deltas = np.zeros((1, psize), dtype=np.uint64)
        prev = 0
        for i, c in enumerate(colors):
            deltas[0, i] = _join_argb(
                (_split_argb(c) - _split_argb(prev)) & 0xFF
            )
            prev = c
        _write_entropy_image(bw, deltas)
        idx = np.vectorize(lookup.get)(img).astype(np.uint64)
        if psize <= 2:
            xbits = 3
        elif psize <= 4:
            xbits = 2
        elif psize <= 16:
            xbits = 1
        else:
            xbits = 0
        if xbits:
            per = 1 << xbits
            bits = 8 >> xbits
            pw = (w + per - 1) >> xbits
            packed = np.zeros((h, pw), dtype=np.uint64)
            for x in range(w):
                packed[:, x >> xbits] |= idx[:, x] << (bits * (x % per))
            img = 0xFF000000 | (packed << 8)
        else:
            img = 0xFF000000 | (idx << 8)
        bw.write(0, 1)  # end of transforms
        _write_main_image(bw, img, cache_bits=0, lz77=False)
        return _riff_wrap(bw, 1 + (bw.bit_len() + 7) // 8)
    if predictor_mode is not None:
        size_bits = 4
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        mw = (w + (1 << size_bits) - 1) >> size_bits
        mh = (h + (1 << size_bits) - 1) >> size_bits
        modes = np.full(
            (mh, mw), 0xFF000000 | (predictor_mode << 8), dtype=np.uint64
        )
        _write_entropy_image(bw, modes)
        # forward: residual = pixel - predict(reconstructed neighbors);
        # reconstructed == original, so predict from the original image
        res = np.zeros_like(img)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    mode = 0
                elif y == 0:
                    mode = 1
                elif x == 0:
                    mode = 2
                else:
                    mode = predictor_mode
                L = _split_argb(int(img[y, x - 1])) if x else None
                T = _split_argb(int(img[y - 1, x])) if y else None
                TL = _split_argb(int(img[y - 1, x - 1])) if x and y else (
                    T if y else None
                )
                # rightmost column: TR wraps to the leftmost pixel of
                # the current row (contiguous addressing, matches the
                # inverse pass); reconstructed == original here.
                TR = (
                    _split_argb(int(img[y - 1, x + 1]))
                    if y and x + 1 < w
                    else (_split_argb(int(img[y, 0])) if y else None)
                )
                pred = _predict(mode, L, T, TL, TR)
                res[y, x] = _join_argb(
                    (_split_argb(int(img[y, x])) - pred) & 0xFF
                )
        img = res
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = (img >> 8) & 0xFF
        r = (((img >> 16) & 0xFF) - g) & 0xFF
        b = ((img & 0xFF) - g) & 0xFF
        img = (img & np.uint64(0xFF00FF00)) | (r << 16) | b
    bw.write(0, 1)  # end of transforms
    _write_main_image(
        bw, img, cache_bits=cache_bits, lz77=lz77,
        close_distances=close_distances,
    )
    return _riff_wrap(bw, 0)


def _write_main_image(bw: _BitWriter, img: np.ndarray, cache_bits: int,
                      lz77: bool, close_distances: bool = False) -> None:
    h, w = img.shape
    pixels = [int(p) for p in img.flat]
    # plan the token stream first (symbol sets drive the code tables)
    tokens = []  # ("lit", px) | ("cache", idx) | ("ref", length, dist)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    n = len(pixels)
    while i < n:
        px = pixels[i]
        if lz77 and i > 0 and pixels[i - 1] == px:
            run = 0
            while i + run < n and pixels[i + run] == px:
                run += 1
            if run >= 3:
                tokens.append(("ref", run, 1))
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                i += run
                continue
        if close_distances and lz77 and i >= w:
            # previous-row match (distance w → close code 1, offset
            # (0,1)): the copy the close-distance table exists for
            run = 0
            while i + run < n and pixels[i + run - w] == pixels[i + run]:
                run += 1
            if run >= 3:
                if cache is not None:
                    for j in range(run):
                        p2 = pixels[i + j]
                        cache[_cache_index(p2, cache_bits)] = p2
                tokens.append(("ref", run, w))
                i += run
                continue
        if cache is not None:
            ci = _cache_index(px, cache_bits)
            if cache[ci] == px:
                tokens.append(("cache", ci))
                i += 1
                continue
            cache[ci] = px
        tokens.append(("lit", px))
        i += 1
    greens, reds, blues, alphas, dists = set(), set(), set(), set(), {0}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            greens.add((px >> 8) & 0xFF)
            reds.add((px >> 16) & 0xFF)
            blues.add(px & 0xFF)
            alphas.add((px >> 24) & 0xFF)
        elif t[0] == "cache":
            greens.add(280 + t[1])
        else:
            lcode, _, _ = _write_prefix_value(None, t[1])
            greens.add(256 + lcode)
            dsym = (
                _dist_to_code(t[2], w) if close_distances else t[2] + 120
            )
            dcode, _, _ = _write_prefix_value(None, dsym)
            dists.add(dcode)
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix image (level 0)
    cache_alpha = (1 << cache_bits) if cache_bits else 0
    gc = _write_code(bw, sorted(greens), 256 + 24 + cache_alpha)
    rc = _write_code(bw, sorted(reds) or [0], 256)
    bc = _write_code(bw, sorted(blues) or [0], 256)
    ac = _write_code(bw, sorted(alphas) or [0], 256)
    dc = _write_code(bw, sorted(dists), 40)
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            _emit_symbol(bw, gc, (px >> 8) & 0xFF)
            _emit_symbol(bw, rc, (px >> 16) & 0xFF)
            _emit_symbol(bw, bc, px & 0xFF)
            _emit_symbol(bw, ac, (px >> 24) & 0xFF)
        elif t[0] == "cache":
            _emit_symbol(bw, gc, 280 + t[1])
        else:
            lcode, lextra, lbits = _write_prefix_value(None, t[1])
            _emit_symbol(bw, gc, 256 + lcode)
            bw.write(lextra, lbits)
            dsym = (
                _dist_to_code(t[2], w) if close_distances else t[2] + 120
            )
            dcode, dextra, dbits = _write_prefix_value(None, dsym)
            _emit_symbol(bw, dc, dcode)
            bw.write(dextra, dbits)


def _riff_wrap(bw: _BitWriter, _unused: int) -> bytes:
    payload = b"\x2f" + bw.bytes()
    if len(payload) & 1:
        padded = payload + b"\x00"
    else:
        padded = payload
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(padded))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + padded
    )
