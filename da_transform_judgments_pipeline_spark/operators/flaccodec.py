"""FLAC (RFC 9639 / the public FLAC format spec) — lossless audio for
the multimodal corpus, pure stdlib.

WAV/G.711 (``audiocodec``) covered the uncompressed/companded audio a
corpus carries; FLAC is the dominant LOSSLESS-compressed form.  This
module implements the real bitstream, decode-complete for the format
features that appear in practice:

- stream layout: ``fLaC`` magic, STREAMINFO (+ skippable metadata
  blocks), frames with CRC-8-checked headers and CRC-16-checked bodies;
- frame headers: UTF-8-style coded frame/sample numbers, all block-size
  / sample-rate / sample-size code forms, fixed and variable blocking;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + shift), wasted-bits unpacking (encoder twin covers both);
- residuals: partitioned Rice coding (4-bit and 5-bit parameter forms),
  zigzag unfold, escape-coded raw partitions;
- inter-channel decorrelation: independent, left/side, right/side,
  mid/side (side channel carries the +1 bit);
- integrity: header CRC-8, frame CRC-16, and the STREAMINFO MD5 over
  the decoded interleaved little-endian samples are all RE-VERIFIED
  (the ``digest_ok`` posture of the WARC layer applied to audio).

:func:`encode_flac` is the deterministic encoder twin (the
``build_warc_gz`` / ``encode_webp_lossless`` pattern): real,
decoder-agnostic FLAC bytes covering constant/verbatim/fixed subframes,
both Rice parameter forms, escape partitions and every channel mode,
with genuine CRCs and MD5 — so closed-form oracles can recompute every
decoded sample.  Lossy codecs (MP3/AAC/Vorbis) remain typed refusals —
no stdlib path exists, and a silently-wrong decode is worse than none.

Scale: decode is per-file inside Arrow-batched stages (the
imagecodec/jpegcodec shape) — embarrassingly parallel, bomb-bounded by
the declared total-sample count before allocation.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "FlacError",
    "FLAC_MAX_SAMPLES",
    "decode_flac",
    "encode_flac",
]

#: Refuse streams declaring more samples than this before allocating.
FLAC_MAX_SAMPLES = 64 << 20


class FlacError(ValueError):
    """Malformed or unsupported FLAC data (typed for report mode)."""


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        tbl.append(crc)
    return tbl


# r15-opt (guide §4.2 — make the per-task Python work fast): the bitwise
# CRC loops were 6.4 s of a 14.9 s single-core m27 pass; the standard
# 256-entry table form computes the identical polynomial division one
# byte at a time (pinned byte-for-byte against the bitwise twin in
# tests/test_flaccodec.py).
_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    tbl = _CRC8_TABLE
    for b in data:
        crc = tbl[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    tbl = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ tbl[(crc >> 8) ^ b]
    return crc


class _BitReader:
    """MSB-first bit reader with a byte-position anchor for CRC spans.

    r15-opt (guide §4.2): ``read`` was 13 M calls / 19 s of a 14.9 s
    single-core m27 pass with its per-byte loop, and ``read_unary``
    pulled one bit per call on top of it. ``read`` now decodes the whole
    bit span with ONE ``int.from_bytes`` + shift, and ``read_unary``
    scans for the terminating set bit a byte at a time via
    ``bit_length`` — identical bit semantics, same typed errors."""

    __slots__ = ("b", "pos", "nbits")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos * 8
        self.nbits = len(b) * 8

    def read(self, n: int) -> int:
        p = self.pos
        end_bit = p + n
        if end_bit > self.nbits:
            raise FlacError("truncated bitstream")
        self.pos = end_bit
        end = (end_bit + 7) >> 3
        return (
            int.from_bytes(self.b[p >> 3 : end], "big")
            >> ((end << 3) - end_bit)
        ) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        b = self.b
        p = self.pos
        nbits = self.nbits
        q = 0
        while True:
            if p >= nbits:
                raise FlacError("truncated bitstream")
            # mask off the already-consumed high bits of this byte
            byte = b[p >> 3] & (0xFF >> (p & 7))
            if byte == 0:
                q += 8 - (p & 7)
                p = (p & ~7) + 8
                if q > 1 << 20:
                    raise FlacError("runaway unary code")
                continue
            lead = 8 - byte.bit_length()  # zeros before the set bit
            q += lead - (p & 7)
            if q > 1 << 20:
                raise FlacError("runaway unary code")
            self.pos = (p & ~7) + lead + 1
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_coded_number(r: _BitReader) -> int:
    """The frame header's UTF-8-style variable-length number."""
    first = r.read(8)
    if first < 0x80:
        return first
    ones = 0
    mask = 0x80
    while first & mask:
        ones += 1
        mask >>= 1
    if ones < 2 or ones > 7:
        raise FlacError(f"bad coded-number lead byte 0x{first:02x}")
    ncont = ones - 1
    val = first & (0xFF >> (ones + 1))
    for _ in range(ncont):
        byte = r.read(8)
        if byte & 0xC0 != 0x80:
            raise FlacError("bad coded-number continuation byte")
        val = (val << 6) | (byte & 0x3F)
    return val


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_residual(r: _BitReader, blocksize: int, pred_order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    pbits = 4 + method  # rice (4-bit) or rice2 (5-bit) parameters
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise FlacError("block size not divisible by partition count")
    out: list[int] = []
    app = out.append  # r15-opt: bound methods off the hot rice loop
    read = r.read
    read_unary = r.read_unary
    for part in range(nparts):
        count = (blocksize >> porder) - (pred_order if part == 0 else 0)
        if count < 0:
            raise FlacError("partition smaller than predictor order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(count):
                app(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = read_unary()
                v = (q << param) | read(param)
                app((v >> 1) ^ -(v & 1))  # zigzag unfold
    return out


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise FlacError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [r.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        samples = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        # r15-opt: the generic sum-over-enumerate predictor was the
        # per-sample inner loop — the five fixed orders unroll to
        # closed-form difference reconstructions (identical integers)
        app = samples.append
        if order == 0:
            samples.extend(resid)
        elif order == 1:
            a = samples[-1]
            for res in resid:
                a = res + a
                app(a)
        elif order == 2:
            a, b = samples[-1], samples[-2]
            for res in resid:
                v = res + 2 * a - b
                app(v)
                b = a
                a = v
        elif order == 3:
            a, b, c = samples[-1], samples[-2], samples[-3]
            for res in resid:
                v = res + 3 * a - 3 * b + c
                app(v)
                c = b
                b = a
                a = v
        else:
            a, b, c, d = samples[-1], samples[-2], samples[-3], samples[-4]
            for res in resid:
                v = res + 4 * a - 6 * b + 4 * c - d
                app(v)
                d = c
                c = b
                b = a
                a = v
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        samples = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise FlacError("invalid LPC precision code")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        app = samples.append
        for res in resid:
            acc = 0
            j = len(samples)
            for c in coefs:
                j -= 1
                acc += c * samples[j]
            app(res + (acc >> shift))
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _md5_interleave(channels_data, n_samples: int, bps: int) -> bytes:
    """The STREAMINFO MD5 input: decoded samples interleaved
    sample-major, each masked to the sample width and packed
    little-endian.  r15-opt (guide §4.2): the per-sample Python loop is
    replaced by a numpy transpose+pack for the 1/2/3/4-byte widths (bps
    is a 5-bit field + 1, so 4 bytes is the format maximum); the byte
    stream is identical, with the loop kept as fallback for samples
    numpy can't hold."""
    nbytes = (bps + 7) // 8
    mask = (1 << (8 * nbytes)) - 1
    try:
        import numpy as np

        arr = np.array(channels_data, dtype=np.int64)
        arr &= mask
        inter = arr.T.ravel()
        if nbytes == 3:
            return (
                inter.astype("<u4")
                .view(np.uint8)
                .reshape(-1, 4)[:, :3]
                .tobytes()
            )
        return inter.astype(f"<u{nbytes}").tobytes()
    except (ImportError, OverflowError):
        buf = bytearray()
        for i in range(n_samples):
            for ch in channels_data:
                buf += (ch[i] & mask).to_bytes(nbytes, "little")
        return bytes(buf)


_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}




def _parse_vorbis_comment(block: bytes) -> dict[str, str]:
    """VORBIS_COMMENT metadata (the public Vorbis comment spec FLAC
    embeds): vendor string + KEY=value pairs, all little-endian
    length-prefixed UTF-8.  Keys are case-insensitive → lowered."""
    out: dict[str, str] = {}
    if len(block) < 8:
        raise FlacError("truncated Vorbis comment block")
    vlen = int.from_bytes(block[0:4], "little")
    pos = 4 + vlen
    if pos + 4 > len(block):
        raise FlacError("truncated Vorbis comment vendor string")
    count = int.from_bytes(block[pos : pos + 4], "little")
    pos += 4
    for _ in range(count):
        if pos + 4 > len(block):
            raise FlacError("truncated Vorbis comment entry length")
        clen = int.from_bytes(block[pos : pos + 4], "little")
        pos += 4
        entry = block[pos : pos + clen]
        if len(entry) != clen:
            raise FlacError("truncated Vorbis comment entry")
        pos += clen
        try:
            text = entry.decode("utf-8")
        except UnicodeDecodeError as e:
            raise FlacError(f"non-UTF-8 Vorbis comment: {e}")
        if "=" not in text:
            raise FlacError(f"Vorbis comment without '=': {text[:40]!r}")
        k, v = text.split("=", 1)
        out[k.lower()] = v
    return out




def decode_flac(blob: bytes, max_samples: int = FLAC_MAX_SAMPLES) -> dict:
    """Decode a FLAC stream.  Returns ``sample_rate``, ``channels``,
    ``bits_per_sample``, ``samples`` (list per channel, ints),
    ``n_samples``, ``md5_ok`` (STREAMINFO MD5 re-verified over decoded
    audio; None when the encoder left it zeroed) and ``n_frames``."""
    if blob[:4] != b"fLaC":
        raise FlacError("missing fLaC magic")
    pos = 4
    streaminfo = None
    tags: dict[str, str] = {}
    last = False
    while not last:
        if pos + 4 > len(blob):
            raise FlacError("truncated metadata block header")
        head = int.from_bytes(blob[pos : pos + 4], "big")
        last = bool(head >> 31)
        btype = (head >> 24) & 0x7F
        length = head & 0xFFFFFF
        pos += 4
        if pos + length > len(blob):
            raise FlacError("truncated metadata block")
        if btype == 0:
            streaminfo = blob[pos : pos + length]
        elif btype == 4:  # VORBIS_COMMENT: the corpus's title/artist tags
            tags.update(_parse_vorbis_comment(blob[pos : pos + length]))
        elif btype == 127:
            raise FlacError("invalid metadata block type 127")
        pos += length
    if streaminfo is None or len(streaminfo) != 34:
        raise FlacError("missing or mis-sized STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_declared = streaminfo[18:34]
    if sample_rate == 0:
        raise FlacError("STREAMINFO sample rate is zero")
    if total > max_samples:
        raise FlacError(
            f"stream declares {total} samples, above bound {max_samples}"
        )
    out: list[list[int]] = [[] for _ in range(channels)]
    n_frames = 0
    while pos < len(blob):
        r = _BitReader(blob, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise FlacError(f"bad frame sync 0x{sync:04x} at byte {pos}")
        if r.read(1):
            raise FlacError("frame reserved bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise FlacError("frame header reserved bit set")
        _read_coded_number(r)
        if bs_code == 0:
            raise FlacError("reserved block size code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise FlacError("invalid sample rate code 15")
        frame_bps = bps if size_code == 0 else _BPS_CODES.get(size_code)
        if frame_bps is None:
            raise FlacError(f"reserved sample size code {size_code}")
        header_end = r.byte_pos()
        crc8 = r.read(8)
        if _crc8(blob[pos:header_end]) != crc8:
            raise FlacError("frame header CRC-8 mismatch")
        if chan_code < 8:
            n_chan = chan_code + 1
            if n_chan != channels:
                raise FlacError("frame channel count != STREAMINFO")
            chans = [
                _decode_subframe(r, blocksize, frame_bps)
                for _ in range(n_chan)
            ]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            if chan_code == 8:  # left/side
                left = _decode_subframe(r, blocksize, frame_bps)
                side = _decode_subframe(r, blocksize, frame_bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(r, blocksize, frame_bps + 1)
                right = _decode_subframe(r, blocksize, frame_bps)
                chans = [[rch + s for rch, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(r, blocksize, frame_bps)
                side = _decode_subframe(r, blocksize, frame_bps + 1)
                left_ch, right_ch = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    left_ch.append((m2 + s) >> 1)
                    right_ch.append((m2 - s) >> 1)
                chans = [left_ch, right_ch]
        else:
            raise FlacError(f"reserved channel assignment {chan_code}")
        r.align()
        body_end = r.byte_pos()
        crc16 = r.read(16)
        if _crc16(blob[pos:body_end]) != crc16:
            raise FlacError("frame CRC-16 mismatch")
        if sum(len(c) for c in out[:1]) + blocksize > max_samples:
            raise FlacError(f"decoded samples exceed bound {max_samples}")
        for i in range(channels):
            out[i].extend(chans[i])
        pos = r.byte_pos()
        n_frames += 1
    n_samples = len(out[0]) if out else 0
    if total and n_samples != total:
        raise FlacError(
            f"decoded {n_samples} samples, STREAMINFO declares {total}"
        )
    md5_ok = None
    if md5_declared != b"\x00" * 16:
        md5_ok = (
            hashlib.md5(_md5_interleave(out, n_samples, bps)).digest()
            == md5_declared
        )
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bps,
        "samples": out,
        "n_samples": n_samples,
        "n_frames": n_frames,
        "md5_ok": md5_ok,
        "tags": tags,
    }


# ---------------------------------------------------------------------------
# Encoder twin
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        # r15-opt: flush whole bytes with ONE int.to_bytes instead of a
        # per-byte Python loop — identical bit layout
        acc = (self.acc << n) | (value & ((1 << n) - 1))
        nbits = self.nbits + n
        if nbits >= 8:
            rem = nbits & 7
            self.buf += (acc >> rem).to_bytes(nbits >> 3, "big")
            acc &= (1 << rem) - 1
            nbits = rem
        self.acc = acc
        self.nbits = nbits

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _write_coded_number(w: _BitWriter, n: int) -> None:
    if n < 0x80:
        w.write(n, 8)
        return
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31)):
        if n < (1 << bits):
            break
    else:
        raise ValueError(f"coded number {n} out of range")
    lead_mask = (0xFF >> (8 - nbytes)) << (8 - nbytes)
    w.write(lead_mask | (n >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _rice_write(w: _BitWriter, resid: list[int], param: int) -> None:
    # r15-opt: one write per value — q leading zeros, the terminating 1
    # and the param low bits are one (q+1+param)-bit integer whose top q
    # bits are zero by construction; bit-identical to the 3-write form
    mask = (1 << param) - 1
    one = 1 << param
    write = w.write
    for v in resid:
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1
        write(one | (z & mask), (z >> param) + 1 + param)


def _lpc_coefs(order: int) -> tuple[list[int], int, int]:
    """Deterministic quantized-LPC parameters for the twin: small
    alternating coefficients (always inside 5-bit precision), shift 2.
    ANY integer coefficients are losslessly invertible — the residual
    stores exactly what the prediction misses."""
    coefs = [((-1) ** j) * (((j * 3) % 6) + 1) for j in range(order)]
    return coefs, 5, 2


def _write_subframe(
    w: _BitWriter,
    samples: list[int],
    bps: int,
    kind: str,
    rice_param: int,
    rice2: bool = False,
    escape: bool = False,
    wasted_bits: int = 0,
) -> None:
    w.write(0, 1)  # padding
    if wasted_bits:
        if any(s & ((1 << wasted_bits) - 1) for s in samples):
            raise ValueError(
                f"samples not divisible by 2^{wasted_bits} wasted bits"
            )
        samples = [s >> wasted_bits for s in samples]
    eff = bps - wasted_bits

    def _type_and_wasted(code: int) -> None:
        w.write(code, 6)
        if wasted_bits:
            w.write(1, 1)
            # unary count-1: (k-1) zeros then a terminating 1
            w.write(1, wasted_bits)
        else:
            w.write(0, 1)

    if kind == "constant":
        _type_and_wasted(0)
        w.write(samples[0] & ((1 << eff) - 1), eff)
        return
    if kind == "verbatim":
        _type_and_wasted(1)
        # r15-opt: pack the whole block into one integer, one write —
        # identical bit layout to the per-sample loop
        mask = (1 << eff) - 1
        acc = 0
        for s in samples:
            acc = (acc << eff) | (s & mask)
        w.write(acc, eff * len(samples))
        return
    if kind.startswith("lpc"):
        # predictor order cannot exceed the block (warmup = whole block
        # is legal; beyond it the bitstream would be malformed)
        order = min(int(kind[3:]), len(samples))
        coefs, prec, shift = _lpc_coefs(order)
        _type_and_wasted(0x20 | (order - 1))
        for s in samples[:order]:
            w.write(s & ((1 << eff) - 1), eff)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        resid = []
        app = resid.append
        for i in range(order, len(samples)):
            acc = 0
            j = i
            for c in coefs:  # r15-opt: manual loop, no enumerate/genexpr
                j -= 1
                acc += c * samples[j]
            app(samples[i] - (acc >> shift))
    else:
        order = min(int(kind[len("fixed"):]), len(samples))
        _type_and_wasted(8 + order)
        for s in samples[:order]:
            w.write(s & ((1 << eff) - 1), eff)
        # r15-opt: the decode-side unrolled fixed predictors, mirrored
        ns = len(samples)
        if order == 0:
            resid = list(samples)
        elif order == 1:
            resid = [
                samples[i] - samples[i - 1] for i in range(1, ns)
            ]
        elif order == 2:
            resid = [
                samples[i] - 2 * samples[i - 1] + samples[i - 2]
                for i in range(2, ns)
            ]
        elif order == 3:
            resid = [
                samples[i] - 3 * samples[i - 1] + 3 * samples[i - 2]
                - samples[i - 3]
                for i in range(3, ns)
            ]
        else:
            resid = [
                samples[i] - 4 * samples[i - 1] + 6 * samples[i - 2]
                - 4 * samples[i - 3] + samples[i - 4]
                for i in range(4, ns)
            ]
    method = 1 if rice2 else 0
    pbits = 5 if rice2 else 4
    w.write(method, 2)
    w.write(0, 4)  # partition order 0: one partition
    if escape:
        w.write((1 << pbits) - 1, pbits)
        raw = max((abs(v).bit_length() + 1 for v in resid), default=1)
        w.write(raw, 5)
        for v in resid:
            w.write(v & ((1 << raw) - 1), raw)
    else:
        w.write(rice_param, pbits)
        _rice_write(w, resid, rice_param)


def encode_flac(
    channels_data: list[list[int]],
    sample_rate: int = 8000,
    bps: int = 16,
    channel_mode: str = "independent",
    subframe_kinds: list[str] | None = None,
    rice_param: int = 3,
    rice2: bool = False,
    escape: bool = False,
    frame_size: int | None = None,
    wasted_bits: int = 0,
    tags: dict | None = None,
) -> bytes:
    """Deterministic FLAC encoder twin: real streams with genuine
    CRC-8/CRC-16/MD5.  ``channel_mode``: independent / left_side /
    right_side / mid_side (stereo only).  ``subframe_kinds`` (per
    physical subframe): constant / verbatim / fixed0..fixed4.  The
    stream splits into ``frame_size``-sample frames (default: one
    frame)."""
    channels = len(channels_data)
    n = len(channels_data[0])
    if any(len(c) != n for c in channels_data):
        raise ValueError("ragged channel data")
    # STREAMINFO
    si = _BitWriter()
    fsz = frame_size or n
    si.write(max(fsz, 16), 16)
    si.write(max(fsz, 16), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    h = hashlib.md5(_md5_interleave(channels_data, n, bps))
    info = si.bytes() + h.digest()
    out = bytearray(b"fLaC")
    last_flag = 0 if tags else (1 << 31)
    out += struct.pack(">I", last_flag | (0 << 24) | len(info))[:4]
    out += info
    if tags:
        vendor = b"da-transform-judgments-pipeline-spark"
        vc = bytearray(struct.pack("<I", len(vendor)) + vendor)
        vc += struct.pack("<I", len(tags))
        for k in sorted(tags):
            entry = f"{k}={tags[k]}".encode("utf-8")
            vc += struct.pack("<I", len(entry)) + entry
        out += struct.pack(">I", (1 << 31) | (4 << 24) | len(vc))[:4]
        out += vc
    frame_no = 0
    start = 0
    while start < n:
        blocksize = min(fsz, n - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit explicit blocksize
        w.write(0, 4)  # sample rate from STREAMINFO
        mode_code = {
            "independent": channels - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[channel_mode]
        w.write(mode_code, 4)
        size_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        w.write(size_code, 3)
        w.write(0, 1)
        _write_coded_number(w, frame_no)
        w.write(blocksize - 1, 16)
        w.align()
        header = w.buf[:]
        w.write(_crc8(bytes(header)), 8)
        seg = [c[start : start + blocksize] for c in channels_data]
        if channel_mode == "independent":
            subs = [(seg[i], bps) for i in range(channels)]
        else:
            if channels != 2:
                raise ValueError("decorrelation modes need stereo")
            left, right = seg
            side = [l - rr for l, rr in zip(left, right)]
            if channel_mode == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + rr) >> 1 for l, rr in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
        kinds = subframe_kinds or ["fixed2"] * len(subs)
        for (data, sub_bps), kind in zip(subs, kinds):
            if kind == "constant" and any(v != data[0] for v in data):
                kind = "fixed2"  # constant only encodes constants
            _write_subframe(
                w, data, sub_bps, kind, rice_param, rice2=rice2,
                escape=escape, wasted_bits=wasted_bits,
            )
        w.align()
        body = bytes(w.buf)
        w.write(_crc16(body), 16)
        out += w.bytes()
        frame_no += 1
        start += blocksize
    return bytes(out)
