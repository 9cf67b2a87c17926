"""Pure-numpy audio codec for UNCOMPRESSED WAV (RIFF/PCM 16-bit) — the
audio counterpart of :mod:`.imagecodec`: a real decode path in a container
with no torchaudio/ffmpeg. Compressed audio (MP3/OGG/FLAC/AAC) raises
:class:`UnsupportedAudioError` with the sniffed container named — no fake
decode.

All helpers are executor-side (called inside Arrow-batched mapInPandas):
bytes/numpy in, numpy/floats out, no Spark imports.
"""

from __future__ import annotations

import numpy as np


class UnsupportedAudioError(ValueError):
    """Blob is not a format this pure-numpy codec decodes."""


def sniff(blob: bytes) -> str:
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "WAV"
    if blob[:3] == b"ID3" or blob[:2] == b"\xff\xfb":
        return "MP3"
    if blob[:4] == b"OggS":
        return "OGG"
    if blob[:4] == b"fLaC":
        return "FLAC"
    return "unknown"


def _ulaw_decode_table() -> np.ndarray:
    """ITU-T G.711 μ-law byte → int16 (the spec's expansion formula:
    complement, 3-bit exponent, 4-bit mantissa, bias 0x84)."""
    v = ~np.arange(256, dtype=np.int32) & 0xFF
    mag = ((((v & 0x0F) << 3) + 0x84) << ((v >> 4) & 7)) - 0x84
    return np.where(v & 0x80, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """ITU-T G.711 A-law byte → int16 (xor 0x55, segmented expansion;
    sign bit SET means positive — the opposite of μ-law)."""
    b = np.arange(256, dtype=np.int32) ^ 0x55
    exp = (b >> 4) & 7
    mant = b & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    return np.where(b & 0x80, mag, -mag).astype(np.int16)


_ULAW_DEC = _ulaw_decode_table()
_ALAW_DEC = _alaw_decode_table()

# anchors straight from the G.711 tables: μ-law 0xFF = 0, 0x80 = +32124;
# A-law 0x55 = -8, 0xD5 = +8, 0xAA = +32256 — a wrong sign convention or
# bias cannot pass these
assert _ULAW_DEC[0xFF] == 0 and _ULAW_DEC[0x80] == 32124
assert _ALAW_DEC[0x55] == -8 and _ALAW_DEC[0xD5] == 8
assert _ALAW_DEC[0xAA] == 32256


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 → G.711 μ-law bytes (clip 32635, bias 0x84, complement)."""
    x = np.asarray(x).astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    # exponent = bit_length - 8; frexp is exact for ints < 2^53
    exp = np.frexp(mag.astype(np.float64))[1].astype(np.int32) - 8
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


_ALAW_SEG_ENDS = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 → G.711 A-law bytes (13-bit segmented quantizer, xor 0x55)."""
    x = np.asarray(x).astype(np.int32)
    mask = np.where(x >= 0, 0xD5, 0x55)
    pcm = np.where(x >= 0, x, -x - 1) >> 3
    seg = np.searchsorted(_ALAW_SEG_ENDS, pcm, side="left").astype(np.int32)
    mant = np.where(seg < 2, (pcm >> 1) & 0x0F, (pcm >> seg) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype(np.uint8)


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, samples[n, channels] int16).
    Chunk-walks the RIFF container (fmt + data; other chunks skipped),
    supporting audio_format=1 (linear PCM, 16-bit) plus the two G.711
    telephony companding laws — format 6 (A-law) and 7 (μ-law), 8-bit,
    expanded through the spec tables to int16. Everything else is
    codec-library territory."""
    blob = bytes(blob)
    if sniff(blob) != "WAV":
        raise UnsupportedAudioError(f"{sniff(blob)} requires a codec library")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise UnsupportedAudioError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    ok = (audio_format == 1 and bits == 16) or (
        audio_format in (6, 7) and bits == 8
    )
    if not ok:
        raise UnsupportedAudioError(
            f"WAV format={audio_format} bits={bits} unsupported "
            "(only PCM 16-bit or G.711 A-law/μ-law 8-bit)"
        )
    if channels < 1 or rate < 1:
        # malformed fmt chunk: channels=0 would otherwise surface as a
        # ZeroDivisionError in the frame arithmetic below, escaping the
        # codec's typed-error contract
        raise UnsupportedAudioError(
            f"WAV malformed fmt chunk: channels={channels} rate={rate}"
        )
    if audio_format == 1:
        samples = np.frombuffer(
            data, dtype="<i2", count=(len(data) // (2 * channels)) * channels
        ).reshape(-1, channels)
    else:
        codes = np.frombuffer(
            data, dtype=np.uint8, count=(len(data) // channels) * channels
        )
        table = _ALAW_DEC if audio_format == 6 else _ULAW_DEC
        samples = table[codes].reshape(-1, channels)
    return rate, samples


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 → RIFF/WAVE PCM 16-bit bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVEfmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def encode_wav_g711(samples: np.ndarray, rate: int, law: str) -> bytes:
    """(n, channels) int16 → RIFF/WAVE G.711 bytes (format 6 A-law or
    7 μ-law, 8-bit) — the deterministic encoder twin of the companded
    :func:`decode_wav` path. Lossy by design: samples quantize to the
    nearest segment level (feed exact decode-table levels for a
    round-trip-exact closed-form oracle)."""
    if law not in ("alaw", "ulaw"):
        raise ValueError(f"law must be 'alaw' or 'ulaw', not {law!r}")
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    enc = alaw_encode if law == "alaw" else ulaw_encode
    data = enc(samples.astype(np.int16)).tobytes()
    audio_format = 6 if law == "alaw" else 7
    fmt = (
        audio_format.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels).to_bytes(4, "little")
        + channels.to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    body = (
        b"WAVEfmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_features(rate: int, samples: np.ndarray) -> dict:
    """Real decoded-sample features: duration, per-clip RMS / peak
    (normalized to [-1, 1] full scale), and zero-crossing rate over the
    channel-mean signal — the standard cheap audio descriptors. All
    values rounded to 6 dp for engine-agnostic comparison."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = mono.size
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    peak = float(np.abs(mono).max()) if n else 0.0
    zc = int(np.count_nonzero(mono[:-1] * mono[1:] < 0)) if n > 1 else 0
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "duration_ms": round(n * 1000.0 / rate, 6) if rate else 0.0,
        "rms": round(rms, 6),
        "peak": round(peak, 6),
        "zcr": round(zc / (n - 1), 6) if n > 1 else 0.0,
    }


def decode_audio(blob: bytes) -> tuple[int, np.ndarray]:
    """Container dispatch: WAV (PCM/G.711, :func:`decode_wav`) or FLAC
    (the pure-stdlib RFC 9639 decoder in :mod:`.flaccodec`) →
    ``(sample_rate, samples[n, channels] int)`` in the 16-bit domain
    (other FLAC depths shift to full scale so downstream features
    normalize identically).  MP3/OGG remain typed refusals — lossy
    codecs have no stdlib path and faking them would be dishonest."""
    blob = bytes(blob)
    kind = sniff(blob)
    if kind == "WAV":
        return decode_wav(blob)
    if kind == "FLAC":
        from .flaccodec import decode_flac

        dec = decode_flac(blob)
        arr = np.array(dec["samples"], dtype=np.int64).T  # (n, channels)
        if arr.size == 0:
            arr = arr.reshape(0, max(dec["channels"], 1))
        bps = dec["bits_per_sample"]
        if bps < 16:
            arr = arr << (16 - bps)
        elif bps > 16:
            arr = arr >> (bps - 16)
        return dec["sample_rate"], arr
    raise UnsupportedAudioError(f"{kind} requires a codec library")
