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


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM 16-bit → (sample_rate, samples[n, channels] int16).
    Chunk-walks the RIFF container (fmt + data; other chunks skipped),
    supporting only audio_format=1 (PCM) at 16 bits — everything else is
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
    if audio_format != 1 or bits != 16:
        raise UnsupportedAudioError(
            f"WAV format={audio_format} bits={bits} unsupported "
            "(only PCM 16-bit)"
        )
    if channels < 1 or rate < 1:
        # malformed fmt chunk: channels=0 would otherwise surface as a
        # ZeroDivisionError in the frame arithmetic below, escaping the
        # codec's typed-error contract
        raise UnsupportedAudioError(
            f"WAV malformed fmt chunk: channels={channels} rate={rate}"
        )
    samples = np.frombuffer(
        data, dtype="<i2", count=(len(data) // (2 * channels)) * channels
    ).reshape(-1, channels)
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
