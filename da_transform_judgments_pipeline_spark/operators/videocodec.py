"""Pure-numpy video codec for UNCOMPRESSED Y4M (yuv4mpeg2, C420) — the
video leg of the codec triple (:mod:`.imagecodec` images,
:mod:`.audiocodec` audio): a real frame-decode path in a container with no
ffmpeg. Compressed video (MP4/MKV/WebM/AVI) raises
:class:`UnsupportedVideoError` with the sniffed container named.

Y4M is the raw-video interchange format every toolchain speaks: one ASCII
stream header (``YUV4MPEG2 W.. H.. F<num>:<den> ... C420..``), then per
frame a ``FRAME`` line followed by raw Y (w·h), U and V (w/2·h/2) planes.

Executor-side helpers only (used inside Arrow-batched mapInPandas).
"""

from __future__ import annotations

import numpy as np


class UnsupportedVideoError(ValueError):
    """Blob is not a format this pure-numpy codec decodes."""


def sniff(blob: bytes) -> str:
    if blob[:9] == b"YUV4MPEG2":
        return "Y4M"
    if blob[4:8] == b"ftyp":
        return "MP4/MOV"
    if blob[:4] == b"\x1a\x45\xdf\xa3":
        return "MKV/WebM"
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return "AVI"
    return "unknown"


def decode_y4m(blob: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Y4M (C420 family, 8-bit) → (width, height, fps_num, fps_den,
    luma[n_frames, h, w] uint8). Chroma planes are parsed past but not
    returned — luma carries the analysis signal (means, motion, cuts);
    extend here if chroma features are ever needed."""
    blob = bytes(blob)
    if sniff(blob) != "Y4M":
        raise UnsupportedVideoError(f"{sniff(blob)} requires a codec library")
    nl = blob.index(b"\n")
    header = blob[:nl].decode("ascii", errors="replace")
    w = h = num = den = None
    colorspace = "C420"
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            colorspace = tok
    if w is None or h is None:
        raise UnsupportedVideoError("Y4M header missing W/H")
    if not colorspace.startswith("C420"):
        raise UnsupportedVideoError(
            f"Y4M colorspace {colorspace} unsupported (only C420 family)"
        )
    num = num or 25
    den = den or 1
    y_size = w * h
    c_size = (w // 2) * (h // 2)
    frame_bytes = y_size + 2 * c_size
    frames = []
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.index(b"\n", pos)
        if blob[pos : pos + 5] != b"FRAME":
            raise UnsupportedVideoError("Y4M frame marker missing")
        pos = fnl + 1
        if pos + frame_bytes > len(blob):
            raise UnsupportedVideoError("truncated Y4M frame")
        frames.append(
            np.frombuffer(blob, dtype=np.uint8, count=y_size, offset=pos)
            .reshape(h, w)
        )
        pos += frame_bytes
    luma = np.stack(frames) if frames else np.empty((0, h, w), np.uint8)
    return w, h, num, den, luma


def encode_y4m(luma: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """luma[n, h, w] uint8 → Y4M bytes with neutral (128) chroma."""
    n, h, w = luma.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A0:0 C420jpeg\n"
    chroma = bytes([128]) * ((w // 2) * (h // 2) * 2)
    out = [header.encode("ascii")]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(luma[i].astype(np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)


def frame_stats(luma: np.ndarray) -> list[dict]:
    """Per-frame luma statistics: mean/min/max in integer milli-units
    (mean×1000 rounded — exact for constant frames) plus the absolute
    mean-luma delta to the previous frame (a scene-cut signal)."""
    out = []
    prev_mean = None
    for i in range(luma.shape[0]):
        f = luma[i].astype(np.float64)
        mean = float(f.mean())
        out.append(
            {
                "frame_no": i,
                "mean_luma_milli": int(round(mean * 1000)),
                "min_luma": int(luma[i].min()),
                "max_luma": int(luma[i].max()),
                "delta_milli": (
                    0 if prev_mean is None
                    else int(round(abs(mean - prev_mean) * 1000))
                ),
            }
        )
        prev_mean = mean
    return out
