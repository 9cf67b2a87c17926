"""Pure-numpy image codec for UNCOMPRESSED formats (PPM/PGM binary, BMP
24/32-bit) — a real decode path for the multimodal operators in a container
with no PIL/opencv/ffmpeg.

Scope is deliberate: formats whose pixel data is raw bytes decode fully
(header parse + numpy reshape — public, trivial formats: netpbm P5/P6,
Windows BMP BITMAPINFOHEADER without compression). Compressed formats
(JPEG/PNG/GIF/WebP) still raise :class:`UnsupportedImageError` with the
magic spelled out — entropy coders are codec-library territory, and a fake
"decode" there would be dishonest. The multimodal operators
(:func:`.multimodal.extract_features` / :func:`.multimodal.resize_images`)
use this under ``real_decode=True``: real pixel math for the raw formats,
a clear per-format error for the rest.

All functions are executor-side helpers (called inside Arrow-batched
mapInPandas): numpy in, numpy out, no Spark imports.
"""

from __future__ import annotations

import numpy as np


class UnsupportedImageError(ValueError):
    """Blob is not a format this pure-numpy codec decodes."""


_MAGICS = (
    (b"\xff\xd8\xff", "JPEG"),
    (b"\x89PNG", "PNG"),
    (b"GIF8", "GIF"),
    (b"RIFF", "WebP/RIFF"),
)


def sniff(blob: bytes) -> str:
    """Best-effort format name for error messages and routing."""
    if blob[:2] in (b"P5", b"P6"):
        return "PNM"
    if blob[:2] == b"BM":
        return "BMP"
    for magic, name in _MAGICS:
        if blob[: len(magic)] == magic:
            return name
    return "unknown"


def _parse_pnm_header(blob: bytes) -> tuple[str, int, int, int, int]:
    """(kind, width, height, maxval, data_offset) for binary P5/P6.
    Netpbm headers are whitespace-separated tokens with '#' comments."""
    kind = blob[:2].decode()
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if pos < len(blob) and blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise UnsupportedImageError("truncated PNM header")
        tokens.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    return kind, w, h, maxval, pos


def decode_image(blob: bytes) -> np.ndarray:
    """Decode a PPM (P6), PGM (P5), or uncompressed 24/32-bit BMP blob to
    an (H, W, 3) uint8 array. Grayscale replicates to 3 channels; BMP's
    BGR order and bottom-up rows are normalized to RGB top-down."""
    blob = bytes(blob)
    if len(blob) < 2:
        raise UnsupportedImageError("empty blob")
    if blob[:2] in (b"P6", b"P5"):
        kind, w, h, maxval, off = _parse_pnm_header(blob)
        if maxval != 255:
            raise UnsupportedImageError(f"PNM maxval {maxval} != 255")
        ch = 3 if kind == "P6" else 1
        need = w * h * ch
        raster = np.frombuffer(blob, dtype=np.uint8, count=need, offset=off)
        if raster.size < need:
            raise UnsupportedImageError("truncated PNM raster")
        arr = raster.reshape(h, w, ch)
        return np.repeat(arr, 3, axis=2) if ch == 1 else arr.copy()
    if blob[:2] == b"BM":
        if len(blob) < 54:
            raise UnsupportedImageError("truncated BMP header")
        data_off = int.from_bytes(blob[10:14], "little")
        w = int.from_bytes(blob[18:22], "little", signed=True)
        h = int.from_bytes(blob[22:26], "little", signed=True)
        bpp = int.from_bytes(blob[28:30], "little")
        compression = int.from_bytes(blob[30:34], "little")
        if compression != 0 or bpp not in (24, 32):
            raise UnsupportedImageError(
                f"BMP bpp={bpp} compression={compression} unsupported "
                "(only uncompressed 24/32-bit)"
            )
        bottom_up = h > 0
        h = abs(h)
        nbytes = bpp // 8
        stride = (w * nbytes + 3) & ~3  # rows pad to 4 bytes
        need = stride * h
        raster = np.frombuffer(
            blob, dtype=np.uint8, count=need, offset=data_off
        )
        if raster.size < need:
            raise UnsupportedImageError("truncated BMP raster")
        rows = raster.reshape(h, stride)[:, : w * nbytes].reshape(
            h, w, nbytes
        )
        rgb = rows[:, :, [2, 1, 0]]  # BGR(A) → RGB
        return (rgb[::-1] if bottom_up else rgb).copy()
    raise UnsupportedImageError(f"{sniff(blob)} requires a codec library")


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6) bytes."""
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_ppm expects (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (the classic
    pixel-center formula: src = floor((dst + 0.5) * scale))."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, dim: int = 16) -> list[float]:
    """Real decoded-pixel features: per-channel mean+std (6 values,
    normalized to [0,1]) followed by a nearest-resampled luma grid filling
    the remaining dim-6 slots — deterministic, resolution-independent, and
    actually derived from pixels (unlike the byte-hash stub)."""
    if dim < 7:
        raise ValueError("dim must be >= 7 (6 moments + >=1 grid cell)")
    f = arr.astype(np.float64) / 255.0
    moments = [float(f[..., c].mean()) for c in range(3)] + [
        float(f[..., c].std()) for c in range(3)
    ]
    n_grid = dim - 6
    side = max(1, int(np.ceil(np.sqrt(n_grid))))
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    grid = resize_nearest(luma, side, side).reshape(-1)[:n_grid]
    pad = np.zeros(n_grid)
    pad[: grid.size] = grid
    return [round(v, 6) for v in moments + pad.tolist()]
