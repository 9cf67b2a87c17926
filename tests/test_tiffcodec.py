"""Baseline-TIFF codec tests (operators/imagecodec decode_tiff /
encode_tiff / PackBits)."""

import numpy as np
import pytest

from da_transform_judgments_pipeline_spark.operators.imagecodec import (
    UnsupportedImageError,
    _packbits_decode,
    _packbits_encode,
    decode_image,
    decode_tiff,
    encode_ppm,
    encode_tiff,
)


def test_roundtrip_byte_orders_strips_packbits():
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (4, 4), (9, 5), (16, 16)]:
        for be in (False, True):
            for pb in (False, True):
                img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
                got = decode_tiff(
                    encode_tiff(img, big_endian=be, packbits=pb,
                                rows_per_strip=3)
                )
                assert np.array_equal(got, img), (shape, be, pb)


def test_cross_format_equality_and_dispatch():
    """The same pixels through TIFF and PPM decode identically, and
    decode_image routes both TIFF byte orders."""
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(
        decode_image(encode_tiff(img)), decode_image(encode_ppm(img))
    )
    assert np.array_equal(
        decode_image(encode_tiff(img, big_endian=True)), img
    )


def test_packbits_runs_literals_and_refusals():
    rng = np.random.RandomState(7)
    for _ in range(100):
        data = bytes(
            rng.choice([0, 1, 7], rng.randint(0, 1500))
            .astype(np.uint8).tolist()
        )
        assert _packbits_decode(_packbits_encode(data), 10**7) == data
    # 128-literal chunking and long runs
    data = bytes(range(256)) * 3 + b"\x09" * 1000
    assert _packbits_decode(_packbits_encode(data), 10**7) == data
    with pytest.raises(UnsupportedImageError, match="truncated"):
        _packbits_decode(b"\x05ab", 10**7)  # literal header lies
    with pytest.raises(UnsupportedImageError, match="exceeds"):
        _packbits_decode(_packbits_encode(b"\x00" * 5000), 100)


def test_tiff_refusals():
    img = np.zeros((4, 4, 3), np.uint8)
    blob = bytearray(encode_tiff(img))
    with pytest.raises(UnsupportedImageError, match="not a TIFF"):
        decode_tiff(b"XX*\x00" + bytes(blob[4:]))
    # unsupported compression: patch tag 259's inline value to 8
    # (Deflate-in-TIFF — LZW is supported now, 8 still is not)
    i = blob.index((259).to_bytes(2, "little"))
    blob[i + 8] = 8
    with pytest.raises(UnsupportedImageError, match="compression 8"):
        decode_tiff(bytes(blob))
    # truncated strip data
    good = encode_tiff(img)
    with pytest.raises(UnsupportedImageError, match="truncated|raster"):
        decode_tiff(good[:-10])


def test_grayscale_spp1_replicates_hand_built():
    """An INDEPENDENTLY hand-assembled gray (spp=1) little-endian TIFF
    — a layout our encoder never emits — decodes to replicated RGB, so
    the decoder is pinned to the spec rather than to encode_tiff."""

    def u(v, n):
        return int(v).to_bytes(n, "little")

    def entry(tag, typ, count, inline4):
        return u(tag, 2) + u(typ, 2) + u(count, 4) + inline4

    gray = bytes([10, 20, 30, 40])  # 2x2, one strip
    n = 8
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    ifd = u(n, 2) + b"".join([
        entry(256, 3, 1, u(2, 2) + b"\x00\x00"),         # width
        entry(257, 3, 1, u(2, 2) + b"\x00\x00"),         # height
        entry(258, 3, 1, u(8, 2) + b"\x00\x00"),         # bits = 8
        entry(259, 3, 1, u(1, 2) + b"\x00\x00"),         # uncompressed
        entry(262, 3, 1, u(1, 2) + b"\x00\x00"),         # BlackIsZero
        entry(273, 4, 1, u(data_off, 4)),                # strip offset
        entry(277, 3, 1, u(1, 2) + b"\x00\x00"),         # spp = 1
        entry(279, 4, 1, u(len(gray), 4)),               # strip count
    ]) + u(0, 4)
    blob = b"II*\x00" + u(ifd_off, 4) + ifd + gray
    got = decode_tiff(blob)
    assert got.shape == (2, 2, 3)
    assert np.array_equal(
        got, np.repeat(
            np.array([10, 20, 30, 40], np.uint8).reshape(2, 2, 1), 3, 2
        )
    )


def test_tiff_lzw_and_predictor_roundtrip():
    """TIFF-variant LZW (MSB-first, EARLY-change width growth — one
    boundary earlier than GIF's variant) round-trips across shapes and
    byte orders; the horizontal-differencing predictor round-trips and
    actually compresses smooth gradients (its purpose)."""
    from da_transform_judgments_pipeline_spark.operators.imagecodec import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = np.random.RandomState(2)
    for shape in [(1, 1), (4, 4), (9, 5), (32, 32)]:
        for be in (False, True):
            img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
            for kw in ({"lzw": True}, {"lzw": True, "predictor": True}):
                got = decode_tiff(encode_tiff(img, big_endian=be, **kw))
                assert np.array_equal(got, img), (shape, be, kw)
    grad = np.tile(
        np.arange(256, dtype=np.uint8)[None, :, None], (16, 1, 3)
    )
    assert len(encode_tiff(grad, lzw=True, predictor=True)) < len(
        encode_tiff(grad, lzw=True)
    )
    # early-change boundary sweep (the GIF tail-append lesson, TIFF
    # flavor) + 4094-reset stress
    for ln in range(1, 400):
        data = bytes(i % 7 for i in range(ln))
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), 10**6) == data
    data = bytes(range(256)) * 400
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), 10**7) == data
    with pytest.raises(UnsupportedImageError, match="start with Clear"):
        _tiff_lzw_decode(b"\x00\x00\x00", 100)
    with pytest.raises(ValueError, match="at most one"):
        encode_tiff(grad, packbits=True, lzw=True)
    with pytest.raises(ValueError, match="only written with lzw"):
        encode_tiff(grad, predictor=True)
