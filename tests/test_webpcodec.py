"""VP8L lossless-WebP codec tests (operators/webpcodec): differential
encoder↔decoder roundtrips over every supported branch, plus the typed
refusals that mark the module's stated boundary."""

import numpy as np
import pytest

from da_transform_judgments_pipeline_spark.operators.webpcodec import (
    WebpError,
    _prefix_value,
    _write_prefix_value,
    decode_webp,
    encode_webp_lossless,
)


def test_roundtrip_shapes_and_options():
    rng = np.random.RandomState(11)
    for (h, w) in [(1, 1), (2, 3), (6, 4), (8, 8), (9, 13), (17, 5)]:
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        for kw in (dict(), dict(subtract_green=True),
                   dict(cache_bits=4), dict(lz77=True),
                   dict(subtract_green=True, cache_bits=3, lz77=True)):
            out = decode_webp(encode_webp_lossless(img, **kw))
            assert np.array_equal(out, img), (h, w, kw)


def test_all_fourteen_predictor_modes():
    """Each spec predictor mode (0..13) encodes as a constant-mode
    transform and must reconstruct exactly — the edge rules (first
    pixel black, top row Left, left column Top) and every averaging /
    select / clamp formula are shared code, so this is a differential
    proof of all of them."""
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (9, 13, 3), np.uint8)
    for m in range(14):
        out = decode_webp(encode_webp_lossless(img, predictor_mode=m))
        assert np.array_equal(out, img), f"predictor mode {m}"
    # composed with subtract-green (spec forward order)
    out = decode_webp(
        encode_webp_lossless(img, predictor_mode=7, subtract_green=True)
    )
    assert np.array_equal(out, img)


def test_palette_with_and_without_bundling():
    rng = np.random.RandomState(13)
    for ncol in (2, 4, 13, 200):  # 8-, 4-, 2-pixels-per-byte, unbundled
        pal = rng.randint(0, 256, (ncol, 3), np.uint8)
        idx = rng.randint(0, ncol, (11, 7))
        img = pal[idx]
        out = decode_webp(encode_webp_lossless(img, palette=True))
        assert np.array_equal(out, img), ncol


def test_lz77_runs_and_cache():
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(flat, lz77=True)), flat
    )
    rng = np.random.RandomState(14)
    img = np.repeat(rng.randint(0, 256, (4, 4, 3), np.uint8), 4, axis=0)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(img, cache_bits=6, lz77=True)),
        img,
    )


def test_prefix_value_inverse():
    """The LZ77 bucket↔value mapping round-trips over the whole small
    range via a replayed bit stream."""
    from da_transform_judgments_pipeline_spark.operators.webpcodec import (
        _BitReader,
        _BitWriter,
    )

    for v in list(range(1, 70)) + [121, 1000, 4096]:
        code, extra, bits = _write_prefix_value(None, v)
        bw = _BitWriter()
        bw.write(extra, bits)
        br = _BitReader(bw.bytes() + b"\x00")
        assert _prefix_value(code, br) == v, v


def test_predictor_tr_wraps_to_row_start():
    """Rightmost-column TR neighbor: VP8L uses contiguous-buffer
    addressing (libwebp data[pos - width + 1]), so at x == w-1 TR is
    the LEFTMOST reconstructed pixel of the CURRENT row, not T. Pinned
    by hand-computing a 2x2 mode-3 (pure-TR) inverse — independent of
    the encoder round-trip, which shares _predict and so cannot catch
    a neighbor rule that is wrong on both sides."""
    from da_transform_judgments_pipeline_spark.operators.webpcodec import (
        _apply_predictor_inverse,
    )

    res = np.array(
        [[0x00010203, 0x00040506], [0x00070809, 0x000A0B0C]],
        dtype=np.uint64,
    )
    modes = np.array([[0xFF000000 | (3 << 8)]], dtype=np.int64)
    out = _apply_predictor_inverse(res, modes, size_bits=4)
    assert out[0, 0] == 0xFF010203  # mode 0: + opaque black
    assert out[0, 1] == 0xFF050709  # top row: + L
    assert out[1, 0] == 0xFF080A0C  # left col: + T
    # mode 3 at the right edge: + out[1, 0] (row start), NOT out[0, 1]
    assert out[1, 1] == 0xFF121518


def test_dimension_guard():
    """14-bit width/height fields: >16384 must be a typed error, not a
    silently truncated header."""
    with pytest.raises(ValueError, match="16384"):
        encode_webp_lossless(np.zeros((1, 16385, 3), np.uint8))
    with pytest.raises(ValueError, match="16384"):
        encode_webp_lossless(np.zeros((16385, 1, 3), np.uint8))


def test_typed_refusals():
    img = np.zeros((2, 2, 3), np.uint8)
    blob = bytearray(encode_webp_lossless(img))
    with pytest.raises(WebpError, match="RIFF"):
        decode_webp(b"JUNK" + bytes(blob[4:]))
    with pytest.raises(WebpError, match="lossy WebP"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd")
    with pytest.raises(WebpError, match="no VP8L"):
        decode_webp(b"RIFF\x04\x00\x00\x00WEBP")
    with pytest.raises(WebpError, match="signature"):
        bad = bytes(blob[:20]) + b"\x00" + bytes(blob[21:])
        # force the first payload byte off 0x2f
        i = bytes(blob).find(b"VP8L") + 8
        decode_webp(bytes(blob[:i]) + b"\x30" + bytes(blob[i + 1:]))
    with pytest.raises(WebpError, match="truncated"):
        decode_webp(bytes(blob[:-3]))
    # the ONE named gap: close-distance codes refuse with the reason
    from da_transform_judgments_pipeline_spark.operators import (
        webpcodec as W,
    )

    orig = W._write_prefix_value

    def close_dist(bw, value):
        # make the encoder emit distance VALUE 1 (a close code) instead
        # of dist+120 — only the distance call passes value > 120
        if value > 120:
            return orig(bw, 1)
        return orig(bw, value)

    W._write_prefix_value = close_dist
    try:
        flat = np.full((4, 4, 3), 9, np.uint8)
        evil = encode_webp_lossless(flat, lz77=True)
    finally:
        W._write_prefix_value = orig
    with pytest.raises(WebpError, match="close-distance"):
        decode_webp(evil)


def test_decode_image_dispatch():
    from da_transform_judgments_pipeline_spark.operators.imagecodec import (
        decode_image,
    )

    rng = np.random.RandomState(15)
    img = rng.randint(0, 256, (5, 4, 3), np.uint8)
    assert np.array_equal(
        decode_image(encode_webp_lossless(img, subtract_green=True)), img
    )
