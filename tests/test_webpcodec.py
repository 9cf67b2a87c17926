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
    # a close-distance code whose offset reaches before the decoded
    # window is still a bounds error, not silent garbage
    from da_transform_judgments_pipeline_spark.operators import (
        webpcodec as W,
    )

    orig = W._write_prefix_value

    def force_code_one(bw, value):
        # the encoder's first ref is dist 1 (+120 = 121); force the
        # distance VALUE to 1 = offset (0,1) = one full row back, which
        # at decode position 1 is outside the window
        if value > 120:
            return orig(bw, 1)
        return orig(bw, value)

    W._write_prefix_value = force_code_one
    try:
        flat = np.full((4, 4, 3), 9, np.uint8)
        evil = encode_webp_lossless(flat, lz77=True)
    finally:
        W._write_prefix_value = orig
    with pytest.raises(WebpError, match="outside decoded window"):
        decode_webp(evil)


def test_close_distance_table_three_way_pinned():
    """_DIST_CODES pinned against (a) the spec's generative rule — the
    close neighborhood sorted by (d², larger dy first, positive dx
    first) — and (b) libwebp's inverse plane_to_code_lut (index
    dy*16 + 8 - dx): three independent representations must agree on
    all 120 entries, and the lut's 255 slots must be exactly the
    impossible dy=0, dx<=0 positions."""
    from da_transform_judgments_pipeline_spark.operators.webpcodec import (
        _DIST_CODES,
        _dist_to_code,
    )

    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if not (dy == 0 and dx < 1)
    ]
    rule = sorted(
        cands, key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], p[0] < 0)
    )
    assert _DIST_CODES == rule
    lut = [
        96, 73, 55, 39, 23, 13, 5, 1,
        255, 255, 255, 255, 255, 255, 255, 255,
        101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
        102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
        105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
        110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
        115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
        118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104,
        114,
        119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112,
        117,
    ]
    for i, (dx, dy) in enumerate(_DIST_CODES):
        assert lut[dy * 16 + 8 - dx] == i
    assert [i for i, v in enumerate(lut) if v == 255] == list(range(8, 16))
    # the encoder inverse: every close code round-trips through
    # _dist_to_code at a width where its offset is a real distance
    for i, (dx, dy) in enumerate(_DIST_CODES):
        w = 20
        dist = dy * w + dx
        if dist >= 1:
            assert _dist_to_code(dist, w) == i + 1, (i + 1, dx, dy)
    assert _dist_to_code(999, 20) == 999 + 120


def test_close_distance_roundtrips():
    """Differential decode of real close-distance streams: repeated
    rows emit code 1 (offset (0,1) — previous-row copy), flat runs emit
    code 2 (offset (1,0)); composed with color cache and on random
    images (where close mode only relabels dist-1 runs)."""
    rng = np.random.RandomState(17)
    row = rng.randint(0, 256, (1, 9, 3), np.uint8)
    stacked = np.repeat(row, 7, axis=0)  # 7 identical rows
    for kw in (dict(), dict(cache_bits=3)):
        blob = encode_webp_lossless(
            stacked, lz77=True, close_distances=True, **kw
        )
        assert np.array_equal(decode_webp(blob), stacked), kw
    flat = np.full((5, 6, 3), 31, np.uint8)
    blob = encode_webp_lossless(flat, lz77=True, close_distances=True)
    assert np.array_equal(decode_webp(blob), flat)
    img = rng.randint(0, 256, (8, 5, 3), np.uint8)
    img[3] = img[2]
    img[4] = img[2]  # a 2-row vertical run mid-image
    blob = encode_webp_lossless(img, lz77=True, close_distances=True)
    assert np.array_equal(decode_webp(blob), img)
    # close mode must actually change the stream for the stacked image
    plain = encode_webp_lossless(stacked, lz77=True)
    closed = encode_webp_lossless(
        stacked, lz77=True, close_distances=True
    )
    assert plain != closed and len(closed) <= len(plain)


def test_decode_image_dispatch():
    from da_transform_judgments_pipeline_spark.operators.imagecodec import (
        decode_image,
    )

    rng = np.random.RandomState(15)
    img = rng.randint(0, 256, (5, 4, 3), np.uint8)
    assert np.array_equal(
        decode_image(encode_webp_lossless(img, subtract_green=True)), img
    )
