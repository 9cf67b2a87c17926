"""GIF codec tests (operators/imagecodec decode_gif / encode_gif / LZW)."""

import numpy as np
import pytest

from da_transform_judgments_pipeline_spark.operators.imagecodec import (
    UnsupportedImageError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_image,
    encode_gif,
)

# the canonical minimal GIF89a: 1x1, 2-color GCT (black, white), a
# Graphic Control Extension, single pixel index 0 — an EXTERNALLY
# authored bitstream (the classic "smallest GIF"), so the decoder is
# pinned to the spec, not just to our own encoder
GOLDEN_1PX = bytes.fromhex(
    "474946383961"
    "01000100800000"
    "000000ffffff"
    "21f9040100000000"
    "2c000000000100010000"
    "0202440100"
    "3b"
)


def test_golden_external_bitstream():
    img = decode_gif(GOLDEN_1PX)
    assert img.shape == (1, 1, 3)
    assert (img == 0).all()  # palette[0] = black
    assert np.array_equal(decode_image(GOLDEN_1PX), img)


def test_roundtrip_palettes_shapes_interlace_gce():
    rng = np.random.RandomState(42)
    for shape in [(1, 1), (4, 4), (7, 5), (33, 17)]:
        for ncol in (1, 2, 5, 17, 256):
            pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
            img = pal[rng.randint(0, ncol, shape)]
            for il in (False, True):
                for gce in (False, True):
                    got = decode_gif(encode_gif(img, interlace=il, gce=gce))
                    assert np.array_equal(got, img), (shape, ncol, il, gce)


def test_lzw_tail_width_boundary():
    """Regression: the decoder appends an entry on the stream's FINAL
    data code too; when that append lands on a 2^width boundary, EOI is
    read one bit wider than a naive add-driven encoder writes it. Sweep
    lengths so some stream ends exactly on each boundary."""
    for mcs in (2, 3, 4):
        n = 1 << mcs
        for ln in range(1, 400):
            data = bytes(i % n for i in range(ln))
            assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs, 10**6)) \
                == data


def test_lzw_4096_reset_and_random_streams():
    rng = np.random.RandomState(7)
    for mcs in (2, 8):
        n = 1 << mcs
        data = (bytes(range(n)) * (60000 // n))[:60000]
        assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs, 10**7)) == data
        data = bytes(rng.randint(0, n, 5000, dtype=np.uint8).tolist())
        assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs, 10**7)) == data


def test_refusals():
    img = np.zeros((2, 2, 3), np.uint8)
    blob = encode_gif(img)
    with pytest.raises(UnsupportedImageError, match="not a GIF"):
        decode_gif(b"NOTGIF" + blob[6:])
    with pytest.raises(UnsupportedImageError):
        decode_gif(blob[:-8])  # truncated data stream
    with pytest.raises(UnsupportedImageError, match="no image descriptor"):
        decode_gif(blob[:13] + bytes(blob[13:16]) * 2 + b"\x3b")
    # >256 unique colors cannot be a GIF frame
    big = np.arange(2048 * 3, dtype=np.uint8).reshape(-1, 1, 3) % 255
    big[:, 0, 0] = (np.arange(2048) // 8).astype(np.uint8)
    many = np.unique(big.reshape(-1, 3), axis=0)
    if many.shape[0] > 256:
        with pytest.raises(ValueError, match="palette overflow"):
            encode_gif(big)
    # WebP stays a typed refusal
    with pytest.raises(UnsupportedImageError, match="WebP"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP")
    # a blob cut INSIDE the global color table raises the typed error
    # (bounds-checked before np.frombuffer, not numpy's bare ValueError)
    with pytest.raises(UnsupportedImageError, match="truncated global"):
        decode_gif(blob[:14])


def test_corrupt_lzw_codes_refused():
    blob = bytearray(encode_gif(np.full((4, 4, 3), 9, np.uint8)))
    # find the single data sub-block (after mcs byte) and poison it
    # with an out-of-range code pattern: all-ones bits
    end = blob.rindex(b"\x00\x3b")
    start = end - blob[end - 1] - 1  # sub-block length byte position
    for i in range(start + 1, end):
        blob[i] = 0xFF
    with pytest.raises(UnsupportedImageError):
        decode_gif(bytes(blob))


def test_interlace_row_order_is_real():
    """Interlaced and sequential encodings of the same image differ on
    the wire but decode identically (pass structure actually exercised:
    6 rows hit all four passes)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 4, (9, 5, 3)).astype(np.uint8) * 60
    seq = encode_gif(img, interlace=False)
    il = encode_gif(img, interlace=True)
    assert seq != il
    assert np.array_equal(decode_gif(seq), decode_gif(il))
