"""Baseline JPEG codec: closed-form exactness on constant blocks, a
differential pin of the bitstream + transform pipeline against an
independent in-test reimplementation, an independent 4-loop IDCT, and
the typed-refusal error surface."""

import numpy as np
import pytest

from da_transform_judgments_pipeline_spark.operators import jpegcodec as J
from da_transform_judgments_pipeline_spark.operators.imagecodec import (
    UnsupportedImageError,
    decode_image,
)


def _closed_form_rgb(rgb):
    """The m14 oracle chain for one constant 8x8 block, in plain ints:
    pinned RGB→YCbCr, DC quantize (round-half-away, q=16), dequant,
    exact DC-only IDCT (dequant/8), level shift + clamp, fixed-point
    YCbCr→RGB."""
    ycc = J.rgb_to_ycbcr_int(
        np.array(rgb, dtype=np.uint8).reshape(1, 1, 3)
    ).astype(np.int64).reshape(3)
    dec = []
    for ch in ycc:
        x = 8 * (int(ch) - 128)
        q = 16
        qdc = (x + q // 2) // q if x >= 0 else -((-x + q // 2) // q)
        dec.append(min(255, max(0, 2 * qdc + 128)))
    return J.ycbcr_to_rgb_fixed(
        np.array(dec, dtype=np.int64).reshape(1, 1, 3)
    ).reshape(3)


def test_constant_blocks_decode_to_closed_form_444_and_420():
    rng = np.random.default_rng(11)
    for _ in range(25):
        A = rng.integers(0, 256, 3)
        B = rng.integers(0, 256, 3)
        arr = np.empty((16, 8, 3), dtype=np.uint8)
        arr[:8] = A
        arr[8:] = B
        dec = J.decode_jpeg(J.encode_jpeg_baseline(arr))
        assert (dec[:8] == _closed_form_rgb(A)).all()
        assert (dec[8:] == _closed_form_rgb(B)).all()
    # 4:2:0: constant 16x16 stays constant through the pinned 2x2
    # chroma averaging (average of equal values is the value)
    for _ in range(5):
        C = rng.integers(0, 256, 3)
        arr = np.empty((16, 16, 3), dtype=np.uint8)
        arr[:] = C
        dec = J.decode_jpeg(J.encode_jpeg_baseline(arr, subsample=True))
        assert (dec == _closed_form_rgb(C)).all()


def test_idct_matches_independent_four_loop_formula():
    """The decoder's matrix IDCT vs the T.81 A.3.3 definition written
    as literal nested loops — an independent implementation of the same
    math, agreeing to float tolerance on random coefficient blocks."""
    rng = np.random.default_rng(3)

    def idct_naive(F):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * F[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = s / 4.0
        return out

    for _ in range(5):
        F = rng.integers(-500, 500, (8, 8)).astype(np.float64)
        got = J._C.T @ F @ J._C
        assert np.abs(got - idct_naive(F)).max() < 1e-9


def test_bitstream_roundtrip_matches_reference_transform_pipeline():
    """Differential pin of the FULL bitstream (Huffman, DC differential
    prediction, byte stuffing, marker layout): the decoder's output on
    an arbitrary image must equal an in-test reference pipeline that
    never touches the bitstream — pinned color convert, float DCT with
    exact DC, round-half-away quantize, dequant, IDCT, pinned rounding,
    fixed-point color convert. Any bit lost or misread in between would
    desynchronize the Huffman stream and diverge."""
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)

    ycc = J.rgb_to_ycbcr_int(arr).astype(np.int64)
    planes = []
    for ci in range(3):
        q = (J.JPEG_QUANT_LUMA if ci == 0 else J.JPEG_QUANT_CHROMA)
        q = q.reshape(8, 8).astype(np.float64)
        plane = np.zeros((16, 24))
        for by in range(2):
            for bx in range(3):
                blk = ycc[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, ci] - 128
                F = J._fdct_block(blk)
                qz = (np.sign(F) * np.floor(np.abs(F) / q + 0.5))
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    J._C.T @ (qz * q) @ J._C
                )
        planes.append(
            np.clip(np.floor(plane + 128.5), 0, 255).astype(np.int64)
        )
    expected = J.ycbcr_to_rgb_fixed(np.stack(planes, axis=-1))

    got = J.decode_jpeg(J.encode_jpeg_baseline(arr))
    assert (got == expected).all()


def test_roundtrip_error_bounded_on_smooth_images():
    """Lossy sanity: a Q50-table codec reconstructs smooth gradients
    within a small error (a broken IDCT/Huffman explodes this)."""
    yy, xx = np.mgrid[0:24, 0:32]
    arr = np.stack(
        [yy * 4 + 50, xx * 3 + 60, yy * 2 + xx * 2 + 40], axis=-1
    ).astype(np.uint8)
    for sub in (False, True):
        dec = J.decode_jpeg(J.encode_jpeg_baseline(arr, subsample=sub))
        err = np.abs(dec.astype(int) - arr.astype(int))
        assert err.mean() < 3 and err.max() <= 20, (sub, err.mean())


def test_restart_interval_stream_decodes():
    """A DRI/RSTn stream hand-assembled from the encoder's own
    primitives (one restart per MCU row) must decode identically to the
    plain single-segment encoding of the same image — DC predictors
    reset, reader re-aligns at each marker."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (16, 8, 3)).astype(np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg_baseline(arr))

    blob = bytearray(J.encode_jpeg_baseline(arr))
    # rebuild: headers up to SOS payload end, then re-encode entropy
    # data as two restart segments (MCUs (0,0) and (1,0))
    sos_at = bytes(blob).find(b"\xff\xda")
    sos_len = int.from_bytes(blob[sos_at + 2:sos_at + 4], "big")
    head = bytes(blob[:sos_at])
    sos = bytes(blob[sos_at:sos_at + 2 + sos_len])
    dri = b"\xff\xdd\x00\x04\x00\x01"  # restart interval 1

    ycc = J.rgb_to_ycbcr_int(arr).astype(np.int64)
    dc_enc = [
        J._canonical_codes(*J._DC_LUMA), J._canonical_codes(*J._DC_CHROMA)
    ]
    ac_enc = [
        J._canonical_codes(*J._AC_LUMA), J._canonical_codes(*J._AC_CHROMA)
    ]
    qt = [J.JPEG_QUANT_LUMA, J.JPEG_QUANT_CHROMA]
    segs = []
    for my in range(2):
        bw = J._BitWriter()
        prev = [0, 0, 0]  # predictors reset at each restart
        for ci in range(3):
            tq = 0 if ci == 0 else 1
            blk = ycc[my * 8:my * 8 + 8, 0:8, ci] - 128
            qz = J._quantize_rha(
                J._fdct_block(blk).reshape(64)[J.ZIGZAG],
                qt[tq][J.ZIGZAG].astype(np.float64),
            )
            prev[ci] = J._encode_block(
                bw, qz, prev[ci], dc_enc[tq], ac_enc[tq]
            )
        bw.flush()
        segs.append(bytes(bw.out))
    stream = head + dri + sos + segs[0] + b"\xff\xd0" + segs[1] + (
        b"\xff\xd9"
    )
    assert (J.decode_jpeg(stream) == plain).all()


def test_grayscale_single_component_stream():
    """A 1-component baseline stream (hand-assembled from the module's
    own marker/bit primitives) decodes to 3 replicated channels."""
    val = 77
    blk = np.full((8, 8), val, dtype=np.int64) - 128
    qz = J._quantize_rha(
        J._fdct_block(blk).reshape(64)[J.ZIGZAG],
        J.JPEG_QUANT_LUMA[J.ZIGZAG].astype(np.float64),
    )
    bw = J._BitWriter()
    J._encode_block(bw, qz, 0, J._canonical_codes(*J._DC_LUMA),
                    J._canonical_codes(*J._AC_LUMA))
    bw.flush()
    blob = bytearray(b"\xff\xd8")
    blob += J._marker(0xDB, bytes([0]) + bytes(
        J.JPEG_QUANT_LUMA[J.ZIGZAG].tolist()))
    blob += J._marker(
        0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    blob += J._marker(0xC4, bytes([0x00]) + bytes(J._DC_LUMA[0])
                      + bytes(J._DC_LUMA[1]))
    blob += J._marker(0xC4, bytes([0x10]) + bytes(J._AC_LUMA[0])
                      + bytes(J._AC_LUMA[1]))
    blob += J._marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blob += bw.out + b"\xff\xd9"
    dec = J.decode_jpeg(bytes(blob))
    assert dec.shape == (8, 8, 3)
    # DC-only gray: closed form q=16 → 2*round((77-128)/2 rha)+128
    exp = 2 * (-((8 * (77 - 128) * -1 + 8) // 16)) + 128
    assert (dec == np.clip(exp, 0, 255)).all()
    assert (dec[..., 0] == dec[..., 1]).all()


def test_typed_refusals_and_bounds():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = bytearray(J.encode_jpeg_baseline(arr))
    # malformed: flipping SOF0 → SOF2 makes a progressive frame whose
    # scan still carries sequential parameters (Ss=0, Se=63) — invalid
    sof_at = bytes(blob).find(b"\xff\xc0")
    prog = bytes(blob[:sof_at + 1]) + b"\xc2" + bytes(blob[sof_at + 2:])
    with pytest.raises(UnsupportedImageError, match="progressive"):
        J.decode_jpeg(prog)
    # truncated entropy data
    with pytest.raises(UnsupportedImageError, match="JPEG"):
        J.decode_jpeg(bytes(blob[:-12]))
    # not a JPEG
    with pytest.raises(UnsupportedImageError, match="SOI"):
        J.decode_jpeg(b"\x89PNGxxxx")
    # decoded-size bound (declared dims, checked before any decode)
    orig = J.JPEG_MAX_DECODED_BYTES
    try:
        J.JPEG_MAX_DECODED_BYTES = 10
        with pytest.raises(UnsupportedImageError, match="exceeds bound"):
            J.decode_jpeg(bytes(blob))
    finally:
        J.JPEG_MAX_DECODED_BYTES = orig
    # dispatch: decode_image routes JPEG magic to this decoder
    assert decode_image(bytes(blob)).shape == (8, 8, 3)


def test_png_jpeg_proximity_on_block_images():
    """The judge-facing cross-codec pin: the same constant-block image
    through the lossless PNG path and the lossy JPEG path must decode
    to nearly identical pixels — JPEG's only loss on constant blocks is
    DC quantization (≤8 levels at quantum 16) plus two pinned color
    conversions, so the per-channel gap stays single-digit-ish. A
    transform/entropy bug would blow this apart."""
    from da_transform_judgments_pipeline_spark.operators.imagecodec import (
        encode_png,
    )

    rng = np.random.default_rng(21)
    worst = 0
    for _ in range(20):
        A = rng.integers(0, 256, 3)
        B = rng.integers(0, 256, 3)
        arr = np.empty((16, 8, 3), dtype=np.uint8)
        arr[:8] = A
        arr[8:] = B
        png = decode_image(encode_png(arr))
        jpg = decode_image(J.encode_jpeg_baseline(arr))
        assert (png == arr).all()  # PNG is exact
        gap = int(np.abs(jpg.astype(int) - png.astype(int)).max())
        worst = max(worst, gap)
    assert worst <= 16, worst


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes preceding a
    marker; some encoders/muxers emit them. The marker walk must skip
    them rather than misreading the real tag byte as a segment length
    (which desyncs the walk and raises a spurious refusal on a fully
    valid baseline file)."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (8, 16, 3)).astype(np.uint8)
    blob = J.encode_jpeg_baseline(arr)
    baseline = J.decode_jpeg(blob)
    # insert fill bytes before the first post-SOI marker and before SOS
    padded = blob[:2] + b"\xff\xff\xff" + blob[2:]
    sos_at = padded.find(b"\xff\xda")
    padded = padded[:sos_at] + b"\xff" + padded[sos_at:]
    assert (J.decode_jpeg(padded) == baseline).all()


def test_incomplete_scan_set_refused_not_grayscaled():
    """A 3-component file carrying only ONE component's scan (a legal
    non-interleaved scan, but an incomplete scan set) must raise a
    typed refusal — rendering it would silently return the luma plane
    replicated as gray RGB, i.e. wrong pixels reported as success."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = J.encode_jpeg_baseline(arr)
    sos_at = blob.find(b"\xff\xda")
    seg_len = int.from_bytes(blob[sos_at + 2:sos_at + 4], "big")
    assert seg_len == 12  # ns=3: 2 len + 1 ns + 3 pairs + Ss/Se/AhAl
    seg = blob[sos_at + 4:sos_at + 2 + seg_len]
    # rewrite the SOS header to claim a single-component scan
    one_comp = (
        blob[:sos_at + 2]
        + (8).to_bytes(2, "big")      # new len: 2 + 1 + 1 pair + 3
        + bytes([1])                  # ns = 1
        + seg[1:3]                    # first (cid, tables) pair
        + seg[-3:]                    # Ss, Se, AhAl
        + blob[sos_at + 2 + seg_len:]
    )
    with pytest.raises(UnsupportedImageError, match="incomplete"):
        J.decode_jpeg(one_comp)


def test_progressive_decodes_bit_identical_to_baseline():
    """The progressive differential pin: encode_jpeg_progressive uses
    the IDENTICAL pinned color convert / DCT / quantization as the
    baseline twin, so its coefficient arrays are the same and decoded
    pixels must equal the baseline stream's decode bit-for-bit — any
    error anywhere in the progressive machinery (DC point transform,
    EOBRUN, spectral band split, AC refinement correction-bit order,
    non-interleaved 4:2:0 block grids) desyncs the Huffman stream or
    flips pixels."""
    rng = np.random.default_rng(11)
    for shape, sub in [
        ((16, 24, 3), False),
        ((16, 24, 3), True),
        ((8, 8, 3), False),
        ((13, 19, 3), False),   # non-multiple dims: edge blocks
        ((13, 19, 3), True),    # + 4:2:0 nb-grid vs MCU-grid split
        ((40, 56, 3), True),
    ]:
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        base = J.decode_jpeg(J.encode_jpeg_baseline(arr, subsample=sub))
        prog = J.decode_jpeg(
            J.encode_jpeg_progressive(arr, subsample=sub)
        )
        assert (base == prog).all(), (shape, sub)


def test_progressive_smooth_image_exercises_eobrun():
    """A smooth gradient quantizes to long end-of-band runs: assert the
    encoded stream contains an EOBn symbol with run > 1 (the flat-table
    encoding makes symbols byte-inspectable is not possible post-
    Huffman, so assert indirectly: the AC-first scans of a smooth image
    are far smaller than those of noise — EOBRUN compression working —
    and the decode still matches baseline bit-for-bit)."""
    yy, xx = np.mgrid[0:32, 0:48]
    smooth = np.stack(
        [yy * 2 + 40, xx * 2 + 30, (yy + xx) + 90], axis=-1
    ).astype(np.uint8)
    rng = np.random.default_rng(4)
    noise = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    enc_smooth = J.encode_jpeg_progressive(smooth)
    enc_noise = J.encode_jpeg_progressive(noise)
    assert len(enc_smooth) < len(enc_noise) // 2
    assert (
        J.decode_jpeg(enc_smooth)
        == J.decode_jpeg(J.encode_jpeg_baseline(smooth))
    ).all()


def test_progressive_scan_validation_refusals():
    """Malformed progressive parameter combinations raise typed errors:
    a multi-component AC scan, a DC scan with Se != 0, and a
    refinement jumping more than one bit."""
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = bytearray(J.encode_jpeg_progressive(arr))
    # first SOS is the interleaved DC scan: 3 comps, Ss=0 Se=0 Ah=0 Al=1
    sos = bytes(blob).find(b"\xff\xda")
    seg_len = int.from_bytes(blob[sos + 2:sos + 4], "big")
    assert blob[sos + 4] == 3 and blob[sos + 2 + seg_len - 3] == 0
    # DC scan with Se != 0
    bad = bytearray(blob)
    bad[sos + 2 + seg_len - 2] = 5  # Se
    with pytest.raises(UnsupportedImageError, match="DC scan"):
        J.decode_jpeg(bytes(bad))
    # multi-component AC scan
    bad = bytearray(blob)
    bad[sos + 2 + seg_len - 3] = 1  # Ss=1 with ns=3
    bad[sos + 2 + seg_len - 2] = 63
    with pytest.raises(UnsupportedImageError, match="single-component"):
        J.decode_jpeg(bytes(bad))
    # refinement must step one bit: Ah=2, Al=0
    bad = bytearray(blob)
    bad[sos + 2 + seg_len - 1] = 0x20
    with pytest.raises(UnsupportedImageError, match="one bit"):
        J.decode_jpeg(bytes(bad))


def test_multiple_sof_markers_refused():
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = J.encode_jpeg_baseline(arr)
    sof_at = blob.find(b"\xff\xc0")
    seg_len = int.from_bytes(blob[sof_at + 2:sof_at + 4], "big")
    dup = (blob[:sof_at + 2 + seg_len]
           + blob[sof_at:sof_at + 2 + seg_len]
           + blob[sof_at + 2 + seg_len:])
    with pytest.raises(UnsupportedImageError, match="multiple SOF"):
        J.decode_jpeg(dup)


def test_progressive_restart_intervals_and_422_decode():
    """Restart markers inside PROGRESSIVE scans (DRI + RSTn every N
    MCUs/blocks in every scan type — DC predictors and EOB runs reset,
    reader re-aligns) and 4:2:2 chroma subsampling (hmax=2/vmax=1
    upsampling) both decode bit-identically to the plain baseline
    stream of the same image."""
    rng = np.random.default_rng(13)
    for shape, sub, ri in [
        ((24, 40, 3), False, 1),   # restart every MCU — worst case
        ((24, 40, 3), True, 2),    # 4:2:0 + restarts
        ((13, 19, 3), "422", 1),   # 4:2:2, odd dims, restarts
        ((32, 32, 3), False, 3),
    ]:
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        base = J.decode_jpeg(J.encode_jpeg_baseline(arr, subsample=sub))
        prog = J.decode_jpeg(
            J.encode_jpeg_progressive(
                arr, subsample=sub, restart_interval=ri
            )
        )
        assert (base == prog).all(), (shape, sub, ri)
    # 4:2:2 baseline roundtrip on smooth images stays bounded
    yy, xx = np.mgrid[0:24, 0:32]
    smooth = np.stack(
        [yy * 4 + 50, xx * 3 + 60, yy * 2 + xx * 2 + 40], axis=-1
    ).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(smooth, subsample="422"))
    err = np.abs(dec.astype(int) - smooth.astype(int))
    assert err.mean() < 3 and err.max() <= 20
    with pytest.raises(ValueError, match="subsample"):
        J.encode_jpeg_baseline(smooth, subsample="411")
