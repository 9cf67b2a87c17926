"""FLAC codec battery: encoder-twin roundtrips across every bitstream
shape, integrity-check enforcement, typed corruption errors, bounds."""

import random

import pytest

from da_transform_judgments_pipeline_spark.operators.flaccodec import (
    FlacError,
    decode_flac,
    encode_flac,
)

_RNG = random.Random(7)


def _wave(n, a, b, d):
    return [(((i * a + d) % 256) - 128) * b for i in range(n)]


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
@pytest.mark.parametrize(
    "kinds",
    [
        ["fixed0", "fixed0"],
        ["fixed1", "fixed2"],
        ["fixed3", "fixed4"],
        ["verbatim", "fixed2"],
        ["constant", "fixed2"],
    ],
)
@pytest.mark.parametrize("rice2", [False, True])
def test_stereo_roundtrip(mode, kinds, rice2):
    n = 96
    left = [-42] * n if kinds[0] == "constant" else _wave(n, 7, 3, 11)
    right = _wave(n, 13, 2, 5)
    blob = encode_flac(
        [left, right], channel_mode=mode, subframe_kinds=kinds, rice2=rice2
    )
    dec = decode_flac(blob)
    assert dec["samples"] == [left, right]
    assert dec["md5_ok"] is True
    assert dec["channels"] == 2 and dec["bits_per_sample"] == 16


def test_escape_partitions_and_multiframe():
    mono = [_RNG.randrange(-32768, 32767) for _ in range(1000)]
    blob = encode_flac(
        [mono], subframe_kinds=["verbatim"], frame_size=192
    )
    dec = decode_flac(blob)
    assert dec["samples"] == [mono] and dec["n_frames"] == 6
    spiky = [((-4) ** (i % 7)) % 1000 for i in range(96)]
    blob2 = encode_flac([spiky], subframe_kinds=["fixed2"], escape=True)
    assert decode_flac(blob2)["samples"] == [spiky]


def test_integrity_checks_enforced():
    data = [_wave(96, 7, 1, 3), _wave(96, 13, 1, 5)]
    blob = bytearray(encode_flac(data, subframe_kinds=["verbatim", "verbatim"]))
    # flip a sample byte mid-frame: CRC-16 (or MD5) must catch it
    with pytest.raises(FlacError, match="CRC|MD5|truncated|declares"):
        bad = bytearray(blob)
        bad[-20] ^= 0xFF
        decode_flac(bytes(bad))
    # flip a frame-header byte: CRC-8 must catch it
    frame_start = bytes(blob).index(b"\xff\xf8")
    bad = bytearray(blob)
    bad[frame_start + 3] ^= 0x04
    with pytest.raises(FlacError):
        decode_flac(bytes(bad))
    # truncation is typed
    with pytest.raises(FlacError):
        decode_flac(bytes(blob[: len(blob) // 2]))
    with pytest.raises(FlacError, match="magic"):
        decode_flac(b"not a flac stream")


def test_sample_count_bound_refused_before_decode():
    blob = encode_flac([_wave(96, 7, 1, 3)])
    with pytest.raises(FlacError, match="bound"):
        decode_flac(blob, max_samples=10)


def test_skippable_metadata_blocks_and_bps_variants():
    data = [list(range(-40, 56))]
    blob = bytearray(encode_flac(data, bps=12, subframe_kinds=["verbatim"]))
    # splice a PADDING metadata block (type 1) after STREAMINFO and
    # clear STREAMINFO's last-block flag
    si_end = 4 + 4 + 34
    pad = bytes([0x81, 0, 0, 3]) + b"\x00" * 3
    assert blob[4] & 0x80
    blob[4] &= 0x7F
    spliced = bytes(blob[:si_end]) + pad + bytes(blob[si_end:])
    dec = decode_flac(spliced)
    assert dec["samples"] == data and dec["bits_per_sample"] == 12


@pytest.mark.parametrize("order", [1, 2, 4, 8])
def test_lpc_subframes_roundtrip(order):
    n = 128
    data = [_wave(n, 7, 3, order), _wave(n, 13, 2, 5)]
    blob = encode_flac(
        [data[0], data[1]],
        subframe_kinds=[f"lpc{order}", f"lpc{order}"],
    )
    dec = decode_flac(blob)
    assert dec["samples"] == data
    assert dec["md5_ok"] is True


def test_lpc_mid_side_and_rice2():
    data = [_wave(200, 11, 2, 3), _wave(200, 5, 3, 9)]
    blob = encode_flac(
        data, channel_mode="mid_side",
        subframe_kinds=["lpc3", "lpc5"], rice2=True, frame_size=64,
    )
    dec = decode_flac(blob)
    assert dec["samples"] == data and dec["n_frames"] == 4


def test_wasted_bits_roundtrip():
    base = _wave(96, 7, 1, 3)
    scaled = [s << 3 for s in base]  # 3 guaranteed-zero low bits
    blob = encode_flac(
        [scaled], subframe_kinds=["fixed2"], wasted_bits=3
    )
    dec = decode_flac(blob)
    assert dec["samples"] == [scaled]
    assert dec["md5_ok"] is True
    # and wasted bits compose with LPC
    blob2 = encode_flac([scaled], subframe_kinds=["lpc2"], wasted_bits=3)
    assert decode_flac(blob2)["samples"] == [scaled]


def test_vorbis_comment_tags_roundtrip():
    wave = _wave(96, 7, 1, 3)
    blob = encode_flac(
        [wave], tags={"TITLE": "Doc 7", "artist": "crawler",
                      "url": "http://h/a?x=1"},
    )
    dec = decode_flac(blob)
    assert dec["samples"] == [wave] and dec["md5_ok"] is True
    assert dec["tags"] == {
        "title": "Doc 7", "artist": "crawler", "url": "http://h/a?x=1",
    }
    # tag-less streams expose an empty dict; truncated blocks are typed
    assert decode_flac(encode_flac([wave]))["tags"] == {}
    vc_start = blob.index(b"da-transform") - 8
    bad = blob[: len(blob) - len(blob) + vc_start + 10]
    with pytest.raises(FlacError):
        decode_flac(bad)
