"""WebP container probe — operators/webp.py (public RIFF/WebP layout).

All three container shapes round-trip through the probe; damage classes
are loud; payload decode is the documented seam.
"""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.operators.webp import (
    decode_webp,
    encode_webp_animation,
    encode_webp_vp8_still,
    encode_webp_vp8l_still,
    probe_webp,
)


def test_vp8_still():
    p = probe_webp(encode_webp_vp8_still(320, 240, b"\x01" * 20))
    assert p == {
        "fmt": "vp8", "width": 320, "height": 240, "has_alpha": 0,
        "animated": 0, "n_frames": 1, "sum_duration_ms": 0, "loop_count": 0,
    }


def test_vp8l_still_with_alpha():
    p = probe_webp(encode_webp_vp8l_still(100, 50, alpha=True, filler=b"z" * 9))
    assert (p["fmt"], p["width"], p["height"], p["has_alpha"]) == (
        "vp8l", 100, 50, 1,
    )


def test_animation_frames_and_durations():
    p = probe_webp(
        encode_webp_animation(
            64, 32, [(40, b"a" * 7), (60, b"b" * 8), (100, b"c" * 3)],
            loop_count=3,
        )
    )
    assert (
        p["fmt"], p["width"], p["height"], p["animated"], p["n_frames"],
        p["sum_duration_ms"], p["loop_count"],
    ) == ("vp8x", 64, 32, 1, 3, 200, 3)


def test_odd_sized_chunks_are_even_padded():
    # 7-byte filler makes the VP8 chunk odd; the walk must honor padding
    blob = encode_webp_vp8_still(32, 32, b"1234567")
    assert len(blob) % 2 == 0
    assert probe_webp(blob)["width"] == 32


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"RIFX" + b[4:], "not a RIFF"),
        (lambda b: b[:-3], "runs past end"),
        (lambda b: b.replace(b"\x9d\x01\x2a", b"\x9d\x01\x2b"), "start code"),
    ],
)
def test_damage_is_loud(mutate, msg):
    blob = encode_webp_vp8_still(32, 32, b"xx")
    with pytest.raises(ValueError, match=msg):
        probe_webp(mutate(blob))


def test_vp8l_reserved_version_is_loud():
    blob = bytearray(encode_webp_vp8l_still(8, 8))
    # the version bits are the top 3 of the packed LE word: RIFF header
    # (12) + chunk header (8) + signature byte puts its high byte at 24
    blob[24] |= 0x20
    with pytest.raises(ValueError, match="reserved"):
        probe_webp(bytes(blob))


def test_no_image_chunk_is_loud():
    import struct

    blob = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
    with pytest.raises(ValueError, match="no image chunk"):
        probe_webp(blob)


def test_decode_is_documented_seam():
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_webp(b"payload")
