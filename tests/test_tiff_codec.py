"""Baseline TIFF codec (operators/tiff.py): hand-written fixture,
round-trip properties across endianness / compression / strip layout,
PackBits edge cases, and javax.imageio cross-validation."""

from __future__ import annotations

import itertools
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.multimodal import decode_image_real
from etl_pipeline_old_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)

# A 2x1 gray little-endian TIFF written BY HAND per the 6.0 spec —
# independent of encode_tiff. IFD with the five required raster tags;
# strip data (pixels 10, 200) inlined AFTER the IFD at offset 8+2+5*12+4.
_HAND_IFD = (
    struct.pack("<H", 5)
    + struct.pack("<HHII", 256, 3, 1, 2)  # ImageWidth = 2
    + struct.pack("<HHII", 257, 3, 1, 1)  # ImageLength = 1
    + struct.pack("<HHII", 262, 3, 1, 1)  # BlackIsZero
    + struct.pack("<HHII", 273, 4, 1, 74)  # StripOffsets -> byte 74
    + struct.pack("<HHII", 279, 4, 1, 2)  # StripByteCounts
    + struct.pack("<I", 0)
)
HAND_TIFF = b"II\x2a\x00" + struct.pack("<I", 8) + _HAND_IFD + bytes([10, 200])


def test_hand_written_tiff():
    assert decode_tiff(HAND_TIFF) == (2, 1, [10, 200])
    assert decode_image_real(HAND_TIFF) == (2, 1, [10, 200])


def test_all_encoder_combos_roundtrip():
    rnd = random.Random(4)
    gray = [rnd.randrange(256) for _ in range(13 * 9)]
    for rgb, pb, be, rps in itertools.product(
        (False, True), (False, True), (False, True), (None, 3)
    ):
        data = encode_tiff(
            gray, 13, 9, rgb=rgb, packbits=pb, big_endian=be, rows_per_strip=rps
        )
        assert decode_tiff(data) == (13, 9, gray), (rgb, pb, be, rps)


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=600))
def test_packbits_roundtrip(blob):
    assert packbits_decode(packbits_encode(blob), len(blob)) == blob


def test_white_is_zero_inverts():
    data = bytearray(encode_tiff([10, 200], 2, 1))
    # photometric tag value offset: find tag 262 in the IFD and zero it
    off = 10
    (n,) = struct.unpack("<H", data[8:10])
    for k in range(n):
        tag = struct.unpack("<H", data[off + 12 * k : off + 12 * k + 2])[0]
        if tag == 262:
            struct.pack_into("<I", data, off + 12 * k + 8, 0)
    assert decode_tiff(bytes(data)) == (2, 1, [245, 55])


def test_error_paths():
    with pytest.raises(ValueError, match="signature"):
        decode_tiff(b"XX\x2a\x00" + b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated|short"):
        decode_tiff(encode_tiff(list(range(16)), 4, 4)[:-4])
    lzw = bytearray(encode_tiff([1, 2, 3, 4], 2, 2))
    (n,) = struct.unpack("<H", lzw[8:10])
    for k in range(n):
        if struct.unpack("<H", lzw[10 + 12 * k : 12 + 12 * k])[0] == 259:
            struct.pack_into("<I", lzw, 10 + 12 * k + 8, 5)  # LZW
    with pytest.raises(ValueError, match="libtiff"):
        decode_tiff(bytes(lzw))


def test_imageio_cross_validation(spark):
    jvm = spark._jvm
    rnd = random.Random(6)
    gray = [rnd.randrange(256) for _ in range(13 * 9)]
    for rgb, pb, be in itertools.product((False, True), repeat=3):
        data = encode_tiff(
            gray, 13, 9, rgb=rgb, packbits=pb, big_endian=be, rows_per_strip=4
        )
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(data))
        )
        assert img is not None, (rgb, pb, be)
        raster = img.getRaster()
        for k, g in enumerate(gray):
            y, x = divmod(k, 13)
            assert raster.getSample(x, y, 0) == g, (rgb, pb, be, x, y)
