"""GIF + BMP codecs (operators/gif_bmp.py): hand-written fixtures,
round-trip properties (LZW growth/reset, interlace, palettes, row
padding), and cross-validation against the JVM's independent
javax.imageio readers."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.gif_bmp import (
    decode_bmp,
    decode_gif,
    encode_bmp,
    encode_gif,
)
from etl_pipeline_old_spark.operators.multimodal import decode_image_real

# A 2x1 GIF87a written BY HAND per the spec — independent of encode_gif.
# Global color table: black, white.  LZW mcs=2: codes are 3 bits wide
# (clear=4, eoi=5); pixel indexes 0, 1.  Bit stream LSB-first:
# 100 (clear) 000 (px 0) 001 (px 1) 101 (eoi) -> bits 100000001101 ->
# bytes 0b00001 100=0x0C? assemble: acc=100(LSB first: 4), then 0<<3,
# 1<<6, 5<<9 -> value = 4 + 0 + 64 + 2560 = 0xA44 -> bytes 44 0A.
HAND_GIF = (
    b"GIF87a"
    + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)  # GCT present, 2 entries
    + b"\x00\x00\x00\xff\xff\xff"
    + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
    + b"\x02"  # LZW min code size
    + b"\x02\x44\x0a"  # one 2-byte sub-block
    + b"\x00\x3b"
)

# A 1x1 24-bit BMP written BY HAND: one gray-128 pixel, row padded to 4.
HAND_BMP = (
    b"BM"
    + struct.pack("<IHHI", 14 + 40 + 4, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 2835, 2835, 0, 0)
    + b"\x80\x80\x80\x00"
)


def test_hand_written_gif():
    assert decode_gif(HAND_GIF) == (2, 1, [0, 255])
    assert decode_image_real(HAND_GIF) == (2, 1, [0, 255])


def test_hand_written_bmp():
    assert decode_bmp(HAND_BMP) == (1, 1, [128])
    assert decode_image_real(HAND_BMP) == (1, 1, [128])


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.integers(0, 2**32 - 1),
    st.booleans(),
)
def test_gif_roundtrip(w, h, seed, interlace):
    rnd = random.Random(seed)
    gray = [rnd.randrange(256) for _ in range(w * h)]
    assert decode_gif(encode_gif(gray, w, h, interlace=interlace)) == (w, h, gray)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.integers(0, 2**32 - 1),
    st.sampled_from([8, 24]),
)
def test_bmp_roundtrip(w, h, seed, bpp):
    rnd = random.Random(seed)
    gray = [rnd.randrange(256) for _ in range(w * h)]
    assert decode_bmp(encode_bmp(gray, w, h, bpp=bpp)) == (w, h, gray)


def test_gif_lzw_table_reset():
    # >4096 dictionary entries forces the in-stream CLEAR/reset path
    rnd = random.Random(1)
    gray = [rnd.randrange(256) for _ in range(128 * 128)]
    assert decode_gif(encode_gif(gray, 128, 128)) == (128, 128, gray)


def test_gif_tiny_palette_and_flat_image():
    two = [0, 255] * 32
    assert decode_gif(encode_gif(two, 8, 8)) == (8, 8, two)
    flat = [7] * 64
    assert decode_gif(encode_gif(flat, 8, 8, interlace=True)) == (8, 8, flat)


def test_gif_skips_extensions():
    # splice a graphic-control extension between the LSD/GCT and the image
    data = bytearray(encode_gif([1, 2, 3, 4], 2, 2))
    img_off = data.index(0x2C, 13)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(data[:img_off]) + ext + bytes(data[img_off:])
    assert decode_gif(spliced) == (2, 2, [1, 2, 3, 4])


def test_bmp_top_down_rows():
    # negative height = top-down row order; decoder must not flip
    data = bytearray(encode_bmp([10, 20, 30, 40], 2, 2, bpp=24))
    struct.pack_into("<i", data, 22, -2)  # biHeight = -2
    raster = bytearray(data[54:])
    # encoder wrote bottom-up (30 40 / 10 20); relabeling top-down means
    # the decoded image is now vertically flipped
    assert decode_bmp(bytes(data)) == (2, 2, [30, 40, 10, 20])


def test_error_paths():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="truncated|short|no image"):
        decode_gif(encode_gif([1, 2, 3, 4], 2, 2)[:-6])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(list(range(16)), 4, 4)[:-8])
    with pytest.raises(ValueError, match="compressed"):
        bad = bytearray(encode_bmp([1], 1, 1))
        struct.pack_into("<I", bad, 30, 1)  # biCompression = BI_RLE8
        decode_bmp(bytes(bad))


def test_imageio_cross_validation(spark):
    """Plain + interlaced GIF and 8/24-bit BMP from our encoders decode
    to identical pixels under the JVM's independent readers."""
    jvm = spark._jvm
    rnd = random.Random(9)
    gray = [rnd.randrange(256) for _ in range(13 * 9)]
    cases = [
        encode_gif(gray, 13, 9),
        encode_gif(gray, 13, 9, interlace=True),
        encode_bmp(gray, 13, 9, bpp=24),
        encode_bmp(gray, 13, 9, bpp=8),
    ]
    for data in cases:
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(data))
        )
        assert img is not None
        assert (img.getWidth(), img.getHeight()) == (13, 9)
        raster = img.getRaster()
        for k, g in enumerate(gray):
            y, x = divmod(k, 13)
            if raster.getNumBands() == 1:  # gray-ramp palette or indexed
                got = raster.getSample(x, y, 0)
                if img.getType() == 13:  # TYPE_BYTE_INDEXED: map via model
                    got = img.getColorModel().getRed(got)
            else:
                got = raster.getSample(x, y, 0)
            assert got == g, (data[:6], x, y, got, g)


# ---------------------------------------------------------- GIF animation

from etl_pipeline_old_spark.operators.gif_bmp import (  # noqa: E402
    decode_gif_frames,
    encode_gif_animation,
)


def test_animation_composition_disposal_1_and_2():
    base = list(range(64))
    patches = [
        (1, 2, 4, 4, 200, 5, 1),   # persists
        (3, 0, 4, 4, 123, 7, 2),   # restored to bg after display
        (0, 0, 2, 2, 77, 3, 1),
    ]
    blob = encode_gif_animation(base, 8, 8, patches, bg_gray=9)
    w, h, bg, frames = decode_gif_frames(blob)
    assert (w, h, bg, len(frames)) == (8, 8, 9, 4)
    assert frames[0][2] == base
    c1 = list(base)
    for y in range(2, 6):
        for x in range(1, 5):
            c1[y * 8 + x] = 200
    assert frames[1] == (5, 1, c1)
    c2 = list(c1)
    for y in range(0, 4):
        for x in range(3, 7):
            c2[y * 8 + x] = 123
    assert frames[2] == (7, 2, c2)
    # frame 2's rect restored to bg BEFORE frame 3 paints
    c3 = list(c1)
    for y in range(0, 4):
        for x in range(3, 7):
            c3[y * 8 + x] = 9
    for y in range(0, 2):
        for x in range(0, 2):
            c3[y * 8 + x] = 77
    assert frames[3] == (3, 1, c3)


def test_animation_transparency_leaves_canvas():
    # hand-splice a transparency flag into a patch frame's GCE: indexes
    # equal to the transparent index must leave the canvas untouched
    base = [50] * 64
    blob = bytearray(
        encode_gif_animation(base, 8, 8, [(0, 0, 4, 4, 200, 5, 1)])
    )
    # the SECOND GCE (the patch's): set transparency flag + index 200
    at = blob.find(b"\x21\xf9", blob.find(b"\x21\xf9") + 2)
    blob[at + 3] |= 0x01       # transparent color flag
    blob[at + 6] = 200         # transparent index == the patch's value
    _w, _h, _bg, frames = decode_gif_frames(bytes(blob))
    assert frames[1][2] == base  # nothing painted


def test_animation_disposal_3_restores_previous():
    base = [10] * 64
    blob = bytearray(
        encode_gif_animation(
            base, 8, 8,
            [(0, 0, 4, 4, 99, 5, 3), (4, 4, 2, 2, 88, 5, 1)],
        )
    )
    _w, _h, _bg, frames = decode_gif_frames(bytes(blob))
    # frame 1 shows the 99-rect; frame 2 starts from the RESTORED base
    assert frames[1][2][0] == 99
    c2 = list(base)
    for y in range(4, 6):
        for x in range(4, 6):
            c2[y * 8 + x] = 88
    assert frames[2][2] == c2


def test_animation_oob_rect_is_loud():
    with pytest.raises(ValueError, match="outside the logical screen"):
        encode_gif_animation([0] * 64, 8, 8, [(6, 6, 4, 4, 1, 5, 1)])
    blob = bytearray(
        encode_gif_animation([0] * 64, 8, 8, [(4, 4, 4, 4, 1, 5, 1)])
    )
    # corrupt the patch descriptor's left coordinate past the screen
    at = blob.rfind(b"\x2c")
    blob[at + 1] = 7
    with pytest.raises(ValueError, match="outside the logical screen"):
        decode_gif_frames(bytes(blob))


def test_animation_still_gif_decodes_as_one_frame():
    from etl_pipeline_old_spark.operators.gif_bmp import encode_gif

    base = list(range(64))
    _w, _h, _bg, frames = decode_gif_frames(encode_gif(base, 8, 8))
    assert len(frames) == 1 and frames[0][2] == base
