"""Baseline JPEG codec (operators/jpeg.py) — round-trip properties and
cross-validation against the JVM's independent javax.imageio decoder.

The cross-validation is the load-bearing check: our encoder's output is
decoded by an implementation we didn't write (OpenJDK's libjpeg-backed
reader), and our decoder reads that implementation's own encoder output —
proving both halves speak real interchange JPEG, not a private dialect.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    find_sof,
)
from etl_pipeline_old_spark.operators.multimodal import decode_image_real


def _imageio_raster(spark, data: bytes):
    """Raw per-band samples via the JVM's ImageIO + Raster (getRGB would
    apply gray->sRGB color management and skew the comparison)."""
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(data))
    )
    assert img is not None, "javax.imageio could not parse our JPEG"
    r = img.getRaster()
    w, h, nb = img.getWidth(), img.getHeight(), r.getNumBands()
    out = np.zeros((h, w, nb), dtype=int)
    for y in range(h):
        for x in range(w):
            for b in range(nb):
                out[y, x, b] = r.getSample(x, y, b)
    return out


# ---------------------------------------------------------- round trips


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(0, 2**32 - 1),
    st.sampled_from([90, 95, 100]),
)
def test_gray_roundtrip_bounded(w, h, seed, quality):
    """decode(encode(img)) stays within a quality-dependent bound on
    uniform-random images (JPEG's worst case) at any dimensions,
    including non-multiple-of-8 edges."""
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 256, w * h)
    data = encode_jpeg(g.tolist(), w, h, quality=quality)
    ww, hh, rgb = decode_jpeg(data)
    assert (ww, hh) == (w, h)
    err = np.abs(rgb[..., 0].astype(int).flatten() - g).max()
    assert err <= {100: 2, 95: 12, 90: 24}[quality]
    # gray stream: all three channels identical
    assert (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 0] == rgb[..., 2]).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1), st.sampled_from(["444", "420"]))
def test_color_roundtrip_bounded(seed, sub):
    rng = np.random.RandomState(seed)
    # smooth chroma (420's contract is low-frequency chroma; random chroma
    # is decimated by design, not by bug)
    xx, yy = np.meshgrid(np.arange(24), np.arange(16))
    base = rng.randint(0, 64)
    rgb = np.stack(
        [
            np.clip(xx * 7 + base, 0, 255),
            np.clip(yy * 9 + base, 0, 255),
            np.clip((xx + yy) * 3 + base, 0, 255),
        ],
        axis=-1,
    )
    data = encode_jpeg(rgb, 24, 16, quality=95, subsampling=sub)
    w, h, out = decode_jpeg(data)
    assert (w, h) == (24, 16)
    assert np.abs(out.astype(int) - rgb).max() <= (16 if sub == "444" else 24)


def test_restart_markers_roundtrip():
    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, 40 * 24)
    data = encode_jpeg(g.tolist(), 40, 24, quality=95, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI present
    assert b"\xff\xd0" in data  # at least one RST0
    w, h, rgb = decode_jpeg(data)
    assert np.abs(rgb[..., 0].astype(int).flatten() - g).max() <= 12


def test_structure_and_dispatch():
    g = list(range(64))
    data = encode_jpeg(g, 8, 8, quality=95)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    # decode_image_real dispatches the SOI magic to the JPEG codec
    w, h, gray = decode_image_real(data)
    assert (w, h) == (8, 8)
    assert np.abs(np.array(gray) - np.array(g)).max() <= 12


# ----------------------------------------------------------- error seams


def test_arithmetic_raises():
    data = bytearray(encode_jpeg(list(range(64)), 8, 8))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="seam"):
        decode_jpeg(bytes(data))


def test_truncated_raises():
    data = encode_jpeg(list(range(64)), 8, 8)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


def test_not_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG1234")


# ------------------------------------------- cross-engine validation (JVM)


def test_imageio_cross_validation(spark):
    """Every mode we stage decodes to the same pixels (+-2) under the
    JVM's independent decoder — gray + DRI, 4:4:4, 4:2:0, odd dims."""
    rng = np.random.RandomState(3)
    g = rng.randint(0, 256, 64)
    cases = [
        encode_jpeg(g.tolist(), 8, 8, quality=95),
        encode_jpeg(g.tolist(), 8, 8, quality=75, restart_interval=1),
    ]
    for data in cases:
        ours = decode_jpeg(data)[2][..., 0].astype(int)
        theirs = _imageio_raster(spark, data)[..., 0]
        assert np.abs(ours - theirs).max() <= 2

    rgb = rng.randint(0, 256, (13, 11, 3))
    for sub in ("444", "420"):
        data = encode_jpeg(rgb, 11, 13, quality=95, subsampling=sub)
        ours = decode_jpeg(data)[2].astype(int)
        theirs = _imageio_raster(spark, data)
        assert theirs.shape == (13, 11, 3)
        assert np.abs(ours - theirs).max() <= 2


def test_decode_foreign_encoder(spark):
    """Our decoder reads a stream produced by an encoder we didn't write
    (ImageIO's writer: its own quant + Huffman table choices)."""
    jvm = spark._jvm
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (16, 16, 3))
    seed = encode_jpeg(rgb, 16, 16, quality=95, subsampling="444")
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(seed))
    )
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    foreign = bytes(baos.toByteArray())
    w, h, ours = decode_jpeg(foreign)
    assert (w, h) == (16, 16)
    theirs = _imageio_raster(spark, foreign)
    assert np.abs(ours.astype(int) - theirs).max() <= 2


# --------------------------------------------------- progressive (SOF2)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
    st.sampled_from([75, 90, 95, 100]),
)
def test_progressive_equals_baseline_gray(w, h, seed, quality):
    """The progressive scan script transmits every coefficient bit, so
    decoding it reproduces the baseline encoding's output EXACTLY — the
    entropy layer changes, the quantized coefficients do not."""
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 256, w * h)
    base = decode_jpeg(encode_jpeg(g.tolist(), w, h, quality=quality))
    prog = decode_jpeg(
        encode_jpeg_progressive(g.tolist(), w, h, quality=quality)
    )
    assert np.array_equal(base[2], prog[2])


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1), st.sampled_from(["444", "420"]))
def test_progressive_equals_baseline_color(seed, sub):
    """Holds for 4:2:0 too: the non-interleaved AC scans cover the
    component grid while the interleaved DC scans cover the MCU-padded
    grid — luma pad blocks carry DC only and never intersect the crop."""
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, (17, 13, 3))
    base = decode_jpeg(encode_jpeg(rgb, 13, 17, quality=95, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(rgb, 13, 17, quality=95, subsampling=sub)
    )
    assert np.array_equal(base[2], prog[2])


def test_progressive_stream_is_sof2_multi_scan():
    data = encode_jpeg_progressive(list(range(64)), 8, 8)
    off, tag = find_sof(data)
    assert tag == 0xC2
    # DC first + 2 luma AC bands + DC refine + 2 AC refine bands = 6 scans
    assert data.count(b"\xff\xda") >= 6


def test_progressive_420_grid_edges():
    """Dims where the luma MCU grid strictly exceeds the component grid
    (w or h in (8k, 16k] territory) — the padding seam the 4:2:0
    encoder must keep DC-only."""
    rng = np.random.RandomState(33)
    for w, h in ((17, 31), (33, 15), (24, 16)):
        rgb = rng.randint(0, 256, (h, w, 3)).astype(float)
        base = decode_jpeg(encode_jpeg(rgb, w, h, quality=90, subsampling="420"))
        prog = decode_jpeg(
            encode_jpeg_progressive(rgb, w, h, quality=90, subsampling="420")
        )
        assert np.array_equal(base[2], prog[2])


def test_progressive_restart_markers_equal_baseline():
    """Progressive streams carrying DRI + RSTn (the libjpeg
    error-resilience layout) decode bit-identically to baseline: DC
    prediction and EOB runs reset at every boundary on both sides.
    Interval 1 maximizes marker density (a restart after EVERY unit);
    odd intervals exercise runs that would otherwise span boundaries."""
    rng = np.random.RandomState(77)
    g = rng.randint(0, 256, 40 * 24)
    base = decode_jpeg(encode_jpeg(g.tolist(), 40, 24, quality=90))
    for ri in (1, 3, 7):
        data = encode_jpeg_progressive(
            g.tolist(), 40, 24, quality=90, restart_interval=ri
        )
        assert b"\xff\xdd" in data  # DRI present
        assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))
        assert np.array_equal(decode_jpeg(data)[2], base[2])
    # color + 4:2:0: restart units are MCUs for DC, blocks for AC scans
    rgb = rng.randint(0, 256, (17, 21, 3))
    base = decode_jpeg(encode_jpeg(rgb, 21, 17, quality=90, subsampling="420"))
    for ri in (1, 2, 5):
        data = encode_jpeg_progressive(
            rgb, 21, 17, quality=90, subsampling="420", restart_interval=ri
        )
        assert np.array_equal(decode_jpeg(data)[2], base[2])


def test_progressive_restart_imageio_cross_validation(spark):
    """The restart-laden progressive stream is real interchange JPEG: the
    JVM's independent decoder reads it to the same pixels we do."""
    rng = np.random.RandomState(42)
    g = rng.randint(0, 256, 29 * 18)
    data = encode_jpeg_progressive(
        g.tolist(), 29, 18, quality=95, restart_interval=2
    )
    ours = decode_jpeg(data)[2][..., 0].astype(int)
    theirs = _imageio_raster(spark, data)[..., 0]
    assert np.abs(ours - theirs).max() <= 2

    rgb = rng.randint(0, 256, (13, 11, 3))
    data = encode_jpeg_progressive(
        rgb, 11, 13, quality=95, subsampling="444", restart_interval=3
    )
    ours = decode_jpeg(data)[2].astype(int)
    theirs = _imageio_raster(spark, data)
    assert np.abs(ours - theirs).max() <= 2


def test_progressive_imageio_cross_validation(spark):
    """Our progressive output decodes identically (+-2) under the JVM's
    independent decoder — proof the multi-scan stream is real interchange
    JPEG, not a dialect only our own decoder reads."""
    rng = np.random.RandomState(9)
    g = rng.randint(0, 256, 13 * 9)
    data = encode_jpeg_progressive(g.tolist(), 13, 9, quality=95)
    ours = decode_jpeg(data)[2][..., 0].astype(int)
    theirs = _imageio_raster(spark, data)[..., 0]
    assert np.abs(ours - theirs).max() <= 2

    rgb = rng.randint(0, 256, (13, 11, 3))
    data = encode_jpeg_progressive(rgb, 11, 13, quality=95, subsampling="444")
    ours = decode_jpeg(data)[2].astype(int)
    theirs = _imageio_raster(spark, data)
    assert np.abs(ours - theirs).max() <= 2


def test_decode_foreign_progressive_encoder(spark):
    """Our decoder reads a PROGRESSIVE stream produced by an encoder we
    didn't write (ImageIO's writer in MODE_DEFAULT: its own scan script,
    successive approximation choices, and chroma subsampling — including
    the non-interleaved AC block grid that differs from the MCU grid)."""
    jvm = spark._jvm
    rng = np.random.RandomState(13)
    for w, h in ((11, 13), (21, 19)):
        rgb = rng.randint(0, 256, (h, w, 3))
        seed = encode_jpeg(rgb, w, h, quality=95, subsampling="444")
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(seed))
        )
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "jpg"
        ).next()
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        ios.flush()
        foreign = bytes(baos.toByteArray())
        assert find_sof(foreign)[1] == 0xC2  # genuinely progressive
        ww, hh, ours = decode_jpeg(foreign)
        assert (ww, hh) == (w, h)
        theirs = _imageio_raster(spark, foreign)
        # ImageIO's writer subsamples chroma, and the two decoders
        # reconstruct it with different upsample filters (our triangle vs
        # its box), so the per-pixel bound is looser than the same-chroma
        # cases; the mean must stay sub-level, or the scan accumulation
        # itself is wrong
        diff = np.abs(ours.astype(int) - theirs)
        assert diff.max() <= 6
        assert diff.mean() < 1.0
