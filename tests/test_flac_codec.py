"""Subset FLAC codec (operators/flac.py): lossless round-trip across
every subframe type (CONSTANT / VERBATIM / FIXED 0-4 / LPC), all three
stereo decorrelation modes, wasted bits, multi-partition and escaped
Rice residuals, multi-frame streams with short tail blocks — plus
corruption detection (header CRC-8, frame CRC-16, STREAMINFO MD5) and
structural checks of the container. No independent FLAC implementation
exists in this environment, so the round-trip + CRC/MD5 properties and
the spec-pinned byte structure are the validation; the ingest query's
oracle additionally demands exact sample recovery (lossless) against
the md5 signal formula."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def _sig(text: str, n: int) -> list[int]:
    """Deterministic pseudo-audio (same shape as md5_samples)."""
    out = []
    k = 0
    while len(out) < n:
        d = hashlib.md5(f"s{k}:{text}".encode()).digest()
        for i in range(8):
            v = int.from_bytes(d[2 * i : 2 * i + 2], "big", signed=True)
            out.append(v)
        k += 1
    return out[:n]


def test_crc_vectors():
    # spec polynomials against independently computed check values:
    # CRC-8/SMBUS ('123456789' -> 0xF4), CRC-16/BUYPASS ('123456789' -> 0xFEE8)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_container_structure():
    data = encode_flac(_sig("x", 64), 1, 8000, block_size=16)
    assert data[:4] == b"fLaC"
    assert data[4] == 0x80  # last-metadata flag + STREAMINFO type
    assert int.from_bytes(data[5:8], "big") == 34
    # first frame sync: 0xFF 0xF8 (14-bit sync + reserved 0 + fixed strategy)
    assert data[42] == 0xFF and data[43] == 0xF8


def test_mono_roundtrip_exact():
    s = _sig("mono", 100)
    sr, ch, bps, got = decode_flac(encode_flac(s, 1, 8000, block_size=32))
    assert (sr, ch, bps) == (8000, 1, 16)
    assert got == s  # lossless, including the short 4-sample tail frame


def test_verbatim_constant_and_fixed_paths():
    const = [123] * 64
    data = encode_flac(const, 1, 8000, block_size=64)
    assert decode_flac(data)[3] == const
    rnd = _sig("v", 64)
    forced = encode_flac(rnd, 1, 8000, block_size=64, force="verbatim")
    auto = encode_flac(rnd, 1, 8000, block_size=64)
    assert decode_flac(forced)[3] == rnd
    assert decode_flac(auto)[3] == rnd
    # a smooth ramp compresses through the fixed predictors
    ramp = [i * 3 - 90 for i in range(64)]
    packed = encode_flac(ramp, 1, 8000, block_size=64)
    assert decode_flac(packed)[3] == ramp
    assert len(packed) < len(encode_flac(ramp, 1, 8000, block_size=64, force="verbatim"))


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_roundtrip(mode):
    n = 80
    left = _sig("L", n)
    right = [(a // 2) + d for a, d in zip(left, _sig("R", n))]
    right = [max(-32768, min(32767, v)) for v in right]
    inter = [v for pair in zip(left, right) for v in pair]
    got = decode_flac(encode_flac(inter, 2, 44100, block_size=32, stereo_mode=mode))
    assert got[0] == 44100 and got[1] == 2
    assert got[3] == inter


def test_lpc_subframe_roundtrip():
    """Genuine LPC subframes (order 2 and 8, nonzero shift) decode
    exactly — the path real encoders emit that the fixed-order staging
    encoder alone would never exercise."""
    s = _sig("lpc", 96)
    for coefs, shift in (
        ([53, -21], 5),
        ([31, -15, 7, -3, 2, -1, 1, -1], 4),
    ):
        data = encode_flac(s, 1, 8000, block_size=48, lpc=(coefs, shift))
        assert decode_flac(data)[3] == s


def test_wasted_bits_roundtrip():
    s = [v & ~0x7 for v in _sig("w", 64)]  # 3 common trailing zero bits
    data = encode_flac(s, 1, 8000, block_size=64)
    assert decode_flac(data)[3] == s


def test_partitioned_and_escaped_residuals():
    s = _sig("p", 128)
    parts = encode_flac(s, 1, 8000, block_size=64, partition_order=2)
    assert decode_flac(parts)[3] == s
    esc = encode_flac(s, 1, 8000, block_size=64, force_escape=True)
    assert decode_flac(esc)[3] == s
    lpc_parts = encode_flac(
        s, 1, 8000, block_size=64, partition_order=2, lpc=([47, -13], 5)
    )
    assert decode_flac(lpc_parts)[3] == s


def test_corruption_is_detected():
    s = _sig("c", 256)
    data = bytearray(encode_flac(s, 1, 8000, block_size=64))
    # frame-header byte flip -> CRC-8 (or sync) failure
    bad = bytearray(data)
    bad[45] ^= 0x01  # inside the first frame header
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # entropy-body flip -> CRC-16 failure (or MD5 if the damage decodes)
    bad = bytearray(data)
    bad[-3] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # STREAMINFO MD5 flip -> decode must refuse the otherwise-valid audio
    bad = bytearray(data)
    bad[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    # truncation
    with pytest.raises(ValueError):
        decode_flac(bytes(data[: len(data) // 2]))


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxxWAVE")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
    st.sampled_from([1, 2]),
    st.sampled_from([8, 16, 32, 4096]),
    st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
)
def test_roundtrip_property(samples, n_ch, block, mode):
    if len(samples) % n_ch:
        samples = samples[: len(samples) - 1]
    if n_ch == 1:
        mode = "independent"
    got = decode_flac(
        encode_flac(samples, n_ch, 16000, block_size=block, stereo_mode=mode)
    )
    assert got[3] == samples
