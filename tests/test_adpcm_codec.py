"""IMA/DVI ADPCM codec (operators/adpcm.py) — cross-validated against
CPython's independent audioop C implementation. ADPCM is STATEFUL
(unlike the memoryless G.711 companders), so the validation drives the
(index, code) state space with random streams at several amplitudes in
BOTH directions and asserts full step-table coverage, rather than
enumerating inputs. Container strictness and the WAV round trip are
pinned separately; the staged-file ingest is value-checked by
test_oracle_parity."""

from __future__ import annotations

import random

import pytest

from etl_pipeline_old_spark.operators.adpcm import (
    decode_code,
    decode_wav_adpcm,
    encode_sample,
    encode_wav_adpcm,
)

audioop = pytest.importorskip("audioop")


def _audioop_codes(samples: list[int]) -> list[int]:
    """audioop's encode of a stream from state (0,0), unpacked to one
    code per sample (audioop packs the FIRST sample in the HIGH nibble
    and holds a trailing odd nibble in its state, so drive even counts)."""
    assert len(samples) % 2 == 0
    frag = b"".join(s.to_bytes(2, "little", signed=True) for s in samples)
    packed, _st = audioop.lin2adpcm(frag, 2, (0, 0))
    out: list[int] = []
    for b in packed:
        out += [b >> 4, b & 0xF]
    return out


def test_encoder_matches_audioop_streams():
    rng = random.Random(1)
    seen = set()
    for _ in range(300):
        n = rng.randrange(2, 400, 2)
        amp = rng.choice([30, 300, 3000, 32767])
        samples = [rng.randint(-amp, amp) for _ in range(n)]
        ref = _audioop_codes(samples)
        valpred, index = 0, 0
        mine = []
        for s in samples:
            c, valpred, index = encode_sample(s, valpred, index)
            mine.append(c)
            seen.add(index)
        assert mine == ref
    assert len(seen) >= 85  # drives essentially the whole step table


def test_decoder_matches_audioop_streams():
    rng = random.Random(2)
    for _ in range(300):
        n = rng.randrange(2, 400, 2)
        codes = [rng.randint(0, 15) for _ in range(n)]
        packed = bytes(
            (a << 4) | b for a, b in zip(codes[0::2], codes[1::2])
        )
        frag, _st = audioop.adpcm2lin(packed, 2, (0, 0))
        ref = [
            int.from_bytes(frag[i : i + 2], "little", signed=True)
            for i in range(0, len(frag), 2)
        ]
        valpred, index = 0, 0
        mine = []
        for c in codes:
            s, valpred, index = decode_code(c, valpred, index)
            mine.append(s)
        assert mine == ref


def test_wav_container_roundtrip_and_block_layout():
    rng = random.Random(3)
    samples = [rng.randint(-2048, 2048) for _ in range(64)]
    wav = encode_wav_adpcm(samples, 8000, block_align=20)
    # 64 samples at 33/block -> 2 blocks of 20 bytes
    assert wav[:4] == b"RIFF" and b"fact" in wav
    rate, back = decode_wav_adpcm(wav)
    assert rate == 8000 and len(back) == 64
    # block heads carry the first sample VERBATIM (lossless seed)
    assert back[0] == samples[0] and back[33] == samples[33]
    # adaptive tracking keeps the rest within a few steps at this
    # amplitude (random input is ADPCM's worst case; the ingest uses a
    # measured corpus-wide bound)
    assert max(abs(a - b) for a, b in zip(samples, back)) < 6000


def test_wav_blocks_decode_identically_under_audioop():
    """Each block's body, repacked to audioop's nibble order and seeded
    with the block header's state, must decode to our samples — the
    container-level cross-check."""
    import struct

    rng = random.Random(4)
    samples = [rng.randint(-3000, 3000) for _ in range(64)]
    wav = encode_wav_adpcm(samples, 8000, block_align=20)
    _rate, mine = decode_wav_adpcm(wav)
    data = wav[wav.index(b"data") + 8 :]
    out: list[int] = []
    for b0 in range(0, len(data), 20):
        block = data[b0 : b0 + 20]
        valpred, index, _ = struct.unpack("<hBB", block[:4])
        out.append(valpred)
        repacked = bytes(
            ((b & 0x0F) << 4) | (b >> 4) for b in block[4:]
        )  # low-first -> audioop's high-first
        frag, _st = audioop.adpcm2lin(repacked, 2, (valpred, index))
        out += [
            int.from_bytes(frag[i : i + 2], "little", signed=True)
            for i in range(0, len(frag), 2)
        ]
    assert out[:64] == mine


def test_container_strictness():
    wav = encode_wav_adpcm(list(range(64)), 8000)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_adpcm(b"XXXX" + wav[4:])
    bad = bytearray(wav)
    i = wav.index(b"fmt ") + 8
    bad[i] = 0x01  # rewrite tag to plain PCM
    with pytest.raises(ValueError, match="format tag"):
        decode_wav_adpcm(bytes(bad))
    with pytest.raises(ValueError):
        decode_wav_adpcm(wav[:-7])  # torn final block
