"""IMA/DVI ADPCM codec + its WAV container (format tag 0x11), pure
stdlib — the classic 4:1 compressed-speech format (telephony, games,
legacy voice corpora): 16-bit linear PCM <-> 4-bit codes through an
adaptive step-size predictor.

The core transform is the public IMA ADPCM algorithm (IMA Digital Audio
Focus Group, 1992; the Intel/DVI adaptation): an 89-entry step-size
table indexed by an adaptation state, each 4-bit code carrying sign +
3 magnitude bits of the prediction difference. Implemented from the
published tables/flow and CROSS-VALIDATED against CPython's independent
``audioop`` C implementation over random streams in both directions
with full state-table coverage (tests/test_adpcm_codec.py) — unlike the
memoryless G.711 companders next door, ADPCM is STATEFUL, so the
validation drives the (index, code) state space rather than enumerating
inputs.

The WAV container follows the Microsoft WAVE spec for tag 0x11: fmt
chunk with wSamplesPerBlock, a fact chunk carrying the true sample
count (mandatory for compressed WAVE), and block-aligned data — each
block opens with a 4-byte state header (int16 predictor = the block's
first sample, uint8 step index, reserved) followed by nibbles packed
LOW-FIRST (note: audioop packs high-first; the container tests repack
accordingly).
"""

from __future__ import annotations

import struct

# the public IMA step-size table (89 entries)
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

# index adjustment per 3-bit code magnitude (sign bit excluded)
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_index(i: int) -> int:
    return 0 if i < 0 else (88 if i > 88 else i)


def encode_sample(sample: int, valpred: int, index: int) -> tuple[int, int, int]:
    """One 16-bit sample -> (4-bit code, new predictor, new index)."""
    step = STEP_TABLE[index]
    diff = sample - valpred
    code = 0x8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    vpdiff = step >> 3
    if diff >= step:
        code |= 4
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        code |= 2
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        code |= 1
        vpdiff += step
    valpred = _clamp16(valpred - vpdiff if code & 0x8 else valpred + vpdiff)
    index = _clamp_index(index + INDEX_TABLE[code & 0x7])
    return code, valpred, index


def decode_code(code: int, valpred: int, index: int) -> tuple[int, int, int]:
    """One 4-bit code -> (16-bit sample, new predictor, new index)."""
    step = STEP_TABLE[index]
    vpdiff = step >> 3
    if code & 4:
        vpdiff += step
    if code & 2:
        vpdiff += step >> 1
    if code & 1:
        vpdiff += step >> 2
    valpred = _clamp16(valpred - vpdiff if code & 0x8 else valpred + vpdiff)
    index = _clamp_index(index + INDEX_TABLE[code & 0x7])
    return valpred, valpred, index


# ------------------------------------------------------ WAV container


def encode_wav_adpcm(
    samples: list[int], sample_rate: int = 8000, block_align: int = 20
) -> bytes:
    """Mono IMA-ADPCM WAVE bytes (format tag 0x11): block-aligned data,
    each block's header carrying its first sample verbatim as the
    predictor seed; a short final block is zero-code padded and the fact
    chunk records the true sample count."""
    spb = (block_align - 4) * 2 + 1  # samples per block
    blocks = bytearray()
    for b0 in range(0, len(samples), spb):
        chunk = samples[b0 : b0 + spb]
        valpred = _clamp16(int(chunk[0]))
        index = 0
        blocks += struct.pack("<hBB", valpred, index, 0)
        codes: list[int] = []
        for s in chunk[1:]:
            code, valpred, index = encode_sample(int(s), valpred, index)
            codes.append(code)
        codes += [0] * (spb - 1 - len(codes))  # short final block padding
        for lo, hi in zip(codes[0::2], codes[1::2]):
            blocks.append(lo | (hi << 4))  # LOW nibble first per the spec
    n_blocks = -(-len(samples) // spb)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", len(samples))
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    assert len(blocks) == n_blocks * block_align
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_wav_adpcm(payload: bytes) -> tuple[int, list[int]]:
    """Mono IMA-ADPCM WAVE -> (sample_rate, 16-bit samples). Strict on
    the container: RIFF/WAVE magic, tag 0x11, mono, a fact chunk, and
    block sizes must all check out."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i = 12
    fmt = fact_n = data = None
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"fact":
            (fact_n,) = struct.unpack("<I", body[:4])
        elif tag == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None or fact_n is None:
        raise ValueError("missing fmt/fact/data chunk")
    wtag, nch, rate, _br, block_align, bits, _cb, spb = struct.unpack(
        "<HHIIHHHH", fmt[:20]
    )
    if wtag != 0x11:
        raise ValueError(f"not IMA ADPCM (format tag 0x{wtag:X})")
    if nch != 1:
        raise ValueError(f"{nch}-channel ADPCM unsupported")
    if bits != 4:
        raise ValueError(f"{bits}-bit ADPCM codes unsupported")
    if spb != (block_align - 4) * 2 + 1:
        raise ValueError("wSamplesPerBlock inconsistent with nBlockAlign")
    if len(data) % block_align:
        raise ValueError("data chunk is not block-aligned")
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        valpred, index, _rsv = struct.unpack("<hBB", block[:4])
        if index > 88:
            raise ValueError(f"step index {index} out of range")
        out.append(valpred)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):  # low nibble first
                s, valpred, index = decode_code(code, valpred, index)
                out.append(s)
    if fact_n > len(out):
        raise ValueError("fact chunk claims more samples than data holds")
    return rate, out[:fact_n]
