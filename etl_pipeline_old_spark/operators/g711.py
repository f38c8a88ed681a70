"""G.711 companding codecs — µ-law and A-law, pure stdlib.

The ITU-T G.711 logarithmic companders (public spec, 1972): 16-bit
linear PCM <-> 8-bit companded bytes, the encoding every telephony WAV
(format tags 7 and 6) and SIP/RTP stream uses.  Implemented from the
spec's segmented approximation (sign + 3-bit segment + 4-bit mantissa;
µ-law adds a 33-unit bias and ones-complements the result, A-law XORs
0x55 with even-bit inversion).

Two exact properties the tests pin:
- codebook idempotence: encode(decode(b)) == b for all 256 A-law bytes
  and 255 µ-law bytes (0x7F, "minus zero", re-encodes to the canonical
  0xFF with the same decode value);
- bounded quantization: |decode(encode(s)) - s| <= half the segment step
  (+3 for µ-law's 14-bit pre-truncation), exhaustive over all int16.

Cross-validated EXHAUSTIVELY (all 65536 encode inputs, all 256 decode
codes, both laws) against CPython's independent audioop C implementation
in tests/test_g711_codec.py.
"""

from __future__ import annotations

import struct

_ULAW_BIAS = 0x84  # 132: the spec's bias applied before the log segment

# segment end points in the 14-bit µ-law domain (post-bias magnitudes)
_ULAW_SEG_END = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)

# segment end points in the 13-bit A-law domain
_ALAW_SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def linear2ulaw(pcm: int) -> int:
    """16-bit signed linear -> 8-bit µ-law byte.

    The canonical CCITT algorithm (as in sox / CPython's audioop) works
    in the 14-bit domain: the two low bits are dropped FIRST (arithmetic
    shift, so negative magnitudes round up), then the 33-unit bias is
    added before the segment search."""
    pcm >>= 2  # Python's >> floors like a C arithmetic shift
    if pcm < 0:
        pcm = -pcm
        mask = 0x7F
    else:
        mask = 0xFF
    pcm = min(pcm, 8159) + (_ULAW_BIAS >> 2)
    for seg, end in enumerate(_ULAW_SEG_END):
        if pcm <= end:
            return ((seg << 4) | ((pcm >> (seg + 1)) & 0x0F)) ^ mask
    return 0x7F ^ mask


def ulaw2linear(b: int) -> int:
    """8-bit µ-law byte -> 16-bit signed linear."""
    b = ~b & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    pcm = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return -pcm if sign else pcm


def linear2alaw(pcm: int) -> int:
    """16-bit signed linear -> 8-bit A-law byte."""
    val = pcm >> 3  # A-law works in a 13-bit domain
    if val >= 0:
        mask = 0xD5  # sign bit set = positive, even bits inverted
    else:
        mask = 0x55
        val = -val - 1
    seg = 8
    for i, end in enumerate(_ALAW_SEG_END):
        if val <= end:
            seg = i
            break
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (val >> 1 if seg < 2 else val >> seg) & 0x0F
    return aval ^ mask


def alaw2linear(b: int) -> int:
    """8-bit A-law byte -> 16-bit signed linear."""
    b ^= 0x55
    t = (b & 0x0F) << 4
    seg = (b & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if b & 0x80 else -t


def md5_codes(text: str, n: int) -> list[int]:
    """Deterministic companded 'recording' of a document: code j is the
    unsigned byte j%16 of md5('g{j//16}:' + text) — the G.711 analogue of
    multimodal.md5_samples, recomputable in SQL via md5_code_sql below."""
    import hashlib

    out: list[int] = []
    for k in range((n + 15) // 16):
        out.extend(hashlib.md5(f"g{k}:".encode() + text.encode("utf-8")).digest())
    return out[:n]


def md5_code_sql(j: int, text_col: str = "text") -> str:
    """DuckDB SQL for code j of md5_codes — single source of truth for the
    oracle-side byte formula."""
    return (
        f"('0x' || substr(md5('g{j // 16}:' || {text_col}), {(j % 16) * 2 + 1}, 2))::INT"
    )


# DuckDB SQL expanding a companded byte ``b`` to 16-bit linear — the exact
# integer algebra of ulaw2linear/alaw2linear above (255-b is ~b & 0xFF),
# verified equal for all 256 codes in tests/test_g711_codec.py's oracle
# parity path.  Rendered as lambdas for list_transform.
ULAW_EXPAND_SQL = (
    "(CASE WHEN 255 - b >= 128 THEN -1 ELSE 1 END)"
    " * ((((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8)) - 132)"
)
ALAW_EXPAND_SQL = (
    "(CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END)"
    " * (CASE WHEN (xor(b, 85) // 16) % 8 = 0 THEN (xor(b, 85) % 16) * 16 + 8"
    "         WHEN (xor(b, 85) // 16) % 8 = 1 THEN (xor(b, 85) % 16) * 16 + 264"
    "         ELSE ((xor(b, 85) % 16) * 16 + 264)"
    "              * (1 << ((xor(b, 85) // 16) % 8 - 1)) END)"
)


def encode_wav_g711(
    samples: list[int],
    law: str,
    sample_rate: int = 8_000,
    channels: int = 1,
) -> bytes:
    """Real RIFF/WAVE bytes holding G.711-companded audio: ``law`` is
    'ulaw' (format tag 7) or 'alaw' (tag 6).  The canonical telephony
    container — one companded byte per sample, fmt chunk with the
    spec-required cbSize=0 extension field."""
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"unknown companding law {law!r}")
    if channels < 1 or len(samples) % channels:
        raise ValueError(f"{len(samples)} samples for {channels} channels")
    enc = linear2ulaw if law == "ulaw" else linear2alaw
    data = bytes(enc(s) for s in samples)
    tag = 7 if law == "ulaw" else 6
    # non-PCM fmt chunks carry the 2-byte cbSize (=0) extension
    fmt = struct.pack(
        "<HHIIHHH", tag, channels, sample_rate, sample_rate * channels,
        channels, 8, 0,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + (len(data) & 1))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")  # word-align the chunk
    )
