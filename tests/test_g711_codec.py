"""G.711 companding codec tests — the operators/g711.py µ-law and A-law
companders are verified EXHAUSTIVELY against CPython's independent C
implementation (audioop, the classic Sun companding code): every one of
the 65 536 int16 encode inputs and all 256 decode codewords, both laws.
On top of the cross-validation: codebook idempotence (each companded
byte is the canonical code of its decode value), bounded quantization
error, and the RIFF/WAVE container round-trip through the same
decode_audio_real entry point the ingest queries use (format tags 6/7,
cbSize extension, odd-length word-align pad)."""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_old_spark.operators.g711 import (
    alaw2linear,
    encode_wav_g711,
    linear2alaw,
    linear2ulaw,
    ulaw2linear,
)
from etl_pipeline_old_spark.operators.multimodal import decode_audio_real

# audioop ships with CPython <= 3.12 (this container: 3.11); it is an
# independent C port of the Sun G.711 reference, ideal as an oracle.
audioop = pytest.importorskip("audioop")

ALL_INT16 = range(-32768, 32768)
ALL_INT16_BUF = b"".join(struct.pack("<h", s) for s in ALL_INT16)


def test_ulaw_encode_matches_audioop_exhaustive():
    theirs = audioop.lin2ulaw(ALL_INT16_BUF, 2)
    ours = bytes(linear2ulaw(s) for s in ALL_INT16)
    assert ours == theirs


def test_alaw_encode_matches_audioop_exhaustive():
    theirs = audioop.lin2alaw(ALL_INT16_BUF, 2)
    ours = bytes(linear2alaw(s) for s in ALL_INT16)
    assert ours == theirs


def test_ulaw_decode_matches_audioop_all_codes():
    theirs = audioop.ulaw2lin(bytes(range(256)), 2)
    ours = b"".join(struct.pack("<h", ulaw2linear(b)) for b in range(256))
    assert ours == theirs


def test_alaw_decode_matches_audioop_all_codes():
    theirs = audioop.alaw2lin(bytes(range(256)), 2)
    ours = b"".join(struct.pack("<h", alaw2linear(b)) for b in range(256))
    assert ours == theirs


def test_ulaw_codebook_idempotence():
    # every code except 0x7F ("minus zero", decodes to 0 like 0xFF does)
    # is the canonical representative of its decode value; 0x7F re-encodes
    # to the canonical positive zero 0xFF with the same decode value.
    for b in range(256):
        again = linear2ulaw(ulaw2linear(b))
        if b == 0x7F:
            assert again == 0xFF
        else:
            assert again == b
        assert ulaw2linear(again) == ulaw2linear(b)


def test_alaw_codebook_idempotence():
    # A-law has no zero output (smallest magnitudes are ±8), so all 256
    # codes decode to distinct values and idempotence is exact.
    assert len({alaw2linear(b) for b in range(256)}) == 256
    for b in range(256):
        assert linear2alaw(alaw2linear(b)) == b


def test_ulaw_quantization_bound():
    # within the clip range the error is at most half the top-segment
    # step (1024/2) plus the 3 units the 14-bit pre-truncation can add;
    # beyond the ±32636 clip everything maps to ±32124.
    for s in ALL_INT16:
        err = abs(ulaw2linear(linear2ulaw(s)) - s)
        if abs(s) <= 32636:
            assert err <= 515, (s, err)
        else:
            assert err <= 32768 - 32124, (s, err)


def test_alaw_quantization_bound():
    # A-law never clips int16 (13-bit domain covers >>3 of any int16);
    # max error is half the top-segment step (16 << 6 = 1024).
    for s in ALL_INT16:
        err = abs(alaw2linear(linear2alaw(s)) - s)
        assert err <= 512, (s, err)


@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
@pytest.mark.parametrize("channels", [1, 2])
def test_wav_g711_container_roundtrip(law, tag, channels):
    dec = ulaw2linear if law == "ulaw" else alaw2linear
    enc = linear2ulaw if law == "ulaw" else linear2alaw
    samples = [(s * 997 - 40000) % 65536 - 32768 for s in range(30 * channels)]
    payload = encode_wav_g711(samples, law, sample_rate=8000, channels=channels)
    (tag_read,) = struct.unpack("<H", payload[20:22])
    assert tag_read == tag
    rate, ch, out = decode_audio_real(payload)
    assert (rate, ch) == (8000, channels)
    assert out == [dec(enc(s)) for s in samples]


def test_wav_g711_odd_length_pad():
    # 31 mono companded bytes -> odd data chunk -> spec pad byte appended;
    # the decoder's chunk walk must honor it and still return 31 samples.
    samples = list(range(-15, 16))
    payload = encode_wav_g711(samples, "ulaw")
    assert len(payload) % 2 == 0
    _, _, out = decode_audio_real(payload)
    assert len(out) == 31
    assert out == [ulaw2linear(linear2ulaw(s)) for s in samples]


def test_wav_g711_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_wav_g711([1, 2, 3], "mp3")
    with pytest.raises(ValueError):
        encode_wav_g711([1, 2, 3], "ulaw", channels=2)


def test_wav_zero_channels_raises_cleanly():
    # a malformed fmt chunk declaring 0 channels must raise ValueError,
    # not ZeroDivisionError from the frame-alignment check
    payload = bytearray(encode_wav_g711([1, 2, 3, 4], "ulaw"))
    payload[22:24] = b"\x00\x00"  # fmt channels field
    with pytest.raises(ValueError, match="0 channels"):
        decode_audio_real(bytes(payload))


def test_spec_published_zero_codes():
    """The two G.711 known-answer values the standard itself fixes
    (belt-and-braces over the audioop exhaustive cross-validation):
    positive zero codes to 0xFF under µ-law (all-ones after the
    complement convention) and to 0xD5 under A-law (sign bit set,
    even bits inverted)."""
    from etl_pipeline_old_spark.operators.g711 import (
        alaw2linear,
        linear2alaw,
        linear2ulaw,
        ulaw2linear,
    )

    assert linear2ulaw(0) == 0xFF
    assert linear2alaw(0) == 0xD5
    assert ulaw2linear(0xFF) == 0
    assert alaw2linear(0xD5) in (0, 8)  # A-law decodes mid-riser: +8
