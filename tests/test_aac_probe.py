"""AAC parameter probing — operators/aac.py (ISO 14496-3 structure).

ADTS frame-walk round-trips, AudioSpecificConfig bit forms (escape
rate), esds descriptor-chain parsing incl. variable-length sizes, the
MP4 mp4a sample-entry wiring, and loud failure for the damage classes
plus the documented decode seam.
"""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_old_spark.operators.aac import (
    SAMPLE_RATES,
    decode_aac,
    parse_asc,
    parse_esds,
    probe_adts,
    write_adts,
    write_asc,
    write_esds,
)

_PAYLOADS = [bytes([i % 256] * (50 + i)) for i in range(12)]


@pytest.mark.parametrize("crc", [False, True])
def test_adts_roundtrip(crc):
    blob = write_adts(_PAYLOADS, rate_index=4, channels=2, crc=crc)
    p = probe_adts(blob)
    assert p["profile"] == "LC"
    assert p["sample_rate"] == 44100
    assert p["channels"] == 2
    assert p["n_frames"] == len(_PAYLOADS)
    assert p["sum_payload_bytes"] == sum(len(x) for x in _PAYLOADS)
    assert p["crc_frames"] == (len(_PAYLOADS) if crc else 0)
    assert p["duration_ms"] == len(_PAYLOADS) * 1024 * 1000 // 44100


def test_adts_all_table_rates():
    for idx, rate in enumerate(SAMPLE_RATES):
        blob = write_adts([b"x" * 20], rate_index=idx, channels=1)
        assert probe_adts(blob)["sample_rate"] == rate


def test_adts_damage_is_loud():
    blob = bytearray(write_adts(_PAYLOADS, rate_index=4, channels=2))
    with pytest.raises(ValueError, match="broken ADTS sync"):
        probe_adts(bytes(blob[1:]))
    with pytest.raises(ValueError, match="runs past end"):
        probe_adts(bytes(blob[:-10]))
    with pytest.raises(ValueError, match="shorter than one"):
        probe_adts(b"\xff\xf1\x00")
    # reserved frequency index
    bad = bytearray(blob)
    bad[2] = (bad[2] & 0xC3) | (13 << 2)
    with pytest.raises(ValueError, match="reserved frequency index"):
        probe_adts(bytes(bad))


def test_adts_midstream_parameter_change_is_loud():
    a = write_adts([b"x" * 30], rate_index=4, channels=2)
    b = write_adts([b"y" * 30], rate_index=3, channels=2)
    with pytest.raises(ValueError, match="mid-stream parameter change"):
        probe_adts(a + b)


def test_asc_roundtrip_and_960():
    assert parse_asc(write_asc(2, 4, 2)) == {
        "aot": 2, "sample_rate": 44100, "channels": 2, "frame_length": 1024,
    }
    assert parse_asc(write_asc(2, 11, 1, frame_960=True))["frame_length"] == 960


def test_asc_explicit_rate_escape():
    # aot=2, fidx=15 (escape), 24-bit explicit rate, channels=1
    v = 2
    for val, n in ((15, 4), (12345, 24), (1, 4), (0, 3)):
        v = (v << n) | val
    total = 5 + 4 + 24 + 4 + 3
    v <<= (8 - total % 8) % 8
    raw = v.to_bytes((total + 7) // 8, "big")
    got = parse_asc(raw)
    assert got["sample_rate"] == 12345 and got["channels"] == 1


def test_asc_truncated_is_loud():
    with pytest.raises(ValueError, match="truncated"):
        parse_asc(b"\x12")


def test_esds_roundtrip():
    got = parse_esds(write_esds(write_asc(2, 4, 2), avg_bitrate=96000))
    assert got == {
        "aot": 2, "sample_rate": 44100, "channels": 2, "frame_length": 1024,
        "object_type": 0x40, "avg_bitrate": 96000,
    }


def test_esds_non_aac_oti_is_loud():
    body = bytearray(write_esds(write_asc(2, 4, 2)))
    at = body.index(0x40, 6)  # the OTI byte inside DecoderConfigDescriptor
    body[at] = 0x20  # MPEG-4 Visual
    with pytest.raises(ValueError, match="is not AAC"):
        parse_esds(bytes(body))


def test_esds_wrong_leading_tag_is_loud():
    with pytest.raises(ValueError, match="ES_Descriptor"):
        parse_esds(b"\x00\x00\x00\x00" + bytes([0x07, 1, 0]))


def test_mp4a_sample_entry_carries_esds_params():
    # hand-build an stsd whose mp4a entry carries an esds child, and run
    # it through the ISO BMFF demuxer's sample-entry parser
    from etl_pipeline_old_spark.operators.mp4 import (
        _box,
        _full,
        _parse_sample_entry,
    )

    esds = _full(b"esds", 0, 0, write_esds(write_asc(2, 3, 2))[4:])
    ase = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8
        + struct.pack(">HHHH", 2, 16, 0, 0)
        + struct.pack(">I", 48000 << 16)
    )
    stsd_body = struct.pack(">I", 1) + _box(b"mp4a", ase + esds)
    stsd = _full(b"stsd", 0, 0, stsd_body)
    entry = _parse_sample_entry(stsd, 8, len(stsd))
    assert entry.codec == "mp4a"
    assert entry.channels == 2 and entry.sample_rate == 48000
    assert entry.aac == {
        "aot": 2, "sample_rate": 48000, "channels": 2, "frame_length": 1024,
        "object_type": 0x40, "avg_bitrate": 64000,
    }


def test_decode_is_documented_seam():
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_aac([b"frame"])


def test_encode_mp4_aac_roundtrip_and_seam():
    from etl_pipeline_old_spark.operators.mp4 import (
        decode_mp4_pcm,
        encode_mp4_aac,
        extract_samples,
        parse_mp4,
    )

    payloads = [bytes([i]) * (30 + i) for i in range(8)]
    blob = encode_mp4_aac(payloads, rate_index=3, channels=2)
    mv = parse_mp4(blob)
    tr = mv.tracks[0]
    assert tr.entry.codec == "mp4a"
    assert tr.entry.aac == {
        "aot": 2, "sample_rate": 48000, "channels": 2, "frame_length": 1024,
        "object_type": 0x40, "avg_bitrate": 64000,
    }
    assert tr.sample_sizes == [len(p) for p in payloads]
    # access units extract byte-exactly; payload decode is the seam
    assert extract_samples(blob, mv, tr.track_id) == payloads
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_mp4_pcm(blob)
