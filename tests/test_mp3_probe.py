"""MP3 frame-walk probe tests — operators/mp3.py.

The framer/probe pair is written from the public ISO/IEC 11172-3 framing
layout; evidence is structural round-trips across the surface (versions,
rates, padding, channel modes, tags) plus loud-failure coverage for every
damage class a crawl actually produces (torn frames, broken sync,
free-format/reserved indices, truncated tags).
"""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_old_spark.operators.mp3 import build_mp3, probe_mp3


def test_cbr_mpeg1_mono_with_id3v2():
    b = build_mp3([(3, 128, 44100, 0, True)] * 8, id3v2_bytes=57, seed="a")
    p = probe_mp3(b)
    assert p == {
        "n_frames": 8, "rate": 44100, "version": 1, "mono": 1,
        "duration_ms": 8 * 1152 * 1000 // 44100, "bitrate_kbps_sum": 1024,
        "is_vbr": 0, "xing_frames": -1, "has_id3v2": 1, "has_id3v1": 0,
    }


def test_cbr_stereo_padding_and_id3v1():
    b = build_mp3(
        [(3, 192, 48000, i % 2, False) for i in range(10)], id3v1=True, seed="b"
    )
    p = probe_mp3(b)
    assert (p["n_frames"], p["mono"], p["has_id3v1"], p["is_vbr"]) == (10, 0, 1, 0)
    assert p["duration_ms"] == 240


def test_vbr_mpeg2_xing():
    spec = [(2, (64, 96, 128, 160)[i % 4], 22050, 0, True) for i in range(12)]
    b = build_mp3(spec, xing_frames=12, seed="c")
    p = probe_mp3(b)
    assert (p["version"], p["is_vbr"], p["xing_frames"], p["n_frames"]) == (2, 1, 12, 12)
    assert p["duration_ms"] == 12 * 576 * 1000 // 22050


def test_info_tag_declares_cbr():
    # same header shape, tag spelled "Info": frame count still read,
    # stream stays CBR
    b = bytearray(build_mp3([(3, 128, 44100, 0, True)] * 5, xing_frames=5, seed="d"))
    i = b.find(b"Xing")
    b[i : i + 4] = b"Info"
    p = probe_mp3(bytes(b))
    assert (p["is_vbr"], p["xing_frames"], p["n_frames"]) == (0, 5, 5)


def test_mpeg25_rates_probe():
    b = build_mp3([(0, 64, 11025, 0, True)] * 4, seed="e")
    p = probe_mp3(b)
    assert (p["rate"], p["version"], p["duration_ms"]) == (
        11025, 2, 4 * 576 * 1000 // 11025,
    )


def test_torn_final_frame_is_loud():
    b = build_mp3([(3, 128, 44100, 0, True)] * 3, seed="f")
    with pytest.raises(ValueError, match="runs past end"):
        probe_mp3(b[:-9])


def test_broken_sync_is_loud():
    b = bytearray(build_mp3([(3, 128, 44100, 0, True)] * 3, seed="g"))
    flen = 144 * 128 * 1000 // 44100
    b[flen] = 0x00  # corrupt frame 1's sync byte
    with pytest.raises(ValueError, match="broken frame sync"):
        probe_mp3(bytes(b))


def test_free_format_and_reserved_are_loud():
    hdr = bytearray(build_mp3([(3, 128, 44100, 0, True)], seed="h"))
    hdr[2] = (0 << 4) | (0 << 2)  # bitrate index 0 = free format
    with pytest.raises(ValueError, match="free-format or reserved"):
        probe_mp3(bytes(hdr))
    hdr = bytearray(build_mp3([(3, 128, 44100, 0, True)], seed="h"))
    hdr[2] = (hdr[2] & 0xF0) | (3 << 2)  # samplerate index 3 = reserved
    with pytest.raises(ValueError, match="free-format or reserved"):
        probe_mp3(bytes(hdr))


def test_samplerate_change_midstream_is_loud():
    a = build_mp3([(3, 128, 44100, 0, True)] * 2, seed="i")
    c = build_mp3([(3, 128, 32000, 0, True)], seed="i")
    with pytest.raises(ValueError, match="change mid-stream"):
        probe_mp3(a + c)


def test_id3v2_not_syncsafe_is_loud():
    b = bytearray(build_mp3([(3, 128, 44100, 0, True)], id3v2_bytes=5, seed="j"))
    b[9] |= 0x80
    with pytest.raises(ValueError, match="syncsafe"):
        probe_mp3(bytes(b))


def test_empty_stream_is_loud():
    with pytest.raises(ValueError, match="no audio frames"):
        probe_mp3(build_mp3([(3, 128, 44100, 0, True)], id3v1=True, seed="k")[:0]
                  + b"TAG" + b"\x00" * 125)


def test_xing_frame_count_field_layout():
    # the Xing payload sits exactly at the side-info offset; verify the
    # builder wrote flags=0x1 and the big-endian count where the spec of
    # record (public Xing layout) puts them
    b = build_mp3([(3, 128, 44100, 0, False)] * 2, xing_frames=2, seed="l")
    off = 4 + 32  # MPEG-1 stereo side info
    assert b[off : off + 4] == b"Xing"
    assert struct.unpack(">I", b[off + 4 : off + 8])[0] == 0x1
    assert struct.unpack(">I", b[off + 8 : off + 12])[0] == 2


# ------------------------------------------------------- ID3v2.4 frames

from etl_pipeline_old_spark.operators.mp3 import parse_id3v2  # noqa: E402


def test_id3v2_text_frames_roundtrip():
    tags = [("TIT2", "doc 7"), ("TPE1", "spk2"), ("TLAN", "rus — тест")]
    blob = build_mp3(
        [(3, 128, 44100, 0, True)] * 4, id3v2_bytes=300, id3v2_frames=tags
    )
    assert parse_id3v2(blob) == tags
    # the audio walk behind the tag is unchanged
    assert probe_mp3(blob)["n_frames"] == 4


def test_id3v2_all_text_encodings():
    import struct as _s

    def syncsafe(n):
        return bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )

    bodies = [
        (b"TIT2", b"\x00" + "abc".encode("latin-1")),
        (b"TALB", b"\x01" + "тест".encode("utf-16")),
        (b"TPE1", b"\x02" + "бвг".encode("utf-16-be")),
        (b"TLAN", b"\x03" + "мир".encode("utf-8")),
    ]
    tagbody = b"".join(
        fid + syncsafe(len(b)) + b"\x00\x00" + b for fid, b in bodies
    )
    raw = b"ID3" + bytes([4, 0, 0]) + syncsafe(len(tagbody)) + tagbody
    assert parse_id3v2(raw) == [
        ("TIT2", "abc"), ("TALB", "тест"), ("TPE1", "бвг"), ("TLAN", "мир"),
    ]


def test_id3v2_damage_is_loud():
    tags = [("TIT2", "x")]
    blob = build_mp3([(3, 128, 44100, 0, True)], id3v2_frames=tags)
    with pytest.raises(ValueError, match="no ID3v2 tag"):
        parse_id3v2(build_mp3([(3, 128, 44100, 0, True)]))
    bad = bytearray(blob)
    bad[6] |= 0x80  # non-syncsafe size byte
    with pytest.raises(ValueError, match="not syncsafe"):
        parse_id3v2(bytes(bad))
    bad = bytearray(blob)
    at = bad.index(b"TIT2") + 10
    bad[at] = 9  # unknown text encoding
    with pytest.raises(ValueError, match="unknown text encoding"):
        parse_id3v2(bytes(bad))
