"""EBML/WebM container probe tests — operators/ebml.py.

Written from RFC 8794 + the public Matroska element registry.  Evidence:
round-trips across the track/cluster surface, vint edge forms (multi-byte
IDs and sizes, the all-ones unknown-size Segment live muxers emit),
TimestampScale-corrected durations, and loud failure on truncation and
malformed vints.
"""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.operators.ebml import (
    build_webm,
    probe_webm,
    read_vint,
    walk_ebml,
)

_AV = [
    {"type": "video", "codec": "V_VP9", "width": 1920, "height": 1080},
    {"type": "audio", "codec": "A_OPUS", "rate": 48000, "channels": 2},
]


@pytest.mark.parametrize("unknown", [False, True])
def test_av_roundtrip(unknown):
    p = probe_webm(
        build_webm("webm", _AV, [3, 2, 4], 12345.0, unknown_segment_size=unknown)
    )
    assert (p["doc_type"], p["n_video"], p["n_audio"]) == ("webm", 1, 1)
    assert (p["video_codec"], p["width"], p["height"]) == ("V_VP9", 1920, 1080)
    assert (p["audio_codec"], p["rate"], p["channels"]) == ("A_OPUS", 48000, 2)
    assert (p["n_clusters"], p["n_blocks"], p["duration_ms"]) == (3, 9, 12345)


def test_timestamp_scale_corrects_duration():
    p = probe_webm(build_webm("matroska", _AV[:1], [1], 500.0, ts_scale=500_000))
    assert p["duration_ms"] == 250
    assert p["doc_type"] == "matroska"


def test_audio_only_stream():
    p = probe_webm(
        build_webm(
            "webm",
            [{"type": "audio", "codec": "A_VORBIS", "rate": 44100, "channels": 1}],
            [2],
            990.0,
        )
    )
    assert (p["n_video"], p["n_audio"], p["audio_codec"]) == (0, 1, "A_VORBIS")
    assert p["width"] == 0 and p["rate"] == 44100


def test_vint_forms():
    # 1-byte: 0x81 -> id 0x81 / size 1
    assert read_vint(b"\x81", 0, keep_marker=True) == (0x81, 1)
    assert read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    # 2-byte size: 0x40 0x7F -> 127
    assert read_vint(b"\x40\x7f", 0, keep_marker=False) == (127, 2)
    # 4-byte ID keeps its marker (Segment)
    assert read_vint(b"\x18\x53\x80\x67", 0, keep_marker=True) == (0x18538067, 4)
    # all-ones size = unknown
    assert read_vint(b"\xff", 0, keep_marker=False) == (-1, 1)
    assert read_vint(b"\x1f\xff\xff\xff", 0, keep_marker=False) == (-1, 4)


def test_zero_leading_byte_is_loud():
    with pytest.raises(ValueError, match="leading byte"):
        read_vint(b"\x00\x80", 0, keep_marker=True)


def test_truncated_vint_and_element_are_loud():
    with pytest.raises(ValueError, match="truncated vint"):
        read_vint(b"\x40", 0, keep_marker=False)
    buf = build_webm("webm", _AV, [1], 100.0)
    with pytest.raises(ValueError, match="runs past end"):
        probe_webm(buf[:-3])


def test_unknown_size_extends_to_enclosing_end():
    buf = build_webm("webm", _AV, [2], 100.0, unknown_segment_size=True)
    tops = list(walk_ebml(buf, 0, len(buf)))
    # Segment is last and swallows the remainder
    assert tops[-1][2] == len(buf)


def test_missing_segment_is_loud():
    buf = build_webm("webm", _AV, [1], 100.0)
    # keep only the EBML header element
    (eid, b0, b1) = next(walk_ebml(buf, 0, len(buf)))
    with pytest.raises(ValueError, match="missing EBML header or Segment"):
        probe_webm(buf[:b1])
