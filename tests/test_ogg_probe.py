"""Ogg container codec tests — operators/ogg.py.

Written from RFC 3533 (+ RFC 7845 OpusHead / Vorbis I ID header).
Evidence: round-trips across the packet/lacing surface, the spec's OWN
CRC-32 verified against its published check behavior (unreflected
0x04c11db7 — distinct from zlib's), and loud failure for every damage
class: body corruption (CRC), truncation, orphan continuation, missing
EOS, trailing garbage.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from etl_pipeline_old_spark.operators.ogg import _crc, build_ogg, probe_ogg


def _pk(n: int, size: int = 40) -> list:
    return [bytes([(i * 7 + j) % 251 for j in range(size + i)]) for i in range(n)]


def test_opus_stream_roundtrip():
    p = probe_ogg(build_ogg("opus", 2, 48000, _pk(5)))
    assert (p["codec"], p["channels"], p["rate"], p["pre_skip"]) == (
        "opus", 2, 48000, 312,
    )
    assert (p["n_packets"], p["n_pages"], p["duration_granules"]) == (5, 6, 4800)


def test_vorbis_stream_roundtrip():
    p = probe_ogg(build_ogg("vorbis", 1, 44100, _pk(3)))
    assert (p["codec"], p["channels"], p["rate"]) == ("vorbis", 1, 44100)
    assert p["n_packets"] == 3


def test_packet_spans_pages_via_continuation():
    big = bytes(range(256)) * 6  # 1536 bytes > 510 limit -> 4 pages
    p = probe_ogg(build_ogg("opus", 1, 48000, [big], page_body_limit=510))
    assert p["n_packets"] == 1
    assert p["n_pages"] == 1 + 4  # BOS + ceil(1536/510-ish 255-aligned)


def test_exact_255_multiple_packet_gets_zero_lace():
    pkt = bytes(255 * 2)
    p = probe_ogg(build_ogg("opus", 1, 48000, [pkt]))
    assert p["n_packets"] == 1


def test_crc_is_the_spec_polynomial_not_zlib():
    data = b"ogg crc probe"
    assert _crc(data) != zlib.crc32(data)
    # independent bitwise implementation (MSB-first, unreflected)
    r = 0
    for byte in data:
        r ^= byte << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
    assert _crc(data) == r


def test_body_corruption_fails_crc_loudly():
    buf = bytearray(build_ogg("opus", 1, 48000, _pk(3)))
    buf[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        probe_ogg(bytes(buf))


def test_truncation_is_loud():
    buf = build_ogg("opus", 1, 48000, _pk(3))
    with pytest.raises(ValueError, match="truncated"):
        probe_ogg(buf[:-5])


def test_missing_eos_is_loud():
    buf = build_ogg("opus", 1, 48000, _pk(2))
    # drop the final page entirely: walk to find last page start
    pages = []
    pos = 0
    while pos < len(buf):
        nseg = buf[pos + 26]
        body = sum(buf[pos + 27 : pos + 27 + nseg])
        pages.append(pos)
        pos = pos + 27 + nseg + body
    with pytest.raises(ValueError, match="missing EOS"):
        probe_ogg(buf[: pages[-1]])


def test_orphan_continuation_is_loud():
    # build a spanning stream and cut out the first body page so the
    # continuation page arrives with nothing pending
    big = bytes(256) * 5
    buf = build_ogg("opus", 1, 48000, [big], page_body_limit=510)
    pos = 0
    pages = []
    while pos < len(buf):
        nseg = buf[pos + 26]
        body = sum(buf[pos + 27 : pos + 27 + nseg])
        pages.append((pos, pos + 27 + nseg + body))
        pos = pos + 27 + nseg + body
    s0, s1 = pages[1]  # first data page (starts the packet)
    cut = buf[:s0] + buf[s1:]
    # page sequence now jumps, but the orphan continuation is the first
    # structural violation the walk hits
    with pytest.raises(ValueError, match="continuation page without"):
        probe_ogg(cut)


def test_garbage_after_eos_is_loud():
    buf = build_ogg("opus", 1, 48000, _pk(1))
    with pytest.raises(ValueError, match="bad capture pattern|data after EOS"):
        probe_ogg(buf + b"JUNK")


def test_unknown_first_packet_reports_unknown_codec():
    # hand-build: BOS page with an unrecognized ID header
    from etl_pipeline_old_spark.operators.ogg import _page

    page0 = _page(9, 0, 0, [(b"FLACHEAD", True)], 0x02 | 0x04)
    p = probe_ogg(page0)
    assert p["codec"] == "unknown" and p["serial"] == 9


def test_granule_positions_reported():
    p = probe_ogg(
        build_ogg("opus", 1, 48000, _pk(3), granules=[100, 250, 7777])
    )
    assert p["duration_granules"] == 7777


# --------------------------------------------------- comment headers (tags)

from etl_pipeline_old_spark.operators.ogg import (  # noqa: E402
    build_comment_header,
    ogg_tags,
    parse_comment_header,
)


@pytest.mark.parametrize("codec", ["opus", "vorbis"])
def test_comment_header_roundtrip(codec):
    blob = build_ogg(
        codec, 2, 48000, [b"pkt" * 10, b"pkt2" * 10],
        comments=[("TITLE", "doc 5"), ("Language", "ru"), ("ARTIST", "spk2")],
        vendor="etl-spark",
    )
    assert probe_ogg(blob)["n_packets"] == 2  # comment header excluded
    vendor, tags = ogg_tags(blob)
    assert vendor == "etl-spark"
    # keys normalize to upper (case-insensitive per spec)
    assert tags == [("TITLE", "doc 5"), ("LANGUAGE", "ru"), ("ARTIST", "spk2")]


def test_missing_comment_header_is_loud():
    blob = build_ogg("opus", 1, 48000, [b"x"])
    with pytest.raises(ValueError, match="no comment header"):
        ogg_tags(blob)


def test_comment_damage_is_loud():
    hdr = build_comment_header("opus", "v", [("A", "b")])
    with pytest.raises(ValueError, match="truncated"):
        parse_comment_header(hdr[:-3])
    with pytest.raises(ValueError, match="not a comment header"):
        parse_comment_header(b"OpusHead" + hdr[8:])
    bad = build_comment_header("vorbis", "v", [("A", "b")])
    with pytest.raises(ValueError, match="framing bit"):
        parse_comment_header(bad[:-1] + b"\x00")
    with pytest.raises(ValueError, match="bad comment key"):
        build_comment_header("opus", "v", [("A=B", "x")])


def test_comment_without_equals_is_loud():
    import struct as _s

    hdr = bytearray(b"OpusTags")
    hdr += _s.pack("<I", 1) + b"v"
    hdr += _s.pack("<I", 1)
    hdr += _s.pack("<I", 3) + b"abc"  # no '='
    with pytest.raises(ValueError, match="without '='"):
        parse_comment_header(bytes(hdr))


def test_utf8_values_roundtrip():
    blob = build_ogg(
        "vorbis", 1, 44100, [b"d"],
        comments=[("TITLE", "Пример — название")],
    )
    _v, tags = ogg_tags(blob)
    assert tags == [("TITLE", "Пример — название")]
