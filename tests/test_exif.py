"""EXIF codec + GPS scrub tests — operators/exif.py.

Structure is the public EXIF 2.32 / TIFF 6.0 IFD layout; evidence is
round-trips in both byte orders, scrub invariants (GPS gone, everything
else byte-equal in value, pixels untouched through the real JPEG codec),
idempotency, and loud failure on structural damage.
"""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_old_spark.operators.exif import (
    TAG_EXIF_IFD,
    TAG_GPS_IFD,
    TAG_INTEROP_IFD,
    TAG_MAKERNOTE,
    TAG_THUMB_LENGTH,
    TAG_THUMB_OFFSET,
    Entry,
    build_exif_app1,
    insert_app1,
    parse_exif,
    parse_exif_chain,
    read_fields,
    serialize_exif_app1,
    strip_gps,
)
from etl_pipeline_old_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _tagged(order: str) -> bytes:
    app1 = build_exif_app1(
        order, "CamCo", 6, "2020:01:02 03:04:05",
        "N", (51, 30, 1234), "E", (0, 7, 89),
    )
    jpg = encode_jpeg(list(range(64)), 8, 8, quality=95)
    return insert_app1(jpg, app1)


@pytest.mark.parametrize("order", ["II", "MM"])
def test_build_parse_roundtrip(order):
    f = read_fields(_tagged(order))
    assert f["byte_order"] == order
    assert (f["make"], f["orientation"], f["has_gps"]) == ("CamCo", 6, 1)
    assert (f["lat_deg"], f["lat_min"], f["lat_sec_cs"]) == (51, 30, 1234)
    assert (f["lon_ref"], f["lon_deg"], f["lon_sec_cs"]) == ("E", 0, 89)


@pytest.mark.parametrize("order", ["II", "MM"])
def test_strip_gps_invariants(order):
    tagged = _tagged(order)
    clean = strip_gps(tagged)
    g = read_fields(clean)
    assert g["has_gps"] == 0
    assert (g["make"], g["orientation"], g["datetime"]) == (
        "CamCo", 6, "2020:01:02 03:04:05",
    )
    # pixel data byte-identical in effect: decodes to the same raster
    _, _, before = decode_jpeg(tagged)
    _, _, after = decode_jpeg(clean)
    assert (before == after).all()
    # idempotent, and a no-EXIF jpeg passes through unchanged
    assert strip_gps(clean) == clean
    bare = encode_jpeg(list(range(64)), 8, 8)
    assert strip_gps(bare) == bare


def test_scrubbed_entropy_bytes_identical():
    # stronger than raster equality: everything from SOS onward must be
    # the exact original bytes (scrubbing must never re-encode)
    tagged = _tagged("II")
    clean = strip_gps(tagged)
    sos_t = tagged.find(b"\xff\xda")
    sos_c = clean.find(b"\xff\xda")
    assert tagged[sos_t:] == clean[sos_c:]


def test_parse_accepts_bare_app1_and_tiff():
    app1 = build_exif_app1(
        "II", "X", 1, "2020:01:01 00:00:00", "N", (1, 2, 3), "E", (4, 5, 6)
    )
    order, entries = parse_exif(app1)
    assert order == "II" and any(e.tag == TAG_GPS_IFD for e in entries)
    # TIFF-only payload (after the Exif preamble)
    i = app1.find(b"Exif\x00\x00") + 6
    order2, entries2 = parse_exif(app1[i:])
    assert order2 == "II" and len(entries2) == len(entries)


def test_no_exif_raises_on_read():
    with pytest.raises(ValueError, match="no EXIF APP1"):
        read_fields(encode_jpeg(list(range(64)), 8, 8))


def test_bad_tiff_magic_is_loud():
    app1 = bytearray(_tagged("II"))
    i = app1.find(b"II") + 2
    struct.pack_into("<H", app1, i, 43)
    with pytest.raises(ValueError, match="bad TIFF magic"):
        read_fields(bytes(app1))


def test_out_of_line_offset_past_end_is_loud():
    app1 = build_exif_app1(
        "II", "LongMakerNameForOffset", 1, "2020:01:01 00:00:00",
        "N", (1, 2, 3), "E", (4, 5, 6),
    )
    with pytest.raises(ValueError, match="runs past end"):
        parse_exif(app1[: len(app1) - 30])


def _camera_like(order="II", makernote=False, gps=True):
    """Camera-realistic EXIF: IFD0 → Exif IFD → Interop IFD, optional GPS,
    plus an IFD1 thumbnail directory with relocatable JPEG bytes."""
    e = "<" if order == "II" else ">"
    app1 = build_exif_app1(
        order, "CamCo", 1, "2020:01:02 03:04:05",
        "N", (1, 2, 3), "E", (4, 5, 6),
    )
    _, ifd0 = parse_exif(app1)
    if not gps:
        ifd0 = [en for en in ifd0 if en.tag != TAG_GPS_IFD]
    interop = [Entry(0x0001, 2, 4, b"R98\x00")]
    exif_sub = [
        Entry(0x9000, 7, 4, b"0232"),  # ExifVersion
        Entry(TAG_INTEROP_IFD, 4, 1, b"\x00" * 4, interop),
    ]
    if makernote:
        exif_sub.append(Entry(TAG_MAKERNOTE, 7, 24, b"VENDOR" + b"\x07" * 18))
    ifd0.append(Entry(TAG_EXIF_IFD, 4, 1, b"\x00" * 4, exif_sub))
    thumb = b"\xff\xd8" + bytes(range(37)) + b"\xff\xd9"
    ifd1 = [
        Entry(TAG_THUMB_OFFSET, 4, 1, struct.pack(f"{e}I", 0), blob=thumb),
        Entry(TAG_THUMB_LENGTH, 4, 1, struct.pack(f"{e}I", len(thumb))),
    ]
    app1 = serialize_exif_app1(order, [ifd0, ifd1])
    jpg = encode_jpeg(list(range(64)), 8, 8, quality=95)
    return insert_app1(jpg, app1), thumb


def _interop_index(ifd0):
    exif_sub = next(en.sub for en in ifd0 if en.tag == TAG_EXIF_IFD)
    inter = next(en.sub for en in exif_sub if en.tag == TAG_INTEROP_IFD)
    return next(en.value for en in inter if en.tag == 0x0001)


@pytest.mark.parametrize("order", ["II", "MM"])
def test_ifd_chain_and_interop_roundtrip(order):
    jpg, thumb = _camera_like(order)
    _, ifds = parse_exif_chain(jpg)
    assert len(ifds) == 2
    assert _interop_index(ifds[0]) == b"R98\x00"
    t = next(en for en in ifds[1] if en.tag == TAG_THUMB_OFFSET)
    assert t.blob == thumb


@pytest.mark.parametrize("order", ["II", "MM"])
def test_strip_gps_preserves_interop_and_thumbnail_chain(order):
    jpg, thumb = _camera_like(order)
    clean = strip_gps(jpg)
    _, ifds = parse_exif_chain(clean)
    assert len(ifds) == 2, "IFD1 thumbnail directory must survive the scrub"
    assert not any(en.tag == TAG_GPS_IFD for en in ifds[0])
    assert _interop_index(ifds[0]) == b"R98\x00"
    t = next(en for en in ifds[1] if en.tag == TAG_THUMB_OFFSET)
    assert t.blob == thumb
    assert strip_gps(clean) == clean


def test_makernote_scrub_is_loud_not_corrupting():
    # vendor MakerNotes embed absolute offsets we cannot relocate: a scrub
    # that must re-serialize refuses loudly (quarantine beats corruption)
    jpg, _ = _camera_like("II", makernote=True)
    with pytest.raises(ValueError, match="MakerNote"):
        strip_gps(jpg)
    # ...but with no GPS there is nothing to scrub: unchanged passthrough
    jpg2, _ = _camera_like("II", makernote=True, gps=False)
    assert strip_gps(jpg2) == jpg2


def test_serialize_orders_tags():
    # TIFF 6.0 mandates ascending tag order; shuffle then re-serialize
    order, entries = parse_exif(_tagged("MM"))
    app1 = serialize_exif_app1(order, list(reversed(entries)))
    _, back = parse_exif(app1)
    tags = [e.tag for e in back]
    assert tags == sorted(tags)


def test_nested_gps_pointer_is_scrubbed_too():
    # nonstandard-but-hostile: a GPS sub-IFD nested INSIDE the Exif IFD
    # must not survive the scrub either
    gps = [_ascii_entry("N")]
    exif_sub = [
        Entry(0x9000, 7, 4, b"0232"),
        Entry(TAG_GPS_IFD, 4, 1, b"\x00" * 4, gps),
    ]
    ifd0 = [
        Entry(0x010F, 2, 6, b"CamCo\x00"),
        Entry(TAG_GPS_IFD, 4, 1, b"\x00" * 4, [_ascii_entry("E")]),
        Entry(TAG_EXIF_IFD, 4, 1, b"\x00" * 4, exif_sub),
    ]
    app1 = serialize_exif_app1("II", ifd0)
    jpg = insert_app1(encode_jpeg(list(range(64)), 8, 8), app1)
    clean = strip_gps(jpg)
    _, ifds = parse_exif_chain(clean)

    def walk(entries):
        for en in entries:
            yield en
            if en.sub is not None:
                yield from walk(en.sub)

    tags = [en.tag for ifd in ifds for en in walk(ifd)]
    assert TAG_GPS_IFD not in tags
    assert TAG_EXIF_IFD in tags  # the Exif sub-IFD itself survives


def _ascii_entry(s):
    raw = s.encode("ascii") + b"\x00"
    return Entry(0x0001, 2, len(raw), raw)


def test_sub_ifd_pointer_cycle_is_loud():
    # hostile EXIF: IFD0's Exif pointer references IFD0's own offset —
    # must raise ValueError, never RecursionError (r10 ADVICE)
    e = "<"
    tiff = b"II" + struct.pack(f"{e}HI", 42, 8)
    ifd = (
        struct.pack(f"{e}H", 1)
        + struct.pack(f"{e}HHI", TAG_EXIF_IFD, 4, 1)
        + struct.pack(f"{e}I", 8)  # pointer back to IFD0 at offset 8
        + struct.pack(f"{e}I", 0)
    )
    app1 = b"Exif\x00\x00" + tiff + ifd
    with pytest.raises(ValueError, match="sub-IFD pointer cycle"):
        parse_exif(app1)


def test_sub_ifd_mutual_cycle_is_loud():
    # two sub-IFDs pointing at each other (Exif -> A, A's Interop -> A)
    e = "<"
    tiff = b"II" + struct.pack(f"{e}HI", 42, 8)
    # IFD0 at 8: one entry pointing to sub-IFD at 26
    ifd0 = (
        struct.pack(f"{e}H", 1)
        + struct.pack(f"{e}HHI", TAG_EXIF_IFD, 4, 1)
        + struct.pack(f"{e}I", 26)
        + struct.pack(f"{e}I", 0)
    )
    # sub-IFD at 26: one entry whose Interop pointer loops back to 26
    sub = (
        struct.pack(f"{e}H", 1)
        + struct.pack(f"{e}HHI", TAG_INTEROP_IFD, 4, 1)
        + struct.pack(f"{e}I", 26)
        + struct.pack(f"{e}I", 0)
    )
    app1 = b"Exif\x00\x00" + tiff + ifd0 + sub
    with pytest.raises(ValueError, match="sub-IFD pointer cycle"):
        parse_exif(app1)
