"""EXIF metadata codec (TIFF 6.0 IFDs inside a JPEG APP1) — pure stdlib.

Written from the public specs: EXIF 2.32 / JEITA CP-3451 (APP1 layout,
``Exif\\0\\0`` preamble, IFD0 + Exif/GPS sub-IFD pointer tags) and the
TIFF 6.0 IFD structure the operators/tiff ingest already decodes pixels
from (entry layout, inline-vs-offset values, both byte orders).

Why this exists: crawled camera imagery carries EXIF, and a training-data
pipeline needs it twice — once as SIGNAL (orientation to bake in before
tiling, timestamps for dedup/provenance) and once as RISK (GPS tags are
location PII that must be scrubbed before a corpus ships; every public
crawl-processing pipeline strips it).  The scrubber here is the
multimodal twin of the text-side ``corpus_pii_redact``:

- ``build_exif_app1`` — serialize an APP1 from fields (both byte orders),
  so staged corpora carry real EXIF, not a mock.
- ``parse_exif`` — generic IFD walk: every entry's raw value is captured
  (inline or out-of-line), pointer tags (Exif 0x8769, GPS 0x8825) recurse.
- ``strip_gps`` — drop the GPS pointer subtree and RE-SERIALIZE the
  remaining entries with recomputed offsets; every non-GPS entry survives
  byte-for-byte in value.  Works on whole JPEGs (APP1 spliced in place);
  idempotent; a JPEG without EXIF passes through unchanged.

Entropy-coded pixel data is untouched by design — scrubbing must not
re-encode (generation loss) or disturb decode (the query proves pixel
hashes are unchanged).
"""

from __future__ import annotations

import struct

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_STRIP_OFFSETS = 0x0111
TAG_DATETIME = 0x0132
TAG_THUMB_OFFSET = 0x0201  # JPEGInterchangeFormat: abs offset to thumbnail
TAG_THUMB_LENGTH = 0x0202  # JPEGInterchangeFormatLength
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_MAKERNOTE = 0x927C
TAG_INTEROP_IFD = 0xA005
_POINTER_TAGS = (TAG_EXIF_IFD, TAG_GPS_IFD, TAG_INTEROP_IFD)
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004


class Entry:
    """One IFD entry: raw value bytes (already in file byte order), a
    parsed sub-IFD for pointer tags, or an out-of-band blob (thumbnail
    bytes for ``TAG_THUMB_OFFSET`` — the value is an absolute offset that
    must be recomputed on re-serialization, so the pointed-at bytes are
    captured here)."""

    __slots__ = ("tag", "type", "count", "value", "sub", "blob")

    def __init__(self, tag, type_, count, value, sub=None, blob=None):
        self.tag, self.type, self.count, self.value, self.sub, self.blob = (
            tag, type_, count, value, sub, blob,
        )


def _parse_ifd(data: bytes, off: int, e: str, _seen=None) -> tuple[list, int]:
    """Parse one IFD; returns ``(entries, next_ifd_offset)``.  ``_seen``
    threads visited sub-IFD offsets through the pointer-tag recursion so a
    hostile Exif/GPS/Interop pointer that references its own (or an
    ancestor's) IFD offset raises ``ValueError`` instead of
    ``RecursionError``, mirroring the next-IFD chain-cycle guard."""
    if _seen is None:
        _seen = set()
    if off in _seen:
        raise ValueError("exif: sub-IFD pointer cycle")
    _seen.add(off)
    if off + 2 > len(data):
        raise ValueError("exif: IFD runs past end")
    (n,) = struct.unpack_from(f"{e}H", data, off)
    if off + 2 + 12 * n + 4 > len(data):
        raise ValueError("exif: IFD entries run past end")
    entries = []
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", data, base)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = data[base + 8 : base + 8 + size]
        else:
            (voff,) = struct.unpack_from(f"{e}I", data, base + 8)
            if voff + size > len(data):
                raise ValueError("exif: value offset runs past end")
            raw = data[voff : voff + size]
        sub = None
        if tag in _POINTER_TAGS:
            (ptr,) = struct.unpack(f"{e}I", raw)
            sub, _ = _parse_ifd(data, ptr, e, _seen)
        entries.append(Entry(tag, typ, cnt, raw, sub))
    (next_off,) = struct.unpack_from(f"{e}I", data, off + 2 + 12 * n)
    # JPEG thumbnail: 0x0201 is an absolute offset to compressed bytes
    # outside any IFD value region; capture them so re-serialization can
    # relocate (0x0202 carries the length).
    by_tag = {en.tag: en for en in entries}
    t_off, t_len = by_tag.get(TAG_THUMB_OFFSET), by_tag.get(TAG_THUMB_LENGTH)
    if t_off is not None and t_len is not None:
        start = struct.unpack(f"{e}I", t_off.value)[0]
        length = struct.unpack(f"{e}I", t_len.value)[0]
        if start + length > len(data):
            raise ValueError("exif: thumbnail runs past end")
        t_off.blob = data[start : start + length]
    return entries, next_off


def parse_exif(app1_or_jpeg: bytes) -> tuple[str, list]:
    """Parse EXIF from an APP1 payload or a whole JPEG.  Returns
    ``(byte_order, ifd0_entries)`` with byte_order 'II' or 'MM'.  Raises
    ``ValueError`` when no EXIF APP1 is present."""
    order, ifds = parse_exif_chain(app1_or_jpeg)
    return order, ifds[0]


def parse_exif_chain(app1_or_jpeg: bytes) -> tuple[str, list]:
    """Like ``parse_exif`` but follows the next-IFD chain: returns
    ``(byte_order, [ifd0_entries, ifd1_entries, ...])`` so the IFD1
    thumbnail directory real cameras write is preserved, not dropped."""
    tiff = _find_tiff(app1_or_jpeg)
    if tiff is None:
        raise ValueError("exif: no EXIF APP1 segment")
    order = tiff[:2].decode("latin-1")
    e = "<" if order == "II" else ">"
    magic, off = struct.unpack_from(f"{e}HI", tiff, 2)
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    ifds, seen = [], set()
    while off:
        if off in seen:
            raise ValueError("exif: IFD chain cycle")
        seen.add(off)
        entries, off = _parse_ifd(tiff, off, e)
        ifds.append(entries)
    return order, ifds


def _find_tiff(buf: bytes) -> bytes | None:
    if buf[:2] == b"\xFF\xD8":  # whole JPEG: walk markers to APP1/Exif
        seg = _find_app1(buf)
        if seg is None:
            return None
        s0, s1 = seg
        return buf[s0 + 10 : s1]
    if buf[:2] == b"\xFF\xE1" or buf[:6] == b"Exif\x00\x00":
        # bare APP1 (with or without the marker/length prefix)
        i = buf.find(b"Exif\x00\x00")
        return buf[i + 6 :]
    if buf[:2] in (b"II", b"MM"):
        return buf
    return None


def _find_app1(jpeg: bytes):
    """Return (segment_start, segment_end) of the EXIF APP1, or None.
    Walks markers from SOI; stops at SOS (EXIF must precede scan data)."""
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("exif: bad JPEG marker stream")
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS
            return None
        (ln,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return pos, pos + 2 + ln
        pos += 2 + ln
    return None


def _ser_ifd(entries: list, e: str, at: int, next_off: int = 0) -> bytes:
    """Serialize one IFD at absolute TIFF offset ``at`` (entries first,
    out-of-line values, sub-IFDs, and thumbnail blobs appended after).
    ``next_off`` is the absolute offset of the following IFD in the
    chain, or 0.  Block length is independent of ``at``/``next_off``, so
    a chain can be laid out with a sizing pass first."""
    head_len = 2 + 12 * len(entries) + 4
    tail = bytearray()
    out = bytearray(struct.pack(f"{e}H", len(entries)))
    for en in sorted(entries, key=lambda x: x.tag):  # TIFF mandates order
        typ, cnt = en.type, en.count
        if en.sub is not None:
            sub_off = at + head_len + len(tail)
            sub_bytes = _ser_ifd(en.sub, e, sub_off)
            tail += sub_bytes
            raw = struct.pack(f"{e}I", sub_off)
            typ, cnt = 4, 1
        elif en.blob is not None:
            blob_off = at + head_len + len(tail)
            tail += en.blob
            if len(tail) % 2:
                tail += b"\x00"
            raw = struct.pack(f"{e}I", blob_off)
        else:
            raw = en.value
        out += struct.pack(f"{e}HHI", en.tag, typ, cnt)
        if len(raw) <= 4:
            out += raw + b"\x00" * (4 - len(raw))
        else:
            voff = at + head_len + len(tail)
            tail += raw
            if len(tail) % 2:  # keep offsets word-aligned
                tail += b"\x00"
            out += struct.pack(f"{e}I", voff)
    out += struct.pack(f"{e}I", next_off)
    return bytes(out) + bytes(tail)


def _ser_ifd_chain(ifds: list, e: str, at: int) -> bytes:
    """Serialize an IFD chain (IFD0 → IFD1 → …) with correct next-IFD
    links.  Sizing pass first (block length is offset-independent), then
    the real pass with each block's successor offset."""
    offs, cur = [], at
    for entries in ifds:
        offs.append(cur)
        cur += len(_ser_ifd(entries, e, cur))
    out = b""
    for i, entries in enumerate(ifds):
        nxt = offs[i + 1] if i + 1 < len(ifds) else 0
        out += _ser_ifd(entries, e, offs[i], nxt)
    return out


def serialize_exif_app1(order: str, entries_or_chain: list) -> bytes:
    """Build the full APP1 segment (marker + length + Exif preamble +
    TIFF) from parsed entries.  Accepts either IFD0's entry list or a
    full chain ``[ifd0_entries, ifd1_entries, ...]`` (as returned by
    ``parse_exif_chain``) — the next-IFD links are recomputed."""
    e = "<" if order == "II" else ">"
    chain = entries_or_chain
    if not chain or isinstance(chain[0], Entry):
        chain = [chain]
    tiff = (
        order.encode()
        + struct.pack(f"{e}HI", 42, 8)
        + _ser_ifd_chain(chain, e, 8)
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + struct.pack(">H", 2 + len(body)) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ValueError("exif: not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def _walk_entries(ifds):
    stack = [en for entries in ifds for en in entries]
    while stack:
        en = stack.pop()
        yield en
        if en.sub is not None:
            stack.extend(en.sub)


def strip_gps(jpeg: bytes) -> bytes:
    """Remove the GPS sub-IFD (location PII) from a JPEG's EXIF, keeping
    every other entry's value intact and the entropy-coded image data
    byte-identical.  The full next-IFD chain (IFD1 thumbnail directory)
    and all known pointer sub-IFDs (Exif 0x8769, Interop 0xA005) are
    re-serialized with recomputed offsets; the IFD1 JPEG thumbnail bytes
    (0x0201/0x0202) are relocated with them.  A JPEG without EXIF or
    without GPS returns unchanged content (idempotent).

    Entries whose values embed vendor-internal absolute offsets that
    cannot be relocated (MakerNote 0x927C, StripOffsets 0x0111) raise
    ``ValueError`` instead of silently corrupting — a quarantined record
    beats a scrambled one."""
    seg = _find_app1(jpeg)
    if seg is None:
        return jpeg
    order, ifds = parse_exif_chain(jpeg)

    dropped = 0

    def _drop_gps(entries: list) -> list:
        # recursive: a GPS pointer nested inside a sub-IFD (nonstandard,
        # but hostile files exist) must not survive either
        nonlocal dropped
        out = []
        for en in entries:
            if en.tag == TAG_GPS_IFD:
                dropped += 1
                continue
            if en.sub is not None:
                en = Entry(en.tag, en.type, en.count, en.value,
                           _drop_gps(en.sub), en.blob)
            out.append(en)
        return out

    kept = [_drop_gps(entries) for entries in ifds]
    if dropped == 0:
        return jpeg
    for en in _walk_entries(kept):
        if en.tag == TAG_MAKERNOTE:
            raise ValueError(
                "exif: MakerNote carries vendor-internal offsets that "
                "cannot be relocated; refusing to re-serialize"
            )
        if en.tag == TAG_STRIP_OFFSETS:
            raise ValueError(
                "exif: StripOffsets thumbnail cannot be relocated; "
                "refusing to re-serialize"
            )
    s0, s1 = seg
    return jpeg[:s0] + serialize_exif_app1(order, kept) + jpeg[s1:]


# ------------------------------------------------------------- builders


def _ascii(tag: int, s: str) -> Entry:
    raw = s.encode("ascii") + b"\x00"
    return Entry(tag, 2, len(raw), raw)


def _short(tag: int, v: int, e: str) -> Entry:
    return Entry(tag, 3, 1, struct.pack(f"{e}H", v))


def _rationals(tag: int, vals: list, e: str) -> Entry:
    raw = b"".join(struct.pack(f"{e}II", num, den) for num, den in vals)
    return Entry(tag, 5, len(vals), raw)


def build_exif_app1(
    order: str,
    make: str,
    orientation: int,
    datetime_str: str,
    lat_ref: str,
    lat_dms: tuple,
    lon_ref: str,
    lon_dms: tuple,
) -> bytes:
    """Assemble a real EXIF APP1: IFD0 (Make, Orientation, DateTime) plus
    a GPS sub-IFD (refs + degree/minute/second rationals; seconds carry
    den=100 so centisecond precision is exact integer math)."""
    e = "<" if order == "II" else ">"
    gps = [
        _ascii(GPS_LAT_REF, lat_ref),
        _rationals(
            GPS_LAT, [(lat_dms[0], 1), (lat_dms[1], 1), (lat_dms[2], 100)], e
        ),
        _ascii(GPS_LON_REF, lon_ref),
        _rationals(
            GPS_LON, [(lon_dms[0], 1), (lon_dms[1], 1), (lon_dms[2], 100)], e
        ),
    ]
    ifd0 = [
        _ascii(TAG_MAKE, make),
        _short(TAG_ORIENTATION, orientation, e),
        _ascii(TAG_DATETIME, datetime_str),
        Entry(TAG_GPS_IFD, 4, 1, b"\x00\x00\x00\x00", gps),
    ]
    return serialize_exif_app1(order, ifd0)


# --------------------------------------------------------------- readers


def read_fields(jpeg: bytes) -> dict:
    """Decode the fields the pipeline filters on into plain Python values.
    GPS seconds come back as centiseconds (den=100 exact)."""
    order, entries = parse_exif(jpeg)
    e = "<" if order == "II" else ">"
    out = {"byte_order": order, "has_gps": 0}

    def ascii_of(en):
        return en.value.rstrip(b"\x00").decode("ascii")

    for en in entries:
        if en.tag == TAG_MAKE:
            out["make"] = ascii_of(en)
        elif en.tag == TAG_ORIENTATION:
            out["orientation"] = struct.unpack(f"{e}H", en.value)[0]
        elif en.tag == TAG_DATETIME:
            out["datetime"] = ascii_of(en)
        elif en.tag == TAG_GPS_IFD:
            out["has_gps"] = 1
            for g in en.sub:
                if g.tag == GPS_LAT_REF:
                    out["lat_ref"] = ascii_of(g)
                elif g.tag == GPS_LON_REF:
                    out["lon_ref"] = ascii_of(g)
                elif g.tag in (GPS_LAT, GPS_LON):
                    vals = [
                        struct.unpack_from(f"{e}II", g.value, 8 * i)
                        for i in range(g.count)
                    ]
                    deg, mins, (sn, sd) = vals
                    key = "lat" if g.tag == GPS_LAT else "lon"
                    out[f"{key}_deg"] = deg[0] // deg[1]
                    out[f"{key}_min"] = mins[0] // mins[1]
                    out[f"{key}_sec_cs"] = sn * 100 // sd
    return out
