"""Baseline TIFF codec — pure stdlib (public spec: TIFF 6.0, Adobe 1992).

Decodes the first IFD of a little- ("II") or big-endian ("MM") TIFF:
tag walk (width/length/bits/compression/photometric/strips/colormap),
strip concatenation, uncompressed or PackBits-compressed data, 8-bit
grayscale (BlackIsZero and WhiteIsZero), RGB, and palette-color images.
The encoder emits real, viewer-openable gray or RGB TIFFs in either
byte order, optionally PackBits-compressed, multi-strip.

LZW/JPEG-in-TIFF, tiled layout, and sub-byte depths raise ValueError —
the seam where libtiff plugs in on a real cluster.  Cross-validated
against the JVM's independent javax.imageio TIFF reader in
tests/test_tiff_codec.py.
"""

from __future__ import annotations

import struct

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_COLORMAP = 320

# field type -> (struct code, byte size)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE: runs of >=3 identical bytes become (257-n,
    byte); literals are copied with a (n-1) header, max 128 either way."""
    out = bytearray()
    i = 0
    while i < len(data):
        # find run length at i
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal: up to the next >=3 run or 128 bytes
        j = i
        while j < len(data) and j - i < 127:
            if (
                j + 2 < len(data)
                and data[j] == data[j + 1] == data[j + 2]
            ):
                break
            j += 1
        out.append(j - i - 1 if j > i else 0)
        out += data[i : max(j, i + 1)]
        i = max(j, i + 1)
    return bytes(out)


def packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_expected:
        if i >= len(data):
            raise ValueError("PackBits stream truncated")
        n = data[i]
        i += 1
        if n < 128:  # n+1 literal bytes
            lit = data[i : i + n + 1]
            if len(lit) != n + 1:
                raise ValueError("PackBits literal truncated")
            out += lit
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("PackBits run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per the spec
    return bytes(out[:n_expected])


def encode_tiff(
    gray: list[int],
    width: int,
    height: int,
    rgb: bool = False,
    packbits: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Real TIFF bytes for a grayscale pixel list: 8-bit BlackIsZero gray
    or (g,g,g) RGB, raster split into strips of ``rows_per_strip`` rows
    (default: one strip), each optionally PackBits-compressed."""
    if len(gray) != width * height:
        raise ValueError(f"{len(gray)} pixels for {width}x{height}")
    e = ">" if big_endian else "<"
    spp = 3 if rgb else 1
    rps = rows_per_strip or height
    strips: list[bytes] = []
    for y0 in range(0, height, rps):
        rows = gray[y0 * width : min(y0 + rps, height) * width]
        raw = (
            bytes(v for g in rows for v in (g, g, g)) if rgb else bytes(rows)
        )
        strips.append(packbits_encode(raw) if packbits else raw)

    def entry(tag: int, ftype: int, values: list[int]) -> tuple[bytes, list[int]]:
        code, size = _TYPES[ftype]
        packed = b"".join(struct.pack(e + code, v) for v in values)
        if len(packed) <= 4:
            return (
                struct.pack(e + "HHI", tag, ftype, len(values))
                + packed
                + b"\x00" * (4 - len(packed)),
                [],
            )
        return struct.pack(e + "HHI", tag, ftype, len(values)), list(values)

    # layout: header(8) + IFD + out-of-line arrays + strip data
    tags: list[tuple[int, int, list[int]]] = [
        (_TAG_WIDTH, 3, [width]),
        (_TAG_LENGTH, 3, [height]),
        (_TAG_BITS, 3, [8] * spp),
        (_TAG_COMPRESSION, 3, [32773 if packbits else 1]),
        (_TAG_PHOTOMETRIC, 3, [2 if rgb else 1]),
        (_TAG_STRIP_OFFSETS, 4, [0] * len(strips)),  # patched below
        (_TAG_SPP, 3, [spp]),
        (_TAG_ROWS_PER_STRIP, 3, [rps]),
        (_TAG_STRIP_COUNTS, 4, [len(s) for s in strips]),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    # first pass: compute out-of-line array space
    extra_off = ifd_off + ifd_size
    extra_total = 0
    for _tag, ftype, values in tags:
        _code, size = _TYPES[ftype]
        if size * len(values) > 4:
            extra_total += size * len(values)
    data_off = extra_off + extra_total
    # patch strip offsets now that the data origin is known
    offs = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    tags[5] = (_TAG_STRIP_OFFSETS, 4, offs)

    ifd = struct.pack(e + "H", len(tags))
    extra = bytearray()
    for tag, ftype, values in tags:
        code, size = _TYPES[ftype]
        if size * len(values) <= 4:
            head, _ = entry(tag, ftype, values)
            ifd += head
        else:
            ifd += struct.pack(
                e + "HHI", tag, ftype, len(values)
            ) + struct.pack(e + "I", extra_off + len(extra))
            extra += b"".join(struct.pack(e + code, v) for v in values)
    ifd += struct.pack(e + "I", 0)  # no next IFD
    header = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, ifd_off)
    return header + ifd + bytes(extra) + b"".join(strips)


def decode_tiff(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode the first IFD to (width, height, gray pixels): RGB reduces
    by integer mean, palette images through the 16-bit ColorMap (high
    byte), WhiteIsZero inverts."""
    if payload[:4] == b"II\x2a\x00":
        e = "<"
    elif payload[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF signature")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of range")
    (n,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    fields: dict[int, list[int]] = {}
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(payload):
            raise ValueError("TIFF IFD truncated")
        tag, ftype, count = struct.unpack(e + "HHI", payload[off : off + 8])
        if ftype not in _TYPES:
            continue  # RATIONAL etc.: not needed for raster decode
        code, size = _TYPES[ftype]
        total = size * count
        src = off + 8 if total <= 4 else struct.unpack(
            e + "I", payload[off + 8 : off + 12]
        )[0]
        raw = payload[src : src + total]
        if len(raw) != total:
            raise ValueError(f"TIFF tag {tag} value truncated")
        fields[tag] = list(struct.unpack(e + str(count) + code, raw))
    try:
        width = fields[_TAG_WIDTH][0]
        height = fields[_TAG_LENGTH][0]
        offsets = fields[_TAG_STRIP_OFFSETS]
        counts = fields[_TAG_STRIP_COUNTS]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from None
    comp = fields.get(_TAG_COMPRESSION, [1])[0]
    photo = fields.get(_TAG_PHOTOMETRIC, [1])[0]
    spp = fields.get(_TAG_SPP, [1])[0]
    bits = fields.get(_TAG_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bits per sample {bits}")
    if comp not in (1, 32773):
        raise ValueError(
            f"TIFF compression {comp} needs libtiff (only none/PackBits "
            "decode natively)"
        )
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    rps = fields.get(_TAG_ROWS_PER_STRIP, [height])[0]
    raster = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError(f"TIFF strip {si} truncated")
        n_rows = min(rps, height - si * rps)
        if comp == 32773:
            strip = packbits_decode(strip, n_rows * width * spp)
        raster += strip
    if len(raster) < width * height * spp:
        raise ValueError(
            f"TIFF raster short: {len(raster)} < {width * height * spp}"
        )
    if photo == 3:
        cmap = fields.get(_TAG_COLORMAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette TIFF missing a 3x256 ColorMap")
        # ColorMap holds 16-bit values, all reds then greens then blues
        pal_gray = [
            (cmap[v] + cmap[256 + v] + cmap[512 + v]) // (3 * 257)
            for v in range(256)
        ]
        gray = [pal_gray[raster[k]] for k in range(width * height)]
    elif spp == 1:
        gray = list(raster[: width * height])
        if photo == 0:  # WhiteIsZero
            gray = [255 - g for g in gray]
    else:
        gray = [
            (raster[k * spp] + raster[k * spp + 1] + raster[k * spp + 2]) // 3
            for k in range(width * height)
        ]
    return width, height, gray
