""".7z container codec (7-Zip archive format, public 7zFormat.txt spec)
— the third compressed-container family beside the gzip-member WARC
walk and the xz block walk: crawl and mirror corpora carry .7z
constantly, and stdlib Python has no reader for it.

The container layer is implemented here from the spec: the 32-byte
signature header (magic, version, CRC32-guarded next-header triple),
the property-ID-driven header tree (PackInfo / UnpackInfo with
per-folder coder chains / FilesInfo with UTF-16LE names), 7z's
variable-length NUMBER coding, and folder CRCs.  Entropy coding stays
in stdlib ``lzma`` via FORMAT_RAW — the same split as operators/xz.py:
the stdlib does LZMA1/LZMA2, this module does the container.  Coders
supported: Copy (0x00), LZMA1 (0x030101, the 5-byte lclppb+dictsize
properties parsed per spec), LZMA2 (0x21).  Multi-coder folders (BCJ
chains), encrypted headers (kEncodedHeader) and archives with
bind-pairs stay documented NotImplementedError seams — loud, never
silently wrong.

The own writer stages one folder per file (the non-solid ``-ms=off``
shape), mixing all three coders; payload codecs are cross-validated by
construction (stdlib lzma decodes what stdlib lzma encoded — the
container framing around them is what this module proves, roundtripped
and damage-tested).  Damage raises ValueError: bad magic, any CRC
mismatch (signature-header, next-header, folder data), truncated pack
streams, headers lying about sizes.

Reference parity note: the reference pipeline (AtomicBim/etl-pipeline-old)
has no archive codecs at all — this module belongs to the repo's
beyond-reference LLM-corpus surface (SURVEY.md §6).
"""

from __future__ import annotations

import lzma
import struct
import zlib

MAGIC = b"7z\xbc\xaf\x27\x1c"

_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS_INFO = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZE = 0x0C
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_COPY = b"\x00"
_LZMA1 = b"\x03\x01\x01"
_LZMA2 = b"\x21"


def _write_number(n: int) -> bytes:
    """7z UINT64 (7zFormat.txt): the first byte's leading 1-bits say
    how many extra little-endian bytes follow; the bits below that
    prefix hold the value's TOP bits.  The shortest form is emitted."""
    if n < 0:
        raise ValueError("7z: negative number")
    extra = 0
    while extra < 8 and n >= (1 << (7 - extra)) << (8 * extra):
        extra += 1
    if extra == 8:
        return b"\xff" + n.to_bytes(8, "little")
    mask = (0xFF00 >> extra) & 0xFF
    first = mask | (n >> (8 * extra))
    return bytes([first]) + (n & ((1 << (8 * extra)) - 1)).to_bytes(
        extra, "little"
    )


def _read_number(buf: bytes, at: int) -> tuple[int, int]:
    if at >= len(buf):
        raise ValueError("7z: truncated number")
    first = buf[at]
    at += 1
    mask = 0x80
    for i in range(8):
        if first & mask == 0:
            if at + i > len(buf):
                raise ValueError("7z: truncated number")
            value = int.from_bytes(buf[at : at + i], "little") | (
                (first & (mask - 1)) << (8 * i)
            )
            return value, at + i
        mask >>= 1
    if at + 8 > len(buf):
        raise ValueError("7z: truncated number")
    return int.from_bytes(buf[at : at + 8], "little"), at + 8


def _lzma1_props(lc: int = 3, lp: int = 0, pb: int = 2,
                 dict_size: int = 1 << 23) -> bytes:
    return bytes([(pb * 5 + lp) * 9 + lc]) + struct.pack("<I", dict_size)


def _parse_lzma1_props(props: bytes) -> dict:
    if len(props) != 5:
        raise ValueError("7z: LZMA1 properties must be 5 bytes")
    d = props[0]
    if d >= 225:
        raise ValueError("7z: bad LZMA1 lclppb byte")
    lc = d % 9
    lp = (d // 9) % 5
    pb = d // 45
    return {
        "id": lzma.FILTER_LZMA1,
        "lc": lc,
        "lp": lp,
        "pb": pb,
        "dict_size": struct.unpack("<I", props[1:5])[0],
    }


def _lzma2_dict_prop(dict_size: int) -> int:
    if dict_size == 1 << 23:
        return 24
    raise ValueError("7z: writer uses the fixed 8 MiB dict only")


def _lzma2_prop_dict(prop: int) -> int:
    if prop > 40:
        raise ValueError(f"7z: bad LZMA2 dict-size property {prop}")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def _encode_payload(data: bytes, coder: bytes) -> tuple[bytes, bytes]:
    """(packed bytes, coder properties) for one single-coder folder."""
    if coder == _COPY:
        return data, b""
    if coder == _LZMA1:
        packed = lzma.compress(
            data,
            format=lzma.FORMAT_RAW,
            filters=[
                {"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
                 "dict_size": 1 << 23}
            ],
        )
        return packed, _lzma1_props()
    if coder == _LZMA2:
        packed = lzma.compress(
            data,
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
        )
        return packed, bytes([_lzma2_dict_prop(1 << 23)])
    raise ValueError(f"7z: unknown writer coder {coder.hex()}")


def _decode_payload(
    packed: bytes, coder: bytes, props: bytes, unpack_size: int
) -> bytes:
    if coder == _COPY:
        if props:
            raise ValueError("7z: Copy coder with properties")
        if len(packed) != unpack_size:
            raise ValueError("7z: Copy folder size mismatch")
        return packed
    if coder == _LZMA1:
        filters = [_parse_lzma1_props(props)]
    elif coder == _LZMA2:
        if len(props) != 1:
            raise ValueError("7z: LZMA2 properties must be 1 byte")
        filters = [
            {"id": lzma.FILTER_LZMA2, "dict_size": _lzma2_prop_dict(props[0])}
        ]
    else:
        raise NotImplementedError(
            f"7z: coder {coder.hex()} unsupported — Copy/LZMA1/LZMA2 "
            "decode natively; BCJ chains and AES stay loud seams"
        )
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filters)
    try:
        # raw LZMA1 folders carry no end marker: the container's
        # unpack size bounds the read
        out = dec.decompress(packed, max_length=unpack_size)
    except lzma.LZMAError as exc:
        raise ValueError(f"7z: folder payload damaged ({exc})") from exc
    if len(out) != unpack_size:
        raise ValueError(
            f"7z: folder decoded {len(out)} != declared {unpack_size}"
        )
    return out


def _digests(crcs: list[int]) -> bytes:
    out = bytearray([1])  # AllAreDefined
    for c in crcs:
        out += struct.pack("<I", c)
    return bytes(out)


def write_7z(files: dict[str, bytes], torn_header: bool = False) -> bytes:
    """A complete non-solid .7z: one single-coder folder per file,
    coders cycling Copy / LZMA1 / LZMA2 by position (all three shapes
    in any 3+-file archive), folder CRCs defined, FilesInfo carrying
    UTF-16LE names.  ``torn_header`` flips one byte inside the next
    header AFTER the signature triple is computed — the signature
    still points at it, its CRC no longer matches: the mid-upload
    damage class for a format whose directory lives at the tail."""
    names = list(files.keys())
    coders = [(_COPY, _LZMA1, _LZMA2)[i % 3] for i in range(len(names))]
    packed_list, props_list, crcs = [], [], []
    for name, coder in zip(names, coders):
        data = files[name]
        packed, props = _encode_payload(data, coder)
        packed_list.append(packed)
        props_list.append(props)
        crcs.append(zlib.crc32(data))

    # ---- StreamsInfo
    h = bytearray()
    h.append(_K_PACK_INFO)
    h += _write_number(0)                 # PackPos
    h += _write_number(len(names))        # NumPackStreams
    h.append(_K_SIZE)
    for p in packed_list:
        h += _write_number(len(p))
    h.append(_K_END)
    h.append(_K_UNPACK_INFO)
    h.append(_K_FOLDER)
    h += _write_number(len(names))
    h.append(0)                           # External = 0
    for coder, props in zip(coders, props_list):
        h += _write_number(1)             # NumCoders
        flags = len(coder) | (0x20 if props else 0)
        h.append(flags)
        h += coder
        if props:
            h += _write_number(len(props))
            h += props
    h.append(_K_UNPACK_SIZE)
    for name in names:
        h += _write_number(len(files[name]))
    h.append(_K_CRC)
    h += _digests(crcs)
    h.append(_K_END)

    # ---- FilesInfo
    f = bytearray([_K_FILES_INFO])
    f += _write_number(len(names))
    name_blob = bytearray([0])            # External = 0
    for name in names:
        name_blob += name.encode("utf-16-le") + b"\x00\x00"
    f.append(_K_NAME)
    f += _write_number(len(name_blob))
    f += name_blob
    f.append(_K_END)

    header = bytearray([_K_HEADER, _K_MAIN_STREAMS])
    header += h
    header.append(_K_END)
    header += f
    header.append(_K_END)

    body = b"".join(packed_list)
    # the triple carries the PRISTINE header's CRC; a torn upload then
    # damages the header bytes themselves — the CRC check must catch it
    next_crc = zlib.crc32(bytes(header))
    if torn_header:
        header[len(header) // 2] ^= 0xFF
    triple = struct.pack(
        "<QQI", len(body), len(header), next_crc
    )
    sig = MAGIC + bytes([0x00, 0x04]) + struct.pack(
        "<I", zlib.crc32(triple)
    ) + triple
    return sig + body + bytes(header)


def parse_7z_signature(head: bytes) -> tuple[int, int, int]:
    """The 32-byte signature header -> (absolute next-header offset,
    next-header size, next-header CRC32).  This plus one more range
    read (the header itself, which lives at the archive TAIL) is all a
    reader needs before it can range-read individual folders — the
    same two-small-reads discipline as the xz footer/index walk."""
    if head[:6] != MAGIC:
        raise ValueError("7z: bad signature magic")
    if len(head) < 32:
        raise ValueError("7z: truncated signature header")
    start_crc = struct.unpack("<I", head[8:12])[0]
    triple = head[12:32]
    if zlib.crc32(triple) != start_crc:
        raise ValueError("7z: signature header CRC mismatch")
    nh_off, nh_size, nh_crc = struct.unpack("<QQI", triple)
    return 32 + nh_off, nh_size, nh_crc


def read_7z(
    blob: bytes, with_meta: bool = False
) -> dict[str, bytes] | tuple[dict[str, bytes], dict[str, str]]:
    """Parse a .7z archive and return {name: bytes} for every file
    (with ``with_meta``, also {name: coder-id hex} so callers can
    value-check WHICH decode path ran).  Single-coder folders only
    (Copy/LZMA1/LZMA2), one file per folder — the shape the own writer
    emits and the common non-solid data archive; solid multi-file
    folders, bind-pair chains and encoded headers raise the documented
    loud classes."""
    h0, nh_size, nh_crc = parse_7z_signature(blob[:32])
    header = blob[h0 : h0 + nh_size]
    if len(header) != nh_size:
        raise ValueError("7z: next header runs past the file")
    entries = parse_7z_header(header, nh_crc)
    out: dict[str, bytes] = {}
    meta: dict[str, str] = {}
    for e in entries:
        packed = blob[e["offset"] : e["offset"] + e["packed_len"]]
        if len(packed) != e["packed_len"]:
            raise ValueError("7z: pack stream runs past the file")
        out[e["name"]] = decode_7z_folder(packed, e)
        meta[e["name"]] = e["coder"]
    return (out, meta) if with_meta else out


def decode_7z_folder(packed: bytes, entry: dict) -> bytes:
    """Decode ONE folder's pack-stream bytes against its header entry
    (the range-read half of the tail-header plan): the entry's coder/
    props drive the FORMAT_RAW decode, the declared unpack size bounds
    it, and the folder CRC (when defined) verifies the result."""
    data = _decode_payload(
        packed, bytes.fromhex(entry["coder"]), entry["props"],
        entry["unpack_len"],
    )
    if entry["crc"] is not None and zlib.crc32(data) != entry["crc"]:
        raise ValueError(f"7z: folder {entry['name']!r} CRC mismatch")
    return data


def parse_7z_header(header: bytes, nh_crc: int | None = None) -> list[dict]:
    """The next-header tree -> one entry per folder/file:
    ``{'name', 'offset', 'packed_len', 'unpack_len', 'coder' (hex),
    'props', 'crc'}`` with ABSOLUTE file offsets, so a caller holding
    only the 32-byte head and the header bytes (both tiny range reads)
    can plan per-folder range reads without ever scanning the
    archive."""
    if nh_crc is not None and zlib.crc32(header) != nh_crc:
        raise ValueError("7z: next header CRC mismatch")
    if not header:
        return []
    at = 0
    if header[at] == _K_ENCODED_HEADER:
        raise NotImplementedError(
            "7z: compressed (kEncodedHeader) headers unsupported"
        )
    if header[at] != _K_HEADER:
        raise ValueError(f"7z: unexpected header id {header[at]:#x}")
    at += 1
    if at >= len(header) or header[at] != _K_MAIN_STREAMS:
        raise NotImplementedError(
            "7z: archives without MainStreamsInfo unsupported"
        )
    at += 1

    # ---- PackInfo
    if header[at] != _K_PACK_INFO:
        raise ValueError("7z: PackInfo missing")
    at += 1
    pack_pos, at = _read_number(header, at)
    n_pack, at = _read_number(header, at)
    pack_sizes: list[int] = []
    while header[at] != _K_END:
        pid = header[at]
        at += 1
        if pid == _K_SIZE:
            for _ in range(n_pack):
                s, at = _read_number(header, at)
                pack_sizes.append(s)
        elif pid == _K_CRC:
            raise NotImplementedError("7z: pack-stream digests unsupported")
        else:
            raise ValueError(f"7z: unknown PackInfo property {pid:#x}")
    at += 1
    if len(pack_sizes) != n_pack:
        raise ValueError("7z: PackInfo without sizes")

    # ---- UnpackInfo
    if header[at] != _K_UNPACK_INFO:
        raise ValueError("7z: UnpackInfo missing")
    at += 1
    if header[at] != _K_FOLDER:
        raise ValueError("7z: kFolder missing")
    at += 1
    n_folders, at = _read_number(header, at)
    if header[at] != 0:
        raise NotImplementedError("7z: external folder data unsupported")
    at += 1
    folders: list[tuple[bytes, bytes]] = []  # (coder id, props)
    for _ in range(n_folders):
        n_coders, at = _read_number(header, at)
        if n_coders != 1:
            raise NotImplementedError(
                "7z: multi-coder folders (BCJ/filter chains) unsupported"
            )
        flags = header[at]
        at += 1
        id_size = flags & 0x0F
        coder = header[at : at + id_size]
        at += id_size
        if flags & 0x10:
            raise NotImplementedError("7z: complex coders unsupported")
        props = b""
        if flags & 0x20:
            psize, at = _read_number(header, at)
            props = header[at : at + psize]
            at += psize
        folders.append((coder, props))
    if header[at] != _K_UNPACK_SIZE:
        raise ValueError("7z: kCodersUnpackSize missing")
    at += 1
    unpack_sizes = []
    for _ in range(n_folders):
        s, at = _read_number(header, at)
        unpack_sizes.append(s)
    folder_crcs: list[int] | None = None
    while header[at] != _K_END:
        pid = header[at]
        at += 1
        if pid == _K_CRC:
            if header[at] != 1:
                raise NotImplementedError(
                    "7z: partially-defined folder digests unsupported"
                )
            at += 1
            folder_crcs = []
            for _ in range(n_folders):
                folder_crcs.append(
                    struct.unpack_from("<I", header, at)[0]
                )
                at += 4
        else:
            raise ValueError(f"7z: unknown UnpackInfo property {pid:#x}")
    at += 1
    if n_folders != n_pack:
        raise NotImplementedError(
            "7z: folders != pack streams (solid archives) unsupported"
        )
    if header[at] == _K_SUBSTREAMS_INFO:
        raise NotImplementedError(
            "7z: SubStreamsInfo (solid multi-file folders) unsupported"
        )
    if header[at] != _K_END:
        raise ValueError("7z: unterminated StreamsInfo")
    at += 1

    # ---- FilesInfo
    names: list[str] = []
    if at < len(header) and header[at] == _K_FILES_INFO:
        at += 1
        n_files, at = _read_number(header, at)
        if n_files != n_folders:
            raise NotImplementedError(
                "7z: empty-stream entries (files != folders) unsupported"
            )
        while True:
            ptype, at = _read_number(header, at)
            if ptype == _K_END:
                break
            psize, at = _read_number(header, at)
            pdata = header[at : at + psize]
            if len(pdata) != psize:
                raise ValueError("7z: FilesInfo property truncated")
            at += psize
            if ptype == _K_NAME:
                if pdata[0] != 0:
                    raise NotImplementedError(
                        "7z: external names unsupported"
                    )
                raw = pdata[1:]
                if len(raw) % 2:
                    raise ValueError("7z: odd-length name blob")
                parts = raw.decode("utf-16-le").split("\x00")
                if parts and parts[-1] == "":
                    parts = parts[:-1]
                names = parts
            # other properties (kMTime, kAttributes, ...) are skipped
        if len(names) != n_files:
            raise ValueError("7z: name count disagrees with file count")
    else:
        names = [f"stream{k}" for k in range(n_folders)]

    # ---- assemble per-folder entries with absolute offsets
    entries: list[dict] = []
    pos = 32 + pack_pos
    for k, ((coder, props), psize, usize, name) in enumerate(
        zip(folders, pack_sizes, unpack_sizes, names)
    ):
        entries.append(
            {
                "name": name,
                "offset": pos,
                "packed_len": psize,
                "unpack_len": usize,
                "coder": coder.hex(),
                "props": props,
                "crc": folder_crcs[k] if folder_crcs is not None else None,
            }
        )
        pos += psize
    return entries
