"""ZIP (PKZIP / APPNOTE.TXT) container codec — pure stdlib, own walker.

Written from the public PKWARE APPNOTE.TXT layout: local file headers,
central directory entries, end-of-central-directory record; methods 0
(stored) and 8 (deflate, raw zlib streams).  Cross-validated BOTH
directions against CPython's independent ``zipfile`` module in
tests/test_pkzip.py — archives we write open in zipfile, archives
zipfile writes open here.

Why this exists: next to WebDataset tar shards (operators/tar.py), ZIP
is the other container training corpora actually arrive in (Kaggle
dumps, ImageNet-style archives, document dumps).  Spark's binaryFile
scan hands the engine whole shards; this walker turns one shard blob
into members inside the Arrow kernel with per-member integrity:

- the reader walks the CENTRAL DIRECTORY (the authoritative index per
  the spec), not a linear local-header scan — entries deleted or
  orphaned in the stream are correctly invisible;
- every member's CRC-32 and declared sizes are verified on extraction;
  a mismatch raises, so a torn shard costs its record, never the job;
- ZIP64 markers raise a documented ``NotImplementedError`` seam (the
  4 GiB+ single-shard case; real corpus shards are sized well below).
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
# fixed DOS timestamp (1980-01-01 00:00:00) — shards are deterministic
_DOS_TIME, _DOS_DATE = 0, 0x21


def write_zip(members: list) -> bytes:
    """Serialize ``[(name, data, method)]`` (method 'stored'|'deflated')
    into a spec-valid archive: local headers + payloads, then the
    central directory and EOCD."""
    out = bytearray()
    central = bytearray()
    for name, data, method in members:
        nm = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == "deflated":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
            m = 8
        elif method == "stored":
            payload, m = data, 0
        else:
            raise ValueError(f"unknown method {method!r}")
        off = len(out)
        # flag 0x800: names are UTF-8 (APPNOTE D.2) — without it readers
        # must assume cp437 and non-ASCII names round-trip wrong
        common = struct.pack(
            "<HHHHHIII", 20, 0x800, m, _DOS_TIME, _DOS_DATE, crc,
            len(payload), len(data),
        )
        out += _LOCAL_SIG + common + struct.pack("<HH", len(nm), 0) + nm
        out += payload
        central += (
            _CENTRAL_SIG + struct.pack("<H", 20) + common
            + struct.pack("<HHHHHII", len(nm), 0, 0, 0, 0, 0, off)
            + nm
        )
    cd_off = len(out)
    out += central
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(central), cd_off, 0
    )
    return bytes(out)


def _find_eocd(blob: bytes) -> int:
    # EOCD is within the last 64 KiB + 22 bytes (max comment); take the
    # LAST signature occurrence so a signature inside member data or the
    # comment of an embedded archive cannot hijack the walk
    window_start = max(0, len(blob) - 65536 - 22)
    i = blob.rfind(_EOCD_SIG, window_start)
    if i < 0:
        raise ValueError("zip: no end-of-central-directory record")
    return i


def read_zip(blob: bytes) -> list:
    """Walk the central directory and extract every member with CRC and
    size verification.  Returns ``[(name, data, method)]`` in directory
    order."""
    e = _find_eocd(blob)
    (_dn, _d, n_here, n_total, cd_size, cd_off, _cl) = struct.unpack_from(
        "<HHHHIIH", blob, e + 4
    )
    if 0xFFFF in (n_here, n_total) or 0xFFFFFFFF in (cd_size, cd_off):
        raise NotImplementedError(
            "zip64 archive: >4 GiB shards need the ZIP64 records — the "
            "documented seam; corpus shards are sized below it"
        )
    if cd_off + cd_size > len(blob):
        raise ValueError("zip: central directory runs past end")
    out = []
    pos = cd_off
    for _i in range(n_total):
        if blob[pos : pos + 4] != _CENTRAL_SIG:
            raise ValueError("zip: bad central directory signature")
        (
            _vmade, _vneed, flags, method, _t, _d2, crc, csize, usize,
            nlen, xlen, clen, _disk, _iattr, _eattr, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", blob, pos + 4)
        if 0xFFFFFFFF in (csize, usize, lho):
            raise NotImplementedError("zip64 member — documented seam")
        if flags & 0x1:
            raise ValueError("zip: encrypted member")
        name = blob[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + xlen + clen
        # local header: its own name/extra lengths may differ (extra
        # fields are often local-only); trust the central sizes
        if blob[lho : lho + 4] != _LOCAL_SIG:
            raise ValueError(f"zip: bad local header for {name!r}")
        lnlen, lxlen = struct.unpack_from("<HH", blob, lho + 26)
        d0 = lho + 30 + lnlen + lxlen
        payload = blob[d0 : d0 + csize]
        if len(payload) != csize:
            raise ValueError(f"zip: member {name!r} payload truncated")
        if method == 8:
            data = zlib.decompress(payload, -15)
            mname = "deflated"
        elif method == 0:
            data, mname = payload, "stored"
        else:
            raise NotImplementedError(
                f"zip compression method {method} needs an external "
                "library — stored and deflate decode natively"
            )
        if len(data) != usize:
            raise ValueError(f"zip: member {name!r} size mismatch")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: member {name!r} CRC mismatch")
        out.append((name, data, mname))
    return out
