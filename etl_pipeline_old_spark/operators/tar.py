"""Minimal ustar (POSIX.1-1988 tar) writer/reader, pure stdlib — the
container behind the WebDataset training-data layout (tar shards whose
members group into samples by basename: 000001.jpg + 000001.txt +
000001.json), the de-facto dataloader format for image-text corpora.

Written from the public ustar format description (IEEE 1003.1 `pax`
"ustar Interchange Format"): 512-byte header blocks (name, octal size,
checksum over the header with the checksum field as spaces, 'ustar'
magic), member data padded to 512, two zero blocks at the end. The
writer pins every varying field (mtime=0, uid/gid=0, mode 0644) so
staged shards are byte-stable; the reader is a hand-rolled block walk
so the parse itself is exercised code, CROSS-VALIDATED both directions
against the independent stdlib ``tarfile`` module in
tests/test_tar_webdataset.py (our writer's output reads identically
under tarfile; tarfile's own output reads identically under our
walker).

Reference seam being replaced: the reference loads inputs through
pandas/requests only (no container formats in /root/reference);
WebDataset-style tar shards are part of this repo's multimodal
north-star extension.
"""

from __future__ import annotations

from collections.abc import Iterator

_BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    return f"{n:0{width - 1}o}".encode() + b"\x00"


def tar_member(name: str, data: bytes) -> bytes:
    """One ustar member: header block + data padded to 512 bytes."""
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError(f"name too long for ustar: {name!r}")
    hdr = bytearray(_BLOCK)
    hdr[0 : len(nb)] = nb
    hdr[100:108] = _octal(0o644, 8)  # mode
    hdr[108:116] = _octal(0, 8)  # uid
    hdr[116:124] = _octal(0, 8)  # gid
    hdr[124:136] = _octal(len(data), 12)  # size
    hdr[136:148] = _octal(0, 12)  # mtime: pinned for determinism
    hdr[148:156] = b" " * 8  # checksum field counts as spaces
    hdr[156] = 0x30  # typeflag '0': regular file
    hdr[257:263] = b"ustar\x00"  # magic
    hdr[263:265] = b"00"  # version
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
    pad = (-len(data)) % _BLOCK
    return bytes(hdr) + data + b"\x00" * pad


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """A complete tar archive: members in order + the two-zero-block
    end-of-archive marker."""
    return b"".join(tar_member(n, d) for n, d in members) + b"\x00" * (
        2 * _BLOCK
    )


def iter_tar(blob: bytes) -> Iterator[tuple[str, bytes]]:
    """Walk a tar archive's blocks and yield (name, data) per regular
    file member. Strict: header checksums are verified (a torn shard
    fails at the damaged member, not silently), non-regular members are
    skipped, and the walk stops at the end-of-archive zero block. A blob
    that runs out of blocks without ever presenting that zero block —
    e.g. a shard truncated exactly on a 512-byte member boundary — is
    rejected too, so truncation can never silently drop trailing
    members."""
    i = 0
    n = len(blob)
    while i + _BLOCK <= n:
        hdr = blob[i : i + _BLOCK]
        if hdr == b"\x00" * _BLOCK:  # end-of-archive
            return
        stored = int(hdr[148:156].rstrip(b"\x00 ") or b"0", 8)
        actual = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != actual:
            raise ValueError(f"tar header checksum mismatch at offset {i}")
        name = hdr[:100].split(b"\x00", 1)[0].decode("utf-8")
        size = int(hdr[124:136].rstrip(b"\x00 ") or b"0", 8)
        data_start = i + _BLOCK
        data = blob[data_start : data_start + size]
        if len(data) < size:
            raise ValueError(f"truncated tar member {name!r}")
        if hdr[156] in (0x30, 0x00):  # '0' or NUL: regular file
            yield name, data
        i = data_start + size + ((-size) % _BLOCK)
    if i < n:
        raise ValueError("tar archive ends mid-block")
    raise ValueError("tar archive missing end-of-archive marker")
