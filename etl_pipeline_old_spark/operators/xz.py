""".xz container walk (Tukaani xz file format, public spec) — the
BLOCK-level split story: ``xz -T0`` (how any large corpus actually gets
compressed) writes independent blocks and an INDEX of their sizes, so a
100 TB ingester seeks the footer, reads the tiny index, and range-reads
one block per task — the same discipline as the Wikipedia multistream
dump, for the other compressor the public-corpus world ships.

CPython's ``lzma`` handles whole streams but cannot seek blocks, so the
container layer is implemented here from the spec: stream header/footer
(CRC32-checked flags, the backward-size pointer to the index), block
headers (size byte, flags, filter flags with the LZMA2 dict-size
property), the index (7-bit varints of unpadded/uncompressed sizes),
and 4-byte padding rules.  Block PAYLOADS decode through ``lzma`` in
FORMAT_RAW with the FILTER_LZMA2 chain recovered from each block's own
header — the stdlib does the entropy coding, this module does the
container.  The own writer emits check type None (``xz -C none``; legal
and what block-parallel writers commonly use) so staged files are
byte-deterministic.

Damage raises ValueError: bad magics, a CRC32 mismatch on any header,
an index disagreeing with the block walk, truncated blocks.
"""

from __future__ import annotations

import lzma
import struct
import zlib

_MAGIC = b"\xfd7zXZ\x00"
_FOOTER_MAGIC = b"YZ"
_CHECK_NONE = 0x00


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, at: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if at >= len(buf) or shift > 63:
            raise ValueError("xz: truncated varint")
        b = buf[at]
        at += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, at
        shift += 7


def _dict_size_prop(dict_size: int) -> int:
    """LZMA2 filter property byte for a dict size (spec: 2^(p/2+11)
    rounded up through the 2+bit pattern); we emit only exact powers
    of two, whose encoding is p = 2*(log2 - 12) + ... the spec's
    formula inverted for the sizes the writer uses."""
    if dict_size == 1 << 23:  # 8 MiB, the writer's fixed choice
        return 24
    raise ValueError("xz: writer supports the fixed 8 MiB dict only")


def _prop_dict_size(prop: int) -> int:
    if prop > 40:
        raise ValueError(f"xz: bad LZMA2 dict-size property {prop}")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def _block(payload: bytes) -> tuple[bytes, int, int]:
    """One block with an LZMA2/8MiB filter chain and check None:
    returns (bytes, unpadded_size, uncompressed_size)."""
    comp = lzma.compress(
        payload,
        format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
    )
    # header: size byte, flags (one filter, no size fields), filter id
    # 0x21 (LZMA2), props size 1, props byte, padding, CRC32
    body = bytes([0x00]) + _varint(0x21) + _varint(1) + bytes(
        [_dict_size_prop(1 << 23)]
    )
    hdr_wo_size = body
    total = 1 + len(hdr_wo_size) + 4  # size byte + body + crc
    padded = (total + 3) // 4 * 4
    body += b"\x00" * (padded - total)
    size_byte = padded // 4 - 1
    hdr = bytes([size_byte]) + body
    hdr += struct.pack("<I", zlib.crc32(hdr))
    data = hdr + comp
    unpadded = len(data)  # check None contributes 0
    block = data + b"\x00" * (-len(data) % 4)
    return block, unpadded, len(payload)


def write_xz_blocks(
    payloads: list[bytes], truncate_blocks: set | None = None
) -> bytes:
    """A multi-block .xz (the ``xz -T0 -C none`` shape): stream header,
    one independent block per payload, the index, stream footer.
    Blocks whose ordinal is in ``truncate_blocks`` stage TORN — their
    compressed payload cut to 60% with the index recording the short
    size, the mid-upload damage shape (check None carries no payload
    integrity, so truncation is the deterministic loud class)."""
    flags = bytes([0x00, _CHECK_NONE])
    out = bytearray(_MAGIC + flags + struct.pack("<I", zlib.crc32(flags)))
    records = []
    for k, p in enumerate(payloads):
        block, unpadded, usize = _block(p)
        if truncate_blocks and k in truncate_blocks:
            hdr_size = (block[0] + 1) * 4
            keep = hdr_size + max(2, int((unpadded - hdr_size) * 0.6))
            unpadded = keep
            block = block[:keep] + b"\x00" * (-keep % 4)
        out += block
        records.append((unpadded, usize))
    index = bytearray(b"\x00" + _varint(len(records)))
    for unpadded, usize in records:
        index += _varint(unpadded) + _varint(usize)
    index += b"\x00" * (-len(index) % 4)
    index += struct.pack("<I", zlib.crc32(index))
    out += index
    backward = len(index) // 4 - 1
    footer_body = struct.pack("<I", backward) + flags
    out += struct.pack("<I", zlib.crc32(footer_body)) + footer_body
    out += _FOOTER_MAGIC
    return bytes(out)


def read_xz_index(footer_and_index: bytes, file_len: int) -> list[dict]:
    """Parse the stream footer (the LAST 12 bytes of ``footer_and_index``)
    and the index it points back to, returning per-block
    ``{'offset', 'compressed_len', 'uncompressed_len'}`` — offsets are
    absolute file positions, so a caller holding only the file TAIL can
    plan range reads.  ``footer_and_index`` must contain at least
    ``backward_size + 12`` trailing bytes of the file."""
    if len(footer_and_index) < 12:
        raise ValueError("xz: footer truncated")
    footer = footer_and_index[-12:]
    if footer[-2:] != _FOOTER_MAGIC:
        raise ValueError("xz: bad footer magic")
    crc = struct.unpack("<I", footer[:4])[0]
    if zlib.crc32(footer[4:10]) != crc:
        raise ValueError("xz: footer CRC mismatch")
    backward = struct.unpack("<I", footer[4:8])[0]
    index_size = (backward + 1) * 4
    if len(footer_and_index) < index_size + 12:
        raise ValueError("xz: tail does not cover the index")
    index = footer_and_index[-12 - index_size : -12]
    if zlib.crc32(index[:-4]) != struct.unpack("<I", index[-4:])[0]:
        raise ValueError("xz: index CRC mismatch")
    if index[0] != 0x00:
        raise ValueError("xz: bad index indicator")
    n, at = _read_varint(index, 1)
    out = []
    pos = 12  # first block starts after the 12-byte stream header
    for _ in range(n):
        unpadded, at = _read_varint(index, at)
        usize, at = _read_varint(index, at)
        padded = (unpadded + 3) // 4 * 4
        out.append(
            {"offset": pos, "compressed_len": padded,
             "uncompressed_len": usize}
        )
        pos += padded
    if pos + index_size + 12 != file_len:
        raise ValueError("xz: index disagrees with the file length")
    return out


def decode_xz_block(block: bytes) -> bytes:
    """Decode ONE block's bytes (header + compressed data [+ padding]):
    the block header's own filter flags drive a FORMAT_RAW LZMA2
    decode — no whole-stream state, which is exactly why blocks are
    the split points."""
    if not block:
        raise ValueError("xz: empty block")
    hdr_size = (block[0] + 1) * 4
    if hdr_size > len(block):
        raise ValueError("xz: block header runs past the block")
    hdr = block[:hdr_size]
    if zlib.crc32(hdr[:-4]) != struct.unpack("<I", hdr[-4:])[0]:
        raise ValueError("xz: block header CRC mismatch")
    flags = hdr[1]
    if flags & 0x3F or flags & 0xC0:
        raise ValueError("xz: multi-filter or sized block unsupported")
    fid, at = _read_varint(hdr, 2)
    if fid != 0x21:
        raise ValueError(f"xz: filter 0x{fid:02x} is not LZMA2")
    psz, at = _read_varint(hdr, at)
    if psz != 1:
        raise ValueError("xz: bad LZMA2 properties size")
    dict_size = _prop_dict_size(hdr[at])
    try:
        return lzma.decompress(
            block[hdr_size:],
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": dict_size}],
        )
    except lzma.LZMAError as exc:
        raise ValueError(f"xz: block payload damaged ({exc})") from exc
