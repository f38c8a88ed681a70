""".7z container codec (operators/sevenzip.py): spec-pinned NUMBER
coding, three-coder roundtrips, per-folder CRC verification, and loud
damage classes.  No independent 7z implementation exists in this
container (stdlib has none, py7zr is absent), so the pin is roundtrip
+ spec structure + stdlib-lzma payloads — recorded honestly in
CONFORMANCE.md."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from etl_pipeline_old_spark.operators.sevenzip import (
    MAGIC,
    _read_number,
    _write_number,
    read_7z,
    write_7z,
)

_RND = random.Random(20260816)


def test_number_coding_roundtrips_all_widths():
    for n in (0, 1, 63, 64, 127, 128, 255, 256, 16383, 16384,
              2**20, 2**27 - 1, 2**35, 2**42, 2**56 - 1, 2**56,
              2**63, 2**64 - 1):
        enc = _write_number(n)
        got, at = _read_number(enc, 0)
        assert (got, at) == (n, len(enc)), (n, enc.hex())
    # shortest-form check: one byte up to 127, two up to 16383
    assert len(_write_number(127)) == 1
    assert len(_write_number(128)) == 2
    assert len(_write_number(16383)) == 2
    assert len(_write_number(16384)) == 3
    with pytest.raises(ValueError, match="truncated"):
        _read_number(b"\xff\x01\x02", 0)


def test_roundtrip_mixes_all_three_coders():
    files = {
        "a_copy.txt": b"copy data " * 9,
        "b_lzma1.txt": "лзма один ".encode("utf-8") * 40,
        "c_lzma2.txt": _RND.randbytes(4096),
        "d_copy.bin": b"",
        "e_lzma1.txt": b"A" * 100_000,
        "f_lzma2.txt": b"varied %d " % 7 * 333,
    }
    blob = write_7z(files)
    assert blob[:6] == MAGIC
    got, meta = read_7z(blob, with_meta=True)
    assert got == files
    # the writer cycles Copy/LZMA1/LZMA2 by position
    assert [meta[k] for k in files] == [
        "00", "030101", "21", "00", "030101", "21"
    ]


def test_empty_archive_and_unicode_names():
    assert read_7z(write_7z({})) == {}
    files = {"документ/раз.txt": b"x", "日本語.bin": b"y" * 300}
    assert read_7z(write_7z(files)) == files


def test_damage_classes_are_loud():
    files = {f"doc_{k}.txt": b"payload %d " % k * 50 for k in range(6)}
    blob = write_7z(files)
    # torn header: triple carries the pristine CRC, bytes flipped
    with pytest.raises(ValueError, match="next header CRC"):
        read_7z(write_7z(files, torn_header=True))
    # bad magic
    with pytest.raises(ValueError, match="magic"):
        read_7z(b"PK\x03\x04" + blob[4:])
    # signature-triple CRC lie
    b2 = bytearray(blob)
    b2[12] ^= 0xFF
    with pytest.raises(ValueError, match="signature header CRC"):
        read_7z(bytes(b2))
    # flipped body byte -> folder CRC mismatch (Copy folder: bytes
    # land verbatim, only the CRC catches it)
    b3 = bytearray(blob)
    b3[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_7z(bytes(b3))
    # truncated file: header range runs past the end
    with pytest.raises(ValueError, match="past the file|truncated"):
        read_7z(blob[: len(blob) - 8])
    # next-header size lie (keep the triple CRC honest about the lie)
    b4 = bytearray(blob)
    nh_size = struct.unpack_from("<Q", b4, 20)[0]
    struct.pack_into("<Q", b4, 20, nh_size + 4)
    struct.pack_into("<I", b4, 8, zlib.crc32(bytes(b4[12:32])))
    with pytest.raises(ValueError, match="past the file|CRC"):
        read_7z(bytes(b4))


def test_unsupported_shapes_raise_not_implemented():
    blob = bytearray(write_7z({"a.txt": b"x" * 10}))
    # swap the header id for kEncodedHeader: compressed headers are a
    # documented seam, and must be NotImplementedError, not garbage
    nh_off, nh_size = struct.unpack_from("<QQ", blob, 12)
    h0 = 32 + nh_off
    assert blob[h0] == 0x01
    blob[h0] = 0x17
    struct.pack_into(
        "<I", blob, 28, zlib.crc32(bytes(blob[h0 : h0 + nh_size]))
    )
    struct.pack_into("<I", blob, 8, zlib.crc32(bytes(blob[12:32])))
    with pytest.raises(NotImplementedError, match="kEncodedHeader"):
        read_7z(bytes(blob))


def test_lzma1_props_parse_matches_spec_formula():
    from etl_pipeline_old_spark.operators.sevenzip import (
        _lzma1_props,
        _parse_lzma1_props,
    )

    for lc in (0, 3, 8):
        for lp in (0, 2):
            for pb in (0, 2, 4):
                props = _lzma1_props(lc, lp, pb, 1 << 20)
                f = _parse_lzma1_props(props)
                assert (f["lc"], f["lp"], f["pb"], f["dict_size"]) == (
                    lc, lp, pb, 1 << 20
                )
    with pytest.raises(ValueError, match="5 bytes"):
        _parse_lzma1_props(b"\x5d")
    with pytest.raises(ValueError, match="lclppb"):
        _parse_lzma1_props(bytes([225]) + b"\x00\x00\x10\x00")
