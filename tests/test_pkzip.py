"""ZIP codec tests — operators/pkzip.py.

Cross-validation strategy mirrors operators/tar.py vs tarfile: the
INDEPENDENT stdlib zipfile module must open what we write, and we must
open what it writes — plus loud-failure coverage for CRC/size damage,
truncation, encryption, zip64 markers, and exotic methods.
"""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from etl_pipeline_old_spark.operators.pkzip import read_zip, write_zip

_MEMBERS = [
    ("a/1.txt", b"hello world" * 10, "deflated"),
    ("2.bin", bytes(range(256)), "stored"),
    ("uß.txt", "ünïcødé".encode(), "deflated"),
    ("empty.txt", b"", "stored"),
]


def test_own_roundtrip():
    assert read_zip(write_zip(_MEMBERS)) == _MEMBERS


def test_stdlib_reads_ours():
    zf = zipfile.ZipFile(io.BytesIO(write_zip(_MEMBERS)))
    assert zf.testzip() is None
    assert sorted(zf.namelist()) == sorted(n for n, _, _ in _MEMBERS)
    for n, d, _ in _MEMBERS:
        assert zf.read(n) == d


def test_we_read_stdlibs():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("x.txt", b"abc" * 50)
        z.writestr("stored.bin", b"raw", zipfile.ZIP_STORED)
    got = read_zip(buf.getvalue())
    assert {(n, bytes(d), m) for n, d, m in got} == {
        ("x.txt", b"abc" * 50, "deflated"),
        ("stored.bin", b"raw", "stored"),
    }


def test_payload_corruption_fails_crc():
    blob = bytearray(write_zip(_MEMBERS))
    blob[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_zip(bytes(blob))


def test_truncation_is_loud():
    blob = write_zip(_MEMBERS)
    with pytest.raises(ValueError, match="no end-of-central-directory"):
        read_zip(blob[: len(blob) // 2])


def test_encrypted_member_is_loud():
    blob = bytearray(write_zip([("s.txt", b"secret", "stored")]))
    i = blob.find(b"PK\x01\x02")
    flags = struct.unpack_from("<H", blob, i + 8)[0]
    struct.pack_into("<H", blob, i + 8, flags | 0x1)
    with pytest.raises(ValueError, match="encrypted"):
        read_zip(bytes(blob))


def test_zip64_sentinel_without_locator_is_loud():
    # a sentinel EOCD field with NO zip64 locator behind it is damage,
    # not a seam (r11: zip64 reads natively now)
    blob = bytearray(write_zip([("s.txt", b"x", "stored")]))
    e = blob.rfind(b"PK\x05\x06")
    struct.pack_into("<I", blob, e + 16, 0xFFFFFFFF)  # cd offset marker
    with pytest.raises(ValueError, match="no zip64 EOCD locator"):
        read_zip(bytes(blob))


_Z64_MEMBERS = [
    ("a.txt", b"hello world" * 100, "deflated"),
    ("dir/b.bin", bytes(range(256)) * 10, "stored"),
    ("имя файла.txt", "данные файла".encode(), "deflated"),
]


def test_zip64_own_roundtrip():
    blob = write_zip(_Z64_MEMBERS, force_zip64=True)
    # the full zip64 layout is present: EOCD record, locator, extras
    assert b"PK\x06\x06" in blob and b"PK\x06\x07" in blob
    assert read_zip(blob) == _Z64_MEMBERS


def test_stdlib_reads_our_zip64():
    blob = write_zip(_Z64_MEMBERS, force_zip64=True)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert [i.filename for i in zf.infolist()] == [
        m[0] for m in _Z64_MEMBERS
    ]
    for name, data, _m in _Z64_MEMBERS:
        assert zf.read(name) == data


def test_we_read_stdlib_zip64():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data, m in _Z64_MEMBERS:
            with z.open(zipfile.ZipInfo(name), "w", force_zip64=True) as fh:
                fh.write(data)
    got = read_zip(buf.getvalue())
    # zipfile's ZipInfo defaults to stored; compare names + payloads
    assert [(n, d) for n, d, _ in got] == [
        (n, d) for n, d, _ in _Z64_MEMBERS
    ]


def test_zip64_member_crc_still_verified():
    blob = bytearray(write_zip(_Z64_MEMBERS, force_zip64=True))
    # flip a payload byte of the stored member
    at = blob.find(bytes(range(256)))
    blob[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_zip(bytes(blob))


def test_zip64_truncated_extra_is_loud():
    blob = bytearray(write_zip([("s.txt", b"x" * 64, "stored")],
                               force_zip64=True))
    # shrink the declared length of the central 0x0001 extra block
    cd = blob.find(b"PK\x01\x02")
    ex = blob.find(struct.pack("<HH", 0x0001, 24), cd)
    assert ex > 0
    struct.pack_into("<H", blob, ex + 2, 8)  # lies: only 8 bytes present
    with pytest.raises(ValueError, match="zip64 extra block too short"):
        read_zip(bytes(blob))


def test_multi_disk_zip64_is_loud():
    blob = bytearray(write_zip([("s.txt", b"x", "stored")],
                               force_zip64=True))
    loc = blob.rfind(b"PK\x06\x07")
    struct.pack_into("<I", blob, loc + 16, 3)  # total disks = 3
    with pytest.raises(ValueError, match="multi-disk"):
        read_zip(bytes(blob))


def test_unknown_method_is_documented_seam():
    blob = bytearray(write_zip([("s.txt", b"xyz", "stored")]))
    for sig in (b"PK\x01\x02", b"PK\x03\x04"):
        i = blob.find(sig)
        off = i + (10 if sig == b"PK\x01\x02" else 8)
        struct.pack_into("<H", blob, off, 12)  # bzip2
    with pytest.raises(NotImplementedError, match="method 12"):
        read_zip(bytes(blob))


def test_eocd_signature_inside_member_data_is_ignored():
    # a stored member containing the EOCD magic must not hijack the walk
    tricky = b"PK\x05\x06" + b"\x00" * 18
    members = [("trap.bin", tricky, "stored"), ("ok.txt", b"fine", "deflated")]
    assert read_zip(write_zip(members)) == members


def test_central_directory_is_authoritative():
    # splice an orphan local header + payload between members: a linear
    # local-header scan would surface it; the central walk must not
    a = write_zip([("real.txt", b"real", "stored")])
    orphan = write_zip([("ghost.txt", b"boo", "stored")])
    cd = a.rfind(b"PK\x01\x02")
    ghost_local_end = orphan.find(b"PK\x01\x02")
    spliced = a[:cd] + orphan[:ghost_local_end] + a[cd:]
    # fix EOCD's cd offset
    blob = bytearray(spliced)
    e = blob.rfind(b"PK\x05\x06")
    struct.pack_into("<I", blob, e + 16, cd + ghost_local_end)
    names = [n for n, _, _ in read_zip(bytes(blob))]
    assert names == ["real.txt"]


# ----------------------------------------------------- ZipCrypto members
def test_zipcrypto_roundtrip_and_zipfile_cross_validation():
    """Our encryptor must produce archives CPython zipfile's INDEPENDENT
    decryptor opens — the cross-engine pin for the keystream."""
    import io
    import zipfile as zf_mod

    members = [
        ("a.txt", b"hello zipcrypto", "deflated"),
        ("dir/b.bin", bytes(range(256)) * 4, "stored"),
        ("empty.txt", b"", "deflated"),
    ]
    pw = b"s3cret"
    blob = write_zip(members, password=pw)
    got = read_zip(blob, password=pw)
    assert [(n, d) for n, d, _ in got] == [(n, d) for n, d, _ in members]
    with zf_mod.ZipFile(io.BytesIO(blob)) as zf:
        for n, d, _m in members:
            assert zf.read(n, pwd=pw) == d


def test_zipcrypto_wrong_or_missing_password_is_loud():
    blob = write_zip([("a.txt", b"payload", "deflated")], password=b"pw")
    with pytest.raises(ValueError, match="wrong password"):
        read_zip(blob, password=b"nope")
    with pytest.raises(ValueError, match="no password"):
        read_zip(blob)


def test_zipcrypto_composes_with_zip64():
    import io
    import zipfile as zf_mod

    members = [("big/being-faked.bin", b"x" * 1000, "deflated")]
    blob = write_zip(members, force_zip64=True, password=b"pw")
    assert read_zip(blob, password=b"pw")[0][1] == b"x" * 1000
    with zf_mod.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.read("big/being-faked.bin", pwd=b"pw") == b"x" * 1000


def test_zipcrypto_tampered_payload_fails_crc():
    blob = bytearray(
        write_zip([("a.txt", b"payload-bytes", "stored")], password=b"pw")
    )
    # flip one ciphertext byte past the 12-byte header of the first
    # member (local header is 30 + name), keystream still aligns
    at = 30 + len("a.txt") + 12 + 2
    blob[at] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_zip(bytes(blob), password=b"pw")
