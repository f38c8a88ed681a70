"""RFC 8878 zstd decoder (operators/zstd.py): cross-validated BOTH
directions against the reference implementation that ships in the
container twice (pyarrow's bundled libzstd codec and the zstd CLI) —
the xz-grade pin.  The differential IS the conformance vector for the
transcribed predefined FSE distributions and code baselines: a wrong
table cell cannot decode a libzstd frame back to its input."""

from __future__ import annotations

import random
import shutil
import struct
import subprocess

import pyarrow as pa
import pytest

from etl_pipeline_old_spark.operators.zstd import (
    compress_raw_frame,
    decompress,
    read_seek_table,
    write_seekable,
    xxh64,
)

_CODEC = pa.Codec("zstd")
_CLI = shutil.which("zstd") or "/root/miniconda/bin/zstd"
_RND = random.Random(20260816)


def _cli(data: bytes, *args: str) -> bytes:
    out = subprocess.run(
        [_CLI, "-q", *args, "-o", "/dev/stdout"],
        input=data,
        capture_output=True,
        check=True,
    )
    return out.stdout


_WORDS = [b"the", b"corpus", b"shard", b"ingester", b"zstd", b"reads",
          "слово".encode(), b"tokens"]


def _payloads() -> dict[str, bytes]:
    return {
        "empty": b"",
        "tiny": b"abc",
        "rle": b"a" * 10000,
        "text": b"the quick brown fox jumps over the lazy dog " * 500,
        "utf8": ("слово дело тело " * 400).encode(),
        "random": _RND.randbytes(20000),
        "mixed": b" ".join(_RND.choice(_WORDS) for _ in range(20000)),
    }


def test_decodes_reference_frames_all_levels():
    """Levels 1/19/22 exercise predefined, FSE-described, RLE and
    repeat sequence tables, 1- and 4-stream Huffman and treeless
    literals; --no-check drops the checksum; -T0 is the corpus shape."""
    for name, data in _payloads().items():
        for args in (["-1"], ["-19"], ["--ultra", "-22"], ["--no-check", "-5"], ["-T0", "-3"]):
            frame = _cli(data, *args)
            assert decompress(frame) == data, (name, args)
        assert decompress(bytes(_CODEC.compress(data))) == data, name


def test_multiblock_frame_with_checksum():
    big = b" ".join(_RND.choice(_WORDS) for _ in range(120000))  # > 128 KiB
    assert len(big) > 1 << 19
    frame = _cli(big, "-7")
    assert decompress(frame) == big  # verifies the XXH64 content checksum


def test_own_raw_frames_decode_through_libzstd():
    for name, data in _payloads().items():
        frame = compress_raw_frame(data)
        assert bytes(_CODEC.decompress(frame, len(data))) == data, name
        assert decompress(frame) == data, name


def test_multi_frame_and_skippable():
    a, b = b"part one " * 100, b"part two " * 100
    skip = struct.pack("<II", 0x184D2A53, 5) + b"XXXXX"
    blob = bytes(_CODEC.compress(a)) + skip + bytes(_CODEC.compress(b))
    assert decompress(blob) == a + b


def test_xxh64_pinned_by_reference_checksums():
    # the low 32 bits of these values are what libzstd writes into the
    # checksummed frames decoded above — the strongest available pin
    assert xxh64(b"") == 0xEF46DB3751D8E999
    frame = _cli(b"pin", "-3")
    assert frame[-4:] == struct.pack("<I", xxh64(b"pin") & 0xFFFFFFFF)


def test_seekable_roundtrip_and_range_reads():
    chunks = [_RND.randbytes(500) + b"A" * 3000 for _ in range(12)]
    blob = write_seekable(chunks, compress=lambda b: bytes(_CODEC.compress(b)))
    # reference zstd decodes the whole container (seek table is skippable)
    whole = subprocess.run(
        [_CLI, "-q", "-d", "-o", "/dev/stdout"], input=blob, capture_output=True
    ).stdout
    assert whole == b"".join(chunks)
    recs = read_seek_table(blob[-4096:], len(blob))
    assert [r["decompressed_len"] for r in recs] == [len(c) for c in chunks]
    for rec, want in zip(recs, chunks):
        frame = blob[rec["offset"] : rec["offset"] + rec["compressed_len"]]
        assert decompress(frame) == want
    # own-writer frames inside a seekable container work too
    blob2 = write_seekable(chunks[:3])
    recs2 = read_seek_table(blob2[-4096:], len(blob2))
    assert decompress(
        blob2[recs2[1]["offset"] : recs2[1]["offset"] + recs2[1]["compressed_len"]]
    ) == chunks[1]


def test_damage_is_loud():
    data = b"the corpus shard " * 300
    frame = _cli(data, "-5")
    with pytest.raises(ValueError, match="magic"):
        decompress(b"ZZZZ" + frame[4:])
    with pytest.raises(ValueError, match="truncated|overread|consumed|corrupted|Huffman|FSE"):
        decompress(frame[:-9])
    # flip a payload byte: entropy decode breaks or the checksum lies
    broken = bytearray(frame)
    broken[len(frame) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decompress(bytes(broken))
    # dictionary frames are refused, not guessed: dictID flag 1 + id 7
    dict_frame = struct.pack("<I", 0xFD2FB528) + bytes([0x01, 7]) + b"\x01\x00\x00"
    with pytest.raises(ValueError, match="dictionary"):
        decompress(dict_frame)
    # reserved block type
    raw = compress_raw_frame(b"xyz")
    b2 = bytearray(raw)
    b2[13] |= 0x06  # block type bits -> 3 (reserved)
    with pytest.raises(ValueError, match="reserved block"):
        decompress(bytes(b2))


def test_seek_table_damage_is_loud():
    blob = write_seekable([b"one" * 100, b"two" * 100])
    with pytest.raises(ValueError, match="footer magic"):
        read_seek_table(blob[:-2] + b"ZZ", len(blob))
    broken = bytearray(blob)
    broken[-9] ^= 0x01  # frame count lie -> table length disagrees
    with pytest.raises(ValueError, match="seek"):
        read_seek_table(bytes(broken[-4096:]), len(broken))


def test_format_dictionary_frames(tmp_path):
    """RFC 8878 §5 format dictionaries: train a REAL dictionary with
    the reference CLI, decode its dictionary-keyed frames with the own
    decoder (entropy-table preload, rep offsets, window prefix), and
    demand loudness without the dictionary."""
    samples = []
    for i in range(50):
        doc = (
            b"WARC/1.1\r\nWARC-Target-URI: https://example.org/p/%d\r\n\r\n"
            % i
            + b" ".join(
                _RND.choice([b"alpha", b"beta", b"gamma", b"delta"])
                for _ in range(250)
            )
        )
        p = tmp_path / f"s{i:03d}.bin"
        p.write_bytes(doc)
        samples.append((str(p), doc))
    dict_path = str(tmp_path / "t.dict")
    subprocess.run(
        [_CLI, "--train", *[p for p, _ in samples], "-o", dict_path,
         "--maxdict=4096", "-q"],
        check=True,
        capture_output=True,
    )
    dict_data = open(dict_path, "rb").read()
    from etl_pipeline_old_spark.operators.zstd import parse_dictionary

    info = parse_dictionary(dict_data)
    assert info["id"] != 0 and len(info["content"]) > 0
    for p, doc in samples[:10]:
        comp = subprocess.run(
            [_CLI, "-q", "-D", dict_path, "-o", "/dev/stdout", p],
            capture_output=True,
            check=True,
        ).stdout
        assert decompress(comp, dict_data=dict_data) == doc
        with pytest.raises(ValueError, match="dictionary"):
            decompress(comp)
    # raw (content-only) dictionaries work too: the reference accepts
    # any file as a raw dict
    raw_dict = b"the quick brown fox jumps over the lazy dog " * 40
    payload = raw_dict[100:400] + b" new tail content " * 30
    rp = tmp_path / "payload.bin"
    rp.write_bytes(payload)
    rd = tmp_path / "raw.dict"
    rd.write_bytes(raw_dict)
    comp = subprocess.run(
        [_CLI, "-q", "-D", str(rd), "-o", "/dev/stdout", str(rp)],
        capture_output=True,
        check=True,
    ).stdout
    assert decompress(comp, dict_data=raw_dict) == payload
