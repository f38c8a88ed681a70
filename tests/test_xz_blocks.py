"""xz multi-block container (operators/xz.py): the whole staged stream
is CROSS-VALIDATED against the independent stdlib lzma decoder (the
strong pin none of the spec-only codecs get), per-block range decodes
match the index walk, and the damage classes are loud."""

from __future__ import annotations

import lzma
import random
import struct

import pytest

from etl_pipeline_old_spark.operators.xz import (
    decode_xz_block,
    read_xz_index,
    write_xz_blocks,
)

_RND = random.Random(20260816)


def test_container_cross_validates_against_stdlib():
    payloads = [
        b"alpha block " * 40,
        "блок два ".encode("utf-8") * 30,
        b"\x00" * 999,
        _RND.randbytes(5000),
        b"",
    ]
    blob = write_xz_blocks(payloads)
    # the INDEPENDENT implementation reads the own writer's container
    assert lzma.decompress(blob) == b"".join(payloads)
    idx = read_xz_index(blob[-4096:], len(blob))
    assert [r["uncompressed_len"] for r in idx] == [
        len(p) for p in payloads
    ]
    for rec, want in zip(idx, payloads):
        block = blob[rec["offset"] : rec["offset"] + rec["compressed_len"]]
        assert decode_xz_block(block) == want


def test_index_from_tail_only():
    payloads = [_RND.randbytes(2000) for _ in range(8)]
    blob = write_xz_blocks(payloads)
    # a 64-byte tail is plenty for 8 records — the 100 TB point
    tail = blob[-96:]
    idx = read_xz_index(tail, len(blob))
    assert len(idx) == 8
    assert decode_xz_block(
        blob[idx[5]["offset"] : idx[5]["offset"] + idx[5]["compressed_len"]]
    ) == payloads[5]


def test_torn_blocks_and_loud_damage():
    payloads = [b"block %d " % k * 50 for k in range(6)]
    blob = write_xz_blocks(payloads, truncate_blocks={2, 5})
    idx = read_xz_index(blob[-600:], len(blob))
    for k, rec in enumerate(idx):
        block = blob[rec["offset"] : rec["offset"] + rec["compressed_len"]]
        if k in (2, 5):
            with pytest.raises(ValueError, match="damaged"):
                decode_xz_block(block)
        else:
            assert decode_xz_block(block) == payloads[k]
    # footer magic lie
    with pytest.raises(ValueError, match="footer magic"):
        read_xz_index(blob[:-2] + b"ZZ", len(blob))
    # index CRC lie
    broken = bytearray(blob)
    broken[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        read_xz_index(bytes(broken[-600:]), len(broken))
    # block-header CRC lie
    good = write_xz_blocks([b"x" * 100])
    rec = read_xz_index(good[-200:], len(good))[0]
    b2 = bytearray(good)
    b2[rec["offset"] + 2] ^= 0x01
    with pytest.raises(ValueError, match="header CRC"):
        decode_xz_block(
            bytes(b2[rec["offset"] : rec["offset"] + rec["compressed_len"]])
        )
    # an index that disagrees with the file length
    with pytest.raises(ValueError, match="file length"):
        read_xz_index(good[-200:], len(good) + 4)


def test_varints_roundtrip():
    from etl_pipeline_old_spark.operators.xz import _read_varint, _varint

    for n in (0, 1, 127, 128, 300, 2 ** 20, 2 ** 35):
        enc = _varint(n)
        got, at = _read_varint(enc, 0)
        assert (got, at) == (n, len(enc))
    with pytest.raises(ValueError, match="varint"):
        _read_varint(b"\xff\xff", 0)
