"""TFRecord codec (operators/tfrecord.py): crc32c against the
RFC 3720 §B.4 SPEC-PRINTED vectors (the gold-standard pin class),
masked framing roundtrip, tf.Example wire shapes, and the two damage
classes (skippable data-crc lie vs loud length-crc lie)."""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_old_spark.operators.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    iter_tfrecords,
    masked_crc32c,
    write_tfrecords,
)


def test_crc32c_rfc3720_vectors():
    # RFC 3720 §B.4 prints these four 32-byte vectors
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(bytes(range(31, -1, -1))) == 0x113FDB5C
    # the classic CRC catalogue check value
    assert crc32c(b"123456789") == 0xE3069283


def test_masking_is_the_published_scheme():
    crc = crc32c(b"abc")
    want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"abc") == want


def test_example_roundtrip():
    ex = encode_example(
        {
            "text": "привет мир",
            "doc_id": [42, -7],
            "emb": [1.5, -2.25, 0.0],
        }
    )
    dec = decode_example(ex)
    assert dec["text"] == ("bytes", ["привет мир".encode()])
    assert dec["doc_id"] == ("int64", [42, -7])
    assert dec["emb"] == ("float", [1.5, -2.25, 0.0])


def test_framing_roundtrip_and_damage_classes():
    ex = encode_example({"text": "x" * 100})
    blob = write_tfrecords([ex, b"raw", b""])
    assert list(iter_tfrecords(blob)) == [ex, b"raw", b""]
    # data-crc lie: one None slot, rest of the shard survives
    b2 = bytearray(blob)
    b2[12 + len(ex) // 2] ^= 0xFF
    got = list(iter_tfrecords(bytes(b2)))
    assert got[0] is None and got[1:] == [b"raw", b""]
    # length-crc lie: framing is unrecoverable, loud
    b3 = bytearray(blob)
    b3[2] ^= 0xFF
    with pytest.raises(ValueError, match="length crc"):
        list(iter_tfrecords(bytes(b3)))
    # truncation mid-payload
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(blob[: 12 + len(ex) - 3]))


def test_unpacked_repeated_scalars_decode_too():
    # proto3 writers may emit unpacked repeated fields — build an
    # Int64List with one unpacked varint by hand (field 1, WT_VARINT)
    ilist = bytes([0x08, 0x2A])  # field 1 varint 42
    feat = bytes([0x1A, len(ilist)]) + ilist  # Feature.int64_list (3)
    entry = (
        bytes([0x0A, 1]) + b"k" + bytes([0x12, len(feat)]) + feat
    )  # name, value
    feats = bytes([0x0A, len(entry)]) + entry
    ex = bytes([0x0A, len(feats)]) + feats
    assert decode_example(ex)["k"] == ("int64", [42])
