"""BSON codec (operators/bson.py): spec-pinned roundtrips across the
implemented type surface plus the loud damage classes.  No independent
BSON implementation exists in this container (no pymongo), so — like
FLAC and VP8L — these spec-derived fixtures are the conformance pin."""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_old_spark.operators.bson import (
    read_bson_shard,
    write_bson_document,
    write_bson_shard,
)

_DOC = {
    "_id": bytes(range(12)),
    "title": "Привет мир",
    "n": 42,
    "big": 2 ** 40,
    "score": -2.25,
    "ok": True,
    "missing": None,
    "created": ("datetime_ms", 1767225600000),
    "optime": ("timestamp", (1 << 33) + 7),
    "blob": (0, b"\x00\x01\xfe"),
    "tags": ["a", "b", 3],
    "nested": {"x": 1, "deep": {"y": "z"}},
}


def test_roundtrip_all_types():
    shard = write_bson_shard([_DOC, {"n": 1}])
    docs = read_bson_shard(shard)
    assert docs == [_DOC, {"n": 1}]
    assert isinstance(docs[0]["n"], int) and not isinstance(
        docs[0]["ok"], int
    ) or docs[0]["ok"] is True


def test_int_width_routing():
    shard = write_bson_shard([{"a": 2 ** 31 - 1, "b": 2 ** 31}])
    raw = shard
    assert b"\x10a\x00" in raw  # int32 element
    assert b"\x12b\x00" in raw  # int64 element
    assert read_bson_shard(shard)[0] == {"a": 2 ** 31 - 1, "b": 2 ** 31}


def test_empty_document_and_shard():
    assert write_bson_document({}) == b"\x05\x00\x00\x00\x00"
    assert read_bson_shard(b"") == []
    assert read_bson_shard(write_bson_shard([{}])) == [{}]


def test_document_length_lie_is_loud():
    shard = bytearray(write_bson_shard([{"a": 1}]))
    shard[0] += 4  # longer than reality
    with pytest.raises(ValueError, match="out of range|terminator"):
        read_bson_shard(bytes(shard))
    shard[0] -= 8  # shorter: terminator lands mid-element
    with pytest.raises(ValueError, match="terminator|out of range"):
        read_bson_shard(bytes(shard))


def test_string_length_overrun_is_loud():
    shard = bytearray(write_bson_shard([{"s": "abc"}]))
    at = shard.index(b"\x02s\x00") + 3
    struct.pack_into("<i", shard, at, 1000)
    with pytest.raises(ValueError, match="string length"):
        read_bson_shard(bytes(shard))


def test_unterminated_name_is_loud():
    doc = write_bson_document({"ab": 1})
    broken = doc.replace(b"ab\x00", b"ab\x01", 1)
    with pytest.raises(ValueError,
                       match="unterminated|type 0x|truncated value"):
        read_bson_shard(broken)


def test_unknown_type_is_loud():
    doc = bytearray(write_bson_document({"a": 1}))
    doc[4] = 0x13  # decimal128: deliberately unimplemented
    with pytest.raises(ValueError, match="0x13 not implemented"):
        read_bson_shard(bytes(doc))


def test_nesting_bomb_is_loud():
    v: dict = {"x": 1}
    for _ in range(100):
        v = {"d": v}
    with pytest.raises(ValueError, match="nesting too deep"):
        write_bson_document(v)
    # a hand-built deep READ bomb: 80 nested empty documents
    inner = b"\x05\x00\x00\x00\x00"
    for _ in range(80):
        body = b"\x03d\x00" + inner
        inner = struct.pack("<i", len(body) + 5) + body + b"\x00"
    with pytest.raises(ValueError, match="nesting too deep"):
        read_bson_shard(inner)


def test_sparse_array_keys_are_loud():
    arr_body = bytearray()
    # array document with keys "0" and "2" (gap at 1)
    for k in ("0", "2"):
        arr_body += b"\x10" + k.encode() + b"\x00" + struct.pack("<i", 5)
    arr = struct.pack("<i", len(arr_body) + 5) + bytes(arr_body) + b"\x00"
    body = b"\x04a\x00" + arr
    doc = struct.pack("<i", len(body) + 5) + body + b"\x00"
    with pytest.raises(ValueError, match="not dense"):
        read_bson_shard(doc)


def test_trailing_garbage_is_loud():
    shard = write_bson_shard([{"a": 1}]) + b"\x02\x00"
    with pytest.raises(ValueError, match="truncated|out of range"):
        read_bson_shard(shard)


def test_boolean_byte_validation():
    doc = bytearray(write_bson_document({"b": True}))
    doc[doc.index(b"\x08b\x00") + 3] = 7
    with pytest.raises(ValueError, match="boolean byte"):
        read_bson_shard(bytes(doc))


def test_torn_binary_subtype_is_valueerror_not_indexerror():
    """A shard torn exactly after a binary element's int32 length (the
    subtype byte missing) used to escape as IndexError, failing the
    whole Spark task instead of quarantining one record.  The walk must
    surface every torn-fixed-width read as the documented ValueError."""
    # [total=12][0x05]["ab\x00"][int32 n=3] — terminator check passes
    # (the int32's high byte is 0x00 at index 11), the subtype read at
    # index 12 is past the buffer.
    blob = struct.pack("<i", 12) + b"\x05" + b"ab\x00" + struct.pack("<i", 3)
    with pytest.raises(ValueError, match="truncated value"):
        read_bson_shard(blob)
