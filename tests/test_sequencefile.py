"""Hadoop SequenceFile codec (operators/sequencefile.py): every staged
byte comes from the JVM reference implementation (Spark's
saveAsSequenceFile on the live session) across uncompressed,
block-DefaultCodec, block-Snappy and block-Gzip layouts; the
record-compressed layout and the damage classes ride hand-built
spec-shape fixtures."""

from __future__ import annotations

import glob
import os
import struct
import zlib

import pytest

from etl_pipeline_old_spark.operators.sequencefile import (
    iter_records,
    read_header,
    read_vint,
)


def _check_dir(path: str, want: dict) -> dict:
    got = {}
    hdr = None
    for f in sorted(glob.glob(os.path.join(path, "part-*"))):
        blob = open(f, "rb").read()
        hdr = read_header(blob)
        for k, v in iter_records(blob):
            got[k.decode()] = v.decode()
    assert got == want
    return hdr


def test_jvm_written_layouts_decode(spark, tmp_path):
    data = [(f"key{i}", f"value {i} слово " * (i % 7 + 1)) for i in range(300)]
    want = dict(data)
    rdd = spark.sparkContext.parallelize(data, 3)
    p1 = str(tmp_path / "plain")
    rdd.saveAsSequenceFile(p1)
    hdr = _check_dir(p1, want)
    assert not hdr["compressed"] and not hdr["block"]
    for codec, label in (
        ("org.apache.hadoop.io.compress.DefaultCodec", "z"),
        ("org.apache.hadoop.io.compress.SnappyCodec", "s"),
        ("org.apache.hadoop.io.compress.GzipCodec", "g"),
        ("org.apache.hadoop.io.compress.BZip2Codec", "b"),
    ):
        p = str(tmp_path / label)
        rdd.saveAsSequenceFile(p, compressionCodecClass=codec)
        hdr = _check_dir(p, want)
        assert hdr["block"] and hdr["codec"] == codec


def _own_record_file(records, codec=None, record_compress=False) -> bytes:
    """A hand-built spec-shape fixture: record layout, optional
    per-record DefaultCodec value compression, a mid-stream sync."""
    def text(b: bytes) -> bytes:
        assert len(b) < 112
        return bytes([len(b)]) + b

    sync = bytes(range(16))
    out = bytearray(b"SEQ\x06")
    out += text(b"org.apache.hadoop.io.Text")
    out += text(b"org.apache.hadoop.io.Text")
    out += bytes([1 if record_compress else 0, 0])
    if record_compress:
        out += text(codec.encode())
    out += struct.pack("<I", 0)
    out += sync
    for i, (k, v) in enumerate(records):
        kb = text(k.encode())
        vb = text(v.encode())
        if record_compress:
            vb = zlib.compress(vb)
        if i == len(records) // 2:
            out += struct.pack(">I", 0xFFFFFFFF) + sync
        out += struct.pack(">II", len(kb) + len(vb), len(kb))
        out += kb + vb
    return bytes(out)


def test_record_compressed_layout_and_sync():
    records = [(f"k{i}", f"v{i} data") for i in range(20)]
    blob = _own_record_file(
        records,
        codec="org.apache.hadoop.io.compress.DefaultCodec",
        record_compress=True,
    )
    got = [(k.decode(), v.decode()) for k, v in iter_records(blob)]
    assert got == records
    plain = _own_record_file(records)
    assert [(k.decode(), v.decode()) for k, v in iter_records(plain)] == records


def test_vints_match_writable_utils():
    # WritableUtils encodings: inline, multi-byte positive, negative
    assert read_vint(bytes([42]), 0) == (42, 1)
    assert read_vint(bytes([0x90]), 0) == (-112, 1)  # inline floor
    assert read_vint(bytes([0x8F, 0x7F]), 0) == (127, 2)  # 1-byte magnitude
    assert read_vint(bytes([0x8E, 0x01, 0x00]), 0) == (256, 3)
    assert read_vint(bytes([0x86, 0x01, 0x00]), 0) == (~256, 3)


def test_damage_is_loud():
    records = [("k", "v")]
    blob = bytearray(_own_record_file(records))
    with pytest.raises(ValueError, match="magic"):
        list(iter_records(b"NOTSEQ" + bytes(blob)[6:]))
    with pytest.raises(NotImplementedError, match="version"):
        list(iter_records(b"SEQ\x05" + bytes(blob)[4:]))
    torn = bytes(blob)[:-3]
    with pytest.raises(ValueError, match="truncated"):
        list(iter_records(torn))
    # sync marker lie after the escape
    sync_blob = bytearray(
        _own_record_file([(f"k{i}", "v") for i in range(10)])
    )
    at = sync_blob.find(struct.pack(">I", 0xFFFFFFFF))
    sync_blob[at + 4] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        list(iter_records(bytes(sync_blob)))
