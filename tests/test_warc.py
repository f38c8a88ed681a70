"""WARC container tests: the reader is exercised against HAND-WRITTEN
record bytes (independent of our writer), the writer round-trips through
the reader, the gzip member walk splits a real multi-member shard, and
the strict-framing paths (truncated payload, non-WARC member) raise."""

from __future__ import annotations

import gzip

import pytest

from etl_pipeline_old_spark.operators.warc import (
    encode_warc_record,
    encode_warc_shard,
    gzip_member,
    iter_warc_responses,
    split_gzip_members,
)

# A response record written BY HAND per ISO 28500 (payload is a full
# HTTP/1.1 response whose body contains 'WARC/1.0' as plain text — the
# record-splitting trap for naive delimiter scans).
HAND_BODY = b"<p>mentioning WARC/1.0 in text</p>"
HAND_HTTP = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    b"Content-Length: " + str(len(HAND_BODY)).encode() + b"\r\n\r\n" + HAND_BODY
)
HAND_RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Record-ID: <urn:uuid:hand-1>\r\n"
    b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
    b"WARC-Target-URI: https://h.example.com/x\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"Content-Length: " + str(len(HAND_HTTP)).encode() + b"\r\n\r\n"
    + HAND_HTTP + b"\r\n\r\n"
)


def test_hand_written_record_parses():
    out = list(iter_warc_responses(HAND_RECORD))
    assert out == [("https://h.example.com/x", 200, HAND_BODY)]


def test_plain_split_survives_warc_magic_in_body():
    # two concatenated uncompressed records; body text contains 'WARC/1.0'
    blob = HAND_RECORD + HAND_RECORD
    assert len(list(iter_warc_responses(blob))) == 2


def test_gzip_members_split_one_per_record():
    shard = encode_warc_shard(
        [("https://e.com/1", b"<p>a</p>", 200),
         ("https://e.com/2", b"<p>b</p>", 404)],
        shard_id=9,
    )
    members = list(split_gzip_members(shard))
    assert len(members) == 3  # warcinfo + 2 responses
    assert all(m.startswith(b"WARC/1.0") for m in members)
    # stdlib gzip agrees on the concatenated plaintext
    assert gzip.decompress(shard) == b"".join(members)


def test_shard_roundtrip_skips_warcinfo_and_keeps_status():
    shard = encode_warc_shard(
        [("https://e.com/1", b"<p>a</p>", 200),
         ("https://e.com/2", b"<p>b</p>", 404)],
        shard_id=0,
    )
    out = list(iter_warc_responses(shard))
    assert out == [
        ("https://e.com/1", 200, b"<p>a</p>"),
        ("https://e.com/2", 404, b"<p>b</p>"),
    ]


def test_shard_bytes_are_deterministic():
    recs = [("https://e.com/1", b"<p>a</p>", 200)]
    assert encode_warc_shard(recs, 3) == encode_warc_shard(recs, 3)


def test_truncated_payload_raises():
    torn = HAND_RECORD[: len(HAND_RECORD) - 20]
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_responses(torn))


def test_non_warc_gzip_member_raises():
    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_responses(gzip_member(b"PK\x03\x04 not warc")))


def test_encode_record_framing():
    rec = encode_warc_record("metadata", {"WARC-Record-ID": "<urn:uuid:m>"}, b"xy")
    assert rec.endswith(b"Content-Length: 2\r\n\r\nxy\r\n\r\n")
    # non-response records are skipped by the response iterator
    assert list(iter_warc_responses(rec)) == []
