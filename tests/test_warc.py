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


def _torn_shard():
    shard = encode_warc_shard(
        [("https://e.com/1", b"<p>a</p>", 200),
         ("https://e.com/2", b"<p>b</p>", 200),
         ("https://e.com/3", b"<p>c</p>", 200)],
        shard_id=5,
    )
    # locate the 3rd member (warcinfo + rec0 + REC1 + rec2) and flip its
    # middle byte: header intact, deflate/CRC broken
    offs = []
    i = 0
    while True:
        i = shard.find(b"\x1f\x8b\x08", i)
        if i == -1:
            break
        offs.append(i)
        i += 3
    assert len(offs) == 4
    torn = bytearray(shard)
    mid = offs[2] + (offs[3] - offs[2]) // 2
    torn[mid] ^= 0xFF
    return bytes(torn)


def test_lenient_walk_quarantines_one_member_and_resyncs():
    from etl_pipeline_old_spark.operators.warc import iter_warc_responses_lenient

    out = list(iter_warc_responses_lenient(_torn_shard()))
    oks = [(u, s, b) for u, s, b, e in out if e is None]
    errs = [e for _, _, _, e in out if e is not None]
    # records around the damage survive; exactly the torn one quarantined
    assert oks == [
        ("https://e.com/1", 200, b"<p>a</p>"),
        ("https://e.com/3", 200, b"<p>c</p>"),
    ]
    assert len(errs) == 1 and errs[0].startswith("gzip:")


def test_strict_walk_aborts_on_torn_member():
    with pytest.raises(Exception):
        list(iter_warc_responses(_torn_shard()))


def test_lenient_walk_equals_strict_on_clean_shard():
    from etl_pipeline_old_spark.operators.warc import iter_warc_responses_lenient

    shard = encode_warc_shard(
        [("https://e.com/1", b"<p>a</p>", 200),
         ("https://e.com/2", b"<p>b</p>", 404)],
        shard_id=0,
    )
    lenient = [(u, s, b) for u, s, b, e in iter_warc_responses_lenient(shard)]
    assert lenient == list(iter_warc_responses(shard))


def test_lenient_walk_corrupt_first_member_recovers_rest():
    from etl_pipeline_old_spark.operators.warc import iter_warc_responses_lenient

    shard = bytearray(
        encode_warc_shard([("https://e.com/9", b"<p>z</p>", 200)], shard_id=1)
    )
    shard[14] ^= 0xFF  # damage the warcinfo member's deflate stream
    # (offset 14 is past the 10-byte gzip header, inside the compressed
    # data; header bytes like XFL/OS would corrupt nothing)
    out = list(iter_warc_responses_lenient(bytes(shard)))
    assert [(u, s, b) for u, s, b, e in out if e is None] == [
        ("https://e.com/9", 200, b"<p>z</p>")
    ]
    assert sum(1 for *_, e in out if e is not None) == 1


# -- property: resync semantics under ARBITRARY single-byte corruption ------
#
# A flipped byte can be harmless (gzip mtime/OS fields), can kill one
# member, or can make zlib swallow bytes into a neighbor before failing.
# The honest invariants the lenient walk guarantees — and the ones the
# quarantine query's oracle relies on — are:
#   1. no fabrication: every ok record is one of the true records;
#   2. no duplication;
#   3. records from members strictly BEFORE the corrupted byte survive;
#   4. either the damage was harmless (all records recovered, no errors)
#      or at least one error row marks the quarantined span.

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_recs=st.integers(min_value=1, max_value=5),
    member_idx=st.integers(min_value=0, max_value=5),
    frac=st.floats(min_value=0.0, max_value=0.999),
    xor=st.integers(min_value=1, max_value=255),
)
# r14 driver counterexample: a flip near the tail of the LAST member
# removed the deflate end-of-stream code, so zlib returned partial output
# without error (CRC never checked) and the walk fabricated '<p>body 1</pg'.
@example(n_recs=2, member_idx=2, frac=0.953125, xor=9).via("discovered failure")
def test_lenient_walk_survives_arbitrary_corruption(n_recs, member_idx, frac, xor):
    from etl_pipeline_old_spark.operators.warc import iter_warc_responses_lenient

    truth = [
        (f"https://e.com/{k}", 200 if k % 3 else 404, f"<p>body {k}</p>".encode())
        for k in range(n_recs)
    ]
    shard = encode_warc_shard([(u, b, s) for u, s, b in truth], shard_id=7)
    offs = []
    i = 0
    while (i := shard.find(b"\x1f\x8b\x08", i)) != -1:
        offs.append(i)
        i += 3
    assert len(offs) == n_recs + 1  # warcinfo + responses
    member_idx %= len(offs)
    start = offs[member_idx]
    end = offs[member_idx + 1] if member_idx + 1 < len(offs) else len(shard)
    pos = start + int(frac * (end - start))
    torn = bytearray(shard)
    torn[pos] ^= xor

    out = list(iter_warc_responses_lenient(bytes(torn)))
    oks = [(u, s, b) for u, s, b, e in out if e is None]
    errs = [e for *_, e in out if e is not None]

    assert all(r in truth for r in oks)          # 1. no fabrication
    assert len(set(oks)) == len(oks)             # 2. no duplication
    n_before = max(0, member_idx - 1)            # responses before the damage
    assert oks[:n_before] == truth[:n_before]    # 3. prefix survives in order
    if not errs:
        assert oks == truth                      # 4. harmless or quarantined


# ---------------------------------------------------------------- r13:
# HTTP Content-Encoding (RFC 9110 §8.4) in the payload walk


def test_content_encoding_roundtrips_all_codings():
    import zlib

    from etl_pipeline_old_spark.operators.warc import (
        decode_content_encoding,
        encode_http_response,
        encode_warc_record,
        gzip_member,
        iter_warc_responses,
    )

    body = "<p>compressed &nbsp; body ж</p>".encode("utf-8") * 4
    for enc, header in ((None, None), ("gzip", "gzip"),
                        ("deflate", "deflate"), ("deflate-raw", "deflate")):
        resp = encode_http_response(body, content_encoding=enc)
        head, _, wire = resp.partition(b"\r\n\r\n")
        if header is None:
            assert b"Content-Encoding" not in head and wire == body
        else:
            assert f"Content-Encoding: {header}".encode() in head
            assert wire != body  # actually compressed on the wire
            assert decode_content_encoding(wire, header) == body
        # the strict walk yields the DECODED representation
        rec = encode_warc_record(
            "response",
            {"WARC-Target-URI": "https://e.com/1"},
            resp,
        )
        got = list(iter_warc_responses(gzip_member(rec)))
        assert got == [("https://e.com/1", 200, body)]
    # raw-deflate fallback is really exercised: the zlib path must fail
    raw = encode_http_response(body, content_encoding="deflate-raw")
    wire = raw.partition(b"\r\n\r\n")[2]
    with pytest.raises(zlib.error):
        zlib.decompress(wire)


def test_content_encoding_loud_and_quarantined_classes():
    import zlib

    from etl_pipeline_old_spark.operators.warc import (
        decode_content_encoding,
        encode_http_response,
        encode_warc_record,
        gzip_member,
        iter_warc_responses,
        iter_warc_responses_encoded,
    )

    body = b"<p>page</p>" * 8
    torn = zlib.compress(body, 6)[:-6]
    recs = []
    for uri, resp in (
        ("https://e.com/ok", encode_http_response(body, content_encoding="gzip")),
        ("https://e.com/br", encode_http_response(body, content_encoding="br")),
        ("https://e.com/torn",
         encode_http_response(torn, content_encoding="verbatim:deflate")),
    ):
        recs.append(gzip_member(encode_warc_record(
            "response", {"WARC-Target-URI": uri}, resp)))
    shard = b"".join(recs)
    # strict walk aborts on the first undecodable body
    with pytest.raises(NotImplementedError, match="content-encoding 'br'"):
        list(iter_warc_responses(shard))
    # torn deflate surfaces as the documented ValueError, not zlib.error
    with pytest.raises(ValueError, match="content-encoding deflate"):
        decode_content_encoding(torn, "deflate")
    # the encoded walk quarantines per record and KEEPS uri + status
    out = list(iter_warc_responses_encoded(shard))
    assert out[0] == ("https://e.com/ok", 200, "", "gzip", body, None)
    assert out[1][:4] == ("https://e.com/br", 200, "", "br")
    assert out[1][4] is None and "external codec" in out[1][5]
    assert out[2][:4] == ("https://e.com/torn", 200, "", "deflate")
    assert out[2][4] is None and "content-encoding deflate" in out[2][5]


def test_encoded_walk_quarantines_garbage_http_head():
    """Intact WARC framing around an unparsable HTTP head costs ONE
    record (uri kept, status 0), never the shard walk (r13 ADVICE)."""
    from etl_pipeline_old_spark.operators.warc import (
        encode_http_response,
        encode_warc_record,
        gzip_member,
        iter_warc_responses_encoded,
    )

    body = b"<p>fine</p>" * 5
    shard = b"".join(
        gzip_member(encode_warc_record(
            "response", {"WARC-Target-URI": uri}, payload))
        for uri, payload in (
            ("https://e.com/a", encode_http_response(body)),
            # a bare status token: split()[1] would IndexError
            ("https://e.com/headless", b"HTTP/1.1\r\n\r\nstuff"),
            # not HTTP at all (e.g. a mislabeled gemini response)
            ("https://e.com/alien", b"20 text/gemini\r\nhello"),
            # non-integer status code
            ("https://e.com/nan", b"HTTP/1.1 OK\r\n\r\nbody"),
            ("https://e.com/b", encode_http_response(body)),
        )
    )
    out = list(iter_warc_responses_encoded(shard))
    assert [r[0] for r in out] == [
        "https://e.com/a", "https://e.com/headless",
        "https://e.com/alien", "https://e.com/nan", "https://e.com/b",
    ]
    assert out[0][4] == body and out[-1][4] == body
    for bad in out[1:4]:
        assert bad[1] == 0 and bad[4] is None
        assert "http head unparsable" in bad[5]


def test_chunked_transfer_encoding_roundtrip_and_composition():
    import zlib

    from etl_pipeline_old_spark.operators.warc import (
        decode_chunked,
        encode_chunked,
        encode_http_response,
        encode_warc_record,
        gzip_member,
        iter_warc_responses,
    )

    body = "<p>длинное тело страницы &nbsp; " .encode("utf-8") * 9
    wire = encode_chunked(body, seed=3)
    assert wire != body and b";x=1" in wire and b"X-Trailer" in wire
    assert decode_chunked(wire) == body
    # chunked OVER gzip: TE wraps the content coding (RFC 9110 order)
    resp = encode_http_response(body, content_encoding="gzip", chunked=True)
    head, _, rest = resp.partition(b"\r\n\r\n")
    assert b"Transfer-Encoding: chunked" in head
    assert b"Content-Length" not in head  # RFC 9112 §6.2
    assert zlib.decompress(decode_chunked(rest), 16 + zlib.MAX_WBITS) == body
    # the strict walk decodes both layers transparently
    rec = encode_warc_record(
        "response", {"WARC-Target-URI": "https://e.com/c"}, resp)
    assert list(iter_warc_responses(gzip_member(rec))) == [
        ("https://e.com/c", 200, body)
    ]


def test_chunked_torn_framing_is_loud_and_quarantined():
    import pytest as _pt

    from etl_pipeline_old_spark.operators.warc import (
        decode_chunked,
        encode_chunked,
        encode_http_response,
        encode_warc_record,
        gzip_member,
        iter_warc_responses_encoded,
    )

    body = b"<p>page body</p>" * 12
    wire = encode_chunked(body)
    with _pt.raises(ValueError, match="truncated|not terminated"):
        decode_chunked(wire[: len(wire) // 2])
    with _pt.raises(ValueError, match="bad chunk size"):
        decode_chunked(b"zz\r\nxx\r\n0\r\n\r\n")
    with _pt.raises(ValueError, match="CRLF-terminated"):
        decode_chunked(b"3\r\nabcXX0\r\n\r\n")
    # per-record quarantine with URI preserved through the encoded walk
    good = encode_http_response(body, chunked=True)
    head, _, rest = good.partition(b"\r\n\r\n")
    torn = head + b"\r\n\r\n" + rest[: len(rest) // 2]
    shard = gzip_member(encode_warc_record(
        "response", {"WARC-Target-URI": "https://e.com/torn"}, torn))
    (uri, status, te, ce, got, err), = iter_warc_responses_encoded(shard)
    assert (uri, te, got) == ("https://e.com/torn", "chunked", None)
    assert "chunked" in err


def test_revisit_records_roundtrip_and_typed_walk():
    """WARC 1.1 identical-payload-digest revisits: bodyless records
    carrying the shared digest + the referred capture's URI, surfaced
    by iter_warc_captures beside the responses they deduplicate."""
    from etl_pipeline_old_spark.operators.warc import (
        encode_http_response,
        encode_warc_record,
        encode_warc_revisit,
        gzip_member,
        iter_warc_captures,
    )

    body = "страница <b>x</b> ".encode("utf-8") * 9
    import base64
    import hashlib

    digest = base64.b32encode(hashlib.sha1(body).digest()).decode()
    shard = b"".join(
        [
            gzip_member(encode_warc_record(
                "warcinfo", {"WARC-Filename": "t.warc.gz"}, b"x\r\n")),
            gzip_member(encode_warc_record(
                "response",
                {"WARC-Target-URI": "https://e.com/a",
                 "WARC-Payload-Digest": f"sha1:{digest}"},
                encode_http_response(body))),
            gzip_member(encode_warc_revisit(
                "https://e.com/a?again", "https://e.com/a", digest)),
        ]
    )
    got = list(iter_warc_captures(shard))
    assert [g[0] for g in got] == ["response", "revisit"]  # warcinfo skipped
    rtype, uri, d0, refers, rbody = got[0]
    assert (uri, d0, refers, rbody) == ("https://e.com/a", digest, "", body)
    rtype, uri, d1, refers, rbody = got[1]
    assert (uri, d1, refers, rbody) == (
        "https://e.com/a?again", digest, "https://e.com/a", None,
    )
    # the revisit record is tiny and bodyless — the dedup point
    assert len(gzip_member(encode_warc_revisit("u", "v", digest))) < 400
    # framing stays strict
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_captures(
            encode_warc_record(
                "response", {"WARC-Target-URI": "u"},
                encode_http_response(body))[:-30]
        ))
