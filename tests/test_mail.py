"""Email codec (operators/mail.py): QP fuzz vs CPython quopri,
encoded-word semantics, multipart walking, mbox framing, and
cross-validation against the stdlib email package."""

from __future__ import annotations

import email
import email.header
import hashlib
import quopri

import pytest

from etl_pipeline_old_spark.operators.mail import (
    decode_header_value, parse_message, qp_decode, qp_encode, split_mbox,
    write_mbox, write_message,
)

_TEXT = "Привет, мир!\nline two with trailing space \nASCII tail"


def test_plain_message_roundtrip():
    raw = write_message("Тема письма", "Отправитель", _TEXT)
    msg = parse_message(raw)
    assert msg["headers"]["subject"] == "Тема письма"
    assert msg["headers"]["from"].startswith("Отправитель")
    assert len(msg["parts"]) == 1
    assert msg["parts"][0]["text"] == _TEXT


def test_multipart_alternative_with_preamble_epilogue():
    raw = write_message("multi", "s", _TEXT, html="<p>Привет</p>")
    msg = parse_message(raw)
    assert [p["media"] for p in msg["parts"]] == ["text/plain", "text/html"]
    assert msg["parts"][0]["text"] == _TEXT
    assert msg["parts"][1]["text"].rstrip("\n") == "<p>Привет</p>"
    assert b"preamble" in raw and b"epilogue" in raw  # both discarded


@pytest.mark.parametrize("charset", ["utf-8", "cp1251"])
def test_stdlib_email_cross_validation(charset):
    """CPython's independent parser must agree on body bytes and the
    decoded subject for both message shapes."""
    body = "Привет по-русски\nвторая строка"
    for raw in (
        write_message("тема", "s", body, charset=charset),
        write_message("тема", "s", body, html="<p>x</p>", charset=charset),
    ):
        ours = parse_message(raw)
        m = email.message_from_bytes(raw)
        part = m.get_payload(0) if m.is_multipart() else m
        got = part.get_payload(decode=True).decode(charset)
        assert got.replace("\r\n", "\n").rstrip("\n") == body
        subj = email.header.decode_header(m["Subject"])
        dec = "".join(
            s.decode(c or "ascii") if isinstance(s, bytes) else s
            for s, c in subj
        )
        assert dec == ours["headers"]["subject"] == "тема"


def test_qp_fuzz_against_quopri():
    for i in range(40):
        data = hashlib.sha256(str(i).encode()).digest() * (i % 5 + 1)
        data = bytes(b if b not in (0x0A, 0x0D) else 0x41 for b in data)
        enc = qp_encode(data)
        assert qp_decode(enc) == data
        assert quopri.decodestring(enc) == data
        assert qp_decode(quopri.encodestring(data)) == data
    # newlines are text, not bytes: they canonicalize to CRLF
    assert qp_decode(qp_encode(b"a\nb")) == b"a\r\nb"


def test_qp_line_length_limit():
    enc = qp_encode(bytes([0xD0, 0xBF]) * 100)
    assert all(len(ln) <= 76 for ln in enc.split(b"\r\n"))


def test_encoded_word_semantics():
    # adjacent encoded-words join WITHOUT the whitespace between them
    v = "=?utf-8?B?0J/RgNC40LI=?= =?utf-8?B?0LXRgg==?="
    assert decode_header_value(v) == "Привет"
    # Q-encoding: underscore is space, =XX escapes apply
    assert decode_header_value("=?utf-8?Q?a_b=3D?=") == "a b="
    # non-adjacent text keeps its spacing
    assert decode_header_value("x =?utf-8?B?0J8=?= y") == "x П y"


def test_header_folding_unfolds():
    raw = (
        b"Subject: part one\r\n continued here\r\n"
        b"X-Other: v\r\n\r\nbody"
    )
    msg = parse_message(raw)
    assert msg["headers"]["subject"] == "part one continued here"


def test_mbox_roundtrip_with_from_stuffing():
    m1 = write_message("a", "s", "From the start\nbody")
    m2 = b"Subject: x\r\n\r\nFrom here too\n>From quoted\n"
    shard = write_mbox([m1, m2])
    back = split_mbox(shard)
    assert len(back) == 2
    assert parse_message(back[0])["parts"][0]["text"] == (
        "From the start\nbody"
    )
    assert b"From here too" in back[1] and b">From quoted" in back[1]


def test_loud_failures():
    with pytest.raises(ValueError, match="terminal boundary"):
        parse_message(
            b"Content-Type: multipart/mixed; boundary=b\n\n"
            b"--b\nSubject: y\n\npart"
        )
    with pytest.raises(ValueError, match="malformed QP"):
        qp_decode(b"=ZZ")
    with pytest.raises(ValueError, match="encoded-word"):
        decode_header_value("=?utf-8?B?*bad*?=")
    with pytest.raises(ValueError, match="separator"):
        parse_message(b"Subject: x")
    with pytest.raises(ValueError, match="From_"):
        split_mbox(b"not an mbox")
    with pytest.raises(ValueError, match="transfer encoding"):
        parse_message(
            b"Content-Transfer-Encoding: uuencode\r\n\r\nbody"
        )
