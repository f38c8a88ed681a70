"""PDF standard security handler — operators/pdf_crypt.py + the
pdf.py integration.

RC4 is pinned against the PUBLISHED RFC 6229 test vectors (the
independent cross-check available without another PDF library); the
handler algorithms are exercised end-to-end through write_pdf_encrypted
round-trips, password authentication, and tamper loudness.
"""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.operators.pdf import (
    extract_pdf_text,
    write_pdf_encrypted,
)
from etl_pipeline_old_spark.operators.pdf_crypt import (
    check_user_password,
    compute_o,
    compute_u,
    file_key,
    object_key,
    rc4,
)

_PAGES = [["secret line one", "вторая строка"], ["page two"]]


def test_rc4_published_vectors():
    # the classic published RC4 vectors (original cypherpunks posting,
    # reproduced across the public literature) — the independent
    # cross-check available without another PDF/crypto library
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert (
        rc4(b"Secret", b"Attack at dawn").hex().upper()
        == "45A01F645FC35B383552544B9BF5"
    )


def test_rc4_is_an_involution():
    key, msg = b"k3y", bytes(range(200))
    assert rc4(key, rc4(key, msg)) == msg


@pytest.mark.parametrize("rev", [2, 3])
@pytest.mark.parametrize("compress", [False, True])
def test_encrypted_roundtrip(rev, compress):
    pdf = write_pdf_encrypted(_PAGES, rev=rev, compress=compress)
    assert b"/Encrypt" in pdf and b"secret line one" not in pdf
    assert extract_pdf_text(pdf) == _PAGES


def test_user_password_authentication():
    pdf = write_pdf_encrypted(_PAGES, user_pw=b"hunter2", rev=3)
    assert extract_pdf_text(pdf, password=b"hunter2") == _PAGES
    with pytest.raises(ValueError, match="wrong user password"):
        extract_pdf_text(pdf)  # empty password must NOT open this one
    with pytest.raises(ValueError, match="wrong user password"):
        extract_pdf_text(pdf, password=b"hunter3")


def test_tampered_u_is_loud():
    pdf = bytearray(write_pdf_encrypted(_PAGES))
    at = pdf.find(b"/U <") + 4
    pdf[at : at + 2] = b"00" if pdf[at : at + 2] != b"00" else b"11"
    with pytest.raises(ValueError, match="wrong user password"):
        extract_pdf_text(bytes(pdf))


def test_aes_era_is_documented_seam():
    pdf = bytearray(write_pdf_encrypted(_PAGES, rev=3))
    at = pdf.find(b"/V 2")
    pdf[at : at + 4] = b"/V 4"
    with pytest.raises(NotImplementedError, match="AES era"):
        extract_pdf_text(bytes(pdf))


def test_algorithms_compose():
    # the handler identities the spec implies: the key derived from the
    # user password authenticates against U; per-object keys differ by
    # object and never exceed 16 bytes
    o = compute_o(b"", b"own", 3, 16)
    fid = bytes(range(16))
    key = file_key(b"", o, -44, fid, 3, 16)
    u = compute_u(key, fid, 3)
    assert check_user_password(b"", o, u, -44, fid, 3, 16) == key
    k1, k2 = object_key(key, 5), object_key(key, 6)
    assert k1 != k2 and len(k1) == 16


def test_rev2_40bit_key_length():
    o = compute_o(b"", b"own", 2, 5)
    key = file_key(b"", o, -44, bytes(16), 2, 5)
    assert len(key) == 5
    assert len(object_key(key, 7)) == 10  # n + 5
