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


def test_inconsistent_v_r_combo_is_loud():
    # /V 4 with /R 3 is a malformed combination (and has no /CF) — the
    # reader refuses rather than guessing a cipher
    pdf = bytearray(write_pdf_encrypted(_PAGES, rev=3))
    at = pdf.find(b"/V 2")
    pdf[at : at + 4] = b"/V 4"
    with pytest.raises(NotImplementedError, match="crypt filter|V=4"):
        extract_pdf_text(bytes(pdf))


# ------------------------------------------------------- AES handlers
def test_aesv2_roundtrip_and_per_object_keys():
    from etl_pipeline_old_spark.operators.pdf_crypt import object_key_aes

    for compress in (False, True):
        pdf = write_pdf_encrypted(_PAGES, rev=4, compress=compress)
        assert b"/AESV2" in pdf and b"/V 4" in pdf
        assert extract_pdf_text(pdf) == _PAGES
    key = bytes(range(16))
    k5, k6 = object_key_aes(key, 5), object_key_aes(key, 6)
    assert k5 != k6 and len(k5) == 16
    # the sAlT suffix makes the AES object key differ from the RC4 one
    assert k5 != object_key(key, 5)


@pytest.mark.parametrize("rev", [5, 6])
def test_aesv3_roundtrip(rev):
    for compress in (False, True):
        pdf = write_pdf_encrypted(_PAGES, rev=rev, compress=compress)
        assert b"/AESV3" in pdf and b"/V 5" in pdf
        assert extract_pdf_text(pdf) == _PAGES


def test_aesv3_wrong_password_is_loud():
    pdf = write_pdf_encrypted(_PAGES, user_pw=b"secret", rev=6)
    with pytest.raises(ValueError, match="wrong user password"):
        extract_pdf_text(pdf)
    from etl_pipeline_old_spark.operators.pdf import _Doc

    doc = _Doc(pdf, password=b"secret")
    assert doc._crypt_method == "aesv3"
    assert len(doc._crypt_key) == 32


def test_aesv3_tampered_perms_is_loud():
    pdf = bytearray(write_pdf_encrypted(_PAGES, rev=6))
    at = pdf.find(b"/Perms <") + len(b"/Perms <")
    # flip one hex digit of the encrypted permissions record
    pdf[at] = ord("0") if pdf[at] != ord("0") else ord("1")
    with pytest.raises(ValueError, match="Perms"):
        extract_pdf_text(bytes(pdf))


def test_aesv2_tampered_ciphertext_is_loud():
    pdf = bytearray(write_pdf_encrypted(_PAGES, rev=4))
    at = pdf.find(b"stream\n") + len(b"stream\n")
    # corrupt the LAST ciphertext block of the first stream -> CBC
    # garbles the final block and the padding check refuses it
    end = pdf.find(b"\nendstream", at)
    pdf[end - 1] ^= 0xFF
    with pytest.raises(ValueError, match="padding|truncated|mismatch"):
        extract_pdf_text(bytes(pdf))


def test_r6_kdf_properties():
    """Algorithm 2.B sanity: deterministic, salt- and password-
    sensitive, 32 bytes, and owner-udata-sensitive."""
    from etl_pipeline_old_spark.operators.pdf_crypt import hash_r6

    a = hash_r6(b"pw", b"salt8888")
    assert len(a) == 32
    assert hash_r6(b"pw", b"salt8888") == a  # cached AND pure
    assert hash_r6(b"pw", b"salt8889") != a
    assert hash_r6(b"pw2", b"salt8888") != a
    assert hash_r6(b"pw", b"salt8888", b"udata") != a


def test_v5_u_ue_identities():
    from etl_pipeline_old_spark.operators.pdf_crypt import (
        check_user_password_v5, compute_u_v5, compute_ue_v5,
    )

    fk = bytes(range(32))
    for rev in (5, 6):
        u = compute_u_v5(b"pw", b"vsalt000", b"ksalt000", rev)
        ue = compute_ue_v5(b"pw", b"ksalt000", fk, rev)
        assert len(u) == 48 and len(ue) == 32
        assert check_user_password_v5(b"pw", u, ue, rev) == fk
        with pytest.raises(ValueError, match="wrong user password"):
            check_user_password_v5(b"nope", u, ue, rev)


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
