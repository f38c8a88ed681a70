"""AES core (operators/aes.py) — pinned to the published FIPS-197 /
SP 800-38A vectors and randomized-cross-validated against the JVM's
independent javax.crypto implementation via the live Spark session's
py4j gateway (the same cross-engine discipline as the JPEG decoder's
javax.imageio checks)."""

from __future__ import annotations

import hashlib

import pytest

from etl_pipeline_old_spark.operators.aes import (
    AES, INV_SBOX, SBOX, cbc_decrypt, cbc_encrypt, ecb_decrypt, ecb_encrypt,
    gmul, pad_pkcs7, unpad_pkcs7,
)

# FIPS-197 Appendix C known-answer vectors (all three key sizes)
_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_FIPS = [
    (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
    (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
    (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
]


@pytest.mark.parametrize("key,expect", _FIPS)
def test_fips197_appendix_c(key, expect):
    aes = AES(key)
    ct = aes.encrypt_block(_PT)
    assert ct.hex() == expect
    assert aes.decrypt_block(ct) == _PT


def test_sbox_derivation_spot_values():
    # three spec-table spot values (FIPS-197 figure 7) confirm the
    # algebraic derivation, and the inverse box is its exact inverse
    assert SBOX[0x00] == 0x63
    assert SBOX[0x01] == 0x7C
    assert SBOX[0x53] == 0xED
    assert all(INV_SBOX[SBOX[i]] == i for i in range(256))


def test_gf_field_properties():
    # x * inv(x) == 1 for all non-zero x; distributivity spot check
    from etl_pipeline_old_spark.operators.aes import _ANTILOG, _LOG

    for x in range(1, 256):
        inv = _ANTILOG[255 - _LOG[x]] if x != 1 else 1
        assert gmul(x, inv) == 1
    assert gmul(0x57, 0x13) == 0xFE  # FIPS-197 §4.2 worked example


def test_sp800_38a_cbc_vectors():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
    )
    ct = cbc_encrypt(key, iv, pt)
    assert ct.hex() == (
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
    )
    assert cbc_decrypt(key, iv, ct) == pt


def _det_bytes(tag: str, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}:{i}".encode()).digest()
        i += 1
    return out[:n]


def test_modes_roundtrip_deterministic_fuzz():
    for i in range(8):
        key = _det_bytes(f"key{i}", (16, 24, 32)[i % 3])
        iv = _det_bytes(f"iv{i}", 16)
        data = _det_bytes(f"data{i}", 16 * (i + 1))
        assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, data)) == data
        assert ecb_decrypt(key, ecb_encrypt(key, data)) == data
        raw = _det_bytes(f"raw{i}", i * 7)  # incl. empty and non-multiples
        assert unpad_pkcs7(pad_pkcs7(raw)) == raw


def test_padding_fails_loudly():
    with pytest.raises(ValueError):
        unpad_pkcs7(b"")
    with pytest.raises(ValueError):
        unpad_pkcs7(b"\x00" * 16)  # pad byte 0 is invalid
    with pytest.raises(ValueError):
        unpad_pkcs7(b"\x01" * 15 + b"\x03")  # count disagrees with bytes
    with pytest.raises(ValueError):
        cbc_encrypt(b"k" * 16, b"i" * 16, b"short")  # not a block multiple


def test_cross_validate_against_javax_crypto(spark):
    """Randomized (deterministically seeded) cross-check of CBC/ECB in
    BOTH directions against the JVM's independent AES — the
    cross-engine pin that makes the PDF AES handlers trustworthy."""
    jvm = spark.sparkContext._jvm
    Cipher = jvm.javax.crypto.Cipher

    def jcrypt(mode: str, enc: bool, key: bytes, iv, data: bytes) -> bytes:
        c = Cipher.getInstance(f"AES/{mode}/NoPadding")
        skey = jvm.javax.crypto.spec.SecretKeySpec(bytearray(key), "AES")
        op = Cipher.ENCRYPT_MODE if enc else Cipher.DECRYPT_MODE
        if mode == "CBC":
            c.init(op, skey, jvm.javax.crypto.spec.IvParameterSpec(
                bytearray(iv)))
        else:
            c.init(op, skey)
        return bytes(c.doFinal(bytearray(data)))

    for i in range(6):
        key = _det_bytes(f"jk{i}", (16, 24, 32)[i % 3])
        iv = _det_bytes(f"jiv{i}", 16)
        data = _det_bytes(f"jdata{i}", 16 * (2 + i))
        assert cbc_encrypt(key, iv, data) == jcrypt("CBC", True, key, iv,
                                                    data)
        assert cbc_decrypt(key, iv, data) == jcrypt("CBC", False, key, iv,
                                                    data)
        assert ecb_encrypt(key, data) == jcrypt("ECB", True, key, None, data)
        assert ecb_decrypt(key, data) == jcrypt("ECB", False, key, None,
                                                data)
