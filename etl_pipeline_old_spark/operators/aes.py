"""AES (FIPS-197) block cipher + CBC/ECB modes — pure stdlib, derived
tables.

Why an own AES: the post-2008 PDF encryption handlers (/V 4 AESV2 and
/V 5 AESV3, ISO 32000 §7.6) are the modern counterpart of the RC4
handler in operators/pdf_crypt.py — real document corpora carry them in
the same "owner-locked, readable by design" shape.  The container has
no crypto library beyond hashlib, so the cipher is implemented here
from the public FIPS-197 specification.

Nothing in this module is a memorized constant table: the S-box is
DERIVED (GF(2^8) multiplicative inverse through log/antilog tables over
the AES polynomial x^8+x^4+x^3+x+1, then the affine transform with
0x63), the round constants by doubling in the field, and the
MixColumns/T-tables from the S-box.  Correctness is pinned three ways
in tests/test_aes.py: the FIPS-197 Appendix C known-answer vectors for
all three key sizes, the SP 800-38A CBC vectors, and randomized
cross-validation against the JVM's independent ``javax.crypto``
implementation through the live Spark session's py4j gateway.

Security scope: this is a DATA-PIPELINE codec for reading documents the
spec says are readable (and for staging test fixtures) — not a
hardened crypto library.  Python table lookups are not constant-time;
do not use this for protecting secrets against a local attacker.

Encryption uses the classic 32-bit T-table formulation (the public
optimization from the Rijndael proposal itself) because the PDF R6 key
derivation below (pdf_crypt.hash_r6) encrypts tens of kilobytes per
password — a naive byte-wise cipher would dominate the corpus staging
cost.  Decryption takes the straightforward InvCipher path: it only
ever sees short stream payloads and 32-byte key blobs.
"""

from __future__ import annotations

# ---------------------------------------------------------------- GF(2^8)
_POLY = 0x11B  # x^8 + x^4 + x^3 + x + 1


def _build_field():
    """log/antilog tables over GF(2^8) with generator 0x03."""
    antilog = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        antilog[i] = x
        log[x] = i
        # multiply by the generator 0x03 = x * 2 ^ x
        x2 = x << 1
        if x2 & 0x100:
            x2 ^= _POLY
        x ^= x2
    antilog[255] = antilog[0]
    return log, antilog


_LOG, _ANTILOG = _build_field()


def gmul(a: int, b: int) -> int:
    """GF(2^8) multiplication (public field arithmetic)."""
    if a == 0 or b == 0:
        return 0
    return _ANTILOG[(_LOG[a] + _LOG[b]) % 255]


def _derive_sbox():
    sbox = [0] * 256
    for v in range(256):
        b = 0 if v == 0 else _ANTILOG[255 - _LOG[v]]  # multiplicative inverse
        s = 0x63
        for shift in range(5):  # b ^ rotl(b,1..4) ^ 0x63
            s ^= ((b << shift) | (b >> (8 - shift))) & 0xFF
        sbox[v] = s
    return sbox


SBOX = _derive_sbox()
INV_SBOX = [0] * 256
for _i, _s in enumerate(SBOX):
    INV_SBOX[_s] = _i

# T-tables: T0[x] packs S[x] * (02,01,01,03) as one big-endian word;
# T1..T3 are byte rotations of T0 (Rijndael proposal §5.2).
_T0 = [0] * 256
for _x in range(256):
    _s = SBOX[_x]
    _s2 = gmul(_s, 2)
    _T0[_x] = (_s2 << 24) | (_s << 16) | (_s << 8) | (_s ^ _s2)
_T1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T0]
_T2 = [((t >> 16) | ((t & 0xFFFF) << 16)) & 0xFFFFFFFF for t in _T0]
_T3 = [((t >> 24) | ((t & 0xFFFFFF) << 8)) & 0xFFFFFFFF for t in _T0]

# InvMixColumns multiplier tables (09, 0b, 0d, 0e) — derived, not recalled
_M9 = [gmul(x, 0x09) for x in range(256)]
_M11 = [gmul(x, 0x0B) for x in range(256)]
_M13 = [gmul(x, 0x0D) for x in range(256)]
_M14 = [gmul(x, 0x0E) for x in range(256)]

# Inverse T-tables for the equivalent inverse cipher (FIPS-197 §5.3.5):
# D0[x] packs InvS[x] * (0e,09,0d,0b) as one big-endian word; D1..D3 are
# byte rotations — derived from the derived INV_SBOX and field tables,
# exactly like the forward T-tables above. r15: decryption used to take
# the byte-wise InvCipher path ("only short payloads"), but the AES-PDF
# corpus kernels decrypt ~20 blocks per document per run, which made
# decrypt_block 60% of the extraction kernel's profile.
_D0 = [0] * 256
for _x in range(256):
    _y = INV_SBOX[_x]
    _D0[_x] = (
        (_M14[_y] << 24) | (_M9[_y] << 16) | (_M13[_y] << 8) | _M11[_y]
    )
_D1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D0]
_D2 = [((t >> 16) | ((t & 0xFFFF) << 16)) & 0xFFFFFFFF for t in _D0]
_D3 = [((t >> 24) | ((t & 0xFFFFFF) << 8)) & 0xFFFFFFFF for t in _D0]


def _expand_key(key: bytes) -> list:
    """FIPS-197 §5.2 key expansion → list of 4(Nr+1) 32-bit words."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("aes: key must be 16, 24 or 32 bytes")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (SBOX[(t >> 24) & 0xFF] << 24)
                | (SBOX[(t >> 16) & 0xFF] << 16)
                | (SBOX[(t >> 8) & 0xFF] << 8)
                | SBOX[t & 0xFF]
            )
            t ^= rcon << 24
            rcon = gmul(rcon, 2)
        elif nk == 8 and i % nk == 4:
            t = (
                (SBOX[(t >> 24) & 0xFF] << 24)
                | (SBOX[(t >> 16) & 0xFF] << 16)
                | (SBOX[(t >> 8) & 0xFF] << 8)
                | SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


class AES:
    """One expanded key, reusable across blocks (the KDF and CBC loops
    below encrypt thousands of blocks under one key — expanding once
    matters)."""

    def __init__(self, key: bytes):
        self._w = _expand_key(key)
        self._nr = len(key) // 4 + 6
        self._dw = None  # decryption round keys, built on first decrypt

    def _dec_keys(self) -> list:
        """Equivalent-inverse-cipher round keys: the middle rounds' words
        pass through InvMixColumns so decryption can run the same
        T-table structure as encryption (FIPS-197 §5.3.5)."""
        if self._dw is None:
            w = self._w
            dw = list(w)
            for i in range(4, 4 * self._nr):
                t = w[i]
                a0, a1, a2, a3 = (
                    (t >> 24) & 0xFF, (t >> 16) & 0xFF, (t >> 8) & 0xFF, t & 0xFF,
                )
                dw[i] = (
                    ((_M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]) << 24)
                    | ((_M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]) << 16)
                    | ((_M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]) << 8)
                    | (_M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3])
                )
            self._dw = dw
        return self._dw

    def encrypt_block(self, block: bytes) -> bytes:
        if len(block) != 16:
            raise ValueError("aes: block must be 16 bytes")
        w = self._w
        t0, t1, t2, t3 = _T0, _T1, _T2, _T3
        s0 = int.from_bytes(block[0:4], "big") ^ w[0]
        s1 = int.from_bytes(block[4:8], "big") ^ w[1]
        s2 = int.from_bytes(block[8:12], "big") ^ w[2]
        s3 = int.from_bytes(block[12:16], "big") ^ w[3]
        k = 4
        for _ in range(self._nr - 1):
            u0 = (
                t0[(s0 >> 24) & 0xFF] ^ t1[(s1 >> 16) & 0xFF]
                ^ t2[(s2 >> 8) & 0xFF] ^ t3[s3 & 0xFF] ^ w[k]
            )
            u1 = (
                t0[(s1 >> 24) & 0xFF] ^ t1[(s2 >> 16) & 0xFF]
                ^ t2[(s3 >> 8) & 0xFF] ^ t3[s0 & 0xFF] ^ w[k + 1]
            )
            u2 = (
                t0[(s2 >> 24) & 0xFF] ^ t1[(s3 >> 16) & 0xFF]
                ^ t2[(s0 >> 8) & 0xFF] ^ t3[s1 & 0xFF] ^ w[k + 2]
            )
            u3 = (
                t0[(s3 >> 24) & 0xFF] ^ t1[(s0 >> 16) & 0xFF]
                ^ t2[(s1 >> 8) & 0xFF] ^ t3[s2 & 0xFF] ^ w[k + 3]
            )
            s0, s1, s2, s3 = u0, u1, u2, u3
            k += 4
        sb = SBOX
        out = bytearray(16)
        for j, (a, b, c, d) in enumerate(
            ((s0, s1, s2, s3), (s1, s2, s3, s0),
             (s2, s3, s0, s1), (s3, s0, s1, s2))
        ):
            # final round: SubBytes + ShiftRows + AddRoundKey, no MixColumns
            word = (
                (sb[(a >> 24) & 0xFF] << 24)
                | (sb[(b >> 16) & 0xFF] << 16)
                | (sb[(c >> 8) & 0xFF] << 8)
                | sb[d & 0xFF]
            ) ^ w[k + j]
            out[4 * j : 4 * j + 4] = word.to_bytes(4, "big")
        return bytes(out)

    def decrypt_block(self, block: bytes) -> bytes:
        if len(block) != 16:
            raise ValueError("aes: block must be 16 bytes")
        w = self._w
        nr = self._nr
        dw = self._dec_keys()
        d0, d1, d2, d3 = _D0, _D1, _D2, _D3
        k = 4 * nr
        s0 = int.from_bytes(block[0:4], "big") ^ w[k]
        s1 = int.from_bytes(block[4:8], "big") ^ w[k + 1]
        s2 = int.from_bytes(block[8:12], "big") ^ w[k + 2]
        s3 = int.from_bytes(block[12:16], "big") ^ w[k + 3]
        for rnd in range(nr - 1, 0, -1):
            k = 4 * rnd
            # inverse rows rotate the OTHER way: column j reads s_{j},
            # s_{j-1}, s_{j-2}, s_{j-3} (mod 4) — the mirror of encrypt
            u0 = (
                d0[(s0 >> 24) & 0xFF] ^ d1[(s3 >> 16) & 0xFF]
                ^ d2[(s2 >> 8) & 0xFF] ^ d3[s1 & 0xFF] ^ dw[k]
            )
            u1 = (
                d0[(s1 >> 24) & 0xFF] ^ d1[(s0 >> 16) & 0xFF]
                ^ d2[(s3 >> 8) & 0xFF] ^ d3[s2 & 0xFF] ^ dw[k + 1]
            )
            u2 = (
                d0[(s2 >> 24) & 0xFF] ^ d1[(s1 >> 16) & 0xFF]
                ^ d2[(s0 >> 8) & 0xFF] ^ d3[s3 & 0xFF] ^ dw[k + 2]
            )
            u3 = (
                d0[(s3 >> 24) & 0xFF] ^ d1[(s2 >> 16) & 0xFF]
                ^ d2[(s1 >> 8) & 0xFF] ^ d3[s0 & 0xFF] ^ dw[k + 3]
            )
            s0, s1, s2, s3 = u0, u1, u2, u3
        inv = INV_SBOX
        out = bytearray(16)
        for j, (a, b, c, d) in enumerate(
            ((s0, s3, s2, s1), (s1, s0, s3, s2),
             (s2, s1, s0, s3), (s3, s2, s1, s0))
        ):
            # final round: InvShiftRows + InvSubBytes + AddRoundKey w[0..3]
            word = (
                (inv[(a >> 24) & 0xFF] << 24)
                | (inv[(b >> 16) & 0xFF] << 16)
                | (inv[(c >> 8) & 0xFF] << 8)
                | inv[d & 0xFF]
            ) ^ w[j]
            out[4 * j : 4 * j + 4] = word.to_bytes(4, "big")
        return bytes(out)


# ---------------------------------------------------------------- modes
def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC, NO padding — ``len(data)`` must be a block multiple.
    (The PDF R6 KDF and key blobs are exact multiples by construction.)"""
    if len(iv) != 16:
        raise ValueError("aes: IV must be 16 bytes")
    if len(data) % 16:
        raise ValueError("aes: CBC without padding needs a block multiple")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes.encrypt_block(blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(iv) != 16:
        raise ValueError("aes: IV must be 16 bytes")
    if len(data) % 16:
        raise ValueError("aes: CBC ciphertext must be a block multiple")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        ct = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(aes.decrypt_block(ct), prev))
        prev = ct
    return bytes(out)


def ecb_encrypt(key: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("aes: ECB needs a block multiple")
    aes = AES(key)
    return b"".join(
        aes.encrypt_block(data[i : i + 16]) for i in range(0, len(data), 16)
    )


def ecb_decrypt(key: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("aes: ECB ciphertext must be a block multiple")
    aes = AES(key)
    return b"".join(
        aes.decrypt_block(data[i : i + 16]) for i in range(0, len(data), 16)
    )


def pad_pkcs7(data: bytes) -> bytes:
    """The 1..16-byte padding PDF's AES filters use (RFC 2898 scheme,
    referenced by ISO 32000 §7.6.2): always appended, value == count."""
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def unpad_pkcs7(data: bytes) -> bytes:
    if not data or len(data) % 16:
        raise ValueError("aes: padded data must be a non-empty multiple")
    n = data[-1]
    if not 1 <= n <= 16 or data[-n:] != bytes([n]) * n:
        # a malformed pad means a wrong key or tampered ciphertext —
        # fail loudly, never emit garbage text silently
        raise ValueError("aes: bad PKCS#7 padding")
    return data[:-n]
