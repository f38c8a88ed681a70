"""PDF standard security handler (ISO 32000-1 §7.6.3) — RC4 revisions
2 and 3, pure stdlib.

Legacy encrypted PDFs are everywhere in real document corpora —
"owner-locked" files (empty USER password, printing/copying restricted)
are the overwhelmingly common case, and they are fully readable by
design: the spec's own key derivation recovers the content without any
secret.  A pipeline that quarantines every /Encrypt document drops a
real slice of the corpus it could legally read.

Implemented from the public spec algorithms:

- **Algorithm 2** — encryption key: MD5(padded password ‖ /O ‖ P as
  little-endian int32 ‖ first file-ID string), 50 extra MD5 rounds for
  revision 3, key length 40 bits (rev 2) or /Length (rev 3).
- **Algorithm 3** — /O value: RC4 of the padded user password under a
  key from the owner password (19 XOR-variant passes for rev 3).
- **Algorithms 4/5** — /U value, which doubles as the password CHECK:
  a wrong user password fails loudly here, never silently mis-decrypts.
- **Algorithm 1** — per-object keys: MD5(file key ‖ objnum₃LE ‖ gen₂LE),
  truncated to min(n+5, 16) bytes; RC4 applied to stream payloads (and
  strings — but this module's consumer, the text extractor, reads text
  from content STREAMS, where string operands live inside the encrypted
  stream bytes).

RC4 itself is validated against the published RFC 6229 test vectors in
tests/test_pdf_crypt.py; MD5 is the stdlib's.  RC4 is
length-preserving, so encryption never moves xref offsets.

The AES-era handlers live here too (round 11, closing the r10 seam):

- **/V 4 + CFM /AESV2** (ISO 32000-1 §7.6.2) — the same Algorithm 2
  file key as revision 3, but the per-object key appends the spec's
  4-byte ``sAlT`` suffix and payloads are AES-128-CBC with a prepended
  16-byte IV and RFC 2898 padding.  AES is NOT length-preserving, so
  the writer computes stream /Length from the ciphertext.
- **/V 5, revisions 5 and 6 (AESV3)** (ISO 32000-2 §7.6.4) — AES-256
  with SHA-2 key derivation.  Revision 6's Algorithm 2.B is the
  iterated SHA-256/384/512 + AES-128-CBC loop (≥64 rounds, stop when
  the last cipher byte ≤ round−32); revision 5 (the interim Adobe
  form) is a single SHA-256.  /U carries hash‖validation-salt‖key-salt
  (48 bytes); the file key is recovered by AES-256-CBC-decrypting /UE
  under the intermediate key with a zero IV; /Perms is the
  AES-256-ECB-encrypted permissions record (``adb`` signature
  checked).  There is NO per-object key in V5 — the file key
  encrypts every object directly.

Cross-check posture (the reason AES was previously a loud seam): the
cipher core is pinned to the published FIPS-197 / SP 800-38A vectors
AND randomized-cross-validated against the JVM's independent
``javax.crypto`` through py4j (tests/test_aes.py), so CBC/ECB plumbing
cannot be silently wrong.  The R6 Algorithm 2.B loop has no public
test vectors; it is spec-derived, exercised by write→authenticate→
decrypt roundtrips with exact-text oracles, and a wrong password or
tampered /U fails the hash check loudly — the failure mode is a
quarantined record, never silently-garbled text.
"""

from __future__ import annotations

import functools
import hashlib
import struct

# ISO 32000-1 Table 7.6.3.3 — the 32-byte padding string
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (the public algorithm; vectors: RFC 6229)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def _owner_key(owner_pw: bytes, rev: int, n: int) -> bytes:
    h = hashlib.md5(_pad(owner_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_o(user_pw: bytes, owner_pw: bytes, rev: int, n: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = _owner_key(owner_pw or user_pw, rev, n)
    o = rc4(key, _pad(user_pw))
    if rev >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def file_key(
    user_pw: bytes, o: bytes, p: int, file_id: bytes, rev: int, n: int
) -> bytes:
    """Algorithm 2: the file encryption key."""
    md = hashlib.md5()
    md.update(_pad(user_pw))
    md.update(o)
    md.update(struct.pack("<i", p))
    md.update(file_id)
    h = md.digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_u(key: bytes, file_id: bytes, rev: int) -> bytes:
    """Algorithms 4 (rev 2) / 5 (rev 3): the /U entry."""
    if rev == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + file_id).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 16 arbitrary padding bytes per spec


def check_user_password(
    user_pw: bytes, o: bytes, u: bytes, p: int, file_id: bytes,
    rev: int, n: int,
) -> bytes:
    """Authenticate (Algorithm 6): derive the key and compare against
    /U.  Returns the file key; a mismatch raises — wrong passwords fail
    loudly, never silently mis-decrypt."""
    key = file_key(user_pw, o, p, file_id, rev, n)
    expect = compute_u(key, file_id, rev)
    got = u[:16] if rev >= 3 else u
    if got != expect[:16 if rev >= 3 else 32]:
        raise ValueError("pdf: wrong user password (/U check failed)")
    return key


def object_key(key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    h = hashlib.md5(
        key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
    ).digest()
    return h[: min(len(key) + 5, 16)]


def object_key_aes(key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1, AESV2 variant: the MD5 additionally absorbs the
    spec's fixed 4-byte ``sAlT`` suffix (ISO 32000-1 §7.6.2 step b)."""
    h = hashlib.md5(
        key
        + struct.pack("<I", num)[:3]
        + struct.pack("<I", gen)[:2]
        + b"sAlT"
    ).digest()
    return h[: min(len(key) + 5, 16)]


def aes_encrypt_payload(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PDF AES payload form: 16-byte IV ‖ AES-CBC(pad(data)).  The IV
    is caller-supplied so fixture staging stays deterministic (the
    writer derives it from the object's content hash — unique per
    object, which is what CBC needs; this is corpus staging, not
    secret-keeping)."""
    from .aes import cbc_encrypt, pad_pkcs7

    return iv + cbc_encrypt(key, iv, pad_pkcs7(data))


def aes_decrypt_payload(key: bytes, data: bytes) -> bytes:
    """Inverse of ``aes_encrypt_payload``; malformed length or padding
    raises (wrong key / tampered bytes fail loudly)."""
    from .aes import cbc_decrypt, unpad_pkcs7

    if len(data) < 32 or (len(data) - 16) % 16:
        raise ValueError("pdf: AES payload must be IV + ciphertext blocks")
    return unpad_pkcs7(cbc_decrypt(key, data[:16], data[16:]))


# ---------------------------------------------------------- AES-256 (V5)
@functools.lru_cache(maxsize=256)
def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the revision-6 password hash.

    K starts as SHA-256(password ‖ salt ‖ udata); each round encrypts
    64 repetitions of (password ‖ K ‖ udata) with AES-128-CBC under
    K[0:16]/IV K[16:32], re-hashes E with SHA-256/384/512 chosen by
    (sum of E[0:16]) mod 3, and the loop runs at least 64 rounds,
    ending once the LAST byte of E ≤ round − 32.  Cached per process:
    corpus staging derives the same few (password, salt) keys for
    every document, and the loop costs ~10⁴ AES blocks per call."""
    from .aes import cbc_encrypt

    digests = (hashlib.sha256, hashlib.sha384, hashlib.sha512)
    k = hashlib.sha256(password + salt + udata).digest()
    rounds = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        k = digests[sum(e[:16]) % 3](e).digest()
        rounds += 1
        if rounds >= 64 and e[-1] <= rounds - 32:
            return k[:32]


def _hash_v5(password: bytes, salt: bytes, udata: bytes, rev: int) -> bytes:
    if rev == 5:  # interim Adobe form: a single SHA-256
        return hashlib.sha256(password + salt + udata).digest()
    return hash_r6(password, salt, udata)


def compute_u_v5(
    user_pw: bytes, vsalt: bytes, ksalt: bytes, rev: int
) -> bytes:
    """Algorithm 8 step a: the 48-byte /U = hash ‖ validation salt ‖
    key salt."""
    return _hash_v5(user_pw, vsalt, b"", rev) + vsalt + ksalt


def compute_ue_v5(
    user_pw: bytes, ksalt: bytes, file_key: bytes, rev: int
) -> bytes:
    """Algorithm 8 step b: /UE = AES-256-CBC(zero IV, no pad) of the
    32-byte file key under the intermediate user key."""
    from .aes import cbc_encrypt

    ik = _hash_v5(user_pw, ksalt, b"", rev)
    return cbc_encrypt(ik, b"\x00" * 16, file_key)


def compute_o_v5(
    owner_pw: bytes, u48: bytes, vsalt: bytes, ksalt: bytes, rev: int
) -> bytes:
    """Algorithm 9 step a: the 48-byte /O (owner hashes absorb the full
    48-byte /U as udata)."""
    return _hash_v5(owner_pw, vsalt, u48, rev) + vsalt + ksalt


def compute_oe_v5(
    owner_pw: bytes, u48: bytes, ksalt: bytes, file_key: bytes, rev: int
) -> bytes:
    from .aes import cbc_encrypt

    ik = _hash_v5(owner_pw, ksalt, u48, rev)
    return cbc_encrypt(ik, b"\x00" * 16, file_key)


def compute_perms(p: int, file_key: bytes, encrypt_metadata: bool) -> bytes:
    """Algorithm 10: /Perms = AES-256-ECB of P(int32 LE) ‖ 0xFF×4 ‖
    T/F ‖ ``adb`` ‖ 4 filler bytes.  Filler is derived from the file
    key (spec says 'random'; deterministic here for reproducible
    fixtures — the field is opaque by definition)."""
    from .aes import ecb_encrypt

    block = (
        struct.pack("<i", p)
        + b"\xff\xff\xff\xff"
        + (b"T" if encrypt_metadata else b"F")
        + b"adb"
        + hashlib.md5(file_key).digest()[:4]
    )
    return ecb_encrypt(file_key, block)


def check_user_password_v5(
    user_pw: bytes, u48: bytes, ue: bytes, rev: int
) -> bytes:
    """Algorithm 11 + 8b inverse: authenticate the user password against
    /U and recover the 32-byte file key from /UE.  Mismatch raises."""
    from .aes import cbc_decrypt

    if len(u48) < 48:
        raise ValueError("pdf: /U must be 48 bytes for V5 encryption")
    vsalt, ksalt = u48[32:40], u48[40:48]
    if _hash_v5(user_pw, vsalt, b"", rev) != u48[:32]:
        raise ValueError("pdf: wrong user password (/U hash mismatch)")
    ik = _hash_v5(user_pw, ksalt, b"", rev)
    return cbc_decrypt(ik, b"\x00" * 16, ue)


def check_perms(perms: bytes, file_key: bytes, p: int) -> bool:
    """Algorithm 13: decrypt /Perms and verify the ``adb`` signature and
    the P value — a tampered permissions record fails loudly."""
    from .aes import ecb_decrypt

    blk = ecb_decrypt(file_key, perms[:16])
    if blk[9:12] != b"adb":
        raise ValueError("pdf: /Perms signature mismatch (tampered?)")
    if struct.unpack("<i", blk[:4])[0] != p:
        raise ValueError("pdf: /Perms P disagrees with /Encrypt P")
    return blk[8:9] == b"T"
