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
tests/test_pdf_crypt.py; MD5 is the stdlib's.  AES-based handlers
(/V 4 and 5, the post-2008 forms) raise the documented seam — their
CBC/ECB plumbing without an independent cross-check is not worth a
silent-wrong risk.  RC4 is length-preserving, so encryption never moves
xref offsets.
"""

from __future__ import annotations

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
