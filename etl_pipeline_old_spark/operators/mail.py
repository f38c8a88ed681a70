"""Email (RFC 5322 + MIME) parsing — own implementation, pure stdlib
primitives, cross-validated against CPython's independent ``email``
package in tests/test_mail.py.

Why this exists: mail archives are a major real-corpus slice (support
desks, mailing lists, the classic research corpora), and the format's
text is layered behind exactly the mechanisms a naive line-splitter
garbles:

- **Header folding** (RFC 5322 §2.2.3): a header VALUE continues on any
  following line that starts with whitespace — unfolding must happen
  before parsing.
- **RFC 2047 encoded-words** in Subject/From: ``=?charset?B|Q?...?=``
  tokens carry non-ASCII header text; adjacent encoded-words join
  WITHOUT the whitespace between them (§6.2) — the rule naive decoders
  miss, duplicating spaces.
- **MIME multipart** (RFC 2046): parts are delimited by
  ``--boundary`` lines, terminated by ``--boundary--``; nesting
  recurses (multipart/alternative inside multipart/mixed).
- **Content-Transfer-Encoding**: base64 and quoted-printable (RFC 2045
  §6.7 — including soft line breaks ``=\\r?\\n`` and ``=XX`` escapes)
  must be undone, then the part's ``charset=`` parameter applied —
  mail is where cp1251/koi8-r text still lives (operators/charset.py
  territory).

The writer emits spec-valid messages (folded headers, encoded-word
subjects, QP + base64 parts) so staged corpora prove every layer; the
quoted-printable codec is its own implementation, fuzz-checked against
CPython's ``quopri``.  Damage (bad base64, malformed encoded-word,
missing terminal boundary, undecodable charset) raises ValueError —
one message costs one record, never the job.
"""

from __future__ import annotations

import base64
import binascii
import re

_CRLF = "\r\n"


# ----------------------------------------------------- quoted-printable
def qp_encode(data: bytes, line_max: int = 76) -> bytes:
    """RFC 2045 §6.7 encoder: ``=XX`` for non-printables/``=``, soft
    line breaks to keep lines ≤ ``line_max``, trailing space/tab
    protected."""
    out = bytearray()
    line = bytearray()
    for b in data:
        if b in (0x0A,):  # hard newline: flush (protect trailing WS)
            if line[-1:] in (b" ", b"\t"):
                tail = line[-1]
                del line[-1]
                line += b"=%02X" % tail
            out += line + b"\r\n"
            line = bytearray()
            continue
        enc = (
            b"=%02X" % b
            if (b == 0x3D or b < 0x20 or b > 0x7E) and b not in (0x09,)
            else bytes([b])
        )
        if len(line) + len(enc) > line_max - 1:  # room for the soft '='
            out += line + b"=\r\n"
            line = bytearray()
        line += enc
    if line[-1:] in (b" ", b"\t"):
        tail = line[-1]
        del line[-1]
        line += b"=%02X" % tail
    out += line
    return bytes(out)


def qp_decode(data: bytes) -> bytes:
    """RFC 2045 §6.7 decoder; malformed ``=`` escapes raise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0x3D:  # '='
            nxt = data[i + 1 : i + 3]
            if nxt[:1] == b"\r" and nxt[1:2] == b"\n":
                i += 3  # soft break CRLF
                continue
            if nxt[:1] == b"\n":
                i += 2  # soft break bare LF (tolerated on read)
                continue
            if len(nxt) == 2 and re.fullmatch(rb"[0-9A-Fa-f]{2}", nxt):
                out.append(int(nxt, 16))
                i += 3
                continue
            raise ValueError(f"mail: malformed QP escape {data[i:i+3]!r}")
        out.append(b)
        i += 1
    # encoded CRLFs represent newlines; normalize to \n at text level
    return bytes(out)


# ------------------------------------------------------ encoded words
_EW = re.compile(r"=\?([^?]+)\?([BbQq])\?([^?]*)\?=")


def encode_word(text: str, charset: str = "utf-8") -> str:
    """One RFC 2047 B-encoded-word (the writer keeps values short
    enough for a single word per line)."""
    raw = text.encode(charset)
    return f"=?{charset}?B?{base64.b64encode(raw).decode()}?="


def decode_header_value(value: str) -> str:
    """Decode RFC 2047 encoded-words; whitespace BETWEEN adjacent
    encoded-words is dropped (§6.2), other text passes through."""
    out = []
    pos = 0
    prev_was_ew = False
    for m in _EW.finditer(value):
        between = value[pos : m.start()]
        if not (prev_was_ew and between.strip() == ""):
            out.append(between)
        charset, kind, payload = m.group(1), m.group(2), m.group(3)
        try:
            if kind.lower() == "b":
                raw = base64.b64decode(payload, validate=True)
            else:  # Q: like QP but '_' means space (RFC 2047 §4.2)
                raw = qp_decode(
                    payload.replace("_", "=20").encode("ascii")
                )
            out.append(raw.decode(charset))
        except (binascii.Error, UnicodeDecodeError, LookupError,
                ValueError) as exc:
            raise ValueError(
                f"mail: malformed encoded-word {m.group(0)!r}"
            ) from exc
        pos = m.end()
        prev_was_ew = True
    out.append(value[pos:])
    return "".join(out)


# ----------------------------------------------------------- messages
def _unfold_headers(raw: bytes) -> list:
    """Split the header block into (name, value) pairs with RFC 5322
    §2.2.3 unfolding (continuation lines start with WSP)."""
    text = raw.decode("ascii", errors="strict")
    lines = text.split("\r\n") if "\r\n" in text else text.split("\n")
    pairs = []
    for ln in lines:
        if not ln:
            continue
        if ln[0] in " \t":
            if not pairs:
                raise ValueError("mail: continuation line before any header")
            pairs[-1] = (pairs[-1][0], pairs[-1][1] + " " + ln.strip())
            continue
        name, sep, val = ln.partition(":")
        if not sep:
            raise ValueError(f"mail: header line without a colon {ln!r}")
        pairs.append((name.strip().lower(), val.strip()))
    return pairs


def _split_headers_body(raw: bytes):
    for sep in (b"\r\n\r\n", b"\n\n"):
        at = raw.find(sep)
        if at >= 0:
            return raw[:at], raw[at + len(sep):]
    raise ValueError("mail: no header/body separator")


def _params(value: str) -> tuple:
    """Content-Type value → (media_type, {param: value}); quoted and
    token parameter forms both accepted."""
    parts = value.split(";")
    media = parts[0].strip().lower()
    params = {}
    for p in parts[1:]:
        k, sep, v = p.partition("=")
        if sep:
            params[k.strip().lower()] = v.strip().strip('"')
    return media, params


def parse_message(raw: bytes) -> dict:
    """Parse one RFC 5322 message into::

        {"headers": {name: decoded_value}, "parts": [
            {"media": "text/plain", "charset": "utf-8",
             "text": str | None, "data": bytes}]}

    Multipart containers recurse; leaf parts decode their transfer
    encoding, and ``text/*`` leaves also decode their charset."""
    head_raw, body = _split_headers_body(raw)
    pairs = _unfold_headers(head_raw)
    headers: dict = {}
    for name, val in pairs:
        headers.setdefault(name, decode_header_value(val))
    parts: list = []
    _collect_parts(headers, body, parts, depth=0)
    return {"headers": headers, "parts": parts}


def _collect_parts(headers: dict, body: bytes, out: list,
                   depth: int) -> None:
    if depth > 8:
        raise ValueError("mail: multipart nesting too deep")
    media, params = _params(headers.get("content-type", "text/plain"))
    if media.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            raise ValueError("mail: multipart without a boundary param")
        # RFC 2046 §5.1.1: parts sit between delimiter LINES
        # (--boundary); the close-delimiter carries a trailing '--';
        # preamble and epilogue are discarded
        delim = re.compile(
            rb"(?:^|\r?\n)--" + re.escape(boundary.encode("ascii"))
            + rb"(--)?[ \t]*(?:\r?\n|$)"
        )
        hits = list(delim.finditer(body))
        if not hits or not hits[-1].group(1):
            raise ValueError("mail: multipart missing terminal boundary")
        for m, nxt in zip(hits, hits[1:]):
            if m.group(1):
                break  # close-delimiter: everything after is epilogue
            seg = body[m.end() : nxt.start()]
            if seg.startswith(b"\r\n") or seg.startswith(b"\n"):
                sub_headers: dict = {}  # headerless part: defaults apply
                pb = seg.lstrip(b"\r\n")
            else:
                ph, pb = _split_headers_body(seg)
                sub_headers = {}
                for name, val in _unfold_headers(ph):
                    sub_headers.setdefault(name, decode_header_value(val))
            _collect_parts(sub_headers, pb, out, depth + 1)
        return
    cte = headers.get("content-transfer-encoding", "7bit").lower()
    if cte == "base64":
        try:
            data = base64.b64decode(
                re.sub(rb"\s+", b"", body), validate=True
            )
        except binascii.Error as exc:
            raise ValueError("mail: malformed base64 body") from exc
    elif cte == "quoted-printable":
        data = qp_decode(body)
    elif cte in ("7bit", "8bit", "binary"):
        data = body
    else:
        raise ValueError(f"mail: unknown transfer encoding {cte!r}")
    text = None
    if media.startswith("text/"):
        charset = params.get("charset", "us-ascii")
        try:
            text = data.decode(charset)
        except (UnicodeDecodeError, LookupError) as exc:
            raise ValueError(
                f"mail: undecodable {media} body under {charset!r}"
            ) from exc
        text = text.replace("\r\n", "\n")
        if text.endswith("\n"):
            text = text[:-1]  # the CRLF before the closing boundary
    out.append(
        {"media": media, "charset": params.get("charset"),
         "text": text, "data": data}
    )


def write_message(subject: str, sender: str, text: str,
                  html: str | None = None,
                  charset: str = "utf-8",
                  message_id: str | None = None,
                  in_reply_to: str | None = None,
                  references: list | None = None) -> bytes:
    """Serialize a spec-valid message: folded + encoded-word headers,
    and either a single QP text/plain body or multipart/alternative
    with a QP text part and a base64 HTML part.  ``message_id`` /
    ``in_reply_to`` / ``references`` stage the RFC 5322 §3.6.4
    threading headers (References carries the ancestor chain oldest
    first, the convention real mailers follow)."""
    boundary = "=_bnd_" + format(abs(hash(subject)) % 10**10, "010d")
    head = [
        f"From: {encode_word(sender, charset)} <noreply@example.invalid>",
        "To: corpus@example.invalid",
        f"Subject: {encode_word(subject, charset)}",
        "MIME-Version: 1.0",
        "Date: Thu, 01 Jan 2026 00:00:00 +0000",
    ]
    if message_id:
        head.append(f"Message-ID: {message_id}")
    if in_reply_to:
        head.append(f"In-Reply-To: {in_reply_to}")
    if references:
        head.append("References: " + " ".join(references))
    text_part = (
        f"Content-Type: text/plain; charset={charset}" + _CRLF
        + "Content-Transfer-Encoding: quoted-printable" + _CRLF + _CRLF
    ).encode("ascii") + qp_encode(text.encode(charset))
    if html is None:
        head.append(f"Content-Type: text/plain; charset={charset}")
        head.append("Content-Transfer-Encoding: quoted-printable")
        return (
            _CRLF.join(head).encode("ascii") + b"\r\n\r\n"
            + qp_encode(text.encode(charset))
        )
    head.append(
        f'Content-Type: multipart/alternative; boundary="{boundary}"'
    )
    html_part = (
        f"Content-Type: text/html; charset={charset}" + _CRLF
        + "Content-Transfer-Encoding: base64" + _CRLF + _CRLF
    ).encode("ascii") + base64.encodebytes(html.encode(charset))
    b = boundary.encode("ascii")
    return (
        _CRLF.join(head).encode("ascii") + b"\r\n\r\n"
        + b"preamble (discarded per RFC 2046)\r\n"
        + b"--" + b + b"\r\n" + text_part + b"\r\n"
        + b"--" + b + b"\r\n" + html_part
        + b"--" + b + b"--\r\n" + b"epilogue (discarded)\r\n"
    )


# ---------------------------------------------------------------- mbox
def split_mbox(blob: bytes) -> list:
    """Split an mboxrd/mboxo shard into raw messages: ``From `` at line
    start delimits; ``>From`` unstuffing applied to body lines (the
    escaping writers add so literal 'From ' lines survive)."""
    if not blob.startswith(b"From "):
        raise ValueError("mbox: shard does not start with a From_ line")
    msgs = re.split(rb"(?:^|\n)From [^\n]*\n", blob)
    out = []
    for raw in msgs[1:]:
        out.append(re.sub(rb"(^|\n)>(>*From )", rb"\1\2", raw))
    return out


def write_mbox(messages: list) -> bytes:
    """Join raw messages into an mbox shard with From_ separators and
    >From stuffing."""
    out = bytearray()
    for raw in messages:
        out += b"From MAILER-DAEMON Thu Jan  1 00:00:00 2026\n"
        stuffed = re.sub(rb"(^|\n)(>*From )", rb"\1>\2", raw)
        out += stuffed
        if not raw.endswith(b"\n"):
            out += b"\n"
    return bytes(out)
