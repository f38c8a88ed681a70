"""PDF text extraction (ISO 32000 subset) — pure stdlib, own parser.

Written from the public PDF specification (ISO 32000-1 / the Adobe PDF
Reference): cross-reference table + trailer, the object grammar (dicts,
arrays, names, numbers, literal + hex strings with the full escape set,
indirect references), FlateDecode content streams, and the text-showing
operators (Tj, ', ", TJ) inside BT/ET blocks.

Why this exists: PDF is the highest-volume document format a real LLM
data pipeline ingests (papers, reports, books) — extraction-to-text is a
first-mile operator in every published corpus recipe.  Full PDF needs a
rendering library for layout/fonts; TEXT RECOVERY from well-formed,
text-based PDFs is structural work this module does for real:

- ``write_pdf``: a spec-valid writer (catalog → page tree → pages →
  content streams, optional FlateDecode, correct xref byte offsets) so
  staged corpora are genuine PDFs any viewer opens.
- ``extract_pdf_text``: trailer discovery (``startxref`` from the tail),
  xref walk, object parse at the recorded offsets, page-tree traversal
  (nested ``Kids`` supported), per-page content-stream decode (with
  ``/Length`` honored, including indirect-reference lengths) and a
  content tokenizer that collects text operands in showing order.

PDF strings are BYTE strings per the spec — text rides as UTF-8 bytes
and recovery is byte-exact (the oracle demands it).  What stays outside:
scanned/image-only PDFs (they need OCR — a model, not a parser),
CID/Type0 glyph remapping, and encrypted documents; all are loud,
documented seams.  Damage (bad xref offset, truncated stream, length
mismatch) raises — one document costs one record, never the job.
"""

from __future__ import annotations

import re
import zlib

# --------------------------------------------------------------- writer


def _esc(line: str) -> bytes:
    """Literal-string escape: backslash the delimiters, octal-escape
    control bytes; everything else rides as raw UTF-8 bytes (PDF strings
    are byte strings)."""
    out = bytearray()
    for b in line.encode("utf-8"):
        if b in (0x28, 0x29, 0x5C):  # ( ) \\
            out += b"\\" + bytes([b])
        elif b < 0x20:
            out += b"\\%03o" % b
        else:
            out.append(b)
    return bytes(out)


def write_pdf(pages: list, compress: bool = False) -> bytes:
    """Serialize ``pages`` (each a list of text lines) into a complete
    one-font PDF with a correct xref table.  ``compress`` FlateDecodes
    the content streams."""
    objs: list[bytes] = []  # body of object i+1

    def content(lines: list) -> bytes:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _esc(line) + b") Tj")
        ops.append(b"ET")
        return b"\n".join(ops)

    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages, 3 font, then per page i:
    # (4+2i) page object, (5+2i) its content stream
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, lines in enumerate(pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % (5 + 2 * i)
        )
        data = content(lines)
        if compress:
            data = zlib.compress(data, 9)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            head = b"<< /Length %d >>" % len(data)
        objs.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# --------------------------------------------------------------- parser


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


_TOKEN = re.compile(
    rb"/[^\s/<>\[\]()]*|<<|>>|\[|\]|[-+]?\d+\.?\d*|\btrue\b|\bfalse\b|\bnull\b|\bR\b|\bobj\b|\bendobj\b|\bstream\b"
)
# pos-anchored keyword probes: used with .match(buf, pos) so hot-path stream
# boundary checks never slice (copy) the tail of the file
_STREAM_KW = re.compile(rb"\s{0,64}stream(\r\n|\n)")
_ENDSTREAM_KW = re.compile(rb"\s{0,64}endstream\b")


def _parse_object(buf: bytes, pos: int):
    """Parse one PDF object starting at ``pos`` (skipping whitespace and
    comments); returns (value, end_pos)."""
    while True:
        while pos < len(buf) and buf[pos] in b" \t\r\n\x00\x0c":
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"%":
            nl = buf.find(b"\n", pos)
            pos = nl + 1 if nl >= 0 else len(buf)
            continue
        break
    if pos >= len(buf):
        raise ValueError("pdf: unexpected end of data")
    c = buf[pos : pos + 1]
    if buf[pos : pos + 2] == b"<<":
        d = {}
        pos += 2
        while True:
            while pos < len(buf) and buf[pos] in b" \t\r\n":
                pos += 1
            if buf[pos : pos + 2] == b">>":
                return d, pos + 2
            key, pos = _parse_object(buf, pos)
            if not isinstance(key, str) or not key.startswith("/"):
                raise ValueError("pdf: dict key is not a name")
            val, pos = _parse_object(buf, pos)
            d[key[1:]] = val
    if c == b"[":
        arr = []
        pos += 1
        while True:
            while pos < len(buf) and buf[pos] in b" \t\r\n":
                pos += 1
            if buf[pos : pos + 1] == b"]":
                return arr, pos + 1
            v, pos = _parse_object(buf, pos)
            arr.append(v)
    if c == b"/":
        m = re.match(rb"/[^\s/<>\[\]()%]*", buf[pos:])
        return m.group().decode("latin-1"), pos + m.end()
    if c == b"(":
        return _parse_literal_string(buf, pos)
    if c == b"<":
        end = buf.index(b">", pos)
        hx = re.sub(rb"\s", b"", buf[pos + 1 : end])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")), end + 1
    m = re.match(rb"[-+]?\d+\.?\d*", buf[pos:])
    if m:
        tok = m.group()
        after = pos + m.end()
        # indirect reference lookahead: "N G R"
        m2 = re.match(rb"\s+(\d+)\s+R\b", buf[after:])
        if b"." not in tok and m2:
            return _Ref(int(tok)), after + m2.end()
        return (float(tok) if b"." in tok else int(tok)), after
    for word, val in ((b"true", True), (b"false", False), (b"null", None)):
        if buf[pos : pos + len(word)] == word:
            return val, pos + len(word)
    raise ValueError(f"pdf: cannot parse object at byte {pos}")


def _parse_literal_string(buf: bytes, pos: int):
    assert buf[pos : pos + 1] == b"("
    out = bytearray()
    depth = 1
    i = pos + 1
    while i < len(buf):
        b = buf[i]
        if b == 0x5C:  # backslash
            nxt = buf[i + 1]
            esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
            elif 0x30 <= nxt <= 0x37:
                m = re.match(rb"[0-7]{1,3}", buf[i + 1 :])
                out.append(int(m.group(), 8) & 0xFF)
                i += 1 + m.end()
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and buf[i : i + 1] == b"\n":
                    i += 1
            else:
                out.append(nxt)
                i += 2
        elif b == 0x28:
            depth += 1
            out.append(b)
            i += 1
        elif b == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(b)
            i += 1
        else:
            out.append(b)
            i += 1
    raise ValueError("pdf: unterminated string")


def _load_xref(buf: bytes) -> dict:
    tail = buf[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("pdf: no startxref trailer")
    at = int(m.group(1))
    if buf[at : at + 4] != b"xref":
        raise ValueError("pdf: xref offset does not point at an xref table")
    pos = at + 4
    offsets: dict[int, int] = {}
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", buf[pos:])
        if not m:
            break
        start, count = int(m.group(1)), int(m.group(2))
        pos += m.end()
        for i in range(count):
            entry = buf[pos : pos + 20]
            if entry[17:18] == b"n":
                offsets[start + i] = int(entry[:10])
            pos += 20
    return offsets


class _Doc:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.xref = _load_xref(buf)
        t0 = buf.rfind(b"trailer")
        if t0 < 0:
            raise ValueError("pdf: no trailer dictionary")
        trailer, _ = _parse_object(buf, t0 + 7)
        if "Encrypt" in trailer:
            raise NotImplementedError(
                "pdf: encrypted document — decryption is the documented seam"
            )
        self.trailer = trailer

    def resolve(self, v):
        seen: set[int] = set()
        while isinstance(v, _Ref):
            if v.num in seen:
                # a self/mutually-referential object would loop forever —
                # a wedged executor, the one failure mode worse than a
                # quarantined record
                raise ValueError(f"pdf: reference cycle at object {v.num}")
            seen.add(v.num)
            v = self.object_at(v.num)
        return v

    def object_at(self, num: int):
        if num not in self.xref:
            raise ValueError(f"pdf: object {num} missing from xref")
        pos = self.xref[num]
        m = re.match(rb"\s*(\d+)\s+\d+\s+obj\b", self.buf[pos:])
        if not m or int(m.group(1)) != num:
            raise ValueError(f"pdf: xref offset for object {num} is wrong")
        val, end = _parse_object(self.buf, pos + m.end())
        if isinstance(val, dict):
            m2 = _STREAM_KW.match(self.buf, end)
            if m2:
                d0 = m2.end()
                length = self.resolve(val.get("Length"))
                if not isinstance(length, int):
                    raise ValueError("pdf: stream without integer /Length")
                raw = self.buf[d0 : d0 + length]
                if len(raw) != length:
                    raise ValueError("pdf: stream truncated")
                # a LYING short /Length silently truncates an uncompressed
                # content stream — demand `endstream` right after the
                # declared extent (whitespace allowed, per spec).  Match
                # in place (pos-anchored, bounded whitespace run) so this
                # never copies the remainder of the file per stream.
                if not _ENDSTREAM_KW.match(self.buf, d0 + length):
                    raise ValueError("pdf: stream /Length mismatch")
                val["__stream__"] = raw
        return val

    def stream_data(self, obj: dict) -> bytes:
        raw = obj["__stream__"]
        filt = self.resolve(obj.get("Filter"))
        if filt is None:
            return raw
        filts = filt if isinstance(filt, list) else [filt]
        for f in filts:
            if f == "/FlateDecode":
                raw = zlib.decompress(raw)
            else:
                raise NotImplementedError(
                    f"pdf: filter {f} needs an external codec — "
                    "FlateDecode decodes natively"
                )
        return raw


def _walk_pages(doc: _Doc, node: dict, out: list, depth: int = 0) -> None:
    # a Kids entry pointing back at an ancestor recurses forever (each
    # object_at re-parse yields a fresh dict, so identity tracking can't
    # see the cycle) — cap the depth; real page trees are a few levels
    if depth > 64:
        raise ValueError("pdf: page tree too deep (Kids cycle?)")
    t = node.get("Type")
    if t == "/Pages":
        for kid in doc.resolve(node["Kids"]):
            _walk_pages(doc, doc.resolve(kid), out, depth + 1)
    elif t == "/Page":
        out.append(node)
    else:
        raise ValueError(f"pdf: unexpected page-tree node type {t!r}")


_SHOW = re.compile(rb"Tj|TJ|'|\"")


def _page_text(doc: _Doc, page: dict) -> list:
    """Collect text-showing operands from the page's content stream(s) in
    order.  Returns the list of byte strings shown."""
    contents = doc.resolve(page.get("Contents"))
    streams = contents if isinstance(contents, list) else [contents]
    data = b"\n".join(doc.stream_data(doc.resolve(s)) for s in streams)
    shown: list[bytes] = []
    pos = 0
    pending: list = []
    while pos < len(data):
        c = data[pos : pos + 1]
        if c == b"(":
            s, pos = _parse_literal_string(data, pos)
            pending.append(s)
            continue
        if c == b"<" and data[pos : pos + 2] != b"<<":
            end = data.index(b">", pos)
            hx = re.sub(rb"\s", b"", data[pos + 1 : end])
            pending.append(bytes.fromhex(hx.decode("ascii")))
            pos = end + 1
            continue
        m = _SHOW.match(data, pos)
        if m:
            shown += pending
            pending = []
            pos = m.end()
            continue
        if c in b" \t\r\n[]":
            pos += 1
            continue
        # any other token (numbers, names, non-showing operators): skip.
        # Strings only reach ``shown`` through a show operator, so a
        # string operand of e.g. a marked-content op would be dropped at
        # the next flush — acceptable for text recovery, which is the
        # contract here.
        m2 = re.match(rb"[^\s()<\[\]]+", data[pos:])
        pos += m2.end() if m2 else 1
    return shown


def extract_pdf_text(payload: bytes) -> list:
    """Extract per-page text lines.  Returns ``[[line, ...], ...]`` (one
    list per page, in page-tree order); line strings are the exact bytes
    shown, decoded as UTF-8."""
    if payload[:5] != b"%PDF-":
        raise ValueError("pdf: missing %PDF header")
    doc = _Doc(payload)
    root = doc.resolve(doc.trailer["Root"])
    pages: list[dict] = []
    _walk_pages(doc, doc.resolve(root["Pages"]), pages)
    out = []
    for p in pages:
        out.append([s.decode("utf-8") for s in _page_text(doc, p)])
    return out
