"""OpenDocument (ODF, OASIS OpenDocument 1.2 — ISO/IEC 26300) text and
spreadsheet extraction over the engine's own ZIP layer, pure stdlib —
the third real-world office family beside OOXML (operators/ooxml.py)
and the legacy CFB binaries (operators/cfb.py): LibreOffice/OpenOffice
output, government and academic archives are full of .odt/.ods.

An ODF file is a ZIP package whose FIRST member must be ``mimetype``,
STORED uncompressed with the exact media type (ODF 1.2 Part 3 §3.3 —
the same magic-sniffing contract as EPUB's OCF); the document lives in
``content.xml``.  The extraction semantics that silently garble text
if skipped:

- Whitespace is ENCODED, not literal: runs of spaces ship as
  ``<text:s text:c="n"/>``, tabs as ``<text:tab/>``, newlines as
  ``<text:line-break/>`` (ODF 1.2 Part 1 §6.1.2-6.1.5).  A reader
  that only concatenates text nodes collapses them all.
- Paragraph text is split across ``text:span`` style runs (and spans
  nest); ``text:h`` headings are paragraphs too, carrying
  ``text:outline-level``.
- .ods cells are TYPED through attributes: a float cell's text content
  is the locale-FORMATTED display string — the value lives in
  ``office:value``; booleans in ``office:boolean-value``; only string
  cells carry their value as ``text:p`` content.  And
  ``table:number-columns-repeated`` multiplies a cell — ignoring it
  shifts every later column.

Writers stage spec-valid packages (manifest, stored-first mimetype,
both encodings of whitespace, repeated cells); damage (missing or
mis-stored mimetype, malformed XML, unknown value types) raises
ValueError — one document costs one record.  DOCTYPE in any part is
rejected (entity-expansion hygiene, the ooxml.py rule).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from .pkzip import read_zip, write_zip

_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_MANIFEST = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"

_MIME_ODT = "application/vnd.oasis.opendocument.text"
_MIME_ODS = "application/vnd.oasis.opendocument.spreadsheet"

_XMLDECL = b'<?xml version="1.0" encoding="UTF-8"?>\n'


def _manifest(mime: str, parts: list[str]) -> bytes:
    rows = "".join(
        '<manifest:file-entry manifest:full-path="%s" '
        'manifest:media-type="text/xml"/>' % p
        for p in parts
    )
    return _XMLDECL + (
        '<manifest:manifest xmlns:manifest="%s">'
        '<manifest:file-entry manifest:full-path="/" '
        'manifest:media-type="%s"/>%s</manifest:manifest>'
        % (_MANIFEST, mime, rows)
    ).encode("utf-8")


def _odt_par_xml(text: str) -> str:
    """One paragraph's content with ODF whitespace encoding: runs of
    2+ spaces become ``<text:s text:c>``, tabs/newlines their
    elements, and the remainder split across text:span runs (3,7,5
    chars — the ooxml.py convention) so reassembly is proven."""
    out = []
    for piece in re.split(r"(\t|\n| {2,})", text):
        if piece == "\t":
            out.append("<text:tab/>")
        elif piece == "\n":
            out.append("<text:line-break/>")
        elif piece and piece == " " * len(piece) and len(piece) >= 2:
            out.append('<text:s text:c="%d"/>' % len(piece))
        elif piece:
            i, sizes, k = 0, (3, 7, 5), 0
            while i < len(piece):
                chunk = piece[i : i + sizes[k % 3]]
                i += len(chunk)
                k += 1
                out.append("<text:span>%s</text:span>" % escape(chunk))
    return "".join(out)


def write_odt(paragraphs: list, heading_every: int = 4) -> bytes:
    """A spec-valid .odt: stored-first mimetype, manifest, and a
    content.xml whose paragraphs alternate ``text:p`` with ``text:h``
    headings (every ``heading_every``-th), text split across spans
    with encoded whitespace."""
    body = []
    for i, para in enumerate(paragraphs):
        if heading_every and i % heading_every == 0:
            body.append(
                '<text:h text:outline-level="%d">%s</text:h>'
                % (i % 3 + 1, _odt_par_xml(para))
            )
        else:
            body.append("<text:p>%s</text:p>" % _odt_par_xml(para))
    content = _XMLDECL + (
        '<office:document-content xmlns:office="%s" xmlns:text="%s">'
        "<office:body><office:text>%s</office:text></office:body>"
        "</office:document-content>" % (_OFFICE, _TEXT, "".join(body))
    ).encode("utf-8")
    return write_zip(
        [
            ("mimetype", _MIME_ODT.encode("ascii"), "stored"),
            ("content.xml", content, "deflated"),
            ("META-INF/manifest.xml", _manifest(_MIME_ODT, ["content.xml"]),
             "deflated"),
        ]
    )


def write_ods(rows: list) -> bytes:
    """A spec-valid .ods: one table whose cells are TYPED —
    ``float`` values live in office:value (the text content is a
    deliberately DIFFERENT display string, so attribute-blind readers
    fail), ``boolean`` in office:boolean-value, strings as text:p
    content; None runs compress into table:number-columns-repeated
    empty cells."""
    body = []
    for row in rows:
        cells, j = [], 0
        while j < len(row):
            v = row[j]
            if v is None:
                k = j
                while k < len(row) and row[k] is None:
                    k += 1
                n = k - j
                cells.append(
                    '<table:table-cell table:number-columns-repeated'
                    '="%d"/>' % n if n > 1 else "<table:table-cell/>"
                )
                j = k
                continue
            if isinstance(v, bool):
                cells.append(
                    '<table:table-cell office:value-type="boolean" '
                    'office:boolean-value="%s"><text:p>%s</text:p>'
                    "</table:table-cell>"
                    % (str(v).lower(), "TRUE" if v else "FALSE")
                )
            elif isinstance(v, (int, float)):
                cells.append(
                    '<table:table-cell office:value-type="float" '
                    'office:value="%r"><text:p>%s</text:p>'
                    "</table:table-cell>"
                    # display string differs from the value on purpose
                    % (float(v), escape(f"~{v}~"))
                )
            else:
                cells.append(
                    '<table:table-cell office:value-type="string">'
                    "<text:p>%s</text:p></table:table-cell>" % escape(v)
                )
            j += 1
        body.append(
            "<table:table-row>%s</table:table-row>" % "".join(cells)
        )
    content = _XMLDECL + (
        '<office:document-content xmlns:office="%s" xmlns:text="%s" '
        'xmlns:table="%s"><office:body><office:spreadsheet>'
        '<table:table table:name="Sheet1">%s</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
        % (_OFFICE, _TEXT, _TABLE, "".join(body))
    ).encode("utf-8")
    return write_zip(
        [
            ("mimetype", _MIME_ODS.encode("ascii"), "stored"),
            ("content.xml", content, "deflated"),
            ("META-INF/manifest.xml", _manifest(_MIME_ODS, ["content.xml"]),
             "deflated"),
        ]
    )


def _open_odf(blob: bytes, want_mime: str) -> ET.Element:
    members = read_zip(blob)
    if not members or members[0][0] != "mimetype":
        raise ValueError("odf: first member must be mimetype")
    name, data, method = members[0]
    if method != "stored":
        raise ValueError("odf: mimetype member must be STORED")
    if data.decode("ascii", "replace") != want_mime:
        raise ValueError(f"odf: unexpected media type {data[:64]!r}")
    parts = {n: d for n, d, _m in members}
    content = parts.get("content.xml")
    if content is None:
        raise ValueError("odf: content.xml missing")
    if b"<!DOCTYPE" in content[:1024]:
        raise ValueError("odf: DOCTYPE in a package part (forbidden)")
    try:
        return ET.fromstring(content)
    except ET.ParseError as exc:
        raise ValueError(f"odf: malformed content.xml ({exc})") from exc


def _para_text(el: ET.Element) -> str:
    """Reassemble one text:p / text:h with ODF whitespace decoding,
    descending through nested spans."""
    out: list[str] = []

    def walk(node: ET.Element) -> None:
        if node.text:
            out.append(node.text)
        for child in node:
            tag = child.tag
            if tag == f"{{{_TEXT}}}s":
                out.append(" " * int(child.get(f"{{{_TEXT}}}c", "1")))
            elif tag == f"{{{_TEXT}}}tab":
                out.append("\t")
            elif tag == f"{{{_TEXT}}}line-break":
                out.append("\n")
            else:
                walk(child)
            if child.tail:
                out.append(child.tail)

    walk(el)
    return "".join(out)


def extract_odt_text(blob: bytes) -> list:
    """[(kind, outline_level, text)] per paragraph in document order —
    kind 'h' for headings (text:h, with their outline level) and 'p'
    for body paragraphs."""
    root = _open_odf(blob, _MIME_ODT)
    office_text = root.find(
        f"{{{_OFFICE}}}body/{{{_OFFICE}}}text"
    )
    if office_text is None:
        raise ValueError("odt: office:text body missing")
    out = []
    for el in office_text:
        if el.tag == f"{{{_TEXT}}}p":
            out.append(("p", 0, _para_text(el)))
        elif el.tag == f"{{{_TEXT}}}h":
            lvl = int(el.get(f"{{{_TEXT}}}outline-level", "1"))
            out.append(("h", lvl, _para_text(el)))
    return out


def extract_ods_cells(blob: bytes) -> list:
    """Rows of typed cells: floats from office:value (NEVER the
    display string), booleans from office:boolean-value, strings from
    text:p content, None for empty — with
    table:number-columns-repeated expanded so columns line up."""
    root = _open_odf(blob, _MIME_ODS)
    sheet = root.find(
        f"{{{_OFFICE}}}body/{{{_OFFICE}}}spreadsheet/{{{_TABLE}}}table"
    )
    if sheet is None:
        raise ValueError("ods: table:table missing")
    rows = []
    for row_el in sheet.findall(f"{{{_TABLE}}}table-row"):
        row: list = []
        for cell in row_el.findall(f"{{{_TABLE}}}table-cell"):
            rep = int(
                cell.get(f"{{{_TABLE}}}number-columns-repeated", "1")
            )
            vtype = cell.get(f"{{{_OFFICE}}}value-type")
            if vtype is None:
                value = None
            elif vtype == "float":
                raw = cell.get(f"{{{_OFFICE}}}value")
                if raw is None:
                    raise ValueError("ods: float cell without office:value")
                value = float(raw)
            elif vtype == "boolean":
                raw = cell.get(f"{{{_OFFICE}}}boolean-value")
                if raw not in ("true", "false"):
                    raise ValueError(
                        f"ods: bad boolean-value {raw!r}"
                    )
                value = raw == "true"
            elif vtype == "string":
                value = "\n".join(
                    _para_text(p)
                    for p in cell.findall(f"{{{_TEXT}}}p")
                )
            else:
                raise NotImplementedError(
                    f"ods: value-type {vtype!r} unsupported — "
                    "float/boolean/string decode natively"
                )
            row.extend([value] * rep)
        rows.append(row)
    return rows
