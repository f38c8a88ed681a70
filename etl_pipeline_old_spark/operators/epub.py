"""EPUB (IDPF/W3C Open Container + Package) text extraction — pure
stdlib, over the engine's own ZIP layer.

Why this exists: books are the long-document backbone of pretraining
corpora, and they ship as EPUB — an OCF ZIP container whose reading
order is DATA, not directory layout.  The parts that silently corrupt
a book corpus when skipped:

- **Reading order lives in the OPF spine.**  Chapter files are found
  via META-INF/container.xml → the package document (.opf) → manifest
  (id → href) → spine (idref sequence).  Extracting members in
  directory order shuffles chapters — the writer here deliberately
  names chapter files in REVERSE so a directory-order walk fails the
  byte-exact oracle.
- **hrefs resolve relative to the OPF document's directory**, not the
  archive root.
- **The ``mimetype`` member** must be first and STORED with the exact
  ASCII payload ``application/epub+zip`` (OCF §3.3); its absence marks
  a broken container and raises.
- Chapter content is XHTML: paragraph text collects via document-order
  descent so inline markup (``<em>``, ``<a>``) cannot drop text.

Damage (missing container/OPF/chapter parts, malformed XML, a spine
idref without a manifest entry) raises ValueError — one book costs one
record, never the job.
"""

from __future__ import annotations

import posixpath
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from .pkzip import read_zip, write_zip

_CNT = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF = "http://www.idpf.org/2007/opf"
_DC = "http://purl.org/dc/elements/1.1/"
_XHTML = "http://www.w3.org/1999/xhtml"

_MIMETYPE = b"application/epub+zip"
_XMLDECL = b'<?xml version="1.0" encoding="UTF-8"?>\n'


def write_epub(chapters: list, title: str = "doc") -> bytes:
    """Serialize ``chapters`` (each a list of paragraph strings) into a
    minimal spec-valid EPUB.  Chapter FILES are named in reverse
    (chapter N-1 first) while the spine lists them in true reading
    order — extraction must honor the spine or the oracle's byte-exact
    check fails."""
    n = len(chapters)
    members = [("mimetype", _MIMETYPE, "stored")]  # first + stored per OCF
    container = _XMLDECL + (
        '<container version="1.0" xmlns="%s"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>" % _CNT
    ).encode("utf-8")
    members.append(("META-INF/container.xml", container, "deflated"))
    items, spine = [], []
    for i, paras in enumerate(chapters):
        # reverse file naming: reading order != name order != zip order
        fname = f"text/part{n - 1 - i}.xhtml"
        body = "".join(
            "<p>%s</p>" % escape(p).replace("\n", "<br/>") for p in paras
        )
        xhtml = _XMLDECL + (
            '<html xmlns="%s"><head><title>c%d</title></head>'
            "<body>%s</body></html>" % (_XHTML, i, body)
        ).encode("utf-8")
        members.append((f"OEBPS/{fname}", xhtml, "deflated"))
        items.append(
            '<item id="c%d" href="%s" media-type="application/'
            'xhtml+xml"/>' % (i, fname)
        )
        spine.append('<itemref idref="c%d"/>' % i)
    opf = _XMLDECL + (
        '<package xmlns="%s" version="3.0" unique-identifier="uid">'
        '<metadata xmlns:dc="%s"><dc:identifier id="uid">%s</dc:identifier>'
        "<dc:title>%s</dc:title></metadata>"
        "<manifest>%s</manifest><spine>%s</spine></package>"
        % (
            _OPF, _DC, escape(title), escape(title),
            "".join(items), "".join(spine),
        )
    ).encode("utf-8")
    members.append(("OEBPS/content.opf", opf, "deflated"))
    return write_zip(members)


def _xml(parts: dict, name: str, what: str):
    if name not in parts:
        raise ValueError(f"epub: missing {what} part {name!r}")
    # DOCTYPE rejection: forecloses entity-expansion bombs (and EPUB 3
    # forbids DTDs in content documents; EPUB 2's XHTML doctype is not
    # needed to extract text)
    if b"<!DOCTYPE" in parts[name][:1024]:
        raise ValueError(f"epub: DOCTYPE in {what} part (rejected)")
    try:
        return ET.fromstring(parts[name])
    except ET.ParseError as exc:
        raise ValueError(f"epub: malformed {what} XML ({exc})") from exc


def extract_epub_text(blob: bytes) -> list:
    """Extract chapters in SPINE order: one list of paragraph strings
    per spine itemref.  ``<br/>`` maps back to ``\\n``; inline markup
    contributes its text via document-order descent."""
    parts = {name: data for name, data, _m in read_zip(blob)}
    if parts.get("mimetype") != _MIMETYPE:
        raise ValueError("epub: missing or wrong mimetype member (OCF 3.3)")
    container = _xml(parts, "META-INF/container.xml", "container")
    rf = container.find(f".//{{{_CNT}}}rootfile")
    if rf is None or not rf.get("full-path"):
        raise ValueError("epub: container has no rootfile")
    opf_path = rf.get("full-path")
    opf = _xml(parts, opf_path, "package")
    base = posixpath.dirname(opf_path)
    hrefs = {}
    for item in opf.iter(f"{{{_OPF}}}item"):
        hrefs[item.get("id")] = item.get("href")
    out = []
    for ref in opf.iter(f"{{{_OPF}}}itemref"):
        idref = ref.get("idref")
        href = hrefs.get(idref)
        if href is None:
            raise ValueError(
                f"epub: spine idref {idref!r} missing from the manifest"
            )
        name = posixpath.normpath(posixpath.join(base, href))
        doc = _xml(parts, name, "chapter")
        paras = []
        for p in doc.iter(f"{{{_XHTML}}}p"):
            frags = []
            # document-order descent: text before/inside/after inline
            # children, <br/> as newline
            def _walk(el):
                if el.tag == f"{{{_XHTML}}}br":
                    frags.append("\n")
                elif el.text:
                    frags.append(el.text)
                for ch in el:
                    _walk(ch)
                    if ch.tail:
                        frags.append(ch.tail)

            if p.text:
                frags.append(p.text)
            for ch in p:
                _walk(ch)
                if ch.tail:
                    frags.append(ch.tail)
            paras.append("".join(frags))
        out.append(paras)
    if not out:
        raise ValueError("epub: empty spine")
    return out
