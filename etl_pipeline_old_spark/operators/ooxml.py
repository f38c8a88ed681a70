"""OOXML office documents (ECMA-376 / ISO 29500) — DOCX text and XLSX
cell extraction over the engine's own ZIP layer, pure stdlib.

Why this exists: after PDF and HTML, Office documents are the next
biggest slice of any real document corpus — procurement archives,
reports, spreadsheets of reference data.  An OOXML file is a ZIP
package (operators/pkzip.py reads it natively, zip64 included) whose
parts are XML; the text lives in ``word/document.xml`` (WordprocessingML)
and worksheet cells in ``xl/worksheets/*.xml`` (SpreadsheetML) with an
optional shared-string table.  Both the writers (fixture staging) and
the extractors are implemented from the public ECMA-376 part structure.

Extraction semantics (the parts that silently garble text if skipped):

- A paragraph's text is SPLIT across arbitrarily many runs (``w:r``) —
  real producers fragment mid-word around formatting changes.  The
  writer here fragments deterministically so reassembly is proven, and
  ``xml:space="preserve"`` is honored (unmarked w:t whitespace-only
  content is producer-dependent; this writer always marks).
- ``w:tab`` and ``w:br``/``w:cr`` are ELEMENTS, not characters — they
  map to ``\\t`` and ``\\n`` in the recovered text.
- XLSX cell values are typed: numeric (no ``t``), shared-string
  (``t="s"``, the value is an INDEX into ``xl/sharedStrings.xml`` —
  resolving it wrong yields numbers where text should be), inline
  (``t="inlineStr"``), and boolean (``t="b"``).  Cell references are
  A1-notation; the column walk must decode them, not assume density.

Damage (missing parts, malformed XML, out-of-range shared-string
index, unknown cell type) raises ValueError — one document costs one
record, never the job.  stdlib ElementTree does not resolve external
entities, so hostile XML cannot reach the filesystem; DOCTYPE
declarations are rejected outright (ECMA-376 Part 2 §9.1 forbids DTDs
in OPC parts), which also forecloses entity-expansion amplification
regardless of the platform expat's own limits.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from .pkzip import read_zip, write_zip

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_CT = "http://schemas.openxmlformats.org/package/2006/content-types"
_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_RDOC = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)

_XMLDECL = b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'


def parse_part_xml(data: bytes, what: str):
    """ElementTree parse with the OPC DTD prohibition enforced: a part
    carrying ``<!DOCTYPE`` is rejected loudly (ECMA-376 Part 2 forbids
    DTDs; accepting them would admit entity-expansion bombs)."""
    if b"<!DOCTYPE" in data[:1024]:
        raise ValueError(f"{what}: DOCTYPE in an OPC part (forbidden)")
    try:
        return ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"{what}: malformed XML ({exc})") from exc


# ------------------------------------------------------------------ DOCX
def _docx_runs(text: str) -> str:
    """Fragment ``text`` into runs of uneven length (3,7,5,3,7,5,...) —
    the deterministic stand-in for real producers' arbitrary run
    splits — encoding tabs and newlines as their OOXML elements."""
    out = []
    for piece in re.split(r"([\t\n])", text):
        if piece == "\t":
            out.append("<w:r><w:tab/></w:r>")
        elif piece == "\n":
            out.append("<w:r><w:br/></w:r>")
        elif piece:
            i, sizes = 0, (3, 7, 5)
            k = 0
            while i < len(piece):
                chunk = piece[i : i + sizes[k % 3]]
                i += len(chunk)
                k += 1
                out.append(
                    '<w:r><w:t xml:space="preserve">%s</w:t></w:r>'
                    % escape(chunk)
                )
    return "".join(out)


def _notes_xml(root_tag: str, note_tag: str, notes: list) -> bytes:
    """Serialize word/footnotes.xml or word/endnotes.xml: the two
    SEPARATOR notes every real producer emits first (w:type'd, ids -1
    and 0 — extraction must skip them or every document grows phantom
    text), then one regular note per entry at ids 2, 3, ..."""
    parts = [
        '<w:%s w:type="separator" w:id="-1"><w:p><w:r><w:separator/>'
        "</w:r></w:p></w:%s>" % (note_tag, note_tag),
        '<w:%s w:type="continuationSeparator" w:id="0"><w:p><w:r>'
        "<w:continuationSeparator/></w:r></w:p></w:%s>"
        % (note_tag, note_tag),
    ]
    for i, text in enumerate(notes):
        parts.append(
            '<w:%s w:id="%d"><w:p>%s</w:p></w:%s>'
            % (note_tag, i + 2, _docx_runs(text), note_tag)
        )
    return _XMLDECL + (
        '<w:%s xmlns:w="%s">%s</w:%s>'
        % (root_tag, _W, "".join(parts), root_tag)
    ).encode("utf-8")


def write_docx(
    paragraphs: list,
    header: list | None = None,
    footer: list | None = None,
    footnotes: list | None = None,
    endnotes: list | None = None,
) -> bytes:
    """Serialize paragraphs (strings; ``\\t``/``\\n`` become w:tab/w:br)
    into a minimal spec-valid .docx package.  Optional auxiliary parts
    (each a list of paragraph/note strings) are wired the way real
    producers do: header/footer parts referenced from a trailing
    ``w:sectPr``, footnotes/endnotes parts carrying the conventional
    separator notes plus in-body ``w:footnoteReference`` /
    ``w:endnoteReference`` runs, all declared in
    ``word/_rels/document.xml.rels`` and ``[Content_Types].xml``."""
    note_refs = "".join(
        '<w:r><w:footnoteReference w:id="%d"/></w:r>' % (i + 2)
        for i in range(len(footnotes or []))
    ) + "".join(
        '<w:r><w:endnoteReference w:id="%d"/></w:r>' % (i + 2)
        for i in range(len(endnotes or []))
    )
    paras = list(paragraphs)
    body = "".join(
        "<w:p>%s%s</w:p>"
        % (_docx_runs(p), note_refs if i == 0 else "")
        for i, p in enumerate(paras)
    )
    doc_rels: list[tuple[str, str, str]] = []  # (rid, type-suffix, target)
    extra_parts: list[tuple[str, bytes]] = []
    overrides = []
    sect = []
    if header is not None:
        doc_rels.append(("rIdH1", "header", "header1.xml"))
        extra_parts.append((
            "word/header1.xml",
            _XMLDECL + ('<w:hdr xmlns:w="%s">%s</w:hdr>' % (
                _W, "".join("<w:p>%s</w:p>" % _docx_runs(p) for p in header)
            )).encode("utf-8"),
        ))
        overrides.append((
            "/word/header1.xml",
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.header+xml",
        ))
        sect.append('<w:headerReference w:type="default" r:id="rIdH1"/>')
    if footer is not None:
        doc_rels.append(("rIdF1", "footer", "footer1.xml"))
        extra_parts.append((
            "word/footer1.xml",
            _XMLDECL + ('<w:ftr xmlns:w="%s">%s</w:ftr>' % (
                _W, "".join("<w:p>%s</w:p>" % _docx_runs(p) for p in footer)
            )).encode("utf-8"),
        ))
        overrides.append((
            "/word/footer1.xml",
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.footer+xml",
        ))
        sect.append('<w:footerReference w:type="default" r:id="rIdF1"/>')
    if footnotes is not None:
        doc_rels.append(("rIdFN", "footnotes", "footnotes.xml"))
        extra_parts.append((
            "word/footnotes.xml",
            _notes_xml("footnotes", "footnote", footnotes),
        ))
        overrides.append((
            "/word/footnotes.xml",
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.footnotes+xml",
        ))
    if endnotes is not None:
        doc_rels.append(("rIdEN", "endnotes", "endnotes.xml"))
        extra_parts.append((
            "word/endnotes.xml",
            _notes_xml("endnotes", "endnote", endnotes),
        ))
        overrides.append((
            "/word/endnotes.xml",
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.endnotes+xml",
        ))
    if sect:
        body += "<w:sectPr>%s</w:sectPr>" % "".join(sect)
    document = _XMLDECL + (
        '<w:document xmlns:w="%s" xmlns:r="%s"><w:body>%s</w:body>'
        "</w:document>" % (_W, _RDOC, body)
    ).encode("utf-8")
    content_types = _XMLDECL + (
        ('<Types xmlns="%s">' % _CT)
        + '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        "vnd.openxmlformats-officedocument.wordprocessingml.document.main"
        '+xml"/>'
        + "".join(
            '<Override PartName="%s" ContentType="%s"/>' % (pn, ct)
            for pn, ct in overrides
        )
        + "</Types>"
    ).encode("utf-8")
    rels = _XMLDECL + (
        '<Relationships xmlns="%s">'
        '<Relationship Id="rId1" Type="%s/officeDocument" '
        'Target="word/document.xml"/>'
        "</Relationships>" % (_REL, _RDOC)
    ).encode("utf-8")
    files = [
        ("[Content_Types].xml", content_types, "deflated"),
        ("_rels/.rels", rels, "deflated"),
        ("word/document.xml", document, "deflated"),
    ]
    if doc_rels:
        drels = _XMLDECL + (
            '<Relationships xmlns="%s">' % _REL
            + "".join(
                '<Relationship Id="%s" Type="%s/%s" Target="%s"/>'
                % (rid, _RDOC, suffix, target)
                for rid, suffix, target in doc_rels
            )
            + "</Relationships>"
        ).encode("utf-8")
        files.append(("word/_rels/document.xml.rels", drels, "deflated"))
    files += [(name, data, "deflated") for name, data in extra_parts]
    return write_zip(files)


def _docx_paras_of(root) -> list:
    """Reassemble every ``w:p`` under ``root`` in document order: runs
    joined, w:tab → ``\\t``, w:br/w:cr → ``\\n``."""
    out = []
    for p in root.iter(f"{{{_W}}}p"):
        frags = []
        for el in p.iter():
            tag = el.tag
            if tag == f"{{{_W}}}t":
                frags.append(el.text or "")
            elif tag == f"{{{_W}}}tab":
                frags.append("\t")
            elif tag in (f"{{{_W}}}br", f"{{{_W}}}cr"):
                frags.append("\n")
        out.append("".join(frags))
    return out


def extract_docx_text(blob: bytes) -> list:
    """Extract paragraphs from a .docx: one string per ``w:p`` in
    document order (table-cell paragraphs included — they ARE w:p
    elements), runs reassembled, w:tab → ``\\t``, w:br/w:cr → ``\\n``.

    Auxiliary story parts carry real body text in real corpora
    (footnotes especially), so parts referenced from
    ``word/_rels/document.xml.rels`` are walked too, appended in a
    DETERMINISTIC order after the body: headers (by target name),
    footers, footnotes, endnotes.  Separator/continuation notes (the
    ``w:type``-attributed ones every producer emits) are skipped —
    they are layout artifacts, not text.  A relationship whose target
    part is missing from the package raises."""
    parts = {name: data for name, data, _m in read_zip(blob)}
    if "word/document.xml" not in parts:
        raise ValueError("docx: package has no word/document.xml part")
    root = parse_part_xml(parts["word/document.xml"], "docx: malformed document")
    body = root.find(f"{{{_W}}}body")
    if body is None:
        raise ValueError("docx: document has no w:body")
    out = _docx_paras_of(body)
    rels_data = parts.get("word/_rels/document.xml.rels")
    if rels_data is None:
        return out
    rroot = parse_part_xml(rels_data, "docx: malformed document rels")
    by_kind: dict[str, list[str]] = {
        "header": [], "footer": [], "footnotes": [], "endnotes": [],
    }
    for rel in rroot.iter(f"{{{_REL}}}Relationship"):
        if rel.get("TargetMode") == "External":
            continue
        kind = (rel.get("Type") or "").rsplit("/", 1)[-1]
        if kind not in by_kind:
            continue
        target = rel.get("Target") or ""
        # targets are part-relative (to word/); absolute ones keep the
        # leading-slash package path
        name = target.lstrip("/") if target.startswith("/") else (
            "word/" + target
        )
        if name not in parts:
            raise ValueError(f"docx: rels references missing part {name}")
        by_kind[kind].append(name)
    for kind in ("header", "footer"):
        for name in sorted(by_kind[kind]):
            out += _docx_paras_of(
                parse_part_xml(parts[name], f"docx: malformed {name}")
            )
    for kind, tag in (("footnotes", "footnote"), ("endnotes", "endnote")):
        for name in sorted(by_kind[kind]):
            nroot = parse_part_xml(parts[name], f"docx: malformed {name}")
            for note in nroot.iter(f"{{{_W}}}{tag}"):
                if note.get(f"{{{_W}}}type") is not None:
                    continue  # separator/continuationSeparator
                out += _docx_paras_of(note)
    return out


# ------------------------------------------------------------------ XLSX
def _col_letters(idx: int) -> str:
    """0-based column index → A1 letters (0→A, 25→Z, 26→AA)."""
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def col_index(ref: str) -> int:
    """A1-notation cell reference → 0-based column index."""
    m = re.match(r"([A-Z]+)\d+$", ref)
    if not m:
        raise ValueError(f"xlsx: malformed cell reference {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(rows: list) -> bytes:
    """Serialize ``rows`` (lists of cell values: int/float → numeric,
    bool → boolean, str → SHARED string for repeats / inline for
    first-sight, None → skipped cell) into a minimal .xlsx.  Strings
    seen more than once go through the shared-string table — the
    real-world layout that makes resolution mandatory."""
    seen: dict = {}
    for row in rows:
        for v in row:
            if isinstance(v, str):
                seen[v] = seen.get(v, 0) + 1
    shared: dict = {}
    for row in rows:
        for v in row:
            if isinstance(v, str) and seen[v] > 1 and v not in shared:
                shared[v] = len(shared)

    cells_xml = []
    for r, row in enumerate(rows, start=1):
        cs = []
        for j, v in enumerate(row):
            if v is None:
                continue  # sparse rows: the reader must honor cell refs
            ref = f"{_col_letters(j)}{r}"
            if isinstance(v, bool):
                cs.append('<c r="%s" t="b"><v>%d</v></c>' % (ref, int(v)))
            elif isinstance(v, (int, float)):
                num = repr(v) if isinstance(v, float) else str(v)
                cs.append('<c r="%s"><v>%s</v></c>' % (ref, num))
            elif v in shared:
                cs.append(
                    '<c r="%s" t="s"><v>%d</v></c>' % (ref, shared[v])
                )
            else:
                cs.append(
                    '<c r="%s" t="inlineStr"><is><t xml:space="preserve">'
                    "%s</t></is></c>" % (ref, escape(v))
                )
        cells_xml.append('<row r="%d">%s</row>' % (r, "".join(cs)))
    sheet = _XMLDECL + (
        '<worksheet xmlns="%s"><sheetData>%s</sheetData></worksheet>'
        % (_S, "".join(cells_xml))
    ).encode("utf-8")
    sst = _XMLDECL + (
        '<sst xmlns="%s" count="%d" uniqueCount="%d">%s</sst>'
        % (
            _S, sum(seen[s] for s in shared), len(shared),
            "".join(
                '<si><t xml:space="preserve">%s</t></si>' % escape(s)
                for s in sorted(shared, key=shared.get)
            ),
        )
    ).encode("utf-8")
    workbook = _XMLDECL + (
        '<workbook xmlns="%s" xmlns:r="%s"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>" % (_S, _RDOC)
    ).encode("utf-8")
    wb_rels = _XMLDECL + (
        '<Relationships xmlns="%s">'
        '<Relationship Id="rId1" Type="%s/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="%s/sharedStrings" '
        'Target="sharedStrings.xml"/>'
        "</Relationships>" % (_REL, _RDOC, _RDOC)
    ).encode("utf-8")
    rels = _XMLDECL + (
        '<Relationships xmlns="%s">'
        '<Relationship Id="rId1" Type="%s/officeDocument" '
        'Target="xl/workbook.xml"/>'
        "</Relationships>" % (_REL, _RDOC)
    ).encode("utf-8")
    content_types = _XMLDECL + (
        '<Types xmlns="%s">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="'
        "application/vnd.openxmlformats-officedocument.spreadsheetml."
        'worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="'
        "application/vnd.openxmlformats-officedocument.spreadsheetml."
        'sharedStrings+xml"/>'
        "</Types>" % _CT
    ).encode("utf-8")
    return write_zip(
        [
            ("[Content_Types].xml", content_types, "deflated"),
            ("_rels/.rels", rels, "deflated"),
            ("xl/workbook.xml", workbook, "deflated"),
            ("xl/_rels/workbook.xml.rels", wb_rels, "deflated"),
            ("xl/worksheets/sheet1.xml", sheet, "deflated"),
            ("xl/sharedStrings.xml", sst, "deflated"),
        ]
    )


def extract_xlsx_cells(blob: bytes) -> list:
    """Extract typed cells from every worksheet part:
    ``[(sheet, row, col, kind, value)]`` with ``kind`` one of
    ``num``/``str``/``bool`` and ``value`` the string rendering
    (numbers as written, shared/inline strings RESOLVED).  Rows/cols
    are 1-based/0-based per A1 decode; sparse cells simply absent."""
    parts = {name: data for name, data, _m in read_zip(blob)}
    shared = []
    if "xl/sharedStrings.xml" in parts:
        sst = parse_part_xml(
            parts["xl/sharedStrings.xml"], "xlsx: malformed sharedStrings"
        )
        for si in sst.iter(f"{{{_S}}}si"):
            # an si may fragment its text across rich-text runs
            shared.append(
                "".join(t.text or "" for t in si.iter(f"{{{_S}}}t"))
            )
    sheets = sorted(
        n for n in parts
        if n.startswith("xl/worksheets/") and n.endswith(".xml")
    )
    if not sheets:
        raise ValueError("xlsx: package has no worksheet parts")
    out = []
    for name in sheets:
        ws = parse_part_xml(parts[name], "xlsx: malformed worksheet")
        sheet_id = name[len("xl/worksheets/") : -len(".xml")]
        for row in ws.iter(f"{{{_S}}}row"):
            r = int(row.get("r", "0"))
            for c in row.findall(f"{{{_S}}}c"):
                ref = c.get("r")
                if ref is None:
                    raise ValueError("xlsx: cell without a reference")
                col = col_index(ref)
                t = c.get("t", "n")
                if t == "inlineStr":
                    is_el = c.find(f"{{{_S}}}is")
                    val = "" if is_el is None else "".join(
                        x.text or "" for x in is_el.iter(f"{{{_S}}}t")
                    )
                    out.append((sheet_id, r, col, "str", val))
                    continue
                v_el = c.find(f"{{{_S}}}v")
                if v_el is None:
                    continue  # an empty typed cell carries no value
                raw = v_el.text or ""
                if t == "s":
                    idx = int(raw)
                    if not 0 <= idx < len(shared):
                        raise ValueError(
                            f"xlsx: shared-string index {idx} out of range"
                        )
                    out.append((sheet_id, r, col, "str", shared[idx]))
                elif t == "b":
                    out.append((sheet_id, r, col, "bool", raw))
                elif t in ("n", "str"):
                    # 'str' is a cached formula RESULT — text, but kept
                    # distinct from 'n' only by kind tag
                    kind = "num" if t == "n" else "str"
                    out.append((sheet_id, r, col, kind, raw))
                else:
                    raise ValueError(f"xlsx: unsupported cell type {t!r}")
    return out


# ------------------------------------------------------------------ PPTX
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"


def write_pptx(slides: list) -> bytes:
    """Serialize slides (each a list of paragraph strings) into a
    minimal spec-valid .pptx: one text shape per slide whose paragraphs
    fragment across uneven a:r runs exactly like the DOCX writer —
    PresentationML text extraction has the same reassembly obligation."""
    members = []
    slide_overrides = []
    sld_ids = []
    rels = []
    for i, paras in enumerate(slides, start=1):
        paras_xml = []
        for ptext in paras:
            runs = []
            j, sizes, k = 0, (3, 7, 5), 0
            if not ptext:
                runs.append("<a:r><a:t></a:t></a:r>")
            while j < len(ptext):
                chunk = ptext[j : j + sizes[k % 3]]
                j += len(chunk)
                k += 1
                runs.append("<a:r><a:t>%s</a:t></a:r>" % escape(chunk))
            paras_xml.append("<a:p>%s</a:p>" % "".join(runs))
        slide = _XMLDECL + (
            '<p:sld xmlns:p="%s" xmlns:a="%s"><p:cSld><p:spTree>'
            "<p:sp><p:txBody>%s</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
            % (_P, _A, "".join(paras_xml))
        ).encode("utf-8")
        members.append(
            (f"ppt/slides/slide{i}.xml", slide, "deflated")
        )
        slide_overrides.append(
            '<Override PartName="/ppt/slides/slide%d.xml" ContentType="'
            "application/vnd.openxmlformats-officedocument.presentationml."
            'slide+xml"/>' % i
        )
        sld_ids.append('<p:sldId id="%d" r:id="rId%d"/>' % (255 + i, i))
        rels.append(
            '<Relationship Id="rId%d" Type="%s/slide" '
            'Target="slides/slide%d.xml"/>' % (i, _RDOC, i)
        )
    presentation = _XMLDECL + (
        '<p:presentation xmlns:p="%s" xmlns:r="%s"><p:sldIdLst>%s'
        "</p:sldIdLst></p:presentation>"
        % (_P, _RDOC, "".join(sld_ids))
    ).encode("utf-8")
    content_types = _XMLDECL + (
        '<Types xmlns="%s">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType="'
        "application/vnd.openxmlformats-officedocument.presentationml."
        'presentation.main+xml"/>%s'
        "</Types>" % (_CT, "".join(slide_overrides))
    ).encode("utf-8")
    pkg_rels = _XMLDECL + (
        '<Relationships xmlns="%s">'
        '<Relationship Id="rId1" Type="%s/officeDocument" '
        'Target="ppt/presentation.xml"/>'
        "</Relationships>" % (_REL, _RDOC)
    ).encode("utf-8")
    ppt_rels = _XMLDECL + (
        '<Relationships xmlns="%s">%s</Relationships>'
        % (_REL, "".join(rels))
    ).encode("utf-8")
    return write_zip(
        [
            ("[Content_Types].xml", content_types, "deflated"),
            ("_rels/.rels", pkg_rels, "deflated"),
            ("ppt/presentation.xml", presentation, "deflated"),
            ("ppt/_rels/presentation.xml.rels", ppt_rels, "deflated"),
        ]
        + members
    )


def extract_pptx_text(blob: bytes) -> list:
    """Extract slide text: one list of paragraph strings per slide, in
    slide-NUMBER order (the part names carry the order; directory order
    is a producer accident, never trusted).  a:t runs reassemble per
    a:p; a:br becomes ``\\n`` inside its paragraph."""
    parts = {name: data for name, data, _m in read_zip(blob)}
    slide_names = []
    for name in parts:
        m = re.match(r"ppt/slides/slide(\d+)\.xml$", name)
        if m:
            slide_names.append((int(m.group(1)), name))
    if not slide_names:
        raise ValueError("pptx: package has no slide parts")
    out = []
    for _num, name in sorted(slide_names):
        root = parse_part_xml(parts[name], "pptx: malformed slide")
        paras = []
        for p in root.iter(f"{{{_A}}}p"):
            frags = []
            for el in p.iter():
                if el.tag == f"{{{_A}}}t":
                    frags.append(el.text or "")
                elif el.tag == f"{{{_A}}}br":
                    frags.append("\n")
            paras.append("".join(frags))
        out.append(paras)
    return out
