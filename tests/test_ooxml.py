"""OOXML codec (operators/ooxml.py): DOCX run reassembly, XLSX typed
cells, and the loud-failure contract."""

from __future__ import annotations

import hashlib
import xml.etree.ElementTree as ET

import pytest

from etl_pipeline_old_spark.operators.ooxml import (
    _S, col_index, extract_docx_text, extract_xlsx_cells, write_docx,
    write_xlsx,
)
from etl_pipeline_old_spark.operators.pkzip import read_zip, write_zip


def test_docx_roundtrip_escaping_and_whitespace():
    paras = [
        'angle <brackets> & "quotes"',
        "  leading and trailing  ",
        "",
        "tab\tand\nbreak",
    ]
    assert extract_docx_text(write_docx(paras)) == paras


def test_docx_runs_are_fragmented():
    # the writer must split text across multiple w:r (reassembly proof)
    blob = write_docx(["twelve chars"])
    doc = dict((n, d) for n, d, _ in read_zip(blob))["word/document.xml"]
    assert doc.count(b"<w:r>") >= 3


def test_docx_deterministic_fuzz():
    for i in range(12):
        text = hashlib.sha256(f"docx{i}".encode()).hexdigest()[: i * 5]
        paras = [text[j : j + 7] for j in range(0, len(text), 7)] or [""]
        assert extract_docx_text(write_docx(paras)) == paras


def test_docx_table_paragraphs_extracted():
    # table-cell paragraphs are w:p elements too — document order walk
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="%s"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc>"
        "<w:p><w:r><w:t>cell</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>" % w
    ).encode()
    blob = write_docx(["x"])
    members = [
        (n, doc if n == "word/document.xml" else d, "deflated")
        for n, d, _m in read_zip(blob)
    ]
    assert extract_docx_text(write_zip(members)) == [
        "before", "cell", "after",
    ]


def test_docx_loud_failures():
    with pytest.raises(ValueError, match="no word/document.xml"):
        extract_docx_text(write_zip([("a.txt", b"x", "stored")]))
    blob = write_docx(["x"])
    members = [
        (n, b"<w:document" if n == "word/document.xml" else d, "deflated")
        for n, d, _m in read_zip(blob)
    ]
    with pytest.raises(ValueError, match="malformed"):
        extract_docx_text(write_zip(members))


def test_xlsx_typed_cells_and_sparse_rows():
    rows = [
        [1, 2.5, "alpha", None, "alpha"],
        [True, "beta", "alpha"],
        [],
        [None, -7],
    ]
    cells = extract_xlsx_cells(write_xlsx(rows))
    assert ("sheet1", 1, 0, "num", "1") in cells
    assert ("sheet1", 1, 1, "num", "2.5") in cells
    assert ("sheet1", 1, 4, "str", "alpha") in cells  # sparse: col 3 absent
    assert ("sheet1", 2, 0, "bool", "1") in cells
    assert ("sheet1", 4, 1, "num", "-7") in cells
    assert not any(r == 3 for _s, r, _c, _k, _v in cells)  # empty row


def test_xlsx_shared_vs_inline_routing():
    # 'dup' appears twice -> shared table; 'once' -> inline
    blob = write_xlsx([["dup", "once"], ["dup"]])
    parts = dict((n, d) for n, d, _ in read_zip(blob))
    sst = parts["xl/sharedStrings.xml"]
    assert b"dup" in sst and b"once" not in sst
    cells = extract_xlsx_cells(blob)
    vals = sorted(v for _s, _r, _c, k, v in cells if k == "str")
    assert vals == ["dup", "dup", "once"]


def test_xlsx_rich_text_shared_string_fragments():
    # a real-world si often fragments its text across rich-text runs —
    # the reader must concatenate every t under the si
    blob = write_xlsx([["dup"], ["dup"]])
    parts = {n: (d, m) for n, d, m in read_zip(blob)}
    sst = (
        '<?xml version="1.0"?><sst xmlns="%s" count="2" uniqueCount="1">'
        '<si><r><t>du</t></r><r><t xml:space="preserve">p!</t></r></si>'
        "</sst>" % _S
    ).encode()
    members = [
        (n, sst if n == "xl/sharedStrings.xml" else d, "deflated")
        for n, (d, _m) in parts.items()
    ]
    vals = [
        v for _s, _r, _c, k, v in extract_xlsx_cells(write_zip(members))
        if k == "str"
    ]
    assert vals == ["dup!", "dup!"]


def test_xlsx_loud_failures():
    blob = write_xlsx([["dup"], ["dup"]])
    parts = {n: d for n, d, _m in read_zip(blob)}
    # shared index out of range
    sheet = parts["xl/worksheets/sheet1.xml"].replace(
        b"<v>0</v>", b"<v>9</v>"
    )
    members = [
        (n, sheet if n == "xl/worksheets/sheet1.xml" else d, "deflated")
        for n, d in parts.items()
    ]
    with pytest.raises(ValueError, match="out of range"):
        extract_xlsx_cells(write_zip(members))
    # unknown cell type
    sheet2 = parts["xl/worksheets/sheet1.xml"].replace(
        b't="s"', b't="zz"', 1
    )
    members2 = [
        (n, sheet2 if n == "xl/worksheets/sheet1.xml" else d, "deflated")
        for n, d in parts.items()
    ]
    with pytest.raises(ValueError, match="unsupported cell type"):
        extract_xlsx_cells(write_zip(members2))
    with pytest.raises(ValueError, match="no worksheet"):
        extract_xlsx_cells(write_zip([("a.txt", b"x", "stored")]))


def test_col_index_decode():
    assert col_index("A1") == 0
    assert col_index("Z99") == 25
    assert col_index("AA10") == 26
    assert col_index("AZ1") == 51
    assert col_index("BA1") == 52
    with pytest.raises(ValueError):
        col_index("1A")


def test_xlsx_external_entities_not_resolved():
    # stdlib ElementTree refuses entity expansion — hostile XML is a
    # quarantined record, not a filesystem read
    blob = write_docx(["x"])
    evil = (
        b'<?xml version="1.0"?><!DOCTYPE d [<!ENTITY x SYSTEM '
        b'"file:///etc/passwd">]>'
        b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
        b'wordprocessingml/2006/main"><w:body><w:p><w:r><w:t>&x;</w:t>'
        b"</w:r></w:p></w:body></w:document>"
    )
    members = [
        (n, evil if n == "word/document.xml" else d, "deflated")
        for n, d, _m in read_zip(blob)
    ]
    with pytest.raises(ValueError, match="malformed"):
        extract_docx_text(write_zip(members))


def test_cpython_zipfile_reads_our_packages():
    # cross-engine: the stdlib zipfile must accept our DOCX container
    import io
    import zipfile

    blob = write_docx(["cross check"])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert "word/document.xml" in zf.namelist()
        xml_bytes = zf.read("word/document.xml")
    root = ET.fromstring(xml_bytes)
    assert root.tag.endswith("}document")


# ------------------------------------------------------------------ PPTX
def test_pptx_roundtrip():
    from etl_pipeline_old_spark.operators.ooxml import (
        extract_pptx_text, write_pptx,
    )

    slides = [["title <1>", "bullet & co"], ["second\nslide", ""], []]
    assert extract_pptx_text(write_pptx(slides)) == slides


def test_pptx_numeric_slide_order():
    # slide10.xml must sort after slide2.xml — part NUMBER, not name
    from etl_pipeline_old_spark.operators.ooxml import (
        extract_pptx_text, write_pptx,
    )

    many = [[f"slide {i}"] for i in range(12)]
    assert extract_pptx_text(write_pptx(many)) == many


def test_pptx_loud_failures():
    from etl_pipeline_old_spark.operators.ooxml import (
        extract_pptx_text, write_pptx,
    )

    with pytest.raises(ValueError, match="no slide parts"):
        extract_pptx_text(write_zip([("a.txt", b"x", "stored")]))
    blob = write_pptx([["x"]])
    members = [
        (n, b"<broken" if n.startswith("ppt/slides/") else d, "deflated")
        for n, d, _m in read_zip(blob)
    ]
    with pytest.raises(ValueError, match="malformed"):
        extract_pptx_text(write_zip(members))


def test_cpython_zipfile_reads_pptx():
    import io
    import zipfile

    from etl_pipeline_old_spark.operators.ooxml import write_pptx

    blob = write_pptx([["cross check"]])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert "ppt/slides/slide1.xml" in zf.namelist()


def test_doctype_rejected_in_opc_parts():
    # ECMA-376 Part 2 forbids DTDs in parts; accepting one would admit
    # entity-expansion bombs — the guard must fire before the parse
    blob = write_docx(["x"])
    evil = (
        b'<?xml version="1.0"?><!DOCTYPE d [<!ENTITY a "LOL">]>'
        b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
        b'wordprocessingml/2006/main"><w:body><w:p><w:r><w:t>&a;</w:t>'
        b"</w:r></w:p></w:body></w:document>"
    )
    members = [
        (n, evil if n == "word/document.xml" else d, "deflated")
        for n, d, _m in read_zip(blob)
    ]
    with pytest.raises(ValueError, match="DOCTYPE"):
        extract_docx_text(write_zip(members))


# ------------------------------------------- auxiliary story parts (r12)


def test_docx_aux_parts_appended_in_deterministic_order():
    blob = write_docx(
        ["body one", "body two"],
        header=["the header"], footer=["the footer"],
        footnotes=["note A", "note B"], endnotes=["end note"],
    )
    assert extract_docx_text(blob) == [
        "body one", "body two", "the header", "the footer",
        "note A", "note B", "end note",
    ]


def test_docx_separator_notes_are_skipped():
    # every real producer emits w:type'd separator/continuationSeparator
    # notes; keeping them would append phantom empty paragraphs
    blob = write_docx(["x"], footnotes=["real note"])
    import io
    import zipfile

    fn = zipfile.ZipFile(io.BytesIO(blob)).read("word/footnotes.xml")
    assert b'w:type="separator"' in fn
    assert b'w:type="continuationSeparator"' in fn
    assert extract_docx_text(blob) == ["x", "real note"]


def test_docx_without_aux_parts_unchanged():
    blob = write_docx(["plain"])
    assert extract_docx_text(blob) == ["plain"]


def test_docx_aux_runs_fragmented_and_escaped():
    note = "foot<note> & \"quoted\" \t tabbed"
    blob = write_docx(["b"], footnotes=[note])
    assert extract_docx_text(blob) == ["b", note]


def test_docx_rels_to_missing_part_is_loud():
    import io
    import zipfile

    blob = write_docx(["x"], footnotes=["n"])
    src = zipfile.ZipFile(io.BytesIO(blob))
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for name in src.namelist():
            if name != "word/footnotes.xml":
                zf.writestr(name, src.read(name))
    with pytest.raises(ValueError, match="missing part"):
        extract_docx_text(out.getvalue())


def test_docx_external_target_mode_rels_ignored():
    import io
    import zipfile

    blob = write_docx(["x"], footnotes=["n"])
    src = zipfile.ZipFile(io.BytesIO(blob))
    rels = src.read("word/_rels/document.xml.rels")
    hyper = (b'<Relationship Id="rIdX" Type="http://schemas.openxmlformats'
             b'.org/officeDocument/2006/relationships/footnotes" '
             b'Target="https://example.com/f.xml" TargetMode="External"/>'
             b"</Relationships>")
    rels = rels.replace(b"</Relationships>", hyper)
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for name in src.namelist():
            zf.writestr(name, rels if name == "word/_rels/document.xml.rels"
                        else src.read(name))
    assert extract_docx_text(out.getvalue()) == ["x", "n"]
