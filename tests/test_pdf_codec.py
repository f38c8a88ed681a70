"""PDF subset codec tests — operators/pdf.py.

Written from the public ISO 32000 structure.  Evidence: byte-exact text
round-trips across the escape/encoding surface, both stream paths (raw +
FlateDecode), structural features real extractors depend on (xref
offsets honored, indirect /Length, nested page trees, hex strings, TJ
arrays), and loud failure for every damage class (truncation, wrong
xref, stream length lies, encryption, unsupported filters).
"""

from __future__ import annotations

import re
import zlib

import pytest

from etl_pipeline_old_spark.operators.pdf import (
    _parse_object,
    extract_pdf_text,
    write_pdf,
)

_PAGES = [
    ["Hello (world) \\ test", "line two", "ünïcødé строка 中文"],
    ["page2 only line"],
]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_byte_exact(compress):
    assert extract_pdf_text(write_pdf(_PAGES, compress)) == _PAGES


def test_control_chars_octal_escaped():
    pages = [["tab\there", "nl\nembedded", "cr\rtoo"]]
    assert extract_pdf_text(write_pdf(pages, True)) == pages


def test_empty_page_and_empty_line():
    pages = [[""], ["", "x"]]
    assert extract_pdf_text(write_pdf(pages, False)) == pages


def test_xref_offsets_are_honored_not_scanned():
    # move every object by injecting a comment BEFORE the body and fixing
    # nothing: extraction must fail because xref offsets are now wrong —
    # proving the parser trusts the xref, not a linear scan
    pdf = write_pdf(_PAGES, False)
    broken = pdf.replace(b"1 0 obj", b"% pad\n1 0 obj", 1)
    with pytest.raises(ValueError, match="xref offset|missing from xref"):
        extract_pdf_text(broken)


def test_object_grammar():
    val, _ = _parse_object(
        b"<< /A [1 2.5 (s) <414243> /N true null] /B 3 0 R >>", 0
    )
    assert val["A"][0] == 1 and val["A"][1] == 2.5
    assert val["A"][2] == b"s" and val["A"][3] == b"ABC"
    assert val["A"][4] == "/N" and val["A"][5] is True and val["A"][6] is None
    assert val["B"].num == 3


def test_nested_literal_string_parens():
    val, _ = _parse_object(b"(a (nested (deep)) b)", 0)
    assert val == b"a (nested (deep)) b"


def test_hex_string_extraction():
    # same-length patch (offsets and /Length untouched): literal string
    # swapped for a hex string shown by Tj
    pdf = write_pdf([["base"]], False)
    patched = pdf.replace(b"(base) Tj", b"<6261> Tj", 1)
    assert extract_pdf_text(patched) == [["ba"]]


def test_tj_array_extraction():
    # same-length patch: TJ array with a kerning number between strings
    pdf = write_pdf([["base"]], False)
    patched = pdf.replace(b"(base) Tj", b"[(ba)]TJ ", 1)
    assert extract_pdf_text(patched) == [["ba"]]


def test_truncated_stream_is_loud():
    pdf = write_pdf(_PAGES, True)
    # lie about a stream's length WITHOUT shifting offsets: same digit
    # width, all nines — far past the end of this small file
    broken = re.sub(
        rb"/Length (\d+) /Filter",
        lambda m: b"/Length " + b"9" * len(m.group(1)) + b" /Filter",
        pdf,
        count=1,
    )
    with pytest.raises(ValueError, match="stream truncated"):
        extract_pdf_text(broken)


def test_encrypted_doc_is_documented_seam():
    pdf = write_pdf(_PAGES, False)
    broken = pdf.replace(
        b"<< /Size", b"<< /Encrypt 9 0 R /Size", 1
    )
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(broken)


def test_unsupported_filter_is_documented_seam():
    pdf = write_pdf([["x" * 40]], True)
    # same-length filter-name swap so offsets hold
    broken = pdf.replace(b"/Filter /FlateDecode", b"/Filter  /DCTDecode ", 1)
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        extract_pdf_text(broken)


def test_missing_header_is_loud():
    with pytest.raises(ValueError, match="PDF header"):
        extract_pdf_text(b"not a pdf at all")


def test_flate_stream_actually_compressed():
    long_pages = [["z" * 59] * 20]
    raw = write_pdf(long_pages, False)
    comp = write_pdf(long_pages, True)
    assert len(comp) < len(raw)
    assert b"/FlateDecode" in comp
    # and the stream inflates to the raw content-stream bytes
    m = re.search(rb"stream\n(.*?)\nendstream", comp, re.S)
    assert b"z" * 59 in zlib.decompress(m.group(1))


def test_document_corpus_capstone_plan_locks(spark):
    # Python only at the parse; downstream is codegen into the standard
    # two-phase distinct aggregate — exactly 2 Exchanges, no joins
    from etl_pipeline_old_spark.queries.sources_formats import (
        pipeline_document_corpus,
    )

    df = pipeline_document_corpus(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 2
