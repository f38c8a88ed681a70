"""EPUB codec (operators/epub.py): spine-order extraction, OCF
container checks, and loud failures."""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.operators.epub import (
    extract_epub_text, write_epub,
)
from etl_pipeline_old_spark.operators.pkzip import read_zip, write_zip


def test_roundtrip_with_markup_and_newlines():
    chapters = [
        ["first chapter para", "with <markup> & stuff"],
        ["second\nchapter"],
        [""],
    ]
    assert extract_epub_text(write_epub(chapters)) == chapters


def test_spine_order_beats_directory_order():
    # chapter files are named in REVERSE; only spine-order extraction
    # reassembles the book
    chapters = [[f"ch{i}"] for i in range(12)]
    blob = write_epub(chapters)
    names = [n for n, _d, _m in read_zip(blob) if n.endswith(".xhtml")]
    assert names[0] > names[-1]  # reverse naming really happens
    assert extract_epub_text(blob) == chapters


def test_mimetype_member_is_first_and_stored():
    blob = write_epub([["x"]])
    name, data, method = read_zip(blob)[0]
    assert (name, data, method) == (
        "mimetype", b"application/epub+zip", "stored",
    )


def test_inline_markup_keeps_text():
    # hand-build a chapter with <em>/<a> inline elements and tails
    blob = write_epub([["placeholder"]])
    parts = {n: (d, m) for n, d, m in read_zip(blob)}
    xhtml = (
        b'<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">'
        b"<body><p>a <em>b</em> c <a href='#'>d</a> e</p></body></html>"
    )
    members = [
        (n, xhtml if n.endswith(".xhtml") else d, m)
        for n, (d, m) in parts.items()
    ]
    assert extract_epub_text(write_zip(members)) == [["a b c d e"]]


def test_loud_failures():
    blob = write_epub([["x"]])
    parts = {n: (d, m) for n, d, m in read_zip(blob)}
    # wrong mimetype
    members = [
        (n, b"text/plain" if n == "mimetype" else d, m)
        for n, (d, m) in parts.items()
    ]
    with pytest.raises(ValueError, match="mimetype"):
        extract_epub_text(write_zip(members))
    # dangling spine idref
    opf_name = "OEBPS/content.opf"
    opf = parts[opf_name][0].replace(b'idref="c0"', b'idref="ghost"')
    members = [
        (n, opf if n == opf_name else d, m) for n, (d, m) in parts.items()
    ]
    with pytest.raises(ValueError, match="missing from the manifest"):
        extract_epub_text(write_zip(members))
    # missing chapter part
    members = [
        (n, d, m) for n, (d, m) in parts.items() if not n.endswith(".xhtml")
    ]
    with pytest.raises(ValueError, match="missing chapter"):
        extract_epub_text(write_zip(members))


def test_doctype_rejected_in_chapters():
    blob = write_epub([["x"]])
    evil = (
        b'<?xml version="1.0"?><!DOCTYPE html [<!ENTITY a "LOL">]>'
        b'<html xmlns="http://www.w3.org/1999/xhtml"><body><p>&a;</p>'
        b"</body></html>"
    )
    members = [
        (n, evil if n.endswith(".xhtml") else d, m)
        for n, d, m in read_zip(blob)
    ]
    with pytest.raises(ValueError, match="DOCTYPE"):
        extract_epub_text(write_zip(members))
