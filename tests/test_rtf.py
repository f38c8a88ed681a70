"""RTF codec (operators/rtf.py): writer/extractor roundtrips, the
hand-written real-world shapes the spec warns about, and loud failures."""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.operators.rtf import extract_rtf_text, write_rtf


@pytest.mark.parametrize(
    "paras",
    [
        ["plain ascii", "second para"],
        ["braces {and} \\backslash", ""],
        ["tab\there\nline break"],
        ["Русский текст по-русски", "mixed ascii и кириллица"],
        ["emoji \U0001f600 astral", "done"],
        [""],
    ],
)
def test_roundtrip(paras):
    assert extract_rtf_text(write_rtf(paras)) == paras


def test_hex_escapes_decode_through_declared_codepage():
    doc = (
        b"{\\rtf1\\ansi\\ansicpg1251\\deff0 "
        b"\\'cf\\'f0\\'e8\\'e2\\'e5\\'f2}"
    )
    assert extract_rtf_text(doc) == ["Привет"]


def test_destination_groups_do_not_leak():
    doc = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}"
        b"{\\stylesheet{\\s1 Head;}}{\\info{\\author X;}}body}"
    )
    assert extract_rtf_text(doc) == ["body"]


def test_ignorable_star_destination_skipped():
    doc = b"{\\rtf1\\ansi{\\*\\futurefeature junk {nested}}keep}"
    assert extract_rtf_text(doc) == ["keep"]


def test_uc_fallback_skip_count():
    # \uc2 means TWO fallback chars follow each \uN and must be skipped
    doc = b"{\\rtf1\\ansi\\uc2 a\\u1055 XXb}"
    assert extract_rtf_text(doc) == ["aПb"]


def test_uc_is_group_scoped():
    # \uc set inside a group restores on group close (spec: state stack)
    doc = b"{\\rtf1\\ansi\\uc1{\\uc3 \\u1055 ABC}\\u1056 ?x}"
    assert extract_rtf_text(doc) == ["ПРx"]


def test_negative_u_and_surrogate_pair():
    # signed 16-bit: \u-10179?\u-8704? is U+1F600 as a surrogate pair
    doc = b"{\\rtf1\\ansi\\uc1 \\u-10179?\\u-8704?!}"
    assert extract_rtf_text(doc) == ["\U0001f600!"]


def test_bin_payload_skipped_blind():
    # the 3 raw bytes contain '}' and '\' — a text scanner desyncs here
    doc = b"{\\rtf1\\ansi pre\\bin3 }\\\\post}"
    got = extract_rtf_text(doc)
    assert got == ["prepost"], got


def test_par_and_line_semantics():
    doc = b"{\\rtf1\\ansi one\\par two\\line three}"
    assert extract_rtf_text(doc) == ["one", "two\nthree"]


def test_nonbreaking_space():
    assert extract_rtf_text(b"{\\rtf1\\ansi a\\~b}") == ["a b"]


@pytest.mark.parametrize(
    "bad",
    [
        b"not rtf at all",
        b"{\\rtf1{unbalanced",
        b"{\\rtf1 \\bin99 x}",
        b"{\\rtf1 \\'f}",
    ],
)
def test_loud_failures(bad):
    with pytest.raises(ValueError):
        extract_rtf_text(bad)


def test_writer_routes_nonascii_through_u_escapes():
    blob = write_rtf(["Привет"])
    assert b"\\u1055" in blob  # П
    assert "Привет".encode("utf-8") not in blob
