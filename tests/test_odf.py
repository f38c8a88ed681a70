"""OpenDocument codec (operators/odf.py): whitespace-encoding
roundtrips, typed .ods cells with lying display strings, repeated
columns, and the package-level loud classes."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.odf import (
    extract_ods_cells,
    extract_odt_text,
    write_ods,
    write_odt,
)
from etl_pipeline_old_spark.operators.pkzip import read_zip, write_zip

_MIME_ODT = b"application/vnd.oasis.opendocument.text"


def test_odt_roundtrip_whitespace_and_headings():
    paras = [
        "Intro  with  doubled   spaces",
        "tab\there and\tthere",
        "line\nbreak",
        "кириллица и <escapes> & такое",
        "   leading run",
        "plain",
    ]
    got = extract_odt_text(write_odt(paras))
    assert [t for _k, _l, t in got] == paras
    # headings every 4th paragraph, outline levels cycling 1..3
    assert [k for k, _l, _t in got] == ["h", "p", "p", "p", "h", "p"]
    assert [l for k, l, _t in got if k == "h"] == [1, 2]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            st.characters(
                whitelist_categories=("L", "N", "P", "Zs"),
                whitelist_characters="\t\n ",
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_odt_roundtrip_property(paras):
    got = extract_odt_text(write_odt(paras))
    assert [t for _k, _l, t in got] == paras


def test_ods_typed_cells_and_repeats():
    rows = [
        ["name", "qty", "ok"],
        ["alpha", 3.5, True],
        ["бета", -2.0, False],
        [None, None, "tail"],
        ["x", None, None, 7.25],
    ]
    blob = write_ods(rows)
    assert extract_ods_cells(blob) == rows
    # the float display string LIES on purpose: a reader that takes
    # the cell text instead of office:value sees ~3.5~, not 3.5
    content = dict((n, d) for n, d, _m in read_zip(blob))["content.xml"]
    assert b"~3.5~" in content
    assert b'table:number-columns-repeated="2"' in content


def test_ods_damage_classes():
    blob = bytearray(write_ods([["a", 1.0]]))
    # strip office:value from the float cell -> loud
    content = dict(
        (n, d) for n, d, _m in read_zip(bytes(blob))
    )["content.xml"]
    broken = content.replace(b' office:value="1.0"', b"")
    from etl_pipeline_old_spark.operators.odf import (
        _manifest,
        _MIME_ODS,
    )

    bad = write_zip(
        [
            ("mimetype", _MIME_ODS.encode("ascii"), "stored"),
            ("content.xml", broken, "deflated"),
            ("META-INF/manifest.xml",
             _manifest(_MIME_ODS, ["content.xml"]), "deflated"),
        ]
    )
    with pytest.raises(ValueError, match="office:value"):
        extract_ods_cells(bad)
    # unknown value type is the documented NotImplementedError seam
    cur = write_zip(
        [
            ("mimetype", _MIME_ODS.encode("ascii"), "stored"),
            ("content.xml", content.replace(
                b'office:value-type="float"',
                b'office:value-type="currency"'), "deflated"),
            ("META-INF/manifest.xml",
             _manifest(_MIME_ODS, ["content.xml"]), "deflated"),
        ]
    )
    with pytest.raises(NotImplementedError, match="currency"):
        extract_ods_cells(cur)


def test_package_rules_are_loud():
    # mimetype must be FIRST
    bad = write_zip(
        [
            ("content.xml", b"<x/>", "deflated"),
            ("mimetype", _MIME_ODT, "stored"),
        ]
    )
    with pytest.raises(ValueError, match="first member"):
        extract_odt_text(bad)
    # ...and STORED
    bad2 = write_zip([("mimetype", _MIME_ODT, "deflated")])
    with pytest.raises(ValueError, match="STORED"):
        extract_odt_text(bad2)
    # wrong media type (an .ods opened as .odt)
    with pytest.raises(ValueError, match="media type"):
        extract_odt_text(write_ods([["x"]]))
    # DOCTYPE rejected
    from etl_pipeline_old_spark.operators.odf import _manifest as _m

    evil = write_zip(
        [
            ("mimetype", _MIME_ODT, "stored"),
            ("content.xml",
             b'<!DOCTYPE x [<!ENTITY e "boom">]><office/>', "deflated"),
        ]
    )
    with pytest.raises(ValueError, match="DOCTYPE"):
        extract_odt_text(evil)
