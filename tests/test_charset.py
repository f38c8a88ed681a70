"""Charset detection + transcoding — operators/charset.py.

The WHATWG-order cascade (BOM > HTTP > meta prescan > UTF-8 validity >
Cyrillic byte-distribution heuristic) and strict transcoding, plus the
mojibake property that motivates the strictness: cp1251 bytes decoded
as KOI8-R are VALID but WRONG, so only a value check catches the swap.
"""

from __future__ import annotations

import codecs

import pytest

from etl_pipeline_old_spark.operators.charset import (
    canonical_charset,
    detect_charset,
    transcode_to_text,
)

_RU = "Съешь же ещё этих мягких французских булок да выпей чаю."
_PAGE = f"<html><head></head><body>{_RU}</body></html>"


def test_bom_wins_over_everything():
    b = codecs.BOM_UTF8 + _PAGE.encode("utf-8")
    # even a lying HTTP header loses to the BOM
    assert detect_charset(b, "text/html; charset=koi8-r") == ("utf-8", "bom")
    assert transcode_to_text(b, "utf-8") == _PAGE  # BOM consumed


def test_utf16_boms():
    b = codecs.BOM_UTF16_LE + _PAGE.encode("utf-16-le")
    assert detect_charset(b) == ("utf-16-le", "bom")
    assert transcode_to_text(b, "utf-16-le") == _PAGE
    b = codecs.BOM_UTF16_BE + _PAGE.encode("utf-16-be")
    assert detect_charset(b) == ("utf-16-be", "bom")
    assert transcode_to_text(b, "utf-16-be") == _PAGE


def test_http_charset_param():
    b = _PAGE.encode("cp1251")
    assert detect_charset(b, "text/html; charset=windows-1251") == (
        "windows-1251", "http",
    )
    assert detect_charset(b, 'text/html; charset="Windows-1251"') == (
        "windows-1251", "http",
    )


def test_meta_prescan_both_forms():
    p = f'<html><head><meta charset="koi8-r"></head><body>{_RU}</body></html>'
    assert detect_charset(p.encode("koi8_r"), "text/html") == (
        "koi8-r", "meta",
    )
    p2 = (
        '<html><head><meta http-equiv="Content-Type" content="text/html; '
        f'charset=windows-1251"></head><body>{_RU}</body></html>'
    )
    assert detect_charset(p2.encode("cp1251")) == ("windows-1251", "meta")


def test_meta_outside_prescan_window_is_ignored():
    pad = "x" * 1100
    p = (
        f"<html><head><!-- {pad} --><meta charset=\"koi8-r\"></head>"
        f"<body>{_RU}</body></html>"
    )
    cs, method = detect_charset(p.encode("koi8_r"))
    assert method == "heuristic"  # the tag sits past the 1024-byte window


def test_utf8_validity_tier():
    assert detect_charset(_PAGE.encode("utf-8")) == ("utf-8", "utf-8-valid")
    assert detect_charset(b"pure ascii page") == ("utf-8", "utf-8-valid")


def test_cyrillic_heuristic_swapped_case_blocks():
    # lowercase-dominated Russian: cp1251 lowercase rides 0xE0-0xFF,
    # KOI8-R lowercase rides 0xC0-0xDF — the distribution names the set
    assert detect_charset(_PAGE.encode("cp1251")) == (
        "windows-1251", "heuristic",
    )
    assert detect_charset(_PAGE.encode("koi8_r")) == ("koi8-r", "heuristic")


def test_mojibake_is_valid_but_wrong():
    # the property that motivates value-checked recovery: cp1251 bytes
    # ARE decodable as KOI8-R, just into different letters
    b = _RU.encode("cp1251")
    wrong = transcode_to_text(b, "koi8-r")
    assert wrong != _RU and len(wrong) == len(_RU)


def test_strict_transcode_is_loud():
    with pytest.raises(ValueError, match="not valid utf-8"):
        transcode_to_text("щ".encode("cp1251") + b" abc", "utf-8")


def test_unknown_label_is_loud():
    with pytest.raises(ValueError, match="unknown label"):
        canonical_charset("x-ebcdic-ru")
    with pytest.raises(ValueError, match="unknown label"):
        transcode_to_text(b"abc", "x-ebcdic-ru")


def test_aliases_canonicalize():
    assert canonical_charset("CP1251") == "windows-1251"
    assert canonical_charset("koi8r") == "koi8-r"
    assert canonical_charset("UTF8") == "utf-8"


def test_warc_raw_ctype_keeps_params():
    from etl_pipeline_old_spark.operators.warc import (
        encode_warc_shard,
        iter_warc_responses_raw_ctype,
        iter_warc_responses_typed,
    )

    blob = encode_warc_shard(
        [("https://e/1", _RU.encode("cp1251"), 200,
          "text/html; charset=windows-1251")],
        0,
    )
    (uri, status, ctype, body), = list(iter_warc_responses_raw_ctype(blob))
    assert ctype == "text/html; charset=windows-1251"
    assert transcode_to_text(body, detect_charset(body, ctype)[0]) == _RU
    # the typed walk still strips params (media-type routing contract)
    (_, _, stripped, _), = list(iter_warc_responses_typed(blob))
    assert stripped == "text/html"
