"""SubRip (SRT) codec tests — operators/srt.py.

Round-trips across the structure surface (BOM, CRLF, multi-line
payloads, overlap merging via the shared cue_stats), and loud failure
for every damage class (non-numeric index, regressing index, dot-millis
timing, reversed cues, empty payload).
"""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.srt import (
    format_ts_srt,
    parse_srt,
    srt_caption_stats,
    write_srt,
)

_CUES = [(0, 1500, "hello"), (2000, 3500, "multi\nline"), (3000, 5000, "ov")]


def test_roundtrip():
    assert parse_srt(write_srt(_CUES)) == _CUES


def test_bom_and_crlf():
    doc = write_srt(_CUES)
    assert parse_srt("﻿" + doc) == _CUES
    assert parse_srt(doc.replace("\n", "\r\n")) == _CUES


def test_stats_merge_overlaps():
    st_ = srt_caption_stats(write_srt(_CUES))
    # [2000,3500] and [3000,5000] merge: 1500 + 3000 covered
    assert st_ == {
        "n_cues": 3, "covered_ms": 4500, "first_start_ms": 0,
        "last_end_ms": 5000, "n_chars": 5 + 9 + 2,
    }


def test_timestamp_format_is_comma_millis():
    assert format_ts_srt(3_725_042) == "01:02:05,042"
    assert "00:00:01,500" in write_srt(_CUES)


def test_whitespace_only_line_is_payload_not_boundary():
    doc = "1\n00:00:00,000 --> 00:00:01,000\na\n \nb\n"
    assert parse_srt(doc) == [(0, 1000, "a\n \nb")]


@pytest.mark.parametrize(
    "doc,msg",
    [
        ("x\n00:00:00,000 --> 00:00:01,000\na\n", "not a number"),
        ("1\n00:00:00.000 --> 00:00:01.000\na\n", "malformed timing"),
        ("1\n00:00:02,000 --> 00:00:01,000\na\n", "ends before"),
        (
            "2\n00:00:00,000 --> 00:00:01,000\na\n\n"
            "1\n00:00:02,000 --> 00:00:03,000\nb\n",
            "ascend",
        ),
        ("1\n00:00:00,000 --> 00:00:01,000\n\n", "no payload"),
        ("1", "at end of file"),
        ("1\n", "malformed timing"),
    ],
)
def test_damage_is_loud(doc, msg):
    with pytest.raises(ValueError, match=msg):
        parse_srt(doc)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**7),
            st.integers(1, 10**5),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs", "Cc"),
                    blacklist_characters="\n\r﻿",
                ),
                min_size=1,
            ).filter(lambda t: t.strip() != "" and not t.strip().isdigit()),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_property_roundtrip(raw):
    # payloads must not themselves look like cue boundaries: SRT has no
    # escaping, so a payload line that is empty is structurally a
    # terminator (excluded by construction above)
    cues = [(s, s + d, t) for s, d, t in raw]
    assert parse_srt(write_srt(cues)) == cues
