"""Property-based round-trips for the round-9 container codecs.

Hypothesis drives arbitrary payloads/structures through each writer →
reader pair; the invariant in every case is exact recovery — the same
style as the existing FLAC/ADPCM/tar property suites.
"""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.mp4 import decode_mp4_pcm, encode_mp4_pcm
from etl_pipeline_old_spark.operators.ogg import build_ogg, probe_ogg
from etl_pipeline_old_spark.operators.pdf import extract_pdf_text, write_pdf
from etl_pipeline_old_spark.operators.pkzip import read_zip, write_zip
from etl_pipeline_old_spark.operators.vtt import parse_vtt, write_vtt

_SMALL = {"max_examples": 25, "deadline": None}


@settings(**_SMALL)
@given(
    frames=st.lists(st.integers(-32768, 32767), min_size=2, max_size=80),
    channels=st.sampled_from([1, 2]),
    n_chunks=st.integers(1, 4),
    fragmented=st.booleans(),
)
def test_mp4_pcm_roundtrip(frames, channels, n_chunks, fragmented):
    sig = frames * channels  # divisible frame count by construction
    buf = encode_mp4_pcm(
        sig, 8000, channels, fragmented=fragmented, n_chunks=n_chunks
    )
    assert decode_mp4_pcm(buf) == (8000, channels, sig)


@settings(**_SMALL)
@given(
    packets=st.lists(st.binary(min_size=0, max_size=1200), min_size=1, max_size=6),
    codec=st.sampled_from(["opus", "vorbis"]),
    limit=st.sampled_from([510, 255 * 200]),
)
def test_ogg_packet_accounting(packets, codec, limit):
    buf = build_ogg(codec, 1, 48000, packets, page_body_limit=limit)
    p = probe_ogg(buf)
    assert p["codec"] == codec
    assert p["n_packets"] == len(packets)
    assert p["duration_granules"] == 960 * len(packets)


@settings(**_SMALL)
@given(
    members=st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.binary(min_size=0, max_size=500),
            st.sampled_from(["stored", "deflated"]),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_zip_roundtrip(members):
    named = [
        (f"m{i:03d}_{suffix}.bin", data, method)
        for i, (suffix, data, method) in enumerate(members)
    ]
    assert read_zip(write_zip(named)) == named


_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@settings(**_SMALL)
@given(
    pages=st.lists(st.lists(_line, min_size=1, max_size=6), min_size=1, max_size=3),
    compress=st.booleans(),
)
def test_pdf_text_roundtrip(pages, compress):
    assert extract_pdf_text(write_pdf(pages, compress)) == pages


@settings(**_SMALL)
@given(
    cues=st.lists(
        st.tuples(st.integers(0, 10**7), st.integers(1, 10**5), _line),
        min_size=1,
        max_size=8,
    )
)
@example(cues=[(0, 1, " ")])  # round-9 failure: whitespace-only payload line
def test_vtt_roundtrip(cues):
    # map (start, positive duration) -> (start, end); payloads must not
    # contain blank lines or a leading identifier ambiguity — the writer
    # emits one payload line, so strip newlines from the generated text
    norm = [(s, s + d, t.replace("\n", " ").replace("\r", " ")) for s, d, t in cues]
    assert parse_vtt(write_vtt(norm)) == norm


# a payload LINE may be anything without a line terminator, including
# whitespace-only (the r9 fix) — only a truly EMPTY line ends the cue
_payload_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    min_size=1,
    max_size=40,
)


@settings(**_SMALL)
@given(
    cues=st.lists(
        st.tuples(
            st.integers(0, 10**7),
            st.integers(1, 10**5),
            st.lists(_payload_line, min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=6,
    ),
    meta=st.dictionaries(
        st.text(alphabet="ABCDEFKLMNabcdefklmn", min_size=1, max_size=8),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\n\r"
            ),
            max_size=20,
        ).map(str.strip),
        max_size=3,
    ),
)
@example(cues=[(0, 1, [" ", "x", "\t"])], meta={"Language": "en"})
def test_vtt_multiline_and_header_roundtrip(cues, meta):
    """Multi-line payloads (incl. whitespace-only interior lines) and
    header metadata both survive a write->parse round-trip."""
    from etl_pipeline_old_spark.operators.vtt import header_meta

    norm = [(s, s + d, "\n".join(lines)) for s, d, lines in cues]
    doc = write_vtt(norm, meta or None)
    assert parse_vtt(doc) == norm
    got = header_meta(doc)
    for k, v in meta.items():
        assert got[k.strip()] == v
