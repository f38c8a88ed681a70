"""CCITT G4 codec (operators/ccitt.py): hand-computed spec vectors for
each 2D mode (the self-roundtrip blind-spot killers), MH run-length
table spot pins, encoder↔decoder roundtrips over adversarial rasters,
and the loud damage classes.  No independent CCITT codec exists in
this container (no PIL), so these spec-derived fixtures are the
conformance pin."""

from __future__ import annotations

import random

import pytest

from etl_pipeline_old_spark.operators.ccitt import (
    _BLACK_ALL,
    _WHITE_ALL,
    decode_g4,
    encode_g4,
    pack_rows,
)

_RND = random.Random(20260816)


def _bits_from(s: str) -> bytes:
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


_EOFB = "000000000001" * 2


def test_mh_table_spot_pins():
    # ITU-T T.4 literal values — a transposed table decodes garbage
    assert _WHITE_ALL[0] == "00110101"
    assert _WHITE_ALL[2] == "0111"
    assert _WHITE_ALL[64] == "11011"
    assert _WHITE_ALL[1664] == "011000"
    assert _BLACK_ALL[1] == "010"
    assert _BLACK_ALL[2] == "11"
    assert _BLACK_ALL[4] == "011"
    assert _BLACK_ALL[64] == "0000001111"
    assert _BLACK_ALL[2560] == _WHITE_ALL[2560] == "000000011111"


def test_horizontal_mode_hand_vector():
    """Row [1,1,1,1,0,0,0,0] against the imaginary all-white reference:
    H(001) + white-run-0(00110101) + black-run-4(011), then V0(1)."""
    want = "001" + "00110101" + "011" + "1"
    bits = [1, 1, 1, 1, 0, 0, 0, 0]
    assert encode_g4(bits, 8, 1) == _bits_from(want + _EOFB)
    assert decode_g4(_bits_from(want + _EOFB), 8, 1) == bits


def test_vertical_v0_hand_vector():
    """A row identical to its reference codes as three V0s: the two
    copied change positions plus the end-of-row V0 against b1=width."""
    row = [1, 1, 1, 1, 0, 0, 0, 0]
    two = encode_g4(row + row, 8, 2)
    first = "001" + "00110101" + "011" + "1"
    assert two == _bits_from(first + "111" + _EOFB)


def test_vr1_vs_vl1_hand_vectors():
    """Black run shifted RIGHT by one vs the reference codes VR1(011)
    twice; shifted LEFT codes VL1(010) — a mirrored mode table fails
    here (the roundtrip could not see it)."""
    ref = [0, 0, 1, 1, 0, 0, 0, 0]
    right = [0, 0, 0, 1, 1, 0, 0, 0]
    left = [0, 1, 1, 0, 0, 0, 0, 0]
    first = "001" + "0111" + "11" + "1"  # H + white2 + black2, then V0
    got_r = encode_g4(ref + right, 8, 2)
    assert got_r == _bits_from(first + "011" + "011" + "1" + _EOFB)
    got_l = encode_g4(ref + left, 8, 2)
    assert got_l == _bits_from(first + "010" + "010" + "1" + _EOFB)
    assert decode_g4(got_r, 8, 2) == ref + right
    assert decode_g4(got_l, 8, 2) == ref + left


def test_pass_mode_hand_vector():
    """Reference has a black run the coding row skips entirely:
    P(0001) consumes it, then V0 closes the row."""
    ref = [0, 0, 1, 1, 0, 0, 0, 0]
    blank = [0] * 8
    first = "001" + "0111" + "11" + "1"
    got = encode_g4(ref + blank, 8, 2)
    assert got == _bits_from(first + "0001" + "1" + _EOFB)
    assert decode_g4(got, 8, 2) == ref + blank


def test_makeup_runs_roundtrip():
    # single row wider than one makeup: white 2600 + black 120 + rest
    w = 2800
    row = [0] * 2600 + [1] * 120 + [0] * (w - 2720)
    enc = encode_g4(row, w, 1)
    assert decode_g4(enc, w, 1) == row


@pytest.mark.parametrize("dims", [(1, 1), (7, 3), (16, 16), (33, 9)])
@pytest.mark.parametrize("density", [0.05, 0.5, 0.95])
def test_roundtrip_matrix(dims, density):
    w, h = dims
    bits = [1 if _RND.random() < density else 0 for _ in range(w * h)]
    enc = encode_g4(bits, w, h)
    assert decode_g4(enc, w, h) == bits
    assert decode_g4(enc, w) == bits  # until-EOFB walk


def test_loud_damage_classes():
    bits = [1 if _RND.random() < 0.3 else 0 for _ in range(256)]
    enc = encode_g4(bits, 16, 16)
    with pytest.raises(ValueError, match="exhausted"):
        decode_g4(enc[: len(enc) // 3], 16, 16)
    with pytest.raises(ValueError, match="size disagrees"):
        encode_g4(bits, 16, 15)
    with pytest.raises(ValueError, match="width"):
        decode_g4(enc, 0, 1)
    # an all-ones byte stream walks V0s off the row or exhausts —
    # never returns silently wrong dimensions
    with pytest.raises(ValueError):
        decode_g4(b"\x00\x00\x00\x00", 8, 4)
    assert pack_rows([1, 0, 1], 3) == b"\xa0"
    with pytest.raises(ValueError, match="disagrees"):
        pack_rows([1, 0, 1], 2)


def test_pdf_ccitt_integration_and_seams():
    from etl_pipeline_old_spark.operators.pdf import (
        extract_pdf_images,
        write_pdf_images,
    )

    bits = [1 if _RND.random() < 0.25 else 0 for _ in range(16 * 16)]
    pdf = write_pdf_images(
        [("ccitt", 16, 16, (bits, True)), ("ccitt", 16, 16, (bits, False)),
         ("ccitt-g3", 16, 16, (bits, True))]
    )
    imgs = extract_pdf_images(pdf)
    assert imgs[0][4] == pack_rows(bits, 16)
    assert imgs[1][4] == pack_rows([1 - b for b in bits], 16)
    # 1D G3 (K = 0) decodes natively and must agree with the G4 image
    assert imgs[2][4] == imgs[0][4]
    # a G4 stream under a LYING /K 10 routes to the 2D-G3 decoder,
    # which demands EOL framing G4 never has — loud, not wrong
    broken = pdf.replace(b"/K -1", b"/K 10", 1)
    with pytest.raises(ValueError, match="EOL"):
        extract_pdf_images(broken)
    # a G4 stream fed to the G3 decoder (forged K) is loud, not wrong
    forged = pdf.replace(b"/K -1", b"/K 00", 1)
    with pytest.raises(ValueError):
        extract_pdf_images(forged)
    # torn coded stream inside the XObject is loud per the codec
    torn = bytearray(pdf)
    at = torn.find(b"stream\n", torn.find(b"/CCITTFaxDecode")) + 7
    torn[at + 2] = 0xFF
    with pytest.raises(ValueError):
        extract_pdf_images(bytes(torn))


def test_g3_1d_hand_vector_and_roundtrips():
    """T.4 1D: row [1,1,1,1,0,0,0,0] codes as EOL + white-run-0
    (00110101) + black-run-4 (011) + white-run-4 (1011)."""
    from etl_pipeline_old_spark.operators.ccitt import (
        decode_g3_1d,
        encode_g3_1d,
    )

    bits = [1, 1, 1, 1, 0, 0, 0, 0]
    want = "000000000001" + "00110101" + "011" + "1011"
    assert encode_g3_1d(bits, 8, 1) == _bits_from(want)
    assert decode_g3_1d(_bits_from(want), 8, 1) == bits
    # fill bits before an EOL are absorbed with it
    filled = "00000" + want
    assert decode_g3_1d(_bits_from(filled), 8, 1) == bits
    for dims, density in (((16, 16), 0.3), ((33, 5), 0.8), ((1, 4), 0.5)):
        w, h = dims
        px = [1 if _RND.random() < density else 0 for _ in range(w * h)]
        assert decode_g3_1d(encode_g3_1d(px, w, h), w, h) == px
    with pytest.raises(ValueError, match="overflows"):
        # black-run-7 after white-run-4 overflows an 8-wide row
        decode_g3_1d(_bits_from("1011" + "00011" + "1011"), 8, 1)


def test_g3_encoded_byte_align():
    """PDF /EncodedByteAlign: each row's EOL starts on a byte boundary
    (the scanner-output convention); the PDF layer routes the flag for
    K=0 and keeps it a loud seam for G4."""
    from etl_pipeline_old_spark.operators.ccitt import (
        decode_g3_1d,
        encode_g3_1d,
    )
    from etl_pipeline_old_spark.operators.pdf import (
        extract_pdf_images,
        write_pdf_images,
    )

    bits = [1 if _RND.random() < 0.4 else 0 for _ in range(16 * 5)]
    enc = encode_g3_1d(bits, 16, 5, byte_align=True)
    plain = encode_g3_1d(bits, 16, 5)
    assert enc != plain  # alignment really padded something
    assert decode_g3_1d(enc, 16, 5, byte_align=True) == bits
    # EBA + G4 stays the documented loud seam at the PDF layer — the
    # patch is LENGTH-PRESERVING so the xref offsets stay valid
    # (/Rows drops and falls back to /Height, which is also 5)
    pdf = write_pdf_images([("ccitt", 16, 5, (bits, True))])
    old = b"/K -1 /Columns 16 /Rows 5 /BlackIs1 true"
    new = b"/K -1 /Columns 16 /EncodedByteAlign true"
    assert len(old) == len(new) and old in pdf
    with pytest.raises(NotImplementedError, match="EncodedByteAlign"):
        extract_pdf_images(pdf.replace(old, new, 1))


def test_g3_2d_mixed_mode_roundtrips_and_cross_checks():
    """T.4 §4.2 mixed MR (PDF K > 0): EOL + tag bit per row, every
    K-th row 1D, 2D rows through the SAME mode coder G4 uses — so one
    raster coded as G4, 1D G3 and 2D G3 must decode identically."""
    from etl_pipeline_old_spark.operators.ccitt import (
        decode_g3_2d,
        decode_g4,
        encode_g3_2d,
        encode_g4,
    )

    for w, h in ((64, 10), (17, 7), (8, 3)):
        bits = [1 if _RND.random() < 0.3 else 0 for _ in range(w * h)]
        for k in (1, 2, 4):
            for ba in (False, True):
                enc = encode_g3_2d(bits, w, h, k, byte_align=ba)
                assert decode_g3_2d(enc, w, h, byte_align=ba) == bits, (
                    w, h, k, ba,
                )
        assert decode_g3_2d(encode_g3_2d(bits, w, h, 2), w, h) == \
            decode_g4(encode_g4(bits, w, h), w, h)
    # the tag bits are real: K=1 (all rows 1D) and K=4 (3 of 4 rows
    # 2D) produce different streams for the same raster
    bits = [1 if _RND.random() < 0.4 else 0 for _ in range(32 * 8)]
    assert encode_g3_2d(bits, 32, 8, 1) != encode_g3_2d(bits, 32, 8, 4)
    # torn stream and missing EOL are loud
    enc = encode_g3_2d(bits, 32, 8, 2)
    with pytest.raises(ValueError):
        decode_g3_2d(enc[: len(enc) // 2], 32, 8)
    with pytest.raises(ValueError, match="EOL"):
        decode_g3_2d(b"\xff" + enc, 32, 8)


def test_pdf_k_positive_decodes_natively():
    """A /K 2 /CCITTFaxDecode XObject decodes through decode_g3_2d and
    matches the G4 coding of the same raster bit-for-bit — the r13
    verdict #5 acceptance shape."""
    from etl_pipeline_old_spark.operators.pdf import (
        extract_pdf_images,
        write_pdf_images,
    )

    bits = [1 if _RND.random() < 0.35 else 0 for _ in range(16 * 16)]
    pdf = write_pdf_images(
        [("ccitt", 16, 16, (bits, True)),
         ("ccitt-g3-2d", 16, 16, (bits, True))]
    )
    assert b"/K 2" in pdf
    (_, _w0, _h0, _f0, d_g4), (_, _w1, _h1, _f1, d_mr) = \
        extract_pdf_images(pdf)
    assert d_mr == d_g4
