"""OLE2/CFB container + legacy Office text recovery (operators/cfb.py):
spec-pinned roundtrips over the [MS-CFB] structure (mini vs regular FAT
routing, multi-sector directories, sibling BSTs, nested storages on
read), the [MS-DOC] piece table (both table-stream homes, mixed
compressed/UTF-16 pieces, the spec's literal compressed-byte table
where it DIVERGES from cp1252), BIFF8 .xls cells, and the loud damage
classes.  No independent OLE2 implementation exists in this container
(no olefile), so these spec-derived fixtures are the conformance pin."""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_old_spark.operators.cfb import (
    _DOC_COMPRESSED_MAP,
    _NOSTREAM,
    extract_doc_text,
    extract_xls_cells,
    read_cfb,
    write_cfb,
    write_doc,
    write_xls,
)


@pytest.mark.parametrize("streams", [
    {"a": b"x" * 10},                               # mini only
    {"big": b"y" * 6000},                           # regular only
    {"a": b"x" * 10, "big": b"y" * 5000, "e": b""},  # mixed + empty
    {f"s{k:02d}": bytes([k]) * (k * 37 % 300) for k in range(20)},
    {"cut": b"z" * 4095, "exact": b"z" * 4096},      # cutoff boundary
])
def test_cfb_roundtrip(streams):
    assert read_cfb(write_cfb(streams)) == streams


def test_cfb_directory_spans_sectors_and_bst_orders():
    # 20 entries -> 21 directory entries -> 6 sectors; names chosen so
    # the spec sort (length first, THEN uppercase) differs from plain sort
    streams = {"bb": b"1", "a": b"2", "AAA": b"3", "zz": b"4"}
    got = read_cfb(write_cfb(streams))
    assert got == streams


def test_cfb_degenerate_sibling_chain_walks_iteratively():
    """[MS-CFB] readers must tolerate unbalanced sibling trees: a
    legal right-leaning linked-list chain of ~1500 entries must walk
    without entry-count-scaled recursion (a recursive visit would
    RecursionError past the documented ValueError quarantine class;
    r13 ADVICE)."""
    streams = {f"s{i:04d}": b"v%d" % i for i in range(1500)}
    blob = write_cfb(streams, degenerate_siblings=True)
    assert read_cfb(blob) == streams


def test_cfb_nested_storage_read():
    """The reader walks storages recursively; the writer stages flat, so
    the fixture is surgically re-typed: stream 'S' becomes a storage
    whose child is 'Inner'."""
    blob = bytearray(write_cfb({"S": b"", "Inner": b"inner" * 5}))
    # locate S's 128-byte directory entry by its name field
    sname = "S".encode("utf-16-le") + b"\x00\x00"
    at = -1
    for i in range(0, len(blob) - 128, 128):
        if blob[i : i + len(sname)] == sname and blob[i + 64] == 4:
            at = i
            break
    assert at > 0
    blob[at + 66] = 1  # object type: storage
    struct.pack_into("<I", blob, at + 72, _NOSTREAM)  # right sibling
    struct.pack_into("<I", blob, at + 76, 2)          # child = Inner
    got = read_cfb(bytes(blob))
    assert got == {"S/Inner": b"inner" * 5}


def test_cfb_loud_damage():
    blob = write_cfb({"a": b"x" * 100, "big": b"y" * 5000})
    with pytest.raises(ValueError, match="signature"):
        read_cfb(b"PK" + blob[2:])
    with pytest.raises(ValueError, match="past end of file"):
        read_cfb(blob[: len(blob) // 2])
    # FAT chain cycle: point the first directory sector's FAT entry at
    # itself (FAT sector 0 starts at byte 512; directory start is named
    # in the header)
    first_dir = struct.unpack_from("<I", blob, 48)[0]
    broken = bytearray(blob)
    struct.pack_into("<I", broken, 512 + 4 * first_dir, first_dir)
    with pytest.raises(ValueError, match="cycle"):
        read_cfb(bytes(broken))
    # byte-order lie
    broken2 = bytearray(blob)
    struct.pack_into("<H", broken2, 28, 0xFEFF)
    with pytest.raises(ValueError, match="byte-order"):
        read_cfb(bytes(broken2))


@pytest.mark.parametrize("which_tbl", [0, 1])
@pytest.mark.parametrize("pad", [False, True])
def test_doc_roundtrip(which_tbl, pad):
    text = "Slab check on grid B7 — отметка +3.300, Ø12 шаг 200. " * 7
    blob = write_doc(text, which_tbl=which_tbl, pad_to_regular=pad)
    got, n_pieces = extract_doc_text(blob)
    assert got == text
    assert n_pieces > 1  # multi-piece by construction
    streams = read_cfb(blob)
    assert ("1Table" if which_tbl else "0Table") in streams
    assert "\x05SummaryInformation" in streams


def test_doc_mixes_compressed_and_unicode_pieces():
    blob = write_doc("ascii text only here, many words " * 4)
    streams = read_cfb(blob)
    word = streams["WordDocument"]
    # the alternating writer stored even pieces compressed: the raw
    # ASCII appears verbatim, and the UTF-16 form of odd pieces too
    assert b"ascii text only h" in word
    assert "o".encode("utf-16-le") * 1 in word


def test_doc_compressed_table_diverges_from_cp1252():
    """[MS-DOC]'s byte table omits 0x80/0x8E/0x9E, which cp1252 maps to
    €/Ž/ž — the spec says identity there, and the table says 0x91 is a
    left single quote."""
    assert 0x80 not in _DOC_COMPRESSED_MAP
    assert _DOC_COMPRESSED_MAP[0x91] == 0x2018
    from etl_pipeline_old_spark.operators.cfb import _doc_decompress
    assert _doc_decompress(bytes([0x80])) == "\x80"      # NOT '€'
    assert _doc_decompress(bytes([0x91])) == "‘"
    assert "cp1252" and bytes([0x80]).decode("cp1252") == "€"  # the trap


def test_doc_loud_damage():
    text = "damage corpus body " * 10
    blob = write_doc(text)
    streams = read_cfb(blob)
    # wIdent lie
    word = bytearray(streams["WordDocument"])
    struct.pack_into("<H", word, 0, 0x1234)
    with pytest.raises(ValueError, match="wIdent"):
        extract_doc_text(write_cfb({**streams, "WordDocument": bytes(word)}))
    # table stream missing
    with pytest.raises(ValueError, match="1Table stream missing"):
        extract_doc_text(
            write_cfb({k: v for k, v in streams.items() if k != "1Table"})
        )
    # ccpText lie: claims one more char than the pieces cover
    word2 = bytearray(streams["WordDocument"])
    struct.pack_into("<I", word2, 76, len(text) + 2)
    with pytest.raises(ValueError, match="ccpText"):
        extract_doc_text(write_cfb({**streams, "WordDocument": bytes(word2)}))
    # Clx pointing past the table stream
    word3 = bytearray(streams["WordDocument"])
    struct.pack_into("<I", word3, 0x01A2, 10 ** 6)
    with pytest.raises(ValueError, match="Clx"):
        extract_doc_text(write_cfb({**streams, "WordDocument": bytes(word3)}))


def test_xls_roundtrip_and_loud_classes():
    labels = ["alpha", "бета-штрих", "c" * 300]
    numbers = [0.0, -1.5, 2.0 ** 53, 0.123456789]
    blob = write_xls(labels, numbers)
    gl, gn, n_rk = extract_xls_cells(blob)
    assert gl == labels and gn == numbers
    assert n_rk == 3  # 0.123456789 needs the full NUMBER record
    # both SST storage forms present: latin-1 compressed + UTF-16
    wb = read_cfb(blob)["Workbook"]
    assert b"alpha" in wb and "бета".encode("utf-16-le") in wb
    # LABELSST index out of range
    broken = bytearray(blob)
    at = broken.find(struct.pack("<HH", 0x00FD, 10))
    assert at > 0
    struct.pack_into("<I", broken, at + 4 + 6, 999)
    with pytest.raises(ValueError, match="out of range"):
        extract_xls_cells(bytes(broken))
    # RK forms roundtrip through their packed encodings
    from etl_pipeline_old_spark.operators.cfb import _rk_decode, _rk_encode
    for v, form in ((7.0, 0b10), (-3.0, 0b10), (12.34, 0b11),
                    (float(2 ** 40), 0b00)):
        rk = _rk_encode(v)
        assert rk is not None and (rk & 0b11) == form and _rk_decode(rk) == v
    assert _rk_encode(0.123456789) is None
    # an SST outgrowing one 8224-byte record body CONTINUE-splits and
    # roundtrips (the production-sized-file shape)
    big = ["x" * 9000, "я" * 5000, "tail"]
    gl2, _, _ = extract_xls_cells(write_xls(big, []))
    assert gl2 == big


def test_xls_sst_continue_split_matrix():
    """[MS-XLS] 2.4.58 CONTINUE semantics: headers never split,
    character data splits at character boundaries at every phase, each
    continuing fragment re-emits its own fHighByte with the encoding
    RE-CHOSEN per fragment (one string legitimately mixes compressed
    and UTF-16 storage across fragments)."""
    import random

    from etl_pipeline_old_spark.operators.cfb import _sst_record_bodies

    rnd = random.Random(20260816)
    pool = (["ascii %d" % i for i in range(5)]
            + ["кирилл %d" % i for i in range(5)]
            + ["mix я z %04d " % i * rnd.randint(1, 40) for i in range(20)]
            + ["", "x"])
    for max_body in (16, 23, 32, 64, 257, 8224):
        strings = [rnd.choice(pool) for _ in range(60)]
        blob = write_xls(strings, [1.5, -3.0], sst_max_body=max_body)
        gl, gn, _ = extract_xls_cells(blob)
        assert gl == strings and gn == [1.5, -3.0], max_body
    # a single string that switches encodings across fragments both
    # ways (utf16 -> compressed tail, compressed -> utf16 tail)
    switchers = ["A" * 30 + "Я" + "B" * 30, "Ю" * 20 + "c" * 40]
    assert len(_sst_record_bodies(switchers, 24)) > 4
    gl, _, _ = extract_xls_cells(write_xls(switchers, [], sst_max_body=24))
    assert gl == switchers


def test_xls_sst_torn_continue_is_loud():
    """Dropping the final CONTINUE record (intact container, torn
    record chain) raises the documented ValueError class."""
    blob = write_xls(["long string " * 50], [], sst_max_body=64)
    wb = read_cfb(blob)["Workbook"]
    p, last = 0, None
    while p + 4 <= len(wb):
        rid, ln = struct.unpack_from("<HH", wb, p)
        if rid == 0x003C:
            last = (p, p + 4 + ln)
        p += 4 + ln
    assert last is not None
    torn = write_cfb({"Workbook": wb[: last[0]] + wb[last[1] :]})
    with pytest.raises(ValueError, match="SST"):
        extract_xls_cells(torn)
    # a header split across the boundary is the spec-violation loud
    # class: hand-build an SST whose first fragment ends mid-header
    from etl_pipeline_old_spark.operators.cfb import _CONTINUE, _SST, _rec

    frag1 = struct.pack("<II", 1, 1) + struct.pack("<H", 4)[:1]
    frag2 = (struct.pack("<H", 4)[1:] + b"\x00" + b"abcd")
    hand = write_cfb({"Workbook": bytes(
        _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0x0600))
        + _rec(_SST, frag1) + _rec(_CONTINUE, frag2) + _rec(0x000A, b"")
    )})
    with pytest.raises(ValueError, match="header split"):
        extract_xls_cells(hand)


def test_ppt_roundtrip_and_loud_damage():
    from etl_pipeline_old_spark.operators.cfb import (
        extract_ppt_text,
        write_ppt,
    )

    slides = [["Title", "Ж-подзаголовок"], ["bullet one", "two"]]
    blob = write_ppt(slides)
    assert extract_ppt_text(blob) == [p for s in slides for p in s]
    # both atom forms present on the wire
    wb = read_cfb(blob)["PowerPoint Document"]
    assert b"bullet one" in wb                      # TextBytesAtom
    assert "Ж".encode("utf-16-le") in wb            # TextCharsAtom
    # recLen lying past its container scope is loud
    streams = read_cfb(blob)
    doc = bytearray(streams["PowerPoint Document"])
    at = doc.find(b"bullet one") - 8
    struct.pack_into("<I", doc, at + 4, 10 ** 6)
    broken = write_cfb({**streams, "PowerPoint Document": bytes(doc)})
    with pytest.raises(ValueError, match="runs past"):
        extract_ppt_text(broken)
    # a deck without the document stream is loud
    with pytest.raises(ValueError, match="no PowerPoint Document"):
        extract_ppt_text(write_cfb({"Workbook": b"xx"}))


def test_msg_roundtrip_nested_storages_and_loud():
    from etl_pipeline_old_spark.operators.cfb import extract_msg, write_msg

    m = write_msg("Проект Ж", "body text", "a@e.com",
                  [("Боб", "b@e.com")], [("f.bin", b"\x00" * 9)])
    got = extract_msg(m)
    assert got["subject"] == "Проект Ж" and got["body"] == "body text"
    assert got["recipients"] == [("Боб", "b@e.com")]
    assert got["attachments"] == [("f.bin", 9)]
    # the recipient rides a genuine nested STORAGE with mixed-form
    # property streams inside it
    streams = read_cfb(m)
    assert "__recip_version1.0_#00000000/__substg1.0_3001001F" in streams
    assert "__recip_version1.0_#00000000/__substg1.0_3003001E" in streams
    # a message without its body property is loud
    with pytest.raises(ValueError, match="no body"):
        extract_msg(write_cfb({"__substg1.0_0037001E": b"subject only"}))


def test_xls_sst_rich_runs_skip_per_header_counts():
    """[MS-XLS] fRichSt: the FormatRun count rides the string header
    and the run data trails the characters — non-character
    continuation, which must NOT re-emit the flags byte when it
    splits across a CONTINUE boundary."""
    from etl_pipeline_old_spark.operators.cfb import _sst_record_bodies

    strings = ["ab", "cd", "RICH STRING " * 4, "кириллица тут", "tail"]
    for max_body in (16, 24, 8224):
        blob = write_xls(strings, [], sst_max_body=max_body, rich_every=3)
        gl, _, _ = extract_xls_cells(blob)
        assert gl == strings, max_body
    # the rich flag is really on the wire: the rich string's header
    # (cch=48, flags fRichSt, cRun=2) appears verbatim in a fragment
    bodies = _sst_record_bodies(strings, 8224, rich_every=3)
    rich_header = struct.pack("<HBH", 48, 0x08, 2)
    assert any(rich_header in b for b in bodies)
    # reserved flag bits stay loud
    blob = bytearray(write_xls(["abcd"], []))
    at = blob.find(struct.pack("<HB", 4, 0))
    assert at > 0
    blob[at + 2] = 0x42  # reserved bit 0x40 + fExtSt? 0x02 reserved
    with pytest.raises(ValueError, match="reserved"):
        extract_xls_cells(bytes(blob))
