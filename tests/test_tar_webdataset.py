"""ustar codec (operators/tar.py) — cross-validation against the
independent stdlib tarfile module in BOTH directions (our writer's
output reads identically under tarfile; tarfile's own output reads
identically under our block walker), plus strictness and a Hypothesis
round-trip. The WebDataset ingest built on it is value-checked by
test_oracle_parity."""

from __future__ import annotations

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.operators.tar import encode_tar, iter_tar

MEMBERS = [
    ("00000001.jpg", b"\xff\xd8fake"),
    ("00000001.txt", b"a caption with words"),
    ("00000001.json", b'{"lang":"en"}'),
    ("00000002.txt", b"x" * 1500),  # spans multiple data blocks
    ("empty.bin", b""),
]


def test_tarfile_reads_our_archive():
    blob = encode_tar(MEMBERS)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == MEMBERS


def test_our_walker_reads_tarfile_archive():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for n, d in MEMBERS:
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(d))
    assert list(iter_tar(buf.getvalue())) == MEMBERS


def test_our_writer_is_byte_deterministic():
    assert encode_tar(MEMBERS) == encode_tar(MEMBERS)


def test_header_corruption_is_detected():
    blob = bytearray(encode_tar(MEMBERS))
    blob[4] ^= 0xFF  # flip a byte inside the first member's name field
    with pytest.raises(ValueError, match="checksum"):
        list(iter_tar(bytes(blob)))


def test_truncated_member_is_detected():
    blob = encode_tar(MEMBERS)
    with pytest.raises(ValueError):
        list(iter_tar(blob[: 512 + 2]))  # header + torn data


def test_truncation_at_block_boundary_is_detected():
    # Cut exactly after the first member's header+data blocks: every
    # retained block parses cleanly, but the end-of-archive marker is
    # gone — the walker must refuse rather than silently drop the rest.
    blob = encode_tar(MEMBERS)
    first_len = 512 + len(MEMBERS[0][1]) + ((-len(MEMBERS[0][1])) % 512)
    with pytest.raises(ValueError, match="end-of-archive"):
        list(iter_tar(blob[:first_len]))
    # the degenerate empty blob has no marker either
    with pytest.raises(ValueError, match="end-of-archive"):
        list(iter_tar(b""))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[A-Za-z0-9._-]{1,40}", fullmatch=True),
            st.binary(max_size=2000),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_roundtrip_property(members):
    blob = encode_tar(members)
    assert list(iter_tar(blob)) == members
    # and the independent reader agrees
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


# ------------------------------------------------- r13: bz2/xz shards


def test_compressed_shard_torn_streams_are_loud():
    import bz2
    import lzma

    import pytest

    from etl_pipeline_old_spark.operators.tar import encode_tar, iter_tar

    tar = encode_tar([("00000001.txt", b"payload " * 50)])
    for codec, comp in (("bz2", bz2), ("xz", lzma)):
        blob = comp.compress(tar)
        assert comp.decompress(blob) == tar
        torn = blob[: len(blob) // 2]
        with pytest.raises((OSError, EOFError, ValueError, lzma.LZMAError)):
            comp.decompress(torn)
    # a truncated bz2 MULTISTREAM tears at the damaged stream only:
    # earlier independent streams still decode by offset
    s1, s2 = bz2.compress(b"alpha" * 20), bz2.compress(b"beta" * 20)
    dump = s1 + s2
    assert bz2.decompress(dump[: len(s1)]) == b"alpha" * 20
    with pytest.raises((OSError, EOFError, ValueError)):
        bz2.decompress(dump[: len(s1) + len(s2) // 2][len(s1):])
