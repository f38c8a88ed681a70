"""Snappy codec (operators/snappy.py): cross-validation against the
independent C++ compressor (the snappy chunks pyarrow writes inside
ORC files), literal-form roundtrips, overlapping-copy semantics, and
damage classes."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.orc as paorc
import pytest

from etl_pipeline_old_spark.operators import orc as myorc
from etl_pipeline_old_spark.operators import protobuf_wire as pw
from etl_pipeline_old_spark.operators import snappy as sn

_RNG = random.Random(3)


def _cpp_chunks(tmp_path) -> list[bytes]:
    """Real snappy-compressed chunks produced by the C++ encoder, plus
    the byte payload each must decode to (recovered via the chunked ORC
    framing whose shape test_orc.py already pins)."""
    p = str(tmp_path / "s.orc")
    n = 20000
    paorc.write_table(
        pa.table(
            {
                "x": pa.array(range(n), pa.int64()),
                "t": pa.array(
                    [f"the quick brown fox {i % 37} " * 4 for i in range(n)]
                ),
                "r": pa.array(
                    [_RNG.randrange(0, 1 << 40) for _ in range(n)], pa.int64()
                ),
            }
        ),
        p,
        compression="snappy",
    )
    blob = open(p, "rb").read()
    ps = myorc.read_postscript(blob)
    assert ps["compression"] == "SNAPPY"
    end = len(blob) - 1 - ps["ps_length"]
    region = blob[end - ps["footer_length"] : end]
    chunks, pos = [], 0
    while pos < len(region):
        hdr = int.from_bytes(region[pos : pos + 3], "little")
        pos += 3
        ln = hdr >> 1
        if not hdr & 1:
            chunks.append(region[pos : pos + ln])
        pos += ln
    assert chunks, "C++ writer produced no compressed footer chunks"
    return chunks


def test_decodes_cpp_compressor_output(tmp_path):
    """The decoded footer parses as a valid protobuf Footer with the
    right row count — a single mis-decoded copy would scramble it."""
    chunks = _cpp_chunks(tmp_path)
    raw = b"".join(sn.decompress(c) for c in chunks)
    foot = pw.parse_message(raw)
    assert pw.get_uint(foot, 6) == 20000


def test_whole_snappy_orc_value_exact(tmp_path):
    p = str(tmp_path / "v.orc")
    n = 5000
    table = pa.table(
        {
            "x": pa.array(range(n), pa.int64()),
            "t": pa.array([f"payload {i} " * 6 for i in range(n)]),
        }
    )
    paorc.write_table(table, p, compression="snappy")
    _tail, cols = myorc.read_orc(open(p, "rb").read())
    assert cols["x"] == list(range(n))
    assert cols["t"] == [f"payload {i} " * 6 for i in range(n)]


def test_literal_roundtrip_shapes():
    for size in (0, 1, 59, 60, 61, 100, 65536, 70000, 200001):
        data = bytes(_RNG.randrange(256) for _ in range(min(size, 4096)))
        data = (data * (size // max(len(data), 1) + 1))[:size]
        assert sn.decompress(sn.compress(data)) == data, size


def test_overlapping_copy_generates_run():
    # literal 'ab' then a copy of length 6 at offset 2 → 'abababab'
    payload = bytes([8]) + bytes([0x01 << 2]) + b"ab" + bytes([((6 - 4) << 2) | 0x01, 2])
    assert sn.decompress(payload) == b"abababab"


def test_damage_classes_are_loud():
    with pytest.raises(ValueError, match="preamble"):
        sn.decompress(b"")
    with pytest.raises(ValueError, match="literal runs past"):
        sn.decompress(bytes([10, 9 << 2]) + b"short")
    with pytest.raises(ValueError, match="outside produced output"):
        # copy-2 with offset 9 when only 2 bytes exist
        sn.decompress(bytes([8, 0x01 << 2]) + b"ab" + bytes([0x02, 9, 0]))
    with pytest.raises(ValueError, match="outside produced output"):
        # zero offset
        sn.decompress(bytes([8, 0x01 << 2]) + b"ab" + bytes([0x02, 0, 0]))
    with pytest.raises(ValueError, match="output length"):
        # preamble lies about the total
        sn.decompress(bytes([99, 0x01 << 2]) + b"ab")
