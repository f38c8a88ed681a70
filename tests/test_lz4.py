"""LZ4 block + frame codec (operators/lz4.py): cross-validated BOTH
directions against the reference implementation, which ships in this
container twice (pyarrow's lz4/lz4_raw codecs and the lz4 CLI) — the
snappy/zstd-grade pin.  XXH32 is pinned by the reference frames' own
checksum fields plus the published empty-input check value."""

from __future__ import annotations

import random
import shutil
import struct
import subprocess

import pyarrow as pa
import pytest

from etl_pipeline_old_spark.operators.lz4 import (
    compress_block_literal,
    compress_frame_literal,
    decompress_block,
    decompress_frame,
    xxh32,
)

_RAW = pa.Codec("lz4_raw")
_FRAME = pa.Codec("lz4")
_CLI = shutil.which("lz4") or "/root/miniconda/bin/lz4"
_RND = random.Random(20260816)


def _cli(data: bytes, *args: str) -> bytes:
    return subprocess.run(
        [_CLI, "-q", *args], input=data, capture_output=True, check=True
    ).stdout


def _payloads() -> dict[str, bytes]:
    return {
        "tiny": b"abc",
        "rle": b"a" * 10000,
        "text": b"the quick brown fox jumps over the lazy dog " * 500,
        "random": _RND.randbytes(20000),
        "mixed": b" ".join(
            _RND.choice([b"alpha", b"beta", b"gamma"]) for _ in range(100000)
        ),
    }


def test_decodes_reference_blocks_and_frames():
    for name, data in _payloads().items():
        assert decompress_block(bytes(_RAW.compress(data))) == data, name
        assert decompress_frame(bytes(_FRAME.compress(data))) == data, name
        for lvl in ("-1", "-9"):
            assert decompress_frame(_cli(data, lvl)) == data, (name, lvl)
        # small linked blocks + per-block checksums
        assert decompress_frame(_cli(data, "-B4", "-BX")) == data, name
    assert decompress_frame(bytes(_FRAME.compress(b""))) == b""


def test_own_frames_decode_through_reference():
    for name, data in _payloads().items():
        own = compress_frame_literal(data)
        assert _cli(own, "-d") == data, name
        assert bytes(_FRAME.decompress(own, len(data))) == data, name
        assert decompress_block(compress_block_literal(data)) == data, name


def test_xxh32_pinned_by_reference_checksums():
    assert xxh32(b"") == 0x02CC5D05  # published check value
    # the CLI writes a content checksum by default — its trailing 4
    # bytes must equal our xxh32 of the payload
    frame = _cli(b"pin me down", "-1")
    assert frame[-4:] == struct.pack("<I", xxh32(b"pin me down"))


def test_damage_is_loud():
    data = b"the corpus shard " * 300
    frame = _cli(data, "-9")
    with pytest.raises(ValueError, match="magic"):
        decompress_frame(b"ZZZZ" + frame[4:])
    with pytest.raises(ValueError, match="header checksum"):
        broken = bytearray(frame)
        broken[4] ^= 0x04  # flip the content-checksum FLG bit
        decompress_frame(bytes(broken))
    with pytest.raises(ValueError, match="truncated|checksum|history"):
        decompress_frame(frame[:-6])
    broken = bytearray(frame)
    broken[len(frame) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decompress_frame(bytes(broken))
    with pytest.raises(ValueError, match="offset beyond history"):
        # token demands a match 4 deep into 1 byte of history
        decompress_block(bytes([0x10, 0x41, 0x04, 0x00, 0x00]))
    with pytest.raises(ValueError, match="zero match offset"):
        decompress_block(bytes([0x10, 0x41, 0x00, 0x00, 0x00]))


def test_lz4_raw_parquet_pages_decode(tmp_path):
    import pyarrow.parquet as pq

    from etl_pipeline_old_spark.operators import parquet_data as pdta

    p = str(tmp_path / "l.parquet")
    t = pa.table(
        {
            "x": pa.array(range(2000), pa.int64()),
            "s": pa.array([f"value {i % 37}" for i in range(2000)]),
        }
    )
    pq.write_table(t, p, compression="lz4", row_group_size=700)
    _meta, cols = pdta.read_parquet_file(p)
    assert cols["x"] == list(range(2000))
    assert cols["s"] == t["s"].to_pylist()
