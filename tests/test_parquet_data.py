"""Parquet data-page codec (operators/parquet_data.py): value-for-value
cross-validation against DuckDB on the real (snappy-compressed,
arrow-written) driver testdata, pyarrow fixtures with nulls and many
row groups, hybrid-decoder semantics, and the loud seams."""

from __future__ import annotations

import glob
import os
import struct

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_old_spark.operators import parquet_data as pdta

SF_DIR = "/root/testdata/sf0.01"

_TABLES = sorted(glob.glob(os.path.join(SF_DIR, "*.parquet")))


def _norm(e):
    if e is None:
        return None
    if hasattr(e, "isoformat"):
        s = (
            e.isoformat(sep=" ")
            if hasattr(e, "hour")
            else e.isoformat()
        )
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s
    return e


@pytest.mark.parametrize("path", _TABLES)
def test_every_testdata_column_matches_duckdb(path):
    """The whole driver table decoded by the own pure-Python stack
    (footer Thrift → page headers → snappy → PLAIN/dictionary/hybrid)
    equals DuckDB's independent read, value for value."""
    _meta, cols = pdta.read_parquet_file(path)
    dd = duckdb.sql(f"select * from read_parquet('{path}')").fetchall()
    names = [
        d[0]
        for d in duckdb.sql(f"describe select * from read_parquet('{path}')").fetchall()
    ]
    for i, c in enumerate(names):
        key = c if c in cols else f"{c}.list.element"  # LIST leaf path
        expect = [_norm(row[i]) for row in dd]
        got = cols[key]
        if key.endswith(".list.element"):
            got = [None if v is None else list(v) for v in got]
            expect = [None if e is None else list(e) for e in expect]
        assert got == expect, (os.path.basename(path), c)


def test_nulls_multiple_row_groups_snappy(tmp_path):
    n = 50000
    t = pa.table(
        {
            "i": pa.array(
                [None if i % 13 == 0 else i * 7 for i in range(n)], pa.int64()
            ),
            "s": pa.array(
                [
                    None
                    if i % 11 == 0
                    else f"unique string value {i} {'x' * (i % 50)}"
                    for i in range(n)
                ]
            ),
            "b": pa.array([None if i % 17 == 0 else i % 2 == 0 for i in range(n)]),
            "f": pa.array([None if i % 19 == 0 else i / 3 for i in range(n)]),
        }
    )
    p = str(tmp_path / "f.parquet")
    pq.write_table(t, p, row_group_size=7000, compression="snappy")
    meta, cols = pdta.read_parquet_file(p)
    assert len(meta["row_groups"]) == 8
    back = pq.read_table(p)
    for c in t.column_names:
        assert cols[c] == back.column(c).to_pylist(), c


def test_gzip_and_uncompressed_codecs(tmp_path):
    t = pa.table({"x": pa.array(range(1000), pa.int64())})
    for codec in ("gzip", "none"):
        p = str(tmp_path / f"{codec}.parquet")
        pq.write_table(t, p, compression=codec)
        _meta, cols = pdta.read_parquet_file(p)
        assert cols["x"] == list(range(1000)), codec


def test_hybrid_rle_and_bitpacked_lsb_first():
    # RLE run: header 2*5 (LSB 0), 1-byte value 1 → five 1s
    vals, _ = pdta._read_hybrid(bytes([10, 1]), 0, 1, 5)
    assert vals == [1] * 5
    # bit-packed: header (1<<1)|1 = 3, one group of 8 one-bit values
    # packed LSB-first: 0b10110100 → [0,0,1,0,1,1,0,1]
    vals, _ = pdta._read_hybrid(bytes([3, 0b10110100]), 0, 1, 8)
    assert vals == [0, 0, 1, 0, 1, 1, 0, 1]
    with pytest.raises(ValueError, match="truncated"):
        pdta._read_hybrid(bytes([10]), 0, 1, 5)


def _check_all_columns(path, table):
    _meta, cols = pdta.read_parquet_file(path)
    for c in table.column_names:
        assert cols[c] == table[c].to_pylist(), c


def _modern_table():
    import random

    rnd = random.Random(11)
    return pa.table(
        {
            "i64": pa.array(
                [rnd.randrange(-(10**12), 10**12) for _ in range(3000)],
                pa.int64(),
            ),
            "i32": pa.array(
                [rnd.randrange(-(2**31), 2**31) for _ in range(3000)],
                pa.int32(),
            ),
            "mono": pa.array(list(range(3000)), pa.int64()),
            "s": pa.array(
                [f"prefix/common/{i % 50:04d}/{rnd.randrange(1000)}" for i in range(3000)]
            ),
            "f": pa.array([rnd.random() * 1e6 for _ in range(3000)], pa.float64()),
            "ni": pa.array([None if i % 7 == 0 else i for i in range(3000)], pa.int64()),
            "ns": pa.array([None if i % 5 == 0 else f"s{i}" for i in range(3000)]),
        }
    )


_DELTA_ENCODINGS = {
    "i64": "DELTA_BINARY_PACKED",
    "i32": "DELTA_BINARY_PACKED",
    "mono": "DELTA_BINARY_PACKED",
    "s": "DELTA_BYTE_ARRAY",
    "ni": "DELTA_BINARY_PACKED",
    "ns": "DELTA_LENGTH_BYTE_ARRAY",
    "f": "BYTE_STREAM_SPLIT",
}


def test_data_page_v2_decodes(tmp_path):
    # the r14b V2 closure: levels uncompressed ahead of the values,
    # no 4-byte level-length prefixes — dictionary and delta paths
    t = _modern_table()
    for name, kw in (
        ("dict", dict(data_page_version="2.0", compression="snappy", row_group_size=1000)),
        ("zstd", dict(data_page_version="2.0", compression="zstd")),
        ("none", dict(data_page_version="2.0", compression="none")),
    ):
        p = str(tmp_path / f"v2_{name}.parquet")
        pq.write_table(t, p, **kw)
        _check_all_columns(p, t)


def test_delta_and_byte_stream_split_encodings(tmp_path):
    """The parquet-mr v2 writer's default encodings, cross-validated
    against pyarrow on both page versions: DELTA_BINARY_PACKED (32- and
    64-bit modular arithmetic), DELTA_LENGTH/DELTA_BYTE_ARRAY prefix
    compression, BYTE_STREAM_SPLIT float planes — with nulls and
    multiple row groups."""
    t = _modern_table()
    for name, kw in (
        ("v1", dict(compression="snappy")),
        ("v2", dict(data_page_version="2.0", compression="gzip", row_group_size=700)),
    ):
        p = str(tmp_path / f"delta_{name}.parquet")
        pq.write_table(
            t, p, use_dictionary=False, column_encoding=_DELTA_ENCODINGS, **kw
        )
        _check_all_columns(p, t)


def test_zstd_codec_decodes(tmp_path):
    # the r14 own RFC 8878 decoder closed the former ZSTD loud seam:
    # libzstd-written pages through the own stack, value-exact
    p = str(tmp_path / "z.parquet")
    t = pa.table(
        {
            "x": pa.array(range(2000), pa.int64()),
            "s": pa.array([f"value {i % 37}" for i in range(2000)]),
        }
    )
    pq.write_table(t, p, compression="zstd", row_group_size=700)
    _meta, cols = pdta.read_parquet_file(p)
    assert cols["x"] == list(range(2000))
    assert cols["s"] == t["s"].to_pylist()


def test_required_columns_have_no_def_levels(tmp_path):
    # parquet-mr writes Spark non-nullable columns (concat_ws, literals)
    # as REQUIRED — their data pages carry NO definition levels, which
    # the r14 probe caught the reader misparsing as a hybrid run
    p = str(tmp_path / "req.parquet")
    schema = pa.schema(
        [
            pa.field("x", pa.int64(), nullable=False),
            pa.field("s", pa.string(), nullable=False),
            pa.field("opt", pa.string(), nullable=True),
        ]
    )
    t = pa.table(
        {
            "x": pa.array(range(500), pa.int64()),
            "s": pa.array([f"row {i}" for i in range(500)]),
            "opt": pa.array([None if i % 3 == 0 else f"o{i}" for i in range(500)]),
        },
        schema=schema,
    )
    pq.write_table(t, p, compression="snappy", row_group_size=200)
    _meta, cols = pdta.read_parquet_file(p)
    assert cols["x"] == list(range(500))
    assert cols["s"] == t["s"].to_pylist()
    assert cols["opt"] == t["opt"].to_pylist()


def test_brotli_codec_is_loud(tmp_path):
    # brotli stays the honest loud seam (its static dictionary is not
    # transcribable in-container)
    p = str(tmp_path / "b.parquet")
    pq.write_table(
        pa.table({"x": pa.array(range(100), pa.int64())}), p, compression="brotli"
    )
    with pytest.raises(NotImplementedError, match="BROTLI"):
        pdta.read_parquet_file(p)


def test_torn_chunk_is_loud():
    path = os.path.join(SF_DIR, "nation.parquet")
    from etl_pipeline_old_spark.operators.parquet_meta import (
        parse_file_meta,
        read_footer_tail,
    )

    meta = parse_file_meta(read_footer_tail(path))
    col = meta["row_groups"][0]["columns"][0]
    first = col["dictionary_page_offset"] or col["data_page_offset"]
    with open(path, "rb") as fh:
        fh.seek(first)
        chunk = fh.read(col["total_compressed_size"])
    elem = {"physical": col["physical"], "optional": True}
    assert pdta.read_column_chunk(chunk, col, elem)  # intact decodes
    with pytest.raises(ValueError):
        pdta.read_column_chunk(chunk[: len(chunk) // 2], col, elem)
    scribbled = bytes([0xFF] * 8) + chunk[8:]
    with pytest.raises(ValueError):
        pdta.read_column_chunk(scribbled, col, elem)


def test_list_columns_all_shapes(tmp_path):
    """One-level LIST reassembly from rep/def levels: null lists, empty
    lists, null elements, long lists — v1 and v2 pages, dictionary and
    plain, every codec family."""
    lists = [None, [], [1.5], [None, 2.5, None], [float(i) for i in range(20)]] * 400
    t = pa.table(
        {"id": pa.array(range(len(lists))), "v": pa.array(lists, pa.list_(pa.float64()))}
    )
    for name, kw in (
        ("v1", dict(compression="snappy", row_group_size=500)),
        ("v2", dict(data_page_version="2.0", compression="zstd", row_group_size=700)),
        ("nodict", dict(use_dictionary=False, compression="gzip")),
    ):
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(t, p, **kw)
        _m, cols = pdta.read_parquet_file(p)
        assert cols["v.list.element"] == lists, name
        assert cols["id"] == list(range(len(lists))), name


def test_deeper_nesting_is_loud(tmp_path):
    p = str(tmp_path / "nested.parquet")
    ll = [[[1, 2], [3]], None, [[], [4]]]
    pq.write_table(pa.table({"v": pa.array(ll, pa.list_(pa.list_(pa.int64())))}), p)
    with pytest.raises(NotImplementedError, match="repeated level"):
        pdta.read_parquet_file(p)


def test_int96_and_decimal_columns(tmp_path):
    """Legacy-lake types: INT96 timestamps (Julian day + nanos-of-day,
    what old Hive/Spark writers emit) and decimal128-as-FLBA
    (big-endian two's complement + declared scale) — both
    cross-validated against pyarrow."""
    import datetime
    import decimal

    ts = [
        datetime.datetime(2026, 8, 16, 12, 34, 56, 789123),
        datetime.datetime(1999, 12, 31, 23, 59, 59),
        None,
        datetime.datetime(1969, 7, 20, 20, 17, 40, 500000),
    ] * 250
    dec = [
        decimal.Decimal("123.45"),
        None,
        decimal.Decimal("-0.01"),
        decimal.Decimal("99999999.99"),
    ] * 250
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "dec": pa.array(dec, pa.decimal128(10, 2)),
        }
    )
    p = str(tmp_path / "i96.parquet")
    pq.write_table(
        t, p, use_deprecated_int96_timestamps=True, compression="snappy",
        row_group_size=400,
    )
    _m, cols = pdta.read_parquet_file(p)
    back = pq.read_table(p)

    def norm(s):
        if s is None:
            return None
        return s.rstrip("0").rstrip(".") if "." in s else s

    want = [
        None if v is None else norm(v.isoformat(sep=" "))
        for v in back["ts"].to_pylist()
    ]
    assert [norm(g) for g in cols["ts"]] == want
    got = [None if v is None else decimal.Decimal(v) for v in cols["dec"]]
    assert got == back["dec"].to_pylist()
