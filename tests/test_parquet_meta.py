"""Parquet footer codec (operators/parquet_meta.py): cross-validation
against DuckDB's parquet_metadata() on the arrow-written driver
testdata, tail-framing damage classes, stats rendering, and the
footer-planned scan's input-file lock."""

from __future__ import annotations

import datetime
import glob
import os
import struct

import duckdb
import pytest

from etl_pipeline_old_spark.operators import parquet_meta as pm

SF_DIR = "/root/testdata/sf0.01"


def _own_cells(path):
    meta = pm.parse_file_meta(pm.read_footer_tail(path))
    out = {}
    for gi, rg in enumerate(meta["row_groups"]):
        for c in rg["columns"]:
            out[(gi, c["path"].replace(".", ", "))] = (
                c["num_values"],
                c["null_count"],
                c["min"],
                c["max"],
                c["codec"],
                c["total_compressed_size"],
                c["total_uncompressed_size"],
            )
    return meta, out


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(SF_DIR, "*.parquet")))
)
def test_footer_matches_duckdb(path):
    """Every column-chunk cell this codec decodes — counts, null counts,
    min/max strings, codec, sizes — must equal what DuckDB reads from the
    same footer (independent implementations, independent writer)."""
    meta, ours = _own_cells(path)
    rows = duckdb.sql(
        "select row_group_id, path_in_schema, num_values, stats_null_count,"
        " stats_min_value, stats_max_value, compression,"
        " total_compressed_size, total_uncompressed_size"
        f" from parquet_metadata('{path}')"
    ).fetchall()
    assert rows, path
    for rgid, p, *expect in rows:
        assert ours.get((rgid, p)) == tuple(expect), (path, rgid, p)
    (nrows,) = duckdb.sql(
        f"select num_rows from parquet_file_metadata('{path}')"
    ).fetchone()
    assert meta["num_rows"] == nrows


def test_nested_list_path_flattens():
    meta = pm.parse_file_meta(
        pm.read_footer_tail(os.path.join(SF_DIR, "embeddings.parquet"))
    )
    paths = {c["path"] for c in meta["columns"]}
    assert "embedding.list.element" in paths


def _intact_bytes():
    with open(os.path.join(SF_DIR, "nation.parquet"), "rb") as fh:
        return fh.read()


def test_tail_damage_classes_are_loud():
    blob = _intact_bytes()
    # intact parses
    pm.parse_file_meta(pm.footer_from_bytes(blob))
    with pytest.raises(ValueError, match="shorter than minimal"):
        pm.footer_from_bytes(blob[:8])
    with pytest.raises(ValueError, match="missing PAR1"):
        pm.footer_from_bytes(blob[:-4] + b"PAR0")
    bad_len = blob[:-8] + struct.pack("<I", len(blob)) + b"PAR1"
    with pytest.raises(ValueError, match="runs past"):
        pm.footer_from_bytes(bad_len)
    flen = struct.unpack("<I", blob[-8:-4])[0]
    start = len(blob) - 8 - flen
    scribbled = blob[:start] + b"\xff" * min(64, flen) + blob[start + min(64, flen):]
    with pytest.raises(ValueError):
        pm.parse_file_meta(pm.footer_from_bytes(scribbled))
    with pytest.raises(ValueError, match="truncated"):
        pm.parse_file_meta(blob[start : start + 5])


def test_float32_stats_render_shortest_roundtrip(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [0.1, -0.5252062082290649, 1.0, 3.4e38, 1.5e-45]
    p = str(tmp_path / "f32.parquet")
    pq.write_table(pa.table({"x": pa.array(vals, pa.float32())}), p)
    meta = pm.parse_file_meta(pm.read_footer_tail(p))
    col = meta["row_groups"][0]["columns"][0]
    (mn, mx) = duckdb.sql(
        f"select stats_min_value, stats_max_value from parquet_metadata('{p}')"
    ).fetchone()
    assert (col["min"], col["max"]) == (mn, mx)
    # the rendered strings round-trip to the exact float32 bits
    assert struct.pack("<f", float(col["min"])) == struct.pack(
        "<f", min(struct.unpack("<f", struct.pack("<f", v))[0] for v in vals)
    )


def test_int32_date_and_timestamp_units(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    days = [-719162, -1, 0, 11016, 2932896]  # 0001-01-01 .. 9999-12-31
    ts_ms = [0, 1_700_000_123_456, -86_400_000, 999, -1]
    p = str(tmp_path / "dt.parquet")
    pq.write_table(
        pa.table(
            {
                "d": pa.array(days, pa.date32()),
                "t": pa.array(ts_ms, pa.timestamp("ms")),
            }
        ),
        p,
    )
    meta = pm.parse_file_meta(pm.read_footer_tail(p))
    cols = {c["path"]: c for c in meta["row_groups"][0]["columns"]}
    rows = {
        p_: (mn, mx)
        for p_, mn, mx in duckdb.sql(
            "select path_in_schema, stats_min_value, stats_max_value"
            f" from parquet_metadata('{p}')"
        ).fetchall()
    }
    assert (cols["d"]["min"], cols["d"]["max"]) == rows["d"]
    assert (cols["t"]["min"], cols["t"]["max"]) == rows["t"]


def test_civil_date_matches_datetime():
    for z in (-719162, -141427, -1, 0, 1, 19000, 2932896):
        y, m, d = pm._civil_from_days(z)
        assert datetime.date(1970, 1, 1) + datetime.timedelta(days=z) == datetime.date(
            y, m, d
        )


def test_planned_scan_reads_only_kept_files(spark):
    from etl_pipeline_old_spark.queries import lake_footer as lf

    df = lf.lake_footer_planned_scan.__wrapped__(spark, SF_DIR) if hasattr(
        lf.lake_footer_planned_scan, "__wrapped__"
    ) else lf.lake_footer_planned_scan(spark, SF_DIR)
    names = sorted(os.path.basename(p) for p in df.inputFiles())
    assert names == ["00000.parquet", "00001.parquet"], names
    row = df.collect()[0]
    assert row.n_files_total == 4 and row.n_files_read == 2
    assert row.n_docs == 81  # doc_id 60..140 inclusive


def test_footer_read_is_tail_only(tmp_path):
    """read_footer_stream touches only the framing tail: a file whose body
    bytes are scrubbed (footer kept) still parses — proof no data page is
    ever read by the metadata path."""
    blob = bytearray(_intact_bytes())
    flen = struct.unpack("<I", blob[-8:-4])[0]
    body_end = len(blob) - 8 - flen
    blob[4:body_end] = b"\x00" * (body_end - 4)
    meta = pm.parse_file_meta(pm.footer_from_bytes(bytes(blob)))
    assert meta["num_rows"] == 25
