"""Iceberg table reading (queries/lake_iceberg.py): partition-prune
plan lock, snapshot isolation, manifest-claim vs scan agreement, and
torn-manifest blast radius."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_old_spark.queries import lake_iceberg as li

SF_DIR = "/root/testdata/sf0.01"


def test_partition_prune_scans_only_en_files(spark):
    df = li.lake_iceberg_partition_prune(spark, SF_DIR)
    files = df.inputFiles()
    assert files, "prune query must scan something"
    assert all("lang=en" in f for f in files), files
    row = df.collect()[0]
    assert row.n_files_scanned == len(set(files))


def test_snapshot_isolation_after_delete(spark):
    """s3 deleted lang='zh'; s1/s2 resolved AFTER that commit must still
    carry their zh files (the spec's core promise)."""
    root = li._stage_iceberg_table(spark, SF_DIR)
    meta = li._load_metadata(root)
    rows = li._snapshot_manifests(meta)
    entries = li._entries_frame(spark, rows).where("status != 2").collect()
    langs_by_snap = {}
    for e in entries:
        langs_by_snap.setdefault(e.snapshot_ord, set()).add(e.lang)
    assert "zh" in langs_by_snap[1]
    assert "zh" in langs_by_snap[2]
    assert "zh" not in langs_by_snap[3]


def test_manifest_counts_equal_scanned_counts(spark):
    rows = {
        r.snapshot_ord: r
        for r in li.lake_iceberg_time_travel(spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r.n_docs_manifest == r.n_docs_scanned
    # later snapshots see monotone history: s2 ⊇ s1, s3 = s2 minus zh
    assert rows[2].n_docs_scanned > rows[1].n_docs_scanned
    assert rows[3].n_docs_scanned < rows[2].n_docs_scanned


def test_torn_manifest_costs_only_its_snapshot(spark):
    rows = {
        r.snapshot_ord: r
        for r in li.lake_iceberg_quarantine(spark, SF_DIR).collect()
    }
    assert rows[1].status == "ok" and rows[1].n_files is not None
    assert rows[2].status == "torn_manifest" and rows[2].n_files is None
    assert rows[3].status == "ok" and rows[3].n_files is not None


def test_metadata_tree_is_spec_shaped(spark):
    root = li._stage_iceberg_table(spark, SF_DIR)
    meta = li._load_metadata(root)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == meta["snapshots"][-1]["snapshot-id"]
    hint = open(os.path.join(root, "metadata", "version-hint.text")).read()
    assert hint == "3"
    # manifest lists are real Avro containers carrying partition summaries
    from etl_pipeline_old_spark.operators.avro import read_avro

    with open(meta["snapshots"][1]["manifest-list"], "rb") as fh:
        _s, codec, manifests = read_avro(fh.read())
    assert codec == "deflate"
    assert len(manifests) == 2  # era0 (reused) + era1 (added)
    for m in manifests:
        (summary,) = m["partitions"]
        assert summary["lower_bound"] == b"de"
        assert summary["upper_bound"] == b"zh"
        assert os.path.getsize(m["manifest_path"]) == m["manifest_length"]


def test_v2_positional_deletes_apply_exactly(spark):
    """Format v2 MOR: tombstoned rows vanish, everything else survives
    with exact counts; no data file was rewritten (the delete file is
    the only new data object)."""
    rows = {
        r.lang: r
        for r in li.lake_iceberg_positional_deletes(spark, SF_DIR).collect()
    }
    import duckdb

    want = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            f"""SELECT lang,
              COUNT(*) FILTER (WHERE doc_id % 7 != 3),
              COUNT(*) FILTER (WHERE doc_id % 7 = 3)
            FROM '{SF_DIR}/documents.parquet' GROUP BY lang"""
        ).fetchall()
    }
    assert set(rows) == set(want)
    for lang, (nv, nd) in want.items():
        assert rows[lang].n_visible == nv, lang
        assert rows[lang].n_deleted == nd, lang
    root = li._stage_iceberg_v2_table(spark, SF_DIR)
    import glob as _glob

    data_files = _glob.glob(os.path.join(root, "data", "lang=*", "*.parquet"))
    assert data_files
    assert all("tmp" not in os.path.basename(f) for f in data_files)
