"""Delta Lake log reading (queries/lake_delta.py): relational log
replay vs per-version scans, checkpoint-equals-replay, torn-commit
blast radius, and protocol-shaped staged metadata."""

from __future__ import annotations

import json
import os

from etl_pipeline_old_spark.queries import lake_delta as ld

SF_DIR = "/root/testdata/sf0.01"


def test_time_travel_stats_equal_scanned(spark):
    rows = {
        r.state_version: r
        for r in ld.lake_delta_time_travel(spark, SF_DIR).collect()
    }
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        assert r.n_docs_stats == r.n_docs_scanned
    # monotone history: v1 appended on v0; v2 removed zh from v1
    assert rows[1].n_docs_scanned > rows[0].n_docs_scanned
    assert rows[2].n_docs_scanned < rows[1].n_docs_scanned


def test_old_versions_unaffected_by_remove(spark):
    """v2 removed lang='zh'; v0/v1 resolved AFTER that commit must
    still include their zh files (the protocol's core promise)."""
    root = ld._stage_delta_table(spark, SF_DIR)
    actions = ld._log_actions(spark, root)
    from pyspark.sql import functions as F

    versions = spark.range(3).select(
        F.col("id").cast("long").alias("state_version")
    )
    live = ld._live_files(actions, versions).collect()
    langs = {}
    for r in live:
        langs.setdefault(int(r.state_version), set()).add(r.lang)
    assert "zh" in langs[0]
    assert "zh" in langs[1]
    assert "zh" not in langs[2]


def test_checkpoint_equals_replay(spark):
    row = ld.lake_delta_checkpoint_scan(spark, SF_DIR).collect()[0]
    assert row.replay_equal == 1
    assert row.n_files > 0 and row.n_docs_stats > 0


def test_torn_commit_costs_the_log_suffix(spark):
    rows = {
        r.state_version: r
        for r in ld.lake_delta_quarantine(spark, SF_DIR).collect()
    }
    assert rows[0].ok and rows[0].n_docs_stats is not None
    assert not rows[1].ok and rows[1].n_docs_stats is None
    assert not rows[2].ok and rows[2].n_docs_stats is None


def test_log_is_protocol_shaped(spark):
    root = ld._stage_delta_table(spark, SF_DIR)
    log = os.path.join(root, "_delta_log")
    names = sorted(os.listdir(log))
    assert ld._commit_name(0) in names
    assert "_last_checkpoint" in names
    # commit 0 carries protocol + metaData first, per the protocol
    with open(os.path.join(log, ld._commit_name(0))) as fh:
        actions = [json.loads(line) for line in fh]
    assert "protocol" in actions[0]
    assert "metaData" in actions[1]
    meta = actions[1]["metaData"]
    assert meta["partitionColumns"] == ["lang"]
    assert json.loads(meta["schemaString"])["type"] == "struct"
    # every add path is RELATIVE (the protocol's portability rule)
    for a in actions[2:]:
        if "add" in a:
            assert not a["add"]["path"].startswith("/")
    with open(os.path.join(log, "_last_checkpoint")) as fh:
        cp = json.load(fh)
    assert cp["version"] == 2
    assert os.path.exists(
        os.path.join(log, f"{2:020d}.checkpoint.parquet")
    )
