"""Python DataSource WRITER path for the K6 sheet append (executor-parallel)."""

from __future__ import annotations

import json
import os

import pytest

from etl_pipeline_old_spark.sinks.sheets_datasource import (
    FORMAT_NAME,
    append_missing_distributed,
    register,
)

FACTORY = "etl_pipeline_old_spark.sinks.sheets_datasource.file_transport_factory"


def _read_all(path: str) -> list[list]:
    rows = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".jsonl"):
            with open(os.path.join(path, f), encoding="utf-8") as fh:
                rows.extend(json.loads(line) for line in fh)
    return rows


def test_writer_appends_all_rows_exactly_once(spark, tmp_path):
    register(spark)
    df = spark.range(20).selectExpr("id", "concat('row-', id) AS name").repartition(4)
    out = str(tmp_path / "sheet")
    (
        df.write.format(FORMAT_NAME)
        .mode("append")
        .option("transport_factory", FACTORY)
        .option("path", out)
        .save()
    )
    rows = _read_all(out)
    assert sorted(r[0] for r in rows) == list(range(20))
    # multiple partitions really wrote in parallel (one file per non-empty part)
    n_files = len([f for f in os.listdir(out) if f.endswith(".jsonl")])
    assert n_files > 1
    # staged recipe: commit published every stage; no orphaned .tmp remains
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_writer_rejects_overwrite(spark, tmp_path):
    register(spark)
    df = spark.range(3)
    with pytest.raises(Exception, match="append-only"):
        (
            df.write.format(FORMAT_NAME)
            .mode("overwrite")
            .option("transport_factory", FACTORY)
            .option("path", str(tmp_path / "x"))
            .save()
        )


def test_k6_anti_join_flow_appends_only_missing(spark, tmp_path):
    new = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    existing = spark.createDataFrame([(1,), (3,)], "k long")
    out = str(tmp_path / "sheet2")
    append_missing_distributed(
        new, existing, "k", transport_factory=FACTORY, path=out
    )
    rows = _read_all(out)
    assert sorted(r[0] for r in rows) == [2, 4]


def test_failed_job_publishes_nothing(spark, tmp_path):
    """One poisoned partition fails its write; the job aborts and NO final
    file may exist — the staged-commit exactly-once guarantee."""
    register(spark)
    df = spark.range(20).repartition(4)
    out = str(tmp_path / "sheet3")
    with pytest.raises(Exception):
        (
            df.write.format(FORMAT_NAME)
            .mode("append")
            .option(
                "transport_factory",
                "etl_pipeline_old_spark.sinks.sheets_datasource."
                "failing_transport_factory",
            )
            .option("path", out)
            .option("poison", "7")
            .save()
        )
    published = (
        [f for f in os.listdir(out) if f.endswith(".jsonl")]
        if os.path.exists(out)
        else []
    )
    assert published == []
