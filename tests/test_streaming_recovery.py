"""Streaming checkpoint recovery: restarting a query against the same
checkpoint must not reprocess data (exactly-once over restarts) — the
fault-tolerance half of the streaming story."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_old_spark.catalog import table_path
from etl_pipeline_old_spark.session import ensure_session_confs


def _run_once(spark, sf_dir, checkpoint, out_dir):
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
        .select("event_id", "user_id")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_checkpoint_restart_processes_nothing_new(spark, sf_dir, tmp_path):
    ensure_session_confs(spark)
    checkpoint = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")

    _run_once(spark, sf_dir, checkpoint, out_dir)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == spark.read.parquet(table_path(sf_dir, "events")).count()

    # restart against the same checkpoint: source offsets are committed,
    # so the second run emits zero new rows
    _run_once(spark, sf_dir, checkpoint, out_dir)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 == n1, "restart must not reprocess committed offsets"
    assert os.path.isdir(os.path.join(checkpoint, "commits"))
