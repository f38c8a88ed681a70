"""AQE skew-join evidence: a deliberately skewed fact (80% of rows on one
key) joined without broadcast must trigger adaptive skew splitting
(`skew=true` in the executed plan) — the runtime half of the skew story
(the compile-time half is the deterministic salting pattern,
join_salted_skew)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keep = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    yield
    for k, v in keep.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, skew_confs):
    n = 200_000
    # 80% of fact rows share key 0; the rest spread over 10k keys
    fact = spark.range(n).select(
        F.when(F.col("id") % 5 != 0, F.lit(0)).otherwise(F.col("id") % 10_000).alias("k"),
        F.col("id").alias("v"),
        # pad rows so the hot partition crosses the byte threshold
        F.repeat(F.lit("x"), 64).alias("pad"),
    )
    dim = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    # the inspected DataFrame must be the one the action executes — an
    # aggregate on top would (a) own the query execution and (b) impose a
    # distribution requirement that vetoes the skew split
    joined = fact.join(dim, "k", "inner").select("k", "v", "w")

    rows = joined.collect()
    assert len(rows) == n  # correctness first

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, "AQE should have split the hot partition"
