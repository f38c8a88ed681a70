"""Leakage invariant for the group-aware split: no group crosses subsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_old_spark.catalog import load_table
from etl_pipeline_old_spark.queries.corpus5 import corpus_group_split

# uses the oracle SF (sf0.01): sf0.001 has ~15 users and they can all
# hash one-sided, leaving a single subset


def test_no_group_crosses_subsets(spark, oracle_sf_dir):
    SF = oracle_sf_dir
    out = {r.subset: r for r in corpus_group_split(spark, SF).collect()}
    assert set(out) == {"train", "test"}
    global_users = (
        load_table(spark, SF, "events").agg(F.countDistinct("user_id")).collect()[0][0]
    )
    # if any user appeared in both subsets, the per-subset distinct-user
    # counts would double-count and exceed the global distinct count
    assert out["train"].n_users + out["test"].n_users == global_users
    total_rows = load_table(spark, SF, "events").count()
    assert out["train"].n_rows + out["test"].n_rows == total_rows
