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


def test_orchestrator_parallel_equals_serial(spark, tmp_path):
    """Thread-scheduled dataset builds must produce byte-identical sink
    tables to the serial reference order (nothing is shared downstream)."""
    from etl_pipeline_old_spark.plans.orchestrator import run_pipeline

    sf = "/root/testdata/sf0.001"
    out_s, out_p = str(tmp_path / "serial"), str(tmp_path / "parallel")
    run_pipeline(spark, sf, out_s, parallel=False)
    run_pipeline(spark, sf, out_p, parallel=True)
    import os

    names = sorted(os.listdir(out_s))
    assert names == sorted(os.listdir(out_p))
    for name in names:
        a = spark.read.parquet(os.path.join(out_s, name))
        b = spark.read.parquet(os.path.join(out_p, name))
        assert a.schema == b.schema, name
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name
