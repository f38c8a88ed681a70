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


def test_orchestrator_no_out_dir_builds_scripts_once(spark, monkeypatch):
    """With ``out_dir=None`` there is no written table for the bim/designers
    splits to read back, so the scripts frame must be persisted: the builder
    runs once and both splits scan the cache (InMemoryRelation) instead of
    re-executing the 3-join chain per sink."""
    from etl_pipeline_old_spark.plans import orchestrator
    from etl_pipeline_old_spark.plans import pipelines2 as P2

    calls = {"n": 0}
    real = P2.scripts_pipeline

    def counting(spark_, sf_dir_):
        calls["n"] += 1
        return real(spark_, sf_dir_)

    monkeypatch.setitem(orchestrator.DATASETS, "scripts", counting)
    out = orchestrator.run_pipeline(
        spark, "/root/testdata/sf0.001", out_dir=None, parallel=False
    )
    try:
        assert calls["n"] == 1
        for half in ("scripts_bim", "scripts_designers"):
            plan = out[half]._jdf.queryExecution().optimizedPlan().toString()
            assert "InMemoryRelation" in plan, half
        # cache actually serves the splits (row counts still correct)
        assert out["scripts_bim"].count() + out["scripts_designers"].count() == out[
            "scripts"
        ].count()
    finally:
        out["scripts"].unpersist()


def test_orchestrator_no_out_dir_releases_previous_cache(spark):
    """A second out_dir=None run must release the previous run's persisted
    scripts frame — library callers in a long-lived session would
    otherwise accumulate one InMemoryRelation of the full scripts dataset
    per call."""
    from etl_pipeline_old_spark.plans import orchestrator

    # two DIFFERENT sf_dirs: same-plan re-persists dedupe in the
    # CacheManager anyway, so the accumulation hazard is distinct plans
    first = orchestrator.run_pipeline(
        spark, "/root/testdata/sf0.001", out_dir=None, parallel=False
    )
    first_cached = first["scripts"]
    assert first_cached.count() > 0  # materialize the first cache
    assert first_cached.storageLevel.useMemory
    second = orchestrator.run_pipeline(
        spark, "/root/testdata/sf0.01", out_dir=None, parallel=False
    )
    try:
        # the first run's frame is no longer pinned in the CacheManager
        assert first_cached.storageLevel.useMemory is False
        assert second["scripts"].count() > 0
    finally:
        while orchestrator._LAST_SCRIPTS_CACHE:
            _tid, frame = orchestrator._LAST_SCRIPTS_CACHE.popitem()
            frame.unpersist()


def test_orchestrator_concurrent_builds_keep_each_others_cache(spark):
    """The scripts stash is keyed BY THREAD: a second thread's
    out_dir=None build must not release the first thread's still-live
    cache mid-build (r6 review — a lock alone only serializes the swap,
    it cannot protect a cache the swap itself targets)."""
    import threading

    from etl_pipeline_old_spark.plans import orchestrator

    main = orchestrator._build_one(
        spark, "/root/testdata/sf0.001", None, "scripts"
    )
    main_cached = main["scripts"]
    assert main_cached.count() > 0
    assert main_cached.storageLevel.useMemory

    worker_out: dict[str, object] = {}

    def build():
        worker_out.update(
            orchestrator._build_one(spark, "/root/testdata/sf0.01", None, "scripts")
        )

    t = threading.Thread(target=build)
    t.start()
    t.join()
    try:
        # the worker's build released NOTHING of the main thread's
        assert main_cached.storageLevel.useMemory
        assert main["scripts_bim"].count() + main["scripts_designers"].count() > 0
        # and its own cache is registered under its own thread key
        assert len(orchestrator._LAST_SCRIPTS_CACHE) == 2
    finally:
        while orchestrator._LAST_SCRIPTS_CACHE:
            _tid, frame = orchestrator._LAST_SCRIPTS_CACHE.popitem()
            frame.unpersist()
