"""Physical-plan regression tests: the properties that make these queries
survive 100 TB must be visible in the plan, not assumed — predicate/column
pushdown into the parquet scan, broadcast joins for dims, map-side partial
aggregation, and no Python evaluation nodes in JVM-only paths."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

_ensure_loaded()


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def nodes_of(plan: str) -> list[str]:
    """Node names from the formatted plan's detail section ('(3) NodeName')."""
    import re

    return re.findall(r"^\(\d+\) (\S+)", plan, flags=re.M)


@pytest.fixture(scope="module")
def sf(oracle_sf_dir):
    return oracle_sf_dir


def test_scan_pushes_filter_and_prunes_columns(spark, sf):
    plan = plan_of(QUERIES["s11_parquet_scan_prune"].fn(spark, sf))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # projection pruned to the 3 referenced columns — the full 11-column
    # lineitem schema must NOT be read
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_quantity" not in read_schema and "l_partkey" not in read_schema


def test_dim_enrich_is_broadcast_join(spark, sf):
    plan = plan_of(QUERIES["j1_dim_enrich"].fn(spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_snowflake_chain_all_broadcast(spark, sf):
    plan = plan_of(QUERIES["j10_snowflake_chain"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in nodes


def test_q1_partial_aggregation(spark, sf):
    plan = plan_of(QUERIES["tpch_q1_pricing_summary"].fn(spark, sf))
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert nodes_of(plan).count("Exchange") == 1  # one shuffle: the groupBy


def test_jvm_only_paths_have_no_python_nodes(spark, sf):
    for name in [
        "pipeline_logs",
        "pipeline_projectsync",
        "workdays_diff_sql",
        "dedup_exact",
        "text_quality_score",
        "ann_cosine_topk",
        "dedup_span_reconstruct",
        "corpus_kl_by_source",
        "stats_corr_regression",
        "window_range_1h_movstats",
        "dedup_line_level",
        "sketch_mg_heavy_hitters",
        "corpus_bpe_pair_counts",
        "pipeline_rag_retrieval",
        "text_quality_classifier",
        "sketch_histogram_quantile",
        "j14_point_in_time_join",
        "privacy_l_diversity",
        "stats_ab_proportion_z",
        "stats_chi2_independence",
        "ml_tree_inference_sql",
        "traj_user_similarity_topk",
        "multimodal_pair_alignment",
        "ann_incremental_topk_merge",
        "embed_random_projection",
        "embed_projection_recall",
    ]:
        plan = plan_of(QUERIES[name].fn(spark, sf))
        assert "EvalPython" not in plan, f"{name} must stay JVM-side"


def test_pandas_udf_path_is_arrow_not_row_python(spark, sf):
    plan = plan_of(QUERIES["workdays_diff_pandas_udf"].fn(spark, sf))
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_flagship_fact_never_shuffles_before_aggregate(spark, sf):
    # logs pipeline: scan -> broadcast join -> flag -> groupBy; the only
    # Exchange allowed is the final aggregation shuffle
    plan = plan_of(QUERIES["pipeline_logs"].fn(spark, sf))
    assert nodes_of(plan).count("Exchange") == 1
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark, sf):
    """Runtime row-level filtering (the 100 TB selective-join path): with a
    selective filter on the build side of a shuffle join, Spark injects a
    bloom filter into the probe-side scan, discarding non-matching fact
    rows BEFORE the shuffle. Thresholds are lowered to make the optimizer
    fire at test scale — at real scale the defaults (10MB build / 10GB
    probe) gate it to exactly the joins that need it."""
    from etl_pipeline_old_spark.catalog import load_table

    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "bloom build missing"
        assert "might_contain" in plan.lower(), "probe-side bloom test missing"
        # and the result is still correct
        expected = li.join(
            o.hint("broadcast"), F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            saved["spark.sql.autoBroadcastJoinThreshold"],
        )
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")


def test_partitioned_readback_prunes_partitions(spark, sf):
    """k7's readback must prune to the 7 requested day directories via
    PartitionFilters — NOT read all 30 days and row-filter. At 100 TB this
    is the difference between scanning 7/30 and 30/30 of the table."""
    plan = plan_of(QUERIES["k7_partitioned_write_prune"].fn(spark, sf))
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf and ">= 2024-01-01" in pf and "<= 2024-01-07" in pf
    # the day predicate is satisfied entirely by directory pruning: it must
    # not also appear as a pushed row-group filter on the data columns
    # (absence of any PushedFilters line means no row-level filtering at all)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert all("day" not in l for l in pushed)


def test_er_scoring_stays_jvm_and_scales_by_candidates(spark, sf, monkeypatch):
    """The ER hot path must be pure JVM (levenshtein is a codegen builtin)
    and must score only blocked candidates: the plan joins on the exploded
    block key, never a cross/nested-loop product of the registry.

    r15: the query persists the registry and materializes its result
    (materialize_release, releasing the cache), so the RETURNED frame's
    plan is a bare ExistingRDD scan — the lock intercepts the
    pre-materialization frame (same recipe as the er_golden_record lock
    below) and asserts on the plan the query actually executes."""
    from etl_pipeline_old_spark.operators import dedup as DD

    captured = []
    orig = DD.materialize_release

    def capture(result, *cached):
        captured.append(plan_of(result))
        return orig(result, *cached)

    monkeypatch.setattr(DD, "materialize_release", capture)
    QUERIES["er_pairwise_match"].fn(spark, sf)
    assert captured, "er_pairwise_match no longer materializes via materialize_release"
    plan = captured[-1]
    assert "EvalPython" not in plan
    assert "levenshtein" in plan
    nodes = nodes_of(plan)
    assert "CartesianProduct" not in nodes
    assert "BroadcastNestedLoopJoin" not in nodes


def test_er_incremental_link_plan_no_product(spark, sf):
    """No cartesian/nested-loop node in the incremental-link plan. The
    stronger no-delta-cross-delta guarantee is behavioral and asserted in
    tests/test_entity_resolution.py (sides-never-mix)."""
    plan = plan_of(QUERIES["er_incremental_link"].fn(spark, sf))
    assert "EvalPython" not in plan
    nodes = nodes_of(plan)
    assert "CartesianProduct" not in nodes
    assert "BroadcastNestedLoopJoin" not in nodes


def test_er_golden_record_assignment_join_broadcasts(spark, sf, monkeypatch):
    """The registry-side assignment join must broadcast the comp map —
    without the explicit hint the localCheckpoint'ed comp has no stats
    and Spark falls back to shuffling the full registry.

    r14: the query materializes its result (materialize_release, so the
    persisted records cache can be released), which makes the RETURNED
    frame's plan a bare ExistingRDD scan — so the lock intercepts the
    pre-materialization frame and asserts on ITS plan, which is the plan
    the query actually executes."""
    from etl_pipeline_old_spark.operators import dedup as DD
    from etl_pipeline_old_spark.queries import entity_resolution as ER

    captured = []
    orig = DD.materialize_release

    def capture(result, *cached):
        captured.append(plan_of(result))
        return orig(result, *cached)

    monkeypatch.setattr(ER, "materialize_release", capture, raising=False)
    # the query imports materialize_release locally from operators.dedup —
    # patch the source module attribute it resolves at call time
    monkeypatch.setattr(DD, "materialize_release", capture)
    QUERIES["er_golden_record"].fn(spark, sf)
    assert captured, "er_golden_record no longer materializes via materialize_release"
    assert "BroadcastHashJoin" in captured[-1]


def test_shuffle_hash_hint_selects_shuffled_hash_join(spark, sf):
    plan = plan_of(QUERIES["join_shuffle_hash_hint"].fn(spark, sf))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dpp_join_prunes_fact_partitions_at_runtime(spark, sf):
    """The partitioned-fact join against a runtime-only day selection must
    carry a dynamic-pruning partition filter on the fact scan — the
    partition-level I/O elision k9_dpp_partitioned_join exists to prove.
    The marker only appears in the EXECUTED plan (DPP is injected at
    physical planning and the final plan materializes under AQE), so the
    query is run first and the JVM plan string inspected."""
    df = QUERIES["k9_dpp_partitioned_join"].fn(spark, sf)
    df.collect()  # count() would build a SEPARATE (unexecuted) plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    assert "EvalPython" not in plan


def test_runtime_bloom_filter_prunes_probe_side(spark, sf):
    """Under the no-broadcast regime the optimizer must inject a bloom
    filter: build side aggregated into bloom_filter_agg, probe side
    gated by might_contain before the shuffle. The registry query
    materializes eagerly (confs are restored on return), so the plan is
    inspected on the raw join built under the same confs."""
    from etl_pipeline_old_spark.queries.extras7 import _BLOOM_CONFS, _bloom_join

    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = _bloom_join(spark, sf)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_pipeline_scripts_zero_fact_shuffles(spark, sf):
    """The scripts notebook chain must stay broadcast-only: four dim joins
    (stage enrich feeds J2; J3 mapping; J4 gitlab) with the fact side
    streaming through map-side — zero Exchange nodes in the whole plan."""
    plan = plan_of(QUERIES["pipeline_scripts"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("BroadcastHashJoin") == 4, nodes
    assert "SortMergeJoin" not in nodes and "ShuffledHashJoin" not in nodes
    assert nodes.count("Exchange") == 0, nodes


def test_analyze_stats_feed_cbo_rowcount(spark, sf):
    """After ANALYZE TABLE, the optimizer's stats for a catalog table must
    carry the EXACT rowCount (not a file-size guess) — the input the
    cost-based optimizer uses for join reordering and broadcast choice."""
    import os

    from etl_pipeline_old_spark.catalog import load_table

    tag = os.path.basename(os.path.normpath(sf)).replace(".", "_")
    t = f"stats_cbo_probe_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    prev = spark.conf.get("spark.sql.cbo.enabled")
    try:
        # the optimizer only SURFACES catalog rowCount in plan stats under
        # CBO; without it stats() degrade to a sizeInBytes guess
        spark.conf.set("spark.sql.cbo.enabled", "true")
        nat = load_table(spark, sf, "nation")
        nat.write.mode("overwrite").saveAsTable(t)
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        stats = spark.table(t)._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().get() == nat.count()
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_federated_join_pushes_predicate_into_jdbc(spark, sf):
    """The federation claim must be visible in the plan: the region
    predicate reaches the JDBC relation as a pushed filter (the database
    does the filtering, not Spark), both dims broadcast, and the parquet
    fact reaches the aggregate without a shuffle of its own."""
    plan = plan_of(QUERIES["federated_three_source_join"].fn(spark, sf))
    assert "JDBCRelation" in plan
    # the region predicate must appear as a pushed filter (detail section)
    pushed = [
        l
        for l in plan.splitlines()
        if "PushedFilters" in l and "N_REGIONKEY" in l.upper()
    ]
    assert pushed, plan
    nodes = nodes_of(plan)
    assert nodes.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in nodes and "ShuffledHashJoin" not in nodes
    assert nodes.count("Exchange") == 1  # only the final aggregation shuffle


def test_pdf_cid_extract_plan_is_one_join_one_kernel(spark, sf):
    # r11: CID extraction is the same shape as pipeline_pdf_extract — a
    # binaryFile scan joined once to the base table, ONE Arrow kernel,
    # no Cartesian, no row-python
    plan = plan_of(QUERIES["pipeline_pdf_cid_extract"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 1
    assert "CartesianProduct" not in nodes
    assert "BatchEvalPython" not in nodes


def test_charset_ingest_plan_is_map_only(spark, sf):
    # r11: charset detect+transcode runs entirely in the shard-parallel
    # Arrow kernel — no shuffle, no join, nothing but scan -> kernel
    plan = plan_of(QUERIES["web_charset_ingest"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 1
    assert "Exchange" not in nodes
    assert "BatchEvalPython" not in nodes


def test_mixed_caption_coverage_plan_locks(spark, sf):
    # r11: both sidecar formats parse in ONE kernel; the join onto video
    # durations is the sidecar-sized equi join, never a Cartesian
    plan = plan_of(QUERIES["multimodal_caption_coverage_mixed"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 2  # video probe + caption kernel
    assert "CartesianProduct" not in nodes
    assert "BatchEvalPython" not in nodes


def test_zip64_and_aac_probes_are_map_only(spark, sf):
    for name in ("multimodal_zip64_shards", "multimodal_aac_probe"):
        nodes = nodes_of(plan_of(QUERIES[name].fn(spark, sf)))
        assert nodes.count("MapInPandas") == 1, name
        assert "Exchange" not in nodes, name


def test_pdf_xrefstream_extract_plan_is_one_join_one_kernel(spark, sf):
    # r12: same shape as the other PDF sentinels — binaryFile scan
    # joined once to the base table, ONE Arrow kernel, no row-python
    plan = plan_of(QUERIES["pipeline_pdf_xrefstream_extract"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 1
    assert "CartesianProduct" not in nodes
    assert "BatchEvalPython" not in nodes


def test_webp_lossless_ingest_plan_is_map_only(spark, sf):
    # r12: scan -> VP8L kernel; no join, no shuffle anywhere
    plan = plan_of(QUERIES["multimodal_webp_lossless_ingest"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 1
    assert "Exchange" not in nodes
    assert "BatchEvalPython" not in nodes


def test_sqlite_wal_ingest_plan_is_sidecar_equi_join(spark, sf):
    # r12: two binaryFile listings equi-joined on doc_id plus the base
    # table — joins yes, Cartesian never, decode in ONE kernel
    plan = plan_of(QUERIES["multimodal_sqlite_wal_ingest"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 1
    assert "CartesianProduct" not in nodes
    assert "BatchEvalPython" not in nodes


def test_robots_parse_and_psl_plans_are_pure_jvm(spark, sf):
    # r12: both relational parsers must stay Python-free — the
    # robots.txt grammar walk (posexplode + lag windows) and the PSL
    # suffix-candidate join
    for name in ("web_robots_parse", "web_registrable_domain",
                 "web_canonical_collapse"):
        plan = plan_of(QUERIES[name].fn(spark, sf))
        nodes = nodes_of(plan)
        assert "BatchEvalPython" not in nodes, name
        assert "MapInPandas" not in nodes, name
        assert "CartesianProduct" not in nodes, name


def test_cdx_range_ingest_scans_only_the_index(spark, sf):
    # r14: the CDX plan's 100 TB property — ONLY the tiny .cdx.gz
    # sidecars enter a scan; the bulk .warc.gz archives appear in NO
    # FileScan at all (their path reaches the kernel as a derived
    # string column), and the CDXJ parse is pure JVM ahead of the one
    # range-reading Arrow kernel
    import re

    plan = plan_of(QUERIES["web_cdx_range_ingest"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 1
    assert "Exchange" not in nodes
    assert "BatchEvalPython" not in nodes
    scans = [n for n in nodes if n.startswith("Scan")]
    assert scans == ["Scan"], scans  # exactly one source
    assert plan.count("Scan text") >= 1  # ...and it is the line reader
    assert "ReadSchema: struct<value:string>" in plan  # one string column
    locs = [loc for s in re.findall(r"Location:.*\[(.*?)\]", plan)
            for loc in s.split(",")]
    assert locs and all("cdx_warc_" in loc for loc in locs), locs
    assert not any(loc.endswith(".warc.gz") for loc in locs), locs


def test_mail_thread_reconstruct_plan_is_one_kernel_plus_joins(spark, sf):
    # r14: thread reconstruction is relational — ONE Arrow kernel (the
    # header parse), then equi-joins and aggregates only
    plan = plan_of(QUERIES["mail_thread_reconstruct"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 1
    assert "CartesianProduct" not in nodes
    assert "BatchEvalPython" not in nodes


def test_7z_ranged_plan_never_scans_archive_bytes(spark, sf):
    # r14: the tail-header range-read plan — the binaryFile listing
    # projects path+length ONLY (no content column reaches the plan),
    # two kernels (header walk, folder decode), no shuffle
    plan = plan_of(QUERIES["multimodal_7z_ranged"].fn(spark, sf))
    nodes = nodes_of(plan)
    assert nodes.count("MapInPandas") == 2
    assert "Exchange" not in nodes
    assert "BatchEvalPython" not in nodes
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas and all("content" not in l for l in read_schemas)
