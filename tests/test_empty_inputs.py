"""Empty-input behavior of the core composite operators.

An empty partition/table is the permanent steady state of incremental
pipelines (no new data this run); every operator must return an empty —
not erroring, not null-schema — result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_old_spark.operators.dedup import minhash_lsh_dedup
from etl_pipeline_old_spark.operators.graph import (
    connected_components,
    connected_components_star,
)
from etl_pipeline_old_spark.operators.similarity import brute_force_topk
from etl_pipeline_old_spark.queries.entity_resolution import link_delta


def test_connected_components_empty_edges(spark):
    e = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(e).count() == 0
    assert connected_components_star(e).count() == 0


def test_minhash_empty_corpus(spark):
    d = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_lsh_dedup(d, "text", "doc_id").count() == 0


def test_link_delta_empty_delta(spark):
    base = spark.createDataFrame(
        [(0, "Customer#1", "AUTO", 1, 100)],
        "rec_id long, name string, seg string, nation int, bal_cents long",
    )
    empty = base.filter(F.lit(False))
    assert link_delta(empty, base).count() == 0
    # and an empty base: every delta record is new
    out = link_delta(base, empty).collect()
    assert len(out) == 1 and out[0].is_new


def test_brute_force_topk_empty_queries(spark):
    emb = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, 0.4])], "vec_id long, embedding array<float>"
    )
    assert brute_force_topk(emb, [], 5).count() == 0


def test_line_level_dedup_empty_corpus(spark):
    from etl_pipeline_old_spark.operators.dedup import line_level_dedup

    d = spark.createDataFrame([], "doc_id long, text string")
    out = line_level_dedup(d, "text", "doc_id")
    assert out.columns == [
        "doc_id", "n_lines_total", "n_lines_kept", "text_deduped",
    ]
    assert out.count() == 0


def test_line_level_dedup_single_empty_text(spark):
    from etl_pipeline_old_spark.operators.dedup import line_level_dedup

    d = spark.createDataFrame([(7, "")], "doc_id long, text string")
    row = line_level_dedup(d, "text", "doc_id").collect()[0]
    # one empty span: kept (first occurrence), reassembles to ''
    assert (row.n_lines_total, row.n_lines_kept, row.text_deduped) == (1, 1, "")


def test_dynamic_overwrite_leaves_other_partitions_files_untouched(spark, tmp_path):
    """partitionOverwriteMode=dynamic must replace ONLY the incoming
    partitions: the other day directories keep their exact files."""
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")],
        "id long, day string",
    )
    df.write.mode("overwrite").partitionBy("day").parquet(path)

    def files(day):
        d = os.path.join(path, f"day={day}")
        return sorted(f for f in os.listdir(d) if f.startswith("part-"))

    before_01, before_02 = files("2024-01-01"), files("2024-01-02")
    fix = spark.createDataFrame([(30, "2024-01-03")], "id long, day string")
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
    # untouched partitions: identical file lists; restated day: new content
    assert files("2024-01-01") == before_01
    assert files("2024-01-02") == before_02
    # the partition column is inferred back as DATE — stringify for compare
    got = sorted(
        (r.id, str(r.day)) for r in spark.read.parquet(path).collect()
    )
    assert got == [(1, "2024-01-01"), (2, "2024-01-02"), (30, "2024-01-03")]


def test_minhash_bucket_cap_empty_corpus(spark):
    d = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_lsh_dedup(d, "text", "doc_id", bucket_cap=8).count() == 0


def test_bucketed_probe_cap_empty_index(spark):
    from etl_pipeline_old_spark.operators.similarity import bucketed_probe

    idx = spark.createDataFrame(
        [], "neighbor_id long, __cv array<double>, tbl int, bucket string"
    )
    q = spark.createDataFrame(
        [(0, [0.1, 0.2], 0, "01")],
        "query_id long, __qv array<double>, tbl int, bucket string",
    )
    assert bucketed_probe(idx, q, 5, bucket_cap=4).count() == 0
