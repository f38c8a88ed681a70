"""Behavioral invariants for the entity-resolution family.

Value parity vs DuckDB is covered by tests/test_oracle_parity.py; these
assert the linkage SEMANTICS: the planted clean↔dirty links are found
with high recall, scores respect the threshold, and the golden record
partitions the registry exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_old_spark.queries.entity_resolution import (
    DIRTY_OFFSET,
    MATCH_THRESHOLD,
    _matched,
    _records,
    er_entity_clusters,
    er_golden_record,
)

SF = "/root/testdata/sf0.001"


def test_match_recall_on_planted_duplicates(spark):
    records = _records(spark, SF)
    n_dirty = records.filter(F.col("rec_id") >= DIRTY_OFFSET).count()
    assert n_dirty > 0
    true_hits = (
        _matched(records)
        .filter(F.col("rec_id_b") == F.col("rec_id_a") + DIRTY_OFFSET)
        .count()
    )
    # blocking misses only band-boundary crossers; scoring misses none of
    # the co-blocked planted pairs (1 char deleted + ≤1 cent drift ≫ 0.85)
    assert true_hits / n_dirty >= 0.9


def test_matched_scores_respect_threshold(spark):
    m = _matched(_records(spark, SF))
    assert m.filter(F.col("score") < MATCH_THRESHOLD).count() == 0
    assert m.filter(F.col("rec_id_a") >= F.col("rec_id_b")).count() == 0


def test_clusters_cover_exactly_matched_nodes(spark):
    records = _records(spark, SF)
    comp = er_entity_clusters(spark, SF)
    m = _matched(records)
    nodes = (
        m.select(F.col("rec_id_a").alias("n"))
        .union(m.select("rec_id_b"))
        .distinct()
        .count()
    )
    assert comp.count() == nodes
    # component label is the min rec_id of the cluster → always ≤ node
    assert comp.filter(F.col("component") > F.col("node")).count() == 0


def test_golden_record_partitions_registry(spark):
    records = _records(spark, SF)
    golden = er_golden_record(spark, SF)
    total = golden.agg(F.sum("n_records")).collect()[0][0]
    assert total == records.count()
    # merged entities span their records; singleton entities have zero span
    assert (
        golden.filter((F.col("n_records") == 1) & (F.col("bal_cents_span") != 0)).count()
        == 0
    )
