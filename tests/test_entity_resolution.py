"""Behavioral invariants for the entity-resolution family.

Value parity vs DuckDB is covered by tests/test_oracle_parity.py; these
assert the linkage SEMANTICS: the planted clean↔dirty links are found
with high recall, scores respect the threshold, the golden record
partitions the registry exactly, and the incremental path never links
delta against delta. rec_id parity encodes provenance: clean records
are even (2·custkey), dirty variants odd (2·custkey + 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_old_spark.queries.entity_resolution import (
    MATCH_THRESHOLD,
    _matched,
    _records,
    er_entity_clusters,
    er_golden_record,
    er_incremental_link,
    is_delta,
)

SF = "/root/testdata/sf0.001"


def test_match_recall_on_planted_duplicates(spark):
    records = _records(spark, SF)
    n_dirty = records.filter(is_delta(F.col("rec_id"))).count()
    assert n_dirty > 0
    true_hits = (
        _matched(records)
        .filter(
            (F.col("rec_id_b") == F.col("rec_id_a") + 1)
            & (F.col("rec_id_a") % 2 == 0)
        )
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


def test_incremental_link_sides_never_mix(spark):
    """Every emitted rec_id is a delta (odd) record and every match target
    is a base (even) record — a delta×delta or base×base candidate join
    would violate one of these regardless of its physical join strategy."""
    out = er_incremental_link(spark, SF)
    assert out.filter(~is_delta(F.col("rec_id"))).count() == 0
    assert (
        out.filter(
            F.col("matched_rec_id").isNotNull()
            & is_delta(F.col("matched_rec_id"))
        ).count()
        == 0
    )
    # one output row per delta record, matched or not
    n_delta = _records(spark, SF).filter(is_delta(F.col("rec_id"))).count()
    assert out.count() == n_delta
