"""Unit tests for connected-components label propagation."""

from __future__ import annotations

from etl_pipeline_old_spark.operators.graph import connected_components


def test_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3), island pair 10-11, triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert {comp[1], comp[2], comp[3], comp[4]} == {1}
    assert {comp[10], comp[11]} == {10}
    assert {comp[20], comp[21], comp[22]} == {20}


def test_long_chain_converges(spark):
    # worst-case diameter: a 12-node path; min label must reach the far end
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}


def test_reliable_checkpoint_mode(spark, tmp_path):
    # cluster-safe mode: .checkpoint() to a fault-tolerant dir instead of
    # executor-lifetime localCheckpoint blocks
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(
            edges, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert {comp[1], comp[2], comp[3]} == {1}
    assert {comp[10], comp[11]} == {10}
    import os

    assert os.listdir(tmp_path / "ckpt"), "reliable checkpoint dir must be used"


def test_iteration_cap_raises(spark):
    # a 12-node path needs ~11 propagation rounds; cap of 3 must RAISE, not
    # return partially-propagated labels
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=3).collect()
