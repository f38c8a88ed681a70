"""Equivalence and convergence properties of the log-rounds
large-star/small-star connected components vs min-label propagation."""

from __future__ import annotations

import random

import pytest

from etl_pipeline_old_spark.operators.graph import (
    connected_components,
    connected_components_star,
)

GRAPHS = {
    "chain": [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
    "star_high_root": [(10, 1), (10, 2), (10, 3)],
    "star_low_leaves": [(1, 10), (2, 10), (3, 10)],
    "merged_chains": [(1, 2), (3, 4), (5, 6), (2, 3)],
    "self_loop": [(7, 7), (1, 2)],
    "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_matches_label_propagation(spark, name):
    df = spark.createDataFrame(GRAPHS[name], "id_a long, id_b long")
    a = {(r.node, r.component) for r in connected_components(df).collect()}
    b = {(r.node, r.component) for r in connected_components_star(df).collect()}
    assert a == b


def test_star_matches_on_random_graph_beyond_diameter_cap(spark):
    """A sparse random graph near the percolation threshold has long
    paths: min-label propagation needs > 20 (diameter) iterations here,
    while the star algorithm converges in a handful of log-rounds — the
    scale property the operator exists for."""
    random.seed(5)
    pairs = [(random.randint(0, 300), random.randint(0, 300)) for _ in range(200)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=20)
    a = {
        (r.node, r.component)
        for r in connected_components(df, max_iterations=100).collect()
    }
    b = {(r.node, r.component) for r in connected_components_star(df).collect()}
    assert a == b


def test_edges_distinct_fast_path_matches_default(spark):
    """edges_distinct=True (the dedup/ER caller contract: row-distinct
    pairs with src < dst) must label identically to the default path in
    BOTH implementations — it only skips the input dedup work (r15)."""
    random.seed(11)
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (random.randint(0, 80), random.randint(0, 80)) for _ in range(120)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(pairs, "id_a long, id_b long").localCheckpoint()
    base = {(r.node, r.component) for r in connected_components(df).collect()}
    fast = {
        (r.node, r.component)
        for r in connected_components(df, edges_distinct=True).collect()
    }
    sbase = {
        (r.node, r.component) for r in connected_components_star(df).collect()
    }
    sfast = {
        (r.node, r.component)
        for r in connected_components_star(df, edges_distinct=True).collect()
    }
    assert base == fast == sbase == sfast
