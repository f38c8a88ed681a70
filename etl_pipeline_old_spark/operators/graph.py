"""Connected components over near-duplicate pairs → dedup clusters.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (transitive
closure: if a~b and b~c, keep one of {a,b,c}). This is the one genuinely
iterative algorithm in the engine: label propagation where every node
repeatedly adopts the minimum label in its neighborhood until fixpoint.

Scale notes: each iteration is one self-join + min-aggregate (shuffle on
node id); iterations needed = graph diameter (near-dup clusters are tiny,
so 3-5 in practice; the loop stops at the first no-change iteration, with
a hard cap as a runaway guard). The driver only ever sees a one-row
changed-count per iteration — no component data is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iterations: int = 20
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is an undirected pair list (src < dst by convention, but not
    required). Isolated nodes (absent from edges) are the caller's concern
    — dedup treats them as their own singleton cluster implicitly.
    """
    # symmetric adjacency, persisted: reused every iteration
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # candidate label per node: min over own label and neighbors' labels
        neighbor_labels = (
            adj.join(labels, adj["v"] == labels["node"])
            .select(F.col("u").alias("node"), F.col("component"))
        )
        # localCheckpoint truncates lineage — the plan references the
        # previous labels TWICE per iteration, so without truncation the
        # logical plan doubles each round and the analyzer OOMs
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    adj.unpersist()
    return labels.select("node", "component")
