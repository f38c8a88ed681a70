"""Connected components over near-duplicate pairs → dedup clusters.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (transitive
closure: if a~b and b~c, keep one of {a,b,c}). This is the one genuinely
iterative algorithm in the engine: label propagation where every node
repeatedly adopts the minimum label in its neighborhood until fixpoint.

Scale notes: each iteration is one self-join + min-aggregate (shuffle on
node id); iterations needed = graph diameter (near-dup clusters are tiny,
so 3-5 in practice; the loop stops at the first no-change iteration, with
a hard cap as a runaway guard — hitting the cap RAISES, because partially
propagated labels are silently wrong components). The driver only ever
sees a one-row changed-count per iteration — no component data is
collected.

Checkpointing: every iteration's label frame must have its lineage
truncated (the plan references the previous labels twice per round, so the
logical plan doubles each iteration and the analyzer OOMs after ~12).
Two modes:

- default ``checkpoint_dir=None`` → ``localCheckpoint``: blocks live on
  executors for the executor lifetime — fine on local[N], but on a real
  cluster a lost executor kills the job;
- ``checkpoint_dir="hdfs://..."`` → reliable ``.checkpoint()`` to a
  fault-tolerant FS, the cluster-safe mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is an undirected pair list (src < dst by convention, but not
    required). Isolated nodes (absent from edges) are the caller's concern
    — dedup treats them as their own singleton cluster implicitly.

    Raises ``RuntimeError`` if ``max_iterations`` is reached before the
    fixpoint: min-label propagation needs iterations proportional to the
    component diameter, and a capped exit would return wrong labels.
    """
    sc = edges.sparkSession.sparkContext
    if checkpoint_dir is not None and sc.getCheckpointDir() != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # symmetric adjacency, persisted: reused every iteration
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = _truncate(
        adj.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    converged = False
    for _ in range(max_iterations):
        # candidate label per node: min over own label and neighbors' labels
        neighbor_labels = (
            adj.join(labels, adj["v"] == labels["node"])
            .select(F.col("u").alias("node"), F.col("component"))
        )
        new_labels = _truncate(
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    adj.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (component diameter exceeds the cap); raising instead "
            "of returning partially-propagated, incorrect labels"
        )
    return labels.select("node", "component")
