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


def _make_truncate(edges: DataFrame, checkpoint_dir: str | None):
    """Shared lineage-truncation setup for the iterative operators: set the
    reliable checkpoint dir once if requested, return the per-iteration
    truncation function (reliable checkpoint, else localCheckpoint)."""
    sc = edges.sparkSession.sparkContext
    if checkpoint_dir is not None and sc.getCheckpointDir() != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    return _truncate



def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    edges_distinct: bool = False,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is an undirected pair list (src < dst by convention, but not
    required). Isolated nodes (absent from edges) are the caller's concern
    — dedup treats them as their own singleton cluster implicitly.

    ``edges_distinct=True`` is the caller's guarantee that the pair list
    is row-distinct with ``src < dst`` on every row (the shape every
    dedup/ER verify emits): the two directed arms of the symmetrizing
    union then cannot collide, so the adjacency dedup aggregate is
    skipped (r15 — one hash-aggregate pass less over the edge set at any
    scale; the v-repartition the loop reuses stays).

    Raises ``RuntimeError`` if ``max_iterations`` is reached before the
    fixpoint: min-label propagation needs iterations proportional to the
    component diameter, and a capped exit would return wrong labels.
    """
    _truncate = _make_truncate(edges, checkpoint_dir)

    # symmetric adjacency, persisted: reused every iteration, partitioned
    # by the per-iteration JOIN key "v". ONE exchange builds it (r14):
    # repartition("v") FIRST, then dropDuplicates — HashPartitioning(v)
    # satisfies the (u, v) dedup's clustered distribution (same v ⇒ same
    # partition ⇒ same (u, v) co-located), so the aggregate adds no
    # second exchange, and the cache keeps the v-partitioning every
    # iteration's join reuses (guide §2.4; the former distinct-then-
    # repartition shape shuffled the edge set twice).
    adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).repartition("v")
    if not edges_distinct:
        adj = adj.dropDuplicates(["u", "v"])
    adj = adj.persist()
    # the INITIAL labels are not checkpointed (r14): iteration 1 references
    # them twice, but both references are one distinct() over the cached
    # adjacency — cheaper than a dedicated materialization job. Lineage is
    # truncated at iteration 1's own checkpoint, so the doubling never
    # compounds.
    labels = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    from pyspark.sql import Observation

    converged = False
    for it in range(max_iterations):
        # candidate label per node: min over own label and neighbors' labels
        neighbor_labels = (
            adj.join(labels, adj["v"] == labels["node"])
            .select(F.col("u").alias("node"), F.col("component"))
        )
        # the changed count rides IN the checkpoint job as an observed
        # metric (labels propagate monotonically downward, so changed ⇔
        # new < old): CollectMetrics evaluates while the checkpoint
        # materializes, so convergence costs ZERO extra jobs per round
        # (r15; the r14 shape still ran a limit-1 scan job per iteration)
        obs = Observation(f"cc_shrunk_{it}")
        new_labels = _truncate(
            labels.select(
                "node", F.col("component").alias("__lab"), F.lit(True).alias("__own")
            )
            .union(
                neighbor_labels.select(
                    "node", F.col("component").alias("__lab"), F.lit(False).alias("__own")
                )
            )
            .groupBy("node")
            .agg(
                F.min("__lab").alias("component"),
                # exactly one __own row per node: its label is the old one
                (
                    F.min("__lab") < F.min(F.when(F.col("__own"), F.col("__lab")))
                ).alias("__shrunk"),
            )
            .observe(
                obs,
                # coalesce: sum over an EMPTY label frame is NULL, which
                # must read as converged (zero shrunk), not as never-true
                F.coalesce(
                    F.sum(F.col("__shrunk").cast("long")), F.lit(0)
                ).alias("n_shrunk"),
            )
        )
        labels = new_labels
        if obs.get["n_shrunk"] == 0:
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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, rank) after ``n_iter`` power iterations with uniform teleport
    and dangling-mass redistribution (ranks sum to 1 every iteration).

    Like connected_components, each iteration MATERIALIZES its rank frame
    (localCheckpoint, or reliable checkpoint when ``checkpoint_dir`` is
    given): the update references the previous ranks three times (degree
    join, dangling mass, contribution sum), so a lazy formulation
    re-evaluates the whole prefix ~3^k times — measured 93s vs 3s at
    sf0.01 for k=3. The static graph (edges, out-degrees) is persisted
    once and reused every iteration; each iteration is then one
    edges⋈ranks join + one sum-aggregate, the minimal shuffle shape.
    """
    from pyspark.sql import Observation

    _truncate = _make_truncate(edges, checkpoint_dir)

    # partitioned by the contribution-join key "u" before the persist: the
    # out-degree aggregate AND the static degree-attach join below then
    # reuse the cached partitioning instead of re-shuffling the static edge
    # set (guide §2.4)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).repartition("u").persist()
    deg = e.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("outdeg"))
    # EVERYTHING rank-independent is hoisted out of the loop (r14, guide
    # §2.4/§1.2): the out-degree rides the persisted edge set (one static
    # u-partitioned join — deg and e share the cache partitioning, so this
    # adds no exchange). r15 goes further: the dangling FLAG is attached
    # once to the persisted node set, and each iteration's dangling mass
    # rides the PREVIOUS iteration's checkpoint job as an observed metric
    # (sum(rank) where dangling) that enters the next update as a scalar
    # literal — the per-iteration semi-join + aggregate job AND the
    # per-iteration broadcast of the one-row dm frame are both gone.
    # Addend multisets are unchanged (same ranks summed over the same
    # dangling nodes; double-sum order was already scheduling-dependent).
    ed = (
        e.join(deg.withColumnRenamed("node", "u"), "u")
        .select("u", "v", "outdeg")
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .join(deg.select("node", F.lit(True).alias("__out")), "node", "left")
        .select("node", F.col("__out").isNull().alias("__dang"))
        .persist()
    )
    n = float(nodes.count())
    # initial ranks are a constant projection of the persisted node set —
    # re-evaluating that per reference in iteration 1 is cheaper than a
    # dedicated materialization job; lineage truncates at iteration 1's
    # own checkpoint (r14). Iteration 1's dangling mass is the one
    # aggregate job the observation scheme cannot absorb (there is no
    # prior checkpoint to observe) — one job total, vs one per iteration.
    ranks = nodes.select("node", "__dang", F.lit(1.0 / n).alias("rank"))
    dm = (
        ranks.filter("__dang").agg(F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]
    )
    for it in range(n_iter):
        contrib = (
            ed.join(
                ranks.select(F.col("node").alias("u"), "rank"), "u"
            )
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        obs = Observation(f"pr_dm_{it}")
        ranks = _truncate(
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "__dang",
                (
                    (1.0 - damping) / n
                    + damping
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dm) / n)
                ).alias("rank"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("__dang"), F.col("rank"))), F.lit(0.0)
                ).alias("dm"),
            )
        )
        if it < n_iter - 1:
            dm = obs.get["dm"]
    e.unpersist()
    nodes.unpersist()
    ed.unpersist()
    return ranks.select("node", "rank")


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
    edges_distinct: bool = False,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds.

    The log-rounds connected-components algorithm (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond"): each round rewires
    every node toward its neighborhood minimum —

    - large-star: for each node u, neighbors v > u re-attach to
      m = min(N(u) ∪ {u});
    - small-star: orient edges large→small, then every neighbor (and u)
      re-attaches to the minimum.

    Convergence needs O(log n) rounds versus min-label propagation's
    O(diameter) (``connected_components``) — the difference between ~40
    and ~4 shuffles on a 10⁹-node chain-heavy dedup graph, which makes
    THIS the 100 TB variant. Both implementations are equality-tested
    against each other and the same recursive-CTE oracle.

    Output matches ``connected_components``: one row per node appearing
    in ``edges``, labeled with the component's min node id.
    """
    _truncate = _make_truncate(edges, checkpoint_dir)

    # Both stars need, per node u, m = min(N(u) ∪ {u}) attached back to
    # every edge of u. A groupBy + self-join does that with TWO shuffles of
    # the edge set per star (the aggregate, then re-shuffling the edges to
    # meet it); a min-over-window partitioned by u computes the identical
    # value with ONE shuffle (guide §2.4: a window partitioned like the
    # aggregation needs no second exchange). Row-level results are
    # identical — the window min over the whole u-partition IS the joined
    # group min. (The union arm of small_star now carries one (u, m) row
    # per EDGE rather than per node; the final distinct() collapses them,
    # exactly as it collapsed the join arm's duplicates before.)
    # Exchange budget per round (r14): only the FINAL distinct dedups.
    # large_star's output-distinct and small_star's input-distinct were
    # redundant for set-correctness — every computation between them (a
    # min over a window, greatest/least remaps, the union arms) is
    # duplicate-insensitive, and the round's final distinct() collapses
    # whatever multiplicity flows through. Dropping them removes two
    # (u, v)-keyed exchange+aggregate pairs per round: the round is now
    # window-Exchange(u) [large] → window-Exchange(u) [small] → one
    # (u, v) distinct — 3 exchanges instead of 5. Inter-stage row counts
    # are bounded by the symmetric edge count (duplicates only from m
    # collisions), so the window exchanges carry at most what the
    # dropped aggregates would have; at scale one fewer shuffle+agg pass
    # per stage wins.
    def large_star(e: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
        return (
            sym.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        dir_e = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        dm = dir_e.withColumn(
            "m", F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
        )
        rewired = dm.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
            dm.select(F.col("u"), F.col("m").alias("v"))
        )
        return rewired.filter(F.col("u") != F.col("v")).distinct()

    nodes = (
        edges.select(F.col(src).alias("n"))
        .union(edges.select(F.col(dst).alias("n")))
        .distinct()
    )
    if edges_distinct:
        # caller guarantees row-distinct pairs with src < dst (so u != v),
        # already materialized (every dedup/ER verify hands over a
        # localCheckpoint'ed pair list): the input filter + distinct
        # shuffle + dedicated truncate job are pure overhead (r15). Round
        # 1 references e twice (the symmetrizing union) — both hit the
        # caller's checkpoint blocks.
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    else:
        e = _truncate(
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
    from pyspark.sql import Observation

    converged = False
    # the previous round's edge count is remembered driver-side (one
    # integer) instead of re-counting the checkpointed frame every round
    # (r14: one fewer job per round; counts of distinct sets + one-sided
    # exceptAll still prove set equality exactly). The new round's count
    # rides the checkpoint job as an observed metric (r15: the dedicated
    # count job per round is gone too — same zero-extra-job pattern as
    # connected_components above).
    e_count = e.count()
    for it in range(max_iterations):
        obs = Observation(f"ccstar_n_{it}")
        new_e = _truncate(
            small_star(large_star(e)).observe(obs, F.count(F.lit(1)).alias("n"))
        )
        new_count = obs.get["n"]
        # fixpoint: identical edge sets (both are distinct sets)
        if (
            new_count == e_count
            and new_e.exceptAll(e).limit(1).count() == 0
        ):
            e = new_e
            converged = True
            break
        e = new_e
        e_count = new_count
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_iterations} rounds"
        )
    # e is now a star forest: (node, root). Roots label themselves; nodes
    # absent from e (singletons within the edge node set cannot happen —
    # every input node has a neighbor) are covered by the union.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(
        labels.select(F.col("node").alias("n")), "n", "left_anti"
    ).select(F.col("n").alias("node"), F.col("n").alias("component"))
    return labels.union(roots)
