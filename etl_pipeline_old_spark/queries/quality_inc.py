"""Registry entries: data-quality expectations, incremental aggregate
maintenance, and PageRank over the event-interaction graph.

The production concerns around a pipeline, not inside one: assert the
invariants the loads depend on (dq_check_suite), keep a materialized
aggregate fresh without recomputing history (incremental_agg_merge), and
rank entities in an interaction graph (graph_pagerank — the bounded-
iteration sibling of dedup_clusters' label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import pagerank
from ..registry import register

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# data-quality expectation suite: the checks fused into ONE aggregate pass
# per table (plus one anti-join for referential integrity) — the scan cost
# of a dq suite must not scale with the number of checks.
# ---------------------------------------------------------------------------


@register(
    "dq_check_suite",
    oracle="""
    WITH o AS (
      SELECT count(*) - count(DISTINCT o_orderkey) AS pk_dup,
             count(*) FILTER (WHERE o_custkey IS NULL) AS ck_null,
             count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
               AS status_dom
      FROM orders),
    l AS (
      SELECT count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS qty,
             count(*) FILTER (WHERE l_extendedprice <= 0) AS price
      FROM lineitem),
    fk AS (
      SELECT count(*) AS fk_viol
      FROM lineitem li LEFT JOIN orders o ON o.o_orderkey = li.l_orderkey
      WHERE o.o_orderkey IS NULL)
    SELECT check_name, n_violations, n_violations = 0 AS passed FROM (
      SELECT 'orders_pk_unique' AS check_name, pk_dup AS n_violations FROM o
      UNION ALL SELECT 'orders_custkey_not_null', ck_null FROM o
      UNION ALL SELECT 'orders_status_domain', status_dom FROM o
      UNION ALL SELECT 'lineitem_qty_range', qty FROM l
      UNION ALL SELECT 'lineitem_price_positive', price FROM l
      UNION ALL SELECT 'lineitem_fk_orders', fk_viol FROM fk)
    """,
    doc="Data-quality expectation suite (the Great-Expectations shape): "
    "primary-key uniqueness, not-null, value-domain, numeric-range, and "
    "referential-integrity checks, each reported as (check_name, "
    "n_violations, passed). All per-table checks are FUSED into one "
    "aggregate pass per table — conditional counts inside a single agg, "
    "stacked to rows afterwards — plus one left-anti join for the FK "
    "check; adding a sixth check adds an expression, not a scan. The "
    "reference runs such assertions implicitly in pandas notebook cells; "
    "here they are a first-class, schedulable query.",
)
def dq_check_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_stats = o.agg(
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias("pk_dup"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("ck_null"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias(
            "status_dom"
        ),
    )
    li_stats = li.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("qty"),
        F.count(F.when(F.col("l_extendedprice") <= 0, 1)).alias("price"),
    )
    fk = li.join(
        o.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count("*").alias("fk_viol"))
    row = o_stats.crossJoin(li_stats).crossJoin(fk)
    return row.selectExpr(
        "stack(6, "
        "'orders_pk_unique', pk_dup, "
        "'orders_custkey_not_null', ck_null, "
        "'orders_status_domain', status_dom, "
        "'lineitem_qty_range', qty, "
        "'lineitem_price_positive', price, "
        "'lineitem_fk_orders', fk_viol) AS (check_name, n_violations)"
    ).withColumn("passed", F.col("n_violations") == 0)


# ---------------------------------------------------------------------------
# incremental aggregate maintenance: merge a delta batch's partial state
# into a base state instead of recomputing history — count/sum are
# commutative monoids, so merged-partials ≡ full recompute, and the
# ORACLE IS that invariant (it aggregates the full table directly).
# ---------------------------------------------------------------------------

CUTOFF_DAY = 19738  # 2024-01-16: base = history before, delta = new arrivals


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Incremental materialized-aggregate maintenance: the event history "
    f"is split at day {CUTOFF_DAY} into a base state and a delta batch, "
    "each reduced to per-key partial aggregates (count, sum) "
    "independently, then merged with a full-outer join + monoid combine "
    "(coalesce-to-identity). The ORACLE aggregates the full table in one "
    "pass — so the parity check IS the incremental-view-maintenance "
    "invariant merged(partial(base), partial(delta)) = full(history). "
    "This is the algebra the foreachBatch sink (stream_foreachbatch_"
    "upsert) applies per micro-batch; at 100 TB the base state is a "
    "table you never rescan — only the delta shuffles.",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        "value",
    )
    base = e.filter(F.col("day") < CUTOFF_DAY)
    delta = e.filter(F.col("day") >= CUTOFF_DAY)

    def partial(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias(f"n_{tag}"), F.sum("value").alias(f"v_{tag}")
        )

    merged = partial(base, "b").join(partial(delta, "d"), "user_id", "full")
    return merged.select(
        "user_id",
        (
            F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0))
        ).alias("n_events"),
        F.round(
            F.coalesce("v_b", F.lit(0.0)) + F.coalesce("v_d", F.lit(0.0)), 2
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# PageRank over the event-interaction graph: directed edges between
# consecutive actors within each day's event sequence, ranked with 3
# power iterations (damping 0.85, dangling mass redistributed). The
# oracle unrolls the same 3 iterations as chained CTEs.
# ---------------------------------------------------------------------------

PR_ITER = 3
PR_DAMPING = 0.85


def _pagerank_oracle(n_iter: int = PR_ITER, d: float = PR_DAMPING) -> str:
    cte = f"""
    WITH sq AS (
      SELECT user_id,
             lag(user_id) OVER (
               PARTITION BY epoch_us(ts) // {_DAY_US}
               ORDER BY epoch_us(ts), event_id) AS prev
      FROM events),
    edges AS MATERIALIZED (
      SELECT DISTINCT prev AS u, user_id AS v FROM sq
      WHERE prev IS NOT NULL AND prev <> user_id),
    nodes AS (SELECT u AS node FROM edges UNION SELECT v FROM edges),
    nn AS (SELECT count(*)::DOUBLE AS nn FROM nodes),
    deg AS (SELECT u AS node, count(*) AS outdeg FROM edges GROUP BY u),
    r0 AS (SELECT node, 1.0 / nn AS rank FROM nodes, nn)"""
    for k in range(1, n_iter + 1):
        cte += f""",
    wd{k} AS MATERIALIZED (
      SELECT r.node, r.rank, g.outdeg
      FROM r{k - 1} r LEFT JOIN deg g USING (node)),
    dg{k} AS (
      SELECT coalesce(sum(rank), 0.0) AS dm FROM wd{k} WHERE outdeg IS NULL),
    ct{k} AS (
      SELECT e.v AS node, sum(w.rank / w.outdeg) AS c
      FROM edges e JOIN wd{k} w ON w.node = e.u
      WHERE w.outdeg IS NOT NULL GROUP BY e.v),
    r{k} AS MATERIALIZED (
      SELECT n0.node,
             (1 - {d}) / nn.nn + {d} * (coalesce(ct{k}.c, 0.0) + dg{k}.dm / nn.nn)
               AS rank
      FROM nodes n0 CROSS JOIN nn CROSS JOIN dg{k}
      LEFT JOIN ct{k} ON ct{k}.node = n0.node)"""
    return cte + f"""
    SELECT node AS user_id, round(rank, 6) AS pagerank FROM r{n_iter}
    """


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc=f"PageRank ({PR_ITER} power iterations, damping {PR_DAMPING}, "
    "dangling mass redistributed) over the event-interaction digraph: "
    "consecutive actors within each day's event sequence form directed "
    "edges (per-day lag window — the sequence shuffle is partitioned by "
    "day, never global). Each iteration is one edges⋈ranks join + one "
    "sum-aggregate over a persisted static graph, each iteration materialized (see operators/graph.py). Bounded iterations make it oracle-"
    "checkable via unrolled CTEs; rank mass sums to 1 every iteration "
    "(asserted in tests/test_timeseries_corpus4.py).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
    )
    w = W.partitionBy("day").orderBy("us", "event_id")
    sq = ev.withColumn("prev", F.lag("user_id").over(w))
    edges = (
        sq.filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("user_id")))
        .select(F.col("prev").alias("src"), F.col("user_id").alias("dst"))
        .distinct()
    )
    ranks = pagerank(edges, n_iter=PR_ITER, damping=PR_DAMPING)
    return ranks.select(
        F.col("node").alias("user_id"), F.round("rank", 6).alias("pagerank")
    )
