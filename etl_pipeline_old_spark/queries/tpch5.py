"""TPC-H Q2 / Q9 / Q20 shapes, adapted to the testdata schema.

The driver testdata has no ``partsupp`` table, so the part↔supplier
relation (and a surrogate supply cost) is derived from lineitem:
``cost(part, supplier) = min(l_extendedprice)`` over their shipments.
``min`` involves no arithmetic, so the surrogate is bit-identical in any
engine — the min-cost-supplier selection and threshold comparisons below
stay exactly reproducible in the DuckDB oracle (no float-summation-order
hazards).

These close the TPC-H suite: with them every classic query shape (1-22)
has a registry entry — correlated min subquery (Q2), N-way snowflake
profit rollup (Q9), nested aggregate threshold semi-join (Q20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _surrogate_partsupp(li: DataFrame) -> DataFrame:
    """(l_partkey, l_suppkey, cost) — cost = min extended price shipped."""
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    ranked AS (
      SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ps.cost,
             row_number() OVER (
               PARTITION BY p.p_partkey ORDER BY ps.cost, ps.l_suppkey) AS rn
      FROM ps
      JOIN part p     ON p.p_partkey = ps.l_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size BETWEEN 10 AND 25 AND p.p_type = 'STANDARD'
        AND r.r_name = 'EUROPE')
    SELECT p_partkey, p_name, s_name, n_name, cost
    FROM ranked WHERE rn = 1
    """,
    doc="TPC-H Q2 shape: min-cost supplier per part within a region — "
    "correlated-min subquery expressed as a window top-1 over the "
    "part↔supplier relation; all dims broadcast "
    "(ref capability: multi-dim enrich joins, e.g. "
    "datasets/create_projectsync_dataset.ipynb joins).",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 25) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = _surrogate_partsupp(li)
    joined = (
        ps.join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"], "inner")
        .join(F.broadcast(s), ps["l_suppkey"] == s["s_suppkey"], "inner")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "inner")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
    )
    w = W.partitionBy("p_partkey").orderBy("cost", "l_suppkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_name", "n_name", "cost")
    )


@register(
    "tpch_q9_nation_profit",
    oracle="""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H Q9 shape: 5-table snowflake profit rollup by supplier "
    "nation and order year, part-name pattern filter. Dims broadcast; the "
    "one fact-fact join (lineitem⋈orders) shuffles on orderkey. (No "
    "partsupp in the testdata → supplycost term omitted; the join/agg "
    "shape is the point.)",
)
def tpch_q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "inner")
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"], "inner")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "inner")
        .join(o, li["l_orderkey"] == o["o_orderkey"], "inner")
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("profit")
        )
    )


@register(
    "tpch_q20_excess_shippers",
    oracle="""
    WITH per_part AS (
      SELECT l_suppkey, l_partkey,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate <  TIMESTAMP '1998-01-01'
                      THEN l_quantity ELSE 0 END) AS qty_1997,
             sum(l_quantity) AS qty_total
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      GROUP BY l_suppkey, l_partkey),
    excess AS (
      SELECT DISTINCT l_suppkey FROM per_part
      WHERE qty_1997 > 0.3 * qty_total)
    SELECT s.s_name, n.n_name, round(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
      AND n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    """,
    doc="TPC-H Q20 shape: nested aggregate threshold (supplier shipped >30% "
    "of a part's volume in one year) driving a semi-join into the supplier "
    "dim. Aggregate-then-semi-join keeps the shuffle narrow; the threshold "
    "compare is sum-vs-sum on the same rows (no cross-engine float hazard: "
    "quantities sum exactly in doubles at this scale).",
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    per_part = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
                "qty_1997"
            ),
            F.sum("l_quantity").alias("qty_total"),
        )
    )
    excess = (
        per_part.filter(F.col("qty_1997") > 0.3 * F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(excess, s["s_suppkey"] == excess["l_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "inner")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_name", "n_name", F.round("s_acctbal", 2).alias("acctbal"))
    )
