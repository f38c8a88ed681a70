"""Data-profiling utility (dataset-card / data-quality pass) + TPC-H Q11
shape adapted to the star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "profile_table",
    oracle="""
    SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
           count(*) - count(c_custkey) AS n_nulls,
           count(DISTINCT c_custkey) AS n_distinct,
           min(c_custkey)::VARCHAR AS min_value, max(c_custkey)::VARCHAR AS max_value
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
           count(DISTINCT c_mktsegment), min(c_mktsegment), max(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
           count(DISTINCT c_acctbal),
           round(min(c_acctbal), 2)::VARCHAR, round(max(c_acctbal), 2)::VARCHAR
    FROM customer
    """,
    doc="Column profiling: rows/nulls/distincts/min/max per column in ONE "
    "pass over the table (all stats as aggregates of a single scan) — the "
    "data-quality summary a pipeline runs before trusting an input.",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")

    def stats(col: str, numeric: bool) -> list:
        mn = F.round(F.min(col), 2) if numeric else F.min(col)
        mx = F.round(F.max(col), 2) if numeric else F.max(col)
        return [
            F.struct(
                F.lit(col).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
                F.countDistinct(col).alias("n_distinct"),
                mn.cast("string").alias("min_value"),
                mx.cast("string").alias("max_value"),
            ).alias(f"__{col}")
        ]

    cols = [("c_custkey", True), ("c_mktsegment", False), ("c_acctbal", True)]
    aggs = [s for name, num in cols for s in stats(name, num)]
    one_row = c.agg(*aggs)
    stacked = one_row.select(
        F.explode(F.array(*[F.col(f"__{name}") for name, _ in cols])).alias("p")
    )
    return stacked.select("p.*")


N_BINS = 10
PRICE_LO, PRICE_HI = 0.0, 600_000.0
_BIN_W = (PRICE_HI - PRICE_LO) / N_BINS


@register(
    "histogram_order_totals",
    oracle=f"""
    SELECT least(floor((o_totalprice - {PRICE_LO}) / {_BIN_W}), {N_BINS - 1})::BIGINT AS bin,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS bin_min,
           round(max(o_totalprice), 2) AS bin_max
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram via floor binning (no width_bucket needed — "
    "portable arithmetic): order-value distribution in 10 bins.",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bin_col = F.least(
        F.floor((F.col("o_totalprice") - PRICE_LO) / _BIN_W), F.lit(N_BINS - 1)
    ).cast("long")
    return o.groupBy(bin_col.alias("bin")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("bin_min"),
        F.round(F.max("o_totalprice"), 2).alias("bin_max"),
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH part_value AS (
      SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, round(value, 4) AS part_value
    FROM part_value
    WHERE value > (SELECT sum(l_extendedprice * l_quantity) * 0.001 FROM lineitem)
    """,
    doc="TPC-H Q11 shape (adapted, no partsupp): per-part value vs a "
    "scalar global-fraction threshold — aggregate reused against its own "
    "grand total (HAVING > scalar subquery).",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    value = (F.col("l_extendedprice") * F.col("l_quantity")).alias("__v")
    per_part = li.groupBy("l_partkey").agg(F.sum(value).alias("value"))
    total = li.agg((F.sum(value) * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total), F.col("value") > F.col("threshold"), "inner")
        .select("l_partkey", F.round("value", 4).alias("part_value"))
    )
