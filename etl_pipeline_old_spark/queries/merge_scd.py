"""Registry entries: MERGE-upsert, SCD2 history, the plain-Python-UDF
extension point, and two more TPC-H-shaped bench queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..operators.merge import merge_upsert, scd2_history
from ..registry import register


@register(
    "merge_upsert_corrections",
    oracle="""
    SELECT event_id, user_id,
           round(CASE WHEN event_type = 'error' THEN value * 2 ELSE value END, 2) AS value
    FROM events
    """,
    doc="MERGE emulation (anti-join + union): a corrections feed (doubled "
    "value for error events) upserted into the event table — updates win, "
    "unmatched rows pass through (the Delta MERGE pattern without Delta).",
)
def merge_upsert_corrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    corrections = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", (F.col("value") * 2).alias("value"))
    )
    merged = merge_upsert(ev, corrections, ["event_id"])
    return merged.select("event_id", "user_id", F.round("value", 2).alias("value"))


@register(
    "scd2_order_history",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="SCD2 historization: per-key version chain with [valid_from, "
    "valid_to) ranges via lead() — the CDC/SCD2 emulation pattern.",
)
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return scd2_history(
        o, "o_custkey", "o_orderdate", attrs=["o_orderkey"], tiebreak=["o_orderkey"]
    )


@register(
    "udf_extension_point",
    oracle="SELECT doc_id, reverse(lang) AS rev_lang FROM documents",
    doc="§2.12 extension point: a plain row-at-a-time Python UDF (the slow "
    "path — kept tiny and off the hot columns; production code uses native "
    "expressions, see every other query).",
)
def udf_extension_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(T.StringType())
    def py_reverse(s: str) -> str:
        return s[::-1] if s is not None else None

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", py_reverse("lang").alias("rev_lang"))


@register(
    "grouped_map_zscore",
    oracle="""
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 4) AS zscore
    FROM customer
    """,
    doc="§2.12 grouped-map UDF: per-nation balance z-scores via "
    "applyInPandas (whole group as a pandas frame in/out — the per-group "
    "escape hatch); hash-checked against the window-function formulation.",
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)  # sample stddev = stddev_samp
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "zscore": ((pdf["c_acctbal"] - mu) / sd).round(4),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_custkey long, zscore double"
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 30
    """,
    doc="TPC-H Q6 shape: pure filter+aggregate — the pushdown benchmark "
    "(all four predicates reach the parquet scan).",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 30)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01'
    """,
    doc="TPC-H Q14 shape: broadcast join + conditional aggregate ratio.",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "inner")
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
    )
