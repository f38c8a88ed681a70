"""Registry entries: round-3 final wave — distribution-shape statistics
and the ungrouped Arrow map (the last §2.12 surface not yet exercised).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# o_totalprice spans ~[900, 500k]; scaling before the moment sums keeps
# x^4 terms near 1 so the two engines' float error stays far below the
# 6dp round. g1/g2 are scale-invariant, so the result is unchanged.
PRICE_SCALE = 100_000.0


@register(
    "stats_skew_kurtosis",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority,
             avg(o_totalprice / {PRICE_SCALE}) AS m1,
             avg(pow(o_totalprice / {PRICE_SCALE}, 2)) AS e2,
             avg(pow(o_totalprice / {PRICE_SCALE}, 3)) AS e3,
             avg(pow(o_totalprice / {PRICE_SCALE}, 4)) AS e4
      FROM orders GROUP BY o_orderpriority),
    c AS (
      SELECT o_orderpriority,
             e2 - m1 * m1 AS m2,
             e3 - 3 * m1 * e2 + 2 * m1 * m1 * m1 AS m3,
             e4 - 4 * m1 * e3 + 6 * m1 * m1 * e2 - 3 * m1 * m1 * m1 * m1 AS m4
      FROM m)
    SELECT o_orderpriority,
           round(m3 / pow(m2, 1.5), 6) AS skewness_g1,
           round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_g2
    FROM c
    """,
    doc="Population skewness (g1) and excess kurtosis (g2) per order "
    "priority, computed from raw power-moment averages so both engines "
    "evaluate the identical algebra — Spark's skewness()/kurtosis() and "
    "DuckDB's skewness()/kurtosis() disagree on population-vs-sample "
    "corrections, so the moments are owned explicitly. One map-combined "
    "aggregate; values are scale-invariant so inputs are pre-scaled to "
    "keep the x^4 sums float-exact to well past 6dp.",
)
def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice") / F.lit(PRICE_SCALE)
    m = o.groupBy("o_orderpriority").agg(
        F.avg(x).alias("m1"),
        F.avg(F.pow(x, 2)).alias("e2"),
        F.avg(F.pow(x, 3)).alias("e3"),
        F.avg(F.pow(x, 4)).alias("e4"),
    )
    m1, e2, e3, e4 = F.col("m1"), F.col("e2"), F.col("e3"), F.col("e4")
    m2 = e2 - m1 * m1
    m3 = e3 - F.lit(3) * m1 * e2 + F.lit(2) * m1 * m1 * m1
    m4 = (
        e4
        - F.lit(4) * m1 * e3
        + F.lit(6) * m1 * m1 * e2
        - F.lit(3) * m1 * m1 * m1 * m1
    )
    return m.select(
        "o_orderpriority",
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness_g1"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("kurtosis_g2"),
    )


MAP_ARROW_SCHEMA = "doc_id long, n_chars_arrow int, lang string"


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id, length(text)::INTEGER AS n_chars_arrow, lang
    FROM documents
    """,
    doc="§2.12 final surface: UNGROUPED mapInArrow — batches arrive as "
    "pyarrow RecordBatches with zero pandas conversion, the cheapest "
    "Python extension point for columnar kernels (tokenizers, codecs) "
    "that speak Arrow natively. The kernel here (utf8 codepoint length "
    "via pyarrow.compute) is deliberately row-pure so output is "
    "batch-partitioning-independent and value-oracle-checkable.",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc

        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(batch.column("text")), pa.int32()),
                    batch.column("lang"),
                ],
                names=["doc_id", "n_chars_arrow", "lang"],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return d.mapInArrow(kernel, MAP_ARROW_SCHEMA)
