"""SQL-API entry: the engine exposes every table as a temp view so users
can run Spark SQL directly — Catalyst produces the same plan as the
DataFrame API. One representative query keeps this path covered."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_tables
from ..registry import register

_SQL = """
SELECT n.n_name,
       count(DISTINCT c.c_custkey) AS n_customers,
       round(sum(o.o_totalprice), 2) AS total_spend
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY n.n_name
"""


@register(
    "sql_api_nation_spend",
    oracle=_SQL,
    doc="Spark SQL API over registered views (identical text runs on both "
    "engines): urgent-order spend per nation — proves the SQL surface is "
    "first-class next to the DataFrame API.",
)
def sql_api_nation_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders", "customer", "nation"), register_views=True)
    return spark.sql(_SQL)
