"""JDBC source adapters (S4-S6).

The reference pulls Postgres tables via server-side COPY
(fetch_pluginsdb_plugin.py:19-28) and MySQL with a hand-built incremental
predicate (fetch_asterisk_cdr.py:51-58). In Spark both collapse to
``spark.read.jdbc``: Catalyst pushes filters to the database, and
``partitionColumn/numPartitions`` parallelizes the pull (the COPY
replacement at scale).

No database exists in this container, so these builders are exercised by
asserting the generated pushdown SQL / options in unit tests; the
``load()`` calls themselves need a JDBC driver jar + live DB.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def sql_literal(value: Any) -> str:
    """Render a watermark value as a SQL literal: numbers bare (databases
    like Derby don't coerce VARCHAR to BIGINT), everything else quoted."""
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    return "'" + str(value).replace("'", "''") + "'"


def incremental_subquery(
    table: str, watermark_col: str, last_value: Any | None, quote: str = '"'
) -> str:
    """S5: the pushdown subquery for an incremental pull —
    ``WHERE uniqueid > <max>`` semantics, DB-side.

    The column is quoted (ANSI double quotes by default; pass ``quote='`'``
    for MySQL) because Spark's JDBC writers create case-sensitive quoted
    identifiers, so an unquoted name would upcase and miss.
    """
    if last_value is None:
        return table
    col = f"{quote}{watermark_col}{quote}"
    return f"(SELECT * FROM {table} WHERE {col} > {sql_literal(last_value)}) t"


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S4/S6: full-table scan; with ``partition_column`` the read is split
    into ``num_partitions`` parallel range queries (the scalable stand-in
    for the reference's per-table COPY loop)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        r = r.option(k, v)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return r.load()


def jdbc_incremental_scan(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_col: str,
    last_value: Any | None,
    properties: dict | None = None,
) -> DataFrame:
    """S5: incremental pull via pushdown subquery."""
    return jdbc_scan(
        spark, url, incremental_subquery(table, watermark_col, last_value), properties
    )
