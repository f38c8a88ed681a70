"""Table catalog over the driver testdata parquet directories.

Reference equivalent: the hardcoded ``raw_data/`` path block at the top of
every notebook (``/root/reference/datasets/create_scripts_dataset.ipynb:27-40``)
— the reference's "catalog" is a set of file paths. Here tables are lazy
DataFrames registered as temp views, so both the DataFrame API and
``spark.sql`` see the same relations and Catalyst prunes/pushes down into
the parquet scan.

TIMESTAMP(NANOS) handling: ``events.ts`` is stored as parquet
TIMESTAMP(NANOS,false), which Spark 4 cannot map to a Catalyst type. With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column surfaces as BIGINT
nanoseconds; :func:`load_table` converts it back to a microsecond TIMESTAMP
(truncation — same semantics as DuckDB's read of the file). The conversion is
driven by the parquet footer (metadata-only read, so it costs nothing at
scale), not by a hardcoded column list.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Column names stored as parquet timestamp[ns] (footer metadata only)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return tuple(f.name for f in schema if str(f.type).startswith("timestamp[ns"))
    except Exception:
        return ()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, restoring nanos-timestamp columns."""
    ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        if c in df.columns:
            # integer ns → µs truncation matches DuckDB's nanos read;
            # MUST be integer `div` — float division loses precision at 1e18 ns
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLES,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
