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


def restore_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a parquet-sourced timestamp column to TIMESTAMP (UTC).

    Handles every annotation the driver testdata has shipped, so batch and
    streaming readers share one conversion (pure column exprs — codegen'd,
    streaming-safe):

    - BIGINT — legacy ``nanosAsLong`` read of TIMESTAMP(NANOS,false):
      integer-``div`` truncation to micros, matching DuckDB's nanos read
      (float division would lose precision at 1e18 ns);
    - TIMESTAMP_NTZ — TIMESTAMP(MICROS,false) read on a session where the
      pinned ``inferTimestampNTZ.enabled=false`` conf could not be applied:
      reinterpreted as UTC wall time (session tz is pinned UTC);
    - TIMESTAMP — unchanged.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing the event-time column.

    Data-model contract (SURVEY.md §1.2): ``events.ts`` is an *instant* —
    always surfaced as TIMESTAMP (UTC), whether the file stored nanos
    (legacy) or micros (current). Dimension/fact date columns
    (``l_shipdate``, ``o_orderdate``) are wall-clock values and keep
    Spark's native read type (TIMESTAMP_NTZ under default inference),
    matching DuckDB's naive read for the differential oracle.
    """
    ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        if c in df.columns:
            df = restore_ts(df, c)
    if name == "events":
        df = restore_ts(df, "ts")
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
