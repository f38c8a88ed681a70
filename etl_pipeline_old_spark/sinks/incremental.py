"""Sink operators (SURVEY.md §2.2).

K4 full refresh and K5 incremental high-watermark append with schema
evolution re-express the reference's Postgres loaders:

- full refresh: ``head(0).to_sql(if_exists='replace')`` then append
  (datasets/create_scripts_dataset.ipynb:261-279) → one
  ``mode('overwrite')`` write;
- incremental: ``SELECT max(date_col)`` on the target, insert only newer
  rows, ``ADD COLUMN IF NOT EXISTS`` for new columns, 5000-row chunked
  inserts (datasets/create_projectsync_dataset.ipynb:385-441) → read-max →
  filter → append with ``mergeSchema`` (parquet handles new columns
  natively; chunking is Spark's task batching).

The file target is parquet (the engine's canonical store); ``jdbc_*``
variants build the equivalent JDBC writes (``batchsize`` ≈ CHUNK_SIZE)
behind the same API for real database targets.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def full_refresh(df: DataFrame, path: str) -> None:
    """K4: truncate+recreate+insert ≡ overwrite (schema from the frame)."""
    df.write.mode("overwrite").parquet(path)


def read_watermark(spark: SparkSession, path: str, col: str) -> Any:
    """A1: ``SELECT max(col) FROM target`` — null iff the target does not
    exist yet.

    Only the path-missing case maps to "no watermark"; any other read
    failure (permissions, corrupt footer, FS hiccup) on an EXISTING target
    propagates — treating it as "target absent" would make
    :func:`incremental_append` silently re-append the whole input and break
    its idempotency contract.

    At scale this is a metadata-cheap aggregate: parquet min/max footer
    stats let Spark answer it without scanning data pages.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).agg(F.max(col)).first()[0]
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return None
        raise


def incremental_append(
    df: DataFrame,
    path: str,
    watermark_col: str,
    spark: SparkSession | None = None,
) -> int:
    """K5: append only rows with ``watermark_col`` strictly above the
    target's current max; tolerate new columns (schema evolution).

    Returns the number of appended rows. Re-running with the same input
    appends 0 (idempotent under a monotone watermark — the reference's
    contract at fetch_asterisk_cdr.py:39-58).
    """
    spark = spark or df.sparkSession
    mx = read_watermark(spark, path, watermark_col)
    fresh = df if mx is None else df.filter(F.col(watermark_col) > F.lit(mx))
    n = fresh.count()
    if n:
        fresh.write.mode("append").option("mergeSchema", "true").parquet(path)
    return n


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read an incrementally grown target, merging evolved schemas
    (older files lack newer columns → null, the ALTER TABLE ADD COLUMN
    semantics of create_projectsync_dataset.ipynb:392-406)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def csv_overwrite(
    df: DataFrame,
    path: str,
    quote_all: bool = False,
    sep: str = ",",
    bom: bool = False,
) -> None:
    """K1: header CSV overwrite (QUOTE_ALL variant for the Sheets dump,
    extractors/fetch_gsheet_instructions.py:56-62).

    ``bom=True`` reproduces the reference's ``utf-8-sig`` output (Excel
    compatibility): Java charsets have no utf-8-sig, so after the
    distributed write each part file gets the 3-byte BOM prepended
    driver-side — a per-file metadata-sized rewrite-in-place of the first
    bytes, not a data pass.
    """
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", quote_all)
        .option("sep", sep)
        .option("encoding", "UTF-8")
        .csv(path)
    )
    if bom:
        import glob
        import os

        for part in glob.glob(os.path.join(path, "part-*.csv")):
            with open(part, "rb") as fh:
                data = fh.read()
            if not data.startswith(b"\xef\xbb\xbf"):
                with open(part, "wb") as fh:
                    fh.write(b"\xef\xbb\xbf" + data)


def json_overwrite(df: DataFrame, path: str) -> None:
    """K3: JSON lines write (ensure_ascii=False ≡ Spark's native UTF-8)."""
    df.write.mode("overwrite").json(path)


def jdbc_full_refresh(df: DataFrame, url: str, table: str, properties: dict | None = None) -> None:
    """K4 to a live database. Requires the JDBC driver jar on the
    classpath; not exercised in this container (no DB)."""
    df.write.mode("overwrite").option("batchsize", 5000).jdbc(
        url, table, properties=properties or {}
    )


def jdbc_incremental_append(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    watermark_col: str,
    properties: dict | None = None,
    quote: str = '"',
) -> None:
    """K5 to a live database: read-back max via a pushdown subquery, then
    batched append (batchsize ≈ the reference's CHUNK_SIZE=5000).

    The watermark column is quoted in the pushdown SQL: Spark's JDBC
    writers create case-sensitive quoted identifiers, so an unquoted name
    would upcase and miss (exercised live in tests/test_jdbc_derby.py).
    ``quote`` selects the dialect's identifier quote — ANSI double-quote by
    default, backtick for MySQL without ANSI_QUOTES (the reference's CDR
    database, fetch_asterisk_cdr.py) — matching ``incremental_subquery``.
    """
    props = properties or {}
    q = quote
    mx = (
        spark.read.jdbc(
            url, f"(SELECT max({q}{watermark_col}{q}) AS mx FROM {table}) t", properties=props
        )
        # positional: databases differ on unquoted-alias case (Derby upcases)
        .first()[0]
    )
    fresh = df if mx is None else df.filter(F.col(watermark_col) > F.lit(mx))
    fresh.write.mode("append").option("batchsize", 5000).jdbc(url, table, properties=props)


def sheet_append_missing(
    df_new: DataFrame,
    existing_keys: DataFrame,
    on: str,
    append_row,
) -> int:
    """K6: Google-Sheets anti-join upsert — rows whose key is absent from
    the mapping sheet are appended one-by-one via ``append_row`` (driver-
    side callback, like gspread append_row with USER_ENTERED)
    (datasets/create_gitlab_dataset.ipynb:96-123).

    The anti-join is distributed; only the (small) novelty set is
    collected.
    """
    missing = df_new.join(existing_keys, on, "left_anti")
    rows = missing.collect()
    for r in rows:
        append_row(list(r))
    return len(rows)
