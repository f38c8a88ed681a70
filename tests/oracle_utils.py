"""Local replica of the driver's DuckDB-differential gate (SURVEY.md §5.1).

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet, then compares row count, column names, and an order-insensitive
value multiset (floats canonicalized). Anything that passes here should
pass the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from etl_pipeline_old_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    """Canonicalize a cell so Spark and DuckDB renderings compare equal."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # after in-query rounding, residual fp noise is < 1e-9
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple("\x00" if x is None else str(x) for x in t),
    )


def compare(spark_df, con, oracle: str) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    odf = con.execute(oracle).df()
    s_cols = sorted(map(str.lower, sdf.columns))
    o_cols = sorted(map(str.lower, odf.columns))
    if s_cols != o_cols:
        return False, f"schema mismatch: spark={s_cols} oracle={o_cols}"
    if len(sdf) != len(odf):
        return False, f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    s_rows = _rowset(list(map(str.lower, sdf.columns)), sdf.itertuples(index=False, name=None))
    o_rows = _rowset(list(map(str.lower, odf.columns)), odf.itertuples(index=False, name=None))
    if s_rows != o_rows:
        diff_i = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
        return False, (
            f"value mismatch at sorted-row {diff_i}:\n  spark={s_rows[diff_i]}\n"
            f"  oracle={o_rows[diff_i]}"
        )
    return True, "ok"
