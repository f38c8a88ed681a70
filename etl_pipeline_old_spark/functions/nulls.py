"""Null handling (SURVEY.md F11/F13, P11).

The reference juggles the NaN/None/NaT sentinel trio and pandas' nullable
``Int64`` extension type (create_scripts_dataset.ipynb:198-199, 215-223);
Spark has a single ``null``, so these collapse to casts and ``na.fill``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference's string null sentinel, e.g. create_scripts_dataset.ipynb:217
NO_DATA = "Нет данных"

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def numeric_coerce(col: Column | str, to: str = "long") -> Column:
    """F11: ``pd.to_numeric(errors='coerce').astype('Int64')`` →
    ``try_cast`` (null on malformed input regardless of the session's ANSI
    mode — Spark 4 defaults ANSI on, so a bare cast would throw)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(to)


def impute_by_dtype(
    df: DataFrame, string_fill: str = NO_DATA, numeric_fill: float = 0
) -> DataFrame:
    """F13: per-dtype null imputation — strings → sentinel, numerics → 0,
    timestamps untouched (create_scripts_dataset.ipynb:215-223).

    Placement matters: the reference imputes MID-pipeline (after joins,
    before the bim/designers split), so downstream predicates see the
    sentinel, not null (SURVEY.md §7 risk register).
    """
    string_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    num_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString().split("(")[0] in _NUMERIC
    ]
    out = df
    if string_cols:
        out = out.na.fill(string_fill, string_cols)
    if num_cols:
        out = out.na.fill(numeric_fill, num_cols)
    return out


def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """P11a: ``dropna(axis=0, how='all')`` (fetch_asterisk_cdr.py:61)."""
    return df.na.drop("all")


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """P11b: ``dropna(axis=1, how='all')`` (fetch_asterisk_devices.py:25).

    Data-dependent schema change — requires one aggregate pass to count
    non-nulls per column (a single map-side-combined job, cheap even at
    100 TB since it reduces to one row), then a projection.
    """
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*keep)
