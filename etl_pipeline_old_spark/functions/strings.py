"""String scalar functions (SURVEY.md §2.9 F1/F4/F7/F8/F9/F10/F12/F20).

All are pure Column expressions — they compile into whole-stage codegen and
cost nothing extra at 100 TB (no Python in the executor loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def short_name(col: Column | str, delim: str = "_", n: int = 2) -> Column:
    """F1: keep the first ``n`` delim-separated tokens, identity if fewer.

    Reference: ``'_'.join(name.split('_')[:2]) if len(parts) >= 2 else name``
    (datasets/create_scripts_dataset.ipynb:95-99, elementwise apply).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, delim)
    return F.when(
        F.size(parts) >= n, F.concat_ws(delim, F.slice(parts, 1, n))
    ).otherwise(c)


def strip_trailing_token(path: Column | str, token: Column | str, delim: str = "_") -> Column:
    """F4: if the last delim-token of ``path`` equals ``token``
    (case-insensitive), drop it; null-safe passthrough.

    Reference: extract_file_storage_name, row-wise apply(axis=1)
    (datasets/create_projectsync_dataset.ipynb:175-194).
    """
    p = F.col(path) if isinstance(path, str) else path
    t = F.col(token) if isinstance(token, str) else token
    parts = F.split(p, delim)
    last = F.element_at(parts, -1)
    return (
        F.when(p.isNull(), F.lit(None).cast("string"))
        .when(
            t.isNotNull() & (F.lower(last) == F.lower(t)),
            F.concat_ws(delim, F.slice(parts, 1, F.size(parts) - 1)),
        )
        .otherwise(p)
    )


def regex_prefix_strip(col: Column | str, prefix_regex: str) -> Column:
    """F7: ``str.replace('^plugins/revit/', '', regex=True)``
    (datasets/create_gitlab_dataset.ipynb:84)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, prefix_regex, "")


def clean_crlf(col: Column | str) -> Column:
    """F8: CR/LF → space inside cells (extractors/fetch_gsheet_instructions.py:46)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[\\r\\n]", " ")


def clean_all_string_cells(df: DataFrame) -> DataFrame:
    """Apply F8 to every string column (the sheet extractors do this to the
    whole frame)."""
    return df.select(
        *[
            clean_crlf(f.name).alias(f.name) if f.dataType.simpleString() == "string" else f.name
            for f in df.schema.fields
        ]
    )


def first_token(col: Column | str, delim: str = " ") -> Column:
    """F9: ``value.split(' ')[0]`` (extractors/fetch_gsheet_instructions.py:48-49)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, delim, 1)


def sanitize_column_names(df: DataFrame) -> DataFrame:
    """F10: strip whitespace + UTF-8 BOM from column names
    (datasets/create_scripts_dataset.ipynb:77) — schema-level, driver-side."""
    renames = {c: c.replace("﻿", "").strip() for c in df.columns}
    for old, new in renames.items():
        if old != new:
            df = df.withColumnRenamed(old, new)
    return df


def format_n0(col: Column | str) -> Column:
    """F12: int → "N.0" string for sheet writeback
    (datasets/create_gitlab_dataset.ipynb:95)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string("%d.0", c.cast("long"))


def ci_equals(a: Column | str, b: Column | str) -> Column:
    """F20: case-insensitive equality (fetch_yougile_programming.py:246)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.lower(ca) == F.lower(cb)
