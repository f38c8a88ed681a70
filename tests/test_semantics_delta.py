"""Executable documentation of the pandas → Spark semantic deltas a
reference user must know when migrating (SURVEY.md §7 risk register:
"document the semantic delta" — don't replicate pandas quirks, state them).

Each test shows the pandas behavior and the engine's SQL behavior side by
side, with the engine's stance in the assertion."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_null_join_keys_pandas_matches_sql_drops(spark):
    """pd.merge treats NaN keys as EQUAL and joins them; SQL equi-joins
    (and this engine) drop null keys — null is not equal to null."""
    a = pd.DataFrame({"k": [1.0, np.nan], "v": ["a", "b"]})
    b = pd.DataFrame({"k": [1.0, np.nan], "w": ["x", "y"]})
    pandas_rows = len(pd.merge(a, b, on="k"))
    assert pandas_rows == 2  # pandas joined NaN to NaN

    sa = spark.createDataFrame(a)
    sb = spark.createDataFrame(b)
    sql_rows = sa.join(sb, "k", "inner").count()
    assert sql_rows == 1  # engine: null keys never match

    # a user who NEEDS the pandas behavior opts in with null-safe equality
    nullsafe = sa.join(sb, sa["k"].eqNullSafe(sb["k"]), "inner").count()
    assert nullsafe == 2


def test_nan_equality_vs_null(spark):
    """pandas has NaN (float) which is != itself; Spark distinguishes NaN
    (a valid double, equal to itself and sortable greatest) from null."""
    df = spark.createDataFrame([(float("nan"),), (None,), (1.0,)], "x double")
    assert df.filter(F.col("x") == F.col("x")).count() == 2  # NaN == NaN holds, null drops
    assert df.filter(F.isnan("x")).count() == 1
    assert df.filter(F.col("x").isNull()).count() == 1


def test_duplicate_column_suffixes_do_not_exist(spark):
    """pd.merge silently invents id_x/id_y on collisions
    (create_gitlab_dataset.ipynb:140-159 then repairs them); the engine's
    enrich() aliases payloads up front so a collision is impossible, and a
    raw Spark join makes the ambiguity an ERROR at reference time instead
    of a silent rename."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    a = spark.createDataFrame([(1, "a")], "k long, id string")
    b = spark.createDataFrame([(1, "b")], "k long, id string")
    joined = a.join(b, "k")
    with pytest.raises(AnalysisException):
        joined.select("id").collect()

    from etl_pipeline_old_spark.operators.joins import enrich

    out = enrich(a, b, "k", {"id": "b_id"})
    assert out.columns == ["k", "id", "b_id"]  # collision structurally avoided


def test_int_column_with_nulls_stays_int(spark):
    """pandas silently upcasts int columns to float (or needs Int64) when a
    left join introduces NaN (create_scripts_dataset.ipynb:198-199's
    astype('Int64') dance); Spark ints are natively nullable."""
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(1, 10)], "k long, n long")
    out = left.join(right, "k", "left")
    assert dict(out.dtypes)["n"] == "bigint"  # still integral, null for misses
    rows = {r["k"]: r["n"] for r in out.collect()}
    assert rows[2] is None


def test_string_sort_is_binary_not_locale(spark):
    """pandas sorts str via Python unicode codepoints; Spark's default
    collation is also binary (UTF8_BINARY) — but this is a CONTRACT to pin,
    not an accident: Cyrillic sorts after Latin in both."""
    vals = ["яблоко", "apple", "Апельсин", "Banana"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["s"] for r in df.orderBy("s").collect()]
    assert got == sorted(vals)  # Python's codepoint sort == UTF8_BINARY
