"""Golden/property tests for the scalar library over reference-shaped
fixtures (Cyrillic, CRLF cells, BOM headers) — the paths the driver
testdata can't exercise (SURVEY.md §5.2/5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_old_spark.functions import classify as C
from etl_pipeline_old_spark.functions import nulls as N
from etl_pipeline_old_spark.functions import strings as S


def _col(df, name):
    return [r[name] for r in df.select(name).collect()]


def test_short_name_reference_semantics(spark):
    # ref: create_scripts_dataset.ipynb:95-99
    df = spark.createDataFrame(
        [("ATOM_123_revit_export",), ("одиночное",), ("a_b",), (None,)], ["name"]
    )
    out = df.select(S.short_name("name").alias("s"))
    assert _col(out, "s") == ["ATOM_123", "одиночное", "a_b", None]


def test_strip_trailing_token_null_safety(spark):
    # ref: create_projectsync_dataset.ipynb:175-194
    rows = [
        ("Проект_АБВ_ivanov", "Ivanov", "Проект_АБВ"),  # ci match → stripped
        ("Проект_АБВ_petrov", "sidorov", "Проект_АБВ_petrov"),  # no match
        ("Проект", None, "Проект"),  # null user → passthrough
        (None, "ivanov", None),  # null path → null
    ]
    df = spark.createDataFrame([(p, u) for p, u, _ in rows], ["path", "user"])
    out = df.select(S.strip_trailing_token("path", "user").alias("s"))
    assert _col(out, "s") == [e for _, _, e in rows]


def test_classifier_first_match_wins(spark):
    # F2/F5/F6 order sensitivity: a row matching rule 1 AND rule 2 must get
    # rule 1's label (dict-iteration-order contract, SURVEY.md §7)
    df = spark.createDataFrame([("АТОМ и ДОУ",), ("только ДОУ",), (None,), ("ничего",)], ["t"])
    out = df.select(
        C.classify_contains("t", [("АТОМ", "первый"), ("ДОУ", "второй")], "НД").alias("c")
    )
    assert _col(out, "c") == ["первый", "второй", "НД", "НД"]


def test_classifier_null_safe_like_pandas_na_false(spark):
    df = spark.createDataFrame([(None,)], "t string")
    out = df.select(C.flag_from_regex("t", "(?i)отсоединено").alias("f"))
    assert _col(out, "f") == [0]  # pandas str.contains(na=False) → 0, not null


def test_clean_crlf_and_bom_headers(spark):
    df = spark.createDataFrame([("линия1\r\nлиния2", 1)], ["﻿ название ", "x"])
    clean = S.sanitize_column_names(df)
    assert clean.columns == ["название", "x"]
    out = clean.select(S.clean_crlf("название").alias("v"))
    assert _col(out, "v") == ["линия1  линия2"]


def test_impute_by_dtype_leaves_timestamps(spark):
    df = spark.createDataFrame(
        [(None, None, None)], "s string, n bigint, t timestamp"
    )
    out = N.impute_by_dtype(df)
    row = out.first()
    assert row["s"] == "Нет данных" and row["n"] == 0 and row["t"] is None


def test_drop_all_null_columns(spark):
    df = spark.createDataFrame([(1, None, "a"), (2, None, None)], "a bigint, b string, c string")
    out = N.drop_all_null_columns(df)
    assert out.columns == ["a", "c"]


def test_numeric_coerce_null_on_garbage(spark):
    df = spark.createDataFrame([("12",), ("12.7",), ("мусор",), (None,)], ["v"])
    out = df.select(N.numeric_coerce("v").alias("n"))
    assert _col(out, "n") == [12, None, None, None]  # Int64-cast semantics


def test_join_preserves_left_cardinality(spark, sf_dir):
    # property from SURVEY §5.3: reference dims are unique-keyed, so every
    # J1-J9 enrich keeps the fact row count
    from etl_pipeline_old_spark.catalog import load_table
    from etl_pipeline_old_spark.operators import joins as J

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    out = J.enrich(li, p, {"l_partkey": "p_partkey"}, ["p_brand"])
    assert out.count() == li.count()
