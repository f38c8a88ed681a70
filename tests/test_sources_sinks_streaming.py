"""Tests for source adapters (offline, injected transports), the
incremental sink cycle, and streaming semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_old_spark.catalog import load_table
from etl_pipeline_old_spark.sinks.incremental import (
    incremental_append,
    read_evolved,
    sheet_append_missing,
)
from etl_pipeline_old_spark.sources.jdbc import incremental_subquery
from etl_pipeline_old_spark.sources.rest import (
    TransportError,
    get_with_backoff,
    paginate,
    rest_to_dataframe,
)
from etl_pipeline_old_spark.sources.sheets import sheet_to_dataframe


# ---------------------------------------------------------------- REST (S7)
def _pages(n_rows, limit):
    def fetch(offset, limit_):
        return [{"id": i, "v": f"r{i}"} for i in range(offset, min(offset + limit_, n_rows))]

    return fetch


def test_paginate_stops_on_short_page():
    rows = list(paginate(_pages(2500, 1000), limit=1000))
    assert len(rows) == 2500 and rows[-1]["id"] == 2499


def test_backoff_honors_retry_after():
    calls, sleeps = [], []
    def fetch(offset, limit):
        calls.append(1)
        if len(calls) < 3:
            raise TransportError(429, retry_after=7.5)
        return [{"id": offset}]
    out = get_with_backoff(fetch, 0, 10, sleep=sleeps.append)
    assert out == [{"id": 0}] and sleeps == [7.5, 7.5]


def test_backoff_gives_up_after_5_retries():
    def fetch(offset, limit):
        raise TransportError(500)
    sleeps = []
    with pytest.raises(TransportError):
        get_with_backoff(fetch, 0, 10, sleep=sleeps.append)
    assert sleeps == [1, 2, 4, 8, 16]  # ref: Retry(total=5, backoff_factor=1)


def test_rest_to_dataframe(spark):
    df = rest_to_dataframe(spark, _pages(150, 1000), schema="id long, v string", limit=1000)
    assert df.count() == 150


# -------------------------------------------------------------- Sheets (S9)
def test_sheet_adapter_pads_and_cleans(spark):
    values = [
        ["﻿ Название ", "Ссылка"],          # BOM + padded header
        ["Скрипт\r\nдва", "https://x y z"],  # CRLF cell
        ["короткая"],                        # ragged row → padded
    ]
    df = sheet_to_dataframe(spark, lambda: values)
    assert df.columns == ["Название", "Ссылка"]
    rows = df.collect()
    assert rows[0]["Название"] == "Скрипт  два"
    assert rows[1]["Ссылка"] == ""


# ---------------------------------------------------------------- JDBC (S5)
def test_incremental_subquery_pushdown():
    q = incremental_subquery("asteriskcdrdb.cdr", "uniqueid", "1700000000.123")
    assert q == "(SELECT * FROM asteriskcdrdb.cdr WHERE \"uniqueid\" > '1700000000.123') t"
    assert incremental_subquery("t", "k", None) == "t"
    # numeric watermarks stay bare (Derby won't coerce VARCHAR to BIGINT)
    assert incremental_subquery("t", "k", 89) == '(SELECT * FROM t WHERE "k" > 89) t'


# ------------------------------------------------------- incremental (K5)
def test_incremental_append_schema_evolution(spark, tmp_path):
    target = os.path.join(str(tmp_path), "t")
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    assert incremental_append(df1, target, "k", spark) == 1
    # second batch has a NEW column (ADD COLUMN IF NOT EXISTS semantics)
    df2 = spark.createDataFrame([(2, "b", 9.5)], "k long, v string, extra double")
    assert incremental_append(df2, target, "k", spark) == 1
    out = read_evolved(spark, target)
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["extra"] is None and rows[2]["extra"] == 9.5
    # idempotent re-run
    assert incremental_append(df2, target, "k", spark) == 0


# ------------------------------------------------------------- sheets (K6)
def test_sheet_append_missing_anti_join(spark):
    new = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    existing = spark.createDataFrame([(1,), (3,)], "id long")
    appended = []
    n = sheet_append_missing(new, existing, "id", appended.append)
    assert n == 1 and appended == [[2, "b"]]


# --------------------------------------------------------------- streaming
def test_append_mode_is_prefix_of_complete(spark, sf_dir):
    from etl_pipeline_old_spark.streaming.events import (
        append_mode_with_watermark,
        tumbling_window_counts,
    )

    complete = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in tumbling_window_counts(spark, sf_dir).collect()
    }
    appended = append_mode_with_watermark(spark, sf_dir).collect()
    assert len(appended) > 0, "watermark should have closed at least one window"
    assert len(appended) < len(complete), "append mode must withhold open windows"
    for r in appended:
        assert complete[(r["window_start"], r["event_type"])] == r["n_events"]


def test_csv_overwrite_utf8_sig(spark, tmp_path):
    """bom=True reproduces the reference's utf-8-sig CSVs
    (fetch_gsheet_instructions.py:56-62): every part file starts with the
    BOM and pandas reads it back clean under encoding='utf-8-sig'."""
    import glob

    from etl_pipeline_old_spark.sinks.incremental import csv_overwrite

    df = spark.createDataFrame([(1, "Привет"), (2, "héllo")], "id long, txt string")
    out = str(tmp_path / "bom_csv")
    csv_overwrite(df, out, quote_all=True, bom=True)
    parts = glob.glob(out + "/part-*.csv")
    assert parts
    for p in parts:
        with open(p, "rb") as fh:
            assert fh.read(3) == b"\xef\xbb\xbf"
    import pandas as pd

    back = pd.concat(pd.read_csv(p, encoding="utf-8-sig") for p in parts)
    assert set(back["txt"]) == {"Привет", "héllo"}
