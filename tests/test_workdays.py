"""Golden tests for workdays_diff — hand-computed expectations from the
reference's algorithm (create_yougile_dataset.ipynb:177-225), plus
cross-implementation equality of the frame and pandas-UDF variants."""

from __future__ import annotations

from datetime import datetime

import pytest

from etl_pipeline_old_spark.operators.workdays import (
    make_workdays_udf,
    workdays_diff_frame,
)

# (start_utc, end_utc, expected) — times chosen in UTC so local (+5) wall
# time hits the documented cases. 2024-01-16 is a Tuesday.
GOLDEN = [
    # same working day: local 09:30 → 12:00 = 2.5h / 9h
    (datetime(2024, 1, 16, 4, 30), datetime(2024, 1, 16, 7, 0), 0.28),
    # start before workday: local 06:00 → 10:30 = 2.5h / 9h
    (datetime(2024, 1, 16, 1, 0), datetime(2024, 1, 16, 5, 30), 0.28),
    # same-day weekend (local Sat 2024-01-20) → 0
    (datetime(2024, 1, 20, 4, 0), datetime(2024, 1, 20, 7, 0), 0.0),
    # Mon 16:00 → Wed 09:00: delta=2, between=1, first=1/9, last=1/9
    (datetime(2024, 1, 15, 11, 0), datetime(2024, 1, 17, 4, 0), 1.22),
    # Fri 16:00 → Sat 12:00: delta=0 → between=0, last=0, first=1/9
    (datetime(2024, 1, 19, 11, 0), datetime(2024, 1, 20, 7, 0), 0.11),
    # across New Year holidays: Fri 2023-12-29 10:00 → Tue 2024-01-09 10:00
    # working days in (Dec29, Jan9] = {Jan 9} → between=0; first=7/9, last=2/9
    (datetime(2023, 12, 29, 5, 0), datetime(2024, 1, 9, 5, 0), 1.0),
    # end is a non-working day далеко: Mon 10:00 → Sun 10:00 same week:
    # delta = Tue..Fri = 4 → between=3 (reference's -1 quirk), first=7/9
    (datetime(2024, 1, 15, 5, 0), datetime(2024, 1, 21, 5, 0), 3.78),
    # null end → null
    (datetime(2024, 1, 16, 4, 30), None, None),
    # 2019 decree (1163/2018): May 2+3 off (transferred from Jan 5/6).
    # Tue Apr 30 local 14:00 → Mon May 6 local 10:00: working days in
    # (Apr30, May6] = {May 6} → between=0; first=3/9, last=2/9
    (datetime(2019, 4, 30, 9, 0), datetime(2019, 5, 6, 5, 0), 0.56),
    # 2018 decreed WORKING Saturday Apr 28 (pays for Apr 30 bridge):
    # Fri 16:00 → Sat 16:00: delta={Apr28}=1 → between=0; first=1/9, last=8/9
    (datetime(2018, 4, 27, 11, 0), datetime(2018, 4, 28, 11, 0), 1.0),
    # 2027: outside the decree window → statutory auto-transfers
    # (Jan 2 Sat → Jan 11, Jan 3 Sun → Jan 12). Thu 2026-12-31 (off, decree
    # 2026) local 16:00 → Wed 2027-01-13 local 11:00: working days in
    # (Dec31, Jan13] = {Jan 13} → between=0; first=0, last=3/9
    (datetime(2026, 12, 31, 11, 0), datetime(2027, 1, 13, 6, 0), 0.33),
]


@pytest.fixture(scope="module")
def golden_df(spark):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e, _) in enumerate(GOLDEN)],
        "id long, createdAt timestamp, closedAt timestamp",
    )


def _by_id(rows):
    return {r["id"]: r["work_days_duration"] for r in rows}


def test_frame_variant_golden(spark, golden_df):
    out = _by_id(workdays_diff_frame(golden_df, "createdAt", "closedAt").collect())
    for i, (_, _, exp) in enumerate(GOLDEN):
        assert out[i] == (pytest.approx(exp, abs=1e-9) if exp is not None else None), f"case {i}"


def test_udf_variant_golden(spark, golden_df):
    udf = make_workdays_udf()
    out = _by_id(
        golden_df.select("id", udf("createdAt", "closedAt").alias("work_days_duration")).collect()
    )
    for i, (_, _, exp) in enumerate(GOLDEN):
        if exp is None:
            assert out[i] is None or out[i] != out[i]  # NaN/null
        else:
            assert out[i] == pytest.approx(exp, abs=1e-9), f"case {i}"


def test_frame_variant_raises_outside_calendar(spark):
    df = spark.createDataFrame(
        [(datetime(1901, 1, 3, 5, 0), datetime(1901, 1, 4, 5, 0))],
        "createdAt timestamp, closedAt timestamp",
    )
    with pytest.raises(Exception, match="outside the supported calendar range"):
        workdays_diff_frame(df, "createdAt", "closedAt").collect()


def test_workdays_invariants(spark, oracle_sf_dir):
    """Invariants over real data: 0 <= duration <= calendar-day span + 1,
    and closed tasks always get a non-null duration."""
    from pyspark.sql import functions as F

    from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    out = QUERIES["workdays_diff_sql"].fn(spark, oracle_sf_dir)
    from etl_pipeline_old_spark.catalog import load_table

    ev = load_table(spark, oracle_sf_dir, "events").select(
        "event_id", "event_type", (F.floor("value")).alias("span_hours")
    )
    j = out.join(ev, "event_id")
    bad_null = j.filter(
        (F.col("event_type") != "error") & F.col("work_days_duration").isNull()
    ).count()
    assert bad_null == 0
    bad_range = j.filter(
        F.col("work_days_duration").isNotNull()
        & (
            (F.col("work_days_duration") < 0)
            | (F.col("work_days_duration") > F.col("span_hours") / 24.0 + 1.0)
        )
    ).count()
    assert bad_range == 0


def test_variants_agree_on_events(spark, oracle_sf_dir):
    from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    a = _by_id(
        QUERIES["workdays_diff_sql"].fn(spark, oracle_sf_dir)
        .withColumnRenamed("event_id", "id").collect()
    )
    b = _by_id(
        QUERIES["workdays_diff_pandas_udf"].fn(spark, oracle_sf_dir)
        .withColumnRenamed("event_id", "id").collect()
    )
    assert set(a) == set(b)
    diffs = {
        k: (a[k], b[k])
        for k in a
        if (a[k] is None) != (b[k] is None)
        or (a[k] is not None and abs(a[k] - b[k]) > 1e-9)
    }
    assert not diffs, f"{len(diffs)} disagreements, e.g. {list(diffs.items())[:5]}"


# Production-calendar goldens: spans crossing 2024's decreed transfers
# (Apr 27 working Saturday, Apr 29-30 bridge days, May 10 transferred from
# Jan 6). Times UTC; local = +5.
GOLDEN_TRANSFERS = [
    # Wed 2024-05-08 16:00 -> Mon 2024-05-13 10:00 local: May 9 holiday,
    # May 10 TRANSFERRED OFF, weekend; delta={May 13}=1 -> between=0,
    # first=1/9, last=2/9
    (datetime(2024, 5, 8, 11, 0), datetime(2024, 5, 13, 5, 0), 0.33),
    # decreed WORKING Saturday 2024-04-27, same day local 09:00->12:00 = 3h/9h
    (datetime(2024, 4, 27, 4, 0), datetime(2024, 4, 27, 7, 0), 0.33),
    # Fri 2024-04-26 16:00 -> Thu 2024-05-02 10:00 local: working days in
    # (Apr 26, May 2] = {Apr 27 (working Sat), May 2} = 2 -> between=1,
    # first=1/9, last=2/9 (Apr 29-30 bridge + May 1 holiday drop out)
    (datetime(2024, 4, 26, 11, 0), datetime(2024, 5, 2, 5, 0), 1.33),
]


@pytest.fixture(scope="module")
def transfers_df(spark):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e, _) in enumerate(GOLDEN_TRANSFERS)],
        "id long, createdAt timestamp, closedAt timestamp",
    )


def test_frame_variant_production_calendar(spark, transfers_df):
    out = _by_id(workdays_diff_frame(transfers_df, "createdAt", "closedAt").collect())
    for i, (_, _, exp) in enumerate(GOLDEN_TRANSFERS):
        assert out[i] == pytest.approx(exp, abs=1e-9), f"transfer case {i}"


def test_udf_variant_production_calendar(spark, transfers_df):
    udf = make_workdays_udf()
    out = _by_id(
        transfers_df.select(
            "id", udf("createdAt", "closedAt").alias("work_days_duration")
        ).collect()
    )
    for i, (_, _, exp) in enumerate(GOLDEN_TRANSFERS):
        assert out[i] == pytest.approx(exp, abs=1e-9), f"transfer case {i}"


def test_frame_build_triggers_no_job(spark, golden_df):
    """workdays_diff_frame must be a pure lazy transform: building the plan
    (fixed-range calendar, no fact-table bounds scan) runs zero Spark jobs."""
    sc = spark.sparkContext
    sc.setJobGroup("wd_build_probe", "workdays build probe")
    try:
        workdays_diff_frame(golden_df, "createdAt", "closedAt")
        ids = sc.statusTracker().getJobIdsForGroup("wd_build_probe")
    finally:
        sc.setJobGroup("", "")
    assert list(ids) == [], f"plan build launched jobs: {ids}"
