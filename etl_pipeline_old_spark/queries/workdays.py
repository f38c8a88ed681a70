"""Registry entries for the business-day duration scalar (SURVEY.md §2.10).

The synthetic task table: events rows become (createdAt, closedAt) pairs,
closedAt = ts + value hours (spans 0-20 days), with 'error' events left
open (null closedAt) to exercise the null path — mirroring the reference's
YouGile tasks where unclosed tasks have no ``closedAt``.

Both the DataFrame/calendar-join variant and the pandas-UDF variant are
registered against the SAME DuckDB oracle, which re-derives the calendar
with a recursive-free generate_series CTE — so the two implementations are
hash-checked for mutual and external consistency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.workdays import (
    calendar_oracle_cte,
    make_workdays_udf,
    workdays_diff_frame,
)
from ..registry import register


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    closed = F.when(
        F.col("event_type") != "error",
        F.col("ts") + F.expr("make_interval(0, 0, 0, 0, cast(value as int), 0, 0)"),
    )
    return ev.select(
        "event_id", F.col("ts").alias("createdAt"), closed.alias("closedAt")
    )


# CTE chain ending in relation j(event_id, createdAt, closedAt, sl, el,
# s_working/s_cum/e_working/e_cum, s_frac, e_frac) — reusable by any oracle
# needing per-task durations (also the yougile pipeline oracle).
WORKDAYS_CTE = f"""
src AS (
  SELECT event_id,
         ts AS createdAt,
         -- floor() to match Spark's truncating cast(double AS int)
         CASE WHEN event_type <> 'error' THEN ts + to_hours(floor(value)::BIGINT) END AS closedAt
  FROM events),
loc AS (
  SELECT event_id, createdAt, closedAt,
         createdAt + INTERVAL 5 HOUR AS sl,
         closedAt  + INTERVAL 5 HOUR AS el
  FROM src),
{calendar_oracle_cte("(SELECT min(sl) FROM loc)", "(SELECT max(el) FROM loc)")},
j AS (
  SELECT l.*,
         cs.is_working AS s_working, cs.cum_working AS s_cum,
         ce.is_working AS e_working, ce.cum_working AS e_cum,
         hour(l.sl) + minute(l.sl) / 60.0 AS s_frac,
         hour(l.el) + minute(l.el) / 60.0 AS e_frac
  FROM loc l
  LEFT JOIN cal cs ON cs.d = l.sl::DATE
  LEFT JOIN cal ce ON ce.d = l.el::DATE)
"""

DURATION_EXPR = """
       CASE WHEN createdAt IS NULL OR closedAt IS NULL THEN NULL
            ELSE round(
              CASE WHEN sl::DATE < el::DATE THEN
                greatest(e_cum - s_cum - 1, 0)
                + CASE WHEN s_working
                       THEN least(greatest(17.0 - greatest(s_frac, 8.0), 0.0), 9.0) / 9.0
                       ELSE 0.0 END
                + CASE WHEN e_working
                       THEN least(greatest(least(e_frac, 17.0) - 8.0, 0.0), 9.0) / 9.0
                       ELSE 0.0 END
              ELSE
                CASE WHEN s_working
                     THEN least(greatest(least(e_frac, 17.0) - greatest(s_frac, 8.0), 0.0), 9.0) / 9.0
                     ELSE 0.0 END
              END, 2)
       END
"""

_ORACLE = f"""
WITH {WORKDAYS_CTE}
SELECT event_id, {DURATION_EXPR} AS work_days_duration
FROM j
"""


@register(
    "workdays_diff_sql",
    oracle=_ORACLE,
    doc="§2.10 opt 2 (scale path): business-day span via broadcast calendar "
    "dim with cumulative working-day counts — O(1) per row, no explode, no "
    "Python (ref: create_yougile_dataset.ipynb:177-225 workdays_diff).",
)
def workdays_diff_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = workdays_diff_frame(_pairs(spark, sf_dir), "createdAt", "closedAt")
    return out.select("event_id", "work_days_duration")


@register(
    "workdays_diff_pandas_udf",
    oracle=_ORACLE,
    doc="§2.10 opt 1 (parity path): the same semantics as a vectorized "
    "Arrow-batched pandas UDF — the engine's UDF extension-point demo "
    "(ref: create_yougile_dataset.ipynb:177-225).",
)
def workdays_diff_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    udf = make_workdays_udf()
    pairs = _pairs(spark, sf_dir)
    return pairs.select(
        "event_id", udf("createdAt", "closedAt").alias("work_days_duration")
    )
