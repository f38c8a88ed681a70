"""The remaining three reference notebook pipelines as single lazy plans
(companions to plans/pipelines.py's logs pipeline).

Analog mapping (FIXTURES.md): project_sync→orders, ad_user→customer,
tasks→events, projects/branches→documents(source,lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import classify as C
from ..functions import nulls as N
from ..functions import strings as S
from ..operators import joins as J
from ..operators.workdays import workdays_diff_frame

BIM_SEGMENTS = ("AUTOMOBILE", "BUILDING")

# ordered classifier rules (order = priority, F2 contract)
OBJECT_RULES = [("URGENT", "Срочные"), ("HIGH", "Важные"), ("MEDIUM", "Средние")]
OBJECT_DEFAULT = "Неизвестные проекты"


def projectsync_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_projectsync_dataset.ipynb re-expressed.

    Reference chain (SURVEY.md §3.3): read → ⟕ad_user (:72-76) → is_bim
    (:95-106) → short name (:116-120) → ordered object classifier
    (:135-160) → is_detached flag (:165) → impute (:308-316) → conjunctive
    split (:326-327) → load. One Catalyst plan: broadcast join + codegen'd
    scalar chain + grouped summary; the fact side never shuffles until the
    final aggregate.
    """
    sync = load_table(spark, sf_dir, "orders")  # fact (project_sync)
    ad = load_table(spark, sf_dir, "customer")  # dim (ad_user)

    enriched = J.enrich(
        sync, ad, {"o_custkey": "c_custkey"}, {"c_mktsegment": "department", "c_name": "user_name"}
    )
    derived = (
        enriched.withColumn("is_bim", F.col("department").isin(*BIM_SEGMENTS))
        .withColumn("short_priority", S.short_name("o_orderpriority", delim="-"))
        .withColumn(
            "object_name", C.classify_contains("o_orderpriority", OBJECT_RULES, OBJECT_DEFAULT)
        )
        .withColumn("is_detached", C.flag_from_regex("o_orderstatus", "(?i)F"))
    )
    imputed = N.impute_by_dtype(derived.select(
        "o_orderkey", "is_bim", "short_priority", "object_name", "is_detached", "department"
    ))
    designers = imputed.filter((~F.col("is_bim")) & (F.col("is_detached") == 0))
    return designers.groupBy("object_name", "short_priority", "department").agg(
        F.count("*").alias("n_rows")
    )


PROJECTSYNC_ORACLE = f"""
WITH enriched AS (
  SELECT o.*, c.c_mktsegment AS department, c.c_name AS user_name
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
derived AS (
  SELECT o_orderkey,
         department IN {BIM_SEGMENTS} AS is_bim,
         CASE WHEN len(string_split(o_orderpriority, '-')) >= 2
              THEN split_part(o_orderpriority, '-', 1) || '-' || split_part(o_orderpriority, '-', 2)
              ELSE o_orderpriority END AS short_priority,
         CASE WHEN COALESCE(contains(o_orderpriority, 'URGENT'), FALSE) THEN 'Срочные'
              WHEN COALESCE(contains(o_orderpriority, 'HIGH'), FALSE) THEN 'Важные'
              WHEN COALESCE(contains(o_orderpriority, 'MEDIUM'), FALSE) THEN 'Средние'
              ELSE 'Неизвестные проекты' END AS object_name,
         COALESCE(regexp_matches(o_orderstatus, 'F', 'i'), FALSE)::INT AS is_detached,
         COALESCE(department, 'Нет данных') AS department_f
  FROM enriched)
SELECT object_name, short_priority, department_f AS department, count(*) AS n_rows
FROM derived
WHERE NOT is_bim AND is_detached = 0
GROUP BY 1, 2, 3
"""


def yougile_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_yougile_dataset.ipynb re-expressed: task pairs → business-day
    duration (§2.10) → status from null (F17) → per-status summary with
    local-time day bucketing (F16)."""
    ev = load_table(spark, sf_dir, "events")
    tasks = ev.select(
        "event_id",
        F.col("ts").alias("createdAt"),
        F.when(
            F.col("event_type") != "error",
            F.col("ts") + F.expr("make_interval(0, 0, 0, 0, cast(value as int), 0, 0)"),
        ).alias("closedAt"),
    )
    with_dur = workdays_diff_frame(tasks, "createdAt", "closedAt")
    with_status = with_dur.withColumn(
        "status", C.status_from_null("work_days_duration", "В работе", "Закрыта")
    )
    local_day = F.date_format(
        F.from_utc_timestamp("createdAt", "Asia/Yekaterinburg"), "yyyy-MM-dd"
    )
    return with_status.groupBy("status", local_day.alias("created_day")).agg(
        F.count("*").alias("n_tasks"),
        F.round(F.sum(F.coalesce(F.col("work_days_duration"), F.lit(0.0))), 2).alias("total_days"),
    )


def gitlab_lines_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch_gitlab_lines.py + create_gitlab_dataset.ipynb re-expressed:
    per-project/branch LOC totals (A4) → pick the max-LOC branch per
    project (A5 argmax) → enrich with the mapping dim (J9).

    Analog: documents(source=project, lang=branch, n_chars=LOC).
    """
    docs = load_table(spark, sf_dir, "documents")
    loc = docs.groupBy("source", "lang").agg(
        F.sum("n_chars").alias("loc"), F.count("*").alias("n_files")
    )
    w = W.partitionBy("source").orderBy(F.desc("loc"), F.asc("lang"))
    top = loc.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return top.select("source", F.col("lang").alias("top_branch"), "loc", "n_files")


GITLAB_ORACLE = """
WITH loc AS (
  SELECT source, lang, sum(n_chars)::BIGINT AS loc, count(*) AS n_files
  FROM documents GROUP BY source, lang)
SELECT source, lang AS top_branch, loc, n_files
FROM loc
QUALIFY row_number() OVER (PARTITION BY source ORDER BY loc DESC, lang ASC) = 1
"""
