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


# bim_users analog: the reference flags rows by membership in a 17-name
# literal set (create_scripts_dataset.ipynb:117-128); the testdata fact's
# enumerable label column is l_returnflag
BIM_FLAGS = ("A", "R")


def scripts_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_scripts_dataset.ipynb:62-319 re-expressed as ONE lazy plan —
    the reference's flagship dataset (§3.1, the first notebook run.py runs).

    Reference chain → analog (FIXTURES.md):

    - J1 stage-enrich (:138-143): plugin ⟕ plugin_development_stage pulling
      ``description``; tech columns dropped (:145-151, P2) →
      supplier ⟕ nation pulling n_name AS stage_description.
    - is_bim membership flag (:117-128, P5) → l_returnflag ∈ BIM_FLAGS.
    - J2 monitoring ⟕ plugin (:161-166) → lineitem ⟕ enriched supplier on
      l_suppkey; the dim key is aliased away pre-join, so the reference's
      drop-the-duplicated-id step (:166) is structurally unnecessary.
    - J3 mapping join (:176-188): the reference merges the SAME mapping CSV
      twice to pull gitlab_id then yougile_guid; one broadcast join pulls
      both payloads → part projected as (tim_guid, gitlab_id_raw,
      project_name), joined once on l_partkey. Mapping payloads are STRINGS
      (config CSV), hence gitlab_id_raw = CAST(p_size AS string).
    - F1 short project name (:95-99) → first 2 space-tokens of the mapped
      project_name (p_type ⊕ p_name is 3 tokens, so truncation is real).
    - J4 cast-key gitlab join (:198-206): pd.to_numeric(errors='coerce')
      .astype('Int64') then merge → try_cast(gitlab_id_raw AS long) ⟕
      nation on n_nationkey pulling chosen_branch + loc_cs; p_size ∈ 1..50
      vs keys 0..24, so ~half the rows dangle exactly like the reference's
      partially-populated mapping sheet.
    - F13 per-dtype imputation (:215-223): strings → 'Нет данных',
      numerics → 0, MID-pipeline, before the split.
    - bim/designers split (:233-234): downstream of this frame (the
      orchestrator writes both halves + the plugin dim — the notebook's
      3-way K4 sink, :261-319).

    One Catalyst plan: three broadcast hash joins (dims ≤ 2k rows; at 100 TB
    the fact side streams through them map-side, zero shuffles) + a fully
    codegen'd scalar chain. Row-level output keyed (l_orderkey,
    l_linenumber) so the oracle check is per-row, not aggregate-only.
    """
    li = load_table(spark, sf_dir, "lineitem")  # monitoring (fact)
    sup = load_table(spark, sf_dir, "supplier")  # plugin (dim)
    nat = load_table(spark, sf_dir, "nation")  # stage dim + gitlab dim
    prt = load_table(spark, sf_dir, "part")  # mapping CSV analog

    # J1: plugin ⟕ development-stage, tech columns dropped by projection
    plugin = J.enrich(
        sup, nat, {"s_nationkey": "n_nationkey"}, {"n_name": "stage_description"}
    ).select("s_suppkey", F.col("s_name").alias("plugin_name"), "stage_description")

    # mapping config CSV: string-typed payloads keyed by the plugin guid
    mapping = prt.select(
        F.col("p_partkey").alias("tim_guid"),
        F.col("p_size").cast("string").alias("gitlab_id_raw"),
        F.concat_ws(" ", "p_type", "p_name").alias("project_name"),
    )

    enriched = J.enrich(  # J2
        li, plugin, {"l_suppkey": "s_suppkey"}, ["plugin_name", "stage_description"]
    )
    enriched = J.enrich(  # J3: ONE pass for both mapping payloads
        enriched, mapping, {"l_partkey": "tim_guid"}, ["gitlab_id_raw", "project_name"]
    )
    # J4: normalize the string key, then probe the gitlab dim
    enriched = enriched.withColumn("gitlab_id", N.numeric_coerce("gitlab_id_raw"))
    enriched = J.enrich(
        enriched,
        nat,
        {"gitlab_id": "n_nationkey"},
        {"n_name": "chosen_branch", "n_regionkey": "loc_cs"},
    )

    shaped = enriched.select(
        "l_orderkey",
        "l_linenumber",
        S.short_name("project_name", delim=" ").alias("short_project"),  # F1
        F.col("l_returnflag").isin(*BIM_FLAGS).cast("int").alias("is_bim"),  # P5
        "plugin_name",
        "stage_description",
        "gitlab_id",
        "chosen_branch",
        F.col("loc_cs").cast("long").alias("loc_cs"),
    )
    return N.impute_by_dtype(shaped)  # F13


SCRIPTS_ORACLE = f"""
WITH plugin AS (
  SELECT s.s_suppkey, s.s_name AS plugin_name, n.n_name AS stage_description
  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey),
mapping AS (
  SELECT p_partkey AS tim_guid,
         CAST(p_size AS VARCHAR) AS gitlab_id_raw,
         p_type || ' ' || p_name AS project_name
  FROM part),
enriched AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
         pl.plugin_name, pl.stage_description,
         m.gitlab_id_raw, m.project_name,
         TRY_CAST(m.gitlab_id_raw AS BIGINT) AS gitlab_id
  FROM lineitem l
  LEFT JOIN plugin pl ON l.l_suppkey = pl.s_suppkey
  LEFT JOIN mapping m ON l.l_partkey = m.tim_guid),
joined AS (
  SELECT e.*, g.n_name AS chosen_branch, g.n_regionkey::BIGINT AS loc_cs
  FROM enriched e LEFT JOIN nation g ON e.gitlab_id = g.n_nationkey)
SELECT l_orderkey, l_linenumber,
       COALESCE(CASE WHEN len(string_split(project_name, ' ')) >= 2
            THEN split_part(project_name, ' ', 1) || ' ' || split_part(project_name, ' ', 2)
            ELSE project_name END, 'Нет данных') AS short_project,
       (l_returnflag IN {BIM_FLAGS})::INT AS is_bim,
       COALESCE(plugin_name, 'Нет данных') AS plugin_name,
       COALESCE(stage_description, 'Нет данных') AS stage_description,
       COALESCE(gitlab_id, 0) AS gitlab_id,
       COALESCE(chosen_branch, 'Нет данных') AS chosen_branch,
       COALESCE(loc_cs, 0) AS loc_cs
FROM joined
"""
