"""Lakehouse-style sink semantics over plain parquet: dynamic partition
overwrite — the day-correction pattern every date-partitioned incremental
pipeline eventually needs (a late-arriving restatement replaces ONE day's
directory; every other partition's files stay untouched).

The reference's date-keyed incremental append
(/root/reference/datasets/create_projectsync_dataset.ipynb:410-441) can
only add rows; restating a day there means a manual DELETE + reload. With
``partitionOverwriteMode=dynamic`` the overwrite is scoped to exactly the
partitions present in the incoming frame — at 100 TB that is one
directory swap per restated day, not a table rewrite, and it is atomic
per partition (the job commits each day directory whole).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_CACHE = "/tmp/etl_pipeline_old_spark_cache"

# the restated day and the audit window proving its neighbors were untouched
FIX_DAY = "2024-01-03"
AUDIT_LO, AUDIT_HI = "2024-01-01", "2024-01-05"


@register(
    "k8_dynamic_partition_overwrite",
    oracle=f"""
    WITH tagged AS (
      SELECT CAST(ts AS DATE) AS day, event_id,
             CASE WHEN CAST(ts AS DATE) = DATE '{FIX_DAY}'
                  THEN value * 2 ELSE value END AS value
      FROM events)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS total_value
    FROM tagged
    WHERE day BETWEEN DATE '{AUDIT_LO}' AND DATE '{AUDIT_HI}'
    GROUP BY day
    """,
    doc="Dynamic partition overwrite (K8): events written day-partitioned, "
    f"then the {FIX_DAY} partition is RESTATED (values doubled) by writing "
    "only that day's corrected rows in overwrite mode with "
    "partitionOverwriteMode=dynamic — the writer replaces exactly the "
    "partitions present in the incoming frame and leaves all others' "
    "files untouched (verified: the readback aggregates the restated day "
    "against its unchanged neighbors). The restatement pattern for "
    "date-partitioned incremental tables; at 100 TB one directory swap "
    "per restated day instead of a table rewrite.",
)
def k8_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = os.path.join(
        _CACHE,
        f"events_dyn_overwrite_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    corrections = ev.filter(F.col("day") == FIX_DAY).withColumn(
        "value", F.col("value") * 2
    )
    (
        corrections.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )

    back = spark.read.parquet(path)
    return (
        back.filter(F.col("day").between(AUDIT_LO, AUDIT_HI))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_SCRIPT = """
BEGIN
  DECLARE total BIGINT;
  DECLARE days INT DEFAULT 0;
  DECLARE acc BIGINT DEFAULT 0;
  SET total = (SELECT count(*) FROM events);
  WHILE acc * 2 < total DO
    SET days = days + 1;
    SET acc = (SELECT count(*) FROM events
               WHERE to_date(ts) < date_add(DATE'2024-01-01', days));
  END WHILE;
  SELECT CAST(days AS BIGINT) AS window_days, acc AS n_events, total AS n_total;
END
"""


@register(
    "sql_scripting_backfill_window",
    oracle="""
    WITH tot AS (SELECT count(*)::BIGINT AS n_total FROM events),
    cum AS (
      SELECT i, (SELECT count(*) FROM events
                 WHERE CAST(ts AS DATE) < DATE '2024-01-01' + i::INT)::BIGINT AS acc
      FROM UNNEST(generate_series(1, 60)) AS u(i))
    SELECT i::BIGINT AS window_days, acc AS n_events, n_total
    FROM cum, tot WHERE acc * 2 >= n_total
    ORDER BY i LIMIT 1
    """,
    doc="Spark 4 SQL scripting (BEGIN/DECLARE/WHILE): an iterative "
    "backfill-window sizing loop — grow the day window until it covers "
    "half the event volume, each iteration a real aggregate over the "
    "table. The procedural-SQL surface (ANSI/PSM subset) the reference's "
    "run.py-style orchestration would use for in-warehouse control flow; "
    "the oracle derives the same fixpoint declaratively (min prefix whose "
    "cumulative count reaches half). Joins the WITH RECURSIVE / VARIANT / "
    "UDTF entries as the Spark 4 SQL-surface exhibits.",
)
def sql_scripting_backfill_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_tables

    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load_tables(spark, sf_dir, ("events",), register_views=True)
    df = spark.sql(_SCRIPT)
    if prev is not None:
        spark.conf.set("spark.sql.scripting.enabled", prev)
    return df


# --- l-diversity audit ------------------------------------------------------
L_DIV = 3
BAL_BAND = 2000  # sensitive attribute: account balance band


@register(
    "privacy_l_diversity",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           count(*)::BIGINT AS n_people,
           count(DISTINCT floor(c_acctbal / {BAL_BAND})::BIGINT)::BIGINT
             AS n_bands,
           count(DISTINCT floor(c_acctbal / {BAL_BAND})::BIGINT) >= {L_DIV}
             AS l_ok
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
    doc=f"l-diversity audit (l={L_DIV}), the companion gate to "
    "privacy_k_anonymity: a k-anonymous equivalence class still leaks if "
    "everyone in it shares the sensitive value, so each quasi-identifier "
    "group (nation, segment) must contain >= l distinct sensitive values "
    f"(account-balance bands of {BAL_BAND}). One map-side-combined "
    "groupBy with a distinct-count — fact-scale scan, class-scale "
    "output. Run k-anonymity AND l-diversity before any user-derived "
    "table ships to training.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / BAL_BAND).cast("long")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n_people"),
        F.count_distinct(band).cast("long").alias("n_bands"),
        (F.count_distinct(band) >= L_DIV).alias("l_ok"),
    )
