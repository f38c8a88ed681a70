"""Registry entries: event-analytics shapes over ``events`` — ordered
funnel conversion, retention cohorts, and rolling-window rate anomaly
detection. Classic product-analytics workloads an engine replacing the
reference would be asked to run next (the reference's logs datasets are
exactly this kind of event feed).

Timestamps are handled as integer epoch-micros on BOTH engines
(unix_micros / epoch_us) so day and hour bucketing is exact regardless of
the parquet TIMESTAMP(NANOS) physical type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000

FUNNEL = ("signup", "click", "purchase")
FUNNEL_WINDOW_US = 24 * _HOUR_US  # stage-to-stage conversion window


@register(
    "events_funnel",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s AS (
      SELECT user_id, min(us) AS s_us FROM e
      WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.us) AS c_us
      FROM e JOIN s USING (user_id)
      WHERE e.event_type = '{FUNNEL[1]}' AND e.us > s.s_us
        AND e.us <= s.s_us + {FUNNEL_WINDOW_US}
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.us) AS p_us
      FROM e JOIN c USING (user_id)
      WHERE e.event_type = '{FUNNEL[2]}' AND e.us > c.c_us
        AND e.us <= c.c_us + {FUNNEL_WINDOW_US}
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s)::BIGINT AS n_signup,
           (SELECT count(*) FROM c)::BIGINT AS n_click_after,
           (SELECT count(*) FROM p)::BIGINT AS n_purchase_after
    """,
    doc="Ordered funnel conversion (signup -> click -> purchase, 24h "
    "stage-to-stage window): each stage keeps users whose earliest "
    "stage-k event strictly follows their stage-(k-1) time within the "
    "window. Three per-user aggregations on the SAME key — at scale "
    "repartition by user_id once and every stage reuses the partitioning "
    "(one shuffle total).",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s = (
        e.filter(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("s_us"))
    )
    c = (
        e.filter(F.col("event_type") == FUNNEL[1])
        .join(s, "user_id")
        .filter(
            (F.col("us") > F.col("s_us"))
            & (F.col("us") <= F.col("s_us") + FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        e.filter(F.col("event_type") == FUNNEL[2])
        .join(c, "user_id")
        .filter(
            (F.col("us") > F.col("c_us"))
            & (F.col("us") <= F.col("c_us") + FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    )


@register(
    "events_retention_cohorts",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events),
    cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, day FROM e)
    SELECT c.cohort_day, (a.day - c.cohort_day)::BIGINT AS day_offset,
           count(*) AS n_users
    FROM active a JOIN cohort c USING (user_id)
    WHERE a.day - c.cohort_day <= 7
    GROUP BY c.cohort_day, day_offset
    """,
    doc="Retention cohorts: users grouped by first-seen day, counted on "
    "each active day-offset up to 7. One per-user min + one distinct "
    "(user, day) set + a user-keyed join — the cohort matrix is tiny "
    "(days x offsets) however large the event log is.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / _DAY_US).cast("long").alias("day")
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = e.distinct()
    return (
        active.join(cohort, "user_id")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


ANOM_WINDOW = 24  # trailing hours
ANOM_Z = 3.0


@register(
    "events_rate_anomaly",
    # Rolling mean/variance are derived from INTEGER window sums (count,
    # sum, sum of squares of hourly counts), so the z-score is the same
    # double in both engines — no streaming-variance implementation drift.
    oracle=f"""
    WITH hourly AS (
      SELECT epoch_us(ts) // {_HOUR_US} AS hour, count(*) AS n_events
      FROM events GROUP BY 1),
    roll AS (
      SELECT hour, n_events,
             count(*) OVER w AS c,
             sum(n_events) OVER w AS s,
             sum(n_events * n_events) OVER w AS ss
      FROM hourly
      WINDOW w AS (ORDER BY hour ROWS BETWEEN {ANOM_WINDOW} PRECEDING
                   AND 1 PRECEDING)),
    z AS (
      SELECT hour, n_events,
             round((n_events - s / c::DOUBLE)
               / sqrt((ss - s * s / c::DOUBLE) / (c - 1)), 4) AS zscore
      FROM roll
      WHERE c = {ANOM_WINDOW}
        AND (ss - s * s / c::DOUBLE) > 0)
    SELECT make_timestamp(hour * {_HOUR_US}) AS hour_start, n_events, zscore,
           abs(zscore) > {ANOM_Z} AS is_anomaly
    FROM z
    """,
    doc="Hourly event-rate anomaly detection: z-score of each hour's count "
    f"vs the trailing {ANOM_WINDOW}h rolling mean/stddev (derived from "
    "integer window sums — exact cross-engine), flagged at |z| > 3. One "
    "grouped count + one ordered window; at scale the hourly relation is "
    "tiny regardless of event volume.",
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select((F.unix_micros("ts") / _HOUR_US).cast("long").alias("hour"))
        .groupBy("hour")
        .agg(F.count("*").alias("n_events"))
    )
    w = W.orderBy("hour").rowsBetween(-ANOM_WINDOW, -1)
    roll = hourly.select(
        "hour",
        "n_events",
        F.count("*").over(w).alias("c"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss"),
    )
    var_num = F.col("ss") - F.col("s") * F.col("s") / F.col("c").cast("double")
    z = (
        roll.filter((F.col("c") == ANOM_WINDOW) & (var_num > 0))
        .select(
            "hour",
            "n_events",
            F.round(
                (F.col("n_events") - F.col("s") / F.col("c").cast("double"))
                / F.sqrt(var_num / (F.col("c") - 1)),
                4,
            ).alias("zscore"),
        )
    )
    return z.select(
        F.timestamp_micros(F.col("hour") * _HOUR_US).alias("hour_start"),
        "n_events",
        "zscore",
        (F.abs("zscore") > ANOM_Z).alias("is_anomaly"),
    )
