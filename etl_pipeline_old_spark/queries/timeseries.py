"""Registry entries: time-series / CDC shapes over ``events`` — changelog
compaction, gap-filled forward-filled daily series, and OHLC resampling.

These are the batch counterparts of the streaming suite: the reference's
logs datasets (fetch_*_logs notebooks) are append-only event feeds, and a
production deployment needs the standard event-feed maintenance operators
(compact a changelog to current state, regularize an irregular series,
downsample to fixed bars) alongside the analytics ones in analytics.py.

Timestamps are handled as integer epoch-micros on BOTH engines
(``unix_micros`` / ``epoch_us``), so bucketing is exact regardless of
session time zone. No sums of doubles cross the oracle boundary: every
value column is a single selected value (arg_min/arg_max/min/max), which is
order-independent and exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DAY_US = 86_400_000_000
_BAR_US = 6 * 3_600_000_000  # 6-hour bars


@register(
    "cdc_changelog_compact",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_id AS seq,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value
      FROM events),
    agg AS (
      SELECT user_id,
             arg_max(op, seq)    AS last_op,
             arg_max(value, seq) AS last_value,
             max(seq)            AS last_seq,
             count(*)            AS n_changes
      FROM ch GROUP BY user_id)
    SELECT user_id, last_value, last_seq, n_changes
    FROM agg WHERE last_op <> 'D'
    """,
    doc="CDC changelog compaction: the event feed is read as an "
    "insert/update/delete changelog keyed by user_id (event_id = change "
    "sequence number; 'error' events model tombstones), and compacted to "
    "current state — last payload per key, keys whose final change is a "
    "delete dropped. ONE map-side-combined aggregate (max_by carries the "
    "payload with the watermark), no window, no self-join: at 100 TB this "
    "is a single shuffle on the key, the minimum any compaction can do. "
    "Mirrors the reference's append-dedup sink semantics "
    "(extractors/fetch_cdr_calls.py watermark append) extended with "
    "delete handling.",
)
def cdc_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    return (
        ch.groupBy("user_id")
        .agg(
            F.max_by("op", "seq").alias("last_op"),
            F.max_by("value", "seq").alias("last_value"),
            F.max("seq").alias("last_seq"),
            F.count("*").alias("n_changes"),
        )
        .filter(F.col("last_op") != "D")
        .drop("last_op")
    )


@register(
    "ts_gapfill_ffill",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day, max(value) AS v
      FROM events GROUP BY user_id, day),
    bounds AS (
      SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY user_id),
    allday AS (
      SELECT user_id, unnest(generate_series(lo, hi)) AS day FROM bounds),
    j AS (
      SELECT a.user_id, a.day, d.v
      FROM allday a LEFT JOIN daily d USING (user_id, day))
    SELECT user_id, day,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           v IS NULL AS is_gap
    FROM j
    """,
    doc="Gap-filled daily series with forward fill: per-user daily max "
    "value, the missing days materialized via sequence-explode between "
    "each user's first and last active day, then last-non-null carried "
    "forward (is_gap marks synthesized rows). The dense calendar is "
    "generated FROM the per-key bounds aggregate — no driver-side "
    "calendar, no cross join against a global date spine — so the explode "
    "is proportional to sum(per-key span), and the fill is one window "
    "sorted within the same hash partition the groupBy already created. "
    "Standard telemetry regularization the reference's pandas notebooks "
    "would do with DataFrame.resample()+ffill().",
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"), "value"
    )
    # one map-combined shuffle compacts raw events to (user, day) maxima;
    # the bounds branch re-derives from the same lineage, which Catalyst
    # prunes to a narrower (ts, user_id) scan — two projected scans of the
    # fact, each 2-3 columns, with everything after the compaction sized
    # by |users × active days|, not by raw events. (Exchange reuse cannot
    # kick in here: column pruning specializes each branch's aggregate, so
    # the subtrees no longer canonicalize identically — verified on the
    # executed plan. A caller looping many gap-fill variants would persist
    # `daily` instead.)
    daily = e.groupBy("user_id", "day").agg(F.max("value").alias("v"))
    allday = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    j = allday.join(daily, ["user_id", "day"], "left")
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return j.select(
        "user_id",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNull().alias("is_gap"),
    )


@register(
    "ts_resample_ohlc",
    oracle=f"""
    SELECT user_id,
           epoch_us(ts) // {_BAR_US}   AS bar,
           arg_min(value, event_id)    AS open_v,
           max(value)                  AS high_v,
           min(value)                  AS low_v,
           arg_max(value, event_id)    AS close_v,
           count(*)                    AS n_events
    FROM events
    GROUP BY user_id, bar
    """,
    doc="OHLC downsampling to fixed 6-hour bars per user: open/close via "
    "min_by/max_by on the event sequence number, high/low/count as plain "
    "aggregates — one map-side-combined groupBy, the canonical "
    "time-series rollup. All five outputs are selected single values "
    "(never float sums), so the oracle comparison is exact.",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_BAR_US}").alias("bar"),
        "event_id",
        "value",
    )
    return e.groupBy("user_id", "bar").agg(
        F.min_by("value", "event_id").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max_by("value", "event_id").alias("close_v"),
        F.count("*").alias("n_events"),
    )
