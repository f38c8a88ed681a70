"""Registry entries: stateful streaming operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..streaming.stateful import stream_dedup_exactly_once, stream_running_totals


@register(
    "stream_stateful_dedup",
    oracle="SELECT event_id, user_id, event_type FROM events",
    doc="Stateful streaming deduplication: the event feed is staged TWICE "
    "(two micro-batches); managed dedup state drops the replay, so the "
    "output equals the table exactly once — the streaming-native form of "
    "the reference's monotone-key incremental dedup "
    "(fetch_asterisk_cdr.py:39-58).",
)
def stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_dedup_exactly_once(spark, sf_dir)


@register(
    "stream_stateful_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState): per-user "
    "running (count, sum) carried as explicit state across micro-batches; "
    "final state equals the batch aggregate (hash-checked).",
)
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_running_totals(spark, sf_dir)


from ..streaming.stateful import transform_with_state_supported

if transform_with_state_supported():
    # Registered ONLY where the 'protobuf' package exists: Spark 4's
    # transformWithState state-server wire format needs it, and a registered
    # query must never hand the driver a guaranteed error row. In gated-off
    # environments tests/test_streaming_recovery.py still documents the
    # ImportError branch; applyInPandasWithState (above) is the supported
    # stateful path.

    @register(
        "stream_user_profile_tws",
        oracle="""
        SELECT user_id,
               (2 * count(*))::BIGINT AS n_events,
               min(epoch_us(ts)) AS first_us,
               max(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
        """,
        doc="Per-user profile via the Spark 4 transformWithState "
        "StatefulProcessor API (ValueState crossing 2 micro-batches over a "
        "doubled feed; RocksDB store). Integer-only outputs -> exact oracle.",
    )
    def stream_user_profile_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..streaming.stateful import stream_user_profile_tws as _tws

        return _tws(spark, sf_dir)
