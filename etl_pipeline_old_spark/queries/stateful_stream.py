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


# NOT declared in the registry in any environment (r10 verdict #8): the
# Spark 4 transformWithState operator exists as a CAPABILITY
# (streaming/stateful.py stream_user_profile_tws) but its state-server
# wire format needs the 'protobuf' runtime, which pyspark's state
# clients consume through generated pb2 modules (descriptor pool +
# SerializeToString) — not shimmable without the real package, and pip
# is unavailable here. A conditional registration would make the
# registry's declared surface environment-dependent (the one phantom row
# r10 flagged), so the capability lives under
# tests/test_streaming_recovery.py instead: where protobuf exists the
# test value-checks it against the batch aggregate; here it asserts the
# documented loud ImportError. applyInPandasWithState
# (stream_stateful_running_totals above) is the supported custom-state
# path in this environment.
