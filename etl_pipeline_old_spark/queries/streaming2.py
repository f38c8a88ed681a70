"""Registry entries: round-3 streaming additions (module loads last — see
queries/__init__ on driver-verification rotation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..streaming.stateful import stream_foreachbatch_upsert


@register(
    "stream_foreachbatch_upsert",
    oracle="SELECT event_id, user_id, event_type FROM events",
    doc="Exactly-once via foreachBatch sink-side merge: the event feed is "
    "staged TWICE (two micro-batches); each batch anti-joins the parquet "
    "target on event_id and appends only novel rows, so the replay batch "
    "writes nothing and the target equals the table exactly once — the "
    "idempotent-sink pattern for non-transactional stores, complementing "
    "stream_stateful_dedup's engine-state approach.",
)
def stream_foreachbatch_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_foreachbatch_upsert(spark, sf_dir)
