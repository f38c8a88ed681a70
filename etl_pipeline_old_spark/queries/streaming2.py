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


@register(
    "stream_dedup_within_watermark",
    oracle="SELECT event_id, user_id, event_type FROM events",
    doc="Bounded-state streaming dedup: dropDuplicatesWithinWatermark over "
    "the twice-staged feed. Unlike plain dropDuplicates (state grows with "
    "all-time distinct keys), seen-key state is evicted when the watermark "
    "passes event-time + 90d — the dedup that survives an unbounded stream. "
    "Testdata spans 30d, so the result equals exact global dedup.",
)
def stream_dedup_within_watermark_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import stream_dedup_within_watermark

    return stream_dedup_within_watermark(spark, sf_dir)
