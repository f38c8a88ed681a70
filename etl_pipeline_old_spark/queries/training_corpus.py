"""The north-star capstone: end-to-end training-corpus preparation.

Composes the engine's text-pipeline operators into the pass a 100 TB
pretraining-data pipeline runs: normalize → quality filter → exact-dedup
(keep the canonical copy) → language filter → deterministic train/test
split → per-(lang, split) manifest. Every stage is a shuffle-lean
relational op; the split is md5-hash-based so it is reproducible across
engines, runs, and cluster sizes (no rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import MD5_LONG_SQL, md5_long, normalize_text
from ..operators.text import quality_score
from ..registry import register
from .dedup_text import NORM

QUALITY_MIN = 0.55
TRAIN_PCT = 8  # of 10 hash buckets

_H_DOC = MD5_LONG_SQL.format(x="'split:' || doc_id::VARCHAR")


@register(
    "pipeline_training_corpus",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             {NORM} AS norm_text,
             round(0.5 * least(len(string_split({NORM}, ' ')) / 64.0, 1.0)
                 + 0.3 * (len(list_filter(string_split({NORM}, ' '),
                       x -> x IN ('the','a','of','and','is')))
                       / len(string_split({NORM}, ' ')))
                 + 0.2 * (CASE WHEN length({NORM})
                                    / len(string_split({NORM}, ' '))
                               BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END), 4)
               AS quality
      FROM documents),
    quality_pass AS (SELECT * FROM scored WHERE quality >= {QUALITY_MIN}),
    canonical AS (
      SELECT min(doc_id) AS doc_id FROM quality_pass GROUP BY md5(norm_text)),
    kept AS (
      SELECT q.* FROM quality_pass q JOIN canonical c ON q.doc_id = c.doc_id
      WHERE q.lang IN ('en', 'de', 'fr', 'es')),
    split AS (
      SELECT *, CASE WHEN {_H_DOC} % 10 < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS subset
      FROM kept)
    SELECT lang, subset,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           round(sum(quality), 4) AS sum_quality
    FROM split GROUP BY lang, subset
    """,
    doc="Capstone training-data pipeline: normalize → quality >= 0.55 → "
    "exact-dedup to the canonical (min doc_id) copy → language allowlist → "
    "deterministic md5-bucket 80/20 split → per-(lang, subset) manifest. "
    "One Catalyst plan; the only shuffles are the dedup hash-group and the "
    "final summary.",
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "n_chars",
        normalize_text("text").alias("norm_text"),
        quality_score("text").alias("quality"),
    ).filter(F.col("quality") >= QUALITY_MIN)

    canonical = (
        scored.groupBy(F.md5("norm_text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = scored.join(canonical, "doc_id", "left_semi").filter(
        F.col("lang").isin("en", "de", "fr", "es")
    )
    split_hash = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    split = kept.withColumn(
        "subset",
        F.when(split_hash % 10 < TRAIN_PCT, F.lit("train")).otherwise(F.lit("test")),
    )
    return split.groupBy("lang", "subset").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("quality"), 4).alias("sum_quality"),
    )


# ---------------------------------------------------------------------------
# SFT data prep: event log -> chat-template training rows

_MAX_TURNS = 8  # context cap per rendered conversation


@register(
    "sft_chat_render",
    oracle=f"""
    WITH conv AS (
      SELECT user_id,
             (list(struct_pack(event_id := event_id,
                               event_type := event_type)
                   ORDER BY ts, event_id))[1:{_MAX_TURNS}] AS evs,
             count(*) AS n_events
      FROM events GROUP BY user_id)
    SELECT user_id,
           least({_MAX_TURNS}, n_events)::INT AS n_turns,
           array_to_string(
             list_transform(evs, (x, i) ->
               (CASE WHEN (i - 1) % 2 = 0 THEN '<|user|>'
                     ELSE '<|assistant|>' END)
               || x.event_type || '#' || x.event_id || '<|end|>'),
             '') AS rendered,
           length(array_to_string(
             list_transform(evs, (x, i) ->
               (CASE WHEN (i - 1) % 2 = 0 THEN '<|user|>'
                     ELSE '<|assistant|>' END)
               || x.event_type || '#' || x.event_id || '<|end|>'),
             ''))::INT AS n_chars
    FROM conv
    """,
    doc="SFT data preparation: flatten the raw event log into "
    "chat-template training rows — one conversation per user, turns "
    "ordered by (ts, event_id), roles alternating user/assistant, "
    "rendered with special tokens (<|user|>/<|assistant|>/<|end|>) and "
    "capped at the context limit, the exact shape an instruction-tuning "
    "loader consumes. ONE Exchange total, skew-safe by construction: a "
    "row_number window enforces the context cap BEFORE any per-user "
    "buffer exists (the sort shuffle spills gracefully; a "
    "collect-then-slice would buffer a mega-user's whole history in one "
    "aggregation buffer — the skew OOM at 100 TB), then the groupBy "
    "reuses the window's partitioning and collects at most _MAX_TURNS "
    "rows per user for the in-row template rendering (indexed transform "
    "lambda — note Spark indexes 0-based where DuckDB is 1-based).",
)
def sft_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # context cap enforced BEFORE any per-user buffer materializes: the
    # row_number window sort-shuffles and SPILLS gracefully, where a
    # collect_list-then-slice would buffer a mega-user's entire history
    # in one aggregation buffer (the skew OOM at 100 TB). The groupBy
    # reuses the window's hash partitioning — still ONE Exchange.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    kept = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n_all", F.count("*").over(wu))
        .filter(F.col("rn") <= _MAX_TURNS)
    )
    conv = kept.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("rn", "event_id", "event_type"))
        ).alias("evs"),
        F.max("n_all").alias("n_events"),
    )
    rendered = F.concat_ws(
        "",
        F.transform(
            "evs",
            lambda x, i: F.concat(
                F.when(i % 2 == 0, F.lit("<|user|>")).otherwise(
                    F.lit("<|assistant|>")
                ),
                x["event_type"],
                F.lit("#"),
                x["event_id"].cast("string"),
                F.lit("<|end|>"),
            ),
        ),
    )
    return conv.select(
        "user_id",
        F.least(F.lit(_MAX_TURNS), F.col("n_events")).cast("int").alias("n_turns"),
        rendered.alias("rendered"),
        F.length(rendered).cast("int").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# DPO data prep: per-user preference pairs from the event log

_PAIR_K = 2  # events per side of a preference pair


@register(
    "sft_preference_pairs",
    oracle=f"""
    WITH conv AS (
      SELECT user_id,
             (list(struct_pack(event_id := event_id, event_type := event_type,
                               value := value)
                   ORDER BY value DESC, event_id DESC))[1:{_PAIR_K}] AS top,
             (list(struct_pack(event_id := event_id, event_type := event_type,
                               value := value)
                   ORDER BY value ASC, event_id ASC))[1:{_PAIR_K}] AS bot,
             count(*) AS n_events
      FROM events GROUP BY user_id HAVING count(*) >= {2 * _PAIR_K})
    SELECT user_id,
           array_to_string(list_transform(top,
             x -> 'evt#' || x.event_id || '@' || x.event_type), '|') AS chosen,
           array_to_string(list_transform(bot,
             x -> 'evt#' || x.event_id || '@' || x.event_type), '|') AS rejected,
           round(list_sum(list_transform(top, x -> x.value))
                 - list_sum(list_transform(bot, x -> x.value)), 2) AS margin,
           n_events::BIGINT AS n_events
    FROM conv
    """,
    doc="Post-training data prep, the DPO/RLHF companion to "
    "sft_chat_render: per user, the highest-value events form the "
    "'chosen' side and the lowest-value events the 'rejected' side of a "
    "preference pair, with the reward margin carried for "
    "margin-weighted losses (IPO/margin-DPO). Deterministic under "
    "duplicated reward values via the event_id tiebreak (descending on "
    "the chosen side — the reverse-of-ascending identity the oracle "
    "mirrors with ORDER BY value DESC, event_id DESC). Same skew-safe shape "
    "as the chat renderer: row_number windows rank both sides in one "
    "Exchange (two in-partition sorts) and everything outside the top/"
    "bottom K is dropped BEFORE aggregation, so no per-user buffer ever "
    "holds more than 2K rows — a mega-user spills in the sort instead "
    "of OOMing an aggregation buffer; users below 2K events are gated "
    "by the windowed count, no second pass.",
)
def sft_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )
    # same skew-safety as sft_chat_render: rank top/bottom K with
    # row_number windows (one Exchange, two in-partition sorts) and drop
    # everything else BEFORE aggregation, so no per-user buffer ever
    # holds more than 2K rows. n >= 2K guarantees the sides are disjoint.
    w_top = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").desc()
    )
    w_bot = Window.partitionBy("user_id").orderBy("value", "event_id")
    wu = Window.partitionBy("user_id")
    ranked = (
        e.withColumn("rn_top", F.row_number().over(w_top))
        .withColumn("rn_bot", F.row_number().over(w_bot))
        .withColumn("n_all", F.count("*").over(wu))
        .filter(F.col("n_all") >= 2 * _PAIR_K)
        .filter((F.col("rn_top") <= _PAIR_K) | (F.col("rn_bot") <= _PAIR_K))
    )
    side = lambda rn: F.when(
        F.col(rn) <= _PAIR_K,
        F.struct(F.col(rn).alias("rn"), "event_id", "event_type", "value"),
    )
    conv = ranked.groupBy("user_id").agg(
        F.sort_array(F.collect_list(side("rn_top"))).alias("top"),
        F.sort_array(F.collect_list(side("rn_bot"))).alias("bot"),
        F.max("n_all").alias("n_events"),
    )
    top = F.col("top")
    bot = F.col("bot")

    def render(side):
        return F.array_join(
            F.transform(
                side,
                lambda x: F.concat(
                    F.lit("evt#"),
                    x["event_id"].cast("string"),
                    F.lit("@"),
                    x["event_type"],
                ),
            ),
            "|",
        )

    def vsum(side):
        return F.aggregate(side, F.lit(0.0), lambda acc, x: acc + x["value"])

    return conv.select(
        "user_id",
        render(top).alias("chosen"),
        render(bot).alias("rejected"),
        F.round(vsum(top) - vsum(bot), 2).alias("margin"),
        "n_events",
    )
