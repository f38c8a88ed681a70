"""Registry entries: dataloader-facing corpus layout — deterministic
epoch shuffling and shard manifests.

The last mile of a training-data pipeline (after curation/dedup/split):
every trainer needs (a) a per-epoch permutation that is reproducible
across retries, engines, and restarts, and (b) a per-shard manifest the
dataloader consumes to schedule work. Both are pure hash/window algebra
— the same portable md5 arithmetic the split/sampling queries use
(ref: the reference's notebooks stop at CSV export, e.g.
/root/reference/datasets/create_yougile_dataset.ipynb; this is the
Spark-scale continuation of that hand-off).

Scale: the shuffle key is per-row arithmetic and the position window
partitions by (epoch, shard) — there is NO global sort. A global
row_number over the whole corpus would serialize 100 TB through one
partition; per-shard windows keep every partition at corpus/N_SHARDS and
the write is `partitionBy(epoch, shard)` with sortWithinPartitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..operators.dedup import MD5_LONG_SQL, md5_long
from ..operators import text as TX
from ..registry import register

N_SHARDS = 8
N_EPOCHS = 2


@register(
    "corpus_epoch_shuffle",
    oracle=f"""
    WITH epochs AS (
      SELECT unnest(range({N_EPOCHS})) AS epoch),
    keyed AS (
      SELECT e.epoch, d.doc_id,
             {MD5_LONG_SQL.format(x="'shard:' || d.doc_id::VARCHAR")}
               % {N_SHARDS} AS shard,
             {MD5_LONG_SQL.format(
                 x="'epoch:' || e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR")}
               AS ord
      FROM documents d CROSS JOIN epochs e)
    SELECT epoch, shard,
           row_number() OVER (
             PARTITION BY epoch, shard ORDER BY ord, doc_id) AS pos,
           doc_id
    FROM keyed
    """,
    doc="Deterministic epoch shuffle: each epoch gets an independent "
    "pseudo-random permutation via md5('epoch:'||e||':'||doc_id), sharded "
    "by a stable doc hash, positions assigned per (epoch, shard) window. "
    "Reproducible across retries/engines/restarts (no rand()); no global "
    "sort — the window partitions by shard, so 100 TB sorts as N_SHARDS "
    "independent corpus/N streams written with partitionBy(epoch, shard).",
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    epochs = spark.range(N_EPOCHS).select(F.col("id").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        (
            md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
            % N_SHARDS
        ).alias("shard"),
        md5_long(
            F.concat(
                F.lit("epoch:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("ord"),
    )
    w = W.partitionBy("epoch", "shard").orderBy("ord", "doc_id")
    return keyed.select(
        "epoch",
        "shard",
        F.row_number().over(w).alias("pos"),
        "doc_id",
    )


@register(
    "corpus_shard_manifest",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             {MD5_LONG_SQL.format(x="'shard:' || doc_id::VARCHAR")}
               % {N_SHARDS} AS shard,
             len(string_split(
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
               AS n_tok
      FROM documents)
    SELECT shard,
           count(*)::BIGINT AS n_docs,
           sum(n_tok)::BIGINT AS total_tokens,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM keyed GROUP BY shard
    """,
    doc="Shard manifest: per-shard doc/token totals and id bounds — the "
    "sidecar a dataloader reads to schedule shards without scanning data. "
    "One map-combined aggregate over the stable shard hash; at 100 TB "
    "this runs as a metadata pass per refresh and pairs with "
    "corpus_epoch_shuffle's partitionBy(epoch, shard) layout.",
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        (
            md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
            % N_SHARDS
        ).alias("shard"),
        TX.token_count_ws("text").alias("n_tok"),
    )
    return keyed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


TRAIN_BUCKETS = 8  # of 10


@register(
    "corpus_group_split",
    oracle=f"""
    WITH assigned AS (
      SELECT event_id, user_id,
             CASE WHEN {MD5_LONG_SQL.format(
                 x="'gsplit:' || user_id::VARCHAR")} % 10 < {TRAIN_BUCKETS}
                  THEN 'train' ELSE 'test' END AS subset
      FROM events)
    SELECT subset,
           count(*)::BIGINT AS n_rows,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM assigned GROUP BY subset
    """,
    doc="Group-aware train/test split: the subset is a hash of the GROUP "
    "key (user_id), not the row, so every event of a user lands in one "
    "subset — the leakage-safe split for behavioral data, where row-level "
    "splitting puts the same identity on both sides and inflates eval. "
    "Stateless per-row arithmetic (no shuffle for the assignment itself); "
    "tests/test_group_split.py asserts no user crosses subsets (train + "
    "test distinct-user counts sum to the global distinct count).",
)
def corpus_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    subset = F.when(
        md5_long(F.concat(F.lit("gsplit:"), F.col("user_id").cast("string"))) % 10
        < TRAIN_BUCKETS,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return (
        e.select("event_id", "user_id", subset.alias("subset"))
        .groupBy("subset")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
