"""Training-corpus curation operators, part 2: the governance stages a
large-scale LLM data pipeline runs between cleaning and training —
benchmark-contamination detection, sequence packing, deterministic
stratified sampling, and per-language quota capping.

All four are pure relational shapes (shingle joins, window cumsums,
portable md5 hashing) — no Python in the hot path, every one
oracle-checked value-for-value against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as DD
from ..registry import register

NORM = DD.NORMALIZE_SQL.format(x="text")

# eval/benchmark membership: deterministic id rule (stand-in for joining a
# real benchmark table; the shape — tiny eval side, huge train side — holds)
EVAL_MOD = 37
CONTAM_N = 4  # word-n-gram length: at the testdata scale 4-grams flag a small,
# non-vacuous contaminated set (5-grams match ~1 doc; 3-grams over-flag)


@register(
    "corpus_contamination_check",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({NORM}, ' ') AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(toks, i, i + {CONTAM_N - 1}), ' ') AS sh
      FROM tok, UNNEST(generate_series(1, greatest(len(toks) - {CONTAM_N - 1}, 0))) AS u(i)),
    eval_sh AS (
      SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    hits AS (
      SELECT s.doc_id, count(*) AS n_shared_grams
      FROM sh s JOIN eval_sh e ON s.sh = e.sh
      WHERE s.doc_id % {EVAL_MOD} <> 0
      GROUP BY s.doc_id)
    SELECT doc_id, n_shared_grams FROM hits
    """,
    doc="Train/eval contamination check: training docs sharing any word-"
    f"{CONTAM_N}-gram with the benchmark set, with the shared-gram count. "
    "The eval shingle set is tiny (a benchmark suite) → broadcast; the "
    "train side streams one shingle pass — the 100 TB decontamination "
    "shape (cf. GPT-3/FineWeb n-gram decontamination).",
)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = DD.shingle_sets(d, "text", "doc_id", CONTAM_N)
    is_eval = F.col("id") % EVAL_MOD == 0
    eval_sh = sh.filter(is_eval).select("sh").distinct()
    train_sh = sh.filter(~is_eval)
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count("*").alias("n_shared_grams"))
    )


PACK_BUDGET = 2048
PACK_BUCKETS = 64


@register(
    "corpus_token_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
               % {PACK_BUCKETS} AS bucket,
             len(string_split({NORM}, ' '))::BIGINT AS n_tokens
      FROM documents)
    SELECT doc_id, bucket, n_tokens,
           ((sum(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens) // {PACK_BUDGET})::BIGINT
             AS pack_id
    FROM t
    """,
    doc=f"Sequence packing for training: docs are token-counted (word "
    f"proxy), hashed into {PACK_BUCKETS} md5 buckets, and packed into "
    f"{PACK_BUDGET}-token windows by start-offset (cumsum // budget). "
    "Bucketing keeps the ordered cumsum window PARALLEL (one partition "
    "per bucket, no global sort) — the scale-safe form of greedy packing; "
    "docs straddling a boundary overflow into the next pack by design.",
)
def corpus_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (DD.md5_long(F.col("doc_id").cast("string")) % PACK_BUCKETS).alias("bucket"),
        F.size(F.split(DD.normalize_text("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy("bucket").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    start_offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor(start_offset / PACK_BUDGET).alias("pack_id"),
    )


# per-language keep rates (‰): downsample the over-represented head, keep
# the tail — the standard corpus-rebalancing move
SAMPLE_PERMILLE = {"en": 300, "de": 800, "fr": 800, "es": 800, "zh": 800}
SAMPLE_DEFAULT_PERMILLE = 500


@register(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT % 1000
          < CASE lang
              {" ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_PERMILLE.items())}
              ELSE {SAMPLE_DEFAULT_PERMILLE} END
    """,
    doc="Deterministic stratified sampling: per-language keep rates "
    "applied via a portable md5-of-id hash (‰ threshold) — reproducible "
    "across engines and runs, no RNG state, embarrassingly parallel "
    "(pure filter, no shuffle).",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(SAMPLE_DEFAULT_PERMILLE)
    for k, v in SAMPLE_PERMILLE.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    keep = (DD.md5_long(F.col("doc_id").cast("string")) % 1000) < rate
    return d.filter(keep).select("doc_id", "lang")


QUOTA_PER_LANG = 80


@register(
    "corpus_lang_quota",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn <= {QUOTA_PER_LANG}
    """,
    doc=f"Per-language quota cap: keep the top {QUOTA_PER_LANG} docs per "
    "language by length (quality proxy), deterministic tiebreak — one "
    "window per group partition; at scale combine with a pre-aggregated "
    "per-group count to skip under-quota groups entirely.",
)
def corpus_lang_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QUOTA_PER_LANG)
        .select("doc_id", "lang")
    )


CHUNK_SIZE = 100  # words per chunk
CHUNK_STRIDE = 80  # start-to-start distance -> 20-word overlap


@register(
    "corpus_chunk_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({NORM}, ' ') AS toks FROM documents),
    starts AS (
      SELECT doc_id, toks, i AS start
      FROM tok, UNNEST(generate_series(1, greatest(len(toks), 1), {CHUNK_STRIDE})) AS u(i))
    SELECT doc_id,
           ((start - 1) // {CHUNK_STRIDE})::BIGINT AS chunk_idx,
           len(list_slice(toks, start, start + {CHUNK_SIZE - 1}))::BIGINT AS n_words,
           md5(array_to_string(list_slice(toks, start, start + {CHUNK_SIZE - 1}), ' '))
             AS chunk_hash
    FROM starts
    """,
    doc=f"Overlapping document chunking ({CHUNK_SIZE}-word windows, stride "
    f"{CHUNK_STRIDE} → {CHUNK_SIZE - CHUNK_STRIDE}-word overlap) — the "
    "RAG/context-window prep stage. Explodes a cheap arithmetic start "
    "sequence and slices tokens in a separate projection (the measured "
    "anti-O(n²) generator pattern); chunk text is hash-fingerprinted so "
    "the oracle compares values without shipping chunk bodies.",
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(DD.normalize_text("text"), " ").alias("__toks"))
    starts = F.explode(
        F.sequence(
            F.lit(1), F.greatest(F.size("__toks"), F.lit(1)), F.lit(CHUNK_STRIDE)
        )
    )
    with_start = toks.select("doc_id", "__toks", starts.alias("start"))
    chunk = F.slice(F.col("__toks"), F.col("start"), CHUNK_SIZE)
    return with_start.select(
        "doc_id",
        F.floor((F.col("start") - 1) / CHUNK_STRIDE).alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "corpus_repetition_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({NORM}, ' ') AS toks FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS g
      FROM tok, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i))
    SELECT doc_id,
           count(*)::BIGINT AS total_2grams,
           count(DISTINCT g)::BIGINT AS uniq_2grams,
           ((count(*) - count(DISTINCT g)) * 1000 // count(*))::BIGINT AS dup_permille
    FROM grams GROUP BY doc_id
    """,
    doc="Intra-document repetition score (Gopher-style quality rule): "
    "duplicate word-2-gram fraction per doc, reported in integer permille "
    "(floor division — exact in every engine, no float rounding surface). "
    "One shingle pass + one grouped distinct aggregate.",
)
def corpus_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(DD.normalize_text("text"), " ").alias("__toks"))
    # positions exploded separately from gram assembly (generator re-eval rule)
    pos = F.explode(
        F.when(
            F.size("__toks") >= 2, F.sequence(F.lit(1), F.size("__toks") - 1)
        ).otherwise(F.array().cast("array<int>"))
    )
    with_pos = toks.select("doc_id", "__toks", pos.alias("__i"))
    gram = F.concat_ws(
        " ", F.element_at("__toks", F.col("__i")), F.element_at("__toks", F.col("__i") + 1)
    )
    grams = with_pos.select("doc_id", gram.alias("g"))
    return grams.groupBy("doc_id").agg(
        F.count("*").alias("total_2grams"),
        F.countDistinct("g").alias("uniq_2grams"),
        F.floor(
            (F.count("*") - F.countDistinct("g")) * 1000 / F.count("*")
        ).alias("dup_permille"),
    )


# ------------------------------------------------ FIM transformation
# Fill-in-the-middle (Bavarian et al. 2022, the public OpenAI FIM paper;
# standard in code-model pretraining): a document is split into
# (prefix, middle, suffix) and re-serialized with sentinel tokens so the
# model learns infilling. Both public orderings are exercised — PSM
# (<PRE>prefix<SUF>suffix<MID>middle) and SPM (<PRE><SUF>suffix<MID>
# prefix middle... here the common PSM/SPM pair as published: SPM puts
# the suffix first so the cache is shared across completions).

_FIM_PRE, _FIM_SUF, _FIM_MID = "<|fim_pre|>", "<|fim_suf|>", "<|fim_mid|>"


@register(
    "corpus_fim_transform",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text, length(text) AS n,
             length(text) // 3 AS p1, (2 * length(text)) // 3 AS p2
      FROM documents),
    parts AS (
      SELECT doc_id, n,
             substr(text, 1, p1) AS pre,
             substr(text, p1 + 1, p2 - p1) AS mid,
             substr(text, p2 + 1) AS suf
      FROM s)
    SELECT doc_id,
      CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
      CASE WHEN doc_id % 2 = 0
           THEN '{_FIM_PRE}' || pre || '{_FIM_SUF}' || suf || '{_FIM_MID}' || mid
           ELSE '{_FIM_PRE}' || '{_FIM_SUF}' || suf || '{_FIM_MID}' || pre || mid
      END AS fim_text,
      CAST(n + {len(_FIM_PRE) + len(_FIM_SUF) + len(_FIM_MID)} AS BIGINT)
        AS n_chars
    FROM parts
    """,
    doc="Fill-in-the-middle transformation — the code-pretraining "
    "objective transform (public FIM recipe: split each document into "
    "prefix/middle/suffix at deterministic points, re-serialize with "
    "sentinel tokens). Both published orderings by doc parity: PSM "
    "(prefix-suffix-middle) and SPM (suffix-first, the shared-cache "
    "variant). Pure JVM substring/concat expressions — no Python, no "
    "shuffle, no join: the transform is map-only and the oracle "
    "rebuilds every transformed document character-for-character, "
    "including the invariant that FIM only reorders (output length = "
    "input + the three sentinels, checked per row). At 100 TB this "
    "composes with corpus_token_pack upstream of packing: a row-local "
    "transform that survives any partitioning.",
)
def corpus_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.length("text")
    p1 = (n / 3).cast("long")
    p2 = (n * 2 / 3).cast("long")
    pre = F.substring(F.col("text"), F.lit(1), p1)
    mid = F.col("text").substr(p1 + 1, p2 - p1)
    suf = F.col("text").substr(p2 + 1, n)
    psm = F.concat(
        F.lit(_FIM_PRE), pre, F.lit(_FIM_SUF), suf, F.lit(_FIM_MID), mid
    )
    spm = F.concat(
        F.lit(_FIM_PRE), F.lit(_FIM_SUF), suf, F.lit(_FIM_MID), pre, mid
    )
    sentinels = len(_FIM_PRE) + len(_FIM_SUF) + len(_FIM_MID)
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("psm"))
        .otherwise(F.lit("spm"))
        .alias("mode"),
        F.when(F.col("doc_id") % 2 == 0, psm).otherwise(spm).alias("fim_text"),
        (n + F.lit(sentinels)).cast("long").alias("n_chars"),
    )
