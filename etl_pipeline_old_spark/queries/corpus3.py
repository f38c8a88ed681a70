"""Training-corpus curation operators, part 3: domain-targeted importance
weighting (DSIR-style hashed-gram log-likelihood ratios), the full Gopher
quality rule set, and language-mixture sampling weights.

All three are pure relational shapes (hashed-gram aggregations, array
expressions, one grouped pass) — no Python in the hot path, every one
value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as DD
from ..operators import similarity as SIM
from ..registry import register
from .similarity import QUANT_SCALE, _ivf_assign_cte

NORM = DD.NORMALIZE_SQL.format(x="text")
_H = DD.MD5_LONG_SQL

# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023): hashed word-bigram
# log-likelihood ratio of a target domain vs the raw corpus. Target domain
# here = the English subset (a real pipeline would join a curated target
# corpus — the shape is identical: two bucket-count aggregates + one
# broadcast join back onto the gram stream).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


@register(
    "corpus_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split({NORM}, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, lang,
             array_to_string(list_slice(toks, i, i + 1), ' ') AS sh
      FROM tok, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i)),
    gb AS (
      SELECT doc_id, lang, {_H.format(x="sh")} % {DSIR_BUCKETS} AS bucket FROM g),
    cr AS (SELECT bucket, count(*) AS cr_n FROM gb GROUP BY bucket),
    ct AS (SELECT bucket, count(*) AS ct_n FROM gb
           WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM gb) AS nr,
                   (SELECT count(*) FROM gb WHERE lang = '{DSIR_TARGET_LANG}') AS nt),
    wb AS (
      SELECT cr.bucket,
             ln((coalesce(ct.ct_n, 0) + 1) / (tot.nt + {DSIR_BUCKETS}.0))
               - ln((cr.cr_n + 1) / (tot.nr + {DSIR_BUCKETS}.0)) AS w
      FROM cr LEFT JOIN ct USING (bucket), tot)
    SELECT gb.doc_id,
           count(*) AS n_grams,
           round(sum(wb.w), 4) AS dsir_logratio
    FROM gb JOIN wb USING (bucket)
    GROUP BY gb.doc_id
    """,
    doc="DSIR-style importance weight per document: hashed word-bigram "
    f"(md5 % {DSIR_BUCKETS} buckets) log-likelihood ratio of the target "
    "domain (English subset) vs the raw corpus, add-1 smoothed. Two "
    "bucket-count aggregates (map-combined) + one broadcast of the "
    f"{DSIR_BUCKETS}-row weight table back onto the gram stream — the "
    "importance-resampling shape that scales to any corpus "
    "(cf. reference data-selection pipelines; hash-gram features make the "
    "target model fixed-size).",
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # lang rides THROUGH the explode instead of being joined back onto the
    # gram stream (r14): the former grams⋈documents join re-shuffled the
    # full gram stream against the full doc table — at 100 TB that join is
    # corpus-sized on both sides; carrying the column costs nothing
    # (guide §2.4: remove shuffles outright). Same gram multiset and
    # bucket values (same tokenize/explode/md5 algebra as shingle_sets
    # with distinct=False).
    toks = d.select(
        "doc_id", "lang", F.split(DD.normalize_text("text"), " ").alias("__toks")
    )
    positions = F.explode(
        F.when(
            F.size("__toks") >= 2, F.sequence(F.lit(1), F.size("__toks") - 1)
        ).otherwise(F.array().cast("array<int>"))
    )
    with_pos = toks.select("doc_id", "lang", "__toks", positions.alias("__i"))
    sh = F.concat_ws(
        " ", F.element_at("__toks", F.col("__i")), F.element_at("__toks", F.col("__i") + 1)
    )
    gb = with_pos.select(
        "doc_id", "lang", (DD.md5_long(sh) % DSIR_BUCKETS).alias("bucket")
    )
    # ONE map-combined aggregate produces both the raw and the target
    # bucket counts (the target count as a conditional sum — identical to
    # the former separate filtered aggregate left-joined back with
    # coalesce-0): the gram stream is now evaluated twice total (weights
    # pass + apply pass), the minimum without materializing it.
    counts = gb.groupBy("bucket").agg(
        F.count("*").alias("cr_n"),
        # when/otherwise (NOT a bare boolean cast): a NULL lang must count
        # 0 exactly like the former filter-then-count path dropped it
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("ct_n"),
    )
    whole = W.partitionBy()
    wb = (
        counts.withColumn("nr", F.sum("cr_n").over(whole))
        .withColumn("nt", F.sum("ct_n").over(whole))
        .select(
            "bucket",
            (
                F.log((F.col("ct_n") + 1) / (F.col("nt") + float(DSIR_BUCKETS)))
                - F.log((F.col("cr_n") + 1) / (F.col("nr") + float(DSIR_BUCKETS)))
            ).alias("w"),
        )
    )
    return (
        gb.join(F.broadcast(wb), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("w"), 4).alias("dsir_logratio"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Table A1) — the deterministic
# subset that applies to single-block documents. Repetition rules live in
# corpus_repetition_score (queries/corpus2.py).
# ---------------------------------------------------------------------------

# Gopher's rule demands >=2 distinct stopwords from a function-word list;
# calibrated to this corpus's vocabulary (same list text_quality_score
# uses — the real English list is a config knob, the shape is identical)
GOPHER_STOPWORDS = ("the", "a", "of", "and", "is")


@register(
    "corpus_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {NORM} AS txt, string_split({NORM}, ' ') AS toks
      FROM documents),
    m AS (
      SELECT doc_id, txt, toks,
             len(toks) AS n_words,
             list_sum(list_transform(toks, x -> length(x))) AS word_chars,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
             len(list_filter(list_distinct(toks),
                 x -> x IN {GOPHER_STOPWORDS})) AS n_stop,
             length(txt) - length(replace(txt, '#', '')) AS n_hash,
             (length(txt) - length(replace(txt, '...', ''))) // 3 AS n_ellipsis
      FROM t)
    SELECT doc_id,
           n_words,
           n_words BETWEEN 50 AND 100000 AS word_count_ok,
           word_chars / n_words BETWEEN 3.0 AND 10.0 AS mean_word_len_ok,
           n_alpha >= 0.8 * n_words AS alpha_ratio_ok,
           n_stop >= 2 AS stopwords_ok,
           n_hash <= 0.1 * n_words AS hash_ratio_ok,
           n_ellipsis <= 0.3 * n_words AS ellipsis_ratio_ok,
           (n_words BETWEEN 50 AND 100000)
             AND (word_chars / n_words BETWEEN 3.0 AND 10.0)
             AND (n_alpha >= 0.8 * n_words)
             AND (n_stop >= 2)
             AND (n_hash <= 0.1 * n_words)
             AND (n_ellipsis <= 0.3 * n_words) AS gopher_pass
    FROM m
    """,
    doc="Gopher quality rule set (word-count bounds, mean word length "
    "3-10, >=80%% alphabetic words, >=2 distinct stopwords, # and ... "
    "symbol ratios) as per-document booleans + overall pass — all "
    "integer/ratio comparisons, exact cross-engine. One projection, no "
    "shuffle: the cheapest possible quality gate at any corpus size.",
)
def corpus_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    txt = DD.normalize_text("text")
    toks = F.split(txt, " ")
    n_words = F.size(toks)
    word_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / 3
    word_count_ok = n_words.between(50, 100000)
    mean_word_len_ok = (word_chars / n_words).between(3.0, 10.0)
    alpha_ratio_ok = n_alpha >= 0.8 * n_words
    stopwords_ok = n_stop >= 2
    hash_ratio_ok = n_hash <= 0.1 * n_words
    ellipsis_ratio_ok = n_ellipsis <= 0.3 * n_words
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        word_count_ok.alias("word_count_ok"),
        mean_word_len_ok.alias("mean_word_len_ok"),
        alpha_ratio_ok.alias("alpha_ratio_ok"),
        stopwords_ok.alias("stopwords_ok"),
        hash_ratio_ok.alias("hash_ratio_ok"),
        ellipsis_ratio_ok.alias("ellipsis_ratio_ok"),
        (
            word_count_ok
            & mean_word_len_ok
            & alpha_ratio_ok
            & stopwords_ok
            & hash_ratio_ok
            & ellipsis_ratio_ok
        ).alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# language-mixture sampling weights (UniMax-style uniform target)
# ---------------------------------------------------------------------------


@register(
    "corpus_mix_weights",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    t AS (SELECT sum(n_docs) AS total, count(*) AS n_langs FROM c)
    SELECT c.lang, c.n_docs,
           round(least(1.0, (t.total / t.n_langs::DOUBLE) / c.n_docs), 6)
             AS sample_weight
    FROM c, t
    """,
    doc="Language-mixture sampling weights toward a uniform target "
    "(UniMax-style): per-language acceptance probability = min(1, "
    "fair_share / count). One grouped count + a scalar broadcast — "
    "applied downstream as a deterministic hash filter like "
    "corpus_stratified_sample.",
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    whole = W.partitionBy()
    return c.select(
        "lang",
        "n_docs",
        F.round(
            F.least(
                F.lit(1.0),
                (F.sum("n_docs").over(whole) / F.count("*").over(whole))
                / F.col("n_docs"),
            ),
            6,
        ).alias("sample_weight"),
    )

# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication over the embeddings table (shares
# the deterministic-IVF assignment CTEs with queries/similarity.py)
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.35  # non-vacuous on the synthetic embeddings: 68 intra-
# cluster pairs ≥ τ at sf0.01 (the corpus has no true near-dups; real
# corpora use τ ≈ 0.95+)


@register(
    "dedup_semantic",
    oracle=_ivf_assign_cte()
    + f""",
    sd_pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)
               AS cs
      FROM assign a
      JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id),
    dup AS (
      SELECT ib AS vec_id, min(ia) AS dup_of
      FROM sd_pairs WHERE cs >= {SEMDEDUP_TAU} GROUP BY ib)
    SELECT e.vec_id, d.dup_of, d.dup_of IS NULL AS kept
    FROM embeddings e LEFT JOIN dup d USING (vec_id)
    """,
    doc="SemDeDup-style semantic deduplication: deterministic-IVF cluster "
    "the embeddings, compare pairs only WITHIN a cluster, drop every "
    "vector with a smaller-id neighbor at cosine >= τ. Intra-cluster "
    "pairwise bounds the cross product by cluster size — the corpus-scale "
    "semantic-dedup shape (Abbas et al. 2023) — and the exact-integer "
    "quantizer makes the keep/drop decisions oracle-checkable.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, SEMDEDUP_TAU, scale=QUANT_SCALE)
