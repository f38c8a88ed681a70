"""Corpus-preparation operators (training-data pipeline extensions):
unicode/whitespace normalization, PII redaction, per-language corpus
statistics, corpus-wide n-gram counts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import NORMALIZE_SQL, normalize_text
from ..registry import register

NORM = NORMALIZE_SQL.format(x="text")


@register(
    "corpus_normalize",
    oracle=rf"""
    SELECT doc_id,
           regexp_replace({NORM}, '[^\x20-\x7eЀ-ӿ]', '', 'g') AS clean_text
    FROM documents
    """,
    doc="Text normalization: whitespace collapse + lowercase + strip of "
    "non-printable/control characters (printable ASCII and Cyrillic kept) "
    "— the first stage of a training-data cleaning pipeline.",
)
def corpus_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        normalize_text("text"), "[^\\x20-\\x7e\\u0400-\\u04FF]", ""
    )
    return d.select("doc_id", clean.alias("clean_text"))


@register(
    "corpus_pii_redact",
    oracle=r"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact: user' || doc_id || '@example.com +1-555-01'
                  || lpad(doc_id::VARCHAR, 2, '0') AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?\d[\d-]{7,}\d', '<PHONE>', 'g') AS redacted
    FROM dirty
    """,
    doc="PII redaction: email + phone patterns replaced with typed "
    "placeholder tokens (synthetic PII injected since testdata is clean); "
    "pure regexp_replace — codegen'd, shuffle-free.",
)
def corpus_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com +1-555-01"),
        F.lpad(F.col("doc_id").cast("string"), 2, "0"),
    )
    emails = F.regexp_replace(
        dirty, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"
    )
    phones = F.regexp_replace(emails, "\\+?\\d[\\d-]{7,}\\d", "<PHONE>")
    return d.select("doc_id", phones.alias("redacted"))


@register(
    "corpus_stats_by_lang",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           round(avg(n_chars), 4) AS avg_chars,
           round(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
           round(quantile_cont(n_chars, 0.95), 2) AS p95_chars,
           sum(len(string_split({NORM}, ' ')))::BIGINT AS total_tokens
    FROM documents GROUP BY lang
    """,
    doc="Per-language corpus statistics: doc counts, char volume, length "
    "percentiles, token totals — the dataset-card summary pass.",
)
def corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(normalize_text("text"), " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 2).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.95)), 2).alias("p95_chars"),
        F.sum(toks).alias("total_tokens"),
    )


@register(
    "corpus_top_bigrams",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split({NORM}, ' ') AS toks FROM documents),
    bg AS (
      SELECT toks[i] || ' ' || toks[i + 1] AS bigram
      FROM tok, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i))
    SELECT bigram, count(*) AS freq FROM bg
    GROUP BY bigram
    ORDER BY freq DESC, bigram LIMIT 25
    """,
    doc="Corpus-wide top-25 bigrams: position-explode + element_at "
    "assembly (NOT explode(transform(...)) — see pyspark generator "
    "re-evaluation note in operators/dedup.py), map-combined count, "
    "TakeOrdered top-k.",
)
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(normalize_text("text"), " ").alias("__toks"))
    positions = F.explode(
        F.when(
            F.size("__toks") >= 2, F.sequence(F.lit(1), F.size("__toks") - 1)
        ).otherwise(F.array().cast("array<int>"))
    )
    with_pos = toks.select("__toks", positions.alias("__i"))
    bigram = F.concat_ws(
        " ", F.element_at("__toks", F.col("__i")), F.element_at("__toks", F.col("__i") + 1)
    )
    return (
        with_pos.select(bigram.alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(25)
    )
