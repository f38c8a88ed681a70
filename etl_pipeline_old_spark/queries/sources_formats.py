"""Registry entries: additional file-format sources (ORC, XML, binaryFile,
wholetext).

The reference's ingress is CSV/JSON/DB-driven (e.g.
``/root/reference/extractors/fetch_gsheet_instructions.py:56-62`` CSV,
``fetch_yougile_tasks.py`` JSON), but a Spark-first engine gets the columnar
and semi-structured formats from the same DataFrameReader surface, so the
engine exposes them as first-class sources.  Each query stages a real copy of
the ``documents`` table in the target format with a distributed write (no
driver-side collect), reads it back through the engine, and is hash-checked
against the original parquet — so schema mapping, type fidelity, and
escaping are oracle-verified end-to-end.

Scale notes (100 TB): every stage+read here is a pure distributed write
followed by a pure distributed scan — file listing parallelizes across the
driver's listing threads, per-file work across executors.  binaryFile is the
scale path for multimodal ingestion (each image/audio blob = one file row);
``wholetext`` is only for small-document corpora (one file must fit in one
task's memory — that invariant is the same one the reference's
pandas-per-file model already assumes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..workdir import cache_root
from ..catalog import load_table
from ..registry import register



def _tag(sf_dir: str) -> str:
    # pid-free: reruns from ANY process overwrite the same path
    return os.path.basename(os.path.normpath(sf_dir))


@register(
    "s12_orc_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
    doc="ORC source: write documents as ORC (distributed), read back through "
    "spark.read.orc — columnar type mapping must roundtrip hash-equal.",
)
def s12_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    path = os.path.join(cache_root(), f"orc_docs_{_tag(sf_dir)}")
    d.write.mode("overwrite").orc(path)
    return spark.read.orc(path).select("doc_id", "text", "lang", "source", "n_chars")


@register(
    "s13_xml_roundtrip",
    oracle="SELECT doc_id, lang, source, n_chars FROM documents",
    doc="XML source (Spark 4 built-in spark-xml): write documents as "
    "<doc> rows, read back with rowTag — element naming, escaping, and "
    "numeric type inference are hash-checked. Text column excluded: XML "
    "whitespace normalization is not byte-stable for arbitrary payloads.",
)
def s13_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    path = os.path.join(cache_root(), f"xml_docs_{_tag(sf_dir)}")
    (
        d.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, source string, n_chars long")
        .load(path)
    )
    return back.select("doc_id", "lang", "source", "n_chars")


def _stage_one_file_per_doc(spark: SparkSession, sf_dir: str) -> str:
    """Stage documents as one text file per doc (dir partitioned by doc_id).

    Distributed write: ``partitionBy("doc_id")`` fans out one directory per
    document; each document is a single row, so each directory holds exactly
    one part file whose bytes are the UTF-8 text plus one trailing newline.
    This is the on-disk layout multimodal corpora use (one blob per object),
    staged without any driver materialization.
    """
    path = os.path.join(cache_root(), f"binfiles_{_tag(sf_dir)}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        d.write.mode("overwrite").partitionBy("doc_id").text(path)
    return path


@register(
    "s14_binaryfile_scan",
    oracle="""
    SELECT doc_id, octet_length(text::BLOB) + 1 AS n_bytes
    FROM documents
    """,
    doc="binaryFile source: one staged file per document, read via "
    "spark.read.format('binaryFile') — the multimodal blob-ingestion path "
    "(SURVEY.md multimodal plumbing). doc_id is recovered from the "
    "partition directory name; per-file length must equal the UTF-8 byte "
    "count of the text plus the one newline the text sink appends.",
)
def s14_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_one_file_per_doc(spark, sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return bf.select(
        F.regexp_extract("path", r"doc_id=(\d+)", 1).cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
    )


@register(
    "s15_wholetext_scan",
    oracle="SELECT doc_id, text AS content FROM documents",
    doc="wholetext source: each staged file read as ONE row (file-per-record "
    "semantics — the reference's pandas one-file-one-frame model, "
    "distributed). NOTE: wholetext must be passed as the ``text()`` kwarg — "
    "``.option('wholetext', True)`` is clobbered by the reader method's "
    "``wholetext=False`` default. The whole file INCLUDES the trailing "
    "newline the text sink appended, so it is stripped to recover the "
    "original text exactly; doc_id recovered from the file path.",
)
def s15_wholetext_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_one_file_per_doc(spark, sf_dir)
    wt = (
        spark.read.option("pathGlobFilter", "part-*")
        .option("recursiveFileLookup", "true")
        .text(path, wholetext=True)
    )
    return wt.select(
        F.regexp_extract(F.input_file_name(), r"doc_id=(\d+)", 1).cast("long").alias("doc_id"),
        # \z (absolute end) not $: Java $ also matches BEFORE a final line
        # terminator, so '\n$' would strip two trailing newlines from a doc
        # that itself ends with one — only the sink's delimiter must go
        F.regexp_replace(F.col("value"), "\\n\\z", "").alias("content"),
    )
