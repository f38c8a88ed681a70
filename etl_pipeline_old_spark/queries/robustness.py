"""Production-robustness operators: malformed-record tolerance on ingest.

The reference trusts its inputs (a malformed CSV row crashes the notebook);
a 100 TB pipeline cannot. Spark's PERMISSIVE mode quarantines bad records
into ``_corrupt_record`` instead of failing the job — this query ingests a
deliberately 10%-corrupted JSONL feed and reports the good/bad split.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "s3b_corrupt_json_tolerance",
    oracle="""
    SELECT count(CASE WHEN doc_id % 10 <> 3 THEN 1 END)::BIGINT AS good_rows,
           count(CASE WHEN doc_id % 10 = 3 THEN 1 END)::BIGINT AS corrupt_rows,
           sum(CASE WHEN doc_id % 10 <> 3 THEN n_chars ELSE 0 END)::BIGINT AS good_chars
    FROM documents
    """,
    doc="PERMISSIVE-mode ingest: a JSONL feed with every doc_id%10==3 row "
    "truncated mid-record parses without failing; bad rows land in "
    "_corrupt_record and are counted, good rows keep their values.",
)
def s3b_corrupt_json_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    feed = os.path.join(
        "/tmp/etl_pipeline_old_spark_cache",
        f"corrupt_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(feed, ignore_errors=True)
    os.makedirs(feed)
    with open(os.path.join(feed, "part-0.json"), "w") as f:
        for r in docs:
            line = json.dumps({"doc_id": r["doc_id"], "n_chars": r["n_chars"]})
            if r["doc_id"] % 10 == 3:
                line = line[: len(line) // 2]  # truncate mid-record
            f.write(line + "\n")

    parsed = (
        spark.read.schema("doc_id long, n_chars long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(feed)
    )
    bad = F.col("_corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.when(~bad, 1)).alias("good_rows"),
        F.count(F.when(bad, 1)).alias("corrupt_rows"),
        F.sum(F.when(~bad, F.col("n_chars")).otherwise(0)).alias("good_chars"),
    )
