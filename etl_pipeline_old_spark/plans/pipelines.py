"""Reference notebook pipelines over the testdata analogs.

The reference executes each notebook cell-by-cell with a fully materialized
pandas frame between cells (SURVEY.md §3.3). Here each pipeline is ONE lazy
DataFrame chain: Catalyst fuses scan→project→broadcast-joins→derive→filter
into a single whole-stage-codegen'd pass over the fact table, so the same
code runs at 100 TB with the fact side never leaving its partitions
(dims broadcast, no fact shuffle until the final aggregate).

Analog mapping (FIXTURES.md): logs→lineitem, plugin→part, ad_user→customer,
plugin dim payloads→(p_brand,p_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import joins as J

# bim_users literal-set analog (ref: create_logs_dataset.ipynb:119-131 —
# 17 Cyrillic display names; here: part brands)
BIM_BRANDS = ("Brand#13", "Brand#19", "Brand#5")


def logs_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_logs_dataset.ipynb re-expressed (SURVEY.md §7 phase-0 slice).

    Reference chain (datasets/create_logs_dataset.ipynb): read CSVs (:45-47)
    → drop columns (:65-69) → logs⟕plugin twice for display_name then
    developer (:87-101) → is_bim flag via isin (:119-131) → split into
    bim/designers (:149-150) → per-split loads. Here: parquet scan → ONE
    broadcast join pulling both payload columns → flag → aggregate per
    (flag, brand).
    """
    logs = load_table(spark, sf_dir, "lineitem")  # fact ("plugin usage log")
    plugin = load_table(spark, sf_dir, "part")  # dim ("plugin")

    enriched = J.enrich(
        logs,
        plugin,
        {"l_partkey": "p_partkey"},
        {"p_brand": "plugin_brand", "p_type": "plugin_type"},
    )
    flagged = enriched.withColumn("is_bim", F.col("plugin_brand").isin(*BIM_BRANDS))
    return (
        flagged.groupBy("is_bim", "plugin_brand")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


LOGS_PIPELINE_ORACLE = f"""
SELECT p.p_brand IN {BIM_BRANDS} AS is_bim,
       p.p_brand AS plugin_brand,
       count(*) AS n_events,
       round(sum(l.l_quantity), 2) AS total_qty
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2
"""
