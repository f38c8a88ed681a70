"""Registry entries: Spark 4 API surfaces — VariantType semi-structured
extraction, ordered LISTAGG / MODE / MEDIAN aggregates, and a Python UDTF
(user-defined table function) extension point.

The reference's equivalents are pandas idioms: ``json.loads`` over a props
column, ``df.groupby().agg({'col': lambda s: ','.join(sorted(s))})``, and
ad-hoc row-expanding apply() loops.  Here each is the engine-native Spark 4
construct, with the aggregation staying JVM-side and only the UDTF (the
deliberate Python extension surface, SURVEY.md §2.12) crossing the
Arrow boundary.

Scale notes (100 TB):
- VariantType parses once into a binary-encoded variant; repeated
  ``variant_get`` calls are pointer chases, not re-parses — strictly better
  than N ``get_json_object`` re-parses of the same payload.
- listagg/median/mode are single-shuffle hash aggregates (median/mode keep
  per-group state; cardinality per group is the sizing concern, same as the
  reference's in-memory groupby).
- The UDTF path is the extension-point demo; ``posexplode(split(...))``
  (pure JVM generate) is the scale path for this particular expansion and
  is what the oracle models.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..catalog import load_table, load_tables
from ..registry import register


@register(
    "variant_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           upper(event_type) AS event_type
    FROM events
    """,
    doc="Spark 4 VariantType: parse_json(props) once into a binary variant, "
    "then typed variant_get extraction — the engine-native semi-structured "
    "path (vs the reference's per-row json.loads).",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_id", "event_type", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "long").alias("k"),
        F.upper("event_type").alias("event_type"),
    )


_AGG_SQL = """
SELECT lang,
       listagg(source, ',') WITHIN GROUP (ORDER BY source, doc_id) AS sources_csv,
       round(median(n_chars), 6) AS median_chars,
       mode(source, true) AS mode_source
FROM documents
GROUP BY lang
"""


@register(
    "agg_listagg_median_mode",
    oracle="""
    WITH c AS (
        SELECT lang, source, count(*) AS cnt FROM documents GROUP BY 1, 2
    ),
    m AS (
        SELECT lang, min(source) AS mode_source
        FROM c
        WHERE cnt = (SELECT max(cnt) FROM c c2 WHERE c2.lang = c.lang)
        GROUP BY lang
    )
    SELECT d.lang,
           string_agg(d.source, ',' ORDER BY d.source, d.doc_id) AS sources_csv,
           round(median(d.n_chars), 6) AS median_chars,
           any_value(m.mode_source) AS mode_source
    FROM documents d JOIN m ON d.lang = m.lang
    GROUP BY d.lang
    """,
    doc="Spark 4 ordered-set aggregates: LISTAGG WITHIN GROUP (ORDER BY), "
    "MEDIAN, and deterministic MODE (ties -> lowest value) in one hash "
    "aggregate. Oracle reproduces mode's tie-break with an explicit "
    "max-count/min-value CTE.",
)
def agg_listagg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("documents",), register_views=True)
    return spark.sql(_AGG_SQL)


@udtf(returnType="pos int, token string")
class WordExplode:
    """UDTF: one text row -> (position, token) rows, whitespace-tokenized.

    The Python table-function extension surface (Spark 4 ``@udtf``): eval()
    yields any number of output rows per input row.  Tokens match the
    DuckDB oracle's ``list_filter(regexp_split_to_array(text,'\\s+'))``.
    """

    def eval(self, text: str):  # noqa: D102 - contract per udtf
        if text is None:
            return
        pos = 0
        for tok in re.split(r"\s+", text):
            if tok:
                yield pos, tok
                pos += 1


@register(
    "udtf_word_explode",
    oracle="""
    SELECT doc_id,
           unnest(range(len(arr)))::INT AS pos,
           unnest(arr) AS token
    FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS arr
        FROM documents
        WHERE doc_id % 5 = 0
    )
    """,
    doc="Python UDTF (Spark 4 @udtf) row-expansion over a LATERAL join — "
    "the table-valued extension point. posexplode(split()) is the pure-JVM "
    "scale path for this particular expansion; the UDTF exists for logic "
    "Catalyst can't express.",
)
def udtf_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("documents",), register_views=True)
    spark.udtf.register("word_explode", WordExplode)
    return spark.sql(
        """
        SELECT d.doc_id, w.pos, w.token
        FROM documents d, LATERAL word_explode(d.text) w
        WHERE d.doc_id % 5 = 0
        """
    )


@register(
    "lateral_top3_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 3) t
    """,
    doc="Spark 4 DataFrame.lateralJoin: top-3 orders per customer via a "
    "correlated LATERAL subquery (outer() column references). Catalyst "
    "rewrites the correlated limit into a window/join plan — the "
    "DataFrame-native form of the per-group top-k the reference does with "
    "groupby().head() (datasets/create_scripts_dataset.ipynb) — and the "
    "oracle runs the equivalent SQL LATERAL on DuckDB.",
)
def lateral_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    top3 = (
        o.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(3)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )
    return c.lateralJoin(top3)


@register(
    "dq_observe_metrics",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(value), 2) AS total_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events
    """,
    doc="In-flight pipeline metrics via DataFrame.observe: the metrics "
    "(count, sum, min, max over events) are accumulated ON THE EXECUTORS "
    "while the same pass writes to a noop sink — zero extra scans, the "
    "Spark-native form of the reference's ad-hoc len(df) sanity prints. "
    "The observed values are returned as a one-row frame and value-checked "
    "against DuckDB computing the identical aggregates, proving the "
    "observation path reports exactly what a dedicated aggregation would.",
)
def dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    e = load_table(spark, sf_dir, "events")
    obs = Observation()
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )
    # one pass, no result materialization: the noop sink drives the scan,
    # the observation rides it
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (m["n_rows"], m["total_value"], m["min_value"], m["max_value"])
        ],
        "n_rows long, total_value double, min_value double, max_value double",
    )


@register(
    "pandas_api_migration",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="pandas API on Spark (pyspark.pandas): the reference's notebook "
    "idiom — read, groupby, agg, reset_index — written EXACTLY as pandas "
    "(datasets/create_scripts_dataset.ipynb groupby cells) but executing "
    "as a distributed Catalyst plan; .to_spark() hands the result to the "
    "DataFrame world. This is the drop-in migration path for the "
    "reference's users: same source, same syntax, cluster execution — "
    "value-checked against the SQL equivalent.",
)
def pandas_api_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import pyspark.pandas as ps

    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    # verbatim reference-notebook shape, on the distributed engine
    pdf = ps.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    g = pdf.groupby("o_orderpriority")["o_totalprice"]
    out = ps.concat(
        [g.count().rename("count"), g.sum().rename("sum"), g.mean().rename("mean")],
        axis=1,
    ).reset_index()
    sdf = out.to_spark()
    return sdf.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("count").cast("long").alias("n_orders"),
        F.round("sum", 2).alias("total"),
        F.round("mean", 2).alias("avg_price"),
    )
