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
