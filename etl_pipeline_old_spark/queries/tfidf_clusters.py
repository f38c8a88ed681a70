"""Registry entries: manual TF-IDF (oracle-able, unlike hashed MLlib
vectors) and dedup clusters via connected components."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as DD
from ..operators.graph import connected_components
from ..registry import register
from .dedup_text import NORM, REACH_ORACLE_TEMPLATE, _minhash_oracle


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({NORM}, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
    doc="TF-IDF top-5 terms per document, computed with relational ops "
    "(tf per (doc,term), smoothed idf = ln((N+1)/(df+1)), window top-k) — "
    "the feature-extraction pass of a text pipeline, fully oracle-checked "
    "(hashed MLlib vectors wouldn't be).",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(DD.normalize_text("text"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = d.count()  # scalar, driver-side (one metadata-cheap action)
    # df rides a count-over-window on the AGGREGATED tf relation (exactly
    # one row per (doc, term), so rows-per-term == countDistinct docs):
    # the former separate groupBy(term) aggregate re-evaluated the whole
    # exploded token stream a second time and joined back (r14, guide
    # §2.3/§2.4 — one pass over the corpus-sized token stream instead of
    # two, and no join). Identical values and rounding.
    scored = tf.withColumn("df", F.count("*").over(W.partitionBy("term"))).select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "dedup_clusters",
    oracle=REACH_ORACLE_TEMPLATE.format(
        pairs_sql=_minhash_oracle(),
        select="SELECT node, component FROM comp",
    ),
    doc="Dedup clusters: transitive closure of MinHash-LSH near-dup pairs "
    "via iterative min-label propagation (one self-join + aggregate per "
    "iteration, stops at fixpoint) — verified against a recursive-CTE "
    "reachability oracle. Keep min(doc_id) per component, drop the rest.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_dedup(d, "text", "doc_id").select("id_a", "id_b")
    # verified pairs are row-distinct with id_a < id_b and already
    # checkpointed (materialize_release) — skip CC's input dedup (r15)
    return connected_components(pairs, edges_distinct=True)


@register(
    "dedup_apply",
    oracle=REACH_ORACLE_TEMPLATE.format(
        pairs_sql=_minhash_oracle(),
        select="""SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id NOT IN (
      SELECT node FROM comp WHERE node <> component)""",
    ),
    doc="Dedup APPLY: the corpus with every near-dup cluster reduced to "
    "its canonical (min doc_id) member — pairs → components → anti-join. "
    "The final step of the dedup chain; output is the deduped dataset.",
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_dedup(d, "text", "doc_id").select("id_a", "id_b")
    # distinct a<b pairs, already checkpointed — skip CC's input dedup (r15)
    comp = connected_components(pairs, edges_distinct=True)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return d.join(losers, "doc_id", "left_anti").select("doc_id", "lang")
