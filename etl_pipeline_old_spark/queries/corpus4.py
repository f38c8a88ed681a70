"""Training-corpus curation operators, part 4: unigram-LM quality scoring
(perplexity-proxy filtering), cross-document boilerplate n-gram detection,
ANN hard-negative mining, and Z-order multi-dimensional layout keys.

Like the rest of the corpus family these are pure relational shapes —
hashed/gram aggregations, one broadcast join, window top-k — with every
output either integer-exact or rounded identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as DD
from ..operators import similarity as SIM
from ..registry import register
from .similarity import K, QUERY_IDS

NORM = DD.NORMALIZE_SQL.format(x="text")


# ---------------------------------------------------------------------------
# unigram-LM log-probability (perplexity-proxy quality filter): CCNet-style
# corpora rank documents by LM perplexity; the fully-relational stand-in is
# a unigram model trained on the corpus itself — token frequencies are one
# map-combined aggregate, and scoring is a broadcast join back onto the
# token stream. By Heaps' law the vocabulary grows ~O(corpus^0.5), so the
# frequency table stays broadcastable far past 100 TB of raw text.
# ---------------------------------------------------------------------------


@register(
    "corpus_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({NORM}, ' ')) AS sh FROM documents),
    freq AS (SELECT sh, count(*) AS cnt FROM tok GROUP BY sh),
    tot AS (SELECT sum(cnt) AS n_total FROM freq),
    scored AS (
      SELECT doc_id, ln(cnt) - ln(n_total) AS lp
      FROM tok JOIN freq USING (sh), tot)
    SELECT doc_id, count(*) AS n_tokens, round(avg(lp), 4) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="Unigram-LM mean log-probability per document (perplexity-proxy "
    "quality score, the relational stand-in for CCNet's LM filter): token "
    "frequencies over the whole corpus (one map-combined aggregate), "
    "broadcast back onto the token stream, averaged per document. "
    "Higher = more typical of the corpus; the low tail is the junk-file "
    "cut. Complements corpus_gopher_rules (rule-based) and "
    "corpus_dsir_weights (domain-targeted bigram ratio).",
)
def corpus_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = DD.shingle_sets(d, "text", "doc_id", n=1, distinct=False)
    freq = (
        tok.groupBy("sh")
        .agg(F.count("*").alias("cnt"))
        .withColumn("n_total", F.sum("cnt").over(W.partitionBy()))
    )
    scored = tok.join(F.broadcast(freq), "sh").select(
        F.col("id").alias("doc_id"),
        (F.log("cnt") - F.log("n_total")).alias("lp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# cross-document boilerplate n-grams: the gram-granularity half of exact
# substring dedup (Lee et al. 2022) — spans shared verbatim by many
# documents are navigation chrome / license headers / templates. Set
# semantics per document (a doc voting many times for its own repeated
# gram is within-doc repetition, handled by corpus_repetition_score).
# ---------------------------------------------------------------------------

BOILERPLATE_N = 3
BOILERPLATE_MIN_DOCS = 2


@register(
    "corpus_boilerplate_ngrams",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({NORM}, ' ') AS toks FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(toks, i, i + {BOILERPLATE_N - 1}), ' ') AS gram
      FROM tok, UNNEST(generate_series(1, greatest(len(toks) - {BOILERPLATE_N - 1}, 0)))
        AS u(i))
    SELECT gram, count(*) AS n_docs
    FROM g GROUP BY gram HAVING count(*) >= {BOILERPLATE_MIN_DOCS}
    """,
    doc=f"Cross-document boilerplate detection: word {BOILERPLATE_N}-grams "
    f"appearing verbatim in >= {BOILERPLATE_MIN_DOCS} distinct documents, "
    "with their document frequency — the candidate list an exact-substring "
    "dedup pass (Lee et al. 2022) would strip. One distinct-shingle "
    "explode + one count aggregate, both map-side combinable; at 100 TB "
    "the gram stream shuffles once on the gram hash, and the HAVING "
    "filter collapses the long unique tail before any further join.",
)
def corpus_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grams = DD.shingle_sets(d, "text", "doc_id", n=BOILERPLATE_N, distinct=True)
    return (
        grams.groupBy(F.col("sh").alias("gram"))
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


# ---------------------------------------------------------------------------
# ANN hard-negative mining: for each query vector, the most similar vectors
# with a DIFFERENT label — the contrastive-training companion of
# ann_cosine_topk (same broadcast + window top-k plan, plus the label
# predicate pushed into the join condition).
# ---------------------------------------------------------------------------


@register(
    "ann_hard_negatives",
    oracle=f"""
    WITH q2 AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id IN {tuple(QUERY_IDS)}),
    scored AS (
      SELECT q2.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q2.qv::DOUBLE[], e.embedding::DOUBLE[]), 6)
               AS cos_sim
      FROM q2 JOIN embeddings e ON e.label <> q2.qlabel)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= {K}
    """,
    doc=f"Hard-negative mining for contrastive training: top-{K} "
    "most-cosine-similar vectors whose label differs from the query's "
    "(similar-but-wrong examples). Queries broadcast against the corpus, "
    "label inequality evaluated inside the broadcast join, per-query "
    "top-k via one window — the exact plan shape of ann_cosine_topk, so "
    "the same LSH/IVF bucketed variants apply unchanged at scale.",
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = e.join(F.broadcast(q), F.col("label") != F.col("qlabel")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(SIM.cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= K
    )


# ---------------------------------------------------------------------------
# Z-order layout keys: interleave the bits of two scan dimensions so ONE
# sort order clusters BOTH — files written in z order carry tight min/max
# ranges on each dimension, and parquet row-group / file skipping prunes
# either predicate. The clustering benefit is asserted against real file
# footers in tests/test_storage_layout.py::test_zorder_layout_prunes_both_dims.
# ---------------------------------------------------------------------------

_Z_BITS = 16
_DAY_US = 86_400_000_000


def _zvalue_sql(x: str, y: str, shift: str, bits: int = _Z_BITS) -> str:
    """Bit-interleave SQL; ``shift`` formats one engine's shift syntax."""
    terms = []
    for i in range(bits):
        terms.append(shift.format(v=f"({shift.format(v=x, n=-i)} & 1)", n=2 * i))
        terms.append(shift.format(v=f"({shift.format(v=y, n=-i)} & 1)", n=2 * i + 1))
    return " + ".join(terms)


def _shift_duck(v: str, n: int) -> str:
    return f"({v} >> {-n})" if n < 0 else f"({v} << {n})"


def _shift_spark(v: str, n: int) -> str:
    return f"shiftright({v}, {-n})" if n < 0 else f"shiftleft({v}, {n})"


class _Fmt:
    def __init__(self, fn):
        self.fn = fn

    def format(self, v: str, n: int) -> str:
        return self.fn(v, n)


@register(
    "zorder_zvalue",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey,
             o_custkey AS x0,
             date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS y0
      FROM orders),
    base AS (
      SELECT o_orderkey,
             ((x0 - min(x0) OVER ()) * {1 << _Z_BITS})
               // (max(x0) OVER () - min(x0) OVER () + 1) AS x,
             ((y0 - min(y0) OVER ()) * {1 << _Z_BITS})
               // (max(y0) OVER () - min(y0) OVER () + 1) AS y
      FROM raw)
    SELECT o_orderkey, x, y,
           {_zvalue_sql("x", "y", _Fmt(_shift_duck))} AS z
    FROM base
    """,
    doc=f"Z-order (Morton) layout key over (o_custkey, order day): the low "
    f"{_Z_BITS} bits of each dimension interleaved into one sort key with "
    "pure integer shift/mask arithmetic (codegen'd, no UDF). Writing "
    "files sorted by z bounds the per-file min/max range of BOTH columns "
    "at once — the standard multi-dimensional clustering trick (Delta "
    "OPTIMIZE ZORDER) that makes parquet skipping effective for either "
    "predicate; a 1-D sort can only prune its own column.",
)
def zorder_zvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("x0"),
        # epoch-day as an integer, time-zone independent (o_orderdate is
        # TIMESTAMP_NTZ here; unix_micros would need a tz-cast)
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("y0"),
    )
    # scale each dimension to the full 2^bits range via its global min/max
    # (integer arithmetic, exact in both engines): interleaving only
    # clusters well when the dims occupy ALIGNED bit widths — a 150-value
    # custkey against a 2400-day date range would otherwise let the wider
    # dim's high bits dominate the curve. Same idea as Delta OPTIMIZE
    # ZORDER's range-ID normalization, done with deterministic bounds. At
    # 100 TB you would pass known fixed anchors instead and keep the key
    # computation embarrassingly parallel.
    whole = W.partitionBy()
    bounded = raw.select(
        "o_orderkey",
        "x0",
        "y0",
        F.min("x0").over(whole).alias("x_lo"),
        F.max("x0").over(whole).alias("x_hi"),
        F.min("y0").over(whole).alias("y_lo"),
        F.max("y0").over(whole).alias("y_hi"),
    )
    # integer `div`, NOT `/`: float division + cast would diverge from the
    # oracle's integer `//` at representation boundaries
    base = bounded.select(
        "o_orderkey",
        F.expr(f"((x0 - x_lo) * {1 << _Z_BITS}) div (x_hi - x_lo + 1)").alias("x"),
        F.expr(f"((y0 - y_lo) * {1 << _Z_BITS}) div (y_hi - y_lo + 1)").alias("y"),
    )
    return base.withColumn(
        "z", F.expr(_zvalue_sql("x", "y", _Fmt(_shift_spark)))
    )
