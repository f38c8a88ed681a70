"""Registry entries: embedding similarity search over ``embeddings``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import similarity as SIM
from ..registry import register

QUERY_IDS = [0, 1, 2, 3, 4]
K = 10


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id IN {tuple(QUERY_IDS)}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]), 6)
               AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= {K}
    """,
    doc="Exact brute-force cosine top-10 for 5 query vectors: broadcast "
    "queries x streamed candidates (zip_with/aggregate fold, JVM-side), "
    "window top-k. The exactness baseline for the ANN path.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, QUERY_IDS, K)


@register(
    "ann_lsh_cosine_topk",
    oracle=None,  # hyperplane dot-product signs are float-sensitive; checked
    # against the exact baseline by recall tests instead (tests/test_llm_ops.py)
    doc="ANN top-10 via random-hyperplane LSH (8-bit sign buckets, seeded "
    "planes shipped as literals) + exact re-rank inside the bucket. At "
    "scale the bucketed table is pre-partitioned by bucket, replacing the "
    "cross product with per-bucket probes.",
)
def ann_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.lsh_topk(emb, QUERY_IDS, K, n_bits=5, n_tables=6)


@register(
    "ann_ivf_cosine_topk",
    oracle=None,  # KMeans centroids are iterative/fp-order-sensitive; recall
    # vs the exact baseline is asserted in tests/test_llm_ops.py
    doc="ANN top-10 via IVF coarse quantizer: KMeans(16) clusters the "
    "corpus, each query probes its 3 nearest centroids and re-ranks "
    "exactly — the partition-pruned ANN shape for 100 TB (cluster = "
    "partition key).",
)
def ann_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(emb, QUERY_IDS, K, n_clusters=16, n_probe=3)


# ---------------------------------------------------------------------------
# ANN recall measurement (VERDICT r1 #5): recall@k vs the exact baseline,
# computed in-plan. The LSH variant uses integer-quantized planes/vectors so
# every bucket bit is a sum of int64 products — bit-identical in any engine —
# making per-query recall VALUES oracle-checkable, not just row shapes.
# ---------------------------------------------------------------------------

QUANT_SCALE = 10_000
N_BITS = 5
N_TABLES = 6


def _lsh_recall_oracle() -> str:
    def table_bits(t: int) -> str:
        iplanes = SIM.quantize_planes(SIM.lsh_planes(N_BITS, 64, 42 + t), QUANT_SCALE)
        return " || ".join(
            "(CASE WHEN list_dot_product(q, ["
            + ", ".join(f"{int(p)}.0" for p in iplanes[i])
            + "]) >= 0 THEN '1' ELSE '0' END)"
            for i in range(N_BITS)
        )

    tables = "\n      UNION ALL\n".join(
        f"SELECT vec_id, {t} AS tbl, {table_bits(t)} AS bucket FROM base"
        for t in range(N_TABLES)
    )
    return f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> floor(x::DOUBLE * {QUANT_SCALE} + 0.5)) AS q
      FROM embeddings),
    b AS ({tables}),
    qq AS (
      SELECT vec_id AS query_id, tbl, bucket FROM b
      WHERE vec_id IN {tuple(QUERY_IDS)}),
    cand_pairs AS (
      SELECT DISTINCT qq.query_id, b.vec_id AS neighbor_id
      FROM b JOIN qq USING (tbl, bucket) WHERE b.vec_id <> qq.query_id),
    lsh_scored AS (
      SELECT p.query_id, p.neighbor_id,
             round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6)
               AS cos_sim
      FROM cand_pairs p
      JOIN embeddings qe ON qe.vec_id = p.query_id
      JOIN embeddings ne ON ne.vec_id = p.neighbor_id),
    lsh_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM lsh_scored)
      WHERE rank <= {K}),
    q2 AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id IN {tuple(QUERY_IDS)}),
    exact_scored AS (
      SELECT q2.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q2.qv::DOUBLE[], e.embedding::DOUBLE[]), 6)
               AS cos_sim
      FROM q2 JOIN embeddings e ON e.vec_id <> q2.query_id),
    exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM exact_scored)
      WHERE rank <= {K})
    SELECT e.query_id,
           count(l.neighbor_id)::BIGINT AS n_hits,
           count(l.neighbor_id) / {K}.0 AS recall_at_{K}
    FROM exact_top e
    LEFT JOIN lsh_top l
      ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@register(
    "ann_lsh_recall_at_10",
    oracle=_lsh_recall_oracle(),
    doc="Recall@10 of hyperplane-LSH ANN (5 bits x 6 tables, ~18%% probe "
    "fraction — the same candidate budget as IVF probe=3/16) vs the exact "
    "cosine top-10, per query, computed in-plan (no collect). "
    "Integer-quantized planes make the bucketing — and therefore the "
    "recall VALUES — exactly reproducible in the DuckDB oracle.",
)
def ann_lsh_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    approx = SIM.lsh_topk(
        emb, QUERY_IDS, K, n_bits=N_BITS, quantize_scale=QUANT_SCALE, n_tables=N_TABLES
    )
    exact = SIM.brute_force_topk(emb, QUERY_IDS, K)
    return SIM.recall_vs_exact(approx, exact, K)


@register(
    "ann_ivf_recall_at_10",
    oracle=None,  # KMeans centroids are iterative/fp-order-sensitive — no
    # SQL oracle can reproduce them; tests/test_llm_ops.py asserts a recall
    # floor instead (driver records a rows-only check)
    doc="Recall@10 of IVF(16, probe=3) ANN vs the exact cosine top-10, per "
    "query, computed in-plan.",
)
def ann_ivf_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    approx = SIM.ivf_topk(emb, QUERY_IDS, K, n_clusters=16, n_probe=3)
    exact = SIM.brute_force_topk(emb, QUERY_IDS, K)
    return SIM.recall_vs_exact(approx, exact, K)
