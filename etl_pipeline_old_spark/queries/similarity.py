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
    return SIM.lsh_topk(emb, QUERY_IDS, K, n_bits=8)


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
