"""Registry entries: embedding similarity search over ``embeddings``.

All ANN entries here are VALUE-oracle-checked: integer quantization
(floor(x·10⁴ + 0.5)) turns every hash/assignment decision into exact int64
arithmetic that DuckDB reproduces bit-for-bit, so candidate sets, top-k
neighbors, and recall values — not just row shapes — cross-check. The
float-trained KMeans IVF stays in operators/similarity.py as the
production trainer (recall floor asserted in tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import similarity as SIM
from ..registry import register

QUERY_IDS = [0, 1, 2, 3, 4]
K = 10

QUANT_SCALE = 10_000
N_BITS = 5
N_TABLES = 6


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB) — mirror the quantized Spark operators exactly
# ---------------------------------------------------------------------------


def _table_bits(n_bits: int, seed: int) -> str:
    """Bit-string bucket from integer-quantized planes, over ``q`` (the
    quantized vector list). Integer-valued doubles stay exact in
    list_dot_product (|terms| ≪ 2^53), so the sign bits match Spark's
    int64 fold."""
    iplanes = SIM.quantize_planes(SIM.lsh_planes(n_bits, 64, seed), QUANT_SCALE)
    return " || ".join(
        "(CASE WHEN list_dot_product(q, ["
        + ", ".join(f"{int(p)}.0" for p in iplanes[i])
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for i in range(n_bits)
    )


_BASE_CTE = f"""
    base AS (
      SELECT vec_id, embedding,
             list_transform(embedding, x -> floor(x::DOUBLE * {QUANT_SCALE} + 0.5)) AS q
      FROM embeddings)"""


def _lsh_candidates_cte() -> str:
    """CTEs base → b (bucket rows, N_TABLES tables) → qq → cand_pairs."""
    tables = "\n      UNION ALL\n".join(
        f"SELECT vec_id, {t} AS tbl, {_table_bits(N_BITS, 42 + t)} AS bucket FROM base"
        for t in range(N_TABLES)
    )
    return f"""
    WITH {_BASE_CTE},
    b AS ({tables}),
    qq AS (
      SELECT vec_id AS query_id, tbl, bucket FROM b
      WHERE vec_id IN {tuple(QUERY_IDS)}),
    cand_pairs AS (
      SELECT DISTINCT qq.query_id, b.vec_id AS neighbor_id
      FROM b JOIN qq USING (tbl, bucket) WHERE b.vec_id <> qq.query_id)"""


_RERANK = f"""
    scored AS (
      SELECT p.query_id, p.neighbor_id,
             round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6)
               AS cos_sim
      FROM cand_pairs p
      JOIN embeddings qe ON qe.vec_id = p.query_id
      JOIN embeddings ne ON ne.vec_id = p.neighbor_id),
    approx_top AS (
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= {K})"""

_EXACT_TOP = f"""
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
      WHERE rank <= {K})"""

_RECALL_SELECT = f"""
    SELECT e.query_id,
           count(a.neighbor_id)::BIGINT AS n_hits,
           count(a.neighbor_id) / {K}.0 AS recall_at_{K}
    FROM exact_top e
    LEFT JOIN approx_top a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id"""


def _ivf_assign_cte() -> str:
    """CTEs reproducing ivf_assign_quantized: integer centroid sums over
    LSH-seeded groups, one exact-int Lloyd refinement (distance comparison
    sum((n·q_d - s_d)²)/n²), assignment via row_number. Ends at assign
    (vec_id, cluster)."""
    grp_bits = _table_bits(SIM.IVF_GRP_BITS, SIM.IVF_GRP_SEED)
    return f"""
    WITH {_BASE_CTE},
    b AS (SELECT vec_id, q, {grp_bits} AS grp FROM base),
    bu AS (
      SELECT vec_id, grp,
             unnest(q)::BIGINT AS qd,
             generate_subscripts(q, 1) AS d
      FROM b),
    cent0 AS (
      SELECT grp, d, sum(qd)::BIGINT AS s, count(*)::BIGINT AS n
      FROM bu GROUP BY grp, d),
    dist0 AS (
      SELECT bu.vec_id, c.grp,
             sum((c.n * bu.qd - c.s) * (c.n * bu.qd - c.s))::DOUBLE
               / (max(c.n) * max(c.n))::DOUBLE AS dd
      FROM bu JOIN cent0 c ON c.d = bu.d
      GROUP BY bu.vec_id, c.grp),
    assign AS (
      SELECT vec_id, grp AS cluster FROM (
        SELECT vec_id, grp,
               row_number() OVER (PARTITION BY vec_id ORDER BY dd, grp) AS rn
        FROM dist0)
      WHERE rn = 1)"""


def _ivf_candidates_cte(n_probe: int = 3) -> str:
    """_ivf_assign_cte + probes by the refined partition's own means +
    candidate pairs."""
    return _ivf_assign_cte() + f""",
    bu1 AS (
      SELECT bu.vec_id, a.cluster, bu.qd, bu.d
      FROM bu JOIN assign a ON a.vec_id = bu.vec_id),
    cent1 AS (
      SELECT cluster, d, sum(qd)::BIGINT AS s, count(*)::BIGINT AS n
      FROM bu1 GROUP BY cluster, d),
    dist1 AS (
      SELECT bu.vec_id, c.cluster,
             sum((c.n * bu.qd - c.s) * (c.n * bu.qd - c.s))::DOUBLE
               / (max(c.n) * max(c.n))::DOUBLE AS dd
      FROM bu JOIN cent1 c ON c.d = bu.d
      WHERE bu.vec_id IN {tuple(QUERY_IDS)}
      GROUP BY bu.vec_id, c.cluster),
    probes AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY dd, cluster) AS rn
        FROM dist1)
      WHERE rn <= {n_probe}),
    cand_pairs AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a USING (cluster)
      WHERE a.vec_id <> p.query_id)"""


def _lsh_topk_oracle() -> str:
    return (
        _lsh_candidates_cte()
        + ","
        + _RERANK
        + "\n    SELECT query_id, neighbor_id, cos_sim, rank FROM approx_top"
    )


def _lsh_recall_oracle() -> str:
    return _lsh_candidates_cte() + "," + _RERANK + "," + _EXACT_TOP + _RECALL_SELECT


def _ivf_topk_oracle() -> str:
    return (
        _ivf_candidates_cte()
        + ","
        + _RERANK
        + "\n    SELECT query_id, neighbor_id, cos_sim, rank FROM approx_top"
    )


def _ivf_recall_oracle() -> str:
    return _ivf_candidates_cte() + "," + _RERANK + "," + _EXACT_TOP + _RECALL_SELECT


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


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
    oracle=_lsh_topk_oracle(),
    doc="ANN top-10 via random-hyperplane LSH (5-bit sign buckets x 6 "
    "OR-amplified tables, seeded integer-quantized planes shipped as "
    "literals) + exact cosine re-rank inside the candidate set. Integer "
    "quantization makes the bucketing — and so the top-k VALUES — exactly "
    "reproducible in the DuckDB oracle. At scale the bucketed table is "
    "pre-partitioned by (tbl, bucket), replacing the cross product with "
    "per-bucket probes.",
)
def ann_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.lsh_topk(
        emb, QUERY_IDS, K, n_bits=N_BITS, quantize_scale=QUANT_SCALE, n_tables=N_TABLES
    )


@register(
    "ann_ivf_cosine_topk",
    oracle=_ivf_topk_oracle(),
    doc="ANN top-10 via IVF: a deterministic coarse quantizer (one exact-"
    "integer averaging step over 16 LSH-seeded groups — see "
    "ivf_topk_quantized) clusters the corpus; each query probes its 3 "
    "nearest centroids and re-ranks exactly — the partition-pruned ANN "
    "shape for 100 TB (cluster = partition key). Deterministic training "
    "makes the assignments, probes, and top-k VALUES oracle-checkable; "
    "the seeded-KMeans trainer remains the production path "
    "(tests/test_llm_ops.py).",
)
def ann_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk_quantized(emb, QUERY_IDS, K, n_probe=3, scale=QUANT_SCALE)


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
    oracle=_ivf_recall_oracle(),
    doc="Recall@10 of deterministic-IVF(16, probe=3) ANN vs the exact "
    "cosine top-10, per query, computed in-plan; recall VALUES are "
    "oracle-checked thanks to the exact-integer coarse quantizer.",
)
def ann_ivf_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    approx = SIM.ivf_topk_quantized(emb, QUERY_IDS, K, n_probe=3, scale=QUANT_SCALE)
    exact = SIM.brute_force_topk(emb, QUERY_IDS, K)
    return SIM.recall_vs_exact(approx, exact, K)


# NOTE: dedup_semantic (SemDeDup over these CTEs) is registered in
# queries/corpus3.py — round-3 modules load last so the driver's capped
# verification prefix reaches older never-checked queries first.
