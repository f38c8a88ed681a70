"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): brute-force cosine top-k as the
exact baseline, and a random-hyperplane LSH bucketed variant as the scale
path — at 100 TB the bucket join replaces the all-pairs cross product with
per-bucket candidate sets.

All vector math stays in JVM expressions (``zip_with`` + ``aggregate``
fold) — no Python UDF in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right fold (deterministic order — matches a
    sequential oracle implementation bit-for-bit in practice)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_arr(vals) -> Column:
    """One array literal in ONE py4j call.

    ``F.array(*[F.lit(v) for v in vals])`` costs 2·len(vals) py4j
    round-trips per plane row; with 6 tables x 5 bits x 64 dims that is
    ~4 s of driver-side plan construction per ANN query (measured r14).
    ``F.lit(list)`` builds the same array-of-foldable-literals expression
    JVM-side in one call; element types match the scalar form (int ->
    IntegerType, float -> DoubleType), so the arithmetic — and the
    oracle-checked values — are unchanged.
    """
    return F.lit(list(vals))


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """``dot(a,b) / (norm_a * norm_b)`` with the norms precomputed.

    Identical IEEE result to :func:`cosine` when ``norm_a``/``norm_b``
    carry ``norm(a)``/``norm(b)`` (same fold, same multiply order) — but
    computed once per VECTOR instead of once per candidate PAIR: in a
    probe joining q queries against c candidates the norm folds drop from
    2·q·c to q + c evaluations (guide §2.3 "don't recompute in the pair
    stage what is per-row").
    """
    return dot(a, b) / (norm_a * norm_b)


def brute_force_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against all vectors.

    The candidate side streams (one pass, no shuffle); only the final
    top-k window shuffles (query_id, k) rows. Scale: O(n_q · N) dot
    products, embarrassingly parallel across partitions.
    """
    q = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    cand = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    pairs = cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"), "inner")
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_with_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_planes(n_bits: int = 8, dim: int = 64, seed: int = 42) -> np.ndarray:
    """Seeded-deterministic random hyperplanes (shared with the DuckDB
    oracle, which embeds the same numbers as literals)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim)


def quantize_planes(planes: np.ndarray, scale: int) -> np.ndarray:
    """Integerize planes with round-half-up: floor(p*scale + 0.5) — an
    operation every engine computes identically on IEEE doubles."""
    return np.floor(planes * scale + 0.5).astype(np.int64)


def _bucket_expr(
    vec_col: str,
    n_bits: int,
    dim: int,
    seed: int,
    quantize_scale: int | None,
    quantized_col: Column | None = None,
) -> Column:
    """Bit-string bucket for one LSH table (one plane set).

    Plane rows enter the plan as single array literals (:func:`_lit_arr`)
    — same values, ~130x fewer py4j calls per bit. When
    ``quantized_col`` is given it must carry the floor(x*scale + 0.5)
    quantization of ``vec_col``; passing it pre-projected means the
    quantization transform is evaluated once per row instead of once per
    BIT (the fold is a CodegenFallback expression, so common-subexpression
    elimination never rescues the inline form).
    """
    if quantize_scale is None:
        planes = lsh_planes(n_bits, dim, seed)
        bits = [
            F.when(
                dot(F.col(vec_col), _lit_arr(float(x) for x in planes[i])) >= 0,
                "1",
            ).otherwise("0")
            for i in range(n_bits)
        ]
        return F.concat(*bits)
    iplanes = quantize_planes(lsh_planes(n_bits, dim, seed), quantize_scale)
    if quantized_col is not None:
        # one F.expr parse for the WHOLE bucket: building the n_bits folds
        # through the Column API costs hundreds of py4j round-trips per
        # table (lambda plumbing); the parser builds the identical
        # ArrayAggregate/ZipWith tree from one string in ~1 ms
        return F.expr(_quant_bucket_sql("__q", iplanes))
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quantize_scale + F.lit(0.5)),
    )

    def int_dot(plane_row: np.ndarray) -> Column:
        arr = _lit_arr(int(p) for p in plane_row)
        return F.aggregate(
            F.zip_with(qv, arr, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    bits = [
        F.when(int_dot(iplanes[i]) >= 0, "1").otherwise("0") for i in range(n_bits)
    ]
    return F.concat(*bits)


def _quant_bucket_sql(q_ident: str, iplanes: np.ndarray) -> str:
    """SQL text of the integer sign-bucket over the pre-quantized array
    column ``q_ident`` — parses to exactly the expression tree the Column
    API built: per bit, aggregate(zip_with(q, array(planes), (x,y)->x*y),
    0L, (acc,x)->acc+x) >= 0 mapped to '1'/'0', concatenated."""
    bits = []
    for row in iplanes:
        arr = ",".join(str(int(p)) for p in row)
        bits.append(
            f"(CASE WHEN aggregate(zip_with({q_ident}, array({arr}), "
            f"(x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x) >= 0 "
            f"THEN '1' ELSE '0' END)"
        )
    return "concat(" + ", ".join(bits) + ")"


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Assign each vector its sign-bucket(s) from random hyperplanes —
    output (id, vec, tbl, bucket), one row per LSH table.

    Planes are seeded-deterministic (table t uses ``seed + t``), shipped as
    literal arrays (a few KB); bucket = bit-string of sign(v·plane).
    Cosine-similar vectors agree on most bits, so near neighbors collide.

    ``n_tables`` is the classic OR-amplification knob: recall rises as
    1-(1-p^bits)^tables at the cost of ``n_tables``× bucket rows — tune
    (n_bits, n_tables) so per-bucket candidate counts stay bounded while
    true neighbors are still likely to collide somewhere.

    ``quantize_scale`` integerizes both the vector and the planes
    (floor(x·scale + 0.5)) so every dot product is a sum of int64 products
    — order-independent and bit-identical across engines, which makes the
    bucketing (and anything derived from it, e.g. recall) exactly
    reproducible in a SQL oracle. Semantically it's still random-hyperplane
    LSH, just with planes rounded to 1/scale.
    """
    d = 64 if dim is None else dim
    if quantize_scale is not None:
        # project the quantization ONCE per row; every table's bit exprs
        # fold over the materialized __q column instead of re-quantizing
        # per bit (n_bits x n_tables times per row)
        base = vectors.select(
            F.col(id_col),
            F.col(vec_col),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * quantize_scale + F.lit(0.5)),
            ).alias("__q"),
        )
        qcol = F.col("__q")
    else:
        base = vectors.select(F.col(id_col), F.col(vec_col))
        qcol = None
    table_structs = [
        F.struct(
            F.lit(t).alias("tbl"),
            _bucket_expr(
                vec_col, n_bits, d, seed + t, quantize_scale, quantized_col=qcol
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    return base.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(F.array(*table_structs)).alias("__b"),
    ).select(id_col, vec_col, F.col("__b.tbl").alias("tbl"), F.col("__b.bucket").alias("bucket"))


def ivf_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via an IVF coarse quantizer: KMeans(n_clusters) partitions
    the corpus; each query probes its ``n_probe`` nearest centroids and
    re-ranks exactly inside them.

    At scale the clustered table is written partitioned by ``cluster`` so a
    probe touches n_probe/n_clusters of the data. Training samples the
    corpus; assignment is one broadcast of the centroid matrix.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = vectors.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(ml_df)
    centers = model.clusterCenters()

    assigned = model.transform(ml_df).select(
        F.col(id_col), F.col(vec_col), F.col("prediction").alias("cluster")
    )

    def center_dist(c_idx: int) -> Column:
        arr = _lit_arr(float(x) for x in centers[c_idx])
        return F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # per-query: n_probe nearest centroids (tiny driver-side-free expression:
    # build an array of (dist, idx) structs, sort, slice)
    dist_structs = F.array(
        *[F.struct(center_dist(i).alias("d"), F.lit(i).alias("c")) for i in range(n_clusters)]
    )
    probes = F.slice(F.array_sort(dist_structs), 1, n_probe)
    q = (
        assigned.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.explode(probes).alias("__p"),
        )
        .select("query_id", "__qv", F.col("__p.c").alias("cluster"))
    )
    cand = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "cluster"
    )
    pairs = cand.join(
        F.broadcast(q.withColumn("__qn", norm(F.col("__qv")))), "cluster"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_with_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), norm(F.col("__cv"))
            ),
            6,
        ).alias("cos_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


IVF_GRP_BITS = 4
IVF_GRP_SEED = 777


def _collect_centroids(df: DataFrame, grp_col: str, dim: int) -> list[tuple[str, int, list[int]]]:
    """Training action: ≤2^grp_bits rows of (grp, n, per-dim int sums) —
    the same driver-side materialization KMeans.fit performs, but exact."""
    rows = (
        df.groupBy(grp_col)
        .agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("__q", d + 1)).alias(f"s{d}") for d in range(dim)],
        )
        .collect()
    )
    return [(r[grp_col], int(r["n"]), [int(r[f"s{d}"]) for d in range(dim)]) for r in rows]


def _dist_structs(cents: list[tuple[str, int, list[int]]]) -> Column:
    """Array of (distance, cluster) structs over the ``__q`` quantized
    vector: sum((n·q_d - s_d)²)/n² with exact integer numerators converted
    to double — IEEE conversion + division are correctly rounded, hence
    engine-independent.

    Built as ONE parsed SQL expression: the Column-API form cost ~20 py4j
    round-trips per centroid (lambda plumbing for each fold) — ~0.7 s of
    driver time per call with 16 centroids; the parser builds the
    identical tree (named_struct of the fold, int literals, exact casts)
    from one string.
    """
    terms = []
    for g, n, sums in cents:
        arr = ",".join(str(s) for s in sums)
        num = (
            f"aggregate(zip_with(__q, array({arr}), "
            f"(x, s) -> ({n} * x - s) * ({n} * x - s)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        # struct ordering = (d, c): double distance first, bitstring tiebreak
        terms.append(
            f"named_struct('d', CAST({num} AS DOUBLE) / CAST({n * n} AS DOUBLE), "
            f"'c', '{g}')"
        )
    return F.expr("array(" + ", ".join(terms) + ")")


def ivf_assign_quantized(
    vectors: DataFrame,
    scale: int = 10_000,
    dim: int = 64,
    grp_bits: int = IVF_GRP_BITS,
    grp_seed: int = IVF_GRP_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer assignment: (id, vec, __q, cluster).

    Training = group vectors by a ``grp_bits``-bit quantized-hyperplane
    bucket (seed ``grp_seed``), then one exact-integer Lloyd refinement:
    re-partition every vector to its nearest seed-group mean, all in int64
    arithmetic so the assignment is bit-identical in any engine (the
    DuckDB oracles reproduce it; see queries/similarity.py)."""
    q_expr = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )
    # __q is projected first and the group bucket folds over the COLUMN:
    # one quantization per row (not per bit) and the single-parse SQL
    # bucket path (grp referenced >1x, so CollapseProject cannot re-inline)
    base = vectors.select(F.col(id_col), F.col(vec_col), q_expr.alias("__q")).withColumn(
        "grp",
        _bucket_expr(
            vec_col, grp_bits, dim, grp_seed, scale, quantized_col=F.col("__q")
        ),
    )
    cent0 = _collect_centroids(base, "grp", dim)
    return base.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__q"),
        F.element_at(F.array_sort(_dist_structs(cent0)), 1).getField("c").alias("cluster"),
    )


def ivf_topk_quantized(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 3,
    scale: int = 10_000,
    dim: int = 64,
    grp_bits: int = IVF_GRP_BITS,
    grp_seed: int = IVF_GRP_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with the DETERMINISTIC coarse quantizer of
    :func:`ivf_assign_quantized`; probes rank by the REFINED partition's
    own means (a cluster's representative is its own mean — probing seed
    centroids instead costs ~0.16 recall@10, measured at sf0.01).

    The seeded-KMeans variant (:func:`ivf_topk`) remains the production
    trainer; this variant is the verification-grade IVF. NOTE on ranges:
    exact-int distance needs n·q_d to stay inside int64 — fine up to
    ~10^8 rows/cluster at scale=10^4; beyond that use the KMeans path
    (double centroids).

    Query path is identical to classic IVF: each query probes its
    ``n_probe`` nearest centroids, candidates are the vectors assigned to
    those clusters (partition-pruned at scale when the table is written
    partitioned by cluster), exact cosine re-rank inside.
    """
    refined = ivf_assign_quantized(vectors, scale, dim, grp_bits, grp_seed, id_col, vec_col)
    cent1 = _collect_centroids(refined, "cluster", dim)

    assigned = refined.select(
        F.col(id_col),
        F.col(vec_col),
        "cluster",
        F.slice(F.array_sort(_dist_structs(cent1)), 1, n_probe).alias("__probes"),
    )
    q = (
        assigned.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.explode("__probes").alias("__p"),
        )
        .select("query_id", "__qv", F.col("__p.c").alias("cluster"))
    )
    cand = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "cluster"
    )
    pairs = cand.join(
        F.broadcast(q.withColumn("__qn", norm(F.col("__qv")))), "cluster"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_with_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), norm(F.col("__cv"))
            ),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket(s) across
    ``n_tables`` tables (OR-amplified), then exact cosine re-rank over the
    deduplicated candidate set.

    At scale, repartition the bucketed table by (tbl, bucket) (or write it
    bucketed) so each query probes n_tables partitions instead of the full
    set.
    """
    bucketed = hyperplane_lsh_buckets(
        vectors, n_bits, dim, seed, id_col, vec_col, quantize_scale, n_tables
    )
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        "tbl",
        "bucket",
    )
    cand = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "tbl", "bucket"
    )
    return bucketed_probe(cand, q, k)


def bucketed_probe(
    index: DataFrame, queries: DataFrame, k: int, bucket_cap: int | None = None
) -> DataFrame:
    """The shared LSH probe unit: bucket-join a (neighbor_id, __cv, tbl,
    bucket) index frame with a broadcast (query_id, __qv, tbl, bucket)
    query frame, score each deduplicated candidate pair by exact cosine,
    and keep the top-``k`` per query. One definition of the tie-break and
    rounding contract for BOTH the batch path (:func:`lsh_topk`) and the
    streaming per-micro-batch path (queries/streaming3.py), so the shared
    DuckDB oracle cannot desync from either.

    ``bucket_cap`` (r3 verdict #6) bounds a degenerate index bucket — a
    boilerplate hot bucket holding 10⁵ near-identical vectors would score
    cap-free against EVERY query that hashes there. Capped buckets keep
    the ``cap`` lowest-id members (deterministic truncation; unlike the
    dedup candidate graph there is no connectivity to preserve — an ANN
    probe just loses some redundant near-identical candidates, a bounded
    recall tradeoff the caller opts into).
    """
    if bucket_cap is not None:
        occ = W.partitionBy("tbl", "bucket").orderBy("neighbor_id")
        index = (
            index.withColumn("__occ", F.row_number().over(occ))
            .filter(F.col("__occ") <= bucket_cap)
            .drop("__occ")
        )
    # query-side norms are precomputed (each query row is reused across all
    # its candidate pairs); the candidate norm is computed once per SCORED
    # pair — NOT pre-projected on the index side, where at scale most rows
    # join zero queries and a pre-projected norm would be wasted work
    pairs = (
        index.join(
            F.broadcast(queries.withColumn("__qn", norm(F.col("__qv")))),
            ["tbl", "bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair colliding in several tables must be scored once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_with_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), norm(F.col("__cv"))
            ),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    vectors: DataFrame,
    tau: float,
    scale: int = 10_000,
    dim: int = 64,
    grp_bits: int = IVF_GRP_BITS,
    grp_seed: int = IVF_GRP_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster embeddings with the
    deterministic coarse quantizer, compare pairs ONLY within a cluster,
    and drop every vector that has a smaller-id neighbor with cosine ≥ τ.

    Output: (vec_id, dup_of, kept) for every input vector, where dup_of =
    the smallest qualifying neighbor id (null ⇒ kept). This is the exact
    shape of SemDeDup (Abbas et al. 2023): k-means-cluster then intra-
    cluster pairwise — the cross product is bounded by cluster size, never
    corpus size. At 100 TB, cluster count grows with the corpus (keep
    cluster size roughly constant) and the pair join runs per cluster
    partition; the keep-min rule is deterministic, so reruns are stable.
    """
    a = ivf_assign_quantized(vectors, scale, dim, grp_bits, grp_seed, id_col, vec_col)
    left = a.select(
        F.col(id_col).alias("ia"),
        F.col(vec_col).alias("__va"),
        "cluster",
        norm(F.col(vec_col)).alias("__na"),
    )
    right = a.select(
        F.col(id_col).alias("ib"),
        F.col(vec_col).alias("__vb"),
        "cluster",
        norm(F.col(vec_col)).alias("__nb"),
    )
    pairs = (
        left.join(right, "cluster")
        .filter(F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(
                cosine_with_norms(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ).alias("cs"),
        )
        .filter(F.col("cs") >= tau)
    )
    dup = (
        pairs.groupBy("ib")
        .agg(F.min("ia").alias("dup_of"))
        .withColumnRenamed("ib", id_col)
    )
    return (
        vectors.select(id_col)
        .join(dup, id_col, "left")
        .select(id_col, "dup_of", F.col("dup_of").isNull().alias("kept"))
    )


def write_lsh_layout(
    vectors: DataFrame,
    path: str,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int | None = None,
    n_tables: int = 1,
) -> None:
    """Persist the OR-amplified bucket table partitioned by (tbl, bucket) —
    the 100 TB ANN layout: a probe reads its n_tables bucket partitions,
    not the corpus (partition pruning, asserted in
    tests/test_storage_layout.py::test_lsh_bucketed_probe_prunes)."""
    bucketed = hyperplane_lsh_buckets(
        vectors, n_bits, dim, seed, id_col, vec_col, quantize_scale, n_tables
    )
    bucketed.write.mode("overwrite").partitionBy("tbl", "bucket").parquet(path)


def lsh_topk_bucketed(
    spark,
    path: str,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing a :func:`write_lsh_layout` table.

    The query side is tiny (n_queries × n_tables rows) and is collected to
    build LITERAL (tbl, bucket) predicates, so Catalyst prunes the
    candidate scan to the probed partitions statically — the plan shows
    PartitionFilters and touches n_queries·n_tables partitions instead of
    the corpus. Same result as :func:`lsh_topk` on the same parameters.
    """
    b = spark.read.parquet(path)
    q_rows = (
        b.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "tbl", "bucket")
        .collect()
    )
    # lit(False) seed: an empty probe set (no query_ids in the layout)
    # yields an empty result, not a filter(None) TypeError
    probe_pred = F.lit(False)
    for r in q_rows:
        p = (F.col("tbl") == r["tbl"]) & (F.col("bucket") == r["bucket"])
        probe_pred = probe_pred | p
    cand = b.filter(probe_pred).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "tbl", "bucket"
    )
    q = spark.createDataFrame(
        [(r["query_id"], r["__qv"], r["tbl"], r["bucket"]) for r in q_rows],
        "query_id long, __qv array<float>, tbl int, bucket string",
    )
    pairs = (
        cand.join(F.broadcast(q.withColumn("__qn", norm(F.col("__qv")))), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_with_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), norm(F.col("__cv"))
            ),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of an ANN result against the exact top-k.

    Both inputs carry (query_id, neighbor_id). Computed entirely in-plan:
    one broadcastable left join + one aggregate over (n_queries · k) rows —
    negligible next to the searches themselves.
    """
    hits = approx.select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    return (
        exact.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").alias("n_hits"),
            (F.count("__hit") / F.lit(float(k))).alias(f"recall_at_{k}"),
        )
    )
