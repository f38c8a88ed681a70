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
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cand = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    pairs = cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"), "inner")
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector a sign-bucket from ``n_bits`` random hyperplanes.

    Planes are seeded-deterministic, shipped as literal arrays (a few KB);
    bucket = bit-string of sign(v·plane). Cosine-similar vectors agree on
    most bits, so near neighbors collide in buckets.
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_bits, dim)
    bucket_bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in planes[i]])) >= 0, "1")
        .otherwise("0")
        for i in range(n_bits)
    ]
    return vectors.select(
        F.col(id_col), F.col(vec_col), F.concat(*bucket_bits).alias("bucket")
    )


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
        arr = F.array(*[F.lit(float(x)) for x in centers[c_idx]])
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
    pairs = cand.join(F.broadcast(q), "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
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
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket, then
    exact cosine re-rank within the bucket.

    At scale, repartition the bucketed table by ``bucket`` (or write it
    bucketed) so each query probes one partition instead of the full set.
    """
    bucketed = hyperplane_lsh_buckets(vectors, n_bits, dim, seed, id_col, vec_col)
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("bucket"),
    )
    cand = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "bucket"
    )
    pairs = cand.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
