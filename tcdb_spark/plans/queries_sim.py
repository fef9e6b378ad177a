"""Similarity-search extension operators over ``embeddings``
(SURVEY.md §2.12; generalizes the nearest-storm argmin join,
tcdb/etl/process_storms.py:43-56).

Brute-force exact top-k is the correctness baseline (oracle-checked);
the LSH-bucketed variant is the 100 TB scale path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.plans.catalog import load_tables, register

K = 5
N_QUERIES = 5


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim(a, b):
    """Cosine similarity between two array<double> columns — sequential
    left-to-right fold, matching C-loop accumulation order."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@register(
    "sim_topk_cosine",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), pairs AS (
        SELECT q.q_id, b.vec_id,
               list_dot_product(q.q_emb, b.emb)
                 / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                    * sqrt(list_dot_product(b.emb, b.emb))) AS cos
        FROM base b CROSS JOIN q
        WHERE b.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, round(cos, 6) AS cosine,
           CAST(row_number() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank_in_group
    FROM pairs
    QUALIFY rank_in_group <= {K}
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for the first
    ``N_QUERIES`` vectors: broadcast the query set, one scan over the
    base table, per-query window top-k. At 100 TB the base side stays
    partition-parallel; only k rows per query shuffle to the window."""
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    q = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    pairs = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cosine_sim(F.col("q_emb"), F.col("emb")).alias("cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rank_in_group", F.row_number().over(w).cast("int"))
        .where(F.col("rank_in_group") <= K)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from md5 — no RNG, so the
    bucketing reproduces across engines, sessions and retries."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"lsh:{j}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket_ann(
    emb: DataFrame,
    queries: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    k: int = K,
) -> DataFrame:
    """Sign-LSH bucketed approximate NN: hash vectors to 2^n_planes
    buckets via fixed random hyperplanes, join candidates within the same
    bucket, exact cosine + top-k inside. The scale path: candidate set per
    query shrinks ~2^n_planes-fold vs brute force; recall is tunable via
    n_planes and multi-probe."""
    planes = _hyperplanes(dim, n_planes)
    plane_arr = F.array(*[F.array(*[F.lit(v) for v in row]) for row in planes])

    def bucket_of(vec):
        bits = F.transform(
            plane_arr,
            lambda row: F.when(
                F.aggregate(F.zip_with(row, vec, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x) >= 0,
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        return F.aggregate(bits, F.lit(0), lambda acc, b: acc * 2 + b)

    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    base = base.withColumn("bucket", bucket_of(F.col("emb")))
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("q_emb")
    ).withColumn("bucket", bucket_of(F.col("q_emb")))

    pairs = (
        base.join(F.broadcast(q), on="bucket")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cosine_sim(F.col("q_emb"), F.col("emb")).alias("cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rank_in_group", F.row_number().over(w).cast("int"))
        .where(F.col("rank_in_group") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


@register("sim_ann_lsh")  # approximate by construction -> rows-only check
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    q = e.where(F.col("vec_id") < N_QUERIES)
    return lsh_bucket_ann(e, q)


@register("sim_ann_ivf")  # trained quantizer -> approximate; rows-only check
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN: KMeans coarse quantizer (fixed seed), probe the
    3 nearest of 16 buckets per query, exact cosine top-k inside
    (operators/similarity.py). The scale path beside LSH banding."""
    from tcdb_spark.operators.similarity import ivf_build, ivf_search

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    indexed, centroids = ivf_build(e, k_centroids=16, seed=42)
    indexed = indexed.persist()
    q = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("q_emb"))
    )
    return ivf_search(indexed, centroids, q, k=K, nprobe=3)
