"""Corpus clustering lanes over ``embeddings`` (SURVEY.md §2.12
extension family): distributed k-means (operators/clustering.py) for
topic/domain bucketing and cluster-balanced curation.

Attestation layout: the iterative Lloyd's fit is not SQL-expressible
(DuckDB has no fixpoint loop), so — per the repo's PCA discipline —
the catalog hash-matches the frozen-centroid ASSIGNMENT step (the only
row-scale stage, and the exact machinery every fit iteration reuses)
against a DuckDB oracle, while the fit itself is pytest-gated
(tests/test_clustering.py: inertia monotone non-increasing,
deterministic across runs/partitionings, numpy-Lloyd parity on the
collected corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.plans.catalog import load_tables, register

K_CLUSTERS = 4


@register(
    "cluster_kmeans_assign",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), cents AS (
        SELECT vec_id AS c_id, emb AS c FROM base WHERE vec_id < {K_CLUSTERS}
    ), pairs AS (
        SELECT b.vec_id, c.c_id,
               list_dot_product(b.emb, b.emb)
                 - 2 * list_dot_product(b.emb, c.c)
                 + list_dot_product(c.c, c.c) AS d2
        FROM base b CROSS JOIN cents c
    )
    SELECT vec_id, CAST(c_id AS INTEGER) AS cluster, round(d2, 6) AS dist2
    FROM pairs
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) = 1
    """,
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-centroid k-means assignment: centroids are the K_CLUSTERS
    smallest-id vectors (data-derived, no RNG — the same deterministic
    init kmeans_fit uses), every vector goes to its nearest by squared
    L2 with ties to the smaller centroid id. Column-expression folds
    whose accumulation order matches the oracle's list_dot_product
    identity; no shuffle — the centroid side is a literal array."""
    from tcdb_spark.operators.clustering import kmeans_assign

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = [
        r["emb"]
        for r in e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .where(F.col("vec_id") < K_CLUSTERS)
        .orderBy("vec_id")
        .collect()
    ]
    out = kmeans_assign(e, cents)
    return out.select("vec_id", "cluster", F.round("dist2", 6).alias("dist2"))
