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


_CBS_CAP = 32
_ASSIGN_CTE = f"""
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
    ), assigned AS (
        SELECT vec_id, CAST(c_id AS INTEGER) AS cluster
        FROM pairs
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) = 1
    )
"""


@register(
    "cluster_balanced_sample",
    oracle=_ASSIGN_CTE
    + f"""
    SELECT vec_id, cluster, CAST(pick_rank AS INTEGER) AS pick_rank
    FROM (
        SELECT vec_id, cluster,
               row_number() OVER (
                   PARTITION BY cluster
                   ORDER BY md5('cbs1:' || CAST(vec_id AS VARCHAR)), vec_id
               ) AS pick_rank
        FROM assigned
    )
    WHERE pick_rank <= {_CBS_CAP}
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced curation draw: assign every vector to its
    nearest frozen centroid, then take ``_CBS_CAP`` per cluster in
    deterministic seeded-md5 order — the anti-mode-collapse subsample
    (uniform over semantic clusters, not over raw rows; the same reason
    pretraining mixes rebalance domains). rand() is not stable under
    repartitioning, so the draw key is a content hash — both engines
    order the identical hex text. Scale shape: one assignment scan
    (no shuffle — centroid side is a literal) + one per-cluster window
    whose partitions are cluster-sized; at 100 TB swap the window for
    the TakeOrdered-per-group pattern if clusters are planet-sized."""
    from pyspark.sql.window import Window as W

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
    assigned = kmeans_assign(e, cents).select("vec_id", "cluster")
    key = F.md5(F.concat(F.lit("cbs1:"), F.col("vec_id").cast("string")))
    w = W.partitionBy("cluster").orderBy(key, F.col("vec_id"))
    return (
        assigned.withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= _CBS_CAP)
        .select("vec_id", "cluster", F.col("pick_rank").cast("int").alias("pick_rank"))
    )


@register(
    "cluster_purity_eval",
    oracle=_ASSIGN_CTE
    + """
    , joined AS (
        SELECT a.cluster, e.label
        FROM assigned a JOIN embeddings e USING (vec_id)
    ), counts AS (
        SELECT cluster, label, count(*) AS n
        FROM joined GROUP BY cluster, label
    ), ranked AS (
        SELECT cluster, label, n,
               row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS r
        FROM counts
    ), best AS (
        SELECT cluster,
               CAST(sum(n) AS BIGINT) AS n_total,
               CAST(max(n) AS BIGINT) AS n_majority,
               max(CASE WHEN r = 1 THEN label END) AS majority_label
        FROM ranked GROUP BY cluster
    )
    SELECT cluster, n_total, CAST(majority_label AS INTEGER) AS majority_label,
           round(CAST(n_majority AS DOUBLE) / n_total, 6) AS purity
    FROM best
    """,
)
def cluster_purity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality evaluation against ground-truth labels: per
    cluster, the majority label (ties to the smaller label id) and
    purity = majority count / cluster size — the standard external
    clustering metric, and the monitor a curation pipeline watches when
    a re-trained quantizer drifts. Integer counts + one final division;
    the cluster x label contingency is map-side combined to at most
    k x |labels| rows before any shuffle."""
    from tcdb_spark.operators.clustering import kmeans_assign
    from pyspark.sql.window import Window as W

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
    assigned = kmeans_assign(e, cents).select("vec_id", "cluster")
    counts = (
        assigned.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("cluster").orderBy(F.col("n").desc(), F.col("label").asc())
    ranked = counts.withColumn("__r", F.row_number().over(w))
    best = (
        ranked.groupBy("cluster")
        .agg(
            F.sum("n").alias("n_total"),
            F.max("n").alias("n_majority"),
            F.min(F.when(F.col("__r") == 1, F.col("label"))).alias("majority_label"),
        )
    )
    return best.select(
        "cluster",
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("majority_label").cast("int").alias("majority_label"),
        F.round(F.col("n_majority").cast("double") / F.col("n_total"), 6).alias(
            "purity"
        ),
    )
