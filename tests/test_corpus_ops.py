"""Corpus-curation operators: connected components, n-gram helpers,
deterministic split buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcdb_spark.operators.graph import connected_components
from tcdb_spark.plans.queries_corpus import _ngrams


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_cc_two_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
    )
    got = _labels(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges(spark):
    # a path graph needs diameter-many propagation rounds — exercises the
    # iteration + convergence detection, not just a single join
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
    )
    got = _labels(connected_components(edges))
    assert set(got.values()) == {0} and len(got) == n + 1


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert connected_components(edges).count() == 0


def test_cc_duplicate_and_reversed_edges(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (3, 2)], "src bigint, dst bigint"
    )
    got = _labels(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1}


def test_ngrams_helper(spark):
    df = spark.createDataFrame([("a b c d",)], "text string").select(
        F.split("text", " ").alias("tokens")
    )
    row = df.select(
        _ngrams(F.col("tokens"), 2).alias("bi"),
        _ngrams(F.col("tokens"), 3).alias("tri"),
    ).first()
    assert row["bi"] == ["a b", "b c", "c d"]
    assert row["tri"] == ["a b c", "b c d"]


def test_split_bucket_stable_under_repartition(spark):
    """The md5-derived bucket must not depend on partitioning (the
    property rand(seed) lacks)."""
    from tcdb_spark.plans.queries_corpus import split_assign

    a = split_assign(spark, "/root/testdata/sf0.001").collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = split_assign(spark, "/root/testdata/sf0.001").collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    key = lambda r: (r["split"], r["lang"])  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {key(r) for r in a} == {key(r) for r in b}
