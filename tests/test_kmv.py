"""KMV (bottom-k theta) sketch laws: exact-mode degeneracy, pruned-k
accuracy bounds, merge algebra (associative, idempotent, batch-split
invariant), and plan-shape pins (no cartesian anywhere in the pair
stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tcdb_spark.operators.sketch import (
    kmv_estimate,
    kmv_merge,
    kmv_overlap,
    kmv_sketch,
)


def _keys_df(spark, spec: dict[str, range]):
    rows = [(g, f"k{i}") for g, rng in spec.items() for i in rng]
    return spark.createDataFrame(rows, "g string, key string")


def test_exact_mode_is_exact(spark):
    # fewer distinct keys than k: estimates are exact counts
    df = _keys_df(spark, {"a": range(0, 300), "b": range(200, 500)})
    sk = kmv_sketch(df, "g", "key", k=1024)
    est = {r.g: r.est_distinct for r in kmv_estimate(sk, "g").collect()}
    assert est == {"a": 300, "b": 300}
    row = kmv_overlap(sk, "g").collect()[0]
    assert (row.group_a, row.group_b) == ("a", "b")
    assert row.est_intersection == 100
    assert row.est_union == 500
    assert row.jaccard_bp == 10000 * 100 // 500


def test_duplicates_do_not_inflate(spark):
    rows = [("a", f"k{i % 50}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, key string")
    sk = kmv_sketch(df, "g", "key", k=256)
    assert kmv_estimate(sk, "g").collect()[0].est_distinct == 50


def test_pruned_accuracy(spark):
    # 4000-distinct groups sharing 2000 keys; k=512 -> stderr ~ 4.4%
    df = _keys_df(spark, {"a": range(0, 4000), "b": range(2000, 6000)})
    sk = kmv_sketch(df, "g", "key", k=512)
    assert all(not r.is_exact for r in sk.select("is_exact").collect())
    row = kmv_overlap(sk, "g").collect()[0]
    assert abs(row.est_a - 4000) / 4000 < 0.15
    assert abs(row.est_b - 4000) / 4000 < 0.15
    assert abs(row.est_intersection - 2000) / 2000 < 0.30
    assert abs(row.est_union - 6000) / 6000 < 0.15
    assert abs(row.jaccard_bp - 3333) < 1000


def test_merge_equals_one_shot(spark):
    # sketch(A ++ B) == merge(sketch(A), sketch(B)) — exactly, as sets
    a = _keys_df(spark, {"g": range(0, 3000)})
    b = _keys_df(spark, {"g": range(1500, 4500)})
    k = 256
    one = kmv_sketch(a.unionAll(b), "g", "key", k).collect()[0]
    merged = kmv_merge(
        kmv_sketch(a, "g", "key", k).unionAll(kmv_sketch(b, "g", "key", k)),
        "g",
        k,
    ).collect()[0]
    assert merged.hashes == one.hashes
    assert (merged.n_kept, merged.is_exact, merged.kth) == (
        one.n_kept,
        one.is_exact,
        one.kth,
    )


def test_merge_idempotent(spark):
    df = _keys_df(spark, {"g": range(0, 1000)})
    sk = kmv_sketch(df, "g", "key", k=128)
    again = kmv_merge(sk.unionAll(sk), "g", k=128).collect()[0]
    assert again.hashes == sk.collect()[0].hashes


def test_disjoint_groups_omitted(spark):
    df = _keys_df(spark, {"a": range(0, 100), "b": range(1000, 1100)})
    sk = kmv_sketch(df, "g", "key", k=1024)
    assert kmv_overlap(sk, "g").count() == 0  # documented contract


def test_overlap_plan_has_no_cartesian(spark):
    df = _keys_df(spark, {"a": range(0, 50), "b": range(25, 75)})
    plan = (
        kmv_overlap(kmv_sketch(df, "g", "key", 64), "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
