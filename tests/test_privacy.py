"""k-anonymity / l-diversity audits (operators/privacy.py).

Hand frames with known class structure pin: ladder rung accounting
(including the genuine-NULL-vs-subtotal trap), distinct-l semantics
with NULL sensitive values, suppression's floor guarantee and
idempotence, and null-safe keep/suppress of NULL-keyed classes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tcdb_spark.operators.privacy import (
    k_anonymity_ladder,
    l_diversity_classes,
    l_diversity_summary,
    qi_group_sizes,
    suppress_below_k,
)


def _frame(spark):
    # classes on (a, b): (x, 1) -> 3 rows, (x, 2) -> 1 row,
    # (y, 1) -> 2 rows, (NULL, 1) -> 2 rows  (NULL is a real class)
    rows = [
        ("x", 1, "s1"),
        ("x", 1, "s2"),
        ("x", 1, "s1"),
        ("x", 2, "s3"),
        ("y", 1, "s1"),
        ("y", 1, None),
        (None, 1, "s4"),
        (None, 1, "s4"),
    ]
    return spark.createDataFrame(rows, "a string, b int, s string")


def test_qi_group_sizes_null_class(spark):
    sizes = {
        (r["a"], r["b"]): r["k"]
        for r in qi_group_sizes(_frame(spark), ["a", "b"]).collect()
    }
    assert sizes == {("x", 1): 3, ("x", 2): 1, ("y", 1): 2, (None, 1): 2}


def test_k_anonymity_ladder_rungs(spark):
    out = {
        r["level"]: r
        for r in k_anonymity_ladder(_frame(spark), ["a", "b"], k_min=2).collect()
    }
    assert set(out) == {0, 1, 2}
    # rung 0: the four classes above; only (x,2) is below k=2
    assert out[0]["n_groups"] == 4 and out[0]["n_rows"] == 8
    assert out[0]["groups_below_k"] == 1 and out[0]["rows_below_k"] == 1
    assert out[0]["min_k"] == 1
    # rung 1 generalizes b away: x -> 4, y -> 2, NULL -> 2 (the NULL
    # class must NOT be conflated with a rolled-up subtotal)
    assert out[1]["n_groups"] == 3 and out[1]["groups_below_k"] == 0
    assert out[1]["min_k"] == 2
    # rung 2: everything in one class
    assert out[2]["n_groups"] == 1 and out[2]["min_k"] == 8


def test_l_diversity_null_sensitive(spark):
    cl = {
        (r["a"], r["b"]): (r["k"], r["l"])
        for r in l_diversity_classes(_frame(spark), ["a", "b"], "s").collect()
    }
    # (y, 1): one NULL sensitive -> l counts only the non-NULL value
    assert cl[("y", 1)] == (2, 1)
    assert cl[("x", 1)] == (3, 2)
    summary = l_diversity_summary(_frame(spark), ["a", "b"], "s", l_min=2).collect()[0]
    assert summary["n_groups"] == 4
    # l below 2: (x,2) l=1, (y,1) l=1, (NULL,1) l=1 -> 3 classes, 5 rows
    assert summary["groups_below_l"] == 3 and summary["rows_below_l"] == 5
    assert summary["min_l"] == 1


def test_all_null_sensitive_class_audits_l0(spark):
    df = spark.createDataFrame(
        [("g", 1, None), ("g", 1, None)], "a string, b int, s string"
    )
    assert l_diversity_classes(df, ["a", "b"], "s").collect()[0]["l"] == 0


def test_suppress_floor_and_idempotence(spark):
    kept = suppress_below_k(_frame(spark), ["a", "b"], k_min=2)
    sizes = qi_group_sizes(kept, ["a", "b"])
    assert sizes.agg(F.min("k")).collect()[0][0] >= 2
    # (x, 2) suppressed; NULL-keyed class (size 2) must survive
    assert kept.count() == 7
    assert kept.where(F.col("a").isNull()).count() == 2
    again = suppress_below_k(kept, ["a", "b"], k_min=2)
    assert again.count() == 7


def test_suppress_null_class_below_floor_dropped(spark):
    df = spark.createDataFrame(
        [(None, 1, "s"), ("x", 1, "s"), ("x", 1, "s")], "a string, b int, s string"
    )
    kept = suppress_below_k(df, ["a", "b"], k_min=2)
    assert kept.count() == 2
    assert kept.where(F.col("a").isNull()).count() == 0
