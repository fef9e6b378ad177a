"""Repartition-invariance for the sampling/packing/split family
(round-8 verdict #3, retry-determinism audit).

At cluster scale the SAME lane runs under arbitrary partitioning —
different shuffle-partition counts, different scan split sizes, and
recomputed partitions after stragglers.  Any lane keyed on partition
order (rand(seed) is per-partition-index; first() without ordering;
unsorted collects) returns DIFFERENT rows under a different layout.
The repo rule is xxhash64(natural key, seed) / explicit orderings; this
test enforces it empirically: every sampling-family lane must produce
the IDENTICAL multiset of rows at 4 vs 32 shuffle partitions AND with
the parquet scan forced into many small splits.

Complements tools/plan_lint.py's static rules (no rand(), no unordered
first/collect in Aggregates): the static lint catches the primitive,
this catches any order-dependence the primitives compose into.
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"

FAMILY = [
    "cluster_balanced_sample",
    "domain_cap",
    "domain_cap_skewsafe",
    "dsir_importance_weights",
    "mix_temperature_sample",
    "mixture_sample",
    "negative_pair_sample",
    "pack_sequences",
    "pack_sequences_sharded",
    "split_assign",
    "split_leakage_check",
    "stratified_sample",
    "token_budget_sample",
    "training_order_shuffle",
    "weighted_sample_ares",
    "weighted_sample_stratified",
]


def _canon(v):
    if isinstance(v, float):
        return math.nan if v != v else round(v, 9)
    return v


def _rows(spark, name, shuffle_parts: str, max_split: str):
    from tcdb_spark.plans import QUERIES
    from tcdb_spark.plans.catalog import _TABLE_CACHE

    before = {
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
    }
    spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
    spark.conf.set("spark.sql.files.maxPartitionBytes", max_split)
    _TABLE_CACHE.clear()  # new scan-split conf must reach the file scans
    try:
        df = QUERIES[name](spark, SF_DIR)
        return sorted(
            tuple(_canon(v) for v in row) for row in df.collect()
        )
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)
        _TABLE_CACHE.clear()


@pytest.mark.parametrize("name", FAMILY)
def test_sampling_lane_is_partitioning_invariant(spark, name):
    wide = _rows(spark, name, "32", "128m")
    narrow = _rows(spark, name, "4", "64k")  # few reducers, many tiny scan splits
    assert wide == narrow, (
        f"{name}: output depends on partitioning "
        f"({len(wide)} vs {len(narrow)} rows; first diff: "
        f"{next((a, b) for a, b in zip(wide, narrow) if a != b) if len(wide) == len(narrow) else 'row count'})"
    )
