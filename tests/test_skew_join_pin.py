"""Pins the two skew answers of the fact-fact time-join family
(VERDICT r5 #5):

1. interval_join's equi-join key is (entity, time-bucket), so a hot
   ENTITY spread over time is pre-split by construction — pinned as
   the data-level fact (the largest join-key group is a sliver of the
   hot entity's row count; a plan-marker absence assertion was flaky
   because hair-trigger test thresholds let AQE split mild residual
   imbalance too, which is fine).
2. When the hot entity ALSO concentrates in one bucket (hot key + hot
   hour), the partition IS skewed — and AQE's skew-join provably splits
   it on our plan shape (SortMergeJoin(skew=true) in the final adaptive
   plan).  Gotcha pinned along the way: the skew marker only appears in
   the DataFrame's OWN query execution after a collect(); a noop write
   runs a separate execution and shows the non-final plan.

asof_join has no such AQE backstop (window partitions are unsplittable)
— its answer is asof_join_bucketed (tests/test_asof_bucketed.py).
"""

from pyspark.sql import functions as F

from tcdb_spark.operators.joins import interval_join

_SKEW_CONFS = {
    # shrink the thresholds so a tests-sized hot partition qualifies;
    # production uses the defaults (256MB/5x) — the POINT is that the
    # mechanism applies to this plan shape at all
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.join.preferSortMergeJoin": "true",
}


def _frames(spark, hot_hour: bool):
    base = 1_600_000_000
    span = 40 * 86400
    hot_ts = (
        F.lit(base) + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(3600))
        if hot_hour
        else F.lit(base) + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(span))
    )
    left = spark.range(400_000).select(
        F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 9, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500)) + 2)
        .alias("k"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 9, hot_ts)
        .otherwise(F.lit(base) + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(span)))
        .cast("timestamp")
        .alias("lts"),
    )
    right = spark.range(5_000).select(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(500)).alias("k"),
        (F.lit(base) + F.pmod(F.xxhash64("id", F.lit(11)), F.lit(span)))
        .cast("timestamp")
        .alias("rts"),
    )
    return left, right


def _final_plan_skew(spark, hot_hour: bool) -> bool:
    left, right = _frames(spark, hot_hour)
    j = interval_join(left, right, ["k"], "lts", "rts", tolerance_hours=1.0)
    j.collect()  # AQE finalizes on the df's own execution, not a write's
    plan = j._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in plan
    return "skew=true" in plan


def test_interval_join_skew_split_and_pre_split(spark):
    saved = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    try:
        for k, v in _SKEW_CONFS.items():
            spark.conf.set(k, v)
        # hot key + hot hour: one (entity, bucket) partition is huge ->
        # AQE must split it
        assert _final_plan_skew(spark, hot_hour=True), (
            "AQE skew-join did not fire on the concentrated hot partition"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # hot key spread over time: the bucket inside the join key
    # pre-splits the entity BY CONSTRUCTION — pinned as the data-level
    # fact (max join-key group is a sliver of the hot key's total), not
    # as the absence of AQE skew markers: under the hair-trigger test
    # thresholds AQE may legitimately split mild residual imbalance,
    # which made a plan-marker assertion flaky across sessions
    left, _ = _frames(spark, hot_hour=False)
    groups = (
        left.groupBy(
            "k", F.floor(F.unix_timestamp("lts") / 3600).alias("b")
        ).count()
    )
    row = groups.agg(
        F.max("count").alias("mx"),
        F.sum(F.when(F.col("k") == 1, F.col("count"))).alias("hot_total"),
    ).first()
    assert row["mx"] <= 0.02 * row["hot_total"], (
        f"largest (entity, bucket) join-key group is {row['mx']} of "
        f"{row['hot_total']} hot rows — the time bucket no longer pre-splits"
    )


def test_topk_per_group_is_engine_skew_safe(spark):
    """topk_per_group needs NO salted/bucketed twin: Spark plans a
    PARTIAL WindowGroupLimit before the exchange for rank-like windows
    filtered to <= k, which is the two-phase partial-top-k rewrite
    built into the engine.  Measured r6: 40M rows with 90% in one group
    ran the plain window in 2.9 s vs 3.6 s for a hand-salted two-phase
    (the engine's partial pass beats the extra salt shuffle) — so the
    hand-salted operator was deleted and THIS pin guards the premise.
    If this test ever fails (an order-by/filter shape change defeating
    the WindowGroupLimit match, or k above
    spark.sql.window.group.limit.threshold), hot groups silently go
    back to single-task sorts and the salted twin must come back."""
    from tcdb_spark.operators.windows import topk_per_group

    left = spark.range(1000).select(
        F.pmod("id", F.lit(5)).alias("k"),
        F.col("id").alias("t"),
        (F.col("id") % 7).alias("v"),
    )
    df = topk_per_group(left, ["k"], [F.col("v").desc(), F.col("t").asc()], 10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    partial_seen = any(
        "WindowGroupLimit" in line and "Partial" in line
        for line in plan.splitlines()
    )
    assert partial_seen, (
        "no Partial WindowGroupLimit in the executed plan — the engine "
        "no longer pre-limits rank windows before the shuffle:\n" + plan
    )
