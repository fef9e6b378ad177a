"""Tests for queries_training: conversation assembly, negative-pair
sampling, cogrouped as-of alignment, MAD outliers, PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_conserved(spark):
    from tcdb_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], ["src", "dst"]
    )
    pr = pagerank(edges, iters=5)
    total = pr.agg(F.sum("val")).first()[0]
    # symmetric graph -> no dangling mass; ranks always sum to 1
    assert total == pytest.approx(1.0, abs=1e-9)
    vals = {r["node"]: r["val"] for r in pr.collect()}
    # 'a' has degree 3, the rest fewer -> highest rank
    assert vals["a"] == max(vals.values())
    assert all(v > 0 for v in vals.values())


def test_pagerank_two_node_closed_form(spark):
    from tcdb_spark.operators.graph import pagerank

    # two nodes, one edge: perfectly symmetric -> 0.5 each at any iter
    edges = spark.createDataFrame([("x", "y")], ["src", "dst"])
    pr = pagerank(edges, iters=3)
    for r in pr.collect():
        assert r["val"] == pytest.approx(0.5, abs=1e-12)


def test_negative_pairs_exclude_positives(spark):
    from tcdb_spark.plans.queries_training import NEG_K, negative_pair_sample

    out = negative_pair_sample(spark, SF).persist()
    bad = out.where(
        (F.col("label") == F.col("neg_label")) | (F.col("vec_id") == F.col("neg_id"))
    ).count()
    assert bad == 0
    per_anchor = out.groupBy("vec_id").count().agg(F.max("count")).first()[0]
    assert per_anchor <= NEG_K
    out.unpersist()


def test_conversation_fp_stable_under_repartition(spark):
    """The md5 sequence fingerprint must not depend on physical layout."""
    from tcdb_spark.plans.catalog import load_tables

    ev = load_tables(spark, SF, "events")["events"]

    def fp(df):
        seq = F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
        )
        return (
            df.groupBy("user_id")
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            seq,
                            lambda s: F.concat_ws(
                                ":", s["event_type"], s["event_id"].cast("string")
                            ),
                        ),
                        "|",
                    )
                ).alias("convo_fp")
            )
        )

    a = {r["user_id"]: r["convo_fp"] for r in fp(ev).collect()}
    b = {r["user_id"]: r["convo_fp"] for r in fp(ev.repartition(13)).collect()}
    assert a == b


def test_cogroup_align_matches_builtin_asof(spark):
    """The cogrouped-pandas alignment must equal the pure-builtin
    window formulation of the same backward as-of semantics."""
    from tcdb_spark.plans.catalog import load_tables
    from tcdb_spark.plans.queries_training import cogroup_align

    got = {
        (r["user_id"], r["event_id"]): (r["b_event_id"], r["b_value"])
        for r in cogroup_align(spark, SF).collect()
    }

    ev = load_tables(spark, SF, "events")["events"]
    a = ev.where(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    b = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("b_event_id"),
            F.max_by("value", "event_id").alias("b_value"),
        )
    )
    # builtin twin: union both streams, last purchase carried forward
    from pyspark.sql.window import Window as W

    tagged = a.select(
        "user_id", "ts", F.col("event_id"), F.lit(None).cast("long").alias("b_event_id"),
        F.lit(None).cast("double").alias("b_value"), F.lit(1).alias("side")
    ).unionByName(
        b.select(
            "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
            "b_event_id", "b_value", F.lit(0).alias("side")
        )
    )
    w = W.partitionBy("user_id").orderBy("ts", "side").rowsBetween(W.unboundedPreceding, 0)
    carried = tagged.withColumn(
        "lv", F.last("b_event_id", ignorenulls=True).over(w)
    ).withColumn("lval", F.last("b_value", ignorenulls=True).over(w))
    want = {
        (r["user_id"], r["event_id"]): (r["lv"], r["lval"])
        for r in carried.where(F.col("event_id").isNotNull()).collect()
    }
    assert got == want


def test_mad_outlier_sanity(spark):
    from tcdb_spark.plans.queries_training import mad_outlier_filter

    rows = mad_outlier_filter(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["mad_chars"] >= 0
        assert 0 <= r["n_outliers"] <= r["n_docs"]


def test_training_shuffle_is_permutation_and_sharded(spark):
    from tcdb_spark.plans.queries_training import NUM_SHARDS, training_order_shuffle

    out = training_order_shuffle(spark, SF).persist()
    n = out.count()
    # every doc appears exactly once
    assert out.select("doc_id").distinct().count() == n
    # shard ids bounded; ranks contiguous from 1 within each shard
    stats = out.groupBy("shard_id").agg(
        F.count("*").alias("c"), F.max("shard_rank").alias("mx"),
        F.min("shard_rank").alias("mn"),
    )
    for r in stats.collect():
        assert 0 <= r["shard_id"] < NUM_SHARDS
        assert r["mn"] == 1 and r["mx"] == r["c"]
    out.unpersist()


def test_funnel_monotone(spark):
    from tcdb_spark.plans.queries_training import funnel_conversion

    r = funnel_conversion(spark, SF).first()
    assert r["n_signup"] >= r["n_click_after"] >= r["n_purchase_after"] >= 0


def test_funnel_twins_agree(spark):
    """The eager (persist-per-stage) and lazy (auditable-plan) funnels
    must produce the identical row, and the lazy twin must stay lazy —
    explain-only callers pay nothing (round-3 ADVICE)."""
    from tcdb_spark.operators.aggregates import funnel, funnel_plan
    from tcdb_spark.plans.catalog import load_tables

    ev = load_tables(spark, SF, "events")["events"]
    stages = [
        ("n_signup", F.col("event_type") == "signup"),
        ("n_click_after", F.col("event_type") == "click"),
        ("n_purchase_after", F.col("event_type") == "purchase"),
    ]
    eager = funnel(ev, "user_id", "ts", stages).first().asDict()
    lazy_df = funnel_plan(ev, "user_id", "ts", stages)
    # the lazy plan is a real declarative plan: the stage joins are
    # visible to explain/plan-lint, not a LocalTableScan
    assert "LocalTableScan" not in lazy_df._jdf.queryExecution().optimizedPlan().toString()
    assert lazy_df.first().asDict() == eager


def test_join_hint_contracts(spark):
    """Join-strategy hints must actually steer the planner — the knobs a
    100 TB deployment uses when AQE statistics mislead it."""
    from tcdb_spark.plans.catalog import load_tables

    t = load_tables(spark, SF, "events", "documents")
    big = t["events"].select(F.col("user_id").alias("k"), "value")
    dim = t["documents"].select(F.col("doc_id").alias("k"), "source")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p_bcast = plan(big.join(F.broadcast(dim), "k"))
    assert "BroadcastHashJoin" in p_bcast

    p_shash = plan(big.join(dim.hint("SHUFFLE_HASH"), "k"))
    assert "ShuffledHashJoin" in p_shash

    p_merge = plan(big.join(dim.hint("MERGE"), "k"))
    assert "SortMergeJoin" in p_merge


def test_grouped_arrow_ols_matches_builtin_regr(spark):
    """The applyInArrow OLS must agree with Spark's own regr_slope/
    regr_intercept aggregates (the recommended production plan)."""
    from tcdb_spark.plans.queries_analytics import grouped_arrow_ols

    got = {
        r["user_id"]: (r["slope"], r["intercept"])
        for r in grouped_arrow_ols(spark, SF).collect()
    }
    from tcdb_spark.plans.catalog import load_tables

    ev = load_tables(spark, SF, "events")["events"]
    want = {
        r["user_id"]: (r["slope"], r["intercept"])
        for r in ev.groupBy("user_id")
        .agg(
            F.round(
                F.expr("regr_slope(value, unix_micros(ts) / 86400.0e6)"), 9
            ).alias("slope"),
            F.round(
                F.expr("regr_intercept(value, unix_micros(ts) / 86400.0e6)"), 5
            ).alias("intercept"),
        )
        .collect()
    }
    assert got == want


def test_hard_negative_mining_recall(spark):
    """ANN hard-negative mining must recover >= 0.7 of the brute-force
    label-constrained top-5 (same gate family as the other ANN ops)."""
    from pyspark.sql.window import Window as W

    from tcdb_spark.plans.catalog import load_tables
    from tcdb_spark.plans.queries_sim import hard_negative_mining_pruned

    got = hard_negative_mining_pruned(spark, SF)
    approx = {(r["q_id"], r["vec_id"]) for r in got.collect()}

    emb = load_tables(spark, SF, "embeddings")["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    a = emb.select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe"),
        F.col("label").alias("ql"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda x, y: x * y),
        F.lit(0.0), lambda s, x: s + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    pairs = (
        a.crossJoin(emb)
        .where((F.col("label") != F.col("ql")) & (F.col("vec_id") != F.col("q_id")))
        .select("q_id", "vec_id", (dot / (nrm(F.col("qe")) * nrm(F.col("e")))).alias("cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    exact = {
        (r["q_id"], r["vec_id"])
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7, f"recall@5 = {recall:.3f}"
