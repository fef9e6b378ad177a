"""Transition matrix, streaks, sliding-HLL, and A-Res sampling tests.

Catalog counterparts (each DuckDB-oracled at two SFs):
event_transition_matrix, user_streaks, sliding_distinct_hll,
weighted_sample_ares."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_transition_matrix_counts_and_rownorm(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, et, 0.0, "{}")
        for i, et in enumerate(["a", "b", "a", "b", "b"])
    ]
    from pyspark.sql.window import Window as W

    e = _events(spark, rows)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .count()
    )
    got = {(r["src"], r["dst"]): r["count"] for r in s.collect()}
    # a->b, b->a, a->b, b->b
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("b", "b"): 1}


def test_streaks_gaps_and_islands(spark):
    # active days 1,2,3 then 7,8 -> streaks of 3 and 2
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(days=d, hours=i % 3), 9, "t", 0.0, "{}")
        for i, d in enumerate([1, 1, 2, 3, 7, 8, 8])
    ]
    from pyspark.sql.window import Window as W

    e = _events(spark, rows)
    pairs = e.select(
        "user_id", F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    runs = (
        pairs.withColumn("grp", F.col("d") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
    )
    got = runs.groupBy("user_id").agg(
        F.max("len").alias("mx"), F.count("*").alias("n")
    ).first()
    assert (got["mx"], got["n"]) == (3, 2)


def test_sliding_hll_window_matches_exact_union(spark):
    # 3 users on day 0, 2 new on day 3, 1 new on day 9 (outside the
    # 7-day window of day 0)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day, users in [(0, [1, 2, 3]), (3, [2, 4]), (9, [5])]:
        for u in users:
            rows.append((eid, t0 + dt.timedelta(days=day), u, "t", 0.0, "{}"))
            eid += 1
    from pyspark.sql.window import Window as W

    e = _events(spark, rows)
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint")
    pairs = e.select("user_id", day.alias("d")).distinct()
    daily = pairs.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk"))
    w = W.orderBy("d").rangeBetween(-6, 0)
    est = {
        r["d"]: r["e"]
        for r in daily.select(
            "d", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("e")
        ).collect()
    }
    days = sorted(est)
    # at tiny cardinality the sparse HLL is exact
    assert est[days[0]] == 3          # day 0: users {1,2,3}
    assert est[days[1]] == 4          # day 3 window reaches day 0: {1,2,3,4}
    assert est[days[2]] == 3          # day 9 window reaches day 3: {2,4,5}


def test_ares_heavy_weight_always_wins(spark):
    from tcdb_spark.plans.queries_curation import _ares_key_sql

    docs = spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in range(100)] + [(999, "x", "en", "s", 10**9)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    top = (
        docs.select("doc_id", F.expr(_ares_key_sql("STRING")).alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(5)
        .collect()
    )
    assert top[0]["doc_id"] == 999
    assert all(-1e-6 < r["k"] <= 0 for r in top[:1])


def test_ares_keys_deterministic_across_repartition(spark):
    from tcdb_spark.plans.queries_curation import _ares_key_sql

    docs = spark.createDataFrame(
        [(i, "x", "en", "s", 100 + i) for i in range(200)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    a = {
        r["doc_id"]: r["k"]
        for r in docs.select("doc_id", F.expr(_ares_key_sql("STRING")).alias("k")).collect()
    }
    b = {
        r["doc_id"]: r["k"]
        for r in docs.repartition(13)
        .select("doc_id", F.expr(_ares_key_sql("STRING")).alias("k"))
        .collect()
    }
    assert a == b


def test_basket_pair_lift_closed_form(spark):
    from tcdb_spark.operators.aggregates import basket_pair_lift

    ob = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (4, "B"), (4, "C")],
        ["o", "b"],
    )
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["lift"])
        for r in basket_pair_lift(ob, min_support=1).collect()
    }
    # N=4 baskets; n_A=3, n_B=3, n_C=1; AB together in 2, BC in 1
    assert got[("A", "B")] == (2, round(2 * 4 / (3 * 3), 6))
    assert got[("B", "C")] == (1, round(1 * 4 / (3 * 1), 6))
    assert ("A", "C") not in got


def test_basket_pair_lift_hot_basket_cap_composes(spark):
    from tcdb_spark.operators.aggregates import basket_pair_lift
    from tcdb_spark.operators.textdedup import drop_hot_keys

    # one pathological basket holding 40 items would emit C(40,2)=780
    # pairs; the df-cap drops the basket before the pair stage
    rows = [(99, f"i{k}") for k in range(40)] + [(1, "A"), (1, "B"), (2, "A"), (2, "B")]
    ob = spark.createDataFrame(rows, ["o", "b"])
    capped = drop_hot_keys(ob, "o", df_cap=10)
    got = basket_pair_lift(capped, min_support=1)
    pairs = {(r["item_a"], r["item_b"]) for r in got.collect()}
    assert pairs == {("A", "B")}
