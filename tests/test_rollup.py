"""Incremental rollup maintenance: partial-agg + merge must equal a
one-shot groupBy over all facts, for any batch split, including empty
batches and warehouse-persisted state across ingest ticks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tcdb_spark.operators.aggregates import rollup_merge, rollup_partial


def _as_map(df):
    return {
        r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"]) for r in df.collect()
    }


def _assert_state_equal(got, want):
    assert got.keys() == want.keys()
    for k in want:
        gn, gs, gmin, gmax = got[k]
        wn, ws, wmin, wmax = want[k]
        assert gn == wn, k
        assert math.isclose(gs, ws, rel_tol=1e-12), k
        assert gmin == wmin and gmax == wmax, k


def test_incremental_equals_oneshot_any_split(spark):
    facts = spark.range(0, 10_000).select(
        (F.col("id") % 17).alias("k"),
        (F.col("id") * 0.25 - 600).alias("v"),
    )
    oneshot = _as_map(rollup_partial(facts, ["k"], "v"))

    # 4 uneven batches (one empty)
    preds = [
        F.col("id_mod") == 0,
        F.col("id_mod").isin(1, 2),
        F.col("id_mod") == 3,
        F.lit(False),
    ]
    tagged = facts.withColumn("id_mod", F.pmod((F.col("v") * 4).cast("long"), F.lit(4)))
    state = None
    for p in preds:
        part = rollup_partial(tagged.where(p).drop("id_mod"), ["k"], "v")
        state = part if state is None else rollup_merge(state, part, ["k"])
    _assert_state_equal(_as_map(state), oneshot)


def test_merge_with_empty_state_is_identity(spark):
    facts = spark.range(0, 1_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").cast("double").alias("v")
    )
    part = rollup_partial(facts, ["k"], "v")
    empty = part.limit(0)
    merged = rollup_merge(empty, part, ["k"])
    _assert_state_equal(_as_map(merged), _as_map(part))


def test_warehouse_persisted_rollup_across_ticks(spark, tmp_path):
    """The materialized-view loop: read state, merge the tick's partial,
    write next version — state table stays small and correct."""
    from tcdb_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    all_facts = spark.range(0, 6_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    for tick in range(3):
        batch = all_facts.where(F.pmod(F.col("v").cast("long"), F.lit(3)) == tick)
        part = rollup_partial(batch, ["k"], "v")
        if wh.exists("rollup"):
            state = rollup_merge(wh.read("rollup"), part, ["k"])
        else:
            state = part
        wh.write("rollup", state)
    got = _as_map(wh.read("rollup"))
    want = _as_map(rollup_partial(all_facts, ["k"], "v"))
    _assert_state_equal(got, want)
    assert wh.current_version("rollup") == 3


def test_hll_sketch_rollup_incremental_equals_oneshot(spark):
    """Mergeable-sketch extension: the HLL distinct-count state carried
    through N-batch maintenance must estimate exactly what a one-shot
    sketch over all facts estimates (register-max union is order-
    insensitive), and land near the true distinct count."""
    from tcdb_spark.operators.aggregates import rollup_distinct_estimate

    facts = spark.range(0, 30_000).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").cast("double").alias("v"),
        (F.col("id") % 500).alias("user"),   # 500 true distincts per key
    )
    oneshot = rollup_distinct_estimate(
        rollup_partial(facts, ["k"], "v", distinct_col="user")
    )
    state = None
    for tick in range(3):
        batch = facts.where(F.pmod(F.col("v").cast("long"), F.lit(3)) == tick)
        part = rollup_partial(batch, ["k"], "v", distinct_col="user")
        state = part if state is None else rollup_merge(state, part, ["k"])
    got = {r["k"]: r["approx_distinct"] for r in rollup_distinct_estimate(state).collect()}
    want = {r["k"]: r["approx_distinct"] for r in oneshot.collect()}
    assert got == want
    for k, est in got.items():
        assert abs(est - 500) / 500 < 0.05, (k, est)
