"""Triangle counting, autocorrelation, and HLL-audit unit tests.

Catalog counterparts: graph_triangles, acf_lags, approx_distinct_audit
(each also hash-checked against DuckDB oracles at two SFs)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_triangle_counts_hand_graph(spark):
    # two triangles sharing node 3: {1,2,3} and {3,4,5}; node 6 dangles
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (5, 6)],
        ["src", "dst"],
    )
    from tcdb_spark.operators.graph import triangle_counts

    got = {r["node"]: r["tri_cnt"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_triangle_counts_orientation_and_duplicates(spark):
    # duplicate + reversed edges and self-loops must not inflate counts
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)],
        ["src", "dst"],
    )
    from tcdb_spark.operators.graph import triangle_counts

    got = {r["node"]: r["tri_cnt"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_triangle_free_graph(spark):
    # a star has wedges but no closing edges
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    from tcdb_spark.operators.graph import triangle_counts

    assert triangle_counts(edges).count() == 0


def _event_rows(user, values):
    t0 = dt.datetime(2024, 1, 1)
    return [
        (user * 1000 + i, t0 + dt.timedelta(hours=i), user, "t", float(v), "{}")
        for i, v in enumerate(values)
    ]


def _acf(spark, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    from tcdb_spark.plans.queries_timeseries import acf_lags as _  # noqa: F401
    from pyspark.sql.window import Window as W

    # exercise the same expression the catalog query builds
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = df.select(
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
    )

    def corr_guarded(col):
        # same ANSI-safe Pearson spelling as the catalog query
        return F.try_divide(
            F.covar_samp(F.col("value"), F.col(col)),
            F.stddev_samp(F.when(F.col(col).isNotNull(), F.col("value")))
            * F.stddev_samp(F.col(col)),
        )

    out = s.groupBy("user_id").agg(
        corr_guarded("l1").alias("a1"), corr_guarded("l2").alias("a2")
    )
    return {r["user_id"]: (r["a1"], r["a2"]) for r in out.collect()}


def test_acf_linear_series_is_one(spark):
    got = _acf(spark, _event_rows(1, range(1, 11)))
    a1, a2 = got[1]
    assert abs(a1 - 1.0) < 1e-9 and abs(a2 - 1.0) < 1e-9


def test_acf_alternating_series(spark):
    got = _acf(spark, _event_rows(2, [1, -1] * 6))
    a1, a2 = got[2]
    assert abs(a1 + 1.0) < 1e-9 and abs(a2 - 1.0) < 1e-9


def test_acf_constant_series_is_null_not_nan(spark):
    got = _acf(spark, _event_rows(3, [5.0] * 8))
    assert got[3] == (None, None)


def test_hll_union_of_partials_equals_direct_sketch(spark):
    # 1000 distinct ids split across 10 groups: the merged estimate is
    # NOT bit-identical to the single-pass sketch (sparse->dense
    # promotion happens at different fill levels on the two paths), but
    # both must land within the 5% audit bound of truth and within 1%
    # of each other — the contract approx_distinct_audit attests
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("uid")
    )
    direct = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("e")).first()["e"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("uid").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    assert abs(merged - direct) <= 0.01 * direct
    assert abs(direct - 1000) <= 0.05 * 1000
    assert abs(merged - 1000) <= 0.05 * 1000


def test_sax_words_separate_structured_shapes(spark):
    """Rising, falling, and flat-with-spike series must land in
    different SAX words; two series with the SAME shape must collide —
    the whole point of the symbolization index."""
    import datetime as dt

    from tcdb_spark.plans.catalog import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    shapes = {
        1: [float(i) for i in range(16)],            # rising
        2: [float(i) for i in range(16)],            # rising twin
        3: [float(16 - i) for i in range(16)],       # falling
        4: [0.0] * 8 + [10.0] + [0.0] * 7,           # flat with a spike
    }
    rows = [
        (u * 100 + i, t0 + dt.timedelta(hours=i), u, "t", v, "{}")
        for u, vs in shapes.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = QUERIES["sax_similarity_candidates"](spark, d).collect()
    pairs = {(r["user_a"], r["user_b"]) for r in out}
    assert pairs == {(1, 2)}  # only the rising twins collide
    assert all(r["paa_dist2"] == 0.0 for r in out)


def test_tree_roots_forest_and_depths(spark):
    from tcdb_spark.operators.graph import tree_roots

    # forest: 1->(2->(4,5), 3); 10->(11); isolated root 99 (self-parent)
    parents = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 2), (5, 2), (10, None), (11, 10), (99, 99)],
        "node int, parent int",
    )
    got = {r["node"]: (r["root"], r["depth"]) for r in tree_roots(parents).collect()}
    assert got == {
        1: (1, 0), 2: (1, 1), 3: (1, 1), 4: (1, 2), 5: (1, 2),
        10: (10, 0), 11: (10, 1), 99: (99, 0),
    }


def test_tree_roots_deep_chain_log_rounds(spark):
    from tcdb_spark.operators.graph import tree_roots

    # a 64-deep chain resolves (pointer doubling: ~6 rounds, not 64)
    n = 64
    parents = spark.createDataFrame(
        [(i, i - 1 if i > 0 else None) for i in range(n)], "node int, parent int"
    )
    got = {r["node"]: (r["root"], r["depth"]) for r in tree_roots(parents).collect()}
    assert got[n - 1] == (0, n - 1) and got[0] == (0, 0) and len(got) == n


def test_tree_roots_unknown_parent_becomes_detached_root(spark):
    from tcdb_spark.operators.graph import tree_roots

    parents = spark.createDataFrame(
        [(5, 1000), (6, 5)], "node int, parent int"
    )  # 1000 is not a node
    got = {r["node"]: (r["root"], r["depth"]) for r in tree_roots(parents).collect()}
    assert got == {5: (5, 0), 6: (5, 1)}


def test_tree_roots_cycle_raises(spark):
    import pytest

    from tcdb_spark.operators.graph import tree_roots

    parents = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (9, None)], "node int, parent int"
    )
    with pytest.raises(ValueError, match="cycle"):
        tree_roots(parents, max_depth=64).collect()


def test_common_neighbor_links_packed_and_struct_paths_agree(spark):
    """The packed-bigint pair-key fast path (r7) must be output-identical
    to the struct path. Same graph twice: once with small int ids
    (packed path fires), once with the ids shifted past 2^31 (the
    min/max guard forces the struct fallback) — the link ranking must
    match after shifting back."""
    from tcdb_spark.operators.graph import common_neighbor_links

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (1, 5), (5, 6), (2, 6)]
    small = spark.createDataFrame(edges, "u int, v int")
    big_off = 1 << 32
    big = spark.createDataFrame(
        [(u + big_off, v + big_off) for u, v in edges], "u long, v long"
    )
    got_small = [
        (r["u"], r["v"], r["common_neighbors"], round(r["jaccard"], 9))
        for r in common_neighbor_links(small, top_n=10).collect()
    ]
    got_big = [
        (r["u"] - big_off, r["v"] - big_off, r["common_neighbors"], round(r["jaccard"], 9))
        for r in common_neighbor_links(big, top_n=10).collect()
    ]
    assert got_small == got_big
    assert len(got_small) > 0


def test_common_neighbor_links_string_ids_take_struct_path(spark):
    """Non-integral node ids must keep working (struct path)."""
    from tcdb_spark.operators.graph import common_neighbor_links

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        "u string, v string",
    )
    rows = common_neighbor_links(e, top_n=5).collect()
    assert rows and {"u", "v", "common_neighbors", "jaccard"} <= set(rows[0].asDict())
