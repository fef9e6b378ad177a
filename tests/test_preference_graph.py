"""Semantic tests for the preference-rating and link-prediction lanes
(Bradley-Terry MM, common-neighbor Jaccard)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_bradley_terry_recovers_planted_hierarchy(spark, tmp_path):
    from tcdb_spark.plans.queries_stats import bradley_terry_ratings, pairwise_wins

    # 30 users each see gold > silver > bronze by value — a perfectly
    # transitive tournament.  BT must order ratings gold > silver >
    # bronze with gold taking essentially all the mass (its MM fixed
    # point diverges upward for an undefeated player; normalization
    # keeps it finite).
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for u in range(30):
        for etype, val in [("gold", 30.0), ("silver", 20.0), ("bronze", 10.0)]:
            rows.append((eid, base + dt.timedelta(minutes=eid), u, etype, val, "{}"))
            eid += 1
    d = _write_events(spark, tmp_path, rows)

    wins = {(r["winner"], r["loser"]): r["n_wins"] for r in pairwise_wins(spark, d).collect()}
    assert wins[("gold", "silver")] == 30 and wins[("silver", "bronze")] == 30
    assert ("silver", "gold") not in wins

    out = {r["event_type"]: r for r in bradley_terry_ratings(spark, d).collect()}
    assert out["gold"]["rating"] > out["silver"]["rating"] > out["bronze"]["rating"]
    assert out["bronze"]["rating"] == 0.0  # zero wins -> zero strength
    assert out["gold"]["n_wins"] == 60
    total = sum(r["rating"] for r in out.values())
    assert total == pytest.approx(1.0, abs=1e-5)


def test_common_neighbor_links_closed_form(spark):
    from tcdb_spark.operators.graph import common_neighbor_links

    # Two "twin" nodes 1 and 2 share neighbors {3,4,5} and are NOT
    # adjacent: cn=3, deg(1)=deg(2)=3 -> jaccard = 3/(3+3-3) = 1.0.
    # Nodes 3,4 are adjacent to each other via 1/2... no: edges below.
    edges = [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5)]
    e = spark.createDataFrame(edges, "u bigint, v bigint")
    out = common_neighbor_links(e, top_n=10).collect()
    best = out[0]
    assert (best["u"], best["v"]) == (1, 2)
    assert best["common_neighbors"] == 3
    assert best["jaccard"] == pytest.approx(1.0)
    # Adjacent pairs must never appear.
    pairs = {(r["u"], r["v"]) for r in out}
    assert not pairs & {(1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5)}


def test_common_neighbor_deg_cap_drops_hub_wedges(spark):
    from tcdb_spark.operators.graph import common_neighbor_links

    # Star: hub 99 connects 1..6; with the hub capped out as a middle,
    # no candidate pairs remain (the spokes' only shared context is the
    # hub).  Uncapped, all 15 spoke pairs appear.
    edges = [(i, 99) for i in range(1, 7)]
    e = spark.createDataFrame(edges, "u bigint, v bigint")
    assert common_neighbor_links(e, deg_cap=5, top_n=100).count() == 0
    assert common_neighbor_links(e, deg_cap=10, top_n=100).count() == 15


def test_bt_distributed_equals_driver_solve(spark):
    """The join-aggregate MM twin must reproduce the driver solve on a
    leaderboard-sized duel matrix: same p=1 start, same zero-guards,
    same 25 iterations, same round(6) normalized output."""
    from tcdb_spark.plans.queries_stats import (
        bt_ratings_distributed,
        bt_ratings_from_wins,
    )

    wins = spark.createDataFrame(
        [
            ("A", "B", 7), ("B", "A", 3), ("A", "C", 9), ("C", "A", 1),
            ("B", "C", 6), ("C", "B", 4), ("C", "D", 8), ("D", "C", 2),
            ("A", "D", 5), ("E", "A", 2), ("A", "E", 8),
            # F never wins -> rating exactly 0 on both paths
            ("B", "F", 4),
        ],
        "winner string, loser string, n_wins bigint",
    )
    driver = {r["item"]: r for r in bt_ratings_from_wins(spark, wins, "item").collect()}
    dist = {r["item"]: r for r in bt_ratings_distributed(wins, "item").collect()}
    assert set(driver) == set(dist)
    for item in driver:
        assert driver[item]["n_wins"] == dist[item]["n_wins"]
        # both sides round(6) a contraction fixed point; sum-order drift
        # is below the rounding grain
        assert dist[item]["rating"] == pytest.approx(
            driver[item]["rating"], abs=2e-6
        )
    assert dist["F"]["rating"] == 0.0


def test_cooccurrence_edges_cap_survives_megahub(spark):
    """The edge-construction self-join is quadratic per co-occurrence
    key: a planted megahub key (600 members -> ~180k candidate pairs
    from ONE key) must be dropped by the (supp, wk)-style df-cap before
    the join, while every edge from normal keys survives verbatim
    (lossless-when-no-key-is-hot, the salted-equivalence convention)."""
    from tcdb_spark.plans.queries_stats import cooccurrence_edges

    rows = [(n, "hot", 1) for n in range(10_000, 10_600)]
    rows += [(n, "k1", 1) for n in (1, 2, 3)]
    rows += [(n, "k2", 2) for n in (2, 3, 4)]
    co = spark.createDataFrame(rows, "cust bigint, supp string, wk bigint")

    capped = {
        (r["u"], r["v"])
        for r in cooccurrence_edges(co, ["supp", "wk"], "cust", key_cap=64).collect()
    }
    # normal-key edges all present
    assert capped == {(1, 2), (1, 3), (2, 3), (3, 4), (2, 4)}
    # nothing from the megahub leaked through
    assert not any(u >= 10_000 or v >= 10_000 for u, v in capped)

    # without the planted hub the cap is a no-op (lossless)
    small = spark.createDataFrame(rows[600:], "cust bigint, supp string, wk bigint")
    uncapped = {
        (r["u"], r["v"])
        for r in cooccurrence_edges(small, ["supp", "wk"], "cust", key_cap=10**9).collect()
    }
    lossless = {
        (r["u"], r["v"])
        for r in cooccurrence_edges(small, ["supp", "wk"], "cust", key_cap=64).collect()
    }
    assert uncapped == lossless


def test_engine_stats_facades(spark, tmp_path):
    from tcdb_spark.api import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 11.0)], "g string, v double"
    )
    ks = {r["g"]: r["ks_d"] for r in eng.ks_drift(df, "g", "v").collect()}
    assert ks["a"] == 1.0 and ks["b"] == 1.0  # disjoint supports
    shift = {r["g"]: r["auc"] for r in eng.rank_shift(df, "g", "v").collect()}
    assert shift["b"] == 1.0 and shift["a"] == 0.0
    lab = spark.createDataFrame(
        [("s", "x", "x"), ("s", "y", "y"), ("s", "x", "x"), ("s", "y", "x")],
        "src string, gold string, pred string",
    )
    k = eng.kappa(lab, "src", "gold", "pred").collect()[0]
    assert 0 < k["kappa"] < 1
    wins = spark.createDataFrame(
        [("A", "B", 10), ("B", "A", 5)], "winner string, loser string, n_wins bigint"
    )
    rated = {r["item"]: r["rating"] for r in eng.rate_pairwise(wins).collect()}
    assert rated["A"] > rated["B"] > 0
    # the item-scale facade routes round state under the warehouse root
    # (shared-filesystem scratch) and must agree with the driver solve
    rated_d = {
        r["item"]: r["rating"] for r in eng.rate_pairwise_distributed(wins).collect()
    }
    for k in rated:
        assert rated_d[k] == pytest.approx(rated[k], abs=2e-6)
    import os

    assert os.path.isdir(str(tmp_path / "wh" / "_scratch"))
    scored = spark.createDataFrame(
        [("g1", 1, 5), ("g1", 2, 9), ("g1", 3, 1)], "grp string, id bigint, s bigint"
    )
    pair = eng.preference_pairs(scored, "grp", "id", "s").collect()[0]
    assert pair["chosen_doc"] == 2 and pair["rejected_doc"] == 3 and pair["margin"] == 8


def test_preference_pairs_topk_cap_and_ties(spark):
    """Capped all-pairs expansion: a hot group's contribution is
    bounded at C(k,2) no matter its size; equal scores emit no pair;
    ranks respect (score DESC, id ASC) determinism."""
    from tcdb_spark.plans.queries_stats import preference_pairs_topk

    rows = [("hot", i, 100 - i) for i in range(50)]  # 50 candidates
    rows += [("tie", 1, 7), ("tie", 2, 7), ("tie", 3, 5)]
    d = spark.createDataFrame(rows, "g string, id int, s int")
    out = preference_pairs_topk(d, "g", "id", "s", k=4)
    hot = out.where(F.col("g") == "hot").collect()
    assert len(hot) == 6  # C(4,2), not C(50,2)
    assert {(r.chosen, r.rejected) for r in hot} == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    }
    assert all(r.margin > 0 for r in hot)
    tie = {(r.chosen, r.rejected): r.margin for r in out.where(F.col("g") == "tie").collect()}
    # no pair between the tied ids 1 and 2; both beat id 3 by margin 2
    assert tie == {(1, 3): 2, (2, 3): 2}


def test_preference_pairs_topk_feeds_duel_matrix(spark):
    """The expansion's (chosen, rejected) aggregate is the duel-matrix
    shape bt_ratings_from_wins consumes — composition end-to-end."""
    from tcdb_spark.plans.queries_stats import (
        bt_ratings_from_wins,
        preference_pairs_topk,
    )

    # planted strength a > b > c across many groups
    rows = []
    for g in range(6):
        rows += [(g, f"a{g}", 30), (g, f"b{g}", 20), (g, f"c{g}", 10)]
    d = spark.createDataFrame(rows, "g int, id string, s int")
    pairs = preference_pairs_topk(d, "g", "id", "s", k=3)
    wins = (
        pairs.select(
            F.substring("chosen", 1, 1).alias("winner"),
            F.substring("rejected", 1, 1).alias("loser"),
        )
        .groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).alias("n_wins"))
    )
    ratings = {r["item"]: r["rating"] for r in bt_ratings_from_wins(spark, wins).collect()}
    assert ratings["a"] > ratings["b"] > ratings["c"]
