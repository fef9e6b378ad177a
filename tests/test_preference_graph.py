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
    scored = spark.createDataFrame(
        [("g1", 1, 5), ("g1", 2, 9), ("g1", 3, 1)], "grp string, id bigint, s bigint"
    )
    pair = eng.preference_pairs(scored, "grp", "id", "s").collect()[0]
    assert pair["chosen_doc"] == 2 and pair["rejected_doc"] == 3 and pair["margin"] == 8
