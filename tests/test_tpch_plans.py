"""Physical-plan contracts for the completed TPC-H suite + curation ops.

These pin the scale-relevant facts the docstrings claim — which joins
broadcast, how many shuffles run, what reaches the parquet scan — so a
refactor that silently turns a broadcast into a sort-merge join or adds
a shuffle fails CI, not the 100 TB cluster. Counts come from the
EXECUTED adaptive plan (collect first: the pre-execution AQE plan is
isFinalPlan=false and lies about strategy).
"""

from __future__ import annotations

import pytest

from tcdb_spark.plans import QUERIES

# sf0.01, not sf0.001: queries that return zero rows under the smallest
# fixture get AQE-propagated EmptyRelation plans with no join/exchange
# nodes left to assert on.
SF = "/root/testdata/sf0.01"


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # An executed AdaptiveSparkPlan prints the Final Plan followed by
    # the Initial Plan; counting both would double every node.
    return plan.split("== Initial Plan ==")[0]


def _shuffles(plan: str) -> int:
    # "Exchange hashpartitioning(...)" etc; BroadcastExchange and
    # ReusedExchange are different tokens and never match bare
    # "Exchange " with the leading space-delimited word boundary.
    import re

    return len(re.findall(r"(?<![A-Za-z])Exchange (hash|range|Single)", plan))


def _broadcasts(plan: str) -> int:
    return plan.count("BroadcastExchange")


@pytest.fixture(scope="module")
def plans(spark):
    names = [
        "q2_min_cost_supplier",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q19_disjunctive_revenue",
        "q21_waiting_suppliers",
        "chunk_dedup",
    ]
    return {n: _executed_plan(QUERIES[n](spark, SF)) for n in names}


def test_q6_scan_is_pruned_and_filters_pushed(plans):
    """Q6 is I/O-bound at scale: the scan must read exactly the 4
    referenced columns and every predicate must reach the reader."""
    p = plans["q6_forecast_revenue"]
    assert "PushedFilters: [" in p
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({c})" in p or c in p.split("PushedFilters")[1][:400], p
    read = p.split("ReadSchema")[1][:300]
    assert "l_extendedprice" in read
    for absent in ("l_orderkey", "l_returnflag", "l_tax"):
        assert absent not in read, read


def test_q19_fact_never_shuffles(plans):
    """Disjunctive join: part broadcasts, the only exchange is the
    1-row scalar aggregate."""
    p = plans["q19_disjunctive_revenue"]
    assert _broadcasts(p) >= 1, p
    assert "CartesianProduct" not in p
    assert _shuffles(p) <= 1, p


def test_q7_dims_broadcast_one_fact_shuffle(plans):
    """Both nation-filtered lookup sides must broadcast; the fact
    shuffles at most for the orders join and the final agg (on sf0.001
    AQE usually broadcasts orders too, leaving 1)."""
    p = plans["q7_volume_shipping"]
    assert _broadcasts(p) >= 2, p
    assert "SortMergeJoin" not in p, p
    assert _shuffles(p) <= 2, p


def test_q2_decorrelates_without_cartesian(plans):
    """Correlated MIN must become a window over one eligible-set
    stream: pairs distinct + window partitioning, never a per-part
    re-scan or cross join."""
    p = plans["q2_min_cost_supplier"]
    assert "CartesianProduct" not in p
    assert _broadcasts(p) >= 2, p
    assert _shuffles(p) <= 2, p


def test_q21_single_stats_aggregate(plans):
    """The double EXISTS decorrelation: one per-order stats aggregate
    joined back — bounded exchanges, no quadruple fact self-join."""
    p = plans["q21_waiting_suppliers"]
    # lineitem exactly twice (candidates + stats) — the SQL's four
    # correlated references would be four scans — plus orders/supplier/
    # nation once each.
    assert p.count("Scan parquet") <= 5, p
    assert _shuffles(p) <= 4, p


def test_chunk_dedup_content_partitioned(plans):
    """Exactly three exchanges: chunk reassembly on (doc_id, chunk),
    the dedup window on chunk CONTENT (hot chunks spread over the hash
    space), and the per-doc report."""
    p = plans["chunk_dedup"]
    assert _shuffles(p) == 3, p
    assert "chunk_text" in p
