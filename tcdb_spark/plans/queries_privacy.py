"""Privacy-risk audit lanes: k-anonymity ladder, l-diversity gate,
suppression enforcement (operators/privacy.py; §2.12 extension — the
reference's storm tables carry no personal data, a curated training
corpus with user-joined metadata does).

Cast of the driver tables: ``customer`` plays the user-metadata table;
quasi-identifiers are (nation, market segment, account-balance bracket)
— the indirect attributes an adversary can link on — and the balance
bracket doubles as the sensitive attribute for the diversity gate.
Bracketing uses ``floor(c_acctbal / 1000.0)``: both engines evaluate
the same IEEE double division, and TPC-H balances carry exact
two-decimal values, so the bracket boundary cannot straddle engines.

Oracle notes: GROUPING() bits (not NULL-ness) assign rollup output rows
to rungs — the subtotal-vs-genuine-NULL trap — and the suppression
oracle joins with IS NOT DISTINCT FROM to mirror the engine's
null-safe ``<=>`` (shadow testdata plants NULL keys; plain equality
would silently drop those classes on one side only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.operators.privacy import (
    k_anonymity_ladder,
    l_diversity_summary,
    qi_group_sizes,
    suppress_below_k,
)
from tcdb_spark.plans.catalog import load_tables, register

K_MIN = 5
L_MIN = 3

_BRACKET_SQL = "CAST(floor(c_acctbal / 1000.0) AS INTEGER)"


def _customer_qi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_bracket"),
    )


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment, {_BRACKET_SQL} AS bal_bracket
        FROM customer
    ), classes AS (
        SELECT CAST(GROUPING(c_nationkey) + GROUPING(c_mktsegment)
                    + GROUPING(bal_bracket) AS INTEGER) AS level,
               count(*) AS k
        FROM qi
        GROUP BY ROLLUP (c_nationkey, c_mktsegment, bal_bracket)
    )
    SELECT level,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN k < {K_MIN} THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_k,
           CAST(sum(CASE WHEN k < {K_MIN} THEN k ELSE 0 END) AS BIGINT)
               AS rows_below_k,
           CAST(min(k) AS BIGINT) AS min_k
    FROM classes GROUP BY level
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit across the generalization ladder (nation,
    segment, balance bracket) -> (nation, segment) -> (nation) -> ():
    one ``rollup`` scans the table ONCE for all four rungs (Expand +
    single hash aggregate), then a rung-keyed second aggregate emits
    the release report — class counts, rows below the k_min = 5 floor,
    worst class.  The report is how a release decision picks the
    coarsest rung that clears the floor instead of suppressing rows."""
    qi = _customer_qi(spark, sf_dir)
    return k_anonymity_ladder(
        qi, ["c_nationkey", "c_mktsegment", "bal_bracket"], k_min=K_MIN
    )


@register(
    "privacy_l_diversity",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment, {_BRACKET_SQL} AS bal_bracket
        FROM customer
    ), classes AS (
        SELECT c_nationkey, c_mktsegment,
               count(*) AS k,
               count(DISTINCT bal_bracket) AS l
        FROM qi GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN l < {L_MIN} THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_l,
           CAST(sum(CASE WHEN l < {L_MIN} THEN k ELSE 0 END) AS BIGINT)
               AS rows_below_l,
           CAST(min(l) AS BIGINT) AS min_l
    FROM classes
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l diversity gate on the (nation, segment) classes with
    the balance bracket as the sensitive attribute: a class can clear
    k-anonymity and still disclose (homogeneity attack) when every
    member shares one sensitive value; this one-row summary counts the
    classes and rows below the l_min = 3 floor and reports the worst
    l.  Single
    aggregate + single-row reduce; NULL sensitive values don't count
    toward l in either engine (module docstring)."""
    qi = _customer_qi(spark, sf_dir)
    return l_diversity_summary(
        qi, ["c_nationkey", "c_mktsegment"], "bal_bracket", l_min=L_MIN
    )


@register(
    "privacy_suppress_small_groups",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment, {_BRACKET_SQL} AS bal_bracket
        FROM customer
    ), sizes AS (
        SELECT c_nationkey, c_mktsegment, bal_bracket, count(*) AS k
        FROM qi GROUP BY 1, 2, 3
    ), kept AS (
        SELECT q.* FROM qi q JOIN sizes s
          ON  q.c_nationkey  IS NOT DISTINCT FROM s.c_nationkey
          AND q.c_mktsegment IS NOT DISTINCT FROM s.c_mktsegment
          AND q.bal_bracket  IS NOT DISTINCT FROM s.bal_bracket
        WHERE s.k >= {K_MIN}
    ), resizes AS (
        SELECT count(*) AS k FROM kept
        GROUP BY c_nationkey, c_mktsegment, bal_bracket
    )
    SELECT CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_rows_kept,
           CAST(count(*) AS BIGINT) AS n_groups_kept,
           CAST(coalesce(min(k), 0) AS BIGINT) AS min_k_after
    FROM resizes
    """,
)
def privacy_suppress_small_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression enforcement attested end-to-end: drop every row in a
    below-floor (nation, segment, bracket) class, then RE-audit the
    survivors — the oracle-matched ``min_k_after`` is the proof the
    released table satisfies k >= k_min = 5 by measurement, not by
    construction-argument alone.  The keep-list is the post-aggregation
    class table (broadcastable); the join is null-safe so NULL-keyed
    classes (shadow testdata) are suppressed or kept as classes rather
    than dropped by join semantics."""
    qi = _customer_qi(spark, sf_dir)
    kept = suppress_below_k(
        qi, ["c_nationkey", "c_mktsegment", "bal_bracket"], k_min=K_MIN
    )
    sizes = qi_group_sizes(kept, ["c_nationkey", "c_mktsegment", "bal_bracket"])
    return sizes.agg(
        F.coalesce(F.sum("k"), F.lit(0)).alias("n_rows_kept"),
        F.count(F.lit(1)).alias("n_groups_kept"),
        F.coalesce(F.min("k"), F.lit(0)).alias("min_k_after"),
    )
