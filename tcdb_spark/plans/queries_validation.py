"""Validation / constraint catalog entries (SURVEY.md §2.9) over the
driver testdata."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.operators.validation import (
    RangeRule,
    check_fk_orphans,
    check_range_coerce,
    check_unique,
)
from tcdb_spark.plans.catalog import load_tables, register


@register(
    "check_range_coerce",
    oracle="""
    SELECT event_id,
           CASE WHEN value BETWEEN 0 AND 100 THEN value ELSE NULL END AS value,
           CASE WHEN value IS NULL OR (value BETWEEN 850 AND 1050) OR value = 0
                THEN coalesce(value, 1000.0) ELSE 1000.0 END AS pressure_like
    FROM (SELECT event_id, value FROM events) t
    """,
)
def check_range_coerce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lenient range validation: out-of-range -> null (velocity-style) or
    default (pressure-style, None -> 1000) — tcdb/validation.py:6-33.
    Both rules apply in ONE row-preserving pass (zero shuffles); the
    earlier two-frame self-join on event_id fanned out on duplicate
    natural keys (shadow-sweep finding) and shuffled for nothing."""
    e = load_tables(spark, sf_dir, "events")["events"].select(
        "event_id", "value", F.col("value").alias("pressure_like")
    )
    return check_range_coerce(
        e,
        [
            RangeRule("value", 0, 100),
            RangeRule("pressure_like", 850, 1050, also_allowed=(0,), default=1000),
        ],
    )


@register(
    "check_unique_violations",
    oracle="""
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    """,
)
def check_unique_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness audit (db/init_db_base.sql:137-145 unique indexes):
    l_orderkey is NOT unique in lineitem -> every multi-line order is a
    violation group; (l_orderkey, l_linenumber) would return empty."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return check_unique(li, ["l_orderkey"])


@register(
    "check_fk_orphans",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
    """,
)
def check_fk_orphans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan audit (db/init_db_base.sql:124-135; skip-if-missing
    tcdb/etl/process_obs.py:62-65): orders whose customer is absent —
    the quarantine set (empty when integrity holds)."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    orders = t["orders"].select("o_orderkey", F.col("o_custkey"))
    parent = t["customer"].select(F.col("c_custkey"))
    orphans = check_fk_orphans(
        orders.withColumnRenamed("o_custkey", "c_custkey"), parent, "c_custkey", "c_custkey"
    )
    return orphans.select("o_orderkey", F.col("c_custkey").alias("o_custkey"))


@register(
    "profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num, CAST(max(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT), CAST(count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           NULL, NULL, min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT), CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(count(*) AS BIGINT), CAST(count(o_orderdate) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT),
           NULL, NULL, strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass over a representative column mix (bigint,
    string, double, timestamp): the Spark side computes ALL columns in
    ONE scan (multiple COUNT(DISTINCT)s planned as a single Expand;
    see operators/profile.py for the 100 TB rationale and the
    approx_count_distinct swap for wide tables). The oracle reads the
    table once per column — semantically identical, and exactly the
    N-scans-for-N-columns anti-pattern the operator exists to avoid."""
    from tcdb_spark.operators.profile import profile_table

    o = load_tables(spark, sf_dir, "orders")["orders"]
    return profile_table(
        o, ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    )
