"""SCD Type-2 dimension-history catalog entries.

Two-snapshot scenario over ``customer``: snapshot 1 is the table as-is
(2024-01-01); snapshot 2 (2024-06-01) moves every 7th customer to a new
market segment. The oracle reconstructs the expected history closed-form
in SQL, so the operator's close-out/insert/no-op behavior is
hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.operators.scd import scd2_as_of, scd2_init, scd2_merge
from tcdb_spark.plans.catalog import load_tables, register

D1 = "2024-01-01 00:00:00"
D2 = "2024-06-01 00:00:00"


def _history(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    snap1 = c.select("c_custkey", "c_mktsegment")
    snap2 = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    hist = scd2_init(snap1, D1)
    return scd2_merge(hist, snap2, key=["c_custkey"], tracked=["c_mktsegment"], effective_from=D2)


@register(
    "scd2_history",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '2024-01-01 00:00:00' AS effective_from,
           CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '2024-06-01 00:00:00' END
               AS effective_to,
           (c_custkey % 7 <> 0) AS is_current
    FROM customer
    UNION ALL
    SELECT c_custkey, 'MOVED', TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
    FROM customer WHERE c_custkey % 7 = 0
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history after two snapshots: changed keys carry a closed
    predecessor row + a new open row; unchanged keys keep their single
    open row. One full-outer join on the business key per snapshot —
    bucket the dim on the key at scale and the table side never
    shuffles (same layout argument as operators/merge.py)."""
    return _history(spark, sf_dir).select(
        "c_custkey", "c_mktsegment", "effective_from", "effective_to", "is_current"
    )


@register(
    "scd2_point_in_time",
    oracle="SELECT c_custkey, c_mktsegment FROM customer",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the dimension history: the as-of view at the
    first snapshot date must reproduce the original snapshot exactly,
    even after later changes — the join target for 'enrich facts with
    the attribute value that was true at event time'."""
    hist = _history(spark, sf_dir)
    return scd2_as_of(hist, D1).select("c_custkey", "c_mktsegment")
