"""SQL-API parity (SURVEY.md §3.3): the reference's analytical SQL files
run verbatim through ``spark.sql`` over registered views — the SAME ANSI
SQL string is the DuckDB oracle, so this checks engine-level SQL parity,
not just DataFrame parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tcdb_spark.plans.catalog import load_tables, register

# db/track_queries.sql / db/forecasts_by_init.sql shape: 5-way join +
# equality filters + projection, in portable ANSI SQL.
_TRACK_SQL = """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, c.c_name,
           n.n_name, r.r_name, l.l_quantity, l.l_extendedprice
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderstatus = 'F'
"""

# db/basin_model_counts.sql shape: dim join + count + ORDER BY count DESC.
_COUNT_SQL = """
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY n.n_name
    ORDER BY n DESC, n_name ASC
"""


def _register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


@register("sql_api_track_query", oracle=_TRACK_SQL)
def sql_api_track_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim SQL through spark.sql — Catalyst plans the identical
    string DuckDB runs as the oracle (db/track_queries.sql:1-25 shape)."""
    _register_views(spark, sf_dir, ["lineitem", "orders", "customer", "nation", "region"])
    return spark.sql(_TRACK_SQL)


@register("sql_api_count_query", oracle=_COUNT_SQL)
def sql_api_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim SQL count family (db/basin_model_counts.sql:1-13 shape)."""
    _register_views(spark, sf_dir, ["orders", "customer", "nation"])
    return spark.sql(_COUNT_SQL)
