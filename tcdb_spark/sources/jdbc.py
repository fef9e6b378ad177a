"""JDBC source/sink (SURVEY.md §2.1 scan-jdbc): the reference bulk-reads
its MySQL tables for validation exports (db/sql_export.py:18
``pd.read_sql_table``). The Spark equivalent is the stock JDBC reader
with partitioned parallel pulls and the batched JDBC writer.

Exercised end-to-end against embedded Derby (whose jars ship with Spark
for the Hive metastore) in tests/test_jdbc_roundtrip.py — real database,
real driver, real range-sliced parallel connections. MySQL/Postgres only
need their connector jar on ``spark.jars`` at deploy time; the gate
below turns a missing driver into an actionable error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC scan. With ``partition_column`` bounds, Spark
    issues ``num_partitions`` range-sliced queries in parallel — the
    scale path for bulk DB pulls (one connection per partition, not one
    giant cursor)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # driver jar absent in this image
        raise NotImplementedError(
            "JDBC driver not on the classpath in this environment; add the "
            "connector jar (e.g. mysql-connector-j) via spark.jars at deploy "
            f"time. Underlying error: {exc}"
        ) from exc


def write_jdbc_table(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """JDBC bulk write (the validation-export half of db/sql_export.py):
    one connection per partition, batched inserts. Same capability gate
    as the reader."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.mode(mode).save()
    except Exception as exc:
        raise NotImplementedError(
            "JDBC driver not on the classpath in this environment; add the "
            "connector jar via spark.jars at deploy time. "
            f"Underlying error: {exc}"
        ) from exc
