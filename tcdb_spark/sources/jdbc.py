"""JDBC source (SURVEY.md §2.1 scan-jdbc): the reference bulk-reads its
MySQL tables for validation exports (db/sql_export.py:18
``pd.read_sql_table``). The Spark equivalent is the stock JDBC reader
with partitioned parallel pulls; no MySQL driver jar ships in this image,
so the call is capability-gated.
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
