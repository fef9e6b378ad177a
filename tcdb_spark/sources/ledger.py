"""Ingest ledger: content-hash exactly-once file admission.

Reference behavior: every downloaded deck is byte-compared against all
stored versions and skipped when identical (tcdb/pipeline/fs_utils.py:
10-21 ``isContentsUnique``; empty-file guard tcdb/pipeline/bdeck.py:92-94).
Here the ledger is a warehouse table keyed by (source_name, content_hash);
admission is ONE left_anti join per batch instead of per-file byte loops —
the §2.10 "new-data detection" half of incremental ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tcdb_spark.sources.warehouse import Warehouse

LEDGER_SCHEMA = T.StructType([
    T.StructField("source_name", T.StringType(), False),
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("ingested_at", T.TimestampType(), True),
    T.StructField("run_id", T.StringType(), True),
])

LEDGER_TABLE = "ingest_ledger"


def hash_files(files: DataFrame, name_col: str = "source_name", content_col: str = "content") -> DataFrame:
    """(name, content) -> (source_name, content_hash); empty content is
    dropped (the reference's empty-file guard)."""
    return (
        files.where(F.length(F.col(content_col)) > 0)
        .select(
            F.col(name_col).alias("source_name"),
            F.sha2(F.col(content_col).cast("binary"), 256).alias("content_hash"),
        )
    )


def admit_new(
    spark: SparkSession,
    warehouse: Warehouse,
    hashed: DataFrame,
    run_id: str,
) -> DataFrame:
    """Split a hashed batch against the ledger; returns the admitted
    (previously unseen) rows and records them. Idempotent: replaying the
    same batch admits nothing."""
    ledger = warehouse.read(LEDGER_TABLE, LEDGER_SCHEMA)
    new = hashed.dropDuplicates(["source_name", "content_hash"]).join(
        ledger.select("source_name", "content_hash"),
        on=["source_name", "content_hash"],
        how="left_anti",
    )
    appended = ledger.unionByName(
        new.withColumn("ingested_at", F.current_timestamp()).withColumn("run_id", F.lit(run_id)),
        allowMissingColumns=True,
    )
    warehouse.write(LEDGER_TABLE, appended)
    return new
