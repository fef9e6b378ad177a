"""Versioned parquet warehouse — the vanilla-parquet stand-in for a
lakehouse table format (Delta/Iceberg jars are not in this image; on a
real cluster `merge()` maps onto MERGE INTO and this module disappears).

Each table lives at ``root/<name>/v=<n>/`` with a ``_LATEST`` pointer
written last, so readers never see a half-written version and MERGE
(read latest -> full-outer-join -> write next version -> repoint) is
atomic at the pointer swap. Old versions are retained (cheap time travel,
mirrors the reference's timestamped data-lake file versions,
tcdb/pipeline/bdeck.py:96-103).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._dir(table), "_LATEST")

    def current_version(self, table: str) -> int | None:
        p = self._pointer(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        """Latest version, or an empty frame with ``schema`` if absent."""
        v = self.current_version(table)
        if v is None:
            if schema is None:
                raise FileNotFoundError(f"table {table} missing and no schema given")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(os.path.join(self._dir(table), f"v={v}"))

    def write(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Write the next version and repoint. The full write lands before
        the pointer moves — crash mid-write leaves the old version live."""
        v = (self.current_version(table) or 0) + 1
        path = os.path.join(self._dir(table), f"v={v}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer(table))
        return v
